"""Part-by-part timing of the fwd+bwd frame at bench scale (TPU).

Times each pipeline stage inside its own jit (K frames per dispatch,
varying input, scalar fetched) so the tunnel's dispatch latency and
caching don't pollute the numbers. Usage: python tools/profile_parts.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from volumetricrenderer_tpu.config import (CameraConfig, LightConfig,
                                           MediumConfig, RenderConfig)
from volumetricrenderer_tpu.kernels import sweep_pallas as sp
from volumetricrenderer_tpu.models.scene import cloud_volume
from volumetricrenderer_tpu.ops.camera import make_camera
from volumetricrenderer_tpu.ops.sweep import (_sweep_base, finish_image,
                                              plan_sweep, sweep_render)

VOLUME = int(os.environ.get("V", 256))
W = int(os.environ.get("W", 1920))
H = int(os.environ.get("H", 1080))
K = int(os.environ.get("K", 2))
ITERS = int(os.environ.get("I", 2))

cfg = RenderConfig(emission=True, quadrature="sliced")
medium = MediumConfig(combine="single", density=8.0)
cam = make_camera(CameraConfig(width=W, height=H))
grid = jax.block_until_ready(cloud_volume(VOLUME, seed=7))
plan = plan_sweep(cam, grid.shape, cfg)
gperm = jax.block_until_ready(jnp.transpose(grid, plan.perm))
print(f"base {plan.base_shape} slices {plan.slice_z.shape[0]} "
      f"band {plan.warp_band}", file=sys.stderr)


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    float(jfn(*args, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(ITERS):
        float(jfn(*args, jnp.float32(i + 1.0)))
    per = (time.perf_counter() - t0) / ITERS / K * 1e3
    print(f"{name:34s} {per:8.2f} ms/frame   (compile {compile_s:.0f}s)")


def scan_k(body):
    def run(*args):
        *a, t0 = args

        def step(c, i):
            return c + body(*a, t0 + i), None

        out, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.float32))
        return out
    return run


def base_fwd(g, t):
    maps = sp.sweep_base_pallas(g * (1.0 + 0.0 * t), plan, cfg, medium,
                                None)
    return sum(jnp.sum(m) for m in maps)


def base_fwd_jnp(g, t):
    maps = _sweep_base(g * (1.0 + 0.0 * t), None, plan.slice_z,
                       plan.v_grid, plan.u_grid, plan.seglen, plan, cfg,
                       medium, None, None)
    return sum(jnp.sum(m) for m in maps)


def full_fwd(g, t):
    img = sweep_render(g * (1.0 + 0.0 * t), plan, cfg, medium)
    return jnp.sum(img[..., :3] ** 2)


def wa_build(g, t):
    wa = sp._row_matrices(plan, gperm.shape[1], cfg.address_mode)
    return jnp.sum(wa) * (1.0 + 0.0 * t) + jnp.sum(g[0])


maps0 = jax.block_until_ready(
    jax.jit(lambda g: sp.sweep_base_pallas(g, plan, cfg, medium,
                                           None))(gperm))


def warp_only(maps, t):
    maps = jax.tree.map(lambda m: m * (1.0 + 0.0 * t), maps)
    img = finish_image(maps, plan, cfg, medium)
    return jnp.sum(img[..., :3] ** 2)


timed("null (dispatch overhead)", scan_k(lambda g, t: jnp.sum(g[0]) * t),
      gperm)
timed("wa_all build", scan_k(wa_build), gperm)
timed("fwd base maps (pallas)", scan_k(base_fwd), gperm)
timed("fwd base maps + warp + loss", scan_k(full_fwd), grid)
timed("warp+loss fwd only", scan_k(warp_only), maps0)
def consume(vg):
    """value + a grad element, so XLA cannot DCE the backward pass."""
    def f(x, t):
        v, g = vg(x, t)
        return v + jax.tree.leaves(g)[0].ravel()[0]
    return f


timed("warp+loss fwd+bwd", scan_k(consume(jax.value_and_grad(warp_only))),
      maps0)
timed("fwd+bwd base maps (pallas)",
      scan_k(consume(jax.value_and_grad(base_fwd))), gperm)
timed("fwd+bwd full (pallas)",
      scan_k(consume(jax.value_and_grad(full_fwd))), grid)
