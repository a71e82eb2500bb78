"""Focused warp-stage benchmark: times JUST warp_base_to_pixels fwd and
bwd on a real flagship plan — fast iteration loop for warp work.
(The Pallas warp kernels were removed in round 4 after losing their r3
A/B by ~8x; this tool now times the XLA windowed path only.)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/measure_warp.py
Env: VOLT_W_FRAMES (32), VOLT_W_ITERS (2), VOLT_W_CH (2 — the emission
path warps (wsum, trans)), VOLT_W_OUT.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu.config import CameraConfig, RenderConfig
from volumetricrenderer_tpu.ops.camera import make_camera
from volumetricrenderer_tpu.ops.sweep import plan_sweep, warp_base_to_pixels

FRAMES = int(os.environ.get("VOLT_W_FRAMES", 32))
ITERS = int(os.environ.get("VOLT_W_ITERS", 2))
CH = int(os.environ.get("VOLT_W_CH", 2))  # emission path warps (wsum, trans)
OUT = os.environ.get("VOLT_W_OUT", "")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    cfg = RenderConfig(emission=True, quadrature="sliced")
    cam = make_camera(CameraConfig(width=1920, height=1080))
    t0 = time.perf_counter()
    plan = plan_sweep(cam, (256, 256, 256), cfg)
    jax.block_until_ready(plan.seglen)
    Hb, Wb = plan.base_shape
    log(f"plan {time.perf_counter()-t0:.0f}s base {plan.base_shape} "
        f"band {plan.warp_band}")
    key = jax.random.PRNGKey(0)
    base = jax.random.uniform(key, (Hb, Wb, CH), jnp.float32)

    results = {"base_shape": [Hb, Wb], "channels": CH,
               "band": [int(b) for b in plan.warp_band],
               "frames": FRAMES}

    def run(name, mode, grad):
        def one(b, t):
            # t must vary the warp INPUT — varying only the output scalar
            # lets XLA hoist the whole warp out of the frame scan.
            out = warp_base_to_pixels(b * (1.0 + 0.0 * t), plan,
                                      miss=(0.0,) * CH)
            return jnp.sum(out ** 2)

        @jax.jit
        def k(b, t0):
            def body(c, i):
                if grad:
                    l, g = jax.value_and_grad(one)(b, t0 + i)
                    return c + l + g.ravel()[0], None
                return c + one(b, t0 + i), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(FRAMES, dtype=jnp.float32))
            return out

        t0 = time.perf_counter()
        float(k(base, jnp.float32(0.0)))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(ITERS):
            float(k(base, jnp.float32(i + 1.0)))
        ms = (time.perf_counter() - t0) / ITERS / FRAMES * 1e3
        log(f"{name}: {ms:.2f} ms/frame (compile {comp:.0f}s)")
        results[name] = round(ms, 2)

    def run_moveaxis():
        @jax.jit
        def k(b, t0):
            def body(c, i):
                m = jnp.moveaxis(base * (1.0 + 0.0 * (t0 + i)), -1, 0)
                return c + m[0, 0, 0], None
            out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(FRAMES, dtype=jnp.float32))
            return out
        t0 = time.perf_counter()
        float(k(base, jnp.float32(0.0)))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(ITERS):
            float(k(base, jnp.float32(i + 1.0)))
        ms = (time.perf_counter() - t0) / ITERS / FRAMES * 1e3
        log(f"moveaxis_only: {ms:.2f} ms/frame (compile {comp:.0f}s)")
        results["moveaxis_only"] = round(ms, 2)

    run_moveaxis()
    run("xla_fwd", None, False)
    run("xla_fwdbwd", None, True)
    out = json.dumps(results)
    print(out, flush=True)
    if OUT:
        open(OUT, "w").write(out + "\n")


if __name__ == "__main__":
    main()
