"""Round-3 measurement session: make the hot-loop number trustworthy.

Measures, on the real chip, with every timing amortized over >=32 frames
per dispatch and a null-dispatch calibration:

  * null dispatch cost (jitted scalar add) — the tunnel/runtime floor,
  * pallas vs jnp sweep, fwd-only and fwd+bwd, same run,
  * base-maps-only fwd (no warp) — isolates the warp stage.

Writes one JSON object to stdout (and PROFILE path if given).

Usage:  PYTHONUNBUFFERED=1 timeout 1800 python tools/measure_r3.py
Env:    VOLT_M_VOLUME (256), VOLT_M_WIDTH (1920), VOLT_M_HEIGHT (1080),
        VOLT_M_FRAMES (32), VOLT_M_ITERS (2), VOLT_M_OUT (path).
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu.config import (CameraConfig, MediumConfig,
                                           RenderConfig)
from volumetricrenderer_tpu.models.scene import cloud_volume
from volumetricrenderer_tpu.ops.camera import make_camera
from volumetricrenderer_tpu.ops.sweep import plan_sweep, sweep_render

VOLUME = int(os.environ.get("VOLT_M_VOLUME", 256))
WIDTH = int(os.environ.get("VOLT_M_WIDTH", 1920))
HEIGHT = int(os.environ.get("VOLT_M_HEIGHT", 1080))
FRAMES = int(os.environ.get("VOLT_M_FRAMES", 32))
ITERS = int(os.environ.get("VOLT_M_ITERS", 2))
DTYPE = os.environ.get("VOLT_M_DTYPE", "float32")  # bf16 A/B: "bfloat16"
OUT = os.environ.get("VOLT_M_OUT", "")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def time_dispatches(fn, args, iters, label):
    t0 = time.perf_counter()
    float(fn(*args, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        float(fn(*args, jnp.float32(i + 1.0)))
    per_dispatch = (time.perf_counter() - t0) / iters
    log(f"{label}: compile {compile_s:.1f}s, {per_dispatch*1e3:.1f} "
        f"ms/dispatch")
    return per_dispatch, compile_s


def main():
    results = {"volume": VOLUME, "width": WIDTH, "height": HEIGHT,
               "frames_per_dispatch": FRAMES, "iters": ITERS,
               "dtype": DTYPE, "device": str(jax.devices()[0])}
    t_all = time.perf_counter()

    # --- null dispatch ---
    nul = jax.jit(lambda x: x + 1.0)
    float(nul(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for i in range(10):
        float(nul(jnp.float32(i)))
    null_ms = (time.perf_counter() - t0) / 10 * 1e3
    results["null_dispatch_ms"] = round(null_ms, 2)
    log(f"null dispatch: {null_ms:.1f} ms")

    # --- jitted scene setup ---
    t0 = time.perf_counter()
    grid = jax.block_until_ready(
        jax.jit(cloud_volume, static_argnums=(0,))(VOLUME, 7))
    results["setup_grid_s"] = round(time.perf_counter() - t0, 1)
    log(f"grid build (jitted): {results['setup_grid_s']}s")

    cfg = RenderConfig(emission=True, quadrature="sliced", dtype=DTYPE)
    medium = MediumConfig(combine="single", density=8.0)
    cam = make_camera(CameraConfig(width=WIDTH, height=HEIGHT))
    t0 = time.perf_counter()
    plan = plan_sweep(cam, grid.shape, cfg)
    jax.block_until_ready(plan.seglen)
    results["setup_plan_s"] = round(time.perf_counter() - t0, 1)
    results["base_shape"] = [int(x) for x in plan.base_shape]
    log(f"plan: {results['setup_plan_s']}s, base {plan.base_shape}")

    # NOTE: t must vary the INPUT of the computation being timed — varying
    # only the output scalar makes the whole render loop-invariant and XLA
    # may hoist it out of the frame scan (observed with the warp).
    def frame_loss(g, t, use_pallas):
        img = sweep_render(g * (1.0 + 0.0 * t), plan, cfg, medium,
                           use_pallas=use_pallas)
        return jnp.sum(img[..., :3] ** 2)

    def basemaps_loss(g, t, use_pallas):
        # forward sweep without the warp stage
        from volumetricrenderer_tpu.kernels import sweep_pallas as sp
        from volumetricrenderer_tpu.ops.sweep import _sweep_base
        gperm = jnp.transpose(g, plan.perm) * (1.0 + 0.0 * t)
        if use_pallas:
            maps = sp.sweep_base_pallas(gperm, plan, cfg, medium, None)
        else:
            maps = _sweep_base(gperm, None, plan.slice_z, plan.v_grid,
                               plan.u_grid, plan.seglen, plan, cfg, medium,
                               None, None)
        return jnp.sum(maps[1]) + jnp.sum(maps[2])

    def k_frames(loss_fn, grad):
        @jax.jit
        def run(g, t0):
            def body(c, i):
                if grad:
                    l, gr = jax.value_and_grad(loss_fn)(g, t0 + i)
                    return c + l + gr.ravel()[0], None
                return c + loss_fn(g, t0 + i), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(FRAMES, dtype=jnp.float32))
            return out
        return run

    variants = [
        ("pallas_fwdbwd", k_frames(partial(frame_loss, use_pallas=True), True)),
        ("jnp_fwdbwd", k_frames(partial(frame_loss, use_pallas=False), True)),
        ("pallas_fwd", k_frames(partial(frame_loss, use_pallas=True), False)),
        ("jnp_fwd", k_frames(partial(frame_loss, use_pallas=False), False)),
        ("pallas_base_fwd", k_frames(partial(basemaps_loss, use_pallas=True),
                                     False)),
        ("jnp_base_fwd", k_frames(partial(basemaps_loss, use_pallas=False),
                                  False)),
        ("pallas_base_fwdbwd",
         k_frames(partial(basemaps_loss, use_pallas=True), True)),
    ]
    only = os.environ.get("VOLT_M_ONLY", "")  # substring filter
    if only:
        variants = [(n, f) for n, f in variants if only in n]
    for name, fn in variants:
        try:
            per_dispatch, compile_s = time_dispatches(fn, (grid,), ITERS,
                                                      name)
            ms_frame = (per_dispatch - null_ms / 1e3) / FRAMES * 1e3
            results[name] = {"ms_per_frame": round(ms_frame, 2),
                             "compile_s": round(compile_s, 1)}
        except Exception as e:  # keep going; partial data is still data
            log(f"{name} FAILED: {type(e).__name__}: {e}")
            results[name] = {"error": str(e)[:300]}

    results["total_s"] = round(time.perf_counter() - t_all, 1)
    out = json.dumps(results, indent=1)
    print(out, flush=True)
    if OUT:
        with open(OUT, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
