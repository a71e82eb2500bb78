"""Interleaved same-process A/B of backward kernel forms (round 5).

Times the BASE sweep fwd+bwd (no warp) at the flagship scene for each
VOLT_BWD_SIGMA form, interleaving iterations A/B/A/B so tunnel weather
cancels; null-dispatch corrected, input-varying, >=32 frames/dispatch.

Usage: PYTHONPATH=/root/repo:/root/.axon_site PYTHONUNBUFFERED=1 \
       timeout 2400 python tools/ab_bwd.py
Env:   VOLT_AB_VOLUME (256), VOLT_AB_FRAMES (32), VOLT_AB_ITERS (4),
       VOLT_AB_FORMS (scatterT,colmm), VOLT_AB_WIDTH/HEIGHT,
       VOLT_AB_FULL (0: base maps only; 1: full render incl. warp),
       VOLT_AB_OUT (path).
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

VOLUME = int(os.environ.get("VOLT_AB_VOLUME", 256))
WIDTH = int(os.environ.get("VOLT_AB_WIDTH", 1920))
HEIGHT = int(os.environ.get("VOLT_AB_HEIGHT", 1080))
FRAMES = int(os.environ.get("VOLT_AB_FRAMES", 32))
ITERS = int(os.environ.get("VOLT_AB_ITERS", 4))
FORMS = os.environ.get("VOLT_AB_FORMS", "scatterT,colmm").split(",")
FULL = bool(int(os.environ.get("VOLT_AB_FULL", "0")))
N_SLICES = int(os.environ.get("VOLT_AB_SLICES", "0")) or None
OUT = os.environ.get("VOLT_AB_OUT", "")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    res = {"volume": VOLUME, "width": WIDTH, "height": HEIGHT,
           "frames_per_dispatch": FRAMES, "iters": ITERS, "full": FULL,
           "n_slices": N_SLICES, "device": str(jax.devices()[0])}
    nul = jax.jit(lambda x: x + 1.0)
    float(nul(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for i in range(10):
        float(nul(jnp.float32(i)))
    null_s = (time.perf_counter() - t0) / 10
    res["null_dispatch_ms"] = round(null_s * 1e3, 2)
    log(f"null {null_s*1e3:.1f} ms")

    grid = jax.block_until_ready(
        jax.jit(cloud_volume, static_argnums=(0,))(VOLUME, 7))
    cfg = RenderConfig(emission=True, quadrature="sliced")
    medium = MediumConfig(combine="single", density=8.0)
    cam = make_camera(CameraConfig(width=WIDTH, height=HEIGHT))
    plan = plan_sweep(cam, grid.shape, cfg, n_slices=N_SLICES)
    jax.block_until_ready(plan.seglen)
    res["base_shape"] = [int(x) for x in plan.base_shape]
    res["windows"] = [int(plan.row_window), int(plan.col_window),
                      int(plan.scatter_window)]
    log(f"base {plan.base_shape} windows {res['windows']}")

    from volumetricrenderer_tpu.kernels import sweep_pallas as sp

    def base_loss(g, t):
        gperm = jnp.transpose(g, plan.perm) * (1.0 + 0.0 * t)
        m = sp.sweep_base_pallas(gperm, plan, cfg, medium, None)
        return jnp.sum(m[1]) + jnp.sum(m[2])

    def full_loss(g, t):
        img = sweep_render(g * (1.0 + 0.0 * t), plan, cfg, medium,
                           use_pallas=True)
        return jnp.sum(img[..., :3] ** 2)

    loss = full_loss if FULL else base_loss

    def k_frames():
        @jax.jit
        def run(g, t0):
            def body(c, i):
                l, gr = jax.value_and_grad(loss)(g, t0 + i)
                return c + l + gr.ravel()[0], None
            out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(FRAMES, dtype=jnp.float32))
            return out
        return run

    fns = {}
    for form in FORMS:
        os.environ["VOLT_BWD_SIGMA"] = form
        fns[form] = k_frames()
        t0 = time.perf_counter()
        float(fns[form](grid, jnp.float32(0.0)))
        log(f"{form}: compile {time.perf_counter()-t0:.0f}s")
    times = {f: [] for f in FORMS}
    for it in range(ITERS):
        for form in FORMS:
            os.environ["VOLT_BWD_SIGMA"] = form
            t0 = time.perf_counter()
            float(fns[form](grid, jnp.float32(it + 1.0)))
            times[form].append(time.perf_counter() - t0)
    for form in FORMS:
        ts = sorted(times[form])
        med = ts[len(ts) // 2]
        per = (med - null_s) / FRAMES * 1e3
        res[form] = {"ms_per_frame_median": round(per, 2),
                     "dispatch_ms_all": [round(t * 1e3) for t in times[form]]}
        log(f"{form}: {per:.2f} ms/frame (median)")
    out = json.dumps(res, indent=1)
    print(out, flush=True)
    if OUT:
        with open(OUT, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
