"""SCALE512_r3 artifact: config-5's 512^3 volume on ONE chip — fwd and
fwd+bwd frame times at 1080p through the fused kernels. The multi-host
slab sharding is rehearsed separately (SCALING_r3.json, dryrun_multichip);
this demonstrates the per-chip workload at config-5 scale: a 512 MB f32
grid (+ Adam moments in a fit) fits v5e HBM with room to spare.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/scale512.py
Env: VOLT_S_FRAMES (8), VOLT_S_OUT (SCALE512_r3.json).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu.config import (CameraConfig, MediumConfig,
                                           RenderConfig)
from volumetricrenderer_tpu.models.scene import cloud_volume
from volumetricrenderer_tpu.ops.camera import make_camera
from volumetricrenderer_tpu.ops.sweep import plan_sweep, sweep_render

FRAMES = int(os.environ.get("VOLT_S_FRAMES", 8))
OUT = os.environ.get("VOLT_S_OUT", "SCALE512_r4.json")
SLICES = [int(x) for x in
          os.environ.get("VOLT_S_SLICES", "512,256,128").split(",")]


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    t_all = time.perf_counter()
    cfg = RenderConfig(emission=True, quadrature="sliced")
    medium = MediumConfig(combine="single", density=8.0)
    cam = make_camera(CameraConfig(width=1920, height=1080))

    t0 = time.perf_counter()
    try:
        grid = jax.block_until_ready(
            jax.jit(cloud_volume, static_argnums=(0,))(512, 7))
    except Exception as e:  # the 512^3 noise graph can overwhelm the
        # remote compile helper; an upsampled 256^3 cloud is an equally
        # valid 512^3 density payload for the perf capture
        log(f"512^3 noise build failed ({type(e).__name__}); "
            "upsampling a 256^3 cloud instead")
        from volumetricrenderer_tpu.ops.resample import \
            linear_resample_matrix

        @jax.jit
        def upsample():
            g = cloud_volume(256, seed=7)
            q = (jnp.arange(512, dtype=jnp.float32) + 0.5) / 512
            W = linear_resample_matrix(q, 256, "clamp")
            for dim in range(3):
                g = jnp.moveaxis(
                    jnp.tensordot(W, g, axes=(1, dim)), 0, dim)
            return g

        grid = jax.block_until_ready(upsample())
    plans = {}
    for S in SLICES:
        plans[S] = plan_sweep(cam, grid.shape, cfg,
                              n_slices=None if S == 512 else S)
    plan = plans[SLICES[0]]
    jax.block_until_ready(plan.seglen)
    log(f"setup {time.perf_counter()-t0:.0f}s; base {plan.base_shape}, "
        f"row_window {plan.row_window}")

    nul = jax.jit(lambda x: x + 1.0)
    float(nul(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for i in range(8):
        float(nul(jnp.float32(i)))
    null_s = (time.perf_counter() - t0) / 8

    def run(grad, label, plan):
        def loss(g, t):
            img = sweep_render(g * (1.0 + 0.0 * t), plan, cfg, medium)
            return jnp.sum(img[..., :3] ** 2)

        @jax.jit
        def k(g, t0):
            def body(c, i):
                if grad:
                    l, gr = jax.value_and_grad(loss)(g, t0 + i)
                    return c + l + gr.ravel()[0], None
                return c + loss(g, t0 + i), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(FRAMES, dtype=jnp.float32))
            return out

        t0 = time.perf_counter()
        float(k(grid, jnp.float32(0.0)))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(2):
            float(k(grid, jnp.float32(i + 1.0)))
        ms = (((time.perf_counter() - t0) / 2) - null_s) / FRAMES * 1e3
        log(f"{label}: {ms:.1f} ms/frame (compile {comp:.0f}s)")
        return ms, comp

    out = {
        "config": "config5 volume, single chip",
        "volume": 512, "width": 1920, "height": 1080,
        "grid_bytes_mb": 512,
        "base_shape": [int(x) for x in plan.base_shape],
        "row_window": int(plan.row_window),
        "dispatch_overhead_ms": round(null_s * 1e3, 1),
        "frames_per_dispatch": FRAMES,
        "slice_note": (
            "slices=512 integrates at voxel-plane density (4x the "
            "reference quadrature); the reference caps its march at 128 "
            "steps for ANY volume size (frag.glsl:30, stepSize=4/128), "
            "so slices=128 is reference step parity and slices=256 is "
            "2x it (the flagship 256^3 bench density)"),
        "by_slices": {},
        "device": str(jax.devices()[0]),
    }
    for S in SLICES:
        fwd_ms, fwd_comp = run(False, f"512^3/{S} fwd", plans[S])
        fb_ms, fb_comp = run(True, f"512^3/{S} fwd+bwd", plans[S])
        out["by_slices"][str(S)] = {
            "ms_per_frame_fwd": round(fwd_ms, 1),
            "ms_per_frame_fwd_bwd": round(fb_ms, 1),
            "mrays_per_s_fwd_bwd": round(1920 * 1080 / fb_ms / 1e3, 1),
            "vs_reference_ceiling": round(
                1920 * 1080 / fb_ms * 1e3 / (1280 * 720 * 60.0), 2),
            "compile_s": [round(fwd_comp, 1), round(fb_comp, 1)],
        }
    # legacy top-level fields = the full-density (512-slice) numbers
    out["ms_per_frame_fwd"] = out["by_slices"]["512"]["ms_per_frame_fwd"]
    out["ms_per_frame_fwd_bwd"] = \
        out["by_slices"]["512"]["ms_per_frame_fwd_bwd"]
    out["mrays_per_s_fwd_bwd"] = \
        out["by_slices"]["512"]["mrays_per_s_fwd_bwd"]
    out["total_s"] = round(time.perf_counter() - t_all, 1)
    s = json.dumps(out, indent=1)
    print(s, flush=True)
    open(OUT, "w").write(s + "\n")


if __name__ == "__main__":
    main()
