"""Benchmark harness — prints ONE JSON line with the north-star metric.

Metric (BASELINE.json): rays/s/chip, forward+backward (full voxel
gradients), 256^3 volume at 1080p, pixel gradients validated against the
per-ray reference integrator (ops/integrate.render_rays_sliced — the same
quadrature the production slice-sweep path computes, expressed as a
per-ray gather march).

vs_baseline: the reference (Raspy-Py/VolumetricRenderer) publishes no
numbers (README.md:15-21; BASELINE.json "published": {}). Its structural
ceiling is the vsync-capped FIFO present mode (VulkanSwapchain.cpp:194-208)
at 1280x720 (VulkanContext.cpp:24): 1280*720*60 = 55.3M rays/s —
*forward-only, no gradients*. vs_baseline = our fwd+bwd rays/s divided by
that forward-only ceiling, so 1.0 means we match the reference's best-case
display throughput while also computing voxel gradients it cannot.

Timing notes (see .claude/skills/verify/SKILL.md): the tunneled chip adds
~100-200 ms per dispatch and caches identical calls, so K frames run
*inside one jit* (lax.scan), every dispatch varies an input, and a scalar
is fetched to host.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu.config import (CameraConfig, LightConfig,
                                           MediumConfig, RenderConfig)
from volumetricrenderer_tpu.models.scene import cloud_volume
from volumetricrenderer_tpu.ops.camera import make_camera
from volumetricrenderer_tpu.ops.integrate import render_rays_sliced
from volumetricrenderer_tpu.ops.sweep import base_rays, plan_sweep, sweep_render

REFERENCE_RAYS_PER_S = 1280 * 720 * 60.0  # fwd-only vsync ceiling, see above

# Smoke-test overrides (the driver runs the defaults).
VOLUME = int(os.environ.get("VOLT_BENCH_VOLUME", 256))
WIDTH = int(os.environ.get("VOLT_BENCH_WIDTH", 1920))
HEIGHT = int(os.environ.get("VOLT_BENCH_HEIGHT", 1080))
FRAMES = int(os.environ.get("VOLT_BENCH_FRAMES", 4))  # per dispatch
ITERS = int(os.environ.get("VOLT_BENCH_ITERS", 3))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def validate_gradients():
    """Voxel gradients of the sweep vs the per-ray reference integrator on
    a small config (same math at full scale; small keeps the oracle's
    gather march affordable)."""
    import numpy as np
    cfg = RenderConfig(emission=True, quadrature="sliced")
    medium = MediumConfig(combine="single", density=8.0)
    cam = make_camera(CameraConfig(width=48, height=32))
    grid = cloud_volume(24, seed=7)
    plan = plan_sweep(cam, grid.shape, cfg)
    import dataclasses
    plan_base = dataclasses.replace(plan, identity_warp=True)
    o, d = base_rays(plan)

    def loss_sweep(g):
        return jnp.sum(sweep_render(g, plan_base, cfg, medium)[..., :3] ** 2)

    def loss_oracle(g):
        img = render_rays_sliced(g, o, d, plan, cfg, medium)
        return jnp.sum(img[..., :3] ** 2)

    # Validation runs at full f32 matmul precision (the perf path uses the
    # default TPU passes; the *math* being validated is identical).
    with jax.default_matmul_precision("highest"):
        g1 = np.asarray(jax.jit(jax.grad(loss_sweep))(grid))
        g2 = np.asarray(jax.jit(jax.grad(loss_oracle))(grid))
    scale = float(np.abs(g2).max())
    ok = np.allclose(g1, g2, rtol=1e-3, atol=1e-3 * scale)
    err = float(np.abs(g1 - g2).max())
    log(f"grad check: allclose={ok} max_abs_err={err:.3e} scale={scale:.3e}")
    return bool(ok)


def main():
    t_start = time.perf_counter()
    grads_ok = validate_gradients()

    cfg = RenderConfig(emission=True, quadrature="sliced")
    medium = MediumConfig(combine="single", density=8.0)
    cam = make_camera(CameraConfig(width=WIDTH, height=HEIGHT))
    grid = cloud_volume(VOLUME, seed=7)
    grid = jax.block_until_ready(grid)
    plan = plan_sweep(cam, grid.shape, cfg)
    log(f"setup done in {time.perf_counter()-t_start:.0f}s; "
        f"base {plan.base_shape}, slices {plan.slice_z.shape[0]}")

    def frame_loss(g, t):
        img = sweep_render(g, plan, cfg, medium)
        # scalar pixel loss so backward produces full voxel gradients
        return jnp.sum(img[..., :3] ** 2) * (1.0 + 0.0 * t)

    @jax.jit
    def fwdbwd_k(g, t0):
        def body(c, i):
            loss, gr = jax.value_and_grad(frame_loss)(g, t0 + i)
            return c + loss + gr.ravel()[0], None
        out, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(FRAMES, dtype=jnp.float32))
        return out

    t0 = time.perf_counter()
    float(fwdbwd_k(grid, jnp.float32(0.0)))  # compile + warm (not timed)
    log(f"compile+warm: {time.perf_counter()-t0:.0f}s")

    t0 = time.perf_counter()
    for i in range(ITERS):
        # Vary an input each dispatch and fetch a scalar: defeats
        # tunnel-level result caching and forces completion on host.
        float(fwdbwd_k(grid, jnp.float32(i + 1.0)))
    per_frame = (time.perf_counter() - t0) / ITERS / FRAMES

    # --- Observability: MFU + early-exit rate (SURVEY §5.1) ---
    # Dense matmul FLOPs actually issued to the MXU per fwd+bwd frame
    # (row resample fwd + recompute, column-scatter and dG matmuls bwd),
    # and "useful" FLOPs — only the 2-tap bilinear work the banded
    # matrices encode (2 taps x mul+add per output element). The ratio of
    # the two is the known density cost of expressing a banded resample
    # as a dense matmul.
    Hb, Wb = plan.base_shape
    S = plan.slice_z.shape[0]
    A = VOLUME
    # fwd row-resample + bwd recompute + dG (each (Hb,A)x(A,A)) and the
    # bwd column-scatter ((Hb,Wb)x(Wb,A)):
    dense = 2.0 * S * Hb * A * (3.0 * A + Wb)
    # 2-tap useful work: 4 flops/output for each row-resample (S,Hb,A) and
    # column stage (S,Hb,Wb), roughly doubled for backward, plus ~16
    # compositing/adjoint flops per (slice, base pixel):
    useful = 2.0 * (4.0 * S * Hb * A + 4.0 * S * Hb * Wb) \
        + 16.0 * S * Hb * Wb
    peak = float(os.environ.get("VOLT_PEAK_FLOPS", 197e12))  # v5e bf16
    mfu = dense / per_frame / peak
    useful_mfu = useful / per_frame / peak

    # Early-exit rate: fraction of base pixels whose final transmittance
    # crossed the gate (work skipped behind them).
    from volumetricrenderer_tpu.ops.sweep import _sweep_base

    @jax.jit
    def trans_map(g):
        gperm = jnp.transpose(g, plan.perm)
        maps = _sweep_base(gperm, None, plan.slice_z, plan.v_grid,
                           plan.u_grid, plan.seglen, plan, cfg, medium,
                           None, None)
        return jnp.mean((maps[1] <= cfg.early_stop_transmittance)
                        .astype(jnp.float32))
    early_exit_rate = float(trans_map(grid))

    rays_per_s = WIDTH * HEIGHT / per_frame
    print(json.dumps({
        "metric": "rays/s/chip fwd+bwd at 256^3/1080p",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / REFERENCE_RAYS_PER_S, 4),
        "grad_allclose_vs_reference": grads_ok,
        "ms_per_frame_fwd_bwd": round(per_frame * 1e3, 2),
        "mfu": round(mfu, 4),
        "useful_mfu": round(useful_mfu, 5),
        "dense_tflops_per_s": round(dense / per_frame / 1e12, 2),
        "early_exit_rate": round(early_exit_rate, 4),
        "base_shape": [int(Hb), int(Wb)],
    }))


if __name__ == "__main__":
    main()
