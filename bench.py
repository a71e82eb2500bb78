"""Benchmark harness — prints ONE JSON line with the north-star metric.

Metric (BASELINE.json): rays/s/chip, forward+backward, 256^3 volume at
1080p, with pixel gradients validated against the reference integrator.

vs_baseline: the reference (Raspy-Py/VolumetricRenderer) publishes no
numbers (README.md:15-21; BASELINE.json "published": {}). Its structural
ceiling is the vsync-capped FIFO present mode (VulkanSwapchain.cpp:194-208)
at 1280x720 (VulkanContext.cpp:24): 1280*720*60 = 55.3M rays/s —
*forward-only, no gradients*. vs_baseline = our fwd+bwd rays/s divided by
that forward-only ceiling, so 1.0 means we match the reference's best-case
display throughput while also computing voxel gradients it cannot.

Timing notes (see .claude/skills/verify/SKILL.md): the tunneled chip caches
identical calls and block_until_ready is unreliable, so every timed
iteration varies an input and fetches a scalar to host.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from volumetricrenderer_tpu.config import (CameraConfig, LightConfig,
                                           MediumConfig, RenderConfig)
from volumetricrenderer_tpu.models.scene import cloud_volume
from volumetricrenderer_tpu.ops.camera import camera_rays, make_camera
from volumetricrenderer_tpu.render import render_image

REFERENCE_RAYS_PER_S = 1280 * 720 * 60.0  # fwd-only vsync ceiling, see above

import os

# Smoke-test overrides (the driver runs the defaults).
VOLUME = int(os.environ.get("VOLT_BENCH_VOLUME", 256))
WIDTH = int(os.environ.get("VOLT_BENCH_WIDTH", 1920))
HEIGHT = int(os.environ.get("VOLT_BENCH_HEIGHT", 1080))
ITERS = int(os.environ.get("VOLT_BENCH_ITERS", 4))


def main():
    cfg = RenderConfig(emission=True)
    medium = MediumConfig(combine="single", density=8.0)
    light = LightConfig()
    cam = make_camera(CameraConfig(width=WIDTH, height=HEIGHT))

    grid = cloud_volume(VOLUME, seed=7)

    def loss_fn(grid, t):
        img = render_image(grid, cam, cfg, medium, light,
                           scroll=None, backend="auto")
        # scalar pixel loss so backward produces full voxel gradients
        return jnp.sum(img[..., :3] ** 2) * (1.0 + 0.0 * t)

    step = jax.jit(jax.value_and_grad(loss_fn))

    # Warmup / compile (not timed).
    loss, g = step(grid, jnp.float32(0.0))
    float(loss)

    t0 = time.perf_counter()
    for i in range(ITERS):
        # Vary an input each iteration and fetch a scalar: defeats
        # tunnel-level result caching and forces completion on host.
        loss, g = step(grid + 1e-6 * (i + 1), jnp.float32(i))
        float(loss), float(g.ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS

    rays_per_s = WIDTH * HEIGHT / dt
    print(json.dumps({
        "metric": "rays/s/chip fwd+bwd at 256^3/1080p",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / REFERENCE_RAYS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
