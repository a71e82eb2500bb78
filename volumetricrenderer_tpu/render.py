"""Public rendering API — the `Renderer` equivalent.

The reference's Renderer (VulkanRenderer.h:58-100) is an imperative frame
engine: Init, AddRenderPass, per-frame Enqueue/Begin/End over a swapchain.
The TPU-native equivalent is functional: `render(...)` is a jitted pure
function from (grid, camera, configs, time) to an RGBA image; "frames in
flight" fall out of XLA's async dispatch (launch N renders back to back and
block on results), and the swapchain is `utils.image.write_png`.

Backends:
  * "reference": the jnp scan integrator (ops/integrate.py) — the oracle.
  * "pallas":    the fused Pallas TPU kernel (kernels/) when available.
  * "auto":      pallas when the (grid, config) combination is supported
                 on the current platform, else reference.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .config import (CameraConfig, LightConfig, MediumConfig, Preset,
                     RenderConfig)
from .models.scene import build_volume
from .ops.camera import Camera, camera_rays, make_camera
from .ops.integrate import reference_media_scroll, render_rays

__all__ = ["render", "render_preset", "render_image"]


def render_image(
    grid,
    camera: Camera,
    cfg: RenderConfig,
    medium: MediumConfig,
    light: Optional[LightConfig] = None,
    scroll=None,
    world_to_local=None,
    backend: str = "auto",
):
    """Render one RGBA frame (H, W, 4) from a density grid and camera."""
    origins, directions = camera_rays(camera)
    if backend in ("auto", "pallas"):
        from .kernels import raymarch as _raymarch
        if _raymarch.supported(grid, cfg, medium, light, backend):
            return _raymarch.render_rays_pallas(
                grid, origins, directions, cfg, medium, light,
                scroll=scroll, world_to_local=world_to_local)
        if backend == "pallas":
            raise NotImplementedError(
                "pallas backend does not support this configuration")
    return render_rays(grid, origins, directions, cfg, medium, light,
                       scroll=scroll, world_to_local=world_to_local)


# `render` is the stable public name.
render = render_image


def render_preset(preset: Preset, t: float = 0.0, grid=None,
                  backend: str = "auto"):
    """Render a named BASELINE preset at animation time t (seconds).

    The time parameter drives the media scroll exactly like the demo loop
    (TestMain.cpp:232-238 feeds Clock::Elapsed into MediaScroll)."""
    if grid is None:
        grid = build_volume(preset.volume)
    cam = make_camera(preset.camera)
    n_channels = grid.shape[-1] if grid.ndim == 4 else 1
    scroll = reference_media_scroll(t, n_channels=max(n_channels, 1))
    return render_image(grid, cam, preset.render, preset.medium,
                        preset.light, scroll=scroll, backend=backend)
