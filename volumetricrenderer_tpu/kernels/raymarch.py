"""Pallas TPU ray-march kernels — the equivalent of the reference's
fragment-shader hot loop (shaders/frag.glsl:34-81) as a hand-tiled TPU
kernel. Placeholder until the kernel lands; `supported` gates the "auto"
backend in render.py.
"""
from __future__ import annotations


def supported(grid, cfg, medium, light, backend) -> bool:
    return False


def render_rays_pallas(*args, **kwargs):
    raise NotImplementedError("pallas ray-march kernel not yet implemented")
