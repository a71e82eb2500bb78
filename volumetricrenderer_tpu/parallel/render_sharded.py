"""Sharded rendering and training-step construction.

Distribution strategy (SURVEY.md sections 5.8-5.9), stated in renderer
terms:
  * DP: rays/pixels (image rows) shard over the mesh "data" axis — the
    analogue of batch data parallelism; rays are embarrassingly parallel.
  * TP-analogue: the density grid is the framework's "weights"; it is
    replicated for small volumes and spatially sharded along z over the
    "slab" axis for 512^3-class volumes, with XLA inserting the gather /
    gradient-psum collectives from sharding annotations (GSPMD).
  * SP-analogue: the march-step dimension stays per-device (blockwise
    front-to-back accumulation inside the kernel); ring slab-exchange is
    the planned upgrade path for sharded-grid marching.

This module builds jitted fns with explicit in/out shardings; there is no
NCCL-style hand-written communication — collectives come from XLA.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import LightConfig, MediumConfig, RenderConfig
from ..ops.integrate import render_rays
from .mesh import DATA_AXIS, grid_sharding, ray_sharding, replicated

__all__ = ["make_sharded_renderer", "shard_rays", "make_train_step"]


def shard_rays(origins, directions, mesh: Mesh):
    """Place per-pixel ray arrays row-sharded over the data axis. Pads rows
    to a multiple of the data-axis size if needed (static shapes only)."""
    n = mesh.shape[DATA_AXIS]
    h = origins.shape[0]
    pad = (-h) % n
    if pad:
        origins = jnp.pad(origins, ((0, pad), (0, 0), (0, 0)))
        directions = jnp.pad(
            directions, ((0, pad), (0, 0), (0, 0)),
            constant_values=1.0)  # dummy unit-ish dirs, results discarded
    s = ray_sharding(mesh)
    return jax.device_put(origins, s), jax.device_put(directions, s), pad


def make_sharded_renderer(mesh: Mesh, cfg: RenderConfig,
                          medium: MediumConfig,
                          light: Optional[LightConfig] = None,
                          spatial_grid: bool = False):
    """Returns render_fn(grid, origins, directions, scroll) jitted with
    sharding annotations: rays row-sharded (DP), grid replicated or
    z-sharded (TP-analogue)."""
    gs = grid_sharding(mesh, spatial=spatial_grid)
    rs = ray_sharding(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(gs, rs, rs, replicated(mesh)),
        out_shardings=rs,
    )
    def render_fn(grid, origins, directions, scroll):
        return render_rays(grid, origins, directions, cfg, medium, light,
                           scroll=scroll)

    return render_fn


def make_train_step(mesh: Mesh, cfg: RenderConfig, medium: MediumConfig,
                    light: Optional[LightConfig] = None,
                    optimizer=None, spatial_grid: bool = False):
    """Build a jitted inverse-rendering train step over the mesh.

    step(grid, opt_state, origins, directions, target) -> (grid, opt_state,
    loss). The voxel-gradient all-reduce over the data axis and (when the
    grid is z-sharded) the halo gathers fall out of GSPMD from the sharding
    annotations — the overlap of grad-reduce with backward compute is XLA's
    async-collective scheduling, not manual NCCL (SURVEY.md section 5.8)."""
    import optax

    if optimizer is None:
        optimizer = optax.adam(1e-2)

    gs = grid_sharding(mesh, spatial=spatial_grid)
    rs = ray_sharding(mesh)

    def loss_fn(grid, origins, directions, target):
        img = render_rays(grid, origins, directions, cfg, medium, light)
        return jnp.mean((img[..., :3] - target) ** 2)

    @functools.partial(
        jax.jit,
        in_shardings=(gs, None, rs, rs, rs),
        out_shardings=(gs, None, None),
        donate_argnums=(0, 1),
    )
    def step(grid, opt_state, origins, directions, target):
        loss, grads = jax.value_and_grad(loss_fn)(grid, origins, directions,
                                                  target)
        updates, opt_state = optimizer.update(grads, opt_state, grid)
        grid = optax.apply_updates(grid, updates)
        grid = jnp.clip(grid, 0.0, 1.0)
        return grid, opt_state, loss

    return step, optimizer
