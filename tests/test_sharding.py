"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md section 4
"Distributed"): sharded render equals single-device render; sharded train
step runs and reduces loss; spatial grid sharding compiles and matches."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volumetricrenderer_tpu.config import (CameraConfig, LightConfig,
                                           MediumConfig, RenderConfig)
from volumetricrenderer_tpu.ops.camera import camera_rays, make_camera
from volumetricrenderer_tpu.ops.integrate import render_rays
from volumetricrenderer_tpu.parallel.mesh import make_mesh
from volumetricrenderer_tpu.parallel.render_sharded import (
    make_sharded_renderer, make_train_step, shard_rays)


@pytest.fixture(scope="module")
def setup():
    cam = make_camera(CameraConfig(width=32, height=32))
    o, d = camera_rays(cam)
    grid = jnp.asarray(
        np.random.default_rng(2).uniform(size=(8, 8, 8)), jnp.float32)
    cfg = RenderConfig(max_steps=16, step_size=4.0 / 16.0, emission=True,
                       early_stop_transmittance=0.0)
    med = MediumConfig(combine="single", density=4.0)
    return cam, o, d, grid, cfg, med


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_sharded_render_matches_single(setup):
    cam, o, d, grid, cfg, med = setup
    mesh = make_mesh(data=8)
    light = LightConfig()
    render_fn = make_sharded_renderer(mesh, cfg, med, light)
    so, sd, pad = shard_rays(o, d, mesh)
    scroll = jnp.zeros((1, 3), jnp.float32)
    out = np.asarray(render_fn(grid, so, sd, scroll))
    if pad:
        out = out[:-pad]
    want = np.asarray(render_rays(grid, o, d, cfg, med, light))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_sharded_render_2d_mesh_spatial_grid(setup):
    cam, o, d, grid, cfg, med = setup
    mesh = make_mesh(data=4, slab=2)
    light = LightConfig()
    render_fn = make_sharded_renderer(mesh, cfg, med, light,
                                      spatial_grid=True)
    so, sd, pad = shard_rays(o, d, mesh)
    scroll = jnp.zeros((1, 3), jnp.float32)
    out = np.asarray(render_fn(grid, so, sd, scroll))
    if pad:
        out = out[:-pad]
    want = np.asarray(render_rays(grid, o, d, cfg, med, light))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_sharded_train_step_reduces_loss(setup):
    cam, o, d, grid, cfg, med = setup
    mesh = make_mesh(data=8)
    import optax
    step, optimizer = make_train_step(mesh, cfg, med, LightConfig())
    target = render_rays(grid, o, d, cfg, med, LightConfig())[..., :3]
    so, sd, pad = shard_rays(o, d, mesh)
    assert pad == 0
    from volumetricrenderer_tpu.parallel.mesh import ray_sharding
    st = jax.device_put(target, ray_sharding(mesh))  # rows sharded like rays

    g = jnp.full_like(grid, 0.2)
    opt_state = optimizer.init(g)
    losses = []
    for _ in range(15):
        g, opt_state, loss = step(g, opt_state, so, sd, st)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5
    assert np.all(np.isfinite(np.asarray(g)))
