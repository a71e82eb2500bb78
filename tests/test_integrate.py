"""Golden-numeric tests: the jnp scan integrator vs the independent NumPy
oracle, plus analytic closed-form checks (SURVEY.md section 4 strategy)."""
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.config import (CameraConfig, LightConfig,
                                           MediumConfig, RenderConfig)
from volumetricrenderer_tpu.ops.camera import camera_rays, make_camera
from volumetricrenderer_tpu.ops.integrate import (reference_media_scroll,
                                                  render_rays,
                                                  transform_rays)

import numpy_oracle


def _rand_grid4(size, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(size=(size, size, size, 4)),
        jnp.float32)


def _small_rays(n=7, seed=1):
    cam = make_camera(CameraConfig(width=n, height=n))
    return camera_rays(cam)


def test_absorption_matches_numpy_oracle():
    grid = _rand_grid4(8, seed=2)
    o, d = _small_rays(6)
    cfg = RenderConfig(max_steps=32, step_size=4.0 / 32.0)
    med = MediumConfig()
    out = np.asarray(render_rays(grid, o, d, cfg, med))
    gn = np.asarray(grid, np.float64)
    for i in range(6):
        for j in range(6):
            want = numpy_oracle.render_ray_absorption(
                gn, np.asarray(o[i, j]), np.asarray(d[i, j]),
                max_steps=32, step=4.0 / 32.0)
            np.testing.assert_allclose(out[i, j], want, rtol=1e-3, atol=2e-4)


def test_absorption_with_scroll_matches_oracle():
    grid = _rand_grid4(8, seed=3)
    o, d = _small_rays(4)
    cfg = RenderConfig(max_steps=16, step_size=4.0 / 16.0)
    med = MediumConfig(channel_scroll_weight=(0.3, 0.2, 0.25, 0.3))
    scroll = reference_media_scroll(1.7)
    out = np.asarray(render_rays(grid, o, d, cfg, med, scroll=scroll))
    gn = np.asarray(grid, np.float64)
    sn = np.asarray(scroll, np.float64)
    for i in range(4):
        for j in range(4):
            want = numpy_oracle.render_ray_absorption(
                gn, np.asarray(o[i, j]), np.asarray(d[i, j]),
                max_steps=16, step=4.0 / 16.0, scroll=sn,
                scroll_weight=(0.3, 0.2, 0.25, 0.3))
            np.testing.assert_allclose(out[i, j], want, rtol=1e-3, atol=2e-4)


def test_emission_matches_numpy_oracle():
    size = 8
    grid = jnp.asarray(
        np.random.default_rng(5).uniform(size=(size, size, size)),
        jnp.float32)
    o, d = _small_rays(5)
    cfg = RenderConfig(max_steps=32, step_size=4.0 / 32.0, emission=True,
                       early_stop_transmittance=0.0)
    med = MediumConfig(combine="single", density=4.0)
    light = LightConfig()
    out = np.asarray(render_rays(grid, o, d, cfg, med, light))
    gn = np.asarray(grid, np.float64)
    for i in range(5):
        for j in range(5):
            want = numpy_oracle.render_ray_emission(
                gn, np.asarray(o[i, j]), np.asarray(d[i, j]),
                max_steps=32, step=4.0 / 32.0, density=4.0,
                ambient=light.ambient)
            np.testing.assert_allclose(out[i, j], want, rtol=1e-3, atol=3e-4)


def test_constant_density_analytic():
    # Constant grid c: absorption integral = n_steps * c * scale * step.
    c = 0.7
    grid = jnp.full((4, 4, 4, 4), c, jnp.float32)
    o = jnp.array([[-3.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    cfg = RenderConfig(max_steps=128)
    med = MediumConfig()
    out = np.asarray(render_rays(grid, o, d, cfg, med))[0]
    n_steps = int((4.0 - 0.0) / cfg.step_size)  # chord length 2 / step...
    n_steps = min(128, int(np.floor(2.0 / cfg.step_size)))
    sigma = (c * c) * (c + c) * med.sample_scale
    expected = 1.0 - np.exp(-sigma * n_steps * cfg.step_size)
    np.testing.assert_allclose(out[:3], expected, rtol=1e-4)
    assert out[3] == 1.0


def test_miss_gives_background():
    grid = _rand_grid4(4)
    o = jnp.array([[-3.0, 5.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    out = np.asarray(render_rays(grid, o, d, RenderConfig(),
                                 MediumConfig()))[0]
    np.testing.assert_array_equal(out, [0.0, 0.0, 0.0, 0.0])


def test_emission_invariants():
    grid = jnp.asarray(np.random.default_rng(9).uniform(size=(8, 8, 8)),
                       jnp.float32)
    o, d = _small_rays(8)
    cfg = RenderConfig(emission=True)
    out = np.asarray(render_rays(grid, o, d, cfg,
                                 MediumConfig(combine="single", density=8.0),
                                 LightConfig()))
    # alpha = 1 - T must be in [0, 1]; colors finite and bounded by alpha
    assert np.all(out[..., 3] >= -1e-6) and np.all(out[..., 3] <= 1 + 1e-6)
    assert np.all(np.isfinite(out))
    assert np.all(out[..., :3] <= out[..., 3:4] + 1e-5)


def test_world_to_local_rotation():
    # Rotating the volume 90 deg about z == rotating rays -90 deg: render
    # with w2l vs pre-rotated rays must match.
    grid = _rand_grid4(8, seed=11)
    o, d = _small_rays(5)
    cfg = RenderConfig(max_steps=32)
    med = MediumConfig()
    th = np.pi / 2
    rot = np.array([[np.cos(th), -np.sin(th), 0, 0],
                    [np.sin(th), np.cos(th), 0, 0],
                    [0, 0, 1, 0],
                    [0, 0, 0, 1]], np.float32)
    w2l = jnp.asarray(np.linalg.inv(rot))
    a = np.asarray(render_rays(grid, o, d, cfg, med, world_to_local=w2l))
    o2, d2 = transform_rays(o, d, w2l)
    b = np.asarray(render_rays(grid, o2, d2, cfg, med))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_shadow_march_darkens():
    # With a shadow march, occluded regions must be no brighter than without.
    grid = jnp.ones((8, 8, 8), jnp.float32)
    o, d = _small_rays(4)
    med = MediumConfig(combine="single", density=8.0)
    base_cfg = RenderConfig(emission=True)
    no_shadow = np.asarray(render_rays(grid, o, d, base_cfg, med,
                                       LightConfig(shadow_steps=0)))
    shadow = np.asarray(render_rays(grid, o, d, base_cfg, med,
                                    LightConfig(shadow_steps=16)))
    assert np.all(shadow[..., :3] <= no_shadow[..., :3] + 1e-5)
    assert shadow[..., :3].sum() < no_shadow[..., :3].sum()
