"""Sanitizer analogue (SURVEY.md §5.2) + fault injection (§5.3):
checkify NaN/Inf guards through the render path, the fit loop's
NaN-step skip, and corrupt-shard detection under the mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from volumetricrenderer_tpu.config import (CameraConfig, MediumConfig,
                                           RenderConfig)
from volumetricrenderer_tpu.fit import fit_grid
from volumetricrenderer_tpu.models.scene import cloud_volume
from volumetricrenderer_tpu.ops.camera import make_camera
from volumetricrenderer_tpu.ops.sweep import plan_sweep, sweep_render
from volumetricrenderer_tpu.utils.sanitize import (assert_all_finite,
                                                   checked, first_nonfinite)


@pytest.fixture(scope="module")
def setup():
    cfg = RenderConfig(emission=True, quadrature="sliced")
    medium = MediumConfig(combine="single", density=8.0)
    cam = make_camera(CameraConfig(width=48, height=32))
    grid = cloud_volume(16, seed=3)
    plan = plan_sweep(cam, grid.shape, cfg)
    return grid, cfg, medium, cam, plan


def test_checked_render_clean_passes(setup):
    grid, cfg, medium, cam, plan = setup
    f = checked(lambda g: sweep_render(g, plan, cfg, medium))
    img = f(grid)
    assert np.isfinite(np.asarray(img)).all()


def test_checked_render_detects_nan_grid(setup):
    """Fault injection: a NaN voxel must be *detected*, not silently
    rendered (the sanitizer-build contract)."""
    grid, cfg, medium, cam, plan = setup
    bad = grid.at[4, 5, 6].set(jnp.nan)
    f = checked(lambda g: sweep_render(g, plan, cfg, medium))
    with pytest.raises(checkify.JaxRuntimeError, match="nan"):
        f(bad)


def test_first_nonfinite_reports_counts():
    t = {"a": jnp.ones((4,)),
         "b": jnp.asarray([1.0, jnp.nan, jnp.inf]),
         "n": jnp.arange(3)}  # int leaf ignored
    bad = first_nonfinite(t)
    assert list(bad.values()) == [2]
    assert "b" in next(iter(bad))
    assert first_nonfinite(jnp.zeros((2, 2))) == {}
    with pytest.raises(ValueError, match="non-finite"):
        assert_all_finite(t, "ckpt")


def test_fit_nan_guard_skips_poisoned_steps(setup):
    """A target image with NaNs poisons every step's loss; the guard must
    skip all updates, leaving the grid at its init value."""
    _, _, medium, cam, _ = setup
    cfg = RenderConfig(max_steps=16, step_size=4.0 / 16.0, emission=True)
    target = jnp.full((32, 48, 3), jnp.nan, jnp.float32)
    res = fit_grid(target, cam, cfg, medium, grid_size=8, steps=3,
                   learning_rate=1e-2)
    assert res.skipped_steps == 3
    assert np.allclose(np.asarray(res.grid), 0.1)  # init value untouched


def test_fit_nan_guard_off_poisons_grid(setup):
    _, _, medium, cam, _ = setup
    cfg = RenderConfig(max_steps=16, step_size=4.0 / 16.0, emission=True)
    target = jnp.full((32, 48, 3), jnp.nan, jnp.float32)
    res = fit_grid(target, cam, cfg, medium, grid_size=8, steps=2,
                   learning_rate=1e-2, nan_guard=False)
    assert not np.isfinite(np.asarray(res.grid)).all()


def test_corrupt_slab_shard_detected():
    """SURVEY §5.3's fault-injection scenario: corrupt one slab shard of a
    mesh-sharded volume; the render output must be flagged by the
    detector rather than pass as a valid frame."""
    from volumetricrenderer_tpu.parallel.mesh import make_mesh
    from volumetricrenderer_tpu.parallel.sweep_sharded import \
        sweep_render_sharded
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = RenderConfig(emission=True, quadrature="sliced")
    medium = MediumConfig(combine="single", density=8.0)
    cam = make_camera(CameraConfig(eye=(2.6, 2.1, 2.9), width=64, height=32))
    grid = cloud_volume(16, seed=3)
    plan = plan_sweep(cam, grid.shape, cfg)
    mesh = make_mesh(data=2, slab=4)
    gsharded = jax.device_put(
        grid, NamedSharding(mesh, P("slab", None, None)))
    # corrupt exactly one device's slab (layers 4..8 live on shard 1)
    corrupt = gsharded.at[5, :, :].set(jnp.nan)
    img = sweep_render_sharded(corrupt, plan, mesh, cfg, medium)
    bad = first_nonfinite(img)
    assert bad, "corrupt shard produced a clean-looking frame"
    with pytest.raises(ValueError, match="non-finite"):
        assert_all_finite(img, "frame")
