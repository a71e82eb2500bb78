"""Parity tests for the fused Pallas sweep kernels (forward + backward).

Runs in Pallas interpret mode on the CPU mesh: the same kernel code the
TPU compiles is executed by the interpreter and compared against the jnp
sweep (ops/sweep._sweep_base), which is itself allclose-validated against
the per-ray oracle (tests/test_sweep.py). Coverage: emission/absorption,
both sweep signs, all three dominant axes, and light-volume shading —
forward maps and voxel/light gradients.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volumetricrenderer_tpu.config import (CameraConfig, LightConfig,
                                           MediumConfig, RenderConfig)
from volumetricrenderer_tpu.kernels import sweep_pallas as sp
from volumetricrenderer_tpu.ops.camera import make_camera
from volumetricrenderer_tpu.ops.lighting import light_transmittance_volume
from volumetricrenderer_tpu.ops.sweep import _sweep_base, plan_sweep

D = 16  # volume size: slices=16, ch=gcd(8,16)=8, n_sc=2, base 128x128


def _setup(eye, emission, seed=0, light_volume=False, density=8.0):
    cfg = RenderConfig(emission=emission, quadrature="sliced")
    medium = MediumConfig(combine="single", density=density)
    cam = make_camera(CameraConfig(eye=eye, width=96, height=64))
    rng = np.random.default_rng(seed)
    grid = jnp.asarray(rng.uniform(0.2, 1.0, (D, D, D)), jnp.float32)
    plan = plan_sweep(cam, grid.shape, cfg)
    light = LightConfig(ambient=0.2)
    lvol = (light_transmittance_volume(grid, light, cfg, medium)
            if light_volume else None)
    return cfg, medium, plan, grid, light, lvol


def _perm(x, plan):
    return jnp.transpose(x, plan.perm) if x is not None else None


def _jnp_base(grid, plan, cfg, medium, light, lvol):
    return _sweep_base(_perm(grid, plan), _perm(lvol, plan), plan.slice_z,
                       plan.v_grid, plan.u_grid, plan.seglen, plan, cfg,
                       medium, light, None)


def _pallas_base(grid, plan, cfg, medium, light, lvol):
    return sp.sweep_base_pallas(_perm(grid, plan), plan, cfg, medium,
                                light, lperm=_perm(lvol, plan),
                                interpret=True)


def _assert_maps_close(a, b, names=("acc", "trans", "wsum", "hit")):
    for x, y, n in zip(a, b, names):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5, err_msg=n)


# Eyes chosen so the dominant sweep axis/sign covers x/y/z and both signs.
EYES = [
    ((3.0, 0.4, 0.3), 0, -1),
    ((-3.0, 0.4, 0.3), 0, 1),
    ((0.3, 3.0, 0.4), 1, -1),
    ((0.4, 0.3, 3.0), 2, -1),
    ((0.4, 0.3, -3.0), 2, 1),
]


@pytest.mark.parametrize("eye,axis,sign", EYES)
@pytest.mark.parametrize("emission", [True, False])
def test_forward_parity(eye, axis, sign, emission):
    cfg, medium, plan, grid, light, _ = _setup(eye, emission)
    assert plan.axis == axis and plan.sign == sign
    ref = _jnp_base(grid, plan, cfg, medium, light, None)
    # both paths return the scalar wsum map (color = wsum * light.color
    # is applied by finish_image after the warp).
    got = _pallas_base(grid, plan, cfg, medium, light, None)
    _assert_maps_close(got, ref)


@pytest.mark.parametrize("eye", [(3.0, 0.4, 0.3), (0.4, 0.3, -3.0)])
def test_forward_parity_light_volume(eye):
    cfg, medium, plan, grid, light, lvol = _setup(eye, True,
                                                  light_volume=True)
    ref = _jnp_base(grid, plan, cfg, medium, light, lvol)
    got = _pallas_base(grid, plan, cfg, medium, light, lvol)
    _assert_maps_close(got, ref)


def _loss(maps, wmaps):
    acc, trans, wsum, hit = maps
    wa, wt, wc = wmaps
    return (jnp.sum(acc * wa) + jnp.sum(trans * wt)
            + jnp.sum(wsum * wc))


@pytest.mark.parametrize("eye", [(3.0, 0.4, 0.3), (-3.0, 0.4, 0.3),
                                 (0.4, 0.3, 3.0)])
@pytest.mark.parametrize("emission", [True, False])
def test_backward_parity(eye, emission):
    cfg, medium, plan, grid, light, _ = _setup(eye, emission, seed=3)
    rng = np.random.default_rng(9)
    Hb, Wb = plan.base_shape
    wmaps = (jnp.asarray(rng.normal(size=(Hb, Wb)), jnp.float32),
             jnp.asarray(rng.normal(size=(Hb, Wb)), jnp.float32),
             jnp.asarray(rng.normal(size=(Hb, Wb)), jnp.float32))

    g_ref = jax.grad(lambda g: _loss(
        _jnp_base(g, plan, cfg, medium, light, None), wmaps))(grid)
    g_got = jax.grad(lambda g: _loss(
        _pallas_base(g, plan, cfg, medium, light, None), wmaps))(grid)
    scale = float(jnp.abs(g_ref).max()) + 1e-12
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4 * scale)


def test_backward_parity_light_volume():
    """Gradients w.r.t. BOTH the density grid and the light volume, with
    the light volume as an independent input (the composition with the
    lighting sweep is plain autodiff outside the kernel)."""
    cfg, medium, plan, grid, light, lvol = _setup(
        (3.0, 0.4, 0.3), True, seed=5, light_volume=True)
    rng = np.random.default_rng(11)
    Hb, Wb = plan.base_shape
    wmaps = (jnp.zeros((Hb, Wb)),
             jnp.asarray(rng.normal(size=(Hb, Wb)), jnp.float32),
             jnp.asarray(rng.normal(size=(Hb, Wb)), jnp.float32))

    def loss_ref(g, l):
        return _loss(_jnp_base(g, plan, cfg, medium, light, l), wmaps)

    def loss_got(g, l):
        return _loss(_pallas_base(g, plan, cfg, medium, light, l), wmaps)

    gr, lr = jax.grad(loss_ref, argnums=(0, 1))(grid, lvol)
    gg, lg = jax.grad(loss_got, argnums=(0, 1))(grid, lvol)
    for got, ref, name in ((gg, gr, "dgrid"), (lg, lr, "dlight")):
        scale = float(jnp.abs(ref).max()) + 1e-12
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4 * scale,
                                   err_msg=name)


def test_backward_early_stop_gate():
    """High density saturates rays mid-volume; the live gate must zero
    gradients from slices behind the early-exit point, exactly as the jnp
    path does."""
    cfg, medium, plan, grid, light, _ = _setup(
        (3.0, 0.4, 0.3), True, seed=7, density=500.0)
    rng = np.random.default_rng(13)
    Hb, Wb = plan.base_shape
    wmaps = (jnp.zeros((Hb, Wb)),
             jnp.asarray(rng.normal(size=(Hb, Wb)), jnp.float32),
             jnp.asarray(rng.normal(size=(Hb, Wb)), jnp.float32))
    g_ref = jax.grad(lambda g: _loss(
        _jnp_base(g, plan, cfg, medium, light, None), wmaps))(grid)
    g_got = jax.grad(lambda g: _loss(
        _pallas_base(g, plan, cfg, medium, light, None), wmaps))(grid)
    scale = float(jnp.abs(g_ref).max()) + 1e-12
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-4 * scale)


def test_supported_gate():
    cfg, medium, plan, grid, light, lvol = _setup(
        (3.0, 0.4, 0.3), True, light_volume=True)
    ok = lambda **kw: sp.supported(
        plan,
        kw.get("cfg", cfg),
        kw.get("medium", medium),
        kw.get("light_volume", None),
        kw.get("scroll", None),
        kw.get("grid_ndim", 3),
        kw.get("depth", D),
    )
    assert ok()
    assert ok(light_volume=lvol)
    assert not ok(medium=dataclasses.replace(medium, combine="reference"))
    assert not ok(scroll=jnp.zeros((4, 3)))
    assert not ok(grid_ndim=4)
    # round 4: slices != depth IS supported (XLA pre-lerp aligns the
    # stack to the slice planes — test_subslice_quadrature_parity)
    assert ok(depth=D * 2)
    # round 3: wrap addressing and bf16 streams are in-kernel now
    assert ok(cfg=dataclasses.replace(cfg, address_mode="wrap"))
    assert ok(cfg=dataclasses.replace(cfg, dtype="bfloat16"))
    # absorption + light volume is not a supported combination
    assert not ok(cfg=dataclasses.replace(cfg, emission=False),
                  light_volume=lvol)


@pytest.mark.parametrize("mode", ["wrap", "clamp"])
def test_forward_parity_address_modes(mode):
    """Wrap (period-B modulo lane math) and clamp parity vs the jnp sweep
    — no silent fallback for any sampler address mode (VERDICT r2
    item 9)."""
    cfg = RenderConfig(emission=True, quadrature="sliced",
                       address_mode=mode)
    medium = MediumConfig(combine="single", density=8.0)
    cam = make_camera(CameraConfig(eye=(3.0, 0.4, 0.3), width=96,
                                   height=64))
    rng = np.random.default_rng(2)
    grid = jnp.asarray(rng.uniform(0.2, 1.0, (D, D, D)), jnp.float32)
    plan = plan_sweep(cam, grid.shape, cfg)
    assert sp.supported(plan, cfg, medium, None, None, 3, D)
    light = LightConfig(ambient=0.2)
    ref = _jnp_base(grid, plan, cfg, medium, light, None)
    got = _pallas_base(grid, plan, cfg, medium, light, None)
    _assert_maps_close(got, ref)

    # and gradients through the wrap taps
    def loss(fn):
        maps = fn(grid, plan, cfg, medium, light, None)
        return float(jnp.sum(maps[1] ** 2) + jnp.sum(maps[2] ** 2))

    g_ref = jax.grad(lambda g: jnp.sum(
        _jnp_base(g, plan, cfg, medium, light, None)[2] ** 2))(grid)
    g_got = jax.grad(lambda g: jnp.sum(
        _pallas_base(g, plan, cfg, medium, light, None)[2] ** 2))(grid)
    scale = float(jnp.abs(g_ref).max()) + 1e-12
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4 * scale)


# ---------------------------------------------------------------------------
# Windowed row resample (round 4): plan.row_window switches the kernels to
# granule-windowed row matmuls + offset tables. Must be EXACT vs the dense
# kernels (same taps, same weights) and vs the jnp sweep.
# ---------------------------------------------------------------------------


def _setup_windowed(emission, light_volume=False, seed=0, flip=False):
    """A geometry where windowing is actually active: A=192 grid rows,
    256 base rows (2 blocks), window 128 < 192."""
    cfg = RenderConfig(emission=emission, quadrature="sliced")
    medium = MediumConfig(combine="single", density=8.0)
    eye = (0.4, 0.3, -3.0) if flip else (0.4, 0.3, 3.0)
    cam = make_camera(CameraConfig(eye=eye, width=96, height=64))
    rng = np.random.default_rng(seed)
    grid = jnp.asarray(rng.uniform(0.2, 1.0, (8, 192, 64)), jnp.float32)
    plan = plan_sweep(cam, grid.shape, cfg, force_base_dims=(256, 128))
    assert 0 < plan.row_window < 192, plan.row_window
    light = LightConfig(ambient=0.2)
    lvol = None
    if light_volume:
        from volumetricrenderer_tpu.ops.lighting import (
            light_transmittance_volume)
        lvol = light_transmittance_volume(grid, light, cfg, medium)
    return cfg, medium, plan, grid, light, lvol


@pytest.mark.parametrize("emission", [True, False])
@pytest.mark.parametrize("flip", [False, True])
def test_windowed_forward_matches_dense_and_jnp(emission, flip):
    cfg, medium, plan, grid, light, _ = _setup_windowed(emission, flip=flip)
    got = _pallas_base(grid, plan, cfg, medium, light, None)
    dense = _pallas_base(grid, dataclasses.replace(plan, row_window=0),
                         cfg, medium, light, None)
    # same taps, same weights -> bitwise-equal to the dense kernels
    for x, y, n in zip(got, dense, ("acc", "trans", "wsum", "hit")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=n)
    ref = _jnp_base(grid, plan, cfg, medium, light, None)
    _assert_maps_close(got, ref)


@pytest.mark.parametrize("light_volume", [False, True])
def test_windowed_backward_parity(light_volume):
    cfg, medium, plan, grid, light, lvol = _setup_windowed(
        True, light_volume=light_volume, seed=3)
    rng = np.random.default_rng(11)
    Hb, Wb = plan.base_shape
    wmaps = (jnp.zeros((Hb, Wb)),
             jnp.asarray(rng.normal(size=(Hb, Wb)), jnp.float32),
             jnp.asarray(rng.normal(size=(Hb, Wb)), jnp.float32))
    if light_volume:
        ref_fn = lambda g, l: _loss(
            _jnp_base(g, plan, cfg, medium, light, l), wmaps)
        got_fn = lambda g, l: _loss(
            _pallas_base(g, plan, cfg, medium, light, l), wmaps)
        gr, lr = jax.grad(ref_fn, argnums=(0, 1))(grid, lvol)
        gg, lg = jax.grad(got_fn, argnums=(0, 1))(grid, lvol)
        pairs = ((gg, gr, "dgrid"), (lg, lr, "dlight"))
    else:
        gr = jax.grad(lambda g: _loss(
            _jnp_base(g, plan, cfg, medium, light, None), wmaps))(grid)
        gg = jax.grad(lambda g: _loss(
            _pallas_base(g, plan, cfg, medium, light, None), wmaps))(grid)
        pairs = ((gg, gr, "dgrid"),)
    for got, ref, name in pairs:
        scale = float(jnp.abs(ref).max()) + 1e-12
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4 * scale,
                                   err_msg=name)


def test_windowed_larger_window_exact():
    """A caller-unified (>=) row window must stay exact (animation
    executable sharing relies on it)."""
    cfg, medium, plan, grid, light, _ = _setup_windowed(True)
    got = _pallas_base(grid, plan, cfg, medium, light, None)
    bigger = _pallas_base(
        grid, dataclasses.replace(plan, row_window=plan.row_window + 64),
        cfg, medium, light, None)
    for x, y, n in zip(got, bigger, ("acc", "trans", "wsum", "hit")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=n)


@pytest.mark.parametrize("eye", [(0.3, 0.4, 3.0), (-3.0, 0.4, 0.3)])
def test_subslice_quadrature_parity(eye):
    """n_slices != depth (round 4): the kernels sweep an XLA-pre-lerped
    slice stack (_layer_lerp_stack). The reference caps its march at 128
    steps for ANY volume (frag.glsl:30), so sub-voxel-count slicing is
    its step parity at large volumes. Forward + gradient parity vs the
    jnp sweep at the same slice count."""
    cfg = RenderConfig(emission=True, quadrature="sliced")
    medium = MediumConfig(combine="single", density=8.0)
    cam = make_camera(CameraConfig(eye=eye, width=96, height=64))
    rng = np.random.default_rng(4)
    grid = jnp.asarray(rng.uniform(0.2, 1.0, (32, 32, 32)), jnp.float32)
    plan = plan_sweep(cam, grid.shape, cfg, n_slices=16)
    light = LightConfig(ambient=0.2)
    ref = _jnp_base(grid, plan, cfg, medium, light, None)
    got = _pallas_base(grid, plan, cfg, medium, light, None)
    _assert_maps_close(got, ref)
    rngw = np.random.default_rng(9)
    Hb, Wb = plan.base_shape
    wmaps = (jnp.zeros((Hb, Wb)),
             jnp.asarray(rngw.normal(size=(Hb, Wb)), jnp.float32),
             jnp.asarray(rngw.normal(size=(Hb, Wb)), jnp.float32))
    g1 = jax.grad(lambda g: _loss(
        _pallas_base(g, plan, cfg, medium, light, None), wmaps))(grid)
    g2 = jax.grad(lambda g: _loss(
        _jnp_base(g, plan, cfg, medium, light, None), wmaps))(grid)
    scale = float(jnp.abs(g2).max()) + 1e-12
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4 * scale)


def test_windowed_col_gather_parity():
    """Column-gather windowing (round 4): B=384 (3 static 128-lane
    pieces) with a 512-wide base -> col_window=256 (2 dynamic pieces).
    Forward and gradients vs the jnp sweep and the unwindowed kernels."""
    cfg = RenderConfig(emission=True, quadrature="sliced")
    medium = MediumConfig(combine="single", density=8.0)
    cam = make_camera(CameraConfig(eye=(0.4, 0.3, 3.0), width=192,
                                   height=96))
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.uniform(0.2, 1.0, (8, 192, 384)), jnp.float32)
    plan = plan_sweep(cam, grid.shape, cfg, force_base_dims=(256, 512))
    assert 0 < plan.col_window < 384, plan.col_window
    light = LightConfig(ambient=0.2)
    got = _pallas_base(grid, plan, cfg, medium, light, None)
    ref = _jnp_base(grid, plan, cfg, medium, light, None)
    _assert_maps_close(got, ref)
    dense = _pallas_base(
        grid, dataclasses.replace(plan, col_window=0), cfg, medium,
        light, None)
    for x, y, n in zip(got, dense, ("acc", "trans", "wsum", "hit")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-6, err_msg=n)
    rngw = np.random.default_rng(5)
    Hb, Wb = plan.base_shape
    wmaps = (jnp.zeros((Hb, Wb)),
             jnp.asarray(rngw.normal(size=(Hb, Wb)), jnp.float32),
             jnp.asarray(rngw.normal(size=(Hb, Wb)), jnp.float32))
    g1 = jax.grad(lambda g: _loss(
        _pallas_base(g, plan, cfg, medium, light, None), wmaps))(grid)
    g2 = jax.grad(lambda g: _loss(
        _jnp_base(g, plan, cfg, medium, light, None), wmaps))(grid)
    scale = float(jnp.abs(g2).max()) + 1e-12
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4 * scale)


def test_windowed_scatter_backward_parity():
    """Backward column-scatter windowing (round 4): per-128-grid-col-tile
    j-windows replace the dense (Wb x B) scatter matmul. Voxel AND light
    gradients vs the jnp sweep, and bitwise vs the dense-scatter
    kernels."""
    from volumetricrenderer_tpu.ops.lighting import \
        light_transmittance_volume
    cfg = RenderConfig(emission=True, quadrature="sliced")
    medium = MediumConfig(combine="single", density=8.0)
    cam = make_camera(CameraConfig(eye=(0.4, 0.3, 3.0), width=192,
                                   height=96))
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.uniform(0.2, 1.0, (8, 192, 384)), jnp.float32)
    plan = plan_sweep(cam, grid.shape, cfg, force_base_dims=(256, 512))
    assert 0 < plan.scatter_window < 512, plan.scatter_window
    light = LightConfig(ambient=0.2)
    lvol = light_transmittance_volume(grid, light, cfg, medium)

    def loss_p(g, l, p):
        m = _pallas_base(g, p, cfg, medium, light, l)
        return jnp.sum(m[1]) + jnp.sum(m[2] ** 2)

    def loss_j(g, l):
        m = _jnp_base(g, plan, cfg, medium, light, l)
        return jnp.sum(m[1]) + jnp.sum(m[2] ** 2)

    g1, l1 = jax.grad(lambda g, l: loss_p(g, l, plan),
                      argnums=(0, 1))(grid, lvol)
    g2, l2 = jax.grad(loss_j, argnums=(0, 1))(grid, lvol)
    for got, ref, name in ((g1, g2, "dgrid"), (l1, l2, "dlight")):
        scale = float(jnp.abs(ref).max()) + 1e-12
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4 * scale,
                                   err_msg=name)
    pd = dataclasses.replace(plan, scatter_window=0)
    g3, l3 = jax.grad(lambda g, l: loss_p(g, l, pd),
                      argnums=(0, 1))(grid, lvol)
    # Windowed vs dense: near-bitwise. With the r5 sigT backward the
    # sigma recompute contracts against the scatter matrices themselves,
    # so the windowed form's per-tile partial sums group f32 additions
    # differently than the dense single dot — a pure ulp-level
    # (summation-order) difference, bounded here at ~1e-7 absolute.
    for a, b in ((g1, g3), (l1, l3)):
        scale = float(jnp.abs(b).max()) + 1e-12
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6 * scale)


def test_wck_elision_matches_stored_checkpoint():
    """The no-light backward derives its chunk-entry wsum from the
    transmittance checkpoint (wsum == 1 - T telescoping). Gradients must
    match the stored-checkpoint form (VOLT_FORCE_WCK=1) to accumulation
    rounding."""
    import os

    cfg, medium, plan, grid, light, _ = _setup((3.0, 3.0, 3.0), True)

    def grad_of(force):
        old = os.environ.get("VOLT_FORCE_WCK")
        os.environ["VOLT_FORCE_WCK"] = "1" if force else "0"
        sp._fused_vjp.cache_clear()
        try:
            def loss(g):
                maps = _pallas_base(g, plan, cfg, medium, light, None)
                return (jnp.sum(maps[1] ** 2) + jnp.sum(maps[2] ** 2))
            return np.asarray(jax.grad(loss)(grid))
        finally:
            if old is None:
                os.environ.pop("VOLT_FORCE_WCK", None)
            else:
                os.environ["VOLT_FORCE_WCK"] = old
            sp._fused_vjp.cache_clear()

    g_elided = grad_of(False)
    g_stored = grad_of(True)
    scale = np.abs(g_stored).max()
    np.testing.assert_allclose(g_elided, g_stored, rtol=1e-4,
                               atol=1e-5 * scale)
