"""Parity tests for the 4-channel reference-combine fused Pallas kernels
(kernels/sweep_pallas.py `sweep_base_pallas_ref`): the "reference" preset's
media — per-channel coordinate scale + scroll, mirror addressing, combine
(s1*s2)*(s3+s4)*scale (frag.glsl:63-71) — in interpret mode on CPU vs the
jnp sweep, forward and gradients, both emission modes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volumetricrenderer_tpu.config import (CameraConfig, MediumConfig,
                                           RenderConfig)
from volumetricrenderer_tpu.kernels import sweep_pallas as sp
from volumetricrenderer_tpu.ops.camera import make_camera
from volumetricrenderer_tpu.ops.integrate import reference_media_scroll
from volumetricrenderer_tpu.ops.sweep import _sweep_base, plan_sweep

D = 16


def _setup(emission, eye=(3.0, 3.0, 3.0), seed=0):
    cfg = RenderConfig(emission=emission, quadrature="sliced",
                       address_mode="mirror")
    medium = MediumConfig(combine="reference", density=1.0)
    cam = make_camera(CameraConfig(eye=eye, width=96, height=64))
    rng = np.random.default_rng(seed)
    grid = jnp.asarray(rng.uniform(0.1, 1.0, (D, D, D, 4)), jnp.float32)
    plan = plan_sweep(cam, grid.shape, cfg)
    return cfg, medium, plan, grid


def _jnp_base(grid, plan, cfg, medium, scroll):
    gperm = jnp.transpose(grid, plan.perm + (3,))
    return _sweep_base(gperm, None, plan.slice_z, plan.v_grid, plan.u_grid,
                       plan.seglen, plan, cfg, medium, None, scroll)


def _pallas_base(grid, plan, cfg, medium, scroll):
    gperm = jnp.transpose(grid, plan.perm + (3,))
    return sp.sweep_base_pallas_ref(gperm, plan, cfg, medium, None,
                                    scroll=scroll, interpret=True)


def _close(a, b):
    for x, y, n in zip(a, b, ("acc", "trans", "wsum", "hit")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5, err_msg=n)


@pytest.mark.parametrize("emission", [False, True])
@pytest.mark.parametrize("t", [0.0, 1.7])
def test_forward_parity(emission, t):
    cfg, medium, plan, grid = _setup(emission)
    scroll = reference_media_scroll(t) if t else None
    _close(_pallas_base(grid, plan, cfg, medium, scroll),
           _jnp_base(grid, plan, cfg, medium, scroll))


@pytest.mark.parametrize("eye", [(-3.0, 2.5, 2.0), (2.0, -3.2, 2.4),
                                 (1.5, 2.0, 3.4)])
def test_forward_parity_axes(eye):
    cfg, medium, plan, grid = _setup(True, eye=eye)
    _close(_pallas_base(grid, plan, cfg, medium, None),
           _jnp_base(grid, plan, cfg, medium, None))


@pytest.mark.parametrize("emission", [False, True])
def test_grad_parity(emission):
    cfg, medium, plan, grid = _setup(emission, seed=3)
    scroll = reference_media_scroll(0.9)

    def loss(base_fn, g):
        acc, trans, wsum, hit = base_fn(g, plan, cfg, medium, scroll)
        return (jnp.sum(wsum ** 2) + jnp.sum(trans ** 2)
                + jnp.sum(acc ** 2) * 0.1)

    with jax.default_matmul_precision("highest"):
        gp = np.asarray(jax.grad(lambda g: loss(_pallas_base, g))(grid))
        gj = np.asarray(jax.grad(lambda g: loss(_jnp_base, g))(grid))
    scale = np.abs(gj).max()
    np.testing.assert_allclose(gp, gj, rtol=2e-3, atol=2e-3 * scale)
    assert scale > 0


def test_supported_gate_reference():
    cfg, medium, plan, grid = _setup(False)
    scroll = reference_media_scroll(1.0)
    assert sp.supported(plan, cfg, medium, None, scroll, 4, D)
    # clamp addressing: the scrolled coords leave [0,1]; jnp path only
    import dataclasses
    cfg_clamp = dataclasses.replace(cfg, address_mode="clamp")
    assert not sp.supported(plan, cfg_clamp, medium, None, scroll, 4, D)
    # single-channel grid with reference combine is invalid
    assert not sp.supported(plan, cfg, medium, None, None, 3, D)


def test_reference_preset_end_to_end_pallas():
    """sweep_render with use_pallas (interpret) on reference-preset media
    matches the jnp path end to end (image space)."""
    from volumetricrenderer_tpu.ops.sweep import sweep_render
    cfg, medium, plan, grid = _setup(False)
    scroll = reference_media_scroll(0.5)
    a = sweep_render(grid, plan, cfg, medium, scroll=scroll,
                     use_pallas=False)
    gperm_maps = _pallas_base(grid, plan, cfg, medium, scroll)
    from volumetricrenderer_tpu.ops.sweep import finish_image
    b = finish_image(gperm_maps, plan, cfg, medium, pallas_warp=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-4)


def test_reference_combine_light_volume_parity():
    """Round 4 (VERDICT r3 item 7): a shadowed reference-combine scene
    runs through the fused kernels (light-transmittance shading at
    unscaled coords) instead of silently falling back to the jnp sweep.
    Forward + voxel AND light gradients vs the jnp sweep."""
    from volumetricrenderer_tpu.config import LightConfig
    from volumetricrenderer_tpu.ops.lighting import \
        light_transmittance_volume
    cfg = RenderConfig(emission=True, quadrature="sliced",
                       address_mode="mirror")
    medium = MediumConfig(combine="reference", density=8.0)
    light = LightConfig(ambient=0.2, shadow_steps=32)
    cam = make_camera(CameraConfig(eye=(3.0, 0.4, 0.3), width=96,
                                   height=64))
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.uniform(0.2, 1.0, (D, D, D, 4)), jnp.float32)
    scroll = reference_media_scroll(0.7)
    plan = plan_sweep(cam, grid.shape, cfg)
    lvol = light_transmittance_volume(grid, light, cfg, medium,
                                      scroll=scroll)
    assert sp.supported(plan, cfg, medium, lvol, scroll, 4, D)
    gperm = jnp.transpose(grid, plan.perm + (3,))
    lperm = jnp.transpose(lvol, plan.perm)

    ref = _sweep_base(gperm, lperm, plan.slice_z, plan.v_grid,
                      plan.u_grid, plan.seglen, plan, cfg, medium, light,
                      scroll)
    got = sp.sweep_base_pallas(gperm, plan, cfg, medium, light,
                               lperm=lperm, scroll=scroll, interpret=True)
    for x, y, n in zip(ref, got, ("acc", "trans", "wsum", "hit")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5, err_msg=n)

    def loss_p(g, l):
        m = sp.sweep_base_pallas(g, plan, cfg, medium, light, lperm=l,
                                 scroll=scroll, interpret=True)
        return jnp.sum(m[1]) + jnp.sum(m[2] ** 2)

    def loss_j(g, l):
        m = _sweep_base(g, l, plan.slice_z, plan.v_grid, plan.u_grid,
                        plan.seglen, plan, cfg, medium, light, scroll)
        return jnp.sum(m[1]) + jnp.sum(m[2] ** 2)

    g1, l1 = jax.grad(loss_p, argnums=(0, 1))(gperm, lperm)
    g2, l2 = jax.grad(loss_j, argnums=(0, 1))(gperm, lperm)
    for got_g, ref_g, name in ((g1, g2, "dgrid"), (l1, l2, "dlight")):
        scale = float(jnp.abs(ref_g).max()) + 1e-12
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                                   rtol=2e-4, atol=2e-4 * scale,
                                   err_msg=name)


def test_reference_combine_colmm_parity():
    """The matmul column stage in the 4-channel kernels (round 4): a
    grid whose column count tiles the 128 lanes activates it (the D=16
    tests exercise the gather fallback). Forward + gradients vs the jnp
    sweep, with scroll + mirror-scaled taps."""
    cfg = RenderConfig(emission=True, quadrature="sliced",
                       address_mode="mirror")
    medium = MediumConfig(combine="reference", density=4.0)
    cam = make_camera(CameraConfig(eye=(0.4, 0.3, 3.0), width=96,
                                   height=64))
    rng = np.random.default_rng(3)
    grid = jnp.asarray(rng.uniform(0.1, 1.0, (8, 64, 128, 4)),
                       jnp.float32)
    scroll = reference_media_scroll(0.5)
    plan = plan_sweep(cam, grid.shape, cfg)
    gperm = jnp.transpose(grid, plan.perm + (3,))
    ref = _sweep_base(gperm, None, plan.slice_z, plan.v_grid, plan.u_grid,
                      plan.seglen, plan, cfg, medium, None, scroll)
    got = sp.sweep_base_pallas_ref(gperm, plan, cfg, medium, None,
                                   scroll=scroll, interpret=True)
    for x, y, n in zip(ref, got, ("acc", "trans", "wsum", "hit")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5, err_msg=n)

    def loss_p(g):
        m = sp.sweep_base_pallas_ref(g, plan, cfg, medium, None,
                                     scroll=scroll, interpret=True)
        return jnp.sum(m[1]) + jnp.sum(m[2] ** 2)

    def loss_j(g):
        m = _sweep_base(g, None, plan.slice_z, plan.v_grid, plan.u_grid,
                        plan.seglen, plan, cfg, medium, None, scroll)
        return jnp.sum(m[1]) + jnp.sum(m[2] ** 2)

    g1 = np.asarray(jax.grad(loss_p)(gperm))
    g2 = np.asarray(jax.grad(loss_j)(gperm))
    scale = np.abs(g2).max() + 1e-12
    np.testing.assert_allclose(g1, g2, rtol=2e-4, atol=2e-4 * scale)
