"""Parity tests for the fused Pallas warp kernels (interpret mode).

Forward vs ops/resample.sample_bilinear_2d (clamp) on valid pixels;
backward vs the adjoint identity <warp(B), ct> == <B, splat(ct)> and vs
the jnp windowed-matmul splat used on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volumetricrenderer_tpu.config import CameraConfig, RenderConfig
from volumetricrenderer_tpu.kernels import warp_pallas as wp
from volumetricrenderer_tpu.ops.camera import make_camera
from volumetricrenderer_tpu.ops.resample import sample_bilinear_2d
from volumetricrenderer_tpu.ops.sweep import (_in01, _warp_bilinear,
                                              plan_sweep)

CAMS = {
    "corner": CameraConfig(eye=(3.0, 3.0, 3.0), width=200, height=72),
    "axis": CameraConfig(eye=(-3.0, 0.4, 0.3), width=96, height=64),
    "rolled": CameraConfig(eye=(2.0, 2.5, 2.2), up=(0.5, 1.0, 0.3),
                           width=160, height=88),
    "diag": CameraConfig(eye=(1.5, 1.2, 3.2), width=120, height=90),
}


def _plan(name):
    cfg = RenderConfig(emission=True, quadrature="sliced")
    cam = make_camera(CAMS[name])
    return plan_sweep(cam, (16, 16, 16), cfg), cam


def _run_fwd(base, plan):
    H, W = plan.warp_rows01.shape
    rp = wp.pad_pixels(plan.warp_rows01, -1.0)
    cp = wp.pad_pixels(plan.warp_cols01, -1.0)
    out = wp.warp_forward(jnp.moveaxis(base, -1, 0), rp, cp,
                          plan.warp_tile_lo, plan.warp_band,
                          interpret=True)
    return jnp.moveaxis(out, 0, -1)[:H, :W]


@pytest.mark.parametrize("cam_name", sorted(CAMS))
def test_warp_forward_parity(cam_name):
    plan, cam = _plan(cam_name)
    rng = np.random.default_rng(1)
    Hb, Wb = plan.base_shape
    base = jnp.asarray(rng.normal(size=(Hb, Wb, 3)), jnp.float32)
    ref = sample_bilinear_2d(base, plan.warp_rows01, plan.warp_cols01,
                             "clamp")
    got = _run_fwd(base, plan)
    valid = np.asarray(_in01(plan.warp_rows01) & _in01(plan.warp_cols01))
    assert valid.any()
    np.testing.assert_allclose(np.asarray(got)[valid],
                               np.asarray(ref)[valid],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cam_name", ["corner", "rolled"])
def test_warp_backward_adjoint_and_jnp_parity(cam_name):
    plan, cam = _plan(cam_name)
    rng = np.random.default_rng(2)
    Hb, Wb = plan.base_shape
    H, W = plan.warp_rows01.shape
    C = 4
    base = jnp.asarray(rng.normal(size=(Hb, Wb, C)), jnp.float32)
    valid = (_in01(plan.warp_rows01) & _in01(plan.warp_cols01))[..., None]
    ct = jnp.asarray(rng.normal(size=(H, W, C)), jnp.float32) * valid

    rp = wp.pad_pixels(plan.warp_rows01, -1.0)
    cp = wp.pad_pixels(plan.warp_cols01, -1.0)
    ctp = wp.pad_pixels(ct, 0.0)
    splat = jnp.moveaxis(
        wp.warp_backward(jnp.moveaxis(ctp, -1, 0), rp, cp,
                         plan.warp_tile_lo, plan.warp_band, Hb, Wb,
                         interpret=True), 0, -1)

    # Adjoint identity against the kernel's own forward (valid pixels).
    fwd = _run_fwd(base, plan) * valid
    lhs = float(jnp.sum(fwd * ct))
    rhs = float(jnp.sum(base * splat))
    assert abs(lhs - rhs) <= 1e-4 * (abs(lhs) + 1.0)

    # Parity with the jnp windowed-matmul splat (the CPU path).
    splat_jnp = jax.grad(lambda b: jnp.sum(_warp_bilinear(
        b, plan.warp_rows01, plan.warp_cols01, plan.warp_tile_lo,
        plan.warp_band, plan.warp_blk, False) * ct))(base)
    np.testing.assert_allclose(np.asarray(splat), np.asarray(splat_jnp),
                               rtol=1e-4, atol=1e-4)


def test_warp_bilinear_jnp_path_signature():
    """The integrated custom_vjp on the jnp path (use_pallas=False) with
    the (n, 3) tile table: forward shape + grads flow."""
    plan, cam = _plan("corner")
    rng = np.random.default_rng(3)
    Hb, Wb = plan.base_shape
    base = jnp.asarray(rng.normal(size=(Hb, Wb, 2)), jnp.float32)
    out = _warp_bilinear(base, plan.warp_rows01, plan.warp_cols01,
                         plan.warp_tile_lo, plan.warp_band, plan.warp_blk,
                         False)
    assert out.shape == (cam.height, cam.width, 2)
    g = jax.grad(lambda b: jnp.sum(_warp_bilinear(
        b, plan.warp_rows01, plan.warp_cols01, plan.warp_tile_lo,
        plan.warp_band, plan.warp_blk, False) ** 2))(base)
    assert g.shape == base.shape
