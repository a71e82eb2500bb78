"""Unit tests for camera ray generation (replaces the reference's
rasterized cube-proxy ray construction, frag.glsl:36-38)."""
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.config import CameraConfig
from volumetricrenderer_tpu.ops.camera import (camera_rays, make_camera,
                                               orbit_camera)


def test_rays_unit_and_shapes():
    cam = make_camera(CameraConfig(width=32, height=16))
    o, d = camera_rays(cam)
    assert o.shape == (16, 32, 3) and d.shape == (16, 32, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(o), np.broadcast_to([3.0, 3.0, 3.0], o.shape), atol=1e-6)


def test_center_ray_is_forward():
    cam = make_camera(CameraConfig(width=33, height=33))
    _, d = camera_rays(cam)
    center = np.asarray(d[16, 16])
    fwd = np.asarray(cam.forward)
    np.testing.assert_allclose(center, fwd, atol=1e-5)


def test_fov_edges():
    # Top-center ray makes exactly fov/2 with forward (pixel centers are
    # half a pixel inside, so use the analytic y at that pixel).
    h, w = 64, 64
    cam = make_camera(CameraConfig(eye=(0, 0, 5), center=(0, 0, 0),
                                   up=(0, 1, 0), width=w, height=h,
                                   fov_y_degrees=90.0))
    _, d = camera_rays(cam)
    y_top = 1.0 - 1.0 / h  # ndc y of row 0 center
    expect = np.arctan(y_top * np.tan(np.pi / 4))
    top = np.asarray(d[0, w // 2])
    ang = np.arccos(np.clip(np.dot(top, np.asarray(cam.forward)), -1, 1))
    np.testing.assert_allclose(ang, expect, atol=1e-4)


def test_row0_is_top():
    # up=(0,0,1), so row 0 rays should have larger z-component than last row.
    cam = make_camera(CameraConfig(width=16, height=16))
    _, d = camera_rays(cam)
    assert float(d[0, 8, 2]) > float(d[15, 8, 2])


def test_orbit_passes_reference_eye():
    # t = pi/4 should reproduce the demo's fixed camera eye (3,3,3)
    # (TestMain.cpp:225,242).
    cam = orbit_camera(jnp.pi / 4)
    np.testing.assert_allclose(np.asarray(cam.eye), [3.0, 3.0, 3.0],
                               atol=1e-4)


def test_basis_orthonormal():
    cam = make_camera(CameraConfig())
    r, u, f = map(np.asarray, (cam.right, cam.up, cam.forward))
    for v in (r, u, f):
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-6)
    assert abs(np.dot(r, u)) < 1e-6
    assert abs(np.dot(r, f)) < 1e-6
    assert abs(np.dot(u, f)) < 1e-6
