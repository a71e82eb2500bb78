"""Unit tests for trilinear sampling + address modes (the Vulkan
linear-sampler replacement, VulkanCore.cpp:676-710)."""
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.ops.sampling import (apply_address_mode,
                                                 dequantize_uint8,
                                                 sample_trilinear)

from numpy_oracle import trilinear as np_trilinear


def _rand_grid(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).uniform(size=shape),
                       jnp.float32)


def test_texel_centers_exact():
    g = _rand_grid((4, 5, 6))
    D, H, W = g.shape
    for (z, y, x) in [(0, 0, 0), (3, 4, 5), (1, 2, 3)]:
        coord = jnp.array([(x + 0.5) / W, (y + 0.5) / H, (z + 0.5) / D])
        v = float(sample_trilinear(g, coord))
        np.testing.assert_allclose(v, float(g[z, y, x]), rtol=1e-5)


def test_midpoint_interpolation():
    g = jnp.zeros((2, 2, 2), jnp.float32).at[0, 0, 1].set(1.0)
    # Halfway between texel centers (0,0,0) and (1,0,0) along x.
    coord = jnp.array([0.5, 0.25, 0.25])
    np.testing.assert_allclose(float(sample_trilinear(g, coord, "clamp")),
                               0.5, atol=1e-6)


def test_matches_numpy_oracle_interior():
    g = _rand_grid((8, 8, 8), seed=3)
    gn = np.asarray(g, np.float64)
    pts = np.random.default_rng(4).uniform(0.1, 0.9, size=(50, 3))
    got = np.asarray(sample_trilinear(g, jnp.asarray(pts, jnp.float32)))
    want = np.array([np_trilinear(gn, p) for p in pts])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_matches_numpy_oracle_out_of_range_mirror():
    g = _rand_grid((8, 8, 8), seed=5)
    gn = np.asarray(g, np.float64)
    pts = np.random.default_rng(6).uniform(-1.5, 2.5, size=(100, 3))
    got = np.asarray(sample_trilinear(g, jnp.asarray(pts, jnp.float32),
                                      "mirror"))
    want = np.array([np_trilinear(gn, p, "mirror") for p in pts])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_address_modes():
    n = 8
    idx = jnp.arange(-2 * n, 3 * n)
    for mode in ("mirror", "clamp", "wrap"):
        out = np.asarray(apply_address_mode(idx, n, mode))
        assert out.min() >= 0 and out.max() < n
    # Mirror specifics: -1 -> 0, n -> n-1 (reflect at boundaries)
    np.testing.assert_array_equal(
        np.asarray(apply_address_mode(jnp.array([-1, n]), n, "mirror")),
        [0, n - 1])


def test_mirror_continuity_across_boundary():
    g = _rand_grid((8, 8, 8), seed=7)
    eps = 1e-4
    a = float(sample_trilinear(g, jnp.array([1.0 - eps, 0.5, 0.5])))
    b = float(sample_trilinear(g, jnp.array([1.0 + eps, 0.5, 0.5])))
    assert abs(a - b) < 1e-2


def test_multichannel():
    g = _rand_grid((4, 4, 4, 3), seed=8)
    out = sample_trilinear(g, jnp.array([[0.3, 0.4, 0.5]]))
    assert out.shape == (1, 3)


def test_dequantize_uint8():
    u = jnp.array([0, 128, 255], jnp.uint8)
    np.testing.assert_allclose(np.asarray(dequantize_uint8(u)),
                               [0.0, 128 / 255.0, 1.0], rtol=1e-6)
