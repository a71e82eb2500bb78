"""Unit tests for procedural noise (the FastNoise2 equivalent,
TestMain.cpp:43-62)."""
import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.ops import noise


def _coords(n, lo=-10.0, hi=10.0, seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.uniform(lo, hi, size=(n, 3)), jnp.float32)


def test_perlin_zero_at_lattice():
    # Classic Perlin is exactly 0 at integer lattice points.
    pts = jnp.asarray(np.random.default_rng(1).integers(-50, 50, (64, 3)),
                      jnp.float32)
    v = noise.perlin3(pts, seed=3)
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-5)


def test_perlin_range_and_determinism():
    c = _coords(4096)
    v1 = np.asarray(noise.perlin3(c, seed=3))
    v2 = np.asarray(noise.perlin3(c, seed=3))
    np.testing.assert_array_equal(v1, v2)
    assert np.all(np.abs(v1) <= 1.0 + 1e-4)
    assert v1.std() > 0.05  # not degenerate


def test_seeds_decorrelate():
    c = _coords(4096)
    for gen in (noise.perlin3, noise.simplex3, noise.cellular3):
        a = np.asarray(gen(c, seed=1))
        b = np.asarray(gen(c, seed=2))
        corr = np.corrcoef(a, b)[0, 1]
        assert abs(corr) < 0.2, f"{gen.__name__} seeds correlated: {corr}"


def test_simplex_range():
    v = np.asarray(noise.simplex3(_coords(8192), seed=4))
    assert np.all(np.abs(v) <= 1.05)
    assert v.std() > 0.05


def test_cellular_properties():
    v = np.asarray(noise.cellular3(_coords(4096), seed=1))
    # distance-based: bounded, mostly in [-1, 1.4]
    assert v.min() >= -1.0 - 1e-5
    assert v.max() < 2.0
    assert v.std() > 0.05


def test_noise_continuity():
    # Small coordinate perturbations produce small value changes.
    c = _coords(512)
    eps = 1e-3
    for gen in (noise.perlin3, noise.simplex3):
        a = np.asarray(gen(c, seed=5))
        b = np.asarray(gen(c + eps, seed=5))
        assert np.max(np.abs(a - b)) < 0.05


def test_fbm_octaves():
    c = _coords(1024)
    v1 = np.asarray(noise.fbm3(c, seed=6, octaves=1))
    v5 = np.asarray(noise.fbm3(c, seed=6, octaves=5))
    p1 = np.asarray(noise.perlin3(c, seed=6))
    np.testing.assert_allclose(v1, p1, rtol=1e-5, atol=1e-6)
    assert not np.allclose(v1, v5)


def test_noise_grid_layout():
    # noise_grid (z-major, TestMain.cpp:69-90): grid[z,y,x] == gen((x,y,z)*f)
    size, freq, seed = 8, 0.19, 3
    g = np.asarray(noise.noise_grid("perlin", size, freq, seed))
    assert g.shape == (size, size, size)
    pt = jnp.asarray([[5 * freq, 2 * freq, 7 * freq]], jnp.float32)
    v = float(noise.perlin3(pt, seed)[0])
    np.testing.assert_allclose(g[7, 2, 5], v, rtol=1e-5, atol=1e-6)


def test_noise_jits():
    f = jax.jit(lambda c: noise.fbm3(c, seed=7, octaves=3))
    c = _coords(256)
    np.testing.assert_allclose(np.asarray(f(c)),
                               np.asarray(noise.fbm3(c, seed=7, octaves=3)),
                               rtol=1e-5, atol=1e-5)
