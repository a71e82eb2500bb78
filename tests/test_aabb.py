"""Unit tests for slab AABB intersection (frag.glsl:18-27 semantics)."""
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.ops.aabb import intersect_aabb

BMIN = (-1.0, -1.0, -1.0)
BMAX = (1.0, 1.0, 1.0)


def test_axis_aligned_hit():
    tn, tf = intersect_aabb(jnp.array([[-3.0, 0.0, 0.0]]),
                            jnp.array([[1.0, 0.0, 0.0]]), BMIN, BMAX)
    np.testing.assert_allclose(float(tn[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(tf[0]), 4.0, atol=1e-5)


def test_diagonal_hit():
    o = jnp.array([[3.0, 3.0, 3.0]])
    d = -o / jnp.linalg.norm(o)
    tn, tf = intersect_aabb(o, d, BMIN, BMAX)
    L = np.sqrt(27.0)
    np.testing.assert_allclose(float(tn[0]), L - np.sqrt(3), rtol=1e-5)
    np.testing.assert_allclose(float(tf[0]), L + np.sqrt(3), rtol=1e-5)


def test_miss():
    tn, tf = intersect_aabb(jnp.array([[-3.0, 5.0, 0.0]]),
                            jnp.array([[1.0, 0.0, 0.0]]), BMIN, BMAX)
    assert float(tn[0]) > float(tf[0])  # miss convention


def test_behind():
    tn, tf = intersect_aabb(jnp.array([[3.0, 0.0, 0.0]]),
                            jnp.array([[1.0, 0.0, 0.0]]), BMIN, BMAX)
    assert float(tf[0]) < 0  # box entirely behind origin


def test_inside_box():
    tn, tf = intersect_aabb(jnp.array([[0.0, 0.0, 0.0]]),
                            jnp.array([[0.0, 0.0, 1.0]]), BMIN, BMAX)
    np.testing.assert_allclose(float(tn[0]), -1.0, atol=1e-5)
    np.testing.assert_allclose(float(tf[0]), 1.0, atol=1e-5)


def test_zero_direction_component():
    # Ray parallel to a face, inside the slab: finite ts, no NaNs.
    tn, tf = intersect_aabb(jnp.array([[-3.0, 0.5, 0.5]]),
                            jnp.array([[1.0, 0.0, 0.0]]), BMIN, BMAX)
    assert np.isfinite(float(tn[0])) and np.isfinite(float(tf[0]))
    np.testing.assert_allclose(float(tn[0]), 2.0, atol=1e-4)
    # Parallel to face, outside the slab: must miss.
    tn, tf = intersect_aabb(jnp.array([[-3.0, 2.0, 0.0]]),
                            jnp.array([[1.0, 0.0, 0.0]]), BMIN, BMAX)
    assert float(tn[0]) > float(tf[0])


def test_batched_shapes():
    o = jnp.zeros((4, 5, 3))
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (4, 5, 3))
    tn, tf = intersect_aabb(o, d, BMIN, BMAX)
    assert tn.shape == (4, 5) and tf.shape == (4, 5)
