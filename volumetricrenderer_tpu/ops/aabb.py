"""Ray / axis-aligned-box intersection — the slab method, replicating
IntersectAABB at shaders/frag.glsl:18-27 (tNear = max of per-axis entry
times, tFar = min of per-axis exit times), vectorized over ray batches.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def intersect_aabb(origins, directions, box_min, box_max,
                   eps=1e-12) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab intersection of rays with one AABB.

    origins, directions: (..., 3); box_min/box_max: (3,) or broadcastable.
    Returns (t_near, t_far), each (...). A ray hits iff
    t_near <= t_far and t_far >= 0 (same convention the reference relies on;
    its rasterizer guarantees hits, ours must test explicitly).

    The GLSL divides by the raw direction (frag.glsl:20-21) relying on IEEE
    inf semantics for zero components; we guard the denominator with a tiny
    signed epsilon so XLA never emits 0/0 NaNs for rays in a box face plane.
    """
    d = jnp.asarray(directions, jnp.float32)
    o = jnp.asarray(origins, jnp.float32)
    box_min = jnp.asarray(box_min, jnp.float32)
    box_max = jnp.asarray(box_max, jnp.float32)

    safe_d = jnp.where(jnp.abs(d) < eps, jnp.where(d < 0, -eps, eps), d)
    inv_d = 1.0 / safe_d
    t_min = (box_min - o) * inv_d
    t_max = (box_max - o) * inv_d
    t1 = jnp.minimum(t_min, t_max)
    t2 = jnp.maximum(t_min, t_max)
    t_near = jnp.max(t1, axis=-1)
    t_far = jnp.min(t2, axis=-1)
    return t_near, t_far
