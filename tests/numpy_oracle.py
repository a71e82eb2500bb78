"""Independent float64 NumPy implementation of the render math, written
separately from the JAX package (no shared helpers) so golden-numeric tests
cross-check two implementations. Mirrors shaders/frag.glsl:18-81 semantics:
slab AABB, fixed-step march, per-channel scale/scroll trilinear samples,
(s1*s2)*(s3+s4)*scale combine, Beer-Lambert. Loopy and slow on purpose.
"""
import numpy as np


def mirror_index(i, n):
    period = 2 * n
    m = np.mod(i, period)
    return np.where(m >= n, period - 1 - m, m)


def trilinear(grid, coord, mode="mirror"):
    """grid (D,H,W) float; coord (3,) = (x,y,z) normalized. Scalar sample."""
    D, H, W = grid.shape
    x = coord[0] * W - 0.5
    y = coord[1] * H - 0.5
    z = coord[2] * D - 0.5
    x0, y0, z0 = int(np.floor(x)), int(np.floor(y)), int(np.floor(z))
    fx, fy, fz = x - x0, y - y0, z - z0

    def wrap(i, n):
        if mode == "mirror":
            return int(mirror_index(np.array(i), n))
        if mode == "clamp":
            return min(max(i, 0), n - 1)
        return i % n

    acc = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = ((fx if dx else 1 - fx)
                     * (fy if dy else 1 - fy)
                     * (fz if dz else 1 - fz))
                acc += w * grid[wrap(z0 + dz, D), wrap(y0 + dy, H),
                                wrap(x0 + dx, W)]
    return acc


def intersect_aabb(o, d, bmin, bmax):
    eps = 1e-12
    d = np.where(np.abs(d) < eps, np.where(d < 0, -eps, eps), d)
    t_min = (bmin - o) / d
    t_max = (bmax - o) / d
    t1 = np.minimum(t_min, t_max)
    t2 = np.maximum(t_min, t_max)
    return t1.max(), t2.min()


def render_ray_absorption(grid4, o, d, *, max_steps=128, step=4.0 / 128.0,
                          bmin=(-1.0, -1.0, -1.0), bmax=(1.0, 1.0, 1.0),
                          coord_scale=(1.0, 0.8, 0.75, 0.7),
                          scroll_weight=(0.0, 0.2, 0.25, 0.3),
                          scroll=None, sample_scale=0.2, density=1.0,
                          combine="reference", mode="mirror"):
    """One ray, absorption-only march. grid4: (D,H,W,C). Returns RGBA (4,)."""
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    bmin = np.asarray(bmin, np.float64)
    bmax = np.asarray(bmax, np.float64)
    tn, tf = intersect_aabb(o, d, bmin, bmax)
    if not (tn <= tf and tf > 0):
        return np.array([0.0, 0.0, 0.0, 0.0])
    t0 = max(tn, 0.0)
    n_steps = min(max_steps, int(np.floor(max(tf - t0, 0.0) / step)))
    rng = bmax - bmin
    p = (o + d * t0 - bmin) / rng
    dstep = step * d / rng
    if scroll is None:
        scroll = np.zeros((grid4.shape[-1], 3))
    accum = 0.0
    for _ in range(n_steps):
        if combine == "reference":
            s = [
                trilinear(grid4[..., c],
                          p * coord_scale[c] + scroll[c] * scroll_weight[c],
                          mode)
                for c in range(4)
            ]
            sigma = (s[0] * s[1]) * (s[2] + s[3]) * sample_scale
        else:
            sigma = trilinear(grid4[..., 0], p, mode) * sample_scale
        accum += sigma
        p = p + dstep
    od = density * accum * step
    g = 1.0 - np.exp(-od)
    return np.array([g, g, g, 1.0])


def render_ray_emission(grid, o, d, *, max_steps=128, step=4.0 / 128.0,
                        bmin=(-1.0, -1.0, -1.0), bmax=(1.0, 1.0, 1.0),
                        sample_scale=0.2, density=1.0, ambient=0.1,
                        light_color=(1.0, 1.0, 1.0), mode="mirror",
                        early_eps=0.0):
    """One ray, emission-absorption front-to-back, single-channel grid,
    no shadow march. Returns RGBA (4,)."""
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    bmin = np.asarray(bmin, np.float64)
    bmax = np.asarray(bmax, np.float64)
    tn, tf = intersect_aabb(o, d, bmin, bmax)
    if not (tn <= tf and tf > 0):
        return np.array([0.0, 0.0, 0.0, 0.0])
    t0 = max(tn, 0.0)
    n_steps = min(max_steps, int(np.floor(max(tf - t0, 0.0) / step)))
    rng = bmax - bmin
    p = (o + d * t0 - bmin) / rng
    dstep = step * d / rng
    T = 1.0
    C = np.zeros(3)
    lc = np.asarray(light_color, np.float64)
    for _ in range(n_steps):
        if T <= early_eps:
            break
        sigma = trilinear(grid, p, mode) * sample_scale
        alpha = 1.0 - np.exp(-density * sigma * step)
        shade = ambient + (1.0 - ambient) * 1.0
        C = C + T * alpha * shade * lc
        T = T * (1.0 - alpha)
        p = p + dstep
    return np.array([C[0], C[1], C[2], 1.0 - T])
