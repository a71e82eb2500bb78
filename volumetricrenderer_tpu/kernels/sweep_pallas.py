"""Fused Pallas TPU kernel for the slice-sweep hot loop.

This is the hand-tiled version of ops/sweep._sweep_base for the common
case (combine="single", slices at voxel centers, no shadow volume). Per
(base-row-block, slice-chunk) grid step it fuses:

  * the y-resample MXU dot  t = Wa_block @ G_s  (the banded row matrices
    are precomputed once per frame and *streamed*, not rebuilt per block
    — rebuilding them per (block, slice) was measured to dominate),
  * the x-resample as **lane dynamic_gathers**: `sigma[r, j] =
    (1-f_j) * t[r, b0_j] + f_j * t[r, b1_j]` runs as
    `jnp.take_along_axis(..., axis=1)` over 128-lane chunks — the one
    data-dependent access TPU supports natively. This replaces a
    (B x Wb) matrix build + (RB x B)@(B x Wb) dot with O(RB x Wb) vector
    work: the same two products the banded matmul would compute, exactly.
  * Beer-Lambert compositing with the carry *resident on chip*: the
    output blocks are revisited across the slice dimension (slice = minor
    grid axis), so (acc, trans, wsum, hit) never round-trip HBM between
    slices.

Color factorization: with a constant light color, the per-slice color
contribution is w * lcol with w = trans * alpha * shade, so the kernel
accumulates the scalar field wsum and the caller forms
color = wsum[..., None] * lcol afterwards (exactly equal).

Address modes: inside the box, positions lie in [0,1], where mirror and
clamp addressing agree texel-for-texel (mirror reflects only past the
edge texel); out-of-box rows/cols are zeroed, so the kernel is exact for
mirror and clamp (wrap differs at the half-texel border and falls back to
the jnp path).

Backward: `sweep_base_pallas` is a jax.custom_vjp whose backward runs the
(allclose-validated) jnp _sweep_base under jax.vjp — identical math, so
gradients keep their oracle parity while forward rendering takes the
fused kernel.

Reference lineage: this kernel occupies the architectural slot of the
reference's fragment shader (shaders/frag.glsl:34-81) — the per-pixel
hot loop — reformulated for MXU + lane-gather (SURVEY.md section 2,
component 25).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import LightConfig, MediumConfig, RenderConfig

RB = 128     # base rows per block (plan base dims are multiples of 128)
CHUNK = 8    # slices per grid step (statically unrolled in the kernel)
LANES = 128

__all__ = ["supported", "sweep_base_pallas"]


def supported(plan, cfg: RenderConfig, medium: MediumConfig,
              light_volume, scroll, grid_ndim: int, depth: int) -> bool:
    """Static gate for the fused kernel (the jnp sweep covers the rest)."""
    Hb, Wb = plan.base_shape
    return (medium.combine == "single"
            and light_volume is None
            and scroll is None
            and grid_ndim == 3
            and plan.slice_z.shape[0] == depth
            and cfg.address_mode in ("mirror", "clamp")
            and Hb % RB == 0
            and Wb % LANES == 0)


def _kernel(slice_z_ref, params_ref, g_ref, wa_ref, ug_ref, seg_ref,
            acc_ref, trans_ref, wsum_ref, hit_ref, *, emission, ch):
    sc = pl.program_id(1)

    @pl.when(sc == 0)
    def _():
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
        trans_ref[:] = jnp.ones(trans_ref.shape, jnp.float32)
        wsum_ref[:] = jnp.zeros(wsum_ref.shape, jnp.float32)
        hit_ref[:] = jnp.zeros(hit_ref.shape, jnp.float32)

    e_k, e_b = params_ref[0], params_ref[2]
    sign, density, sscale = params_ref[3], params_ref[4], params_ref[5]
    thresh = params_ref[6]
    B = g_ref.shape[2]
    Wb_n = ug_ref.shape[1]
    n_pieces = max(1, B // LANES)

    for c in range(ch):
        z = slice_z_ref[sc * ch + c]
        delta = z - e_k

        @pl.when(delta * sign > 0.0)
        def _(c=c, delta=delta):
            # y-resample on the MXU with the streamed banded row matrix
            # (rows outside the box are zero rows — built that way).
            t = jnp.dot(wa_ref[c], g_ref[c],
                        preferred_element_type=jnp.float32)  # (RB, B)
            if B < LANES:
                t = jnp.pad(t, ((0, 0), (0, LANES - B)))

            # x-resample as lane gathers, 128 output columns at a time.
            b01 = e_b + delta * ug_ref[0, :]             # (Wb_n,)
            pb = b01 * B - 0.5
            ibf = jnp.floor(pb)
            fb = pb - ibf
            ib = ibf.astype(jnp.int32)
            b_in = ((b01 >= 0.0) & (b01 <= 1.0)).astype(jnp.float32)
            i0 = jnp.clip(ib, 0, B - 1)
            i1 = jnp.clip(ib + 1, 0, B - 1)

            def lane_gather(idx_row):
                """t[r, idx[j]] for a 128-wide column chunk."""
                idx = jnp.broadcast_to(idx_row[None, :], (RB, LANES))
                if n_pieces == 1:
                    return jnp.take_along_axis(t, idx, axis=1)
                out = jnp.zeros((RB, LANES), jnp.float32)
                for p in range(n_pieces):
                    tp = t[:, p * LANES:(p + 1) * LANES]
                    local = jnp.clip(idx - p * LANES, 0, LANES - 1)
                    gp = jnp.take_along_axis(tp, local, axis=1)
                    inp = (idx >= p * LANES) & (idx < (p + 1) * LANES)
                    out = jnp.where(inp, gp, out)
                return out

            chunks = []
            for q in range(Wb_n // LANES):
                sl = slice(q * LANES, (q + 1) * LANES)
                g0 = lane_gather(i0[sl])
                g1 = lane_gather(i1[sl])
                w1 = fb[sl][None, :]
                sig_q = (g0 * (1.0 - w1) + g1 * w1) * b_in[sl][None, :]
                chunks.append(sig_q)
            sigma = jnp.concatenate(chunks, axis=1) * sscale  # (RB, Wb_n)

            if emission:
                trans = trans_ref[:]
                live = (trans > thresh).astype(jnp.float32)
                alpha = live * (
                    1.0 - jnp.exp(-density * sigma * seg_ref[:]))
                wsum_ref[:] = wsum_ref[:] + trans * alpha
                trans_ref[:] = trans * (1.0 - alpha)
            else:
                acc_ref[:] = acc_ref[:] + sigma * seg_ref[:]
                # hit: the in-box row indicator is encoded in Wa's zero
                # rows; recover it from the row sums (rows sum to 1 or 0).
                a_in = jnp.sum(wa_ref[c], axis=1, keepdims=True)
                hit_ref[:] = jnp.maximum(hit_ref[:], a_in * b_in[None, :])


def _run_kernel(gperm, slice_z, wa_all, u_grid, seglen, params, emission,
                interpret=False):
    S, A, B = gperm.shape
    Hb = wa_all.shape[1]
    Wb_n = u_grid.shape[0]
    n_rb = Hb // RB
    ch = math.gcd(CHUNK, S)
    n_sc = S // ch

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_rb, n_sc),
        in_specs=[
            pl.BlockSpec((ch, A, B), lambda rb, sc, *_: (sc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, RB, A), lambda rb, sc, *_: (sc, rb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Wb_n), lambda rb, sc, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, Wb_n), lambda rb, sc, *_: (rb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RB, Wb_n), lambda rb, sc, *_: (rb, 0),
                         memory_space=pltpu.VMEM)
        ] * 4,
    )
    out_shape = [jax.ShapeDtypeStruct((Hb, Wb_n), jnp.float32)] * 4
    acc, trans, wsum, hit = pl.pallas_call(
        functools.partial(_kernel, emission=emission, ch=ch),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * Hb * A * B + 10 * S * Hb * Wb_n,
            bytes_accessed=4 * (n_rb * S * A * B + S * Hb * A
                                + 5 * Hb * Wb_n),
            transcendentals=S * Hb * Wb_n,
        ),
        interpret=interpret,
    )(slice_z, params, gperm, wa_all, u_grid.reshape(1, Wb_n), seglen)
    return acc, trans, wsum, hit


def _params_for(plan, cfg, medium):
    return jnp.stack([
        plan.eye01[0], plan.eye01[1], plan.eye01[2],
        jnp.float32(plan.sign),
        jnp.float32(medium.density),
        jnp.float32(medium.sample_scale),
        jnp.float32(cfg.early_stop_transmittance),
        jnp.float32(0.0),
    ])


def _row_matrices(plan, A, address_mode):
    """Banded y-resample matrices for every slice, (S, Hb, A), with zero
    rows outside the box (built once per frame in XLA, streamed by the
    kernel)."""
    from ..ops.resample import linear_resample_matrix

    def one(z):
        a01 = plan.eye01[1] + (z - plan.eye01[0]) * plan.v_grid
        return linear_resample_matrix(a01, A, address_mode,
                                      zero_outside=True)

    return jax.vmap(one)(plan.slice_z)


def sweep_base_pallas(gperm, plan, cfg, medium, light, interpret=False):
    """(acc, trans, color, hit) base maps via the fused kernel; backward
    is the jnp sweep's VJP (same math, oracle-validated). plan arrays are
    closed over (constants w.r.t. differentiation)."""
    lt = light if light is not None else LightConfig()
    lcol = jnp.asarray(lt.color, jnp.float32)
    params = _params_for(plan, cfg, medium)
    wa_all = jax.lax.stop_gradient(
        _row_matrices(plan, gperm.shape[1], cfg.address_mode))

    @jax.custom_vjp
    def f(g):
        # The kernel pairs slice index s with layer s: feed layers in
        # front-to-back order (slice_z is reversed when sign < 0).
        g_f2b = g if plan.sign > 0 else g[::-1]
        acc, trans, wsum, hit = _run_kernel(
            g_f2b, plan.slice_z, wa_all, plan.u_grid, plan.seglen,
            params, cfg.emission, interpret)
        return acc, trans, wsum[..., None] * lcol, hit

    def f_fwd(g):
        return f(g), g

    def f_bwd(g, ct):
        from ..ops.sweep import _sweep_base

        def jnp_base(gp):
            return _sweep_base(gp, None, plan.slice_z, plan.v_grid,
                               plan.u_grid, plan.seglen, plan, cfg, medium,
                               light, None)

        _, vjp = jax.vjp(jnp_base, g)
        return vjp(ct)

    f.defvjp(f_fwd, f_bwd)
    return f(gperm)
