"""Fused Pallas TPU kernels for the base-grid <-> screen-pixel warp.

The slice sweep renders into a slope-space base grid; the final step
resamples it bilinearly at each pixel's (rows01, cols01) coordinates
(ops/sweep.warp_base_to_pixels). As plain XLA the forward is an arbitrary
2D gather — measured ~72 ms/frame at 1080p on v5e, ~7x the entire fused
sweep — because XLA lowers random-access gathers to a scalar path.

Both directions are reformulated around the plan's per-BASE-TILE pixel
rects (ops/sweep._device_plan): for every 64x64 base tile, the bounding
pixel rectangle of all pixels having a bilinear tap inside that tile
(tile_lo origin + static padded (BR, BC) extent). Each (pixel, tap) pair
lands in exactly one base tile, and two-banded weight matrices built from
iota compares do the matching, so both directions are *exact* bilinear
and exact transposes of each other:

  forward:  out[rect] += per-row  R_s (BC, T) @ [tile_c0 | .. | tile_c3]
            then a C_s-masked row reduction — accumulated into the full
            pixel image kept resident in VMEM across a sequential grid
            (pixel rects of different tiles overlap);
  backward: dtile = sum_s  G_s^T @ C_s,  G_s = [R_s * ct_c[s][:, None]],
            K = BC pixels (MXU-shaped); base tiles are DISJOINT, so the
            adjoint needs no accumulation buffer and no atomics at all —
            the "contention-free voxel-gradient scatter" trick of the
            sweep kernel (SURVEY.md §7 hard parts), applied to pixels.

Pixel rects are DMA'd from HBM on demand (dynamic offsets), so VMEM
holds only the output image (forward) or per-tile scratch (backward).

The jnp fallbacks in ops/sweep._warp_bilinear (gather forward +
scan-of-windowed-matmuls backward) remain for CPU and for cameras whose
rects exceed the plan guard (>3-tile pixel-block spans).

Reference lineage: the reference needs no warp (the rasterizer delivers
fragments in pixel space, shaders/vert.glsl:17-22); the warp is the price
of the MXU-friendly sweep reformulation and must not dominate it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 64    # base-tile edge (must equal ops/sweep._WARP_TILE)
PT_R = 8     # pixel padding granularity (sublanes)
PT_C = 128   # pixel padding granularity (lanes)
MAX_VMEM_IMG = 72 * 1024 * 1024  # full pixel image must fit in VMEM (fwd)

__all__ = ["supported", "warp_forward", "warp_backward", "pad_pixels",
           "TILE"]


def supported(band, img_shape, base_shape) -> bool:
    """Static gate: the padded pixel image must fit in VMEM alongside the
    per-tile scratch (forward keeps it resident)."""
    H, W, C = img_shape
    Hp, Wp = _round_up(H, PT_R), _round_up(W, PT_C)
    return (C * Hp * Wp * 4 <= MAX_VMEM_IMG
            and base_shape[0] % TILE == 0 and base_shape[1] % TILE == 0)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _ladder(x, step, rungs=(1, 2, 3, 4, 6, 8, 12, 16)):
    k = _round_up(x, step) // step
    for r in rungs:
        if k <= r:
            return step * r
    return step * k


def pad_pixels(x, fill):
    """Pad a (H, W[, C]) pixel array up to (PT_R, PT_C) multiples."""
    H, W = x.shape[:2]
    ph = (-H) % PT_R
    pw = (-W) % PT_C
    if not ph and not pw:
        return x
    pad = ((0, ph), (0, pw)) + ((0, 0),) * (x.ndim - 2)
    return jnp.pad(x, pad, constant_values=fill)


def _taps_local(q01, n, tile_origin):
    """Two-tap clamp-mode indices, local to this tile's rows/cols.
    Returns (l0, l1, f): local indices may fall outside [0, TILE) — the
    iota compares then contribute zero weight, which is exactly the
    per-tile ownership test (each tap is counted by its own tile only)."""
    p = q01 * n - 0.5
    i0f = jnp.floor(p)
    f = (p - i0f).astype(jnp.float32)
    i0u = i0f.astype(jnp.int32)
    i0 = jnp.clip(i0u, 0, n - 1)
    i1 = jnp.clip(i0u + 1, 0, n - 1)
    return i0 - tile_origin, i1 - tile_origin, f


def _band3(taps, BR, BC):
    """Two-banded weight stack (BR, BC, TILE) from (BR, BC) taps —
    prebuilt in one 3D compare so the per-row fori loop only performs
    dim-0 pl.ds reads (dynamic slicing of values, and dynamic lane/
    sublane offsets that are not aligned, are not lowerable on TPU)."""
    l0, l1, f = taps
    iota = jax.lax.broadcasted_iota(jnp.int32, (BR, BC, TILE), 2)
    return (jnp.where(iota == l0[:, :, None], (1.0 - f)[:, :, None], 0.0)
            + jnp.where(iota == l1[:, :, None], f[:, :, None], 0.0))


def _aligned_rect(tab_ref, t, Hp, Wp, BR, BC):
    """Rect origin rounded down to (8, 128) alignment (the window is one
    alignment step larger than the band, so coverage is preserved) and
    clamped inside the padded image; Mosaic needs provable alignment."""
    rlo = jnp.minimum((tab_ref[t, 0] // 8) * 8, Hp - BR)
    clo = jnp.minimum((tab_ref[t, 1] // 128) * 128, Wp - BC)
    return pl.multiple_of(rlo, 8), pl.multiple_of(clo, 128)


CH_ROWS = 8  # rect rows batched per MXU contraction (BR is a multiple)


def _fwd_kernel(tab_ref, base_ref, rows_hbm, cols_hbm, out_ref,
                rr_s, cc_s, acc_s, sems, *, BR, BC, C,
                n_tx, Hb, Wb, Hp, Wp):
    # Each grid step covers TWO horizontally adjacent base tiles (the
    # block's 128 lanes = 2 x TILE cols — Mosaic requires lane-dim
    # blocks of 128); halves are processed with static col slices.
    ty = pl.program_id(0)
    tx2 = pl.program_id(1)

    @pl.when((ty == 0) & (tx2 == 0))
    def _():
        out_ref[:] = jnp.zeros(out_ref.shape, jnp.float32)

    for h in range(2):
        tx = tx2 * 2 + h
        t = ty * n_tx + tx

        @pl.when(tab_ref[t, 2] > 0)
        def _(t=t, tx=tx, h=h):
            rlo, clo = _aligned_rect(tab_ref, t, Hp, Wp, BR, BC)
            cp_r = pltpu.make_async_copy(
                rows_hbm.at[pl.ds(rlo, BR), pl.ds(clo, BC)], rr_s,
                sems.at[0])
            cp_c = pltpu.make_async_copy(
                cols_hbm.at[pl.ds(rlo, BR), pl.ds(clo, BC)], cc_s,
                sems.at[1])
            cp_r.start()
            cp_c.start()
            cp_r.wait()
            cp_c.wait()

            tstack = jnp.concatenate(
                [base_ref[ch][:, h * TILE:(h + 1) * TILE]
                 for ch in range(C)], axis=1)               # (T, C*T)

            # Rect rows processed in CH_ROWS batches: one large flattened
            # MXU matmul per batch — (CH*BC, T) @ (T, C*T) — instead of a
            # per-row fori loop of tiny matmuls (measured 132 ms/frame at
            # 1080p: ~16k sequential (BC, T) dots are latency-bound, not
            # throughput-bound).
            for s0 in range(0, BR, CH_ROWS):
                Rf = _band3(_taps_local(rr_s[s0:s0 + CH_ROWS, :], Hb,
                                        ty * TILE), CH_ROWS, BC
                            ).reshape(CH_ROWS * BC, TILE)
                Cc = _band3(_taps_local(cc_s[s0:s0 + CH_ROWS, :], Wb,
                                        tx * TILE), CH_ROWS, BC)
                tmp = jnp.dot(Rf, tstack,
                              preferred_element_type=jnp.float32)
                tmp = tmp.reshape(CH_ROWS, BC, C * TILE)
                for ch in range(C):
                    acc_s[ch, s0:s0 + CH_ROWS, :] = jnp.sum(
                        Cc * tmp[..., ch * TILE:(ch + 1) * TILE], axis=2)
            for ch in range(C):
                cur = out_ref[ch, pl.ds(rlo, BR), pl.ds(clo, BC)]
                out_ref[ch, pl.ds(rlo, BR), pl.ds(clo, BC)] = (
                    cur + acc_s[ch])


def warp_forward(base_chw, rows01, cols01, tab, band, interpret=False):
    """Bilinear warp base (C, Hb, Wb) -> (C, Hp, Wp) at pixel coords.
    rows01/cols01: (Hp, Wp) padded (pad_pixels, fill=-1 so padded pixels'
    taps miss every tile); tab: (n_tiles, 3) int32 [row_lo, col_lo, on];
    band: true (rows, cols) pixel-rect extent (padded to static (BR, BC)
    here). Out-of-footprint pixels get 0 — the caller's miss mask decides
    their value, matching the jnp path's contract."""
    Cc, Hb, Wb = base_chw.shape
    Hp, Wp = rows01.shape
    # +1 alignment step: rect origins are rounded DOWN to (8, 128) in the
    # kernel (Mosaic dynamic-offset alignment), so the window must extend
    # one step past the band to keep covering the rect.
    BR = min(_ladder(band[0], PT_R) + PT_R, Hp)
    BC = min(_ladder(band[1], PT_C) + PT_C, Wp)
    n_ty, n_tx = Hb // TILE, Wb // TILE
    vm = pltpu.VMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ty, n_tx // 2),
        in_specs=[
            pl.BlockSpec((Cc, TILE, 2 * TILE),
                         lambda ty, tx2, *_: (0, ty, tx2),
                         memory_space=vm),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Cc, Hp, Wp), lambda ty, tx2, *_: (0, 0, 0),
                               memory_space=vm),
        scratch_shapes=[
            pltpu.VMEM((BR, BC), jnp.float32),
            pltpu.VMEM((BR, BC), jnp.float32),
            pltpu.VMEM((Cc, BR, BC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, BR=BR, BC=BC, C=Cc, n_tx=n_tx,
                          Hb=Hb, Wb=Wb, Hp=Hp, Wp=Wp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Cc, Hp, Wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_ty * n_tx * BR * BC * TILE * (Cc + 1),
            bytes_accessed=4 * (n_ty * n_tx * (2 + Cc) * BR * BC
                                + Cc * (Hb * Wb + Hp * Wp)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(tab, base_chw, rows01, cols01)


def _bwd_kernel(tab_ref, rows_hbm, cols_hbm, ct_hbm, out_ref,
                rr_s, cc_s, ct_s, sems, *, BR, BC,
                C, n_tx, Hb, Wb, Hp, Wp):
    ty = pl.program_id(0)
    tx2 = pl.program_id(1)
    # contract the flattened (rect row chunk x rect col) pixel dim:
    # dtile = R^T @ (C * ct)
    tP = (((0,), (0,)), ((), ()))

    out_ref[:] = jnp.zeros(out_ref.shape, jnp.float32)
    for h in range(2):
        tx = tx2 * 2 + h
        t = ty * n_tx + tx

        @pl.when(tab_ref[t, 2] > 0)
        def _(t=t, tx=tx, h=h):
            rlo, clo = _aligned_rect(tab_ref, t, Hp, Wp, BR, BC)
            cps = [
                pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(rlo, BR), pl.ds(clo, BC)], rr_s,
                    sems.at[0]),
                pltpu.make_async_copy(
                    cols_hbm.at[pl.ds(rlo, BR), pl.ds(clo, BC)], cc_s,
                    sems.at[1]),
                pltpu.make_async_copy(
                    ct_hbm.at[:, pl.ds(rlo, BR), pl.ds(clo, BC)], ct_s,
                    sems.at[2]),
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

            # ONE (T, P) @ (P, C*T) contraction for the whole rect and all
            # channels at once (P = BR*BC pixels): M=T, N=C*T, K=P — the
            # MXU-shaped restructuring of the old per-row fori of tiny
            # (BC, T) dots (which was latency-bound at ~16k dots/frame).
            Rf = _band3(_taps_local(rr_s[:], Hb, ty * TILE), BR, BC
                        ).reshape(BR * BC, TILE)
            Cm = _band3(_taps_local(cc_s[:], Wb, tx * TILE), BR, BC)
            Cct = jnp.concatenate(
                [(Cm * ct_s[ch][:, :, None]).reshape(BR * BC, TILE)
                 for ch in range(C)], axis=1)               # (P, C*T)
            dt = jax.lax.dot_general(
                Rf, Cct, tP, preferred_element_type=jnp.float32)
            for ch in range(C):
                out_ref[ch, :, h * TILE:(h + 1) * TILE] = (
                    dt[:, ch * TILE:(ch + 1) * TILE])


def warp_backward(ct_chw, rows01, cols01, tab, band, Hb, Wb,
                  interpret=False):
    """Adjoint splat: (C, Hp, Wp) pixel cotangents (zero at misses and
    padding) -> (C, Hb, Wb) base cotangents. Base tiles are disjoint
    outputs — exact transpose of warp_forward, no accumulation races."""
    Cc, Hp, Wp = ct_chw.shape
    BR = min(_ladder(band[0], PT_R) + PT_R, Hp)
    BC = min(_ladder(band[1], PT_C) + PT_C, Wp)
    n_ty, n_tx = Hb // TILE, Wb // TILE
    vm = pltpu.VMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ty, n_tx // 2),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Cc, TILE, 2 * TILE),
                               lambda ty, tx2, *_: (0, ty, tx2),
                               memory_space=vm),
        scratch_shapes=[
            pltpu.VMEM((BR, BC), jnp.float32),
            pltpu.VMEM((BR, BC), jnp.float32),
            pltpu.VMEM((Cc, BR, BC), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, BR=BR, BC=BC, C=Cc, n_tx=n_tx,
                          Hb=Hb, Wb=Wb, Hp=Hp, Wp=Wp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Cc, Hb, Wb), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_ty * n_tx * BR * BC * TILE * (Cc + 1),
            bytes_accessed=4 * (n_ty * n_tx * (2 + Cc) * BR * BC
                                + Cc * (Hb * Wb + Hp * Wp)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(tab, rows01, cols01, ct_chw)
