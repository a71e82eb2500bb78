"""Fused Pallas TPU kernels for the slice-sweep hot loop — forward AND
backward.

Forward: the hand-tiled version of ops/sweep._sweep_base for
combine="single" media (slices at voxel centers), optionally shaded by a
precomputed light-transmittance volume (BASELINE config 4). Per
(base-row-block, slice-chunk) grid step it fuses:

  * the y-resample MXU dot  t = Wa_block @ G_s  (the banded row matrices
    are precomputed once per frame and *streamed*, not rebuilt per block
    — rebuilding them per (block, slice) was measured to dominate),
  * the x-resample as **lane dynamic gathers**: `sigma[r, j] =
    (1-f_j) * t[r, b0_j] + f_j * t[r, b1_j]` runs as
    `jnp.take_along_axis(..., axis=1)` over 128-lane chunks — the one
    data-dependent access TPU supports natively,
  * Beer-Lambert compositing with the carry *resident on chip*: the
    output blocks are revisited across the slice dimension (slice = minor
    grid axis), so (acc, trans, wsum, hit) never round-trip HBM between
    slices.

Backward: a SECOND fused kernel, not autodiff. The key identity that makes
it another *forward-order* sweep (no reverse-time scan, no O(S) residuals):
with w_s = T_{s-1} alpha_s shade_s and T_s = T_{s-1}(1 - alpha_s), the
transmittance adjoint A_s = dL/dT_s satisfies

    A_s * T_s = cT * T_S + cw * (wsum_total - wsum_{<=s})

(cT, cw = cotangents of the trans / weight-sum outputs) — a closed form in
the *prefix* weight sum, which the backward kernel replays front-to-back
from per-chunk checkpoints (T, wsum at each slice-chunk entry, emitted by
the forward kernel). Per slice:

    dL/dalpha_s = cw T_{s-1} shade_s - A_s T_{s-1}
    dsigma_s    = live_s * density * seg * (cw T_{s-1} shade_s E_s - A~_s)

(E = exp(-density sigma seg); the live early-exit gate zeroes the slice;
the E/(1-alpha) ratio cancels exactly, so there is NO division). The
voxel-gradient scatter — SURVEY.md §7's "contention-free accumulation"
hard part — is two transposed matmuls on the MXU:

    dG_s += Wa_s^T @ ((dsigma_s * sscale) @ Wb_s)

with Wb_s the 2-banded column matrix rebuilt in-kernel from iota compares.
dG blocks are accumulated in VMEM across row blocks (slice-chunk = outer
parallel grid axis, so megacore cores own disjoint dG blocks — no races).

Early-exit note (measured, BENCH r3): the `live` gate is SEMANTIC parity
with the oracle's per-ray early termination (a masked no-op on saturated
pixels), not a throughput feature on TPU — a kernel block covers a
128 x Wb base strip whose out-of-box miss pixels keep T = 1 forever, so
block-level work skipping never fires; at density 200 the gate measures
a 0 +- 1% frame-time delta. The reference has no early exit at all
(frag.glsl:57-75), so parity-masking already exceeds it.

Color factorization: with a constant light color, the per-slice color
contribution is w * lcol, so the kernel accumulates the scalar field wsum
and the base maps carry it AS a scalar — finish_image applies the light
color after the (2-channel) warp, and the wsum cotangent is cw directly.

Address modes: inside the box, positions lie in [0,1], where mirror and
clamp addressing agree texel-for-texel (mirror reflects only past the
edge texel) and are served by index clipping; wrap differs at the
half-texel border and uses the period-B modulo instead (_col_taps
wrap=True; row matrices already honor the mode via
linear_resample_matrix). Out-of-box rows/cols are zeroed.

Reference lineage: these kernels occupy the architectural slot of the
reference's fragment shader (shaders/frag.glsl:34-81) — the per-pixel hot
loop — reformulated for MXU + lane-gather (SURVEY.md section 2, component
25); the backward kernel is the adjoint the reference does not have
(forward-only renderer; BASELINE.md "Gradients: none").
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import LightConfig, MediumConfig, RenderConfig

import os as _os

# Base rows per block (plan base dims are multiples of 128). "auto"
# picks 256 when the base rows divide it (a ~4% chip win at the
# flagship: fewer per-block dispatches, better matmul M) and 128
# otherwise; VOLT_RB forces a value. RB is the floor used by static
# gates; _rb_for(Hb) is the per-plan choice and MUST be computed
# identically by ops/sweep._row_window_blocks (the host row-window
# bound is per-RB-block).
RB = 128


def _rb_for(Hb: int) -> int:
    v = _os.environ.get("VOLT_RB", "auto")
    if v not in ("", "auto"):
        return int(v)
    # Default 128. 256 won ~4% under the 'big' backward (fewer, bigger
    # blocks) but LOSES under the final assoc form (13.59 vs 13.40 ms
    # full fwd+bwd, interleaved): the 256-row block's row window widens
    # 128 -> 192 (+50% sigma/v contraction flops) and assoc already
    # amortized the per-block costs 256 was saving. Chip table in
    # PROFILE_r5.json rb_chunk_ab.
    return 128
CHUNK = int(_os.environ.get("VOLT_SWEEP_CHUNK", 8))
# slices per grid step (statically unrolled in the kernel; 16 measured
# r3: fwd -0.4 ms but bwd +1.2 ms and 2x bwd scratch; env knob for A/Bs)
LANES = 128
# A/B kill-switches: comma list in VOLT_WIN_DISABLE ("row,col,scatter")
# forces the dense form of that stage regardless of the plan's windows.
_WIN_DISABLE = set(
    w for w in _os.environ.get("VOLT_WIN_DISABLE", "").split(",") if w)
# TIMING-ONLY experiment flag: replace the column gather stage with a
# wrong-but-shaped passthrough to bound its cost (never for rendering).
# The bound motivated the matmul column stage below: at the flagship the
# gathers were 4.7 of 7.0 ms fwd and 9.0 of 16.4 ms fwd+bwd.
_SKIP_GATHER = bool(int(_os.environ.get("VOLT_SKIP_GATHER", "0")))
# Column stage implementation: "mm" issues the per-output-chunk windowed
# resample as (RB, Wc) x (Wc, 128) MXU matmuls with one-hot tap matrices
# built per slice at rb==0 (the VPU lane gathers were ~2/3 of kernel
# time and the MXU is otherwise nearly idle); "gather" keeps the lane
# gathers. "auto" resolves to mm whenever the plan has a column window.
_COL_STAGE = _os.environ.get("VOLT_COL_STAGE", "auto")
# Forward column stage: the fwd grid is rb-major so per-slice matrices
# cannot live in scratch across row blocks; "mm" builds the per-chunk
# one-hot matrices per use (A/B'd on chip against the lane gathers);
# "big" builds ONE (B, Wb) matrix per use and issues a single dot
# (the bwd A/B showed single-big beats chunked). Trace-time read.
def _col_stage_fwd():
    return _os.environ.get("VOLT_COL_STAGE_FWD", "auto")
# Backward sigma/scatter form (round 5). Interleaved chip A/B at the
# flagship base sweep fwd+bwd, ms/frame (PROFILE_r5.json bwd_form_ab):
#   colmm (r4 default: per-chunk one-hot stack + windowed wbm) 9.77
#   scatterT (windowed-wbm^T recompute, dynamic RMW output)   12.66
#   bigsig (ONE (B, Wb) matrix recompute, windowed scatter)    9.44
#   big (the same matrix for recompute AND transposed scatter) 8.90
#   assoc (big + re-associated bilinear forms)                 7.55
# "auto" = assoc: ONE full-width one-hot matrix W per slice, and both
# bilinear forms re-associated around it —
#   sigma_rb = wa_rb @ (G_s @ W)   (gw built once per slice, rb==0)
#   dG_s = (sum_rb wa_rb^T dsig_rb) @ W^T   (v accumulated per slice)
# so the Wb x B contractions run once per SLICE instead of once per
# (row block, slice): ~40% of the bwd MXU flops gone. All reads static,
# scratch accumulation sublane-windowed only (the lane-dynamic forms —
# scatterT's windowed RMW, colmm's staging — all measured slower:
# dynamic scratch traffic costs more than mostly-zero MXU flops). Knob
# kept for re-measure on new hardware. Read at CALL time (unlike the
# other knobs) so A/B tools can flip it between jit traces in one
# process.
def _bwd_sigma():
    return _os.environ.get("VOLT_BWD_SIGMA", "auto")
GRAN = 64    # granule (grid rows) for the windowed row resample below

__all__ = ["supported", "sweep_base_pallas"]


# ---------------------------------------------------------------------------
# Windowed row resample (round 4).
#
# The banded row matrix Wa has 2 nonzeros per row at monotone positions
# (a01 = e_a + delta * v_grid is monotone in the base row), so a 128-row
# block of one slice chunk only ever taps a CONTIGUOUS window of the
# grid's A rows — issuing the resample as the dense (RB, A) @ (A, B)
# matmul wastes ~A/2 of the MXU work (128x at A=256, 256x at A=512;
# VERDICT r3 weak 1). SweepPlan.row_window (static, host-computed upper
# bound on the window span, granule-rounded) switches both kernels to the
# windowed form:
#
#   * forward: the grid is streamed as `n_win` granule blocks of GRAN
#     rows whose block indices come from a prefetched per-(slice-chunk,
#     row-block) offset table (_row_window_offsets) — this also cuts the
#     per-row-block grid re-streaming (the fwd grid revisits all slices
#     once per row block) by A/row_window;
#   * backward: the grid block stays dense per slice chunk (fetched once,
#     all row blocks share it) and the window is sliced in VMEM with
#     pl.ds; the dG accumulation targets the same dynamic row window.
#
# Offsets are granule-aligned so a window of `span` rows needs
# ceil((span + GRAN - 1) / GRAN) granules (worst-case alignment slack);
# ops/sweep._row_window_blocks computes that bound on the host at
# plan-build time. Windowing requires clamp/mirror addressing (in-box
# taps clip identically; wrap can wrap an edge tap across the whole
# axis) and GRAN | A — plan_sweep sets row_window = 0 otherwise.
# ---------------------------------------------------------------------------


def _row_windows(plan, A, n_win, ch, rb_blk=RB):
    """Window offsets AND windowed banded row matrices, computed from ONE
    evaluation of the tap indices (so the two can never disagree at a
    texel boundary).

    Returns (off_gran, wa_win):
      off_gran: int32 (n_sc, n_rb) — granule-aligned window start (GRAN
        units) of the grid rows addressed by each (slice-chunk,
        base-row-block), clipped so the window stays inside the axis;
      wa_win: (S, Hb, n_win*GRAN) — the banded row matrices with each
        row's two taps at columns RELATIVE to its (chunk, block) window.

    Exact for clamp/mirror: in-box taps clip identically under both
    (texel-for-texel, see _col_taps); out-of-box rows are zero rows
    (their relative index may fall outside the window — the one-hot
    compare then matches nothing, which is the same zero row). Chunks/
    blocks with no in-box row get an arbitrary valid offset.
    ops/sweep._row_window_blocks bounds the span on the host (with a
    +-1-texel f32-drift margin) so n_win always covers it."""
    S = plan.slice_z.shape[0]
    Hb = plan.v_grid.shape[0]
    n_sc, n_rb = S // ch, Hb // rb_blk
    delta = plan.slice_z - plan.eye01[0]
    a01 = plan.eye01[1] + delta[:, None] * plan.v_grid[None, :]  # (S, Hb)
    p = a01 * A - 0.5
    i0f = jnp.floor(p)
    f = (p - i0f).astype(jnp.float32)
    i0 = i0f.astype(jnp.int32)
    valid = (a01 >= 0.0) & (a01 <= 1.0)

    lo = jnp.where(valid, jnp.clip(i0, 0, A - 1), jnp.int32(1 << 30))
    lo = jnp.min(lo.reshape(n_sc, ch, n_rb, rb_blk),
                 axis=(1, 3))
    off_gran = jnp.clip(lo // GRAN, 0, A // GRAN - n_win).astype(jnp.int32)

    off_el = jnp.repeat(jnp.repeat(off_gran * GRAN, ch, axis=0),
                        rb_blk, axis=1)
    inr = valid.astype(jnp.float32)
    # Tent form (see ops/sweep._tap_weights): relu(1 - |col - p_c|) with
    # p_c the clamped window-relative position equals the clipped
    # two-tap one-hot sum everywhere, at one |.| compare per entry —
    # this build is a ~0.4 ms/frame standalone fusion at the flagship
    # (f32[256,1536,128] output), so the cheaper inner op matters.
    p_c = jnp.clip(p, 0.0, jnp.float32(A - 1)) - off_el.astype(jnp.float32)
    cols = jnp.arange(n_win * GRAN, dtype=jnp.float32)[None, None, :]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(cols - p_c[..., None]))
    return off_gran, w * inr[..., None]


def supported(plan, cfg: RenderConfig, medium: MediumConfig,
              light_volume, scroll, grid_ndim: int, depth: int) -> bool:
    """Static gate for the fused kernels (the jnp sweep covers the rest).

    Round 4: n_slices != depth is supported — sweep_base_pallas
    layer-lerps the volume onto the slice planes in XLA first
    (_layer_lerp_stack), so the kernels always see slices at the lerped
    stack's own centers. The reference caps its march at 128 steps for
    ANY volume size (frag.glsl:30), so sub-voxel-count slicing is the
    reference-parity quadrature at large volumes."""
    del depth  # any slice count (pre-lerp aligns the stack to slices)
    Hb, Wb = plan.base_shape
    light_ok = light_volume is None or (cfg.emission
                                        and light_volume.ndim == 3)
    common = (Hb % RB == 0
              and Wb % LANES == 0)
    if medium.combine == "reference":
        # The "reference" preset's 4-channel combine with per-channel
        # coordinate scale + scroll (frag.glsl:63-71), mirror addressing
        # as the Vulkan sampler (VulkanCore.cpp:683-685). Round 4: a
        # light-transmittance volume is shaded in-kernel at unscaled
        # coords (was the last silent jnp fallback in this gate).
        return (common
                and cfg.dtype in ("float32", "bfloat16")
                and grid_ndim == 4
                and light_ok
                and cfg.address_mode == "mirror")
    # bf16 single-channel: grid + row matrices stream in bf16 (2x MXU
    # rate, half the bandwidth — the reference stores 8-bit unorm
    # textures, VulkanTexture.cpp:116-118, so low-precision storage is
    # reference-native); compositing carries and gradients stay f32.
    return (medium.combine == "single"
            and cfg.dtype in ("float32", "bfloat16")
            and common
            and light_ok
            and scroll is None
            and grid_ndim == 3
            and cfg.address_mode in ("mirror", "clamp", "wrap"))


def _pad_lanes(t, B):
    return jnp.pad(t, ((0, 0), (0, LANES - B))) if B < LANES else t


def _lane_gather(t, idx_row, n_pieces):
    """t[r, idx[j]] for a 128-wide output-column chunk. t: (RB, >=LANES),
    idx_row: (LANES,) int32 clipped to [0, B).

    The per-128-lane masked decomposition is REQUIRED: Mosaic's
    dynamic_gather only lowers within one 128-lane tile (a direct
    take_along_axis across a 256-wide source fails to compile —
    measured r3). A roll-window variant (dynamic pltpu.roll to land each
    chunk's tap span in one tile, single gather) was also measured
    SLOWER (11.6 vs 7.3 ms/frame fwd at the flagship scene — the
    per-chunk full-width lane rotations cost more than the masked
    pieces); don't re-try without new evidence."""
    idx = jnp.broadcast_to(idx_row[None, :], (t.shape[0], LANES))
    if n_pieces == 1:
        return jnp.take_along_axis(t[:, :LANES], idx, axis=1)
    out = jnp.zeros((t.shape[0], LANES), jnp.float32)
    for p in range(n_pieces):
        tp = t[:, p * LANES:(p + 1) * LANES]
        local = jnp.clip(idx - p * LANES, 0, LANES - 1)
        gp = jnp.take_along_axis(tp, local, axis=1)
        inp = (idx >= p * LANES) & (idx < (p + 1) * LANES)
        out = jnp.where(inp, gp, out)
    return out


def _lane_gather_win(tw, base, idx_row, win_pieces):
    """_lane_gather over a window `tw` of `win_pieces` 128-lane source
    tiles whose absolute lane origin is `base` (traced): the monotone
    column taps of one output chunk span only O(B/(Wb/128)) source
    columns, so at B >= 512 two dynamic pieces replace B/128 static ones
    (round 4). Taps outside the window produce 0 — the caller multiplies
    by the in-box mask, and plan_sweep's host bound (_col_window_elems)
    guarantees every IN-BOX tap lands inside. The window itself is a
    dynamic REF load in the caller: Mosaic lowers lane-dynamic ref loads
    but NOT lane-dynamic dynamic_slice of values (measured on chip)."""
    idx = jnp.broadcast_to(idx_row[None, :], (tw.shape[0], LANES))
    out = jnp.zeros((tw.shape[0], LANES), jnp.float32)
    for d in range(win_pieces):
        off = base + d * LANES
        tp = tw[:, d * LANES:(d + 1) * LANES]
        local = jnp.clip(idx - off, 0, LANES - 1)
        gp = jnp.take_along_axis(tp, local, axis=1)
        inp = (idx >= off) & (idx < off + LANES)
        out = jnp.where(inp, gp, out)
    return out


def _gather_cols(t, i0, i1, fb, b_in, Wb_n, n_pieces, win_pieces=0,
                 ts_ref=None):
    """Two-tap linear gather along columns: out[r, j] =
    (1-fb_j) t[r, i0_j] + fb_j t[r, i1_j], computed in 128-lane chunks.
    win_pieces > 0 (and < n_pieces) switches each chunk to the dynamic
    windowed decomposition: t is staged into the ts_ref VMEM scratch and
    each chunk ref-loads only its window (the offset derives from the
    SAME i0 the taps use, masked to in-box lanes)."""
    if _SKIP_GATHER:  # timing bound only: wrong values, right shapes
        reps = -(-Wb_n // t.shape[1])
        return jnp.tile(t * fb[:t.shape[1]][None, :],
                        (1, reps))[:, :Wb_n]
    windowed = 0 < win_pieces < n_pieces and ts_ref is not None
    if windowed:
        ts_ref[:] = t
    chunks = []
    for q in range(Wb_n // LANES):
        sl = slice(q * LANES, (q + 1) * LANES)
        if windowed:
            lo_q = jnp.min(jnp.where(b_in[sl] > 0.0, i0[sl],
                                     n_pieces * LANES - 1))
            qoff = jnp.clip(lo_q // LANES, 0, n_pieces - win_pieces)
            base = pl.multiple_of(qoff * LANES, LANES)
            tw = ts_ref[:, pl.ds(base, win_pieces * LANES)]
            g0 = _lane_gather_win(tw, base, i0[sl], win_pieces)
            g1 = _lane_gather_win(tw, base, i1[sl], win_pieces)
        else:
            g0 = _lane_gather(t, i0[sl], n_pieces)
            g1 = _lane_gather(t, i1[sl], n_pieces)
        w1 = fb[sl][None, :]
        chunks.append(g0 * (1.0 - w1) + g1 * w1)
    return jnp.concatenate(chunks, axis=1)


def _build_wbc_chunk(i0q, i1q, fbq, b_inq, qoff, Wc, dtype):
    """One-hot column-resample matrix for one (slice, output chunk):
    Wbc[src_rel, out] = (1-fb)*(src == qoff*128 + src_rel taps) with the
    in-box mask folded, so  sigma[:, chunk] = t_window @ Wbc  runs on
    the MXU instead of the VPU lane gathers (which measured ~2/3 of
    kernel time). Lane-friendly build: the tap vectors stay on lanes,
    the src iota is on sublanes — no lane->sublane transposes. Correct
    for clipped AND wrapped taps (equality against arbitrary in-range
    indices); qoff=0/Wc=B is the full-width form."""
    rows = qoff * LANES + jax.lax.broadcasted_iota(
        jnp.int32, (Wc, LANES), 0)
    w0 = ((1.0 - fbq) * b_inq)[None, :]
    w1 = (fbq * b_inq)[None, :]
    return (jnp.where(rows == i0q[None, :], w0, 0.0)
            + jnp.where(rows == i1q[None, :], w1, 0.0)).astype(dtype)


def _build_wbc_full(i0, i1, fb, b_in, B, Wb_n, dtype):
    """All output chunks' one-hot matrices for ONE slice, stacked
    (n_q, B, LANES), built as one value -> ONE bulk scratch write (the
    per-chunk predicated-write form measured ~1.5x slower backward —
    Mosaic schedules the bulk form far better)."""
    n_q = Wb_n // LANES
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 0)
    mats = []
    for q in range(n_q):
        sl = slice(q * LANES, (q + 1) * LANES)
        w0 = ((1.0 - fb[sl]) * b_in[sl])[None, :]
        w1 = (fb[sl] * b_in[sl])[None, :]
        mats.append(jnp.where(rows == i0[sl][None, :], w0, 0.0)
                    + jnp.where(rows == i1[sl][None, :], w1, 0.0))
    return jnp.stack(mats, axis=0).astype(dtype)


def _apply_wbc(t, wbc_c):
    """t (RB, >=B) @ stacked per-chunk matrices (n_q, B, LANES) ->
    (RB, Wb_n); one bulk read, static chunk indexing."""
    B = wbc_c.shape[1]
    tm = t[:, :B]
    if wbc_c.dtype == jnp.bfloat16:
        tm = tm.astype(jnp.bfloat16)
    return jnp.concatenate(
        [jnp.dot(tm, wbc_c[q], preferred_element_type=jnp.float32)
         for q in range(wbc_c.shape[0])], axis=1)


def _colmm_cols(t, i0, i1, fb, b_in, B, Wb_n, n_pieces, win, ts_ref,
                wbc_ref, qoff_ref, c, build_pred):
    """Matmul column stage: per 128-lane output chunk, contract t (or a
    dynamic window of it, staged in ts_ref — value lane-slicing does not
    lower) against the chunk's one-hot matrix. wbc_ref/qoff_ref given:
    matrices live in scratch, built under build_pred (the sc-major
    backward amortizes them across row blocks); wbc_ref None: built per
    use (the rb-major forward — still beats the gathers, measured).
    Output includes the in-box mask (folded into the weights)."""
    n_q = Wb_n // LANES
    windowed = 0 < win < n_pieces and ts_ref is not None
    Wc = win * LANES if windowed else B
    if windowed:
        ts_ref[:] = t
    chunks = []
    for q in range(n_q):
        sl = slice(q * LANES, (q + 1) * LANES)
        if windowed:
            lo_q = jnp.min(jnp.where(b_in[sl] > 0.0, i0[sl],
                                     n_pieces * LANES - 1))
            qoff = jnp.clip(lo_q // LANES, 0, n_pieces - win)
        else:
            qoff = 0
        if wbc_ref is not None:
            @pl.when(build_pred)
            def _(q=q, sl=sl, qoff=qoff):
                if windowed:
                    qoff_ref[c, q] = qoff
                wbc_ref[c, q] = _build_wbc_chunk(
                    i0[sl], i1[sl], fb[sl], b_in[sl], qoff, Wc,
                    wbc_ref.dtype)
            W = wbc_ref[c, q]
            if windowed:
                qoff = qoff_ref[c, q]
        else:
            W = _build_wbc_chunk(i0[sl], i1[sl], fb[sl], b_in[sl], qoff,
                                 Wc, jnp.float32)
        if windowed:
            base = pl.multiple_of(qoff * LANES, LANES)
            tm = ts_ref[:, pl.ds(base, Wc)]
        else:
            tm = t[:, :B]
        if W.dtype == jnp.bfloat16:
            tm = tm.astype(jnp.bfloat16)
        chunks.append(jnp.dot(tm, W, preferred_element_type=jnp.float32))
    return jnp.concatenate(chunks, axis=1)


def _col_taps(e_b, delta, ug_row, B, wrap=False):
    """Column sample positions for one slice: indices, fraction, in-box.

    In-box positions lie in [0,1], where mirror and clamp agree
    texel-for-texel, so clipping covers both; wrap differs at the
    half-texel borders (i0 = -1 -> B-1, i1 = B -> 0) and uses the
    period-B modulo instead (VK_SAMPLER_ADDRESS_MODE_REPEAT)."""
    b01 = e_b + delta * ug_row
    pb = b01 * B - 0.5
    ibf = jnp.floor(pb)
    fb = pb - ibf
    ib = ibf.astype(jnp.int32)
    b_in = ((b01 >= 0.0) & (b01 <= 1.0)).astype(jnp.float32)
    if wrap:
        i0 = jnp.remainder(ib, B)
        i1 = jnp.remainder(ib + 1, B)
    else:
        i0 = jnp.clip(ib, 0, B - 1)
        i1 = jnp.clip(ib + 1, 0, B - 1)
    return i0, i1, fb, b_in


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(slice_z_ref, params_ref, rowoff_ref, *refs, emission, ch,
                has_light, with_ckpt, with_wck, wrap, n_win, cwin, colmm,
                flip):
    ts_s = None
    if cwin:
        refs, ts_s = refs[:-1], refs[-1]
    ng = max(n_win, 1)  # windowed: n_win granule refs; dense: 1 full ref
    i = 0
    g_refs = refs[i:i + ng]; i += ng
    wa_ref = refs[i]; i += 1
    ug_ref = refs[i]; i += 1
    seg_ref = refs[i]; i += 1
    l_refs = None
    if has_light:
        l_refs = refs[i:i + ng]; i += ng
    acc_ref, trans_ref, wsum_ref, hit_ref = refs[i:i + 4]; i += 4
    tck_ref = wck_ref = None
    if with_ckpt:
        tck_ref = refs[i]; i += 1
        if with_wck:
            wck_ref = refs[i]; i += 1

    def gmat(rs, c):
        # windowed: concatenate the granule blocks into the (Wr, B) window
        # the windowed wa row matrix contracts against
        return (jnp.concatenate([r[c] for r in rs], axis=0)
                if len(rs) > 1 else rs[0][c])

    sc = pl.program_id(1)

    @pl.when(sc == 0)
    def _():
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
        trans_ref[:] = jnp.ones(trans_ref.shape, jnp.float32)
        wsum_ref[:] = jnp.zeros(wsum_ref.shape, jnp.float32)
        hit_ref[:] = jnp.zeros(hit_ref.shape, jnp.float32)

    if with_ckpt:
        # Chunk-entry checkpoint: the carry BEFORE this chunk's slices.
        # With no light volume, shade == 1 and the weight sum telescopes
        # (w_s = T_{s-1} - T_s), so wsum == 1 - T identically and the
        # backward derives the wsum checkpoint from the T one — the wck
        # array (n_sc * Hb * Wb f32 per frame, ~300 MB at the flagship)
        # is neither written nor read.
        tck_ref[0] = trans_ref[:]
        if with_wck:
            wck_ref[0] = wsum_ref[:]

    e_k, e_b = params_ref[0], params_ref[2]
    sign, density, sscale = params_ref[3], params_ref[4], params_ref[5]
    thresh, ambient = params_ref[6], params_ref[7]
    B = g_refs[0].shape[2]
    n_pieces = max(1, B // LANES)

    for c in range(ch):
        z = slice_z_ref[sc * ch + c]
        delta = z - e_k
        # flip: the volume keeps its original slice order; this chunk's
        # block is streamed at the mirrored dim-0 index and slices are
        # read back-to-front within it (see _fused_vjp's flip note).
        cidx = (ch - 1 - c) if flip else c

        @pl.when(delta * sign > 0.0)
        def _(c=c, cidx=cidx, delta=delta):
            # y-resample on the MXU with the streamed banded row matrix
            # (rows outside the box are zero rows — built that way).
            t = _pad_lanes(jnp.dot(wa_ref[c], gmat(g_refs, cidx),
                                   preferred_element_type=jnp.float32), B)
            i0, i1, fb, b_in = _col_taps(e_b, delta, ug_ref[0, :], B,
                                         wrap)
            Wb_n = ug_ref.shape[1]
            if colmm == 2:
                # ONE full-width one-hot (B, Wb) matrix built per use +
                # a single dot (the bwd A/B's single-big-vs-chunked
                # lesson applied forward; rb-major grid, so no scratch
                # amortization either way).
                src = jax.lax.broadcasted_iota(jnp.int32, (B, Wb_n), 0)
                w0 = ((1.0 - fb) * b_in)[None, :]
                w1 = (fb * b_in)[None, :]
                Wbig = (jnp.where(src == i0[None, :], w0, 0.0)
                        + jnp.where(src == i1[None, :], w1, 0.0))
                sigma = jnp.dot(t[:, :B], Wbig,
                                preferred_element_type=jnp.float32) * sscale
            elif colmm:
                sigma = _colmm_cols(t, i0, i1, fb, b_in, B, Wb_n,
                                    n_pieces, cwin, ts_s, None, None, c,
                                    False) * sscale
            else:
                sigma = (_gather_cols(t, i0, i1, fb, b_in, Wb_n,
                                      n_pieces, cwin, ts_s)
                         * b_in[None, :] * sscale)

            if has_light:
                tl = _pad_lanes(jnp.dot(wa_ref[c], gmat(l_refs, cidx),
                                        preferred_element_type=jnp.float32),
                                B)
                if colmm == 2:
                    src = jax.lax.broadcasted_iota(jnp.int32, (B, Wb_n),
                                                   0)
                    Wbig_l = (jnp.where(src == i0[None, :],
                                        ((1.0 - fb) * b_in)[None, :], 0.0)
                              + jnp.where(src == i1[None, :],
                                          (fb * b_in)[None, :], 0.0))
                    lT = jnp.dot(tl[:, :B], Wbig_l,
                                 preferred_element_type=jnp.float32)
                elif colmm:
                    lT = _colmm_cols(tl, i0, i1, fb, b_in, B, Wb_n,
                                     n_pieces, cwin, ts_s, None, None, c,
                                     False)
                else:
                    lT = _gather_cols(tl, i0, i1, fb, b_in, Wb_n,
                                      n_pieces, cwin, ts_s)
                shade = ambient + (1.0 - ambient) * jnp.clip(lT, 0.0, 1.0)
            else:
                shade = 1.0

            if emission:
                trans = trans_ref[:]
                live = (trans > thresh).astype(jnp.float32)
                alpha = live * (
                    1.0 - jnp.exp(-density * sigma * seg_ref[:]))
                wsum_ref[:] = wsum_ref[:] + trans * alpha * shade
                trans_ref[:] = trans * (1.0 - alpha)
            else:
                acc_ref[:] = acc_ref[:] + sigma * seg_ref[:]
                # hit: the in-box row indicator is encoded in Wa's zero
                # rows; recover it from the row sums (rows sum to 1 or 0).
                a_in = jnp.sum(wa_ref[c], axis=1, keepdims=True)
                hit_ref[:] = jnp.maximum(hit_ref[:], a_in * b_in[None, :])


def _run_fwd(gperm, lperm, slice_z, wa_all, u_grid, seglen, params, rowoff,
             n_win, cwin, colmm, ch, rb_blk, emission, with_ckpt,
             interpret=False, wrap=False, with_wck=True, flip=False):
    S, A, B = gperm.shape
    Hb = wa_all.shape[1]
    Wr = wa_all.shape[2]  # A (dense) or n_win * GRAN (windowed)
    Wb_n = u_grid.shape[0]
    n_rb = Hb // rb_blk
    n_sc = S // ch
    has_light = lperm is not None

    def sc_blk(sc):
        # flip: front-to-back chunk sc holds the volume's dim-0 block
        # n_sc-1-sc (slices reversed within it by the kernel's cidx) —
        # the XLA-level [::-1] copy of the whole volume (and its
        # autodiff reverse) measured ~0.3 ms/frame at the flagship.
        return (n_sc - 1 - sc) if flip else sc

    def vol_specs(arr):
        # Windowed: the volume streams as n_win granule blocks whose
        # axis-1 block index comes from the prefetched offset table
        # (granule units — block shape == GRAN makes blocked indexing
        # granule-addressed). Dense: one full (ch, A, B) block.
        if n_win:
            specs = [
                pl.BlockSpec((ch, GRAN, B),
                             lambda rb, sc, sz, pr, ro, i=i:
                             (sc_blk(sc), ro[sc, rb] + i, 0),
                             memory_space=pltpu.VMEM)
                for i in range(n_win)]
            return specs, [arr] * n_win
        return [pl.BlockSpec((ch, A, B),
                             lambda rb, sc, *_: (sc_blk(sc), 0, 0),
                             memory_space=pltpu.VMEM)], [arr]

    in_specs, inputs = vol_specs(gperm)
    in_specs += [
        pl.BlockSpec((ch, rb_blk, Wr), lambda rb, sc, *_: (sc, rb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Wb_n), lambda rb, sc, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb_blk, Wb_n), lambda rb, sc, *_: (rb, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs += [wa_all, u_grid.reshape(1, Wb_n), seglen]
    if has_light:
        ls, li = vol_specs(lperm)
        in_specs += ls
        inputs += li

    map_out = pl.BlockSpec((rb_blk, Wb_n), lambda rb, sc, *_: (rb, 0),
                           memory_space=pltpu.VMEM)
    out_specs = [map_out] * 4
    out_shape = [jax.ShapeDtypeStruct((Hb, Wb_n), jnp.float32)] * 4
    if with_ckpt:
        ck = pl.BlockSpec((1, rb_blk, Wb_n), lambda rb, sc, *_: (sc, rb, 0),
                          memory_space=pltpu.VMEM)
        n_ck = 2 if with_wck else 1
        out_specs += [ck] * n_ck
        out_shape += [jax.ShapeDtypeStruct((n_sc, Hb, Wb_n),
                                           jnp.float32)] * n_ck

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_rb, n_sc),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=([pltpu.VMEM((rb_blk, max(B, LANES)), jnp.float32)]
                        if cwin else []),
    )
    light_mul = 2 if has_light else 1
    return pl.pallas_call(
        functools.partial(_fwd_kernel, emission=emission, ch=ch,
                          has_light=has_light, with_ckpt=with_ckpt,
                          with_wck=with_wck, wrap=wrap, n_win=n_win,
                          cwin=cwin, colmm=colmm, flip=flip),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=light_mul * (2 * S * Hb * Wr * B + 10 * S * Hb * Wb_n),
            bytes_accessed=4 * (n_rb * S * Wr * B + S * Hb * Wr
                                + 5 * Hb * Wb_n),
            transcendentals=S * Hb * Wb_n,
        ),
        interpret=interpret,
    )(slice_z, params, rowoff, *inputs)



# ---------------------------------------------------------------------------
# Forward kernel, sc-major "assoc" form (round 5).
#
# The backward's winning re-association (one full-width one-hot matrix W
# per slice; sigma_rb = wa_rb @ (G_s @ W)) needs per-slice scratch
# amortized across row blocks — impossible in the rb-major forward
# (its carries live in per-rb output blocks that must be revisited
# consecutively). This variant flips the forward to the backward's
# (sc, rb) grid and keeps the carries in FULL-SIZE (Hb, Wb)
# constant-index output blocks instead (VMEM-resident the whole kernel,
# written once — v5e has a single TensorCore, so no megacore ownership
# concern), with each (sc, rb) step updating its own sublane-windowed
# row range. Per-(rb, slice) flops drop from (row t: A_eff*B) +
# (column stage: B*Wb) to (wa @ gw: A_eff*Wb) with the gw build
# (A*B*Wb) amortized once per slice — at the flagship 126 -> 67 MF.
# Checkpoint outputs keep the exact rb-major shapes, so the backward is
# untouched. VMEM: ~72 MB fwd-only / ~91 MB with checkpoints at the
# flagship (fits the 100 MB limit); the same budget-aware ch applies.
# ---------------------------------------------------------------------------


def _fwd_kernel_sc(slice_z_ref, params_ref, rowoff_ref, *refs, emission,
                   ch, has_light, with_ckpt, with_wck, wrap, n_win,
                   flip):
    i = 0
    g_ref = refs[i]; i += 1
    wa_ref = refs[i]; i += 1
    ug_ref = refs[i]; i += 1
    seg_ref = refs[i]; i += 1
    l_ref = None
    if has_light:
        l_ref = refs[i]; i += 1
    acc_ref, trans_ref, wsum_ref, hit_ref = refs[i:i + 4]; i += 4
    tck_ref = wck_ref = None
    if with_ckpt:
        tck_ref = refs[i]; i += 1
        if with_wck:
            wck_ref = refs[i]; i += 1
    wbg_s = refs[i]; i += 1
    gw_s = refs[i]; i += 1
    lgw_s = refs[i] if has_light else None

    sc = pl.program_id(0)
    rb = pl.program_id(1)
    rb_blk = wa_ref.shape[1]
    r0 = pl.multiple_of(rb * rb_blk, rb_blk)

    @pl.when(sc == 0)
    def _():
        acc_ref[pl.ds(r0, rb_blk), :] = jnp.zeros(
            (rb_blk, acc_ref.shape[1]), jnp.float32)
        trans_ref[pl.ds(r0, rb_blk), :] = jnp.ones(
            (rb_blk, trans_ref.shape[1]), jnp.float32)
        wsum_ref[pl.ds(r0, rb_blk), :] = jnp.zeros(
            (rb_blk, wsum_ref.shape[1]), jnp.float32)
        hit_ref[pl.ds(r0, rb_blk), :] = jnp.zeros(
            (rb_blk, hit_ref.shape[1]), jnp.float32)

    if with_ckpt:
        # Chunk-entry checkpoint: the carry BEFORE this chunk's slices
        # (same shapes/semantics as the rb-major kernel's — the
        # backward replays from these unchanged). wck skipped when the
        # no-light telescoping identity holds (see _fwd_kernel).
        tck_ref[0, pl.ds(r0, rb_blk), :] = trans_ref[pl.ds(r0, rb_blk), :]
        if with_wck:
            wck_ref[0, pl.ds(r0, rb_blk), :] = wsum_ref[pl.ds(r0, rb_blk),
                                                        :]

    e_k, e_b = params_ref[0], params_ref[2]
    sign, density, sscale = params_ref[3], params_ref[4], params_ref[5]
    thresh, ambient = params_ref[6], params_ref[7]
    B = g_ref.shape[2]
    Wb_n = ug_ref.shape[1]

    if n_win:
        w_el = n_win * GRAN
        off_el = pl.multiple_of(rowoff_ref[sc, rb] * GRAN, GRAN)

        def gw_win(ref, c):
            return ref[c, pl.ds(off_el, w_el), :]
    else:
        def gw_win(ref, c):
            return ref[c]

    for c in range(ch):
        z = slice_z_ref[sc * ch + c]
        delta = z - e_k
        cidx = (ch - 1 - c) if flip else c  # see _fwd_kernel

        i0, i1, fb, b_in = _col_taps(e_b, delta, ug_ref[0, :], B, wrap)

        @pl.when(rb == 0)
        def _(c=c, cidx=cidx, i0=i0, i1=i1, fb=fb, b_in=b_in):
            src = jax.lax.broadcasted_iota(jnp.int32, (B, Wb_n), 0)
            w0 = ((1.0 - fb) * b_in)[None, :]
            w1 = (fb * b_in)[None, :]
            wbg_s[c] = (jnp.where(src == i0[None, :], w0, 0.0)
                        + jnp.where(src == i1[None, :], w1, 0.0)
                        ).astype(wbg_s.dtype)
            gw_s[c] = jnp.dot(g_ref[cidx], wbg_s[c],
                              preferred_element_type=jnp.float32)
            if has_light:
                lgw_s[c] = jnp.dot(l_ref[cidx], wbg_s[c],
                                   preferred_element_type=jnp.float32)

        @pl.when(delta * sign > 0.0)
        def _(c=c, delta=delta, i0=i0, b_in=b_in):
            sigma = jnp.dot(wa_ref[c], gw_win(gw_s, c),
                            preferred_element_type=jnp.float32) * sscale
            if has_light:
                lT = jnp.dot(wa_ref[c], gw_win(lgw_s, c),
                             preferred_element_type=jnp.float32)
                shade = ambient + (1.0 - ambient) * jnp.clip(lT, 0.0, 1.0)
            else:
                shade = 1.0

            seg = seg_ref[:]
            if emission:
                trans = trans_ref[pl.ds(r0, rb_blk), :]
                live = (trans > thresh).astype(jnp.float32)
                alpha = live * (1.0 - jnp.exp(-density * sigma * seg))
                wsum_ref[pl.ds(r0, rb_blk), :] = (
                    wsum_ref[pl.ds(r0, rb_blk), :] + trans * alpha * shade)
                trans_ref[pl.ds(r0, rb_blk), :] = trans * (1.0 - alpha)
            else:
                acc_ref[pl.ds(r0, rb_blk), :] = (
                    acc_ref[pl.ds(r0, rb_blk), :] + sigma * seg)
                a_in = jnp.sum(wa_ref[c], axis=1, keepdims=True)
                a_in = jnp.minimum(a_in, 1.0)
                hit_ref[pl.ds(r0, rb_blk), :] = jnp.maximum(
                    hit_ref[pl.ds(r0, rb_blk), :], a_in * b_in[None, :])


def _run_fwd_sc(gperm, lperm, slice_z, wa_all, u_grid, seglen, params,
                rowoff, n_win, ch, rb_blk, emission, with_ckpt,
                interpret=False, wrap=False, with_wck=True, flip=False):
    """sc-major assoc forward — see _fwd_kernel_sc. Outputs and
    checkpoints are bit-compatible with _run_fwd's (same shapes; the
    backward replays from them unchanged)."""
    S, A, B = gperm.shape
    Hb = wa_all.shape[1]
    Wr = wa_all.shape[2]
    Wb_n = u_grid.shape[0]
    n_rb = Hb // rb_blk
    n_sc = S // ch
    has_light = lperm is not None

    def sc_blk(sc):
        return (n_sc - 1 - sc) if flip else sc  # see _run_fwd

    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((ch, A, B), lambda sc, rb, *_: (sc_blk(sc), 0, 0),
                     memory_space=vm),
        pl.BlockSpec((ch, rb_blk, Wr), lambda sc, rb, *_: (sc, rb, 0),
                     memory_space=vm),
        pl.BlockSpec((1, Wb_n), lambda sc, rb, *_: (0, 0),
                     memory_space=vm),
        pl.BlockSpec((rb_blk, Wb_n), lambda sc, rb, *_: (rb, 0),
                     memory_space=vm),
    ]
    inputs = [gperm, wa_all, u_grid.reshape(1, Wb_n), seglen]
    if has_light:
        in_specs.append(pl.BlockSpec((ch, A, B),
                                     lambda sc, rb, *_:
                                     (sc_blk(sc), 0, 0),
                                     memory_space=vm))
        inputs.append(lperm)

    # Full-size constant-index carry/output blocks: VMEM-resident for
    # the whole kernel, one write-out at the end (no per-step block
    # swapping — the reason the rb-major form couldn't go sc-major).
    full = pl.BlockSpec((Hb, Wb_n), lambda sc, rb, *_: (0, 0),
                        memory_space=vm)
    out_specs = [full] * 4
    out_shape = [jax.ShapeDtypeStruct((Hb, Wb_n), jnp.float32)] * 4
    if with_ckpt:
        ck = pl.BlockSpec((1, Hb, Wb_n), lambda sc, rb, *_: (sc, 0, 0),
                          memory_space=vm)
        n_ck = 2 if with_wck else 1
        out_specs += [ck] * n_ck
        out_shape += [jax.ShapeDtypeStruct((n_sc, Hb, Wb_n),
                                           jnp.float32)] * n_ck

    scratch = [pltpu.VMEM((ch, B, Wb_n), gperm.dtype),
               pltpu.VMEM((ch, A, Wb_n), jnp.float32)]
    if has_light:
        scratch.append(pltpu.VMEM((ch, A, Wb_n), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_sc, n_rb),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    light_mul = 2 if has_light else 1
    return pl.pallas_call(
        functools.partial(_fwd_kernel_sc, emission=emission, ch=ch,
                          has_light=has_light, with_ckpt=with_ckpt,
                          with_wck=with_wck, wrap=wrap, n_win=n_win,
                          flip=flip),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=light_mul * (2 * S * Hb * Wr * Wb_n
                               + 2 * S * A * B * Wb_n
                               + 10 * S * Hb * Wb_n),
            bytes_accessed=4 * (S * A * B + S * Hb * Wr + 5 * Hb * Wb_n),
            transcendentals=S * Hb * Wb_n,
        ),
        interpret=interpret,
    )(slice_z, params, rowoff, *inputs)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(slice_z_ref, params_ref, rowoff_ref, *refs, emission, ch,
                has_light, wrap, n_win, cwin, swin, colmm, sigT, bigW,
                assoc, no_wck=False, flip=False):
    wbc_s = ts_s = wbg_s = None
    wbm_s = joff_s = mat_s = None
    gw_s = v_s = lgw_s = vl_s = None
    if assoc:
        n_assoc = 4 if has_light else 2
        if has_light:
            refs, lgw_s, vl_s = refs[:-2], refs[-2], refs[-1]
        refs, gw_s, v_s = refs[:-2], refs[-2], refs[-1]
    if cwin:
        refs, ts_s = refs[:-1], refs[-1]
    if colmm:
        refs, wbc_s = refs[:-1], refs[-1]
    if bigW or assoc:
        refs, wbg_s = refs[:-1], refs[-1]
    if bigW != 2 and not assoc:
        if swin:
            refs, wbm_s, joff_s, mat_s = (refs[:-3], refs[-3], refs[-2],
                                          refs[-1])
        else:
            refs, wbm_s = refs[:-1], refs[-1]
    i = 0
    g_ref = refs[i]; i += 1
    wa_ref = refs[i]; i += 1
    ug_ref = refs[i]; i += 1
    seg_ref = refs[i]; i += 1
    if emission:
        cw_ref = refs[i]; i += 1
        bct_ref = refs[i]; i += 1
        tck_ref = refs[i]; i += 1
        if not no_wck:
            wck_ref = refs[i]; i += 1
    else:
        ctacc_ref = refs[i]; i += 1
    l_ref = None
    if has_light:
        l_ref = refs[i]; i += 1
    dg_ref = refs[i]; i += 1
    dl_ref = refs[i] if has_light else None

    sc = pl.program_id(0)
    rb = pl.program_id(1)

    @pl.when(rb == 0)
    def _():
        dg_ref[:] = jnp.zeros(dg_ref.shape, jnp.float32)
        if has_light:
            dl_ref[:] = jnp.zeros(dl_ref.shape, jnp.float32)

    # Windowed row resample (see module note): the grid block stays dense
    # per slice chunk (one fetch, shared by all row blocks); this row
    # block's window of it is sliced in VMEM, and the dG/dL accumulation
    # targets the same dynamic row window.
    if n_win:
        w_el = n_win * GRAN
        off_el = pl.multiple_of(rowoff_ref[sc, rb] * GRAN, GRAN)

        def vol_win(ref, c):
            return ref[c, pl.ds(off_el, w_el), :]

        def acc_out(ref, c, contrib):
            cur = ref[c, pl.ds(off_el, w_el), :]
            ref[c, pl.ds(off_el, w_el), :] = cur + contrib
    else:
        def vol_win(ref, c):
            return ref[c]

        def acc_out(ref, c, contrib):
            ref[c] = ref[c] + contrib

    e_k, e_b = params_ref[0], params_ref[2]
    sign, density, sscale = params_ref[3], params_ref[4], params_ref[5]
    thresh, ambient = params_ref[6], params_ref[7]
    B = g_ref.shape[2]
    Wb_n = ug_ref.shape[1]
    n_pieces = max(1, B // LANES)
    low = g_ref.dtype == jnp.bfloat16  # bf16 stream mode
    seg = seg_ref[:]

    if emission:
        T = tck_ref[0]       # carry at chunk entry, replayed within chunk
        # With no light volume, shade == 1 so the weight sum telescopes
        # (w_s = T_{s-1} - T_s) and wsum == 1 - T identically — derive
        # the wsum checkpoint instead of streaming the wck array.
        Wr = (1.0 - T) if no_wck else wck_ref[0]
        cw = cw_ref[:]
        bct = bct_ref[:]

    cols = (None if swin
            else jax.lax.broadcasted_iota(jnp.int32, (Wb_n, B), 1))
    tA = (((0,), (0,)), ((), ()))  # contract dim0 x dim0: Wa^T @ u

    for c in range(ch):
        z = slice_z_ref[sc * ch + c]
        delta = z - e_k
        cidx = (ch - 1 - c) if flip else c  # see _fwd_kernel
        frontf = jnp.where(delta * sign > 0.0, 1.0, 0.0)

        i0, i1, fb, b_in = _col_taps(e_b, delta, ug_ref[0, :], B,
                                         wrap)

        # Column scatter as a banded matmul: Wb[j, b] with b_in folded.
        # The matrix depends only on the slice, not the row block — built
        # once per slice (rb == 0) into scratch and reused by the other
        # n_rb-1 row blocks (the iota-compare build was ~40%% of bwd VPU
        # work when rebuilt per block). With swin (round 4), the matrix
        # is built as per-128-grid-col-tile WINDOWS over the base
        # columns j that scatter into each tile (j is monotone in b01, so
        # the contributing j's are contiguous): the (RB, Wb) x (Wb, B)
        # dense scatter becomes n_bt (RB, Wc) x (Wc, 128) windowed
        # matmuls, cutting its flops ~B/128-fold at large B. Window
        # offsets live in SMEM scratch; spans are host-bounded
        # (ops/sweep._scatter_window_elems).
        # (Round 5: built BEFORE the adjoint math — the sigT recompute
        # below contracts against these same matrices transposed.)
        n_bt = (B // LANES) if swin else 1
        Wc = swin * LANES

        if bigW or assoc:
            # ONE full-width one-hot matrix per slice (B, Wb): a single
            # bulk build at rb==0, a single static (RB, B) x (B, Wb) dot
            # for the recompute, and (bigW == 2) the SAME matrix
            # transposed for the column scatter — no separate wbm build,
            # no dynamic scratch traffic at all. The assoc form
            # additionally RE-ASSOCIATES both bilinear forms around it:
            #   sigma_rb = wa_rb @ (G_s @ W)        (gw built per slice)
            #   dG_s     = (sum_rb wa_rb^T dsig_rb) @ W^T   (v per slice)
            # so the Wb x B contractions run once per SLICE instead of
            # once per (row block, slice) — ~40% of the bwd MXU flops at
            # the flagship (A/B in PROFILE_r5.json).
            @pl.when(rb == 0)
            def _(c=c, cidx=cidx, i0=i0, i1=i1, fb=fb, b_in=b_in):
                src = jax.lax.broadcasted_iota(jnp.int32, (B, Wb_n), 0)
                w0 = ((1.0 - fb) * b_in)[None, :]
                w1 = (fb * b_in)[None, :]
                wbg_s[c] = (jnp.where(src == i0[None, :], w0, 0.0)
                            + jnp.where(src == i1[None, :], w1, 0.0)
                            ).astype(wbg_s.dtype)
                if assoc:
                    gm = g_ref[cidx]
                    gw_s[c] = jnp.dot(gm, wbg_s[c],
                                      preferred_element_type=jnp.float32)
                    v_s[c] = jnp.zeros(v_s.shape[1:], jnp.float32)
                    if has_light:
                        lgw_s[c] = jnp.dot(
                            l_ref[cidx], wbg_s[c],
                            preferred_element_type=jnp.float32)
                        vl_s[c] = jnp.zeros(vl_s.shape[1:], jnp.float32)

        def _wbm_build(c=c, i0=i0, i1=i1, fb=fb, b_in=b_in, delta=delta):
            if not swin:
                w0v = (1.0 - fb) * b_in
                w1v = fb * b_in
                wbm_s[c] = (jnp.where(cols == i0[:, None], w0v[:, None],
                                      0.0)
                            + jnp.where(cols == i1[:, None], w1v[:, None],
                                        0.0)).astype(wbm_s.dtype)
                return
            idx2 = jax.lax.broadcasted_iota(jnp.int32, (1, Wb_n), 1)
            for bt in range(n_bt):
                blo = bt * LANES
                touch = (b_in > 0.0) & (i1 >= blo) & (i0 < blo + LANES)
                jlo = jnp.min(jnp.where(touch[None, :], idx2, Wb_n - 1))
                joff = jnp.clip(jlo // LANES, 0, Wb_n // LANES - swin)
                joff_s[c, bt] = joff
                joel = pl.multiple_of(joff * LANES, LANES)
                # Windowed taps recomputed from a lane-dynamic REF load
                # of the slope window (Mosaic lowers dynamic ref loads —
                # even multi-tile — but NOT lane-dynamic dynamic_slice of
                # VALUES; all probed on chip, r4). Same formula and
                # inputs as the full-width taps -> identical values.
                ugw = ug_ref[:, pl.ds(joel, Wc)][0]
                i0w, i1w, fbw, b_inw = _col_taps(e_b, delta, ugw, B,
                                                 wrap)
                w0w = (1.0 - fbw) * b_inw
                w1w = fbw * b_inw
                colsw = blo + jax.lax.broadcasted_iota(
                    jnp.int32, (Wc, LANES), 1)
                wbm_s[c, bt] = (
                    jnp.where(colsw == i0w[:, None], w0w[:, None], 0.0)
                    + jnp.where(colsw == i1w[:, None], w1w[:, None], 0.0)
                ).astype(wbm_s.dtype)

        if bigW != 2 and not assoc:  # big/assoc replace wbm entirely
            pl.when(rb == 0)(_wbm_build)

        def resampleT(t, c=c):
            """sigma-style column recompute via Wbm^T (the sigT form):
            out[r, j] = sum_b t[r, b] * Wbm[j, b]. Source reads are
            STATIC 128-lane tiles of t; only the accumulation target is
            a dynamic (windowed, LANES-aligned) scratch slice. Windows
            of adjacent grid tiles overlap in j — accumulation adds
            them; each source column b lives in exactly one tile, so
            nothing double-counts. Base columns outside every window
            have both taps out of box (host bound) -> stay zero."""
            cdims = (((1,), (1,)), ((), ()))
            if not swin:
                tm = t[:, :B]
                tm = tm.astype(jnp.bfloat16) if low else tm
                return jax.lax.dot_general(
                    tm, wbm_s[c], cdims,
                    preferred_element_type=jnp.float32)
            mat_s[:] = jnp.zeros(mat_s.shape, jnp.float32)
            for bt in range(n_bt):
                joel = pl.multiple_of(joff_s[c, bt] * LANES, LANES)
                tt = t[:, bt * LANES:(bt + 1) * LANES]
                tt = tt.astype(jnp.bfloat16) if low else tt
                part = jax.lax.dot_general(
                    tt, wbm_s[c, bt], cdims,
                    preferred_element_type=jnp.float32)
                mat_s[:, pl.ds(joel, Wc)] = (mat_s[:, pl.ds(joel, Wc)]
                                             + part)
            return mat_s[:]

        if emission:
            # Recompute sigma exactly as the forward kernel did (the
            # matmul column stage sums the same two taps — equal up to
            # f32 summation order).
            t = (None if assoc else
                 _pad_lanes(jnp.dot(wa_ref[c], vol_win(g_ref, cidx),
                                    preferred_element_type=jnp.float32),
                            B))
            if assoc:
                sigma = jnp.dot(wa_ref[c], vol_win(gw_s, c),
                                preferred_element_type=jnp.float32) * sscale
            elif bigW:
                tm = t[:, :B]
                tm = tm.astype(jnp.bfloat16) if low else tm
                sigma = jnp.dot(tm, wbg_s[c],
                                preferred_element_type=jnp.float32) * sscale
            elif sigT:
                sigma = resampleT(t) * sscale
            elif colmm:
                # MXU column stage: matrices built once per slice at the
                # first row block (ONE bulk scratch write — the
                # per-chunk predicated form measured ~1.5x slower bwd),
                # shared by all row blocks (sc-major grid keeps the slot
                # live). FULL-width contraction: the windowed form
                # (dynamic ts-staged loads + SMEM offsets) also measured
                # slower here; only the rb-major forward windows.
                @pl.when(rb == 0)
                def _(c=c, i0=i0, i1=i1, fb=fb, b_in=b_in):
                    wbc_s[c] = _build_wbc_full(i0, i1, fb, b_in, B,
                                               Wb_n, wbc_s.dtype)
                sigma = _apply_wbc(t, wbc_s[c]) * sscale
            else:
                sigma = (_gather_cols(t, i0, i1, fb, b_in, Wb_n, n_pieces,
                                      cwin, ts_s)
                         * b_in[None, :] * sscale)
            if has_light:
                tl = (None if assoc else
                      _pad_lanes(jnp.dot(
                          wa_ref[c], vol_win(l_ref, cidx),
                          preferred_element_type=jnp.float32), B))
                if assoc:
                    lT = jnp.dot(wa_ref[c], vol_win(lgw_s, c),
                                 preferred_element_type=jnp.float32)
                elif bigW:
                    tlm = tl[:, :B]
                    tlm = tlm.astype(jnp.bfloat16) if low else tlm
                    lT = jnp.dot(tlm, wbg_s[c],
                                 preferred_element_type=jnp.float32)
                elif sigT:
                    lT = resampleT(tl)
                elif colmm:
                    lT = _apply_wbc(tl, wbc_s[c])
                else:
                    lT = _gather_cols(tl, i0, i1, fb, b_in, Wb_n,
                                      n_pieces, cwin, ts_s)
                shade = ambient + (1.0 - ambient) * jnp.clip(lT, 0.0, 1.0)
            else:
                shade = 1.0
            E = jnp.exp(-density * sigma * seg)
            live = (T > thresh).astype(jnp.float32) * frontf
            alpha = live * (1.0 - E)
            w = T * alpha * shade
            Wr = Wr + w
            Atil = bct - cw * Wr        # = A_s * T_s (prefix closed form)
            dsig = live * density * seg * (cw * T * shade * E - Atil)
            if has_light:
                dshade = cw * T * alpha
                # clip subgradient matching jax.numpy.clip: 1 inside,
                # 0.5 exactly at the boundaries (min/max tie convention),
                # 0 outside. Fully-lit voxels hit lT == 1.0 exactly.
                clip_g = (((lT > 0.0) & (lT < 1.0)).astype(jnp.float32)
                          + 0.5 * ((lT == 0.0) | (lT == 1.0)
                                   ).astype(jnp.float32))
                dlT = dshade * (1.0 - ambient) * clip_g
            T = T * (1.0 - alpha)
        else:
            dsig = frontf * ctacc_ref[:] * seg

        def scatter(mat, c=c):
            """(RB, Wb_n) f32 -> (RB, B): mat @ Wbm via the dense scratch
            matrix or the per-tile windowed form (bf16 MXU path in bf16
            stream mode; f32 accumulation either way)."""
            if bigW == 2:
                m = mat.astype(jnp.bfloat16) if low else mat
                return jax.lax.dot_general(
                    m, wbg_s[c], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if not swin:
                m = mat.astype(jnp.bfloat16) if low else mat
                return jnp.dot(m, wbm_s[c],
                               preferred_element_type=jnp.float32)
            mat_s[:] = mat  # stage: lane-dynamic windows are ref loads
            parts = []
            for bt in range(n_bt):
                joel = pl.multiple_of(joff_s[c, bt] * LANES, LANES)
                dsw = mat_s[:, pl.ds(joel, Wc)]
                dsw = dsw.astype(jnp.bfloat16) if low else dsw
                parts.append(jnp.dot(dsw, wbm_s[c, bt],
                                     preferred_element_type=jnp.float32))
            return jnp.concatenate(parts, axis=1)

        if assoc:
            cd11 = (((1,), (1,)), ((), ()))

            def v_acc(vref, mat, c=c):
                m = mat.astype(jnp.bfloat16) if low else mat
                vw = jax.lax.dot_general(
                    wa_ref[c], m, tA,
                    preferred_element_type=jnp.float32)  # (Wr, Wb)
                if n_win:
                    w_el2 = n_win * GRAN
                    off2 = pl.multiple_of(rowoff_ref[sc, rb] * GRAN, GRAN)
                    vref[c, pl.ds(off2, w_el2), :] = (
                        vref[c, pl.ds(off2, w_el2), :] + vw)
                else:
                    vref[c] = vref[c] + vw

            v_acc(v_s, dsig * sscale)
            if has_light:
                v_acc(vl_s, dlT)

            @pl.when(rb == pl.num_programs(1) - 1)
            def _(c=c, cidx=cidx):
                vv = v_s[c]
                vv = vv.astype(jnp.bfloat16) if low else vv
                dg_ref[cidx] = jax.lax.dot_general(
                    vv, wbg_s[c], cd11,
                    preferred_element_type=jnp.float32)
                if has_light:
                    vl = vl_s[c]
                    vl = vl.astype(jnp.bfloat16) if low else vl
                    dl_ref[cidx] = jax.lax.dot_general(
                        vl, wbg_s[c], cd11,
                        preferred_element_type=jnp.float32)
        else:
            u = scatter(dsig * sscale)
            u = u.astype(jnp.bfloat16) if low else u
            acc_out(dg_ref, cidx, jax.lax.dot_general(
                wa_ref[c], u, tA, preferred_element_type=jnp.float32))
            if has_light:
                ul = scatter(dlT)
                ul = ul.astype(jnp.bfloat16) if low else ul
                acc_out(dl_ref, cidx, jax.lax.dot_general(
                    wa_ref[c], ul, tA, preferred_element_type=jnp.float32))


def _run_bwd(gperm, lperm, slice_z, wa_all, u_grid, seglen, params, rowoff,
             n_win, cwin, swin, colmm, sigT, bigW, assoc, ch, rb_blk,
             emission, cw, bct, tck, wck, ctacc, interpret=False,
             wrap=False, flip=False):
    S, A, B = gperm.shape
    Hb = wa_all.shape[1]
    Wr = wa_all.shape[2]  # A (dense) or n_win * GRAN (windowed)
    Wb_n = u_grid.shape[0]
    n_rb = Hb // rb_blk
    n_sc = S // ch
    has_light = lperm is not None

    def sc_blk(sc):
        return (n_sc - 1 - sc) if flip else sc  # see _run_fwd

    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((ch, A, B), lambda sc, rb, *_: (sc_blk(sc), 0, 0),
                     memory_space=vm),
        pl.BlockSpec((ch, rb_blk, Wr), lambda sc, rb, *_: (sc, rb, 0),
                     memory_space=vm),
        pl.BlockSpec((1, Wb_n), lambda sc, rb, *_: (0, 0), memory_space=vm),
        pl.BlockSpec((rb_blk, Wb_n), lambda sc, rb, *_: (rb, 0),
                     memory_space=vm),
    ]
    inputs = [gperm, wa_all, u_grid.reshape(1, Wb_n), seglen]
    map_rb = pl.BlockSpec((rb_blk, Wb_n), lambda sc, rb, *_: (rb, 0),
                          memory_space=vm)
    ck = pl.BlockSpec((1, rb_blk, Wb_n), lambda sc, rb, *_: (sc, rb, 0),
                      memory_space=vm)
    no_wck = emission and wck is None
    if emission:
        in_specs += [map_rb, map_rb, ck] + ([] if no_wck else [ck])
        inputs += [cw, bct, tck] + ([] if no_wck else [wck])
    else:
        in_specs += [map_rb]
        inputs += [ctacc]
    if has_light:
        in_specs.append(pl.BlockSpec((ch, A, B), lambda sc, rb, *_:
                                     (sc_blk(sc), 0, 0), memory_space=vm))
        inputs.append(lperm)

    # dG blocks write at the mirrored index too: the gradient leaves the
    # kernel already in the volume's own slice order (no XLA reverse in
    # the vjp).
    dgs = pl.BlockSpec((ch, A, B), lambda sc, rb, *_: (sc_blk(sc), 0, 0),
                       memory_space=vm)
    out_specs = [dgs]
    out_shape = [jax.ShapeDtypeStruct((S, A, B), jnp.float32)]
    if has_light:
        out_specs.append(dgs)
        out_shape.append(jax.ShapeDtypeStruct((S, A, B), jnp.float32))

    if bigW == 2 or assoc:
        scratch = []  # the big matrix serves the scatter too
    elif swin:
        scratch = [pltpu.VMEM((ch, B // LANES, swin * LANES, LANES),
                              gperm.dtype),
                   pltpu.SMEM((ch, B // LANES), jnp.int32),
                   pltpu.VMEM((rb_blk, Wb_n), jnp.float32)]
    else:
        scratch = [pltpu.VMEM((ch, Wb_n, B), gperm.dtype)]
    # order must mirror _bwd_kernel's pops (taken from the END in this
    # sequence): [wbm family][wbg][wbc][ts][gw, v][lgw, vl]
    if bigW or assoc:
        scratch.append(pltpu.VMEM((ch, B, Wb_n), gperm.dtype))
    if colmm:
        # full-width stacked matrices (both the windowed form and the
        # per-chunk predicated-write form measured slower in bwd)
        scratch.append(pltpu.VMEM((ch, Wb_n // LANES, B, LANES),
                                  gperm.dtype))
    if cwin:
        scratch.append(pltpu.VMEM((rb_blk, max(B, LANES)), jnp.float32))
    if assoc:
        scratch += [pltpu.VMEM((ch, A, Wb_n), jnp.float32),
                    pltpu.VMEM((ch, A, Wb_n), jnp.float32)]
        if has_light:
            scratch += [pltpu.VMEM((ch, A, Wb_n), jnp.float32),
                        pltpu.VMEM((ch, A, Wb_n), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_sc, n_rb),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    light_mul = 2 if has_light else 1
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, emission=emission, ch=ch,
                          has_light=has_light, wrap=wrap, n_win=n_win,
                          cwin=cwin, swin=swin, colmm=colmm, sigT=sigT,
                          bigW=bigW, assoc=assoc, no_wck=no_wck,
                          flip=flip),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=light_mul * (2 * S * Hb * Wr * B + 2 * S * Hb * Wb_n * B
                               + 2 * S * Wr * Hb * B),
            bytes_accessed=4 * (S * A * B + S * Hb * Wr
                                + 8 * Hb * Wb_n + n_rb * S * A * B),
            transcendentals=S * Hb * Wb_n,
        ),
        interpret=interpret,
    )(slice_z, params, rowoff, *inputs)
    return out if has_light else (out[0], None)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

def _params_for(plan, cfg, medium, light):
    return jnp.stack([
        plan.eye01[0], plan.eye01[1], plan.eye01[2],
        jnp.float32(plan.sign),
        jnp.float32(medium.density),
        jnp.float32(medium.sample_scale),
        jnp.float32(cfg.early_stop_transmittance),
        jnp.float32(light.ambient),
    ])


def _layer_lerp_stack(gperm, slice_z, address_mode):
    """Layer-lerp the (D, A, B[, C]) volume onto the S slice planes:
    out[s] = volume sampled at normalized sweep coord slice_z[s] (same
    texel-center lerp as ops/sweep._layer_lerp). Differentiable — voxel
    gradients chain through the take/lerp — so the fused kernels' vjp
    boundary can sit after it. Used when n_slices != depth: the kernels
    then sweep the pre-lerped stack, whose slices are by construction at
    its own centers and already in front-to-back order (no flip)."""
    depth = gperm.shape[0]
    p = slice_z * depth - 0.5
    i0f = jnp.floor(p)
    fb = (p - i0f).astype(jnp.float32)
    i0 = i0f.astype(jnp.int32)
    from ..ops.sampling import apply_address_mode
    l0 = apply_address_mode(i0, depth, address_mode)
    l1 = apply_address_mode(i0 + 1, depth, address_mode)
    fb = fb.reshape((-1,) + (1,) * (gperm.ndim - 1))
    g0 = jnp.take(gperm, l0, axis=0)
    g1 = jnp.take(gperm, l1, axis=0)
    return g0 + fb * (g1 - g0)


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


def sweep_base_pallas(gperm, plan, cfg, medium, light, lperm=None,
                      scroll=None, interpret=False):
    """(acc, trans, color, hit) base maps via the fused forward kernel,
    with gradients from the fused backward kernel (jax.custom_vjp).

    gperm: (S, A, B) volume transposed so the sweep axis is dim 0 — or
    (S, A, B, 4) with medium.combine == "reference" (dispatches to the
    4-channel kernels below);
    lperm: optional light-transmittance volume in the same layout
    (ops/lighting.py), shaded per slice as in ops/sweep._sweep_base.
    Gradients flow to gperm AND lperm. Plan-derived arrays pass through
    the custom_vjp as explicit arguments with symbolic-zero cotangents
    (they may be TRACERS under shard_map — closing over them is
    illegal)."""
    if medium.combine == "reference":
        return sweep_base_pallas_ref(gperm, plan, cfg, medium, light,
                                     scroll=scroll, interpret=interpret,
                                     lperm=lperm)
    lt = light if light is not None else LightConfig()
    params = _params_for(plan, cfg, medium, lt)
    kdt = cfg.jnp_dtype  # stream dtype: grid + row matrices (bf16-able)
    A = gperm.shape[1]
    B = gperm.shape[2]
    S = plan.slice_z.shape[0]
    Wb_n = plan.u_grid.shape[0]
    # Backward column stage: full-width MXU matmuls whenever the grid
    # cols tile the lanes (correct for every address mode — the one-hot
    # build compares against arbitrary in-range taps).
    colmm = (_COL_STAGE in ("auto", "mm", "1")
             and B % LANES == 0
             and Wb_n % LANES == 0)
    form = _bwd_sigma()
    sigT = colmm and form == "scatterT"
    bigW = ({"big": 2, "bigsig": 1}.get(form, 0) if colmm else 0)
    assoc = colmm and form in ("auto", "assoc")
    # Slice-chunk size: gcd(CHUNK, S), halved while the assoc form's
    # per-chunk scratch (wbg + gw + v [+ lgw + vl]) would overflow VMEM
    # (the 512^3 assoc compile failed at ch=8: ~75 MB of scratch; ch=4
    # fits). fwd, bwd AND the row-offset tables must agree on ch — the
    # backward replays from the forward's per-chunk checkpoints and
    # rowoff is indexed by slice chunk.
    ch = math.gcd(CHUNK, S)
    if assoc:
        per = 4 * (B * Wb_n
                   + (2 if lperm is None else 4) * A * Wb_n)
        while ch > 1 and ch * per > 56 * 1024 * 1024:
            ch = math.gcd(ch // 2, S)
            ch = max(ch, 1)
    # Forward form: "auto" takes the sc-major assoc forward
    # (_run_fwd_sc; chip A/B: base fwd 3.33 -> 2.55 ms) whenever its
    # VMEM footprint fits — full-size carries + 2 checkpoint blocks are
    # fixed, wbg/gw(/lgw) + grid(/light) blocks scale with ch (shrunk
    # jointly with the backward's ch: the two kernels must agree on the
    # checkpoint chunking) — else the r4 per-chunk "mm" column stage.
    fwd_form = _col_stage_fwd()
    colmm_f = 1 if colmm else 0
    if fwd_form in ("gather", "0"):
        colmm_f = 0
    elif colmm and fwd_form == "big":
        colmm_f = 2
    elif colmm and fwd_form in ("auto", "assoc"):
        Hb_ = plan.v_grid.shape[0]
        lmul = 1 if lperm is None else 2
        fixed_f = 6 * Hb_ * Wb_n * 4        # 4 carries + 2 ckpt blocks
        per_f = 4 * lmul * ((B + A) * Wb_n + A * B)
        ch_f = ch
        while ch_f > 1 and fixed_f + ch_f * per_f > 96 * 1024 * 1024:
            ch_f = max(math.gcd(ch_f // 2, S), 1)
        if fixed_f + ch_f * per_f <= 96 * 1024 * 1024:
            colmm_f = 3
            ch = min(ch, ch_f)
    rw = 0 if "row" in _WIN_DISABLE else getattr(plan, "row_window", 0)
    n_win = 0
    if (rw and rw % GRAN == 0 and rw < A and A % GRAN == 0
            and cfg.address_mode in ("mirror", "clamp")):
        n_win = rw // GRAN
    rb_blk = _rb_for(plan.v_grid.shape[0])
    if n_win:
        rowoff, wa_win = _row_windows(plan, A, n_win, ch, rb_blk)
        rowoff = jax.lax.stop_gradient(rowoff)
        wa_all = jax.lax.stop_gradient(wa_win).astype(kdt)
    else:
        rowoff = jnp.zeros((1, 1), jnp.int32)
        wa_all = jax.lax.stop_gradient(
            _row_matrices(plan, A, cfg.address_mode)).astype(kdt)
    wrap_mode = cfg.address_mode == "wrap"
    cw_el = 0 if "col" in _WIN_DISABLE else getattr(plan, "col_window", 0)
    cwin = 0
    if (cw_el and cw_el % LANES == 0 and B % LANES == 0 and cw_el < B
            and cfg.address_mode in ("mirror", "clamp")):
        cwin = cw_el // LANES
    sw_el = (0 if "scatter" in _WIN_DISABLE
             else getattr(plan, "scatter_window", 0))
    swin = 0
    if (sw_el and sw_el % LANES == 0 and B % LANES == 0
            and sw_el < plan.u_grid.shape[0]
            and cfg.address_mode in ("mirror", "clamp")):
        swin = sw_el // LANES
    if S != gperm.shape[0]:
        # Sub-voxel-count quadrature (the reference marches <= 128 steps
        # for ANY volume, frag.glsl:30): lerp the volume onto the slice
        # planes in XLA — differentiable, so dL/dgrid chains through.
        gperm = _layer_lerp_stack(gperm, plan.slice_z, cfg.address_mode)
        if lperm is not None:
            lperm = _layer_lerp_stack(lperm, plan.slice_z,
                                      cfg.address_mode)
        flip = False  # the stack is already in slice (front-to-back) order
    else:
        flip = plan.sign < 0

    # The slice-order flip is INSIDE the kernels (round 5): the volume
    # keeps its original layout and the kernels stream dim-0 blocks at
    # mirrored indices (dG writes mirrored too, so the gradient needs no
    # reverse either). The former XLA-level [::-1] copy + its autodiff
    # reverse measured ~0.3 ms/frame at the flagship (134 MB each).
    # Everything traced goes in as an explicit argument (see _fused_vjp).
    # VOLT_FORCE_WCK=1 disables the no-light wsum-checkpoint elision
    # (A/B tool; read at trace time like the bwd-form knob).
    force_wck = bool(int(_os.environ.get("VOLT_FORCE_WCK", "0")))
    f = _fused_vjp(cfg.emission, lperm is not None, n_win, cwin, swin,
                   colmm, colmm_f, sigT, bigW, assoc, ch, rb_blk,
                   interpret, wrap_mode, cfg.dtype, force_wck, flip)
    if lperm is None:
        return f(gperm, plan.slice_z, wa_all, plan.u_grid, plan.seglen,
                 params, rowoff)
    return f(gperm, lperm, plan.slice_z, wa_all, plan.u_grid,
             plan.seglen, params, rowoff)


@functools.lru_cache(maxsize=None)
def _fused_vjp(emission, has_light, n_win, cwin, swin, colmm, colmm_f,
               sigT, bigW, assoc, ch, rb_blk, interpret, wrap,
               dtype_name, force_wck=False, flip=False):
    """custom_vjp instance for one static kernel configuration.

    EVERY traced array is an explicit argument: a custom_vjp must not
    close over tracers of an enclosing trace — under shard_map the local
    plan's arrays ARE tracers, and the round-3 closure form silently
    broke the sharded backward (UnexpectedTracerError; its tests were
    forward-only). Plan-derived args get symbolic-zero cotangents.
    Cached per static combo so repeated renders reuse one vjp identity
    (helps jit tracing too)."""
    kdt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    # No light volume -> shade == 1 -> the wsum checkpoint is redundant
    # (telescoping: wsum == 1 - trans); skip its write AND read.
    with_wck = has_light or force_wck

    def run_fwd(g, l, slice_z, wa, ug, seg, params, rowoff, with_ckpt):
        if colmm_f == 3:
            return _run_fwd_sc(g.astype(kdt),
                               None if l is None else l.astype(kdt),
                               slice_z, wa, ug, seg, params, rowoff,
                               n_win, ch, rb_blk, emission, with_ckpt,
                               interpret, wrap, with_wck=with_wck,
                               flip=flip)
        return _run_fwd(g.astype(kdt),
                        None if l is None else l.astype(kdt),
                        slice_z, wa, ug, seg, params, rowoff, n_win,
                        cwin, colmm_f, ch, rb_blk, emission, with_ckpt,
                        interpret, wrap, with_wck=with_wck, flip=flip)

    def run_bwd(g, l, ct, trans, wsum, tck, wck, slice_z, wa, ug, seg,
                params, rowoff):
        ct_acc, ct_trans, ct_wsum, _ct_hit = ct
        g = g.astype(kdt)
        l = None if l is None else l.astype(kdt)
        if emission:
            cw = ct_wsum
            bct = ct_trans * trans + cw * wsum
            return _run_bwd(g, l, slice_z, wa, ug, seg, params, rowoff,
                            n_win, cwin, swin,
                            colmm and not (sigT or bigW or assoc), sigT,
                            bigW, assoc, ch, rb_blk, True, cw, bct, tck,
                            wck, None, interpret, wrap, flip=flip)
        return _run_bwd(g, l, slice_z, wa, ug, seg, params, rowoff,
                        n_win, cwin, swin,
                        colmm and not (sigT or bigW or assoc), sigT,
                        bigW, assoc, ch, rb_blk, False, None, None, None,
                        None, ct_acc, interpret, wrap, flip=flip)

    def plan_zeros(slice_z, wa, ug, seg, params, rowoff):
        return (jnp.zeros_like(slice_z), jnp.zeros_like(wa),
                jnp.zeros_like(ug), jnp.zeros_like(seg),
                jnp.zeros_like(params),
                np.zeros(rowoff.shape, dtype=jax.dtypes.float0))

    if not has_light:

        @jax.custom_vjp
        def f(g, slice_z, wa, ug, seg, params, rowoff):
            return run_fwd(g, None, slice_z, wa, ug, seg, params, rowoff,
                           False)[:4]

        def f_fwd(g, slice_z, wa, ug, seg, params, rowoff):
            outs = run_fwd(g, None, slice_z, wa, ug, seg, params, rowoff,
                           emission)
            tck = outs[4] if emission else None
            wck = outs[5] if emission and with_wck else None
            return tuple(outs[:4]), (g, outs[1], outs[2], tck, wck,
                                     slice_z, wa, ug, seg, params, rowoff)

        def f_bwd(res, ct):
            (g, trans, wsum, tck, wck, slice_z, wa, ug, seg, params,
             rowoff) = res
            dg, _ = run_bwd(g, None, ct, trans, wsum, tck, wck, slice_z,
                            wa, ug, seg, params, rowoff)
            # cotangent dtype must match the primal's (dG accumulates
            # f32 in-kernel either way).
            # optimization_barrier: XLA may otherwise fuse/schedule the
            # gradient's CONSUMERS (e.g. an optimizer update whose jit
            # also returns the updated grid) into the backward kernel's
            # region, corrupting dG — observed on chip as a
            # deterministic, compilation-context-dependent half-wrong
            # gradient: the grad-only jit of the SAME loss was correct,
            # while a train-step jit returning the updated grid lost
            # ~half the gradient mass (rel err ~1.0). Barriering the
            # kernel output fixes it and is free at run time.
            dg = jax.lax.optimization_barrier(dg.astype(g.dtype))
            return (dg,) + plan_zeros(
                slice_z, wa, ug, seg, params, rowoff)

        f.defvjp(f_fwd, f_bwd)
        return f

    @jax.custom_vjp
    def f2(g, l, slice_z, wa, ug, seg, params, rowoff):
        return run_fwd(g, l, slice_z, wa, ug, seg, params, rowoff,
                       False)[:4]

    def f2_fwd(g, l, slice_z, wa, ug, seg, params, rowoff):
        outs = run_fwd(g, l, slice_z, wa, ug, seg, params, rowoff,
                       emission)
        tck, wck = (outs[4], outs[5]) if emission else (None, None)
        return tuple(outs[:4]), (g, l, outs[1], outs[2], tck, wck,
                                 slice_z, wa, ug, seg, params, rowoff)

    def f2_bwd(res, ct):
        (g, l, trans, wsum, tck, wck, slice_z, wa, ug, seg, params,
         rowoff) = res
        dg, dl = run_bwd(g, l, ct, trans, wsum, tck, wck, slice_z, wa,
                         ug, seg, params, rowoff)
        if dl is None:
            dl = jnp.zeros_like(l)
        # optimization_barrier: see f_bwd above.
        dg, dl = jax.lax.optimization_barrier(
            (dg.astype(g.dtype), dl.astype(l.dtype)))
        return (dg, dl) + plan_zeros(
            slice_z, wa, ug, seg, params, rowoff)

    f2.defvjp(f2_fwd, f2_bwd)
    return f2


# ---------------------------------------------------------------------------
# Reference-combine kernels: 4 channels, per-channel coordinate scale +
# scroll, mirror addressing — the "reference" preset's media
# (frag.glsl:63-71: sigma = (s1*s2)*(s3+s4)*scale with scaled+scrolled
# sample coords per channel; sampler mirror semantics
# VulkanCore.cpp:683-685).
#
# Decomposition: the sweep-axis layer-lerp at per-channel scaled/scrolled
# k-coords is hoisted OUT of the kernel into plain XLA (_layer_channels:
# one (S, 4, A, B) gather+lerp per frame — differentiable, so autodiff
# chains voxel gradients through it); the kernels stream those lerped
# slices plus per-(slice, channel) banded row matrices and do, per slice:
# 4 MXU row-resamples, 4 mirrored lane-gather column stages, the channel
# combine, and the same compositing/adjoint math as the single-channel
# kernels. Mirror addressing of the in-plane taps is index arithmetic
# (period-2B reflection) on the lane vectors.
# ---------------------------------------------------------------------------

NCH = 4


def _mirror_idx(i, n):
    """VK_MIRRORED_REPEAT on integer texel indices (lane math; matches
    ops/sampling.apply_address_mode)."""
    m = jnp.remainder(i, 2 * n)
    return jnp.where(m >= n, 2 * n - 1 - m, m)


def _col_taps_ref(e_b, delta, ug_row, B, sc, offb):
    """Column taps for one (slice, channel): mirrored indices + fraction
    at scaled/scrolled coords, and the UNSCALED in-box mask (the box test
    comes from the ray, frag.glsl:39-46; the sampler mirror applies only
    to the texture coordinate)."""
    b01 = e_b + delta * ug_row
    b_in = ((b01 >= 0.0) & (b01 <= 1.0)).astype(jnp.float32)
    pc = b01 * sc + offb
    pb = pc * B - 0.5
    ibf = jnp.floor(pb)
    fb = pb - ibf
    ib = ibf.astype(jnp.int32)
    return _mirror_idx(ib, B), _mirror_idx(ib + 1, B), fb, b_in


def _fwd_kernel_ref(slice_z_ref, params_ref, *refs, emission, ch,
                    with_ckpt, with_wck, has_light, colmm):
    i = 0
    l_ref = refs[i]; i += 1          # (ch, NCH, A, B) lerped layers
    wa_ref = refs[i]; i += 1         # (ch, NCH, RB, A)
    ug_ref = refs[i]; i += 1
    seg_ref = refs[i]; i += 1
    lv_ref = wal_ref = None
    if has_light:
        lv_ref = refs[i]; i += 1     # (ch, A, B) lerped light slabs
        wal_ref = refs[i]; i += 1    # (ch, RB, A) unscaled row matrices
    acc_ref, trans_ref, wsum_ref, hit_ref = refs[i:i + 4]; i += 4
    tck_ref = wck_ref = None
    if with_ckpt:
        tck_ref = refs[i]; i += 1
        if with_wck:
            wck_ref = refs[i]; i += 1

    sc_i = pl.program_id(1)

    @pl.when(sc_i == 0)
    def _():
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
        trans_ref[:] = jnp.ones(trans_ref.shape, jnp.float32)
        wsum_ref[:] = jnp.zeros(wsum_ref.shape, jnp.float32)
        hit_ref[:] = jnp.zeros(hit_ref.shape, jnp.float32)

    if with_ckpt:
        # wck skipped when no light volume: shade == 1 telescopes the
        # weight sum (wsum == 1 - trans; see _fwd_kernel).
        tck_ref[0] = trans_ref[:]
        if with_wck:
            wck_ref[0] = wsum_ref[:]

    e_k, e_b = params_ref[0], params_ref[2]
    sign, density, sscale = params_ref[3], params_ref[4], params_ref[5]
    thresh, ambient = params_ref[6], params_ref[7]
    B = l_ref.shape[3]
    n_pieces = max(1, B // LANES)
    Wb_n = ug_ref.shape[1]

    for s in range(ch):
        z = slice_z_ref[sc_i * ch + s]
        delta = z - e_k

        @pl.when(delta * sign > 0.0)
        def _(s=s, delta=delta):
            r = []
            b_in = None
            for c in range(NCH):
                t = _pad_lanes(jnp.dot(wa_ref[s, c], l_ref[s, c],
                                       preferred_element_type=jnp.float32),
                               B)
                i0, i1, fb, b_in = _col_taps_ref(
                    e_b, delta, ug_ref[0, :], B,
                    params_ref[8 + c], params_ref[12 + c])
                if colmm:
                    # MXU column stage (built per use — this grid is
                    # rb-major; measured faster than the gathers anyway)
                    r.append(_apply_wbc(t, _build_wbc_full(
                        i0, i1, fb, b_in, B, Wb_n, jnp.float32)))
                else:
                    r.append(_gather_cols(t, i0, i1, fb, b_in, Wb_n,
                                          n_pieces))
            sigma = (r[0] * r[1]) * (r[2] + r[3]) * (sscale * b_in[None, :])

            if has_light:
                # Light-transmittance shading at UNSCALED coords (the
                # shadow volume is not a scrolled noise channel) — same
                # math as the single-channel kernels.
                i0u, i1u, fbu, _b = _col_taps(e_b, delta, ug_ref[0, :],
                                              B, False)
                tl = _pad_lanes(jnp.dot(wal_ref[s], lv_ref[s],
                                        preferred_element_type=jnp.float32),
                                B)
                lT = _gather_cols(tl, i0u, i1u, fbu, _b, Wb_n, n_pieces)
                shade = ambient + (1.0 - ambient) * jnp.clip(lT, 0.0, 1.0)
            else:
                shade = 1.0

            if emission:
                trans = trans_ref[:]
                live = (trans > thresh).astype(jnp.float32)
                alpha = live * (
                    1.0 - jnp.exp(-density * sigma * seg_ref[:]))
                wsum_ref[:] = wsum_ref[:] + trans * alpha * shade
                trans_ref[:] = trans * (1.0 - alpha)
            else:
                acc_ref[:] = acc_ref[:] + sigma * seg_ref[:]
                a_in = jnp.sum(wa_ref[s, 0], axis=1, keepdims=True)
                a_in = jnp.minimum(a_in, 1.0)
                hit_ref[:] = jnp.maximum(hit_ref[:], a_in * b_in[None, :])


def _run_fwd_ref(lperm4, lvperm, wal_all, slice_z, wa_all, u_grid,
                 seglen, params, emission, with_ckpt, interpret=False,
                 with_wck=True):
    S, _, A, B = lperm4.shape
    Hb = wa_all.shape[2]
    Wb_n = u_grid.shape[0]
    n_rb = Hb // RB
    ch = math.gcd(CHUNK, S)
    n_sc = S // ch
    has_light = lvperm is not None

    in_specs = [
        pl.BlockSpec((ch, NCH, A, B), lambda rb, sc, *_: (sc, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ch, NCH, RB, A), lambda rb, sc, *_: (sc, 0, rb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Wb_n), lambda rb, sc, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, Wb_n), lambda rb, sc, *_: (rb, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [lperm4, wa_all, u_grid.reshape(1, Wb_n), seglen]
    if has_light:
        in_specs += [
            pl.BlockSpec((ch, A, B), lambda rb, sc, *_: (sc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, RB, A), lambda rb, sc, *_: (sc, rb, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [lvperm, wal_all]

    map_out = pl.BlockSpec((RB, Wb_n), lambda rb, sc, *_: (rb, 0),
                           memory_space=pltpu.VMEM)
    out_specs = [map_out] * 4
    out_shape = [jax.ShapeDtypeStruct((Hb, Wb_n), jnp.float32)] * 4
    if with_ckpt:
        ck = pl.BlockSpec((1, RB, Wb_n), lambda rb, sc, *_: (sc, rb, 0),
                          memory_space=pltpu.VMEM)
        n_ck = 2 if with_wck else 1
        out_specs += [ck] * n_ck
        out_shape += [jax.ShapeDtypeStruct((n_sc, Hb, Wb_n),
                                           jnp.float32)] * n_ck

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_rb, n_sc),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    colmm = (_COL_STAGE in ("auto", "mm", "1") and B % LANES == 0
             and Wb_n % LANES == 0)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_ref, emission=emission, ch=ch,
                          with_ckpt=with_ckpt, with_wck=with_wck,
                          has_light=has_light, colmm=colmm),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=NCH * (2 * S * Hb * A * B + 10 * S * Hb * Wb_n),
            bytes_accessed=4 * (n_rb * S * NCH * A * B
                                + S * NCH * Hb * A + 5 * Hb * Wb_n),
            transcendentals=S * Hb * Wb_n,
        ),
        interpret=interpret,
    )(slice_z, params, *inputs)


def _bwd_kernel_ref(slice_z_ref, params_ref, *refs, emission, ch,
                    has_light, colmm, no_wck=False):
    wbc4_s = None
    if colmm:
        refs, wbc4_s = refs[:-1], refs[-1]
    i = 0
    l_ref = refs[i]; i += 1
    wa_ref = refs[i]; i += 1
    ug_ref = refs[i]; i += 1
    seg_ref = refs[i]; i += 1
    if emission:
        cw_ref = refs[i]; i += 1
        bct_ref = refs[i]; i += 1
        tck_ref = refs[i]; i += 1
        if not no_wck:
            wck_ref = refs[i]; i += 1
    else:
        ctacc_ref = refs[i]; i += 1
    lv_ref = wal_ref = dlv_ref = None
    if has_light:
        lv_ref = refs[i]; i += 1
        wal_ref = refs[i]; i += 1
    dl_ref = refs[i]; i += 1
    if has_light:
        dlv_ref = refs[i]

    sc_i = pl.program_id(0)
    rb = pl.program_id(1)

    @pl.when(rb == 0)
    def _():
        dl_ref[:] = jnp.zeros(dl_ref.shape, jnp.float32)
        if has_light:
            dlv_ref[:] = jnp.zeros(dlv_ref.shape, jnp.float32)

    e_k, e_b = params_ref[0], params_ref[2]
    sign, density, sscale = params_ref[3], params_ref[4], params_ref[5]
    thresh, ambient = params_ref[6], params_ref[7]
    B = l_ref.shape[3]
    Wb_n = ug_ref.shape[1]
    n_pieces = max(1, B // LANES)
    seg = seg_ref[:]

    if emission:
        T = tck_ref[0]
        # no light -> shade == 1 -> wsum == 1 - T (see _bwd_kernel)
        Wr = (1.0 - T) if no_wck else wck_ref[0]
        cw = cw_ref[:]
        bct = bct_ref[:]

    cols = jax.lax.broadcasted_iota(jnp.int32, (Wb_n, B), 1)
    tA = (((0,), (0,)), ((), ()))

    for s in range(ch):
        z = slice_z_ref[sc_i * ch + s]
        delta = z - e_k
        frontf = jnp.where(delta * sign > 0.0, 1.0, 0.0)

        # Recompute the 4 resampled channel slices exactly as forward.
        r = []
        taps = []
        b_in = None
        for c in range(NCH):
            t = _pad_lanes(jnp.dot(wa_ref[s, c], l_ref[s, c],
                                   preferred_element_type=jnp.float32), B)
            i0, i1, fb, b_in = _col_taps_ref(
                e_b, delta, ug_ref[0, :], B,
                params_ref[8 + c], params_ref[12 + c])
            taps.append((i0, i1, fb))
            if colmm:
                # per-(slice, channel) matrices built once at the first
                # row block (sc-major grid; ONE bulk write per channel)
                @pl.when(rb == 0)
                def _(s=s, c=c, i0=i0, i1=i1, fb=fb, b_in=b_in):
                    wbc4_s[s, c] = _build_wbc_full(i0, i1, fb, b_in, B,
                                                   Wb_n, wbc4_s.dtype)
                r.append(_apply_wbc(t, wbc4_s[s, c]))
            else:
                r.append(_gather_cols(t, i0, i1, fb, b_in, Wb_n,
                                      n_pieces))
        sigma = (r[0] * r[1]) * (r[2] + r[3]) * (sscale * b_in[None, :])

        if has_light:
            i0u, i1u, fbu, b_inu = _col_taps(e_b, delta, ug_ref[0, :], B,
                                             False)
            tl = _pad_lanes(jnp.dot(wal_ref[s], lv_ref[s],
                                    preferred_element_type=jnp.float32),
                            B)
            lT = _gather_cols(tl, i0u, i1u, fbu, b_inu, Wb_n, n_pieces)
            shade = ambient + (1.0 - ambient) * jnp.clip(lT, 0.0, 1.0)
        else:
            shade = 1.0

        if emission:
            E = jnp.exp(-density * sigma * seg)
            live = (T > thresh).astype(jnp.float32) * frontf
            alpha = live * (1.0 - E)
            Wr = Wr + T * alpha * shade
            Atil = bct - cw * Wr
            dsig = live * density * seg * (cw * T * shade * E - Atil)
            if has_light:
                dshade = cw * T * alpha
                clip_g = (((lT > 0.0) & (lT < 1.0)).astype(jnp.float32)
                          + 0.5 * ((lT == 0.0) | (lT == 1.0)
                                   ).astype(jnp.float32))
                dlT = dshade * (1.0 - ambient) * clip_g
            T = T * (1.0 - alpha)
        else:
            dsig = frontf * ctacc_ref[:] * seg

        dsig = dsig * (sscale * b_in[None, :])
        s34 = r[2] + r[3]
        dr = (dsig * r[1] * s34, dsig * r[0] * s34,
              dsig * r[0] * r[1], dsig * r[0] * r[1])
        low = l_ref.dtype == jnp.bfloat16
        for c in range(NCH):
            i0, i1, fb = taps[c]
            Wbm = (jnp.where(cols == i0[:, None], (1.0 - fb)[:, None], 0.0)
                   + jnp.where(cols == i1[:, None], fb[:, None], 0.0))
            if low:
                # bf16 stream mode: both scatter dots on the bf16 MXU
                # path (f32 accumulation), matching the wa stream dtype.
                u = jnp.dot(dr[c].astype(jnp.bfloat16),
                            Wbm.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                dl_ref[s, c] = dl_ref[s, c] + jax.lax.dot_general(
                    wa_ref[s, c], u.astype(jnp.bfloat16), tA,
                    preferred_element_type=jnp.float32)
            else:
                u = jnp.dot(dr[c], Wbm, preferred_element_type=jnp.float32)
                dl_ref[s, c] = dl_ref[s, c] + jax.lax.dot_general(
                    wa_ref[s, c], u, tA,
                    preferred_element_type=jnp.float32)
        if has_light and emission:
            # Light-volume gradient: unscaled 2-banded column scatter +
            # transposed unscaled row matmul (the single-channel bwd's
            # dL path; b_in folded so out-of-box rays contribute 0).
            Wbu = (jnp.where(cols == i0u[:, None],
                             ((1.0 - fbu) * b_inu)[:, None], 0.0)
                   + jnp.where(cols == i1u[:, None],
                               (fbu * b_inu)[:, None], 0.0))
            if low:
                ul = jnp.dot(dlT.astype(jnp.bfloat16),
                             Wbu.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
                dlv_ref[s] = dlv_ref[s] + jax.lax.dot_general(
                    wal_ref[s], ul.astype(jnp.bfloat16), tA,
                    preferred_element_type=jnp.float32)
            else:
                ul = jnp.dot(dlT, Wbu, preferred_element_type=jnp.float32)
                dlv_ref[s] = dlv_ref[s] + jax.lax.dot_general(
                    wal_ref[s], ul, tA,
                    preferred_element_type=jnp.float32)


def _run_bwd_ref(lperm4, lvperm, wal_all, slice_z, wa_all, u_grid,
                 seglen, params, emission, cw, bct, tck, wck, ctacc,
                 interpret=False):
    S, _, A, B = lperm4.shape
    Hb = wa_all.shape[2]
    Wb_n = u_grid.shape[0]
    n_rb = Hb // RB
    ch = math.gcd(CHUNK, S)
    n_sc = S // ch
    has_light = lvperm is not None

    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((ch, NCH, A, B), lambda sc, rb, *_: (sc, 0, 0, 0),
                     memory_space=vm),
        pl.BlockSpec((ch, NCH, RB, A), lambda sc, rb, *_: (sc, 0, rb, 0),
                     memory_space=vm),
        pl.BlockSpec((1, Wb_n), lambda sc, rb, *_: (0, 0), memory_space=vm),
        pl.BlockSpec((RB, Wb_n), lambda sc, rb, *_: (rb, 0),
                     memory_space=vm),
    ]
    inputs = [lperm4, wa_all, u_grid.reshape(1, Wb_n), seglen]
    map_rb = pl.BlockSpec((RB, Wb_n), lambda sc, rb, *_: (rb, 0),
                          memory_space=vm)
    ck = pl.BlockSpec((1, RB, Wb_n), lambda sc, rb, *_: (sc, rb, 0),
                      memory_space=vm)
    no_wck = emission and wck is None
    if emission:
        in_specs += [map_rb, map_rb, ck] + ([] if no_wck else [ck])
        inputs += [cw, bct, tck] + ([] if no_wck else [wck])
    else:
        in_specs += [map_rb]
        inputs += [ctacc]
    if has_light:
        in_specs += [
            pl.BlockSpec((ch, A, B), lambda sc, rb, *_: (sc, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((ch, RB, A), lambda sc, rb, *_: (sc, rb, 0),
                         memory_space=vm),
        ]
        inputs += [lvperm, wal_all]

    dls = pl.BlockSpec((ch, NCH, A, B), lambda sc, rb, *_: (sc, 0, 0, 0),
                       memory_space=vm)
    out_specs = [dls]
    out_shape = [jax.ShapeDtypeStruct((S, NCH, A, B), jnp.float32)]
    if has_light:
        out_specs.append(pl.BlockSpec((ch, A, B),
                                      lambda sc, rb, *_: (sc, 0, 0),
                                      memory_space=vm))
        out_shape.append(jax.ShapeDtypeStruct((S, A, B), jnp.float32))
    colmm = (_COL_STAGE in ("auto", "mm", "1") and B % LANES == 0
             and Wb_n % LANES == 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_sc, n_rb),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=([pltpu.VMEM((ch, NCH, Wb_n // LANES, B, LANES),
                                    lperm4.dtype)] if colmm else []),
    )
    light_mul = 2 if has_light else 1
    out = pl.pallas_call(
        functools.partial(_bwd_kernel_ref, emission=emission, ch=ch,
                          has_light=has_light, colmm=colmm,
                          no_wck=no_wck),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=light_mul * NCH * (4 * S * Hb * A * B
                                     + 2 * S * Hb * Wb_n * B),
            bytes_accessed=4 * 2 * n_rb * S * NCH * A * B,
            transcendentals=S * Hb * Wb_n,
        ),
        interpret=interpret,
    )(slice_z, params, *inputs)
    return (out[0], out[1]) if has_light else (out[0], None)


def _channel_offsets(medium, scroll, coord_order):
    """Per-channel scroll offsets in (k, a, b) coord order (traced)."""
    c_k, c_a, c_b = coord_order
    offs = []
    for c in range(NCH):
        if scroll is None:
            offs.append((jnp.float32(0.0),) * 3)
        else:
            o = scroll[c] * medium.channel_scroll_weight[c]
            offs.append((o[c_k], o[c_a], o[c_b]))
    return offs


def _layer_channels(gperm4, slice_z, medium, offs, address_mode):
    """XLA precompute: for every slice s and channel c, the layer-lerped
    2D slab of channel c at k-coord z_s*scale_c + offk_c (the sweep-axis
    third of the trilinear sample, frag.glsl:66-69). Returns (S, C, A, B);
    differentiable, so the custom_vjp kernel boundary can sit *after* it
    and autodiff carries dL -> dgrid through the lerp."""
    depth = gperm4.shape[0]
    chans = []
    for c in range(NCH):
        qk = slice_z * medium.channel_coord_scale[c] + offs[c][0]
        p = qk * depth - 0.5
        i0 = jnp.floor(p)
        f = (p - i0).astype(jnp.float32)[:, None, None]
        i0 = i0.astype(jnp.int32)
        from ..ops.sampling import apply_address_mode
        l0 = apply_address_mode(i0, depth, address_mode)
        l1 = apply_address_mode(i0 + 1, depth, address_mode)
        g = gperm4[..., c]
        chans.append(jnp.take(g, l0, axis=0) * (1.0 - f)
                     + jnp.take(g, l1, axis=0) * f)
    return jnp.stack(chans, axis=1)


def _row_matrices_ref(plan, A, medium, offs, address_mode):
    """Per-(slice, channel) banded row matrices at scaled/scrolled a-coords
    with mirror addressing, rows zeroed where the UNSCALED position exits
    the box (the ray-box mask folded into the matrix). (S, C, Hb, A)."""
    from ..ops.resample import linear_resample_matrix

    def one(z):
        a01 = plan.eye01[1] + (z - plan.eye01[0]) * plan.v_grid
        inr = ((a01 >= 0.0) & (a01 <= 1.0)).astype(jnp.float32)
        mats = []
        for c in range(NCH):
            ac = a01 * medium.channel_coord_scale[c] + offs[c][1]
            mats.append(linear_resample_matrix(ac, A, address_mode)
                        * inr[:, None])
        return jnp.stack(mats, axis=0)

    return jax.vmap(one)(plan.slice_z)


def sweep_base_pallas_ref(gperm4, plan, cfg, medium, light, scroll=None,
                          interpret=False, lperm4=None, lperm=None,
                          lvperm=None):
    """Reference-combine base maps via the 4-channel fused kernels.

    gperm4: (S, A, B, 4) transposed volume. The layer-lerp precompute and
    row-matrix build stay in XLA (differentiable); the custom_vjp boundary
    wraps only the pallas sweep over the lerped slices, so voxel gradients
    chain automatically through the precompute.

    lperm4: optionally the ALREADY-LERPED per-(slice, channel) slabs
    (S, C, A, B) in plan.slice_z (front-to-back) order — the sharded
    renderer computes them outside shard_map, where GSPMD handles the
    cross-slab k-gathers, and passes each device's local block here
    (gperm4 is then ignored and may be None).

    lperm: optional light-transmittance volume (D, A, B) in the same
    transposed layout, shaded per slice at UNSCALED coords (round 4 —
    the last fused-kernel gate gap: a shadowed reference-combine scene
    previously fell back to the jnp sweep silently). Gradients flow to
    the grid channels AND the light volume.

    lvperm: optionally the ALREADY-LERPED light slabs (S, A, B) in
    plan.slice_z (front-to-back) order — the sharded renderer lerps the
    light stack outside shard_map (GSPMD handles the cross-slab
    k-gathers) and passes each device's local block here (lperm is then
    ignored and may be None)."""
    lt = light if light is not None else LightConfig()
    offs = _channel_offsets(medium, scroll, plan.coord_order)
    params = jnp.concatenate([
        _params_for(plan, cfg, medium, lt),
        jnp.asarray(medium.channel_coord_scale, jnp.float32),
        jnp.stack([offs[c][2] for c in range(NCH)]),
    ])
    A = gperm4.shape[1] if lperm4 is None else lperm4.shape[2]
    kdt = cfg.jnp_dtype  # stream dtype (bf16-able; f32 accumulators)
    wa_all = jax.lax.stop_gradient(
        _row_matrices_ref(plan, A, medium, offs,
                          cfg.address_mode)).astype(kdt)
    if lperm4 is None:
        lperm4 = _layer_channels(gperm4, plan.slice_z, medium, offs,
                                 cfg.address_mode)
    lperm4 = lperm4.astype(kdt)  # autodiff casts the cotangent back

    if lperm is None and lvperm is None:
        f = _fused_vjp_ref(cfg.emission, False, interpret)
        return f(lperm4, plan.slice_z, wa_all, plan.u_grid, plan.seglen,
                 params)
    if lvperm is None:
        # Pre-lerp the light volume onto the slice planes
        # (differentiable; also covers n_slices != depth) and build its
        # unscaled row matrices.
        lvperm = _layer_lerp_stack(lperm, plan.slice_z, cfg.address_mode)
    lvperm = lvperm.astype(kdt)
    wal_all = jax.lax.stop_gradient(
        _row_matrices(plan, lvperm.shape[1], cfg.address_mode)).astype(kdt)
    f = _fused_vjp_ref(cfg.emission, True, interpret)
    return f(lperm4, lvperm, wal_all, plan.slice_z, wa_all, plan.u_grid,
             plan.seglen, params)


@functools.lru_cache(maxsize=None)
def _fused_vjp_ref(emission, has_light, interpret):
    """Reference-combine custom_vjp instance — same no-closed-over-
    tracers contract as _fused_vjp (the sharded reference path passes
    shard_map-traced plan arrays and channel slabs)."""

    def plan_zeros(slice_z, wa, ug, seg, params):
        return (jnp.zeros_like(slice_z), jnp.zeros_like(wa),
                jnp.zeros_like(ug), jnp.zeros_like(seg),
                jnp.zeros_like(params))

    if not has_light:

        @jax.custom_vjp
        def f(L, slice_z, wa, ug, seg, params):
            return _run_fwd_ref(L, None, None, slice_z, wa, ug, seg,
                                params, emission, False, interpret)[:4]

        def f_fwd(L, slice_z, wa, ug, seg, params):
            outs = _run_fwd_ref(L, None, None, slice_z, wa, ug, seg,
                                params, emission, emission, interpret,
                                with_wck=False)
            # no light volume: wsum == 1 - trans telescoping (the wck
            # checkpoint is derived in the backward kernel, not stored)
            tck = outs[4] if emission else None
            return tuple(outs[:4]), (L, outs[1], outs[2], tck, None,
                                     slice_z, wa, ug, seg, params)

        def f_bwd(res, ct):
            L, trans, wsum, tck, wck, slice_z, wa, ug, seg, params = res
            ct_acc, ct_trans, ct_wsum, _ct_hit = ct
            if emission:
                cw = ct_wsum
                bct = ct_trans * trans + cw * wsum
                dL, _ = _run_bwd_ref(L, None, None, slice_z, wa, ug, seg,
                                     params, True, cw, bct, tck, wck,
                                     None, interpret)
            else:
                dL, _ = _run_bwd_ref(L, None, None, slice_z, wa, ug, seg,
                                     params, False, None, None, None,
                                     None, ct_acc, interpret)
            # optimization_barrier: see _fused_vjp.f_bwd.
            dL = jax.lax.optimization_barrier(dL.astype(L.dtype))
            return (dL,) + plan_zeros(slice_z, wa, ug, seg, params)

        f.defvjp(f_fwd, f_bwd)
        return f

    @jax.custom_vjp
    def f2(L, lv, wal, slice_z, wa, ug, seg, params):
        return _run_fwd_ref(L, lv, wal, slice_z, wa, ug, seg, params,
                            emission, False, interpret)[:4]

    def f2_fwd(L, lv, wal, slice_z, wa, ug, seg, params):
        outs = _run_fwd_ref(L, lv, wal, slice_z, wa, ug, seg, params,
                            emission, emission, interpret)
        tck, wck = (outs[4], outs[5]) if emission else (None, None)
        return tuple(outs[:4]), (L, lv, wal, outs[1], outs[2], tck, wck,
                                 slice_z, wa, ug, seg, params)

    def f2_bwd(res, ct):
        (L, lv, wal, trans, wsum, tck, wck, slice_z, wa, ug, seg,
         params) = res
        ct_acc, ct_trans, ct_wsum, _ct_hit = ct
        if emission:
            cw = ct_wsum
            bct = ct_trans * trans + cw * wsum
            dL, dlv = _run_bwd_ref(L, lv, wal, slice_z, wa, ug, seg,
                                   params, True, cw, bct, tck, wck, None,
                                   interpret)
        else:
            dL, dlv = _run_bwd_ref(L, lv, wal, slice_z, wa, ug, seg,
                                   params, False, None, None, None, None,
                                   ct_acc, interpret)
        if dlv is None:
            dlv = jnp.zeros_like(lv)
        # optimization_barrier: see _fused_vjp.f_bwd.
        dL, dlv = jax.lax.optimization_barrier(
            (dL.astype(L.dtype), dlv.astype(lv.dtype)))
        return (dL, dlv,
                jnp.zeros_like(wal)) + plan_zeros(slice_z, wa, ug, seg,
                                                  params)

    f2.defvjp(f2_fwd, f2_bwd)
    return f2
