"""Pallas TPU DP-fill kernels for all four aligners.

TPU-native design (SURVEY.md section 7), replacing the reference's CUDA
warp-wavefront (one 32-thread warp per pair, staggered anti-diagonal sweep,
cuda/LNW/LinearNeedlemanWunschV19.cu:178-314):

* Layout: a tile of TILE_P pairs occupies the 128-wide VPU *lane* axis and
  the reference sequence occupies the sublane axis -- in-register arrays are
  (N, P).  One vector op therefore advances one DP row of 128 pairs at
  once, the dense-batch analogue of "one warp per pair".
* The grid is (batch_tiles, query_row_blocks): each grid step consumes one
  direction word's worth of query rows (16 for the 2-bit linear aligners,
  8 for 4-bit affine) and carries the DP row state across steps in VMEM
  scratch, the TPU analogue of the reference's 32-row stripe pipelining
  with cross-stripe shared-memory hand-off (V19.cu:210-212,290-292).
  Pallas double-buffers the HBM block transfers automatically.
* The within-row dependency H[i][j] = max(t[j], H[i][j-1] + gap) is removed
  with the prefix-scan identity G[j] = H[j] - j*gap = max(t[j]-j*gap,
  G[j-1]) -- a running maximum over the reference (sublane) axis computed
  in log2(N) Hillis-Steele steps of `pltpu.roll` + `jnp.maximum`.  This
  replaces the CUDA warp-shuffle chain (V19.cu:300) and is the vector form
  of the SIMD "striped/lazy-F" idiom (PAPERS.md).  ALL row state stays in
  G-space, so the +-j*gap adjustments vanish from the inner loop (the tie
  chains are shift-invariant); absolute scores are reconstructed only at
  local-max tracking and final extraction.  The affine E matrix admits the
  same scan because re-opening a gap out of an insertion state is dominated
  by extending it when gap_open <= 0 (proof: tpu_align/oracle/vectorized.py
  docstring).
* Direction codes (2 bits/cell linear, 4 bits affine --
  tpu_align/core/directions.py) are packed 16 (resp. 8) query rows per
  int32 word -- one (N, P) word-plane written per grid step -- shrinking
  traceback HBM traffic 16x versus the reference's byte-per-cell matrices
  (the V17 coalesced layout's goal, V17.cu:107-118, achieved by
  construction).  Linear aligners store no local stop flag: the walker
  re-scores backward and stops when the remaining score reaches 0.
* Scores-only mode omits the direction output entirely, like the V6 kernel
  that eliminated the scoring matrix (V6.cu:28-35).
* Tie-break semantics are exactly the reference's `__vibmax` `>=` chains
  (FakeDPX.cpp:145-153); see tpu_align/oracle/scalar.py for the
  per-algorithm evidence.

Padded cells (ref token 0, query token 1 -- never equal) are masked out of
score tracking by the true per-pair lengths.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_align.core import directions as D
from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.ops import dpx

TILE_P = 128  # pairs per grid step (the VPU lane width)
ROWS_PER_STEP = 8  # base query-row granularity (bucketing pads M to this)
NEG = -(2**30)  # -inf for int32 scores (python int; immune to overflow on add)


def bits_per_cell(algo: Algorithm) -> int:
    """Direction bits per DP cell: the affine aligner needs 2 main bits +
    E/F extend bits; the linear aligners need only the 2 main bits -- the
    local stop test is recovered by backward re-scoring in the walker
    (remaining score hits 0 exactly at the path start), so no stop flag is
    stored.  2-bit packing puts 16 query rows in each int32 word, halving
    traceback HBM traffic versus 4-bit."""
    return 4 if algo.is_affine else 2


def rows_per_word(algo: Algorithm) -> int:
    return 32 // bits_per_cell(algo)


# ---------------------------------------------------------------------------
# In-kernel vector helpers (arrays are (N, P): ref position x pair)
# ---------------------------------------------------------------------------


def _ref_iota(shape):
    """0-based reference-position index (sublane axis), broadcast over pairs."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dimension=0)


def _shift_down(x, amount, fill):
    """Shift the reference axis down by `amount` (position j receives
    position j-amount); the first `amount` positions receive `fill`."""
    rolled = pltpu.roll(x, amount, axis=0)
    return jnp.where(_ref_iota(x.shape) >= amount, rolled, fill)


def _prefix_max(v, neg):
    """Inclusive running maximum along the reference axis (Hillis-Steele)."""
    n = v.shape[0]
    shift = 1
    while shift < n:
        v = jnp.maximum(v, _shift_down(v, shift, neg))
        shift *= 2
    return v


def _row_scan(t, head, neg):
    """Solve G[j] = max(t[j], G[j-1]) for j = 1..N with G[0] = head -- the
    rank-reduced ("G-space") form of H[j] = max(t[j], H[j-1] + gap) under
    G[j] = H[j] - j*gap.  All row state lives in G-space so the +-j*gap
    adjustments vanish from the inner loop; H is reconstructed only where a
    cross-lane comparison of absolute scores is needed.  Sublane j-1 holds
    column j."""
    v = jnp.maximum(t, _shift_down(t, 1, head))  # head enters at j=1
    return _prefix_max(v, neg)


# ---------------------------------------------------------------------------
# Row updates (one DP row each)
# ---------------------------------------------------------------------------


def _linear_row_update(algo, p, sdt, neg, ref, qi, prev, border_prev,
                       border_cur, neg_jg, want_dirs=True, band_mask=None):
    """One DP row for LNW/LSW/BSW in G-space (G = H - j*gap; `prev` and the
    returned row are G rows; neg_jg is the precomputed -j*gap vector).
    Returns (row, dir4) with dir4 the packed 4-bit code per cell, or
    dir4=None in the scores-only fast path.  For BSW the caller passes
    `band_mask` (True at in-band columns): out-of-band candidates are
    forced to H = 0 (neg_jg in G-space) BEFORE the row scan so phantom
    out-of-band values can never leak into in-band cells through the
    insertion prefix max (band spec: out-of-band cells are never computed,
    python/LinearBandedSmithWaterman.py:71).  All direction comparisons are
    shift-invariant, so the `>=` tie chains
    (c++/LinearNeedlemanWunsch.cpp:122-126,
    cuda/LinearSmithWaterman.cu:116-137) transfer to G-space verbatim; the
    chains are expressed through the DPX layer (tpu_align/ops/dpx.py) so the
    scoring reads like the reference's `__vibmax` intrinsic idiom."""
    gap = sdt(p.gap)
    is_match = ref == qi
    # w - gap folded into the substitution constants
    wg = jnp.where(is_match, sdt(p.match - p.gap), sdt(p.mismatch - p.gap))
    mm = _shift_down(prev, 1, border_prev) + wg  # = (diag + w) - j*gap
    dele = prev + gap                            # = (up + gap) - j*gap
    if algo is Algorithm.LNW:
        # __vibmax chain (FakeDPX.cpp:145-153): dele >= mm -> DELETION
        t, take_del = dpx.vibmax_s32(dele, mm)
        row = _row_scan(t, border_cur, neg)
        if not want_dirs:
            return row, None
        ins = _shift_down(row, 1, border_cur)    # = (left + gap) - j*gap
        _, take_ins = dpx.vibmax_s32(ins, t)     # ins >= best -> INSERTION
        d = jnp.where(is_match, D.MAIN_DIAG_MATCH, D.MAIN_DIAG_MISMATCH)
        d = jnp.where(take_del, D.MAIN_QUERY_DELETION, d)
        d = jnp.where(take_ins, D.MAIN_QUERY_INSERTION, d)
        return row, d
    # local: LSW / BSW; the 0-clamp becomes a clamp at -j*gap in G-space
    t = dpx.vimax3_s32(mm, dele, neg_jg)
    if band_mask is not None:
        t = jnp.where(band_mask, t, neg_jg)
    row = _row_scan(t, sdt(0), neg)
    if not want_dirs:
        return row, None
    ins = _shift_down(row, 1, sdt(0))
    # __vibmax chain (cuda/LinearSmithWaterman.cu:126-137): ins vs diag,
    # then dele vs winner
    d = jnp.where(is_match, D.MAIN_DIAG_MATCH, D.MAIN_DIAG_MISMATCH)
    best, take_ins = dpx.vibmax_s32(ins, mm)
    d = jnp.where(take_ins, D.MAIN_QUERY_INSERTION, d)
    _, take_del = dpx.vibmax_s32(dele, best)
    d = jnp.where(take_del, D.MAIN_QUERY_DELETION, d)
    # no stored stop flag: a clamped-to-zero cell is detected by the walker
    # when its backward re-score reaches 0
    return row, d


def _affine_row_update(p, sdt, neg, ref, qi, h_prev, f_prev, border_prev,
                       border_cur, is_first_row, want_dirs=True,
                       open_top=None):
    """One Gotoh row (c++/AffineNeedlemanWunsch.cpp:167-242) in G-space
    (all of H/E/F carried as X - j*gap_extend; comparisons are
    shift-invariant, and the E scan collapses to a pure prefix max).

    open_top (optional (1, P) vector): gap-open cost for vertical gaps
    STARTING at the top boundary (row 1) -- the Myers-Miller boundary
    credit (0 = the gap continues a gap from the adjoining subproblem and
    its open was already paid).  Defaults to gap_open.

    Returns (h_row, f_row, dir4), all G rows.
    """
    go, ge = sdt(p.gap_open), sdt(p.gap_extend)
    tb = go if open_top is None else open_top
    is_match = ref == qi
    wge = jnp.where(
        is_match, sdt(p.match - p.gap_extend), sdt(p.mismatch - p.gap_extend)
    )
    mm = _shift_down(h_prev, 1, border_prev) + wge
    # F (query deletion): open vs extend; row 1 forces GAP_OPEN
    open_f = h_prev + (go + ge)
    ext_f = f_prev + ge
    # __vibmax tie: open >= extend -> GAP_OPEN (AffineNeedlemanWunsch.cpp)
    f_cand, f_open_wins = dpx.vibmax_s32(open_f, ext_f)
    f_row = jnp.where(is_first_row, h_prev + ge + tb, f_cand)
    f_ext_bit = jnp.where(
        jnp.logical_or(is_first_row, f_open_wins), 0, D.BIT_F_EXTEND
    )
    # E via lazy-F scan over C = max(mm, F):
    #   E_G[j] = max(C_G[j-1] + go, E_G[j-1])
    c = jnp.maximum(mm, f_row)
    a = _shift_down(c, 1, border_cur) + go
    e_row = _row_scan(a, neg, neg)  # no head candidate
    h_row = jnp.maximum(c, e_row)
    if not want_dirs:
        return h_row, f_row, None
    # E dirs use the true-H comparison (col 1 forced OPEN):
    open_e = _shift_down(h_row, 1, sdt(0)) + go
    ext_e = _shift_down(e_row, 1, neg)
    col1 = _ref_iota(h_row.shape) == 0
    _, e_open_wins = dpx.vibmax_s32(open_e, ext_e)
    e_ext_bit = jnp.where(
        jnp.logical_or(col1, e_open_wins), 0, D.BIT_E_EXTEND
    )
    # H dirs: best=mm; F >= best -> DEL; E >= best -> INS (vibmax chain)
    d = jnp.where(is_match, D.MAIN_DIAG_MATCH, D.MAIN_DIAG_MISMATCH)
    best, take_del = dpx.vibmax_s32(f_row, mm)
    d = jnp.where(take_del, D.MAIN_QUERY_DELETION, d)
    _, take_ins = dpx.vibmax_s32(e_row, best)
    d = jnp.where(take_ins, D.MAIN_QUERY_INSERTION, d)
    return h_row, f_row, d | f_ext_bit | e_ext_bit


# ---------------------------------------------------------------------------
# Kernel body
# ---------------------------------------------------------------------------


def _make_kernel(algo: Algorithm, p: AlignmentParams, n_cols: int, tile_p: int,
                 with_traceback: bool, score_dtype=jnp.int32, unroll=None,
                 emit_last_row: bool = False, has_open_top: bool = False):
    is_local = algo.is_local
    is_affine = algo.is_affine
    band = p.band
    sdt = score_dtype
    neg = NEG
    bits = bits_per_cell(algo)
    rps = rows_per_word(algo)  # rows per grid step = cells per dir word
    unroll = unroll or rps
    assert not (emit_last_row and is_local), "last-row mode is global-only"
    assert not (has_open_top and not is_affine), "open_top is affine-only"

    def kernel(ref_ref, qry_ref, rlen_ref, qlen_ref, *rest):
        rest = list(rest)
        topen_ref = rest.pop(0) if has_open_top else None
        meta_ref = rest.pop(0)
        dirs_ref = rest.pop(0) if with_traceback else None
        hlast_ref = rest.pop(0) if emit_last_row else None
        flast_ref = rest.pop(0) if (emit_last_row and is_affine) else None
        scratch = rest
        if is_affine:
            if emit_last_row:
                prev_s, f_s, final_s, ffin_s, best_s, brow_s, bcol_s = scratch
            else:
                prev_s, f_s, final_s, best_s, brow_s, bcol_s = scratch
                ffin_s = None
        else:
            prev_s, final_s, best_s, brow_s, bcol_s = scratch
            f_s = ffin_s = None
        mw = pl.program_id(1)
        num_mw = pl.num_programs(1)
        shape = (n_cols, tile_p)
        jj0 = _ref_iota(shape)  # 0-based ref position; DP column j = jj0+1
        # all row state is G-space: G = H - j*gap (j*gap_extend for affine)
        g_unit = p.gap_extend if is_affine else p.gap
        jg = ((jj0 + 1) * jnp.int32(g_unit)).astype(sdt)
        neg_jg = -jg
        rlen = rlen_ref[0:1, :]  # (1, P)
        qlen = qlen_ref[0:1, :]
        ref = ref_ref[:, :].astype(jnp.int32)
        lane_ok = jj0 < rlen  # positions holding real reference chars

        @pl.when(mw == 0)
        def _init():
            if is_local:
                prev_s[:, :] = neg_jg  # H[0][j] = 0
            elif is_affine:
                # H[0][j] = go + j*ge (c++/AffineNeedlemanWunsch.cpp:43-53)
                prev_s[:, :] = jnp.full(shape, p.gap_open, sdt)
                f_s[:, :] = jnp.full(shape, neg, sdt)
            else:
                prev_s[:, :] = jnp.zeros(shape, sdt)  # H[0][j] = j*gap
            if ffin_s is not None:
                ffin_s[:, :] = jnp.full(shape, neg, sdt)
            final_s[:, :] = jnp.zeros(shape, sdt)
            best_s[:, :] = jnp.zeros((1, tile_p), jnp.int32)
            brow_s[:, :] = jnp.zeros((1, tile_p), jnp.int32)
            bcol_s[:, :] = jnp.zeros((1, tile_p), jnp.int32)

        prev = prev_s[:, :]
        f_prev = f_s[:, :] if is_affine else None
        ffin = ffin_s[:, :] if ffin_s is not None else None
        final_row = final_s[:, :]
        best, brow, bcol = best_s[:, :], brow_s[:, :], bcol_s[:, :]
        acc = jnp.zeros(shape, jnp.int32)

        topen = (topen_ref[0:1, :].astype(sdt)
                 if topen_ref is not None else None)

        def borders(i):
            """(H[i-1][0], H[i][0]) for 1-based (traced) row i."""
            if is_local:
                return sdt(0), sdt(0)
            if is_affine:
                go, ge = jnp.int32(p.gap_open), jnp.int32(p.gap_extend)
                # H[0][0] = 0; H[i][0] = tb + i*ge for i >= 1 (the border
                # column is a vertical gap starting at the top boundary,
                # so it opens at the Myers-Miller credit when one is set)
                tb = go if topen is None else topen
                return (jnp.where(i == 1, 0, tb + (i - 1) * ge).astype(sdt),
                        (tb + i * ge).astype(sdt))
            g = jnp.int32(p.gap)
            return ((i - 1) * g).astype(sdt), (i * g).astype(sdt)

        def row_step(r, carry):
            if is_affine and emit_last_row:
                prev, f_prev, final_row, ffin, best, brow, bcol, acc = carry
            elif is_affine:
                prev, f_prev, final_row, best, brow, bcol, acc = carry
                ffin = None
            else:
                prev, final_row, best, brow, bcol, acc = carry
                f_prev = ffin = None
            i = mw * rps + r + 1  # 1-based DP row (traced scalar)
            qi = qry_ref[pl.ds(r, 1), :].astype(jnp.int32)  # (1, P)
            b_prev, b_cur = borders(i)
            if algo.is_banded:
                # python/LinearBandedSmithWaterman.py:71 band clamp; the
                # mask is applied BEFORE the row scan (inside the update)
                # so out-of-band phantoms cannot leak through the insertion
                # prefix max
                jj = jj0 + 1
                in_band = jnp.logical_and(jj >= i - band + 1, jj <= i + band - 1)
            else:
                in_band = None
            if is_affine:
                row, f_prev, d4 = _affine_row_update(
                    p, sdt, neg, ref, qi, prev, f_prev, b_prev, b_cur,
                    i == 1, want_dirs=with_traceback, open_top=topen,
                )
            else:
                row, d4 = _linear_row_update(
                    algo, p, sdt, neg, ref, qi, prev, b_prev, b_cur, neg_jg,
                    want_dirs=with_traceback, band_mask=in_band,
                )
            if algo.is_banded:
                row = jnp.where(in_band, row, neg_jg)  # H = 0 in G-space
                # out-of-band cells need no marker: the walker's band
                # bounds-check and re-score stop cover them
            row_valid = i <= qlen  # (1, P): row within true query length

            if is_local:
                # first-occurrence row-major argmax
                # (cuda/LinearSmithWaterman.cu:300-311: strict '>' keeps the
                # earliest row; min-position keeps the earliest column)
                # (Mosaic cannot reduce int16 -- reduce in int32)
                masked = jnp.where(
                    jnp.logical_and(lane_ok, row_valid), row + jg, neg
                ).astype(jnp.int32)
                row_best = jnp.max(masked, axis=0, keepdims=True)
                row_col = jnp.min(
                    jnp.where(masked == row_best, jj0, jnp.int32(n_cols)),
                    axis=0, keepdims=True,
                )
                upd = row_best > best
                best = jnp.where(upd, row_best, best)
                brow = jnp.where(upd, i, brow)
                bcol = jnp.where(upd, row_col + 1, bcol)
            else:
                final_row = jnp.where(row_valid, row, final_row)
                if ffin is not None:
                    ffin = jnp.where(row_valid, f_prev, ffin)

            if with_traceback:
                acc = acc | (d4 << (bits * r))
            if is_affine and emit_last_row:
                return row, f_prev, final_row, ffin, best, brow, bcol, acc
            if is_affine:
                return row, f_prev, final_row, best, brow, bcol, acc
            return row, final_row, best, brow, bcol, acc

        def block_step(q, carry):
            # unrolled row block inside a fori_loop: full unroll on the
            # compiled path lets Mosaic software-pipeline across rows
            # (a 1-row loop costs ~30% runtime, 4-row ~16%); interpret mode
            # uses small blocks because trace time scales with body size
            for sub in range(unroll):
                carry = row_step(q * unroll + sub, carry)
            return carry

        if is_affine and emit_last_row:
            carry = (prev, f_prev, final_row, ffin, best, brow, bcol, acc)
        elif is_affine:
            carry = (prev, f_prev, final_row, best, brow, bcol, acc)
        else:
            carry = (prev, final_row, best, brow, bcol, acc)
        assert rps % unroll == 0, (rps, unroll)
        carry = jax.lax.fori_loop(0, rps // unroll, block_step, carry)
        if is_affine and emit_last_row:
            prev, f_prev, final_row, ffin, best, brow, bcol, acc = carry
        elif is_affine:
            prev, f_prev, final_row, best, brow, bcol, acc = carry
        else:
            prev, final_row, best, brow, bcol, acc = carry

        if with_traceback:
            # transpose in VMEM so each pair's word-row is contiguous in HBM
            # (avoids a separate full-array XLA transpose that would
            # re-stream the whole direction tensor through HBM)
            dirs_ref[0, :, :] = acc.T

        prev_s[:, :] = prev
        if is_affine:
            f_s[:, :] = f_prev
        if ffin_s is not None:
            ffin_s[:, :] = ffin
        final_s[:, :] = final_row
        best_s[:, :] = best
        brow_s[:, :] = brow
        bcol_s[:, :] = bcol

        @pl.when(mw == num_mw - 1)
        def _emit():
            if emit_last_row:
                # H[qlen][j] at sublane j-1 (rank restored from G-space);
                # the j = 0 border is analytic on the host
                hlast_ref[:, :] = (final_row + jg).astype(jnp.int32)
                if is_affine:
                    flast_ref[:, :] = (ffin + jg).astype(jnp.int32)
            if is_local:
                score, srow, scol = best, brow, bcol
            else:
                # global score = H[qlen][rlen]: position rlen-1 of the final
                # G row, plus the rank restoration rlen * gap
                score = jnp.max(
                    jnp.where(jj0 == rlen - 1, final_row, neg)
                    .astype(jnp.int32),
                    axis=0, keepdims=True,
                ) + rlen * jnp.int32(g_unit)
                srow, scol = qlen, rlen
            out_rows = _ref_iota((8, tile_p))
            meta = jnp.where(out_rows == 0, score, 0)
            meta = jnp.where(out_rows == 1, srow, meta)
            meta = jnp.where(out_rows == 2, scol, meta)
            meta_ref[:, :] = meta

    return kernel


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class BucketFill:
    """Fill output for one bucket.

    scores:    (B,) int32 -- global score (LNW/ANW) or local max (LSW/BSW)
    start_row: (B,) int32 -- traceback start row (qlen/rlen for global)
    start_col: (B,) int32
    dirs:      (ceil(M/8), B, N) int32 packed 4-bit direction words, or
               None.  Word-major layout: pair b's word for DP rows
               8k+1..8k+8 and column j is dirs[k, b, j-1]; each pair's
               word-row is a contiguous N-vector.
    """

    scores: np.ndarray
    start_row: np.ndarray
    start_col: np.ndarray
    dirs: np.ndarray | None
    band: int | None = None  # set by the banded kernel: dirs are in the
    #                          skewed (MW, B, 2*band-frame) layout
    stagger: int | None = None  # set by the stagger kernel: dirs are in the
    #                             (stripes, W, S, B) step-packed layout


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_batch(b):
    """Round the pair count up to a whole number of 128-lane tiles.

    A (N, P) array with P < 128 still occupies 128 physical lanes per vreg,
    so small-P tiles waste VMEM proportionally (OOM at large N); full tiles
    also keep every kernel shape uniform."""
    return -(-b // TILE_P) * TILE_P


@functools.partial(jax.jit, static_argnames=("algorithm", "params",
                                             "with_traceback", "interpret",
                                             "emit_last_row"))
def _fill_jit(algorithm, params, ref_tokens, qry_tokens, ref_len, qry_len,
              with_traceback=True, interpret=False, emit_last_row=False,
              open_top=None):
    b, n = ref_tokens.shape
    m = qry_tokens.shape[1]
    assert n % 128 == 0 and m % ROWS_PER_STEP == 0, (b, m, n)
    # interpreter mode executes on real arrays, so lane padding would only
    # multiply work; Mosaic needs full 128-lane tiles (VMEM layout)
    bp = b if interpret else _pad_batch(b)
    if bp != b:
        ref_tokens = jnp.pad(ref_tokens, ((0, bp - b), (0, 0)))
        qry_tokens = jnp.pad(qry_tokens, ((0, bp - b), (0, 0)),
                             constant_values=1)
        ref_len = jnp.pad(ref_len.reshape(-1), (0, bp - b))
        qry_len = jnp.pad(qry_len.reshape(-1), (0, bp - b))
        if open_top is not None:
            # pad with gap_open (not 0 = "already-open credit") so padded
            # lanes stay bit-identical to the stagger last-rows kernel
            # (stagger.py pads the same input with params.gap_open)
            open_top = jnp.pad(open_top.reshape(-1), (0, bp - b),
                               constant_values=params.gap_open)
        b = bp
    tile_p = TILE_P if not interpret else (TILE_P if b % TILE_P == 0 else b)
    rps = rows_per_word(algorithm)
    if m % rps:  # pad query rows to a whole number of direction words
        pad_m = rps - m % rps
        qry_tokens = jnp.pad(qry_tokens, ((0, 0), (0, pad_m)),
                             constant_values=1)
        m = m + pad_m
    mw = m // rps
    grid = (b // tile_p, mw)
    # Scores are int32 always.  The reference's V18/V19 s16x2 trick
    # (cuda/LNW/LinearNeedlemanWunschV18.cu:17-24) has no profitable TPU
    # counterpart: Mosaic cannot lower sub-32-bit rotates ("Rotate with
    # non-32-bit data") and the v5e VPU has 32-bit lanes, so int16 state
    # would not raise throughput; a vreg already holds 1024 SIMD lanes.
    # MEASURED (scripts/exp_s16x2.py, real v5e): a SWAR 2-pairs-per-int32
    # variant of the stagger core runs at 0.77x the int32 core -- the 2x
    # density loses to the ~2.6x packed add/max op multiplier.
    sdt = jnp.int32
    kernel = _make_kernel(algorithm, params, n, tile_p, with_traceback,
                          score_dtype=sdt, unroll=4 if interpret else None,
                          emit_last_row=emit_last_row,
                          has_open_top=open_top is not None)
    # device layout: pairs on lanes -> transpose host-major (B, *) arrays
    ref_t = ref_tokens.astype(jnp.int32).T  # (N, B)
    qry_t = qry_tokens.astype(jnp.int32).T  # (M, B)
    rlen_t = ref_len.reshape(1, b).astype(jnp.int32)
    qlen_t = qry_len.reshape(1, b).astype(jnp.int32)
    out_shape = [jax.ShapeDtypeStruct((8, b), jnp.int32)]
    out_specs = [
        pl.BlockSpec((8, tile_p), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    ]
    if with_traceback:
        out_shape.append(jax.ShapeDtypeStruct((mw, b, n), jnp.int32))
        out_specs.append(
            pl.BlockSpec((1, tile_p, n), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM)
        )
    n_lastrows = (2 if algorithm.is_affine else 1) if emit_last_row else 0
    for _ in range(n_lastrows):
        out_shape.append(jax.ShapeDtypeStruct((n, b), jnp.int32))
        out_specs.append(
            pl.BlockSpec((n, tile_p), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM)
        )
    in_specs = [
        pl.BlockSpec((n, tile_p), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((rps, tile_p), lambda i, j: (j, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_p), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_p), lambda i, j: (0, i), memory_space=pltpu.VMEM),
    ]
    inputs = [ref_t, qry_t, rlen_t, qlen_t]
    if open_top is not None:
        inputs.append(open_top.reshape(1, b).astype(jnp.int32))
        in_specs.append(
            pl.BlockSpec((1, tile_p), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM)
        )
    scratch_shapes = [pltpu.VMEM((n, tile_p), sdt)]  # prev H row
    if algorithm.is_affine:
        scratch_shapes.append(pltpu.VMEM((n, tile_p), sdt))  # prev F row
    scratch_shapes.append(pltpu.VMEM((n, tile_p), sdt))  # captured final row
    if emit_last_row and algorithm.is_affine:
        scratch_shapes.append(pltpu.VMEM((n, tile_p), sdt))  # captured F row
    scratch_shapes += [
        pltpu.VMEM((1, tile_p), jnp.int32),  # local best
        pltpu.VMEM((1, tile_p), jnp.int32),  # local best row
        pltpu.VMEM((1, tile_p), jnp.int32),  # local best col
    ]
    flops_per_cell = 24 if algorithm.is_affine else 16
    cost = pl.CostEstimate(
        flops=flops_per_cell * b * m * n,
        bytes_accessed=b * (m + n) * 4 + (b * mw * n * 4 if with_traceback else 0),
        transcendentals=0,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        # long references blow past the 16MB default scoped-VMEM budget
        # (the unrolled 8-row loop keeps many (N, 128) temporaries live);
        # v5e has 128MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=cost,
    )(*inputs)
    meta = outs[0]
    # dirs stay batch-padded ((MW, B_padded, N)); consumers index real rows
    dirs = outs[1] if with_traceback else None
    if emit_last_row:
        # the unpack below assumes outs[1] is hlast; the traceback+last-row
        # combination would mis-assign it (stagger.py guards the same way)
        assert not with_traceback, "emit_last_row requires scores-only"
        hlast = outs[1]  # (N, B_padded): H[qlen][j] at sublane j-1
        flast = outs[2] if algorithm.is_affine else None
        return meta[0, :], meta[1, :], meta[2, :], hlast, flast
    return meta[0, :], meta[1, :], meta[2, :], dirs


def host_pack_tokens(ref_tokens, qry_tokens, ref_len, qry_len):
    """2-bit-pack host-side token arrays for upload (io/packing): the
    tunnel-bandwidth-bound H2D transfer shrinks 4x for <=4-symbol
    alphabets.  Returns (ref_packed, ref_lut, qry_packed, qry_lut) or
    None (non-numpy inputs -- already staged on device -- or wide
    alphabets; TPU_ALIGN_PACK_H2D=off disables)."""
    import os

    if os.environ.get("TPU_ALIGN_PACK_H2D", "on").lower() in ("off", "0"):
        return None
    if not (isinstance(ref_tokens, np.ndarray)
            and isinstance(qry_tokens, np.ndarray)):
        return None
    from tpu_align.io.packing import maybe_pack_tokens

    rp = maybe_pack_tokens(ref_tokens, np.asarray(ref_len))
    if rp is None:
        return None
    qp = maybe_pack_tokens(qry_tokens, np.asarray(qry_len))
    if qp is None:
        return None
    return rp[0], rp[1], qp[0], qp[1]


def unpack_both(ref_packed, ref_lut, qry_packed, qry_lut, ref_len, qry_len):
    """Device-side inverse of host_pack_tokens (inside jit)."""
    from tpu_align.io.bucketing import PAD_QRY, PAD_REF
    from tpu_align.io.packing import unpack_tokens

    rt = unpack_tokens(ref_packed, ref_lut, ref_len, PAD_REF,
                       ref_packed.shape[1] * 4)
    qt = unpack_tokens(qry_packed, qry_lut, qry_len, PAD_QRY,
                       qry_packed.shape[1] * 4)
    return rt, qt


@functools.partial(jax.jit, static_argnames=(
    "algorithm", "params", "with_traceback", "interpret"))
def _fill_packed_jit(algorithm, params, ref_packed, ref_lut, qry_packed,
                     qry_lut, ref_len, qry_len, with_traceback=True,
                     interpret=False):
    rt, qt = unpack_both(ref_packed, ref_lut, qry_packed, qry_lut,
                         ref_len, qry_len)
    return _fill_jit(algorithm, params, rt, qt, ref_len, qry_len,
                     with_traceback=with_traceback, interpret=interpret)


def fill_bucket_async(
    algorithm: Algorithm,
    params: AlignmentParams,
    ref_tokens,
    qry_tokens,
    ref_len,
    qry_len,
    with_traceback: bool = True,
    interpret: bool | None = None,
):
    """Dispatch one bucket's fill; returns (scores, srow, scol, dirs) as
    asynchronously-computing JAX arrays (dirs None in scores-only mode).

    JAX's async dispatch gives the V19 host/device overlap for free
    (cuda/LNW/LinearNeedlemanWunschV19.cu:536-585): the host can launch
    batch N+1 and traceback batch N-1 while batch N's kernel runs.
    Host-resident <=4-symbol token arrays upload 2-bit packed.
    """
    if algorithm.is_affine and params.gap_open > 0:
        raise ValueError("ANW kernel requires gap_open <= 0")
    if interpret is None:
        interpret = _default_interpret()
    packed = host_pack_tokens(ref_tokens, qry_tokens, ref_len, qry_len)
    if packed is not None:
        return _fill_packed_jit(
            algorithm, params, *(jnp.asarray(p) for p in packed),
            jnp.asarray(ref_len), jnp.asarray(qry_len),
            with_traceback=with_traceback, interpret=interpret,
        )
    return _fill_jit(
        algorithm, params,
        jnp.asarray(ref_tokens), jnp.asarray(qry_tokens),
        jnp.asarray(ref_len), jnp.asarray(qry_len),
        with_traceback=with_traceback, interpret=interpret,
    )


def fill_last_rows_async(
    algorithm: Algorithm,
    params: AlignmentParams,
    ref_tokens,
    qry_tokens,
    ref_len,
    qry_len,
    interpret: bool | None = None,
    open_top=None,
):
    """Scores-only fill that also emits the DP matrix's LAST ROW per pair:
    H[qlen][j] for j = 1..N at sublane j-1 of an (N, B) output (plus the
    Gotoh F[qlen][j] row for affine -- the Myers-Miller split needs both).
    This is the primitive the Hirschberg divide-and-conquer traceback
    (tpu_align/traceback/hirschberg.py) is built on: no direction tensor
    exists in any memory.  Global aligners only (LNW/ANW).

    Returns (scores, hlast, flast_or_None) as async JAX arrays; the j = 0
    border column is analytic (qlen*gap, resp. open_top + qlen*gap_extend).

    open_top (affine only, optional (B,) int32): per-pair gap-open cost
    for vertical gaps starting at the TOP boundary -- the Myers-Miller
    boundary credit (0 = the adjoining subproblem already opened the
    bridged gap).  Defaults to gap_open.
    """
    if algorithm.is_local:
        raise ValueError("last-row fill is global-only (LNW/ANW)")
    if algorithm.is_affine and params.gap_open > 0:
        raise ValueError("ANW kernel requires gap_open <= 0")
    if open_top is not None and not algorithm.is_affine:
        raise ValueError("open_top is affine-only")
    if interpret is None:
        interpret = _default_interpret()
    scores, _, _, hlast, flast = _fill_jit(
        algorithm, params,
        jnp.asarray(ref_tokens), jnp.asarray(qry_tokens),
        jnp.asarray(ref_len), jnp.asarray(qry_len),
        with_traceback=False, interpret=interpret, emit_last_row=True,
        open_top=None if open_top is None else jnp.asarray(open_top),
    )
    return scores, hlast, flast


def fill_bucket(
    algorithm: Algorithm,
    params: AlignmentParams,
    ref_tokens,
    qry_tokens,
    ref_len,
    qry_len,
    with_traceback: bool = True,
    interpret: bool | None = None,
) -> BucketFill:
    """Fill one bucket's DP matrices on the TPU (synchronous).

    Inputs may be numpy or jax arrays; shapes (B, N)/(B, M)/(B,)/(B,) with
    B % 8 == 0, N % 128 == 0, M % 8 == 0 (the bucketing layer guarantees
    this).  Runs in Pallas interpreter mode automatically off-TPU.
    """
    scores, srow, scol, dirs = fill_bucket_async(
        algorithm, params, ref_tokens, qry_tokens, ref_len, qry_len,
        with_traceback=with_traceback, interpret=interpret,
    )
    return BucketFill(
        np.asarray(scores), np.asarray(srow), np.asarray(scol),
        np.asarray(dirs) if dirs is not None else None,
    )
