"""Banded Smith-Waterman fast-path kernel: skewed diagonal frame.

The generic fill kernel (fill.py) computes BSW by masking a full-width
(N, P) frame -- N/(2*band) of the work is wasted.  This kernel stores only
the diagonal band in a skewed frame of K = 2*band sublane slots, the TPU
analogue of the reference's banded kernel which clamps each row's column
range around the diagonal (cuda/BandedSmithWaterman.cu:95-99) and of the
classic bandedSWA layout:

  slot k of DP row i  <->  column j = i - band + k

Under this skew the recurrences lose their shifts or keep unit shifts:
  diag  H[i-1][j-1] = prev slot k       (no shift!)
  up    H[i-1][j]   = prev slot k+1     (shift up 1)
  left  H[i][j-1]   = own slot k-1      (the usual scan, now over K slots)
and the substitution weights need ref[j-1] = ref[i - band + k - 1] -- a
K-wide window of the reference at offset i, read with one dynamic sublane
slice per grid step from a zero-prefixed staging array R2[t] = ref[t-band-1].

Work per row: O(K) lanes instead of O(N); the scan is log2(K) steps instead
of log2(N).  In-band validity: k in [1, 2*band-1] (static) and
1 <= j <= rlen (dynamic); out-of-band cells are exactly 0, matching the
band spec (python/LinearBandedSmithWaterman.py:71 -- the correct behavioral
spec; the C++ BSW is a known-buggy prototype, SURVEY.md section 7).

Direction words: same 4-bit packing as fill.py, laid out (MW, B, K) --
the traceback walker maps (i, j) -> slot k = j - i + band.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_align.core import directions as D
from tpu_align.core.params import AlignmentParams
from tpu_align.kernels.fill import (
    NEG,
    TILE_P,
    BucketFill,
    _default_interpret,
    _pad_batch,
    _prefix_max,
    _ref_iota,
    _shift_down,
    host_pack_tokens,
    unpack_both,
)

ROWS_PER_STEP = 16  # 2-bit codes: 16 query rows per direction word


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def frame_width(band: int) -> int:
    """Padded skewed-frame width K (multiple of 8)."""
    return max(_round8(2 * band), 8)


def _shift_down_k(x, fill):
    return _shift_down(x, 1, fill)  # one definition of the scan shift


def _shift_up_k(x, fill):
    k = x.shape[0]
    rolled = pltpu.roll(x, k - 1, axis=0)  # circular up-by-1 (no negative shifts)
    return jnp.where(_ref_iota(x.shape) <= k - 2, rolled, fill)


def _prefix_max_k(v):
    return _prefix_max(v, NEG)  # fill.py's Hillis-Steele, K-width frame


def _make_banded_kernel(p: AlignmentParams, k8: int, tile_p: int,
                        with_traceback: bool, unroll=None):
    band = p.band
    unroll = unroll or ROWS_PER_STEP

    def kernel(r2_ref, qry_ref, rlen_ref, qlen_ref, meta_ref, *rest):
        if with_traceback:
            dirs_ref, *scratch = rest
        else:
            dirs_ref, scratch = None, list(rest)
        prev_s, best_s, brow_s, bcol_s = scratch
        mw = pl.program_id(1)
        num_mw = pl.num_programs(1)
        shape = (k8, tile_p)
        kk = _ref_iota(shape)  # slot index
        # row state is G-space over the slot index: G = H - k*gap
        kg = kk * jnp.int32(p.gap)
        neg_kg = -kg
        rlen = rlen_ref[0:1, :]
        qlen = qlen_ref[0:1, :]
        gap = jnp.int32(p.gap)
        gap2 = jnp.int32(2 * p.gap)
        static_band = jnp.logical_and(kk >= 1, kk <= 2 * band - 1)

        @pl.when(mw == 0)
        def _init():
            prev_s[:, :] = neg_kg  # H = 0 everywhere in row 0
            best_s[:, :] = jnp.zeros((1, tile_p), jnp.int32)
            brow_s[:, :] = jnp.zeros((1, tile_p), jnp.int32)
            bcol_s[:, :] = jnp.zeros((1, tile_p), jnp.int32)

        prev = prev_s[:, :]
        best, brow, bcol = best_s[:, :], brow_s[:, :], bcol_s[:, :]
        acc = jnp.zeros(shape, jnp.int32)

        def row_step(r, carry):
            prev, best, brow, bcol, acc = carry
            i = mw * ROWS_PER_STEP + r + 1  # 1-based DP row (traced)
            # row i's ref window: R2[i + k] = ref[i - band + k - 1] = ref[j-1]
            refwin = r2_ref[pl.ds(i, k8), :].astype(jnp.int32)
            qi = qry_ref[pl.ds(r, 1), :].astype(jnp.int32)
            jv = (i - band) + kk  # DP column of each slot
            valid = jnp.logical_and(
                static_band,
                jnp.logical_and(jv >= 1,
                                jnp.logical_and(jv <= rlen, i <= qlen)),
            )
            is_match = refwin == qi
            w = jnp.where(is_match, jnp.int32(p.match), jnp.int32(p.mismatch))
            mm = prev + w  # diag: no shift AND no rank change in the skew
            # up is slot k+1 of the previous row: G[k+1] = H - (k+1)g, so
            # the rank shift contributes one extra gap: dele_G = G[k+1] + 2g
            dele = _shift_up_k(prev, NEG) + gap2
            t = jnp.maximum(jnp.maximum(mm, dele), neg_kg)
            t = jnp.where(valid, t, neg_kg)
            # left-dependency scan over the K slots (pure prefix max in G)
            v = jnp.maximum(t, _shift_down_k(t, NEG))
            row = _prefix_max_k(v)
            row = jnp.where(valid, row, neg_kg)  # out-of-band: H = 0

            # first-occurrence row-major argmax (strict '>' keeps the
            # earliest row; min-j keeps the earliest column)
            masked = jnp.where(valid, row + kg, NEG)
            row_best = jnp.max(masked, axis=0, keepdims=True)
            row_col = jnp.min(
                jnp.where(masked == row_best, jv, jnp.int32(2**30)),
                axis=0, keepdims=True,
            )
            upd = row_best > best
            best = jnp.where(upd, row_best, best)
            brow = jnp.where(upd, i, brow)
            bcol = jnp.where(upd, row_col, bcol)

            if with_traceback:
                ins = _shift_down_k(row, NEG)  # = (left + gap) - k*gap
                d = jnp.where(is_match, D.MAIN_DIAG_MATCH, D.MAIN_DIAG_MISMATCH)
                b2 = mm
                d = jnp.where(ins >= b2, D.MAIN_QUERY_INSERTION, d)
                b2 = jnp.maximum(b2, ins)
                d = jnp.where(dele >= b2, D.MAIN_QUERY_DELETION, d)
                # clamped / out-of-band cells need no stop marker: the
                # walker's band bounds-check and re-score stop cover them
                acc = acc | (d << (2 * r))
            return row, best, brow, bcol, acc

        def block_step(q, carry):
            # full unroll on the compiled path (Mosaic cross-row
            # pipelining); small blocks in interpret (trace time)
            for sub in range(unroll):
                carry = row_step(q * unroll + sub, carry)
            return carry

        prev, best, brow, bcol, acc = jax.lax.fori_loop(
            0, ROWS_PER_STEP // unroll, block_step,
            (prev, best, brow, bcol, acc)
        )

        if with_traceback:
            dirs_ref[0, :, :] = acc.T

        prev_s[:, :] = prev
        best_s[:, :] = best
        brow_s[:, :] = brow
        bcol_s[:, :] = bcol

        @pl.when(mw == num_mw - 1)
        def _emit():
            out_rows = _ref_iota((8, tile_p))
            meta = jnp.where(out_rows == 0, best, 0)
            meta = jnp.where(out_rows == 1, brow, meta)
            meta = jnp.where(out_rows == 2, bcol, meta)
            meta_ref[:, :] = meta

    return kernel


@functools.partial(
    jax.jit, static_argnames=("params", "with_traceback", "interpret")
)
def _fill_banded_jit(params, ref_tokens, qry_tokens, ref_len, qry_len,
                     with_traceback=True, interpret=False):
    b, n = ref_tokens.shape
    m = qry_tokens.shape[1]
    assert m % 8 == 0, (b, m, n)  # bucketing granularity; padded to 16 below
    bp = b if interpret else _pad_batch(b)
    if bp != b:
        ref_tokens = jnp.pad(ref_tokens, ((0, bp - b), (0, 0)))
        qry_tokens = jnp.pad(qry_tokens, ((0, bp - b), (0, 0)),
                             constant_values=1)
        ref_len = jnp.pad(ref_len.reshape(-1), (0, bp - b))
        qry_len = jnp.pad(qry_len.reshape(-1), (0, bp - b))
        b = bp
    if m % ROWS_PER_STEP:  # pad query rows to whole direction words
        pad_m = ROWS_PER_STEP - m % ROWS_PER_STEP
        qry_tokens = jnp.pad(qry_tokens, ((0, 0), (0, pad_m)),
                             constant_values=1)
        m = m + pad_m
    tile_p = TILE_P if not interpret else (TILE_P if b % TILE_P == 0 else b)
    k8 = frame_width(params.band)
    mw = m // ROWS_PER_STEP
    grid = (b // tile_p, mw)
    # staging array R2[t] = ref[t - band - 1] (zeros before), so row i's
    # window is R2[i .. i+K): R2[i+k] = ref[i - band + k - 1] = ref[j-1]
    r2_len = _round8(m + 2 * k8 + ROWS_PER_STEP)
    ref_t = ref_tokens.astype(jnp.int32).T  # (N, B)
    pad_top = params.band + 1
    r2 = jnp.zeros((r2_len, b), jnp.int32)
    take = min(n, r2_len - pad_top)
    r2 = r2.at[pad_top : pad_top + take, :].set(ref_t[:take, :])
    qry_t = qry_tokens.astype(jnp.int32).T
    rlen_t = ref_len.reshape(1, b).astype(jnp.int32)
    qlen_t = qry_len.reshape(1, b).astype(jnp.int32)
    kernel = _make_banded_kernel(params, k8, tile_p, with_traceback,
                                 unroll=4 if interpret else None)
    out_shape = [jax.ShapeDtypeStruct((8, b), jnp.int32)]
    out_specs = [
        pl.BlockSpec((8, tile_p), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    ]
    if with_traceback:
        out_shape.append(jax.ShapeDtypeStruct((mw, b, k8), jnp.int32))
        out_specs.append(
            pl.BlockSpec((1, tile_p, k8), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM)
        )
    in_specs = [
        pl.BlockSpec((r2_len, tile_p), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ROWS_PER_STEP, tile_p), lambda i, j: (j, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_p), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_p), lambda i, j: (0, i), memory_space=pltpu.VMEM),
    ]
    scratch_shapes = [
        pltpu.VMEM((k8, tile_p), jnp.int32),  # prev skewed row
        pltpu.VMEM((1, tile_p), jnp.int32),
        pltpu.VMEM((1, tile_p), jnp.int32),
        pltpu.VMEM((1, tile_p), jnp.int32),
    ]
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
        cost_estimate=pl.CostEstimate(
            flops=16 * b * m * k8, bytes_accessed=b * (m + n) * 4,
            transcendentals=0,
        ),
    )(r2, qry_t, rlen_t, qlen_t)
    meta = outs[0]
    dirs = outs[1] if with_traceback else None  # (MW, B, K8)
    return meta[0, :], meta[1, :], meta[2, :], dirs


@functools.partial(jax.jit, static_argnames=(
    "params", "with_traceback", "interpret"))
def _fill_banded_packed_jit(params, ref_packed, ref_lut, qry_packed,
                            qry_lut, ref_len, qry_len, with_traceback=True,
                            interpret=False):
    rt, qt = unpack_both(ref_packed, ref_lut, qry_packed, qry_lut,
                         ref_len, qry_len)
    return _fill_banded_jit(params, rt, qt, ref_len, qry_len,
                            with_traceback=with_traceback,
                            interpret=interpret)


def fill_banded_bucket_async(
    params: AlignmentParams,
    ref_tokens, qry_tokens, ref_len, qry_len,
    with_traceback: bool = True,
    interpret: bool | None = None,
):
    """Banded-SW fill on the skewed frame; returns async JAX arrays
    (scores, start_row, start_col, dirs-(MW,B,K8)-or-None)."""
    if interpret is None:
        interpret = _default_interpret()
    packed = host_pack_tokens(ref_tokens, qry_tokens, ref_len, qry_len)
    if packed is not None:  # 2-bit packed upload (io/packing)
        return _fill_banded_packed_jit(
            params, *(jnp.asarray(p) for p in packed),
            jnp.asarray(ref_len), jnp.asarray(qry_len),
            with_traceback=with_traceback, interpret=interpret,
        )
    return _fill_banded_jit(
        params, jnp.asarray(ref_tokens), jnp.asarray(qry_tokens),
        jnp.asarray(ref_len), jnp.asarray(qry_len),
        with_traceback=with_traceback, interpret=interpret,
    )


def fill_banded_bucket(params, ref_tokens, qry_tokens, ref_len, qry_len,
                       with_traceback: bool = True,
                       interpret: bool | None = None) -> BucketFill:
    scores, srow, scol, dirs = fill_banded_bucket_async(
        params, ref_tokens, qry_tokens, ref_len, qry_len,
        with_traceback=with_traceback, interpret=interpret,
    )
    return BucketFill(
        np.asarray(scores), np.asarray(srow), np.asarray(scol),
        np.asarray(dirs) if dirs is not None else None,
        band=params.band,
    )
