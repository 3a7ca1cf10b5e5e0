"""Host traceback over the kernels' packed direction words.

Role model: the reference's host backtracking path (c++/backtrack.cpp,
called per pair after the kernel D2H copy, cuda/LNW/LinearNeedlemanWunsch.cu
V1-V5), operating on our 4-bit packed word layout
(tpu_align/core/directions.py) instead of byte-per-cell enum matrices.
The walk itself is shared with the oracle (tpu_align/oracle/traceback.py)
so kernel and oracle tracebacks are byte-identical by construction.
"""

from __future__ import annotations

import numpy as np

from tpu_align.core import directions as D
from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.core.result import AlignmentResult, results_from_arrays
from tpu_align.io.bucketing import Bucket
from tpu_align.kernels.fill import BucketFill, bits_per_cell
from tpu_align.oracle.traceback import _walk_anw, _walk_nw

# packed code (bits[1:0]) -> oracle direction enum
_MAIN_LUT = np.zeros(4, np.uint8)
_MAIN_LUT[D.MAIN_DIAG_MATCH] = D.MATCH
_MAIN_LUT[D.MAIN_DIAG_MISMATCH] = D.MISMATCH
_MAIN_LUT[D.MAIN_QUERY_DELETION] = D.QUERY_DELETION
_MAIN_LUT[D.MAIN_QUERY_INSERTION] = D.QUERY_INSERTION


def _decode_words(words: np.ndarray, bits: int) -> np.ndarray:
    """(MW, N) packed words -> (MW * 32//bits, N) per-cell codes."""
    per = 32 // bits
    shifts = (bits * np.arange(per, dtype=np.uint32))[None, :, None]
    mask = np.uint32((1 << bits) - 1)
    mw, n = words.shape
    return (
        (words.astype(np.uint32)[:, None, :] >> shifts) & mask
    ).reshape(mw * per, n)


def unpack_pair_dirs(
    words: np.ndarray, qlen: int, rlen: int, algorithm: Algorithm
):
    """Decode one pair's packed words -> oracle-style direction matrices.

    words: (MW, N) int32 with 32//bits query rows per word, where bits =
    bits_per_cell(algorithm): 16 rows/word for the 2-bit linear aligners,
    8 rows/word for 4-bit affine.  DP interior row i sits at bits
    [bits*(i%rows) .. bits*(i%rows)+bits-1] of word row i//rows.

    Returns (main_dirs, e_dirs, f_dirs) of shape (qlen+1, rlen+1) uint8 with
    the oracle's border conventions (row/col 0 forced INSERTION/DELETION for
    global aligners, c++/LinearNeedlemanWunsch.cpp:31-41; NONE for local).
    """
    codes = _decode_words(
        words, bits_per_cell(algorithm)
    )[:qlen, :rlen]
    main = _MAIN_LUT[codes & 3]
    e_dirs = f_dirs = None
    if algorithm.is_affine:
        e_dirs = np.zeros((qlen + 1, rlen + 1), np.uint8)
        f_dirs = np.zeros((qlen + 1, rlen + 1), np.uint8)
        e_dirs[1:, 1:] = np.where(codes & D.BIT_E_EXTEND, D.GAP_EXTEND, D.GAP_OPEN)
        f_dirs[1:, 1:] = np.where(codes & D.BIT_F_EXTEND, D.GAP_EXTEND, D.GAP_OPEN)
    main_dirs = np.zeros((qlen + 1, rlen + 1), np.uint8)
    main_dirs[1:, 1:] = main
    if not algorithm.is_local:
        main_dirs[1:, 0] = D.QUERY_DELETION
        main_dirs[0, 1:] = D.QUERY_INSERTION
    return main_dirs, e_dirs, f_dirs


def unpack_stagger_pair_dirs(
    words: np.ndarray, qlen: int, rlen: int, algorithm: Algorithm, s_rows: int
):
    """Decode one pair's stagger-layout words (stripes, W, S) into
    oracle-style direction matrices.

    Stagger packing (tpu_align/kernels/stagger.py): cell (i, j), 1-based,
    lives in stripe (i-1)//S, sublane r = (i-1)%S, step k = (j-1) + r,
    word k // (32//bits) at bits [bits*(k%spw) ..].
    """
    bits = bits_per_cell(algorithm)
    spw = 32 // bits
    si = np.arange(qlen) // s_rows  # (qlen,) stripe per row
    ri = np.arange(qlen) % s_rows   # (qlen,) sublane per row
    k = ri[:, None] + np.arange(rlen)[None, :]  # (qlen, rlen) step index
    w = k // spw
    rw = words.astype(np.uint32)[si[:, None], w, ri[:, None]]
    codes = (rw >> (bits * (k % spw)).astype(np.uint32)) & np.uint32(
        (1 << bits) - 1
    )
    main = _MAIN_LUT[codes & 3]
    e_dirs = f_dirs = None
    if algorithm.is_affine:
        e_dirs = np.zeros((qlen + 1, rlen + 1), np.uint8)
        f_dirs = np.zeros((qlen + 1, rlen + 1), np.uint8)
        e_dirs[1:, 1:] = np.where(codes & D.BIT_E_EXTEND, D.GAP_EXTEND,
                                  D.GAP_OPEN)
        f_dirs[1:, 1:] = np.where(codes & D.BIT_F_EXTEND, D.GAP_EXTEND,
                                  D.GAP_OPEN)
    main_dirs = np.zeros((qlen + 1, rlen + 1), np.uint8)
    main_dirs[1:, 1:] = main
    if not algorithm.is_local:
        main_dirs[1:, 0] = D.QUERY_DELETION
        main_dirs[0, 1:] = D.QUERY_INSERTION
    return main_dirs, e_dirs, f_dirs


def unpack_banded_pair_dirs(
    words: np.ndarray, qlen: int, rlen: int, band: int
):
    """Decode one pair's skewed banded words (MW, K8) into a full
    (qlen+1, rlen+1) main-direction matrix (NONE outside the band).
    Slot k of DP row i is column j = i - band + k
    (tpu_align/kernels/banded.py layout)."""
    k8 = words.shape[1]
    codes = _decode_words(words, 2)[:qlen]
    main = _MAIN_LUT[codes & 3]
    main_dirs = np.zeros((qlen + 1, rlen + 1), np.uint8)
    i_idx = np.arange(1, qlen + 1)[:, None]
    k_idx = np.arange(k8)[None, :]
    jmat = i_idx - band + k_idx
    valid = (
        (k_idx >= 1) & (k_idx <= 2 * band - 1) & (jmat >= 1) & (jmat <= rlen)
    )
    main_dirs[np.broadcast_to(i_idx, jmat.shape)[valid], jmat[valid]] = (
        main[valid]
    )
    return main_dirs, None, None


def _walk_local_rescore(main_dirs, ref: str, qry: str, r: int, c: int,
                        score: int, params: AlignmentParams):
    """Local walk with the backward re-scoring stop: along the optimal
    path H[pred] = H[cell] - move cost, so the remaining score reaches 0
    exactly at the clamped-to-zero path start (no stored stop flag)."""
    out_r, out_m, out_q = [], [], []
    remaining = score
    while remaining > 0 and r > 0 and c > 0:
        d = main_dirs[r, c]
        if d == D.MATCH or d == D.MISMATCH:
            out_r.append(ref[c - 1])
            out_m.append(D.REL_MATCH if d == D.MATCH else D.REL_MISMATCH)
            out_q.append(qry[r - 1])
            remaining -= params.match if d == D.MATCH else params.mismatch
            r -= 1
            c -= 1
        elif d == D.QUERY_DELETION:
            out_r.append(D.GAP_CHAR)
            out_m.append(D.REL_GAP)
            out_q.append(qry[r - 1])
            remaining -= params.gap
            r -= 1
        else:  # QUERY_INSERTION
            out_r.append(ref[c - 1])
            out_m.append(D.REL_GAP)
            out_q.append(D.GAP_CHAR)
            remaining -= params.gap
            c -= 1
    return (
        "".join(reversed(out_r)),
        "".join(reversed(out_m)),
        "".join(reversed(out_q)),
    )


def _check_affine_walkable(algorithm: Algorithm) -> None:
    """Fail loudly when the bench-attribution knob dropped the affine E/F
    extend bits from the dirs (see kernels/stagger.py): every walk entry
    point (records, native arrays, device) must refuse rather than emit
    wrong alignments."""
    if algorithm.is_affine:
        import os

        if os.environ.get("TPU_ALIGN_ANW_EF_BITS", "1") == "0":
            raise RuntimeError(
                "TPU_ALIGN_ANW_EF_BITS=0 emits non-walkable affine dirs "
                "(E/F extend bits dropped); unset it for traceback runs")


def traceback_bucket(
    algorithm: Algorithm,
    bucket: Bucket,
    fill: BucketFill,
    params: AlignmentParams | None = None,
    use_native: bool = True,
) -> list[AlignmentResult]:
    """Walk every real pair of a filled bucket into an AlignmentResult
    (pair_num = original dataset index).

    Uses the multithreaded native walker (native/tpualign.cpp, the
    c++/backtrack.cpp counterpart) when the shared library is available;
    falls back to the Python/NumPy walk otherwise.  Both paths are
    byte-identical (tests/test_native.py)."""
    if fill.dirs is None:
        raise ValueError("bucket was filled with with_traceback=False")
    _check_affine_walkable(algorithm)
    params = params or AlignmentParams()
    if use_native:
        native = _native_traceback(algorithm, bucket, fill, params)
        if native is not None:
            return native
    results = []
    for row in range(bucket.num_real):
        pair_num = int(bucket.pair_ids[row])
        qlen = int(bucket.qry_len[row])
        rlen = int(bucket.ref_len[row])
        ref = bucket.ref_tokens[row, :rlen].tobytes().decode("ascii")
        qry = bucket.qry_tokens[row, :qlen].tobytes().decode("ascii")
        score = int(fill.scores[row])
        srow = int(fill.start_row[row])
        scol = int(fill.start_col[row])
        if fill.band is not None:
            main, e_dirs, f_dirs = unpack_banded_pair_dirs(
                fill.dirs[:, row, :], qlen, rlen, fill.band
            )
        elif fill.stagger is not None:
            main, e_dirs, f_dirs = unpack_stagger_pair_dirs(
                fill.dirs[:, :, :, row], qlen, rlen, algorithm, fill.stagger
            )
        else:
            main, e_dirs, f_dirs = unpack_pair_dirs(
                fill.dirs[:, row, :], qlen, rlen, algorithm
            )
        if algorithm.is_affine:
            r, m, q = _walk_anw(main, e_dirs, f_dirs, ref, qry, qlen, rlen)
        elif algorithm.is_local:
            if score <= 0:
                r = m = q = ""  # empty block, cuda/LinearSmithWaterman.cu host
            else:
                r, m, q = _walk_local_rescore(main, ref, qry, srow, scol,
                                              score, params)
        else:
            r, m, q = _walk_nw(main, ref, qry, qlen, rlen, stop_local=False)
        results.append(AlignmentResult(pair_num, score, r, m, q))
    return results


def traceback_bucket_arrays(
    algorithm: Algorithm, bucket: Bucket, fill: BucketFill,
    params: AlignmentParams,
):
    """Native bucket walk returning raw (out_buf (B,3,stride) uint8,
    out_lens) arrays -- the engine's no-Python-strings fast path feeds
    these straight to the native block formatter.  None if the native
    library is unavailable."""
    _check_affine_walkable(algorithm)
    from tpu_align.native import native_traceback_bucket

    nb = bucket.num_real
    return native_traceback_bucket(
        algorithm.value,
        fill.dirs, bucket.ref_tokens[:nb], bucket.qry_tokens[:nb],
        bucket.ref_len[:nb], bucket.qry_len[:nb],
        fill.start_row[:nb], fill.start_col[:nb], fill.scores[:nb],
        skew_band=fill.band or 0,
        stagger=fill.stagger or 0,
        bits=bits_per_cell(algorithm),
        match=params.match, mismatch=params.mismatch, gap=params.gap,
    )


def _native_traceback(
    algorithm: Algorithm, bucket: Bucket, fill: BucketFill,
    params: AlignmentParams,
) -> list[AlignmentResult] | None:
    """Bucket walk via native/libtpualign.so; None if unavailable."""
    out = traceback_bucket_arrays(algorithm, bucket, fill, params)
    if out is None:
        return None
    out_buf, out_lens = out
    return results_from_arrays(bucket.pair_ids, fill.scores, out_buf,
                               out_lens, bucket.num_real)
