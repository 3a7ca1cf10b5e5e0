"""Row-sweep vectorized NumPy oracle, bit-identical to scalar.py.

The within-row left dependency of the DP recurrences is removed with the
linear-gap prefix-scan identity: for a row recurrence
    H[j] = max(T[j], H[j-1] + g)
substituting V[j] = H[j] - j*g gives V[j] = max(T[j] - j*g, V[j-1]), a
running maximum (np.maximum.accumulate).  The affine insertion matrix E
admits the same scan because re-opening a gap out of an insertion state is
dominated by extending it when gap_open <= 0 (the "lazy-F" observation; see
PAPERS.md, De(con)struction of the lazy-F loop).  Direction codes are then
recovered vectorially with the reference's `>=` predicate order
(FakeDPX.cpp:145-153; see scalar.py for the per-algorithm chains).

This oracle generates golden outputs for 100k-pair workloads in seconds and
cross-checks the Pallas kernels at scale; scalar.py anchors it in tests.
"""

from __future__ import annotations

import numpy as np

from tpu_align.core import directions as D
from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.oracle.scalar import FillResult

_I64 = np.int64
# The batched fills below run in int32: every DP value is bounded by
# max(len) * max|weight| (and the scan's j*g derank by the same), so
# int32 is exact up to ~10^6-base sequences -- and the per-pair oracle
# casts to int32 at the end anyway, so results stay bit-identical.
_I32 = np.int32


def _encode(seq: str) -> np.ndarray:
    return np.frombuffer(seq.encode("latin-1"), np.uint8)


def _scan_max(head: np.ndarray | int, t: np.ndarray, g: int) -> np.ndarray:
    """Return H[0..n] with H[0]=head, H[j]=max(t[j-1], H[j-1]+g)."""
    n = t.shape[0]
    v = np.empty(n + 1, _I64)
    v[0] = head
    jg = np.arange(1, n + 1, dtype=_I64) * g
    v[1:] = t - jg
    np.maximum.accumulate(v, out=v)
    v[1:] += jg
    return v


def fill_vectorized(
    algorithm: Algorithm,
    params: AlignmentParams,
    reference: str,
    query: str,
    tie_policy: str = "cuda",
) -> FillResult:
    if algorithm is Algorithm.LNW:
        return _fill_lnw(params, reference, query)
    if algorithm is Algorithm.LSW:
        return _fill_lsw(params, reference, query, None, tie_policy)
    if algorithm is Algorithm.BSW:
        return _fill_lsw(params, reference, query, params.band, tie_policy)
    if algorithm is Algorithm.ANW:
        return _fill_anw(params, reference, query)
    raise ValueError(f"unknown algorithm {algorithm}")


def _diag_terms(q: np.ndarray, r: np.ndarray, i: int, p: AlignmentParams):
    is_match = q[i - 1] == r
    w = np.where(is_match, p.match, p.mismatch).astype(_I64)
    ddir = np.where(is_match, D.MATCH, D.MISMATCH).astype(np.uint8)
    return w, ddir


def _fill_lnw(p: AlignmentParams, ref: str, qry: str) -> FillResult:
    q, r = _encode(qry), _encode(ref)
    m, n = len(q), len(r)
    g = p.gap
    h = np.zeros((m + 1, n + 1), _I64)
    dirs = np.zeros((m + 1, n + 1), np.uint8)
    h[1:, 0] = np.arange(1, m + 1, dtype=_I64) * g
    h[0, 1:] = np.arange(1, n + 1, dtype=_I64) * g
    dirs[1:, 0] = D.QUERY_DELETION
    dirs[0, 1:] = D.QUERY_INSERTION
    for i in range(1, m + 1):
        w, ddir = _diag_terms(q, r, i, p)
        mm = h[i - 1, :-1] + w
        dele = h[i - 1, 1:] + g
        t = np.maximum(mm, dele)
        dt = np.where(dele >= mm, np.uint8(D.QUERY_DELETION), ddir)
        row = _scan_max(h[i, 0], t, g)
        h[i] = row
        ins = row[:-1] + g
        dirs[i, 1:] = np.where(ins >= t, np.uint8(D.QUERY_INSERTION), dt)
    return FillResult(Algorithm.LNW, h.astype(np.int32), dirs)


def _fill_lsw(
    p: AlignmentParams, ref: str, qry: str, band: int | None, tie_policy: str
) -> FillResult:
    q, r = _encode(qry), _encode(ref)
    m, n = len(q), len(r)
    g = p.gap
    h = np.zeros((m + 1, n + 1), _I64)
    dirs = np.zeros((m + 1, n + 1), np.uint8)
    algo = Algorithm.LSW if band is None else Algorithm.BSW
    for i in range(1, m + 1):
        if band is None:
            lo, hi = 1, n + 1
        else:
            lo, hi = 1 + max(0, i - band), min(i + band, n + 1)
        if lo >= hi:
            continue
        sl = slice(lo, hi)
        w, ddir = _diag_terms(q, r, i, p)
        w, ddir = w[lo - 1 : hi - 1], ddir[lo - 1 : hi - 1]
        mm = h[i - 1, lo - 1 : hi - 1] + w
        dele = h[i - 1, sl] + g
        t0 = np.maximum(np.maximum(mm, dele), 0)
        row = _scan_max(h[i, lo - 1], t0, g)  # h[i, lo-1] is 0 (outside band or col 0)
        h[i, sl] = row[1:]
        ins = row[:-1] + g
        if tie_policy == "cuda":
            # chain: ins vs mm -> INS; dele vs winner -> DEL; 0 vs winner -> NONE
            d = ddir.copy()
            best = mm
            take_ins = ins >= best
            d = np.where(take_ins, np.uint8(D.QUERY_INSERTION), d)
            best = np.maximum(best, ins)
            take_del = dele >= best
            d = np.where(take_del, np.uint8(D.QUERY_DELETION), d)
            best = np.maximum(best, dele)
            d = np.where(0 >= best, np.uint8(D.NONE), d)
        elif tie_policy == "cpu":
            final = row[1:]
            d = ddir.copy()
            d = np.where(ins == final, np.uint8(D.QUERY_INSERTION), d)
            d = np.where(dele == final, np.uint8(D.QUERY_DELETION), d)
            d = np.where(
                (mm < 0) & (dele < 0) & (ins < 0), np.uint8(D.NONE), d
            )
        else:
            raise ValueError(f"unknown tie_policy {tie_policy!r}")
        dirs[i, sl] = d
    return FillResult(algo, h.astype(np.int32), dirs)


def _fill_anw(p: AlignmentParams, ref: str, qry: str) -> FillResult:
    if p.gap_open > 0:
        raise ValueError("vectorized ANW requires gap_open <= 0; use fill_scalar")
    q, r = _encode(qry), _encode(ref)
    m, n = len(q), len(r)
    go, ge = p.gap_open, p.gap_extend
    neg = -(10**9) // 4
    h = np.zeros((m + 1, n + 1), _I64)
    e = np.full((m + 1, n + 1), neg, _I64)
    f = np.full((m + 1, n + 1), neg, _I64)
    dirs = np.zeros((m + 1, n + 1), np.uint8)
    e_dirs = np.zeros((m + 1, n + 1), np.uint8)
    f_dirs = np.zeros((m + 1, n + 1), np.uint8)
    h[1:, 0] = go + np.arange(1, m + 1, dtype=_I64) * ge
    h[0, 1:] = go + np.arange(1, n + 1, dtype=_I64) * ge
    dirs[1:, 0] = D.QUERY_DELETION
    dirs[0, 1:] = D.QUERY_INSERTION
    for i in range(1, m + 1):
        # F (query deletion): no within-row dependency
        open_f = h[i - 1, 1:] + go + ge
        if i == 1:
            f[i, 1:] = open_f
            f_dirs[i, 1:] = D.GAP_OPEN
        else:
            ext_f = f[i - 1, 1:] + ge
            f[i, 1:] = np.maximum(open_f, ext_f)
            f_dirs[i, 1:] = np.where(
                open_f >= ext_f, np.uint8(D.GAP_OPEN), np.uint8(D.GAP_EXTEND)
            )
        w, ddir = _diag_terms(q, r, i, p)
        mm = h[i - 1, :-1] + w
        c = np.maximum(mm, f[i, 1:])
        # E scan: E[1] = H[i,0]+go+ge; E[j] = max(C[j-1]+go+ge, E[j-1]+ge) for j>=2.
        # (Opening from H[j-1]=E[j-1] is dominated by extending when go<=0, so
        # substituting C for H preserves values; see module docstring.)
        if n >= 1:
            a = np.empty(n, _I64)
            a[0] = h[i, 0] + go + ge
            if n > 1:
                a[1:] = c[:-1] + go + ge
            # E[j] = max(a[j], E[j-1]+ge), with no head term: use a[0] as seed
            erow = _scan_max(a[0] - ge, a, ge)[1:]  # head chosen so H[1]=a[0]
            e[i, 1:] = erow
            h[i, 1:] = np.maximum(c, erow)
            # E dirs use the ORIGINAL comparison vs true H (j>=2); j==1 forced OPEN
            e_dirs[i, 1] = D.GAP_OPEN
            if n > 1:
                open_e = h[i, 1:-1] + go + ge
                ext_e = erow[:-1] + ge
                e_dirs[i, 2:] = np.where(
                    open_e >= ext_e, np.uint8(D.GAP_OPEN), np.uint8(D.GAP_EXTEND)
                )
            d = ddir
            d = np.where(f[i, 1:] >= mm, np.uint8(D.QUERY_DELETION), d)
            d = np.where(
                erow >= np.maximum(f[i, 1:], mm), np.uint8(D.QUERY_INSERTION), d
            )
            dirs[i, 1:] = d
    return FillResult(
        Algorithm.ANW,
        h.astype(np.int32),
        dirs,
        e.astype(np.int32),
        f.astype(np.int32),
        e_dirs,
        f_dirs,
    )


# --- cross-pair batched fills (the all-paths fast path) ----------------------
#
# The per-pair row sweep above spends most of its time in numpy call
# overhead (rows are ~250 elements).  These variants run the SAME
# recurrences over a (B, n) slab -- one numpy op per row covers a whole
# chunk of pairs -- and slice per-pair FillResults out at the end.
# Padded query rows / reference columns use token 0 vs 1 (never equal),
# so padded cells never match; results are sliced to (m+1, n+1) before
# they are returned, making the outputs bit-identical to fill_vectorized
# (anchored in tests/test_oracle.py).


def _encode_batch(seqs, pad: int = 0):
    """(B, nmax) uint8 token slab (tail positions = `pad`) + (B,) lengths.
    Callers pad refs with 0 and qrys with 1 so pad-vs-pad never compares
    equal -- only PAD positions get the pad byte; real sequence bytes
    (including NUL) pass through untouched, keeping batch fills
    bit-identical to fill_vectorized on arbitrary byte content."""
    lens = np.array([len(s) for s in seqs], np.int64)
    nmax = int(lens.max()) if len(seqs) else 0
    out = np.full((len(seqs), max(nmax, 1)), pad, np.uint8)
    for k, s in enumerate(seqs):
        out[k, : len(s)] = np.frombuffer(s.encode("latin-1"), np.uint8)
    return out, lens


def _scan_max_rows(head: np.ndarray, t: np.ndarray, g: int) -> np.ndarray:
    """Row-wise _scan_max over a (B, n) slab: returns (B, n+1) H with
    H[:,0]=head, H[:,j]=max(t[:,j-1], H[:,j-1]+g)."""
    b, n = t.shape
    v = np.empty((b, n + 1), _I32)
    v[:, 0] = head
    jg = np.arange(1, n + 1, dtype=_I32) * g
    v[:, 1:] = t - jg[None, :]
    np.maximum.accumulate(v, axis=1, out=v)
    v[:, 1:] += jg[None, :]
    return v


def fill_vectorized_batch(
    algorithm: Algorithm,
    params: AlignmentParams,
    pairs,
    tie_policy: str = "cuda",
    chunk: int = 256,
):
    """Batched fill_vectorized over [(reference, query), ...]; returns
    [FillResult, ...] in input order, bit-identical per pair.  Pairs are
    processed in length-sorted chunks so padding waste stays low."""
    if algorithm is Algorithm.ANW:
        # the affine slab has 6 matrices and all-paths excludes ANW; the
        # per-pair fill stays the ANW path
        return [fill_vectorized(algorithm, params, r, q, tie_policy)
                for r, q in pairs]
    order = sorted(range(len(pairs)),
                   key=lambda k: (len(pairs[k][1]), len(pairs[k][0])))
    out: list = [None] * len(pairs)
    for at in range(0, len(order), chunk):
        idx = order[at: at + chunk]
        refs = [pairs[k][0] for k in idx]
        qrys = [pairs[k][1] for k in idx]
        if algorithm is Algorithm.LNW:
            fills = _fill_lnw_batch(params, refs, qrys)
        else:
            band = params.band if algorithm is Algorithm.BSW else None
            fills = _fill_lsw_batch(params, refs, qrys, band, tie_policy)
        for k, f in zip(idx, fills):
            out[k] = f
    return out


def _fill_lnw_batch(p: AlignmentParams, refs, qrys):
    r_tok, r_len = _encode_batch(refs)
    q_tok, q_len = _encode_batch(qrys, pad=1)  # never equals ref pad 0
    b, n = r_tok.shape
    m = q_tok.shape[1]
    g = p.gap
    h = np.zeros((b, m + 1, n + 1), _I32)
    dirs = np.zeros((b, m + 1, n + 1), np.uint8)
    h[:, 1:, 0] = np.arange(1, m + 1, dtype=_I32)[None, :] * g
    h[:, 0, 1:] = np.arange(1, n + 1, dtype=_I32)[None, :] * g
    dirs[:, 1:, 0] = D.QUERY_DELETION
    dirs[:, 0, 1:] = D.QUERY_INSERTION
    for i in range(1, m + 1):
        is_match = q_tok[:, i - 1: i] == r_tok
        w = np.where(is_match, p.match, p.mismatch).astype(_I32)
        ddir = np.where(is_match, D.MATCH, D.MISMATCH).astype(np.uint8)
        mm = h[:, i - 1, :-1] + w
        dele = h[:, i - 1, 1:] + g
        t = np.maximum(mm, dele)
        dt = np.where(dele >= mm, np.uint8(D.QUERY_DELETION), ddir)
        row = _scan_max_rows(h[:, i, 0], t, g)
        h[:, i, :] = row
        ins = row[:, :-1] + g
        dirs[:, i, 1:] = np.where(ins >= t, np.uint8(D.QUERY_INSERTION), dt)
    return [
        FillResult(Algorithm.LNW,
                   h[k, : q_len[k] + 1, : r_len[k] + 1].astype(np.int32),
                   np.ascontiguousarray(
                       dirs[k, : q_len[k] + 1, : r_len[k] + 1]))
        for k in range(b)
    ]


def _fill_lsw_batch(p: AlignmentParams, refs, qrys, band, tie_policy):
    r_tok, r_len = _encode_batch(refs)
    q_tok, q_len = _encode_batch(qrys, pad=1)  # never equals ref pad 0
    b, n = r_tok.shape
    m = q_tok.shape[1]
    g = p.gap
    algo = Algorithm.LSW if band is None else Algorithm.BSW
    h = np.zeros((b, m + 1, n + 1), _I32)
    dirs = np.zeros((b, m + 1, n + 1), np.uint8)
    cols = np.arange(1, n + 1, dtype=np.int64)[None, :]
    for i in range(1, m + 1):
        is_match = q_tok[:, i - 1: i] == r_tok
        w = np.where(is_match, p.match, p.mismatch).astype(_I32)
        ddir = np.where(is_match, D.MATCH, D.MISMATCH).astype(np.uint8)
        mm = h[:, i - 1, :-1] + w
        dele = h[:, i - 1, 1:] + g
        t0 = np.maximum(np.maximum(mm, dele), 0)
        if band is not None:
            # out-of-band cells contribute 0 to the scan and store nothing
            # (python/LinearBandedSmithWaterman.py:71: columns
            # [1+max(0,row-band), row+band) -- STRICT |row-col| < band)
            in_band = np.abs(i - cols) < band
            t0 = np.where(in_band, t0, 0)
        row = _scan_max_rows(h[:, i, 0], t0, g)
        ins = row[:, :-1] + g
        final = row[:, 1:]
        if tie_policy == "cuda":
            d = ddir.copy()
            best = mm
            d = np.where(ins >= best, np.uint8(D.QUERY_INSERTION), d)
            best = np.maximum(best, ins)
            d = np.where(dele >= best, np.uint8(D.QUERY_DELETION), d)
            best = np.maximum(best, dele)
            d = np.where(0 >= best, np.uint8(D.NONE), d)
        elif tie_policy == "cpu":
            d = ddir.copy()
            d = np.where(ins == final, np.uint8(D.QUERY_INSERTION), d)
            d = np.where(dele == final, np.uint8(D.QUERY_DELETION), d)
            d = np.where((mm < 0) & (dele < 0) & (ins < 0),
                         np.uint8(D.NONE), d)
        else:
            raise ValueError(f"unknown tie_policy {tie_policy!r}")
        if band is not None:
            h[:, i, 1:] = np.where(in_band, final, 0)
            dirs[:, i, 1:] = np.where(in_band, d, np.uint8(D.NONE))
        else:
            h[:, i, 1:] = final
            dirs[:, i, 1:] = d
    return [
        FillResult(algo,
                   h[k, : q_len[k] + 1, : r_len[k] + 1].astype(np.int32),
                   np.ascontiguousarray(
                       dirs[k, : q_len[k] + 1, : r_len[k] + 1]))
        for k in range(b)
    ]
