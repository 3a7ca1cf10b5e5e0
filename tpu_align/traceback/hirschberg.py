"""Hirschberg divide-and-conquer traceback: alignment in O(M+N) memory.

No direction tensor ever exists, in HBM or on the host: the DP fill runs
scores-only and emits only its LAST ROW (kernels/fill.py
fill_last_rows_async), the optimal path's crossing column at the query
midrow is found by maximizing forward + reversed-suffix last-row sums
(Hirschberg 1975), and the two halves recurse.  Subproblems small enough
for the packed-direction kernels become leaves and run through the
standard fill + traceback machinery; because every split cell lies ON an
optimal path, the leaves' aligned lines concatenate into a full optimal
alignment.

Role: exceeds the reference (no counterpart in
mickgordinier/DPX_GPU_Genomics_Project) -- enables pairs whose direction
matrix cannot be materialized (a 100kbp x 100kbp pair needs 2.5 GB even at
2 bits/cell; last rows need 400 KB) at ~2x the fill FLOPs.  The fill
keeps (N, 128) rows in VMEM, capping the kernel's reference axis
(~32kbp); hirschberg_align puts the SHORTER sequence on that axis
(alignment is symmetric under swapping the pair; this mode's contract is
co-optimality, not the walkers' tie chain), so only min(M, N) is capped
and the longer side is unbounded.

Scope: LNW exactly; ANW via Myers-Miller (1988) -- the split also
considers crossing the midrow INSIDE a vertical gap using the captured
Gotoh F last rows, with per-pair boundary gap-open credits
(fill_last_rows_async open_top) threading through the recursion; LSW via
endpoint discovery (two scores-only fills locate a co-optimal path's end
and start cells; the segment between two max cells aligns globally at
the local score).  BSW is banded -- its direction storage is already
O(M x band).

Output contract: A co-optimal alignment (exact score, verified by
re-scoring in tests).  Split-point argmax ties do not follow the
direction-walkers' per-cell `>=` chains, so byte-equality with the
stored-directions walk is not guaranteed (and not claimed).

TPU shape discipline: every level's batched fill pads (B, N, M) to powers
of two (floors 8/128/8) so recursion depths reuse compiled executables --
distinct kernel shapes stay O(log^2) per pair, not O(levels x subs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.core.result import AlignmentResult
from tpu_align.kernels.fill import NEG as _FILL_NEG
from tpu_align.kernels.fill import fill_bucket_async

GAP = "_"

# Split-level last-row fill kernel: "auto" (stagger on compiled backends,
# rowscan in interpret mode -- the stagger's per-step Python interpret
# loop is slower to EMULATE although ~2x cheaper in VPU ops), "stagger"
# (kernels/stagger.py fill_stagger_last_rows_async) or "rowscan"
# (kernels/fill.py fill_last_rows_async).  The two kernels are
# bit-identical (tests/test_kernels.py), so the knob is pure perf A/B.
LAST_ROWS_KERNEL = "auto"


def fill_last_rows_async(algorithm, params, refs, qrys, rlen, qlen,
                         interpret=None, open_top=None):
    from tpu_align.kernels.fill import _default_interpret

    if interpret is None:
        interpret = _default_interpret()
    pick = LAST_ROWS_KERNEL
    if pick == "auto":
        pick = "rowscan" if interpret else "stagger"
    if pick == "stagger":
        from tpu_align.kernels.stagger import fill_stagger_last_rows_async

        return fill_stagger_last_rows_async(
            algorithm, params, refs, qrys, rlen, qlen,
            interpret=interpret, open_top=open_top)
    from tpu_align.kernels.fill import fill_last_rows_async as _rowscan

    return _rowscan(algorithm, params, refs, qrys, rlen, qlen,
                    interpret=interpret, open_top=open_top)


def _pow2_pad(x: int, floor: int) -> int:
    n = floor
    while n < x:
        n *= 2
    return n


def _tokens(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("ascii"), np.uint8)


def _batch_problems(probs):
    """Pad a list of (ref_tokens, qry_tokens) into kernel-shaped arrays."""
    b = _pow2_pad(len(probs), 8)
    n = _pow2_pad(max(p[0].size for p in probs), 128)
    m = _pow2_pad(max(p[1].size for p in probs), 8)
    refs = np.zeros((b, n), np.uint8)
    qrys = np.ones((b, m), np.uint8)  # pad token 1 never equals ref pad 0
    rlen = np.zeros(b, np.int32)
    qlen = np.zeros(b, np.int32)
    for k, (r, q) in enumerate(probs):
        refs[k, : r.size] = r
        qrys[k, : q.size] = q
        rlen[k] = r.size
        qlen[k] = q.size
    return refs, qrys, rlen, qlen


@functools.partial(jax.jit, static_argnames=("affine",))
def _split_reduce_jit(hlast, flast, fhb, bhb, nn, go, affine=False):
    """Device-side Hirschberg split combine: the per-level D2H shrinks
    from the full (N, 2K) last-row matrix (MBs; minutes-scale over the
    tunnel at scale) to 4 ints per subproblem.

    For sub k with nn[k] real rows: F(i) = fhb[k] if i == 0 else
    hlast[i-1, 2k]; B(j) symmetric from column 2k+1; tot[i] = F(i) +
    B(nn-i).  Returns (argmax_h, max_h, argmax_f, max_f) with the same
    first-max tie choice as np.argmax.  The affine variant also combines
    the credited F rows (tot_f = Ff + Bf_rev - go, the bridged gap's
    open counted once, Myers & Miller 1988)."""
    n = hlast.shape[0]
    # Overflow bound for the int32 sums below: every captured last-row
    # value is either a finite DP score (|H| <= max_len * max|weight|,
    # << 2^30 for any length this module accepts) or the fill's -inf
    # sentinel fill.NEG = -(2^30).  The worst sum is therefore
    # ~2*fill.NEG + |extra| ~ -2^31 + max_len*|go|, which stays above
    # INT32_MIN, and such sums only arise from sentinel operands, which
    # the j >= 0 mask (and the final argmax, since any real path beats
    # them) discards.  `neg` here must equal fill.NEG so masked cells
    # rank below every finite total without doubling past INT32_MIN.
    neg = jnp.int32(_FILL_NEG)

    def combine(last, border_f, border_b, extra=0):
        f = jnp.concatenate([border_f[:, None], last[:, 0::2].T], axis=1)
        bfull = jnp.concatenate([border_b[:, None], last[:, 1::2].T], axis=1)
        j = nn[:, None] - jnp.arange(n + 1, dtype=jnp.int32)[None, :]
        b = jnp.take_along_axis(bfull, jnp.clip(j, 0, n), axis=1)
        tot = jnp.where(j >= 0, f + b + extra, neg)
        return (jnp.argmax(tot, axis=1).astype(jnp.int32),
                jnp.max(tot, axis=1))

    jh, mh = combine(hlast, fhb, bhb)
    if not affine:
        return jh, mh, jh, mh
    jf, mf = combine(flast, fhb, bhb, extra=-go[:, None])
    return jh, mh, jf, mf


def _split_reduce(hlast, flast, fhb, bhb, nn, go=None):
    """Pad per-sub vectors to the kernel batch and run the device
    combine; returns numpy (argmax_h, max_h, argmax_f, max_f) sliced to
    the real sub count (ONE tiny D2H per level)."""
    kk = hlast.shape[1] // 2
    k = len(nn)

    def pad(v, dtype=np.int32):
        out = np.zeros(kk, dtype)
        out[:k] = v
        return out

    affine = flast is not None
    outs = _split_reduce_jit(
        hlast, flast if affine else hlast, pad(fhb), pad(bhb), pad(nn),
        pad(go if go is not None else np.zeros(k)), affine=affine)
    return tuple(np.asarray(o)[:k] for o in outs)


def _split_level(params, subs, interpret):
    """Split every open subproblem at its query midrow.

    subs: list of (ref_t, qry_t, (qi, qj, ri, rj)) -- possibly spanning
    DIFFERENT pairs (the engine merges same-level subproblems of a whole
    long-read dataset into this one call).  One batched last-row fill
    serves the entire level: problem 2k is the forward top half, problem
    2k+1 the reversed bottom half.  Returns (mids, split columns) -- the
    optimal path passes through (mid, split) of each subproblem.
    """
    probs = []
    mids = []
    for ref_t, qry_t, (qi, qj, ri, rj) in subs:
        mid = (qi + qj) // 2
        mids.append(mid)
        probs.append((ref_t[ri:rj], qry_t[qi:mid]))
        probs.append((ref_t[ri:rj][::-1].copy(), qry_t[mid:qj][::-1].copy()))
    refs, qrys, rlen, qlen = _batch_problems(probs)
    _, hlast, _ = fill_last_rows_async(
        Algorithm.LNW, params, refs, qrys, rlen, qlen, interpret=interpret,
    )
    g = params.gap
    # column 0 border is analytic: H[qlen][0] = qlen * gap
    fhb = np.array([(mids[k] - s[2][0]) * g for k, s in enumerate(subs)],
                   np.int32)
    bhb = np.array([(s[2][1] - mids[k]) * g for k, s in enumerate(subs)],
                   np.int32)
    nn = np.array([s[2][3] - s[2][2] for s in subs], np.int32)
    # the split argmax runs ON DEVICE; only one int per sub transfers
    jh, _, _, _ = _split_reduce(hlast, None, fhb, bhb, nn)
    splits = [subs[k][2][2] + int(jh[k]) for k in range(len(subs))]
    return mids, splits


def _leaf_lines_batch(params, leaves, interpret):
    """Align leaf segments -- (ref_t, qry_t, (qi, qj, ri, rj)) from any
    number of pairs -- with ONE standard engine run (fill + packed-dirs
    traceback); returns the per-leaf 3-tuples in input order."""
    from tpu_align.io.dataset import PairDataset
    from tpu_align.runtime.engine import AlignmentEngine

    pairs = []
    out: dict[int, tuple[str, str, str]] = {}
    for idx, (ref_t, qry_t, (qi, qj, ri, rj)) in enumerate(leaves):
        rseg = ref_t[ri:rj].tobytes().decode("ascii")
        qseg = qry_t[qi:qj].tobytes().decode("ascii")
        if not rseg and not qseg:
            out[idx] = ("", "", "")
        elif not rseg:
            out[idx] = (GAP * len(qseg), " " * len(qseg), qseg)
        elif not qseg:
            out[idx] = (rseg, " " * len(rseg), GAP * len(rseg))
        else:
            pairs.append((idx, rseg, qseg))
    if pairs:
        ds = PairDataset.from_pairs([(r, q) for _, r, q in pairs])
        eng = AlignmentEngine(Algorithm.LNW, params, interpret=interpret)
        res = eng.run(ds).results  # sorted by pair_num = position in pairs
        for (idx, _, _), r in zip(pairs, res):
            out[idx] = (r.ref_aligned, r.relation, r.query_aligned)
    return [out[i] for i in range(len(leaves))]


def _global_lines_batch(params, seqs, leaf_q, interpret):
    """Hirschberg recursion for global LNW alignments of MANY pairs.

    seqs: list of (ref_t, qry_t).  Level-synchronous ACROSS pairs: every
    open subproblem of every pair at a given depth splits in ONE batched
    fill, and all leaves of all pairs run through one engine batch -- a
    64-pair 16kbp dataset fills with 128-wide batches instead of
    serializing 64 single-pair recursions (each level's total cells halve
    while its batch doubles, so lane utilization grows as work shrinks).
    Returns one (ref, rel, qry) line 3-tuple per pair."""
    def settle(seg):
        qi, qj, ri, rj = seg
        return "leaf" if (qj - qi <= leaf_q or rj == ri) else "open"

    # one ordered worklist per pair; entries ["open"|"leaf", (qi,qj,ri,rj)]
    worklists = []
    for ref_t, qry_t in seqs:
        root = (0, qry_t.size, 0, ref_t.size)
        worklists.append([[settle(root), root]])
    while True:
        open_refs = [
            (p, i)
            for p, items in enumerate(worklists)
            for i, (kind, _) in enumerate(items) if kind == "open"
        ]
        if not open_refs:
            break
        subs = [(seqs[p][0], seqs[p][1], worklists[p][i][1])
                for p, i in open_refs]
        mids, splits = _split_level(params, subs, interpret)
        # replace back-to-front within each pair so indices stay valid
        for (p, i), mid, js in sorted(zip(open_refs, mids, splits),
                                      key=lambda t: (t[0][0], -t[0][1])):
            items = worklists[p]
            qi, qj, ri, rj = items[i][1]
            left = (qi, mid, ri, js)
            right = (mid, qj, js, rj)
            items[i:i + 1] = [[settle(left), left], [settle(right), right]]
    leaves = [
        (seqs[p][0], seqs[p][1], e)
        for p, items in enumerate(worklists) for _, e in items
    ]
    lines = _leaf_lines_batch(params, leaves, interpret)
    out = []
    pos = 0
    for items in worklists:
        chunk = lines[pos: pos + len(items)]
        pos += len(items)
        out.append(("".join(x[0] for x in chunk),
                    "".join(x[1] for x in chunk),
                    "".join(x[2] for x in chunk)))
    return out


def _global_lines(params, ref_t, qry_t, leaf_q, interpret):
    """Single-pair wrapper over the batched recursion."""
    return _global_lines_batch(params, [(ref_t, qry_t)], leaf_q,
                               interpret)[0]


# ---------------------------------------------------------------------------
# Myers-Miller (affine gaps): Hirschberg with boundary gap credits
# ---------------------------------------------------------------------------


def _one_row_lines(params, rseg, qc, tb, te):
    """Optimal single-query-row alignment under boundary credits (the
    Myers-Miller M == 1 base case): either the query char takes a diagonal
    at some column k (horizontal gap runs on both sides), or the whole row
    is one vertical gap move opening at the better credit."""
    go, ge = params.gap_open, params.gap_extend

    def gap(x):
        return 0 if x == 0 else go + x * ge

    n = rseg.size
    k = np.arange(n)
    w = np.where(rseg == qc, params.match, params.mismatch)
    left = np.where(k == 0, 0, go + k * ge)
    right_len = n - 1 - k
    right = np.where(right_len == 0, 0, go + right_len * ge)
    diag = left + w + right
    vert = gap(n) + max(tb, te) + ge
    rstr = rseg.tobytes().decode("ascii")
    qch = chr(qc)
    if diag.size and diag.max() >= vert:
        kk = int(np.argmax(diag))
        rel = "*" if rseg[kk] == qc else "|"
        return (rstr,
                " " * kk + rel + " " * (n - 1 - kk),
                GAP * kk + qch + GAP * (n - 1 - kk))
    # vertical: place the deleted row at the credited boundary so the gap
    # merges with the adjoining subproblem's gap run
    if te >= tb:
        return rstr + GAP, " " * (n + 1), GAP * n + qch
    return GAP + rstr, " " * (n + 1), qch + GAP * n


def _affine_split_level(params, subs, interpret):
    """Myers-Miller split for every open (qi, qj, ri, rj, tb, te).

    subs: list of (ref_t, qry_t, sub6) -- possibly spanning different
    pairs.  One batched credited last-row fill serves the level (problem
    2k = forward top half with open_top=tb, 2k+1 = reversed bottom half
    with open_top=te).  Each sub resolves to a piece list: two child subs
    (type-1 crossing, H + H), or child/bridge-lines/child (type-2: the
    path crosses the midrow INSIDE a vertical gap -- rows mid and mid+1
    are forced deletions and the halves get a free open at the shared
    boundary, Myers & Miller 1988)."""
    go, ge = params.gap_open, params.gap_extend
    probs, opens = [], []
    for ref_t, qry_t, (qi, qj, ri, rj, tb, te) in subs:
        mid = (qi + qj) // 2
        probs.append((ref_t[ri:rj], qry_t[qi:mid]))
        opens.append(tb)
        probs.append((ref_t[ri:rj][::-1].copy(), qry_t[mid:qj][::-1].copy()))
        opens.append(te)
    refs, qrys, rlen, qlen = _batch_problems(probs)
    open_top = np.full(refs.shape[0], go, np.int32)
    open_top[: len(opens)] = opens
    _, hlast, flast = fill_last_rows_async(
        Algorithm.ANW, params, refs, qrys, rlen, qlen, interpret=interpret,
        open_top=open_top,
    )
    # border column j = 0 is one vertical gap from the corner: it IS
    # the F state there and opens at the boundary credit; tot_f counts
    # the bridged gap's open once (-go in the device combine).  The
    # argmax/max reduction runs ON DEVICE -- 4 ints per sub transfer.
    fhb = np.array([s[2][4] + ((s[2][0] + s[2][1]) // 2 - s[2][0]) * ge
                    for s in subs], np.int32)
    bhb = np.array([s[2][5] + (s[2][1] - (s[2][0] + s[2][1]) // 2) * ge
                    for s in subs], np.int32)
    nns = np.array([s[2][3] - s[2][2] for s in subs], np.int32)
    jhs, mhs, jfs, mfs = _split_reduce(
        hlast, flast, fhb, bhb, nns, go=np.full(len(subs), go, np.int32))
    pieces = []
    for k, (ref_t, qry_t, (qi, qj, ri, rj, tb, te)) in enumerate(subs):
        mid = (qi + qj) // 2
        if mfs[k] > mhs[k]:
            js = ri + int(jfs[k])
            bridge = (GAP * 2, "  ",
                      qry_t[mid - 1: mid + 1].tobytes().decode("ascii"))
            pieces.append([
                (qi, mid - 1, ri, js, tb, 0),
                ["lines", bridge],
                (mid + 1, qj, js, rj, 0, te),
            ])
        else:
            js = ri + int(jhs[k])
            pieces.append([
                (qi, mid, ri, js, tb, go),
                (mid, qj, js, rj, go, te),
            ])
    return pieces


def _affine_lines_batch(params, seqs, leaf_q, interpret):
    """Myers-Miller recursion for global ANW alignments of MANY pairs;
    level-synchronous across pairs like _global_lines_batch."""
    go = params.gap_open

    def settle(ref_t, qry_t, sub):
        qi, qj, ri, rj, tb, te = sub
        qlen, rlen = qj - qi, rj - ri
        if qlen == 0:
            rseg = ref_t[ri:rj].tobytes().decode("ascii")
            return ["lines", (rseg, " " * rlen, GAP * rlen)]
        if rlen == 0:
            qseg = qry_t[qi:qj].tobytes().decode("ascii")
            return ["lines", (GAP * qlen, " " * qlen, qseg)]
        if qlen == 1:
            return ["lines",
                    _one_row_lines(params, ref_t[ri:rj], qry_t[qi], tb, te)]
        if tb == go and te == go and qlen <= leaf_q:
            # credit-free subproblem: the standard packed-dirs engine is
            # optimal for it (boundary gaps cannot merge with neighbors
            # without contradicting the parent split's optimality)
            return ["engine", (qi, qj, ri, rj)]
        return ["open", sub]

    worklists = [
        [settle(r, q, (0, q.size, 0, r.size, go, go))] for r, q in seqs
    ]
    while True:
        open_refs = [
            (p, i)
            for p, items in enumerate(worklists)
            for i, (kind, _) in enumerate(items) if kind == "open"
        ]
        if not open_refs:
            break
        subs = [(seqs[p][0], seqs[p][1], worklists[p][i][1])
                for p, i in open_refs]
        pieces = _affine_split_level(params, subs, interpret)
        for (p, i), piece in sorted(zip(open_refs, pieces),
                                    key=lambda t: (t[0][0], -t[0][1])):
            ref_t, qry_t = seqs[p]
            worklists[p][i:i + 1] = [
                x if isinstance(x, list) else settle(ref_t, qry_t, x)
                for x in piece
            ]
    eng_refs = [
        (p, i)
        for p, items in enumerate(worklists)
        for i, (kind, _) in enumerate(items) if kind == "engine"
    ]
    if eng_refs:
        from tpu_align.io.dataset import PairDataset
        from tpu_align.runtime.engine import AlignmentEngine

        ds = PairDataset.from_pairs([
            (seqs[p][0][ri:rj].tobytes().decode("ascii"),
             seqs[p][1][qi:qj].tobytes().decode("ascii"))
            for p, i in eng_refs
            for (qi, qj, ri, rj) in [worklists[p][i][1]]
        ])
        eng = AlignmentEngine(Algorithm.ANW, params, interpret=interpret)
        for (p, i), r in zip(eng_refs, eng.run(ds).results):
            worklists[p][i] = ["lines",
                               (r.ref_aligned, r.relation, r.query_aligned)]
    out = []
    for items in worklists:
        parts = [v for _, v in items]
        out.append(("".join(x[0] for x in parts),
                    "".join(x[1] for x in parts),
                    "".join(x[2] for x in parts)))
    return out


def _affine_lines(params, ref_t, qry_t, leaf_q, interpret):
    """Single-pair wrapper over the batched Myers-Miller recursion."""
    return _affine_lines_batch(params, [(ref_t, qry_t)], leaf_q,
                               interpret)[0]


def _local_endpoints_batch(params, seqs, interpret):
    """Locate a co-optimal local path's end and start cells for MANY pairs
    with two batched scores-only fills (one forward fill for all pairs;
    one reversed fill over each end cell's prefix).  Returns a list of
    (score, (sr, er, sc, ec) | None)."""
    refs, qrys, rlen, qlen = _batch_problems(list(seqs))
    sc, er, ec, _ = fill_bucket_async(
        Algorithm.LSW, params, refs, qrys, rlen, qlen,
        with_traceback=False, interpret=interpret,
    )
    n = len(seqs)
    scores = np.asarray(sc)[:n].astype(int)
    ers = np.asarray(er)[:n].astype(int)
    ecs = np.asarray(ec)[:n].astype(int)
    live = [k for k in range(n) if scores[k] > 0]
    out = [(int(scores[k]), None) for k in range(n)]
    if not live:
        return out
    rev = [(seqs[k][0][: ecs[k]][::-1].copy(),
            seqs[k][1][: ers[k]][::-1].copy()) for k in live]
    refs, qrys, rlen, qlen = _batch_problems(rev)
    sc2, rr, rc, _ = fill_bucket_async(
        Algorithm.LSW, params, refs, qrys, rlen, qlen,
        with_traceback=False, interpret=interpret,
    )
    sc2 = np.asarray(sc2).astype(int)
    rr = np.asarray(rr).astype(int)
    rc = np.asarray(rc).astype(int)
    for j, k in enumerate(live):
        if int(sc2[j]) != int(scores[k]):  # suffix max == the global max
            raise RuntimeError(
                f"LSW endpoint discovery (pair {k}): reversed-fill max "
                f"{int(sc2[j])} != forward local max {int(scores[k])}; "
                "fill kernel regression?")
        out[k] = (int(scores[k]),
                  (int(ers[k] - rr[j]), int(ers[k]),
                   int(ecs[k] - rc[j]), int(ecs[k])))
    return out  # qry [sr:er], ref [sc:ec]


def hirschberg_align(
    algorithm: Algorithm,
    params: AlignmentParams | None,
    ref: str,
    qry: str,
    pair_num: int = 0,
    leaf_q: int = 128,
    interpret: bool | None = None,
) -> AlignmentResult:
    """Align one pair with NO direction storage (O(M+N) working memory).

    LNW: Hirschberg over the last-row fill.  ANW: Myers-Miller -- the
    split also considers the path crossing the midrow INSIDE a vertical
    gap (captured Gotoh F last rows), forcing two bridge deletions and
    handing the halves a free gap-open credit at the shared boundary.
    LSW: endpoint discovery (the forward scores-only argmax cell is the
    path end; the reversed fill's argmax is the start) followed by global
    Hirschberg on the segment between them -- any global alignment of the
    max-cell-to-max-cell segment is a co-optimal local path.  BSW is
    banded: its direction storage is already O(M x band).

    leaf_q: subproblems with at most this many query rows run through the
    standard packed-dirs fill + traceback (the recursion base case).
    """
    return hirschberg_align_batch(
        algorithm, params, [(ref, qry)], pair_nums=[pair_num],
        leaf_q=leaf_q, interpret=interpret,
    )[0]


def hirschberg_align_batch(
    algorithm: Algorithm,
    params: AlignmentParams | None,
    pairs,
    pair_nums=None,
    leaf_q: int = 128,
    interpret: bool | None = None,
) -> list[AlignmentResult]:
    """Align MANY pairs with no direction storage, level-batched ACROSS
    pairs: every recursion depth's open subproblems -- of all pairs --
    merge into one power-of-two-padded fill, and all leaves run through
    one packed-dirs engine batch.  A many-long-pairs dataset therefore
    fills with wide batches instead of serializing per-pair recursions
    (the engine's traceback="hirschberg" path calls this).

    pairs: [(ref, qry), ...]; pair_nums: result numbering (default
    positional).  Same per-pair contract as hirschberg_align."""
    params = params or AlignmentParams()
    if algorithm is Algorithm.BSW:
        raise NotImplementedError(
            "hirschberg is for unbanded pairs; BSW direction storage is "
            "already O(M*band) -- use the banded kernel"
        )
    if algorithm.is_affine and params.gap_open > 0:
        raise ValueError("ANW requires gap_open <= 0")
    if pair_nums is None:
        pair_nums = list(range(len(pairs)))
    # The DP problem is symmetric under swapping the two sequences (the
    # relation line and score are invariant; the gap lines swap; for
    # affine the E and F matrices trade roles under the same weights), and
    # this mode promises A co-optimal alignment, not the walkers' tie
    # chain -- so solve with the SHORTER side as the kernel's reference
    # axis.  This puts the VMEM-capped (N, 128)-rows fill on min(M, N):
    # only the shorter side is capped (~32kbp), the longer is unbounded.
    seqs, flips = [], []
    for ref, qry in pairs:
        ref_t, qry_t = _tokens(ref), _tokens(qry)
        flip = ref_t.size > qry_t.size
        if flip:
            ref_t, qry_t = qry_t, ref_t
        seqs.append((ref_t, qry_t))
        flips.append(flip)

    def result(k, score, r="", m="", q=""):
        if flips[k]:
            r, q = q, r
        return AlignmentResult(pair_nums[k], score, r, m, q)

    if algorithm is Algorithm.ANW:
        lines = _affine_lines_batch(params, seqs, leaf_q, interpret)
        return [result(k, _rescore_affine(params, r, q), r, m, q)
                for k, (r, m, q) in enumerate(lines)]
    if algorithm is Algorithm.LSW:
        ends = _local_endpoints_batch(params, seqs, interpret)
        seg_idx = [k for k, (_, seg) in enumerate(ends) if seg is not None]
        seg_seqs = []
        for k in seg_idx:
            sr, er, sc, ec = ends[k][1]
            ref_t, qry_t = seqs[k]
            seg_seqs.append((ref_t[sc:ec], qry_t[sr:er]))
        seg_lines = (_global_lines_batch(params, seg_seqs, leaf_q, interpret)
                     if seg_seqs else [])
        out = [result(k, score) for k, (score, _) in enumerate(ends)]
        for k, (r, m, q) in zip(seg_idx, seg_lines):
            # the other branches print _rescore(lines); here the score
            # comes from the forward fill, so reconcile the emitted
            # segment against it -- an endpoint/recursion regression
            # must fail loudly, not print desynchronized score + lines
            got = _rescore(params, r, q)
            if got != ends[k][0]:
                raise RuntimeError(
                    f"hirschberg LSW rescore mismatch (pair "
                    f"{pair_nums[k]}): lines score {got}, fill says "
                    f"{ends[k][0]}")
            out[k] = result(k, ends[k][0], r, m, q)
        return out
    lines = _global_lines_batch(params, seqs, leaf_q, interpret)
    return [result(k, _rescore(params, r, q), r, m, q)
            for k, (r, m, q) in enumerate(lines)]


def _rescore(params, ref_line: str, qry_line: str) -> int:
    """Exact linear-gap score of an emitted alignment (sum over columns)."""
    score = 0
    for rc, qc in zip(ref_line, qry_line):
        if rc == GAP or qc == GAP:
            score += params.gap
        else:
            score += params.match if rc == qc else params.mismatch
    return score


def _rescore_affine(params, ref_line: str, qry_line: str) -> int:
    """Exact affine-gap score of an emitted alignment (gap-run aware)."""
    score = 0
    in_e = in_f = False  # inside a horizontal (E) / vertical (F) gap run
    for rc, qc in zip(ref_line, qry_line):
        if rc == GAP:  # vertical: query char consumed, gap in the ref line
            score += params.gap_extend + (0 if in_f else params.gap_open)
            in_f, in_e = True, False
        elif qc == GAP:  # horizontal
            score += params.gap_extend + (0 if in_e else params.gap_open)
            in_e, in_f = True, False
        else:
            score += params.match if rc == qc else params.mismatch
            in_e = in_f = False
    return score
