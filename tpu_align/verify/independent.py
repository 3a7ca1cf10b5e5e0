"""Independent score verification against third-party solvers.

Role model: the reference validates its aligners against an *external*
implementation (the Freiburg teaching-tool scrapers, web-scraper.py:190-258
and correct-outputs/*/web-scraper-*.py).  This module fills that role
without network access by checking oracle scores against two implementations
that share no code or recurrence structure with this repo:

1. ``scipy.sparse.csgraph`` shortest path (Bellman-Ford, a third-party
   graph solver): optimal alignment score == minus the shortest path
   through the alignment DAG whose edges *declaratively* encode the gap
   model (diagonal = -w(a,b), down/right = -gap; affine expands to H/E/F
   state nodes with open/extend edges; local adds free source/sink edges;
   banded drops out-of-band nodes).  A shared misreading of a recurrence in
   oracle + kernels cannot survive this check unless the same mistake is
   also made in the edge table -- a much smaller, declarative surface.

2. Exhaustive enumeration for tiny pairs: every monotone alignment path is
   generated directly from the *definition* of an alignment (interleavings
   of diagonal/deletion/insertion moves), scored, and maximized.  No DP at
   all -- this is the specification itself.

Both checks validate scores only (path tie-breaking is a policy, not a
correctness property, and is covered by the golden byte-comparisons).
"""

from __future__ import annotations

import itertools

import numpy as np

from tpu_align.core.params import Algorithm, AlignmentParams

try:  # scipy is available in this environment; guard anyway
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import bellman_ford

    HAVE_SCIPY = True
except Exception:  # pragma: no cover
    HAVE_SCIPY = False


# ---------------------------------------------------------------------------
# 1. Alignment DAG -> scipy Bellman-Ford
# ---------------------------------------------------------------------------


def _w(p: AlignmentParams, a: str, b: str) -> int:
    return p.match if a == b else p.mismatch


def graph_score(
    algorithm: Algorithm,
    params: AlignmentParams,
    reference: str,
    query: str,
) -> int:
    """Optimal alignment score via scipy's Bellman-Ford on the alignment
    DAG (edge weights are negated scores; shortest path == -best score)."""
    if not HAVE_SCIPY:  # pragma: no cover
        raise RuntimeError("scipy unavailable")
    m, n = len(query), len(reference)
    p = params

    if algorithm.is_affine:
        return _graph_score_affine(p, reference, query)

    # node id of DP state (i, j); plus a source/sink pair for local mode
    def nid(i, j):
        return i * (n + 1) + j

    num = (m + 1) * (n + 1)
    rows, cols, data = [], [], []

    def edge(u, v, wt):
        rows.append(u)
        cols.append(v)
        data.append(float(-wt))

    if algorithm is Algorithm.BSW:
        band = p.band

        def in_band(i, j):
            # python/LinearBandedSmithWaterman.py:71 band spec, plus the
            # always-present borders
            if i == 0 or j == 0:
                return True
            return (j >= 1 + max(0, i - band)) and (j < min(i + band, n + 1))
    else:
        def in_band(i, j):
            return True

    for i in range(m + 1):
        for j in range(n + 1):
            if not in_band(i, j):
                continue
            if i < m and j < n and in_band(i + 1, j + 1):
                edge(nid(i, j), nid(i + 1, j + 1),
                     _w(p, query[i], reference[j]))
            if i < m and in_band(i + 1, j):
                edge(nid(i, j), nid(i + 1, j), p.gap)
            if j < n and in_band(i, j + 1):
                edge(nid(i, j), nid(i, j + 1), p.gap)

    if algorithm.is_local:
        src, sink = num, num + 1
        for i in range(m + 1):
            for j in range(n + 1):
                if in_band(i, j):
                    edge(src, nid(i, j), 0)
                    edge(nid(i, j), sink, 0)
        g = csr_matrix(
            (data, (rows, cols)), shape=(num + 2, num + 2)
        )
        dist = bellman_ford(g, indices=src, return_predecessors=False)
        return int(round(-dist[sink]))
    g = csr_matrix((data, (rows, cols)), shape=(num, num))
    dist = bellman_ford(g, indices=nid(0, 0), return_predecessors=False)
    return int(round(-dist[nid(m, n)]))


def _graph_score_affine(p: AlignmentParams, reference: str,
                        query: str) -> int:
    """Gotoh three-state DAG: states H/E/F per (i, j).

    Edges (weights negated for shortest-path):
      H(i,j)   -> H(i+1,j+1)  w(q[i], r[j])     (diagonal)
      H(i,j)   -> F(i+1,j)    open + extend      (open a deletion run)
      F(i,j)   -> F(i+1,j)    extend             (extend it)
      F(i,j)   -> H(i,j)      0                  (close)
      H(i,j)   -> E(i,j+1)    open + extend      (open an insertion run)
      E(i,j)   -> E(i,j+1)    extend
      E(i,j)   -> H(i,j)      0
    matching the recurrence c++/AffineNeedlemanWunsch.cpp:167-242 (the
    reference's border rows ARE gap runs, so no special-casing is needed).
    """
    m, n = len(query), len(reference)
    stride = (n + 1)
    base_h, base_e, base_f = 0, (m + 1) * stride, 2 * (m + 1) * stride
    num = 3 * (m + 1) * stride

    rows, cols, data = [], [], []

    def edge(u, v, wt):
        rows.append(u)
        cols.append(v)
        data.append(float(-wt))

    go, ge = p.gap_open, p.gap_extend
    for i in range(m + 1):
        for j in range(n + 1):
            h = base_h + i * stride + j
            e = base_e + i * stride + j
            f = base_f + i * stride + j
            if i < m and j < n:
                edge(h, base_h + (i + 1) * stride + (j + 1),
                     _w(p, query[i], reference[j]))
            if i < m:
                edge(h, base_f + (i + 1) * stride + j, go + ge)
                edge(f, base_f + (i + 1) * stride + j, ge)
            if j < n:
                edge(h, base_e + i * stride + (j + 1), go + ge)
                edge(e, base_e + i * stride + (j + 1), ge)
            edge(e, h, 0)
            edge(f, h, 0)
    g = csr_matrix((data, (rows, cols)), shape=(num, num))
    dist = bellman_ford(g, indices=base_h, return_predecessors=False)
    return int(round(-dist[base_h + m * stride + n]))


# ---------------------------------------------------------------------------
# 2. Exhaustive path enumeration (tiny pairs; the definition itself)
# ---------------------------------------------------------------------------


def enumerate_score(
    algorithm: Algorithm,
    params: AlignmentParams,
    reference: str,
    query: str,
    max_cells: int = 2000,
) -> int:
    """Best score over EVERY alignment, by brute-force enumeration of all
    monotone paths (no DP).  Exponential -- tiny pairs only."""
    m, n = len(query), len(reference)
    if (m + 1) * (n + 1) > max_cells:
        raise ValueError("pair too large for exhaustive enumeration")
    if algorithm is Algorithm.BSW:
        # a path's gap-run cells must also stay in-band, which this
        # pairing-based enumeration cannot see; use graph_score for BSW
        raise ValueError("use graph_score for the banded aligner")
    p = params
    local = algorithm.is_local
    affine = algorithm.is_affine

    # A global alignment is a sequence over {D, U, L} with m+? ... generate
    # as interleavings: choose which query chars pair with which ref chars:
    # a monotone matching.  Enumerate all monotone partial matchings.
    best = 0 if local else None
    # match sets: pick k, choose increasing index sequences in both strings
    for k in range(0, min(m, n) + 1):
        for qi in itertools.combinations(range(m), k):
            for rj in itertools.combinations(range(n), k):
                sub = sum(
                    _w(p, query[i], reference[j]) for i, j in zip(qi, rj)
                )
                if local:
                    # local: free ends; every gap is interior.  Score the
                    # best contiguous window: ends trimmed at matched cells.
                    if k == 0:
                        cand = 0
                    else:
                        cand = sub + _gap_cost_interior(
                            p, affine, qi, rj
                        )
                    best = max(best, cand, 0)
                else:
                    gaps = _gap_cost_global(p, affine, qi, rj, m, n)
                    cand = sub + gaps
                    best = cand if best is None else max(best, cand)
    return int(best)


def _runs_cost(p: AlignmentParams, affine: bool, lengths) -> int:
    if affine:
        return sum(p.gap_open + ln * p.gap_extend for ln in lengths if ln)
    return sum(ln * p.gap for ln in lengths)


def _gap_cost_global(p, affine, qi, rj, m, n) -> int:
    """Unmatched chars between/around matched pairs form gap runs.  Between
    consecutive matched pairs, a run of a unmatched query chars and b
    unmatched ref chars could interleave as one..two runs; the optimal
    (and the aligners') choice is one run per side (runs never benefit
    from splitting when gap_open <= 0)."""
    q_runs, r_runs = [], []
    prev_i = prev_j = -1
    for i, j in zip(qi, rj):
        q_runs.append(i - prev_i - 1)
        r_runs.append(j - prev_j - 1)
        prev_i, prev_j = i, j
    q_runs.append(m - prev_i - 1)
    r_runs.append(n - prev_j - 1)
    return _runs_cost(p, affine, q_runs) + _runs_cost(p, affine, r_runs)


def _gap_cost_interior(p, affine, qi, rj) -> int:
    q_runs, r_runs = [], []
    for (i0, j0), (i1, j1) in zip(zip(qi, rj), list(zip(qi, rj))[1:]):
        q_runs.append(i1 - i0 - 1)
        r_runs.append(j1 - j0 - 1)
    return _runs_cost(p, affine, q_runs) + _runs_cost(p, affine, r_runs)
