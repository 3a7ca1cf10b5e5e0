"""Cell-at-a-time NumPy oracle: the auditable statement of the reference
recurrences and tie-break semantics.

Recurrences and tie-breaks (evidence in the reference):

LNW (c++/LinearNeedlemanWunsch.cpp:89-135): borders H[i][0]=i*gap (dir
QUERY_DELETION), H[0][j]=j*gap (dir QUERY_INSERTION); interior
    H = max(diag + w, up + gap, left + gap)
with direction priority on ties INSERTION >= DELETION >= diagonal, realized
by two chained `__vibmax_s32` calls whose predicate is `first >= second`
(LinearNeedlemanWunsch.cpp:122-126, FakeDPX.cpp:145-153).  The batched CUDA
end-state kernel uses the identical chain on packed s16x2 lanes
(cuda/LNW/LinearNeedlemanWunschV19.cu:255-261).

LSW (cuda/LinearSmithWaterman.cu:116-137 -- the CUDA kernel is the canonical
tie order for the golden outputs): zero borders;
    H = max(0, diag + w, up + gap, left + gap)
direction chain: ins vs diag (pred -> INSERTION), del vs winner (pred ->
DELETION), 0 vs winner (pred -> NONE).  Priority on ties:
NONE(0) >= DELETION >= INSERTION >= diagonal.  (The CPU LSW,
c++/LinearSmithWaterman.cpp:98-108, resolves ties in a different order --
deletion > insertion > diagonal without the 0-tie -> NONE rule; selectable
via tie_policy="cpu".)

ANW (c++/AffineNeedlemanWunsch.cpp:167-242): Gotoh three-matrix recurrence
    F[i][j] = max(H[i-1][j] + open + extend, F[i-1][j] + extend)   (deletion)
    E[i][j] = max(H[i][j-1] + open + extend, E[i][j-1] + extend)   (insertion)
    H[i][j] = max(diag + w, F[i][j], E[i][j])
with GAP_OPEN winning E/F ties (pred of `open >= extend`), row 1 / col 1
forced to GAP_OPEN (AffineNeedlemanWunsch.cpp:184-214), H-direction priority
INSERTION >= DELETION >= diagonal, and borders H[i][0] = open + i*extend
(dir QUERY_DELETION), H[0][j] = open + j*extend (dir QUERY_INSERTION)
(AffineNeedlemanWunsch.cpp:43-53).  E/F borders are never read because of
the row-1/col-1 GAP_OPEN special case.

BSW (python/LinearBandedSmithWaterman.py:71 is the band spec; the C++ BSW is
a known-buggy prototype): LSW restricted to columns
    max(1, row - band + 1) .. min(row + band, num_cols) - 1   [inclusive]
i.e. the Python loop `range(1 + max(0, row - BAND), min(row + BAND, n + 1))`.
Cells outside the band keep score 0 / direction NONE.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from tpu_align.core import directions as D
from tpu_align.core.params import Algorithm, AlignmentParams


@dataclasses.dataclass
class FillResult:
    """Dense DP fill output for one pair (row 0/col 0 are the DP borders)."""

    algorithm: Algorithm
    h: np.ndarray  # (m+1, n+1) int32 main scores (m=len(query), n=len(ref))
    main_dirs: np.ndarray  # (m+1, n+1) uint8 direction codes (D.NONE..D.QUERY_INSERTION)
    e: np.ndarray | None = None  # affine insertion matrix
    f: np.ndarray | None = None  # affine deletion matrix
    e_dirs: np.ndarray | None = None  # uint8 D.GAP_OPEN / D.GAP_EXTEND
    f_dirs: np.ndarray | None = None

    @property
    def global_score(self) -> int:
        return int(self.h[-1, -1])

    def local_max(self) -> tuple[int, int, int]:
        """(score, row, col) of the first strict maximum in row-major scan,
        starting from 0 at cell (0,0) -- the CUDA host argmax semantics
        (cuda/LinearSmithWaterman.cu:300-311)."""
        idx = int(np.argmax(self.h))  # argmax returns first occurrence
        r, c = divmod(idx, self.h.shape[1])
        score = int(self.h[r, c])
        if score <= 0:
            return 0, 0, 0
        return score, r, c


def _sub_weight(qc: str, rc: str, p: AlignmentParams) -> tuple[int, int]:
    if qc == rc:
        return p.match, D.MATCH
    return p.mismatch, D.MISMATCH


def fill_scalar(
    algorithm: Algorithm,
    params: AlignmentParams,
    reference: str,
    query: str,
    tie_policy: str = "cuda",
) -> FillResult:
    """Fill the DP matrices one cell at a time (ground-truth oracle)."""
    if algorithm is Algorithm.LNW:
        return _fill_lnw(params, reference, query)
    if algorithm is Algorithm.LSW:
        return _fill_lsw(params, reference, query, band=None, tie_policy=tie_policy)
    if algorithm is Algorithm.BSW:
        return _fill_lsw(params, reference, query, band=params.band, tie_policy=tie_policy)
    if algorithm is Algorithm.ANW:
        return _fill_anw(params, reference, query)
    raise ValueError(f"unknown algorithm {algorithm}")


def _fill_lnw(p: AlignmentParams, ref: str, qry: str) -> FillResult:
    m, n = len(qry), len(ref)
    h = np.zeros((m + 1, n + 1), np.int32)
    dirs = np.zeros((m + 1, n + 1), np.uint8)
    h[1:, 0] = np.arange(1, m + 1) * p.gap
    h[0, 1:] = np.arange(1, n + 1) * p.gap
    dirs[1:, 0] = D.QUERY_DELETION
    dirs[0, 1:] = D.QUERY_INSERTION
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            w, d = _sub_weight(qry[i - 1], ref[j - 1], p)
            mm = h[i - 1, j - 1] + w
            dele = h[i - 1, j] + p.gap
            ins = h[i, j - 1] + p.gap
            best = mm
            if dele >= best:
                best, d = dele, D.QUERY_DELETION
            if ins >= best:
                best, d = ins, D.QUERY_INSERTION
            h[i, j] = best
            dirs[i, j] = d
    return FillResult(Algorithm.LNW, h, dirs)


def _fill_lsw(
    p: AlignmentParams,
    ref: str,
    qry: str,
    band: int | None,
    tie_policy: str,
) -> FillResult:
    m, n = len(qry), len(ref)
    h = np.zeros((m + 1, n + 1), np.int32)
    dirs = np.zeros((m + 1, n + 1), np.uint8)
    algo = Algorithm.LSW if band is None else Algorithm.BSW
    for i in range(1, m + 1):
        if band is None:
            lo, hi = 1, n + 1
        else:
            # python/LinearBandedSmithWaterman.py:71
            lo, hi = 1 + max(0, i - band), min(i + band, n + 1)
        for j in range(lo, hi):
            w, d = _sub_weight(qry[i - 1], ref[j - 1], p)
            mm = h[i - 1, j - 1] + w
            dele = h[i - 1, j] + p.gap
            ins = h[i, j - 1] + p.gap
            if tie_policy == "cuda":
                # cuda/LinearSmithWaterman.cu:126-137
                best = mm
                if ins >= best:
                    best, d = ins, D.QUERY_INSERTION
                if dele >= best:
                    best, d = dele, D.QUERY_DELETION
                if 0 >= best:
                    best, d = 0, D.NONE
            elif tie_policy == "cpu":
                # c++/LinearSmithWaterman.cpp:98-108
                best = max(0, mm, dele, ins)
                if mm < 0 and dele < 0 and ins < 0:
                    d = D.NONE
                elif dele == best:
                    d = D.QUERY_DELETION
                elif ins == best:
                    d = D.QUERY_INSERTION
                # else keep diagonal d
                best = max(0, best)
            else:
                raise ValueError(f"unknown tie_policy {tie_policy!r}")
            h[i, j] = best
            dirs[i, j] = d
    return FillResult(algo, h, dirs)


def _fill_anw(p: AlignmentParams, ref: str, qry: str) -> FillResult:
    m, n = len(qry), len(ref)
    neg = -(10**9) // 4  # effectively -inf; never propagates to a read cell
    h = np.zeros((m + 1, n + 1), np.int32)
    e = np.full((m + 1, n + 1), neg, np.int32)
    f = np.full((m + 1, n + 1), neg, np.int32)
    dirs = np.zeros((m + 1, n + 1), np.uint8)
    e_dirs = np.zeros((m + 1, n + 1), np.uint8)
    f_dirs = np.zeros((m + 1, n + 1), np.uint8)
    go, ge = p.gap_open, p.gap_extend
    h[1:, 0] = go + np.arange(1, m + 1) * ge
    h[0, 1:] = go + np.arange(1, n + 1) * ge
    dirs[1:, 0] = D.QUERY_DELETION
    dirs[0, 1:] = D.QUERY_INSERTION
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            # F: query-deletion matrix (gap in reference, move down)
            if i == 1:
                f[i, j] = h[i - 1, j] + go + ge
                f_dirs[i, j] = D.GAP_OPEN
            else:
                open_f = h[i - 1, j] + go + ge
                ext_f = f[i - 1, j] + ge
                if open_f >= ext_f:
                    f[i, j], f_dirs[i, j] = open_f, D.GAP_OPEN
                else:
                    f[i, j], f_dirs[i, j] = ext_f, D.GAP_EXTEND
            # E: query-insertion matrix (gap in query, move right)
            if j == 1:
                e[i, j] = h[i, j - 1] + go + ge
                e_dirs[i, j] = D.GAP_OPEN
            else:
                open_e = h[i, j - 1] + go + ge
                ext_e = e[i, j - 1] + ge
                if open_e >= ext_e:
                    e[i, j], e_dirs[i, j] = open_e, D.GAP_OPEN
                else:
                    e[i, j], e_dirs[i, j] = ext_e, D.GAP_EXTEND
            # H: main matrix
            w, d = _sub_weight(qry[i - 1], ref[j - 1], p)
            mm = h[i - 1, j - 1] + w
            best = mm
            if f[i, j] >= best:
                best, d = f[i, j], D.QUERY_DELETION
            if e[i, j] >= best:
                best, d = e[i, j], D.QUERY_INSERTION
            h[i, j] = best
            dirs[i, j] = d
    return FillResult(Algorithm.ANW, h, dirs, e, f, e_dirs, f_dirs)
