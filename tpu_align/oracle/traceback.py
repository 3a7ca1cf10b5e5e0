"""Direction-matrix traceback -> alignment strings.

Behavioral spec: c++/backtrack.cpp (backtrackNW :21-81, backtrackSW :83-144,
backtrackANW :214-356) and c++/LinearSmithWaterman.cpp:116-228 for the
multi-start local mode.  Display conventions (also backtrack.cpp):
'*' match, '|' mismatch, ' ' gap in the relation line; '_' marks the gap in
the sequence line; a QUERY_DELETION consumes a query char (moves up), a
QUERY_INSERTION consumes a reference char (moves left).
"""

from __future__ import annotations

from collections import deque

from tpu_align.core import directions as D
from tpu_align.core.params import Algorithm
from tpu_align.core.result import AlignmentResult
from tpu_align.oracle.scalar import FillResult


def _walk_nw(dirs, ref: str, qry: str, r: int, c: int, stop_local: bool, h=None):
    """Shared NW/SW walk. Returns (ref_str, rel_str, qry_str) built back-to-front.

    Local stop: the reference CPU walker ends a path when the next cell's
    SCORE is 0 (c++/LinearSmithWaterman.cpp:225-227), so when `h` is given
    a zero-score cell stops the walk even if it stores a direction -- the
    "cpu" tie policy writes a gap direction into clamped-to-zero cells
    (scalar.py, mirroring LinearSmithWaterman.cpp:104-108).  Under the
    "cuda" policy h == 0 <=> dirs == NONE, so the checks coincide."""
    out_r, out_m, out_q = [], [], []
    while True:
        if stop_local:
            if (r <= 0 or c <= 0 or dirs[r, c] == D.NONE
                    or (h is not None and h[r, c] == 0)):
                break
        elif r == 0 and c == 0:
            break
        d = dirs[r, c]
        if d == D.MATCH or d == D.MISMATCH:
            out_r.append(ref[c - 1])
            out_m.append(D.REL_MATCH if d == D.MATCH else D.REL_MISMATCH)
            out_q.append(qry[r - 1])
            r -= 1
            c -= 1
        elif d == D.QUERY_DELETION:
            out_r.append(D.GAP_CHAR)
            out_m.append(D.REL_GAP)
            out_q.append(qry[r - 1])
            r -= 1
        elif d == D.QUERY_INSERTION:
            out_r.append(ref[c - 1])
            out_m.append(D.REL_GAP)
            out_q.append(D.GAP_CHAR)
            c -= 1
        else:
            raise ValueError(f"invalid direction {d} at ({r},{c})")
    return (
        "".join(reversed(out_r)),
        "".join(reversed(out_m)),
        "".join(reversed(out_q)),
    )


def _walk_anw(main_dirs, e_dirs, f_dirs, ref: str, qry: str, r: int, c: int):
    """The three-matrix state machine of backtrackANW (c++/backtrack.cpp:214-356),
    including the trailing-edge flush loops (:339-351).  Starts at (r, c)."""
    SCORING, INSERTION, DELETION = 0, 1, 2
    state = SCORING
    out_r, out_m, out_q = [], [], []
    while r != 0 and c != 0:
        if state == SCORING:
            d = main_dirs[r, c]
            if d == D.MATCH or d == D.MISMATCH:
                out_r.append(ref[c - 1])
                out_m.append(D.REL_MATCH if d == D.MATCH else D.REL_MISMATCH)
                out_q.append(qry[r - 1])
                r -= 1
                c -= 1
            elif d == D.QUERY_DELETION:
                state = DELETION
            elif d == D.QUERY_INSERTION:
                state = INSERTION
            else:
                raise ValueError(f"invalid main direction {d} at ({r},{c})")
        elif state == INSERTION:
            ed = e_dirs[r, c]
            if ed == D.GAP_OPEN:
                state = SCORING
            elif ed == D.GAP_EXTEND:
                state = INSERTION
            else:
                raise ValueError(f"invalid E direction {ed} at ({r},{c})")
            out_r.append(ref[c - 1])
            out_m.append(D.REL_GAP)
            out_q.append(D.GAP_CHAR)
            c -= 1
        else:  # DELETION
            fd = f_dirs[r, c]
            if fd == D.GAP_OPEN:
                state = SCORING
            elif fd == D.GAP_EXTEND:
                state = DELETION
            else:
                raise ValueError(f"invalid F direction {fd} at ({r},{c})")
            out_r.append(D.GAP_CHAR)
            out_m.append(D.REL_GAP)
            out_q.append(qry[r - 1])
            r -= 1
    while r > 0:
        out_r.append(D.GAP_CHAR)
        out_m.append(D.REL_GAP)
        out_q.append(qry[r - 1])
        r -= 1
    while c > 0:
        out_r.append(ref[c - 1])
        out_m.append(D.REL_GAP)
        out_q.append(D.GAP_CHAR)
        c -= 1
    return (
        "".join(reversed(out_r)),
        "".join(reversed(out_m)),
        "".join(reversed(out_q)),
    )


def _local_all_paths(fill: FillResult, ref: str, qry: str):
    """CPU LSW BACKTRACK_ALL semantics (c++/LinearSmithWaterman.cpp:126-158,
    163-228): queue every max-scoring cell scanning rows bottom-up and
    columns right-to-left, then advance paths breadth-first one cell per
    turn; a path completes when its predecessor cell's score is 0.
    Returns paths in completion order and the max score."""
    import numpy as np

    h = fill.h
    # the scan order (rows bottom-up, columns right-to-left, tracking the
    # running max) collects exactly: every cell equal to the global max,
    # in descending row-major order -- vectorized here (the Python double
    # loop was ~10 ms/pair at read scale)
    interior = h[1:, 1:]
    max_score = max(int(interior.max()), 0) if interior.size else 0
    starts: list[tuple[int, int]] = []
    if max_score > 0:
        rs, cs = np.nonzero(interior == max_score)
        starts = [(int(r) + 1, int(c) + 1)
                  for r, c in zip(rs[::-1], cs[::-1])]
    results = []
    queue = deque(("", "", "", r, c) for (r, c) in starts)
    while queue:
        sr, sm, sq, r, c = queue.popleft()
        d = fill.main_dirs[r, c]
        if d == D.MATCH or d == D.MISMATCH:
            nr, nc = r - 1, c - 1
            sr = ref[c - 1] + sr
            sm = (D.REL_MATCH if d == D.MATCH else D.REL_MISMATCH) + sm
            sq = qry[r - 1] + sq
        elif d == D.QUERY_DELETION:
            nr, nc = r - 1, c
            sr = D.GAP_CHAR + sr
            sm = D.REL_GAP + sm
            sq = qry[r - 1] + sq
        elif d == D.QUERY_INSERTION:
            nr, nc = r, c - 1
            sr = ref[c - 1] + sr
            sm = D.REL_GAP + sm
            sq = D.GAP_CHAR + sq
        else:  # NONE at a max cell can only happen if max_score == 0
            continue
        if h[nr, nc] != 0:
            queue.append((sr, sm, sq, nr, nc))
        else:
            results.append((sr, sm, sq))
    return max_score, results


def traceback_pair(
    fill: FillResult,
    reference: str,
    query: str,
    pair_num: int = 0,
    local_mode: str = "single",
    params=None,
) -> AlignmentResult:
    """Produce the alignment strings for one filled pair.

    local_mode:
      "single" -- one path; local aligners start from the first row-major
                  max cell (the CUDA host semantics,
                  cuda/LinearSmithWaterman.cu:300-327).
      "all"    -- local: every max cell yields a path (CPU BACKTRACK_ALL);
                  LNW: every co-optimal global path, BFS enumeration
                  (python/LinearNeedlemanWunsch.py:98-191; needs `params`
                  to recover co-optimal predecessors by score identity).
    """
    algo = fill.algorithm
    if algo is Algorithm.LNW:
        if local_mode == "all":
            if params is None:
                raise ValueError("LNW all-paths needs the scoring params")
            score, paths = lnw_all_paths(fill, params, reference, query)
            first = paths[0] if paths else ("", "", "")
            return AlignmentResult(
                pair_num, score, first[0], first[1], first[2],
                extra_paths=list(paths[1:]),
            )
        r, m, q = _walk_nw(
            fill.main_dirs, reference, query,
            fill.h.shape[0] - 1, fill.h.shape[1] - 1, stop_local=False,
        )
        return AlignmentResult(pair_num, fill.global_score, r, m, q)
    if algo is Algorithm.ANW:
        r, m, q = _walk_anw(
            fill.main_dirs, fill.e_dirs, fill.f_dirs, reference, query,
            fill.h.shape[0] - 1, fill.h.shape[1] - 1,
        )
        return AlignmentResult(pair_num, fill.global_score, r, m, q)
    # local aligners
    if local_mode == "all":
        score, paths = _local_all_paths(fill, reference, query)
        first = paths[0] if paths else ("", "", "")
        return AlignmentResult(
            pair_num, score, first[0], first[1], first[2],
            extra_paths=list(paths[1:]),
        )
    score, sr, sc = fill.local_max()
    r, m, q = _walk_nw(fill.main_dirs, reference, query, sr, sc,
                       stop_local=True, h=fill.h)
    return AlignmentResult(pair_num, score, r, m, q)


def lnw_all_paths(
    fill: FillResult,
    params,
    reference: str,
    query: str,
    max_paths: int | None = None,
):
    """Enumerate every co-optimal global alignment, breadth-first.

    Behavioral spec: python/LinearNeedlemanWunsch.py:68-191 -- a boolean
    3-plane predecessor matrix keeps ALL co-optimal predecessors (corner /
    left / up, recorded by score equality) and a BFS queue replays every
    branch, emitting completed paths in queue order (corner first, then
    reference-consuming gap, then query-consuming gap).  The reference's
    enumeration indexes the predecessor planes with -1 at the borders (a
    latent wrap-around); here border cells take their only legal move.

    Returns (score, [(ref_line, rel_line, qry_line), ...]).  Path counts
    are exponential in the worst case; max_paths truncates enumeration.
    """
    from collections import deque

    h = fill.h
    m, n = h.shape[0] - 1, h.shape[1] - 1
    out = []
    queue = deque([(n, m, "", "", "")])
    while queue:
        c, r, sr, sm, sq = queue.popleft()
        if r == 0 and c == 0:
            out.append((sr, sm, sq))
            if max_paths is not None and len(out) >= max_paths:
                break
            continue
        if r > 0 and c > 0:
            # co-optimal predecessors by score identity (reference :86-90)
            w = (params.match if reference[c - 1] == query[r - 1]
                 else params.mismatch)
            corner = h[r, c] == h[r - 1, c - 1] + w
            left = h[r, c] == h[r, c - 1] + params.gap
            up = h[r, c] == h[r - 1, c] + params.gap
            if corner:
                rel = D.REL_MATCH if reference[c - 1] == query[r - 1] else D.REL_MISMATCH
                queue.append((c - 1, r - 1, reference[c - 1] + sr, rel + sm,
                              query[r - 1] + sq))
            if left:
                queue.append((c - 1, r, reference[c - 1] + sr, D.REL_GAP + sm,
                              D.GAP_CHAR + sq))
            if up:
                queue.append((c, r - 1, D.GAP_CHAR + sr, D.REL_GAP + sm,
                              query[r - 1] + sq))
        elif c > 0:  # top border: only reference-consuming moves remain
            queue.append((c - 1, r, reference[c - 1] + sr, D.REL_GAP + sm,
                          D.GAP_CHAR + sq))
        else:  # left border: only query-consuming moves remain
            queue.append((c, r - 1, D.GAP_CHAR + sr, D.REL_GAP + sm,
                          query[r - 1] + sq))
    return int(h[m, n]), out
