"""Pedagogical demo: the five aligners on toy strings.

Parity with the reference's python/testing.py driver, which instantiates
each aligner on small examples and prints the colored DP matrices and all
optimal alignments (python/testing.py:12-34 documents the algorithm family
relationships: LCS is NW with no penalties; SW is NW with clamping at 0;
Gotoh splits the gap cost into open+extend; banded SW restricts to a
diagonal band).

Run: python examples/demo.py
"""

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.oracle.api import align_pair
from tpu_align.oracle.lcs import lcs
from tpu_align.oracle.scalar import fill_scalar
from tpu_align.utils.pretty import print_fill


def main() -> None:
    reference, query = "GCATGCG", "GATTACA"
    params = AlignmentParams(match=3, mismatch=-1, gap=-2,
                             gap_open=-4, gap_extend=-1, band=3)

    for algo in Algorithm:
        print(f"\n==== {algo.name}: {reference} vs {query} ====")
        fill = fill_scalar(algo, params, reference, query)
        print_fill(fill, reference, query)
        result = align_pair(algo, params, reference, query,
                            local_mode="all" if algo.is_local else "single")
        print(result.block())

    print("\n==== LNW all co-optimal paths (ABxxxCDE vs ABCDE) ====")
    from tpu_align.oracle import lnw_all_paths

    p2 = AlignmentParams(match=5, mismatch=-2, gap=-3)
    fill = fill_scalar(Algorithm.LNW, p2, "ABxxxCDE", "ABCDE")
    score, paths = lnw_all_paths(fill, p2, "ABxxxCDE", "ABCDE")
    print(f"score {score}; {len(paths)} co-optimal path(s):")
    for (r, m, q) in paths:
        print(f"  {r}\n  {m}\n  {q}\n")

    print("\n==== LCS (no-penalty special case) ====")
    length, paths = lcs(reference, query, dedup=True)
    print(f"length {length}; all co-optimal subsequences:")
    for p in paths:
        print(" ", p)


if __name__ == "__main__":
    main()
