"""Oracle tests: scalar vs vectorized bit-parity, hand-checked examples,
and self-consistency properties (path score == matrix score)."""

import numpy as np
import pytest

from tpu_align.core import directions as D
from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.oracle import align_pair, fill_scalar, fill_vectorized, traceback_pair

from conftest import random_dna

P = AlignmentParams()  # match=3 mismatch=-1 gap=-2 open=-4 extend=-1


def rescore_global(res, params):
    """Recompute the score from the alignment strings (linear gap)."""
    s = 0
    for rc, mc, qc in zip(res.ref_aligned, res.relation, res.query_aligned):
        if mc == "*":
            assert rc == qc != "_"
            s += params.match
        elif mc == "|":
            assert rc != qc and "_" not in (rc, qc)
            s += params.mismatch
        else:
            assert mc == " " and ("_" in (rc, qc))
            s += params.gap
    return s


def rescore_affine(res, params):
    s = 0
    prev = None  # 'r' gap-in-ref run, 'q' gap-in-query run
    for rc, mc, qc in zip(res.ref_aligned, res.relation, res.query_aligned):
        if mc == "*":
            s += params.match
            prev = None
        elif mc == "|":
            s += params.mismatch
            prev = None
        else:
            cur = "r" if rc == "_" else "q"
            s += params.gap_extend
            if cur != prev:
                s += params.gap_open
            prev = cur
    return s


class TestHandChecked:
    def test_lnw_identical(self):
        res = align_pair(Algorithm.LNW, P, "ATCG", "ATCG")
        assert res.score == 12
        assert (res.ref_aligned, res.relation, res.query_aligned) == (
            "ATCG", "****", "ATCG")

    def test_lnw_textbook(self):
        # python/testing.py's example: ref "ABxxxCDE" vs qry "ABCDE",
        # match 5, mismatch -2, gap -3 -> AB___CDE alignment, score 16
        p = AlignmentParams(match=5, mismatch=-2, gap=-3)
        res = align_pair(Algorithm.LNW, p, "ABxxxCDE", "ABCDE")
        assert res.score == 16
        assert res.ref_aligned == "ABxxxCDE"
        assert res.query_aligned == "AB___CDE"
        assert res.relation == "**   ***"

    def test_lnw_empty_query(self):
        res = align_pair(Algorithm.LNW, P, "ATC", "")
        assert res.score == 3 * P.gap
        assert res.ref_aligned == "ATC"
        assert res.query_aligned == "___"

    def test_lsw_disjoint_is_zero(self):
        res = align_pair(Algorithm.LSW, P, "AAAA", "TTTT")
        # all mismatches are negative, so the best local score is 0 and the
        # output block has empty alignment lines (LinearSmithWaterman.cpp:253-257)
        assert res.score == 0
        assert res.ref_aligned == res.relation == res.query_aligned == ""

    def test_lsw_embedded_motif(self):
        res = align_pair(Algorithm.LSW, P, "TTTTACGTTTTT", "GGACGGG")
        assert res.score == 9  # "ACG" exact local match
        assert res.ref_aligned == "ACG"
        assert res.relation == "***"

    def test_anw_gap_run_preferred(self):
        # Affine scoring should prefer one long gap over scattered gaps.
        p = AlignmentParams(match=2, mismatch=-3, gap_open=-4, gap_extend=-1)
        res = align_pair(Algorithm.ANW, p, "ACGTACGT", "ACGT")
        assert res.score == 4 * 2 + (-4 + 4 * -1)
        assert "____" in res.query_aligned

    def test_anw_border_scores(self):
        # H[i][0] = open + i*extend (AffineNeedlemanWunsch.cpp:43-53)
        fill = fill_scalar(Algorithm.ANW, P, "ACG", "")
        assert list(fill.h[0]) == [0, P.gap_open + P.gap_extend,
                                   P.gap_open + 2 * P.gap_extend,
                                   P.gap_open + 3 * P.gap_extend]

    def test_bsw_band_excludes_far_matches(self):
        p = AlignmentParams(band=2)
        # the only match lies far off-diagonal, outside a band of 2
        res_banded = align_pair(Algorithm.BSW, p, "TTTTTTTTAC", "ACGGGGGGGG")
        res_full = align_pair(Algorithm.LSW, p, "TTTTTTTTAC", "ACGGGGGGGG")
        assert res_full.score == 6
        assert res_banded.score < res_full.score


class TestScalarVsVectorized:
    @pytest.mark.parametrize("algo", list(Algorithm))
    def test_bit_parity_random(self, rng, algo):
        for _ in range(25):
            ref = random_dna(rng, 1, 30)
            qry = random_dna(rng, 1, 30)
            a = fill_scalar(algo, P, ref, qry)
            b = fill_vectorized(algo, P, ref, qry)
            np.testing.assert_array_equal(a.h, b.h, err_msg=f"{algo} H {ref} {qry}")
            np.testing.assert_array_equal(
                a.main_dirs, b.main_dirs, err_msg=f"{algo} dirs {ref} {qry}")
            if algo is Algorithm.ANW:
                np.testing.assert_array_equal(a.e, b.e)
                np.testing.assert_array_equal(a.f, b.f)
                np.testing.assert_array_equal(a.e_dirs, b.e_dirs)
                np.testing.assert_array_equal(a.f_dirs, b.f_dirs)

    @pytest.mark.parametrize("algo", [Algorithm.LSW, Algorithm.BSW])
    def test_bit_parity_cpu_tie_policy(self, rng, algo):
        for _ in range(10):
            ref = random_dna(rng, 1, 25)
            qry = random_dna(rng, 1, 25)
            a = fill_scalar(algo, P, ref, qry, tie_policy="cpu")
            b = fill_vectorized(algo, P, ref, qry, tie_policy="cpu")
            np.testing.assert_array_equal(a.h, b.h)
            np.testing.assert_array_equal(a.main_dirs, b.main_dirs)

    def test_similar_sequences(self, rng):
        # realistic case: query is a mutated copy of the reference
        for _ in range(10):
            ref = random_dna(rng, 40, 60)
            qry = "".join(
                c if rng.random() > 0.1 else rng.choice("ATCG") for c in ref)
            for algo in Algorithm:
                a = fill_scalar(algo, P, ref, qry)
                b = fill_vectorized(algo, P, ref, qry)
                np.testing.assert_array_equal(a.h, b.h)
                np.testing.assert_array_equal(a.main_dirs, b.main_dirs)


class TestProperties:
    def test_lnw_path_rescores(self, rng):
        for _ in range(20):
            ref, qry = random_dna(rng, 1, 30), random_dna(rng, 1, 30)
            res = align_pair(Algorithm.LNW, P, ref, qry)
            assert rescore_global(res, P) == res.score
            assert res.ref_aligned.replace("_", "") == ref
            assert res.query_aligned.replace("_", "") == qry

    def test_lsw_path_rescores_and_is_substring(self, rng):
        for _ in range(20):
            ref, qry = random_dna(rng, 1, 30), random_dna(rng, 1, 30)
            res = align_pair(Algorithm.LSW, P, ref, qry)
            assert rescore_global(res, P) == res.score
            assert res.ref_aligned.replace("_", "") in ref
            assert res.query_aligned.replace("_", "") in qry

    def test_anw_path_rescores(self, rng):
        for _ in range(20):
            ref, qry = random_dna(rng, 1, 30), random_dna(rng, 1, 30)
            res = align_pair(Algorithm.ANW, P, ref, qry)
            assert rescore_affine(res, P) == res.score
            assert res.ref_aligned.replace("_", "") == ref
            assert res.query_aligned.replace("_", "") == qry

    def test_anw_equals_lnw_when_open_is_zero(self, rng):
        p_affine = AlignmentParams(gap_open=0, gap_extend=-2)
        p_linear = AlignmentParams(gap=-2)
        for _ in range(15):
            ref, qry = random_dna(rng, 1, 25), random_dna(rng, 1, 25)
            a = fill_scalar(Algorithm.ANW, p_affine, ref, qry)
            b = fill_scalar(Algorithm.LNW, p_linear, ref, qry)
            np.testing.assert_array_equal(a.h, b.h)

    def test_bsw_wide_band_equals_lsw(self, rng):
        for _ in range(15):
            ref, qry = random_dna(rng, 1, 25), random_dna(rng, 1, 25)
            p = AlignmentParams(band=64)
            a = fill_scalar(Algorithm.BSW, p, ref, qry)
            b = fill_scalar(Algorithm.LSW, p, ref, qry)
            np.testing.assert_array_equal(a.h, b.h)
            np.testing.assert_array_equal(a.main_dirs, b.main_dirs)

    def test_lsw_all_paths_mode(self, rng):
        for _ in range(10):
            ref, qry = random_dna(rng, 5, 20), random_dna(rng, 5, 20)
            res = align_pair(Algorithm.LSW, P, ref, qry, local_mode="all")
            single = align_pair(Algorithm.LSW, P, ref, qry, local_mode="single")
            assert res.score == single.score
            if res.score > 0:
                for path in [(res.ref_aligned, res.relation, res.query_aligned),
                             *res.extra_paths]:
                    assert path[0].replace("_", "") in ref

    def test_output_block_format(self):
        res = align_pair(Algorithm.LNW, P, "AT", "AT", pair_num=7)
        assert res.block() == "7 | 6\nAT\n**\nAT\n"


def test_fill_vectorized_batch_bit_identical():
    """The cross-pair batched fills (the all-paths fast path) must be
    bit-identical to the per-pair vectorized oracle, including the
    strict |row-col| < band edge for BSW."""
    import numpy as np

    from tpu_align.oracle.vectorized import (fill_vectorized,
                                             fill_vectorized_batch)
    from tpu_align.utils import synthetic_dataset

    ds = synthetic_dataset(40, min_len=3, max_len=60, seed=9)
    pairs = [ds.pair(i) for i in range(len(ds))]
    cases = [
        (Algorithm.LNW, AlignmentParams()),
        (Algorithm.LSW, AlignmentParams()),
        (Algorithm.BSW, AlignmentParams(band=5)),
        (Algorithm.BSW, AlignmentParams(band=1)),
    ]
    for algo, p in cases:
        batch = fill_vectorized_batch(algo, p, pairs, chunk=16)
        for k, (r, q) in enumerate(pairs):
            one = fill_vectorized(algo, p, r, q)
            assert np.array_equal(batch[k].h, one.h), (algo, k)
            assert np.array_equal(batch[k].main_dirs, one.main_dirs), (algo, k)


def test_local_all_paths_start_scan_vectorized():
    """The vectorized max-cell scan must keep the BFS start ordering
    (rows bottom-up, columns right-to-left) of the Python scan spec."""
    from tpu_align.oracle.api import align_pair
    from tpu_align.utils import synthetic_dataset

    ds = synthetic_dataset(30, min_len=4, max_len=30, seed=13, alphabet="AT")
    for i in range(len(ds)):
        a = align_pair(Algorithm.LSW, AlignmentParams(), *ds.pair(i),
                       engine="scalar", local_mode="all")
        b = align_pair(Algorithm.LSW, AlignmentParams(), *ds.pair(i),
                       engine="vectorized", local_mode="all")
        assert a.block() == b.block()
        assert a.extra_paths == b.extra_paths


def test_cpu_tie_policy_local_walk_stops_at_zero_score():
    """The reference CPU walker ends a local path when the next cell's
    SCORE reaches 0 (c++/LinearSmithWaterman.cpp:225-227).  The "cpu"
    tie policy stores a gap direction in clamped-to-zero cells
    (LinearSmithWaterman.cpp:104-108), so stopping on dir==NONE alone
    walked PAST the zero cell, emitting a longer net-zero prefix
    (score still re-scores -- the divergence is byte parity)."""
    from tpu_align.oracle.api import align_pair

    p = AlignmentParams(match=3, mismatch=-3, gap=-4)
    r = align_pair(Algorithm.LSW, p, "ATTTTAATTAAT", "AATAAATTATATA",
                   engine="scalar", tie_policy="cpu")
    assert r.score == 17
    # pre-fix walk emitted ('TTAATTA_AT', '*|***** **', 'TAAATTATAT')
    assert (r.ref_aligned, r.relation, r.query_aligned) == (
        "AATTA_AT", "***** **", "AATTATAT")
    # cuda policy is untouched (h == 0 <=> dir == NONE there)
    c = align_pair(Algorithm.LSW, p, "ATTTTAATTAAT", "AATAAATTATATA",
                   engine="scalar", tie_policy="cuda")
    assert c.score == 17
