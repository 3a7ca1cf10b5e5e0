"""Hirschberg O(M+N)-memory traceback: exactness vs the oracle.

The contract is A co-optimal alignment (exact score + legal lines), not
byte-equality with the stored-directions walkers (split-point ties do not
follow the per-cell `>=` chains)."""

import random

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy interpret-mode compiles; quick tier skips

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.kernels.fill import fill_last_rows_async
from tpu_align.oracle.api import align_pair
from tpu_align.traceback.hirschberg import _rescore, hirschberg_align


def _dna(rnd, lo, hi, alphabet="ACGT"):
    return "".join(rnd.choice(alphabet) for _ in range(rnd.randint(lo, hi)))


def _check_lines(res, ref, qry, local=False):
    r, m, q = res.ref_aligned, res.relation, res.query_aligned
    assert len(r) == len(m) == len(q)
    stripped_r = r.replace("_", "")
    stripped_q = q.replace("_", "")
    if local:
        assert stripped_r in ref and stripped_q in qry
    else:
        assert stripped_r == ref and stripped_q == qry
    for rc, mc, qc in zip(r, m, q):
        assert not (rc == "_" and qc == "_")
        if rc == "_" or qc == "_":
            assert mc == " "
        else:
            assert mc == ("*" if rc == qc else "|")


def test_last_row_fill_matches_numpy():
    rng = np.random.default_rng(0)
    p = AlignmentParams()
    bsz, n, m = 8, 128, 48
    refs = rng.integers(65, 69, (bsz, n)).astype(np.uint8)
    qrys = rng.integers(65, 69, (bsz, m)).astype(np.uint8)
    rlen = rng.integers(5, n + 1, bsz).astype(np.int32)
    qlen = rng.integers(5, m + 1, bsz).astype(np.int32)

    def lnw_lastrow(ref, qry):
        mm, nn = len(qry), len(ref)
        h = np.zeros((mm + 1, nn + 1), np.int64)
        h[0, :] = np.arange(nn + 1) * p.gap
        h[:, 0] = np.arange(mm + 1) * p.gap
        for i in range(1, mm + 1):
            for j in range(1, nn + 1):
                w = p.match if ref[j - 1] == qry[i - 1] else p.mismatch
                h[i, j] = max(h[i - 1, j - 1] + w, h[i - 1, j] + p.gap,
                              h[i, j - 1] + p.gap)
        return h[mm]

    sc, hlast, flast = fill_last_rows_async(
        Algorithm.LNW, p, refs, qrys, rlen, qlen, interpret=True
    )
    assert flast is None
    hlast, sc = np.asarray(hlast), np.asarray(sc)
    for b in range(bsz):
        want = lnw_lastrow(refs[b, : rlen[b]], qrys[b, : qlen[b]])
        got = np.concatenate([[qlen[b] * p.gap], hlast[: rlen[b], b]])
        assert np.array_equal(want, got), b
        assert sc[b] == want[-1]


def test_last_row_fill_affine_h_and_f():
    """ANW last-row mode captures both H and Gotoh F rows (Myers-Miller
    groundwork)."""
    rng = np.random.default_rng(1)
    p = AlignmentParams(gap_open=-4, gap_extend=-1)
    bsz, n, m = 8, 128, 32
    refs = rng.integers(65, 69, (bsz, n)).astype(np.uint8)
    qrys = rng.integers(65, 69, (bsz, m)).astype(np.uint8)
    rlen = rng.integers(5, n + 1, bsz).astype(np.int32)
    qlen = rng.integers(5, m + 1, bsz).astype(np.int32)

    def anw_lastrows(ref, qry):
        mm, nn = len(qry), len(ref)
        negi = -(10**9)
        h = np.zeros((mm + 1, nn + 1), np.int64)
        e = np.full((mm + 1, nn + 1), negi, np.int64)
        f = np.full((mm + 1, nn + 1), negi, np.int64)
        go, ge = p.gap_open, p.gap_extend
        h[0, 1:] = go + np.arange(1, nn + 1) * ge
        h[1:, 0] = go + np.arange(1, mm + 1) * ge
        for i in range(1, mm + 1):
            for j in range(1, nn + 1):
                w = p.match if ref[j - 1] == qry[i - 1] else p.mismatch
                e[i, j] = max(h[i, j - 1] + go + ge, e[i, j - 1] + ge)
                f[i, j] = max(h[i - 1, j] + go + ge, f[i - 1, j] + ge)
                h[i, j] = max(h[i - 1, j - 1] + w, e[i, j], f[i, j])
        return h[mm], f[mm]

    sc, hlast, flast = fill_last_rows_async(
        Algorithm.ANW, p, refs, qrys, rlen, qlen, interpret=True
    )
    hlast, flast, sc = np.asarray(hlast), np.asarray(flast), np.asarray(sc)
    for b in range(bsz):
        wh, wf = anw_lastrows(refs[b, : rlen[b]], qrys[b, : qlen[b]])
        assert np.array_equal(wh[1:], hlast[: rlen[b], b]), b
        assert np.array_equal(wf[1:], flast[: rlen[b], b]), b
        assert sc[b] == wh[-1]


def test_last_row_fill_rejects_local():
    with pytest.raises(ValueError):
        fill_last_rows_async(
            Algorithm.LSW, AlignmentParams(),
            np.zeros((8, 128), np.uint8), np.ones((8, 8), np.uint8),
            np.full(8, 4, np.int32), np.full(8, 4, np.int32),
            interpret=True,
        )


@pytest.mark.parametrize("seed", [7, 8, 9])
def test_hirschberg_lnw_exact(seed):
    rnd = random.Random(seed)
    p = AlignmentParams()
    for _ in range(3):
        ref, qry = _dna(rnd, 3, 200), _dna(rnd, 3, 200)
        want = align_pair(Algorithm.LNW, p, ref, qry, engine="scalar")
        got = hirschberg_align(Algorithm.LNW, p, ref, qry, leaf_q=16,
                               interpret=True)
        assert got.score == want.score, (ref, qry)
        _check_lines(got, ref, qry)
        assert _rescore(p, got.ref_aligned, got.query_aligned) == want.score


def test_hirschberg_lnw_tie_rich():
    """2-letter alphabet maximizes co-optimal ties; the split must still
    land on an optimal path."""
    rnd = random.Random(11)
    p = AlignmentParams(match=2, mismatch=-3, gap=-1)
    for _ in range(5):
        ref, qry = _dna(rnd, 10, 120, "AC"), _dna(rnd, 10, 120, "AC")
        want = align_pair(Algorithm.LNW, p, ref, qry, engine="scalar")
        got = hirschberg_align(Algorithm.LNW, p, ref, qry, leaf_q=8,
                               interpret=True)
        assert got.score == want.score
        _check_lines(got, ref, qry)
        assert _rescore(p, got.ref_aligned, got.query_aligned) == want.score


@pytest.mark.parametrize("seed", [21, 22])
def test_hirschberg_lsw_exact(seed):
    rnd = random.Random(seed)
    p = AlignmentParams()
    for _ in range(3):
        ref, qry = _dna(rnd, 5, 150, "AC"), _dna(rnd, 5, 150, "AC")
        want = align_pair(Algorithm.LSW, p, ref, qry, engine="scalar")
        got = hirschberg_align(Algorithm.LSW, p, ref, qry, leaf_q=16,
                               interpret=True)
        assert got.score == want.score
        if want.score > 0:
            _check_lines(got, ref, qry, local=True)
            assert (_rescore(p, got.ref_aligned, got.query_aligned)
                    == want.score)


def test_hirschberg_lsw_zero_score_empty_lines():
    got = hirschberg_align(Algorithm.LSW, AlignmentParams(), "AAAA", "TTTT",
                           interpret=True)
    assert got.score <= 0
    assert got.ref_aligned == got.relation == got.query_aligned == ""


def test_hirschberg_empty_sides():
    p = AlignmentParams()
    got = hirschberg_align(Algorithm.LNW, p, "ACGT", "", interpret=True)
    assert got.score == 4 * p.gap and got.query_aligned == "____"
    got = hirschberg_align(Algorithm.LNW, p, "", "AC", interpret=True)
    assert got.score == 2 * p.gap and got.ref_aligned == "__"


def test_hirschberg_long_asymmetric():
    """Deep recursion (many levels) on an asymmetric pair."""
    rnd = random.Random(33)
    p = AlignmentParams()
    ref = _dna(rnd, 120, 120)
    qry = _dna(rnd, 500, 500)
    want = align_pair(Algorithm.LNW, p, ref, qry, engine="vectorized")
    got = hirschberg_align(Algorithm.LNW, p, ref, qry, leaf_q=32,
                           interpret=True)
    assert got.score == want.score
    _check_lines(got, ref, qry)


def test_hirschberg_flips_long_reference():
    """A reference longer than the query is solved transposed (the
    VMEM-capped kernel axis gets the shorter side): scores stay exact and
    the emitted lines still belong to the ORIGINAL orientation."""
    rnd = random.Random(77)
    p = AlignmentParams()
    ref = _dna(rnd, 420, 420)  # longer side -> becomes the kernel query
    qry = _dna(rnd, 90, 90)
    for algo in (Algorithm.LNW, Algorithm.LSW):
        want = align_pair(algo, p, ref, qry, engine="vectorized")
        got = hirschberg_align(algo, p, ref, qry, leaf_q=32, interpret=True)
        assert got.score == want.score, algo
        _check_lines(got, ref, qry, local=algo is Algorithm.LSW)
    pa = AlignmentParams(gap_open=-3, gap_extend=-1)
    want = align_pair(Algorithm.ANW, pa, ref, qry, engine="vectorized")
    got = hirschberg_align(Algorithm.ANW, pa, ref, qry, leaf_q=32,
                           interpret=True)
    assert got.score == want.score
    _check_lines(got, ref, qry)


def test_engine_hirschberg_mode():
    """Engine traceback='hirschberg': same scores as the packed-dirs path,
    legal lines (paths may differ at ties)."""
    from tpu_align.io.bucketing import BucketSpec
    from tpu_align.runtime.engine import AlignmentEngine
    from tpu_align.utils import synthetic_dataset

    spec = BucketSpec(batch_pairs=64, query_multiple=128)
    ds = synthetic_dataset(6, min_len=10, max_len=80, seed=41)
    out = AlignmentEngine(
        Algorithm.LNW, bucket_spec=spec, traceback="hirschberg"
    ).run(ds)
    want = AlignmentEngine(Algorithm.LNW, bucket_spec=spec).run(ds)
    assert list(out.scores()) == list(want.scores())
    for r, (ref, qry) in zip(out.results, ds.pairs()):
        _check_lines(r, ref, qry)


def test_engine_hirschberg_rejects_banded():
    from tpu_align.runtime.engine import AlignmentEngine

    with pytest.raises(ValueError):
        AlignmentEngine(Algorithm.BSW, traceback="hirschberg")


def test_hirschberg_rejects_banded():
    with pytest.raises(NotImplementedError):
        hirschberg_align(Algorithm.BSW, AlignmentParams(), "AC", "AC",
                         interpret=True)


@pytest.mark.parametrize("go,ge", [(-4, -1), (-8, -1), (0, -1), (-2, 0)])
def test_hirschberg_anw_exact(go, ge):
    """Myers-Miller affine: exact optimal score for varied gap models,
    including go=0 (openless) and ge=0 (pure-open) edges."""
    from tpu_align.traceback.hirschberg import _rescore_affine

    rnd = random.Random(go * 31 + ge)
    p = AlignmentParams(gap_open=go, gap_extend=ge)
    for _ in range(3):
        ref, qry = _dna(rnd, 3, 100), _dna(rnd, 3, 100)
        want = align_pair(Algorithm.ANW, p, ref, qry, engine="scalar")
        got = hirschberg_align(Algorithm.ANW, p, ref, qry, leaf_q=8,
                               interpret=True)
        assert got.score == want.score, (ref, qry)
        _check_lines(got, ref, qry)
        assert (_rescore_affine(p, got.ref_aligned, got.query_aligned)
                == want.score)


def test_hirschberg_anw_gap_bridges():
    """Asymmetric lengths + strong open force the split to land INSIDE
    long vertical gaps (the type-2 Myers-Miller crossing)."""
    from tpu_align.traceback.hirschberg import _rescore_affine

    rnd = random.Random(55)
    p = AlignmentParams(gap_open=-10, gap_extend=-1)
    for _ in range(3):
        ref = _dna(rnd, 5, 25, "AC")
        qry = _dna(rnd, 80, 120, "AC")  # huge vertical-gap pressure
        want = align_pair(Algorithm.ANW, p, ref, qry, engine="scalar")
        got = hirschberg_align(Algorithm.ANW, p, ref, qry, leaf_q=4,
                               interpret=True)
        assert got.score == want.score, (ref, qry)
        _check_lines(got, ref, qry)
        assert (_rescore_affine(p, got.ref_aligned, got.query_aligned)
                == want.score)


@pytest.mark.parametrize("algo", [Algorithm.LNW, Algorithm.LSW, Algorithm.ANW])
def test_hirschberg_batch_matches_per_pair(algo):
    """Level-batching ACROSS pairs must not change any pair's output: the
    split argmaxes depend only on that pair's own (exact) last rows, so
    the batch result byte-equals the one-pair-at-a-time result."""
    from tpu_align.traceback.hirschberg import hirschberg_align_batch
    from tpu_align.utils import synthetic_dataset

    p = AlignmentParams()
    ds = synthetic_dataset(12, min_len=20, max_len=90, seed=5)
    pairs = list(ds.pairs())
    batch = hirschberg_align_batch(algo, p, pairs, leaf_q=16, interpret=True)
    for i, (ref, qry) in enumerate(pairs):
        single = hirschberg_align(algo, p, ref, qry, pair_num=i, leaf_q=16,
                                  interpret=True)
        got = batch[i]
        assert (got.score, got.ref_aligned, got.relation, got.query_aligned) \
            == (single.score, single.ref_aligned, single.relation,
                single.query_aligned), i
