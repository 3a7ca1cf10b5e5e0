"""Pallas fill kernel vs NumPy oracle: scores, traceback starts, and full
alignment strings must agree for all four algorithms.

Runs in Pallas interpreter mode on the CPU backend (tests/conftest.py);
the identical kernel code compiles for TPU.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy interpret-mode compiles; quick tier skips

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.io import PairDataset, BucketSpec, bucketize
from tpu_align.kernels import fill_bucket
from tpu_align.oracle.api import align_pair
from tpu_align.oracle.scalar import fill_scalar
from tpu_align.traceback import traceback_bucket
from tests.conftest import random_dna

ALGOS = [Algorithm.LNW, Algorithm.LSW, Algorithm.ANW, Algorithm.BSW]
PARAMS = AlignmentParams()  # reference defaults: 3/-1/-2, open -4 ext -1


def _run_and_compare(algo, params, pairs, local_mode="single"):
    ds = PairDataset.from_pairs(pairs)
    # coarse buckets: one kernel shape per test (tracing in interpret mode
    # costs ~20s per distinct shape)
    spec = BucketSpec(batch_pairs=64, query_multiple=64)
    buckets = bucketize(ds, spec)
    got = {}
    for b in buckets:
        fill = fill_bucket(algo, params, b.ref_tokens, b.qry_tokens,
                           b.ref_len, b.qry_len)
        for res in traceback_bucket(algo, b, fill, params):
            got[res.pair_num] = res
    assert sorted(got) == list(range(len(pairs)))
    for i, (ref, qry) in enumerate(pairs):
        want = align_pair(algo, params, ref, qry, pair_num=i, engine="scalar",
                          local_mode=local_mode)
        r = got[i]
        assert r.score == want.score, (
            f"{algo} pair {i}: score {r.score} != {want.score} "
            f"ref={ref!r} qry={qry!r}"
        )
        assert (r.ref_aligned, r.relation, r.query_aligned) == (
            want.ref_aligned, want.relation, want.query_aligned
        ), f"{algo} pair {i}: ref={ref!r} qry={qry!r}\n{r.block()}\n{want.block()}"


@pytest.mark.parametrize("algo", ALGOS)
def test_kernel_matches_oracle_random(rng, algo):
    pairs = [(random_dna(rng, 1, 60), random_dna(rng, 1, 40)) for _ in range(12)]
    _run_and_compare(algo, PARAMS, pairs)


@pytest.mark.parametrize("algo", ALGOS)
def test_kernel_matches_oracle_edge_pairs(algo):
    pairs = [
        ("A", "A"),
        ("A", "T"),
        ("ACGT", "ACGT"),
        ("AAAA", "TTTT"),
        ("ACGTACGTACGT", "ACG"),
        ("ACG", "ACGTACGTACGT"),
        ("A" * 129, "A" * 130),  # crosses the 128-lane boundary
    ]
    _run_and_compare(algo, PARAMS, pairs)


@pytest.mark.parametrize("algo", ALGOS)
def test_kernel_alt_params(rng, algo):
    params = AlignmentParams(match=5, mismatch=-2, gap=-3, gap_open=-6,
                             gap_extend=-2, band=5)
    pairs = [(random_dna(rng, 1, 50), random_dna(rng, 1, 50)) for _ in range(10)]
    _run_and_compare(algo, params, pairs)


def test_scores_only_fast_path(rng):
    pairs = [(random_dna(rng, 1, 50), random_dna(rng, 1, 50)) for _ in range(8)]
    ds = PairDataset.from_pairs(pairs)
    for algo in ALGOS:
        for b in bucketize(ds, BucketSpec(batch_pairs=8, query_multiple=64)):
            fill = fill_bucket(algo, PARAMS, b.ref_tokens, b.qry_tokens,
                               b.ref_len, b.qry_len, with_traceback=False)
            assert fill.dirs is None
            for row in range(b.num_real):
                i = int(b.pair_ids[row])
                want = align_pair(algo, PARAMS, *pairs[i], engine="scalar")
                assert int(fill.scores[row]) == want.score


def test_local_start_cell_semantics(rng):
    """Kernel argmax must be the first row-major maximum
    (cuda/LinearSmithWaterman.cu:300-311)."""
    pairs = [(random_dna(rng, 10, 80), random_dna(rng, 10, 80)) for _ in range(8)]
    ds = PairDataset.from_pairs(pairs)
    for b in bucketize(ds, BucketSpec(batch_pairs=16, query_multiple=96)):
        fill = fill_bucket(Algorithm.LSW, PARAMS, b.ref_tokens, b.qry_tokens,
                           b.ref_len, b.qry_len, with_traceback=False)
        for row in range(b.num_real):
            i = int(b.pair_ids[row])
            want = fill_scalar(Algorithm.LSW, PARAMS, *pairs[i]).local_max()
            got = (int(fill.scores[row]), int(fill.start_row[row]),
                   int(fill.start_col[row]))
            assert got == want, f"pair {i}: {got} != {want}"


def test_long_sequences(rng):
    """Long-reference support: the query-block grid streams the fill and the
    raised VMEM budget covers wide rows (tested to 2kbp on hardware)."""
    pairs = [(random_dna(rng, 500, 512), random_dna(rng, 500, 512))
             for _ in range(2)]
    _run_and_compare(Algorithm.LNW, PARAMS, pairs)


def test_small_batch_padding(rng):
    """Batches are padded to full 128-lane tiles internally; tiny buckets
    must still produce correct results for their real rows."""
    pairs = [(random_dna(rng, 4, 30), random_dna(rng, 4, 30))
             for _ in range(3)]
    _run_and_compare(Algorithm.ANW, PARAMS, pairs)


def test_dense_bsw_band_mask_before_scan():
    """Regression: the dense BSW path must mask out-of-band candidates
    BEFORE the insertion prefix-max scan -- phantom values computed from a
    masked-to-zero previous row at out-of-band columns must not leak into
    in-band cells (band spec: out-of-band cells are never computed,
    python/LinearBandedSmithWaterman.py:71)."""
    params = AlignmentParams(band=2)
    # The original failing case: fill_bucket(BSW, band=2) returned 1 vs
    # oracle 0 on this pair.
    pairs = [("CTCCCC", "AAATAA")]
    _run_and_compare(Algorithm.BSW, params, pairs)


def test_dense_bsw_sparse_alphabet_fuzz(rng):
    """Banded fuzz over the dense fill_bucket path with a 2-letter alphabet
    (tie- and phantom-rich) and a narrow band."""
    params = AlignmentParams(band=3)
    pairs = [
        (random_dna(rng, 3, 40, alphabet="AC"),
         random_dna(rng, 3, 40, alphabet="AC"))
        for _ in range(12)
    ]
    _run_and_compare(Algorithm.BSW, params, pairs)


# ---------------------------------------------------------------------------
# Stagger-wavefront kernel (kernels/stagger.py)
# ---------------------------------------------------------------------------

from tpu_align.kernels.stagger import fill_stagger_bucket  # noqa: E402

STAGGER_ALGOS = [Algorithm.LNW, Algorithm.LSW, Algorithm.ANW]


def _run_and_compare_stagger(algo, params, pairs, stripe_s=32):
    ds = PairDataset.from_pairs(pairs)
    spec = BucketSpec(batch_pairs=64, query_multiple=64)
    got = {}
    for b in bucketize(ds, spec):
        fill = fill_stagger_bucket(algo, params, b.ref_tokens, b.qry_tokens,
                                   b.ref_len, b.qry_len, stripe_s=stripe_s)
        for res in traceback_bucket(algo, b, fill, params):
            got[res.pair_num] = res
    for i, (ref, qry) in enumerate(pairs):
        want = align_pair(algo, params, ref, qry, pair_num=i, engine="scalar")
        r = got[i]
        assert r.block() == want.block(), (
            f"{algo} pair {i}: ref={ref!r} qry={qry!r}\n{r.block()}\n"
            f"{want.block()}"
        )


@pytest.mark.parametrize("algo", STAGGER_ALGOS)
def test_stagger_matches_oracle_random(rng, algo):
    pairs = [(random_dna(rng, 1, 70), random_dna(rng, 1, 70))
             for _ in range(10)]
    _run_and_compare_stagger(algo, PARAMS, pairs)


@pytest.mark.parametrize("algo", STAGGER_ALGOS)
def test_stagger_edge_pairs(algo):
    pairs = [
        ("A", "A"),
        ("A", "T"),
        ("AAAA", "TTTT"),
        ("ACGTACGTACGT", "ACG"),
        ("ACG", "ACGTACGTACGT"),
        ("A" * 129, "A" * 70),  # crosses the 128-lane boundary
        ("ACGT" * 12, "ACGT" * 12),  # query crosses the stripe boundary
    ]
    _run_and_compare_stagger(algo, PARAMS, pairs)


@pytest.mark.parametrize("algo", STAGGER_ALGOS)
def test_stagger_tie_rich_sparse_alphabet(rng, algo):
    """Tie-chain parity on 2-letter sequences (maximal `>=` pressure)."""
    pairs = [(random_dna(rng, 2, 40, alphabet="AC"),
              random_dna(rng, 2, 40, alphabet="AC")) for _ in range(10)]
    _run_and_compare_stagger(algo, PARAMS, pairs)


def test_stagger_lsw_huge_weights_disable_enc(rng):
    """A match weight large enough that (score << SH) would overflow int32
    forces the LSW capture onto the non-encoded running-max branch
    (use_enc False), which is otherwise never exercised at DNA-scale
    weights.  Parity must hold there too (incl. the G-space restore)."""
    from tpu_align.kernels.stagger import _make_stagger_kernel  # noqa: F401

    params = AlignmentParams(match=3000000, mismatch=-1000000, gap=-2000000)
    pairs = [(random_dna(rng, 2, 60, alphabet="AC"),
              random_dna(rng, 2, 60, alphabet="AC")) for _ in range(6)]
    pairs += [("ACGTACGT", "ACGT"), ("AAAA", "TTTT")]
    _run_and_compare_stagger(Algorithm.LSW, params, pairs)


def test_stagger_alt_params_and_stripe(rng):
    params = AlignmentParams(match=5, mismatch=-2, gap=-3, gap_open=-6,
                             gap_extend=-2)
    pairs = [(random_dna(rng, 1, 50), random_dna(rng, 30, 50))
             for _ in range(6)]
    for algo in STAGGER_ALGOS:
        _run_and_compare_stagger(algo, params, pairs, stripe_s=16)


def test_stagger_scores_only(rng):
    pairs = [(random_dna(rng, 1, 50), random_dna(rng, 1, 50))
             for _ in range(8)]
    ds = PairDataset.from_pairs(pairs)
    for algo in STAGGER_ALGOS:
        for b in bucketize(ds, BucketSpec(batch_pairs=8, query_multiple=64)):
            fill = fill_stagger_bucket(algo, PARAMS, b.ref_tokens,
                                       b.qry_tokens, b.ref_len, b.qry_len,
                                       with_traceback=False)
            assert fill.dirs is None
            for row in range(b.num_real):
                i = int(b.pair_ids[row])
                want = align_pair(algo, PARAMS, *pairs[i], engine="scalar")
                assert int(fill.scores[row]) == want.score, (algo, i)


def test_stagger_local_start_cell_semantics(rng):
    """Stagger argmax must keep the first row-major maximum
    (cuda/LinearSmithWaterman.cu:300-311), including across stripes."""
    pairs = [(random_dna(rng, 10, 80, alphabet="AC"),
              random_dna(rng, 40, 80, alphabet="AC")) for _ in range(8)]
    ds = PairDataset.from_pairs(pairs)
    for b in bucketize(ds, BucketSpec(batch_pairs=8, query_multiple=96)):
        fill = fill_stagger_bucket(Algorithm.LSW, PARAMS, b.ref_tokens,
                                   b.qry_tokens, b.ref_len, b.qry_len,
                                   with_traceback=False)
        for row in range(b.num_real):
            i = int(b.pair_ids[row])
            want = fill_scalar(Algorithm.LSW, PARAMS, *pairs[i]).local_max()
            got = (int(fill.scores[row]), int(fill.start_row[row]),
                   int(fill.start_col[row]))
            assert got == want, f"pair {i}: {got} != {want}"


@pytest.mark.slow
def test_long_sequences_2k():
    """2k x 2k fill correctness: exercises the multi-word query grid and
    the raised VMEM budget (kernels/fill.py CompilerParams).  Interpret
    mode; the stagger 2k hardware row lives in PERF.md."""
    rng2 = np.random.default_rng(77)
    ref = "".join("ATCG"[i] for i in rng2.integers(0, 4, 2048))
    qry = "".join("ATCG"[i] for i in rng2.integers(0, 4, 2048))
    ds = PairDataset.from_pairs([(ref, qry)])
    [b] = bucketize(ds, BucketSpec(batch_pairs=8, query_multiple=2048))
    fill = fill_bucket(Algorithm.LNW, PARAMS, b.ref_tokens, b.qry_tokens,
                       b.ref_len, b.qry_len, with_traceback=False)
    from tpu_align.oracle.vectorized import fill_vectorized
    want = fill_vectorized(Algorithm.LNW, PARAMS, ref, qry).global_score
    assert int(fill.scores[0]) == want


@pytest.mark.parametrize("algo", [Algorithm.LNW, Algorithm.LSW])
def test_device_walk_phase_budget_overflow(algo):
    """Lanes spending long insertion runs at DIFFERENT rows serialize the
    row-phase walk: the total phase count exceeds the M+N budget and the
    device walk must retry with a larger budget instead of silently
    truncating the move streams.  Blocked sequences (A^k C^(8-k) against
    A-block ... C-block) pin each pair's run to a different row."""
    from tpu_align.kernels.stagger import STRIPE_S, fill_stagger_bucket_async
    from tpu_align.traceback.device import device_traceback_bucket

    ref = "A" * 8 + "G" * 48 + "C" * 8
    pairs = [(ref, "A" * k + "C" * (8 - k)) for k in range(1, 8)]
    params = AlignmentParams(match=3, mismatch=-1, gap=-2)
    ds = PairDataset.from_pairs(pairs)
    for b in bucketize(ds, BucketSpec(batch_pairs=8, query_multiple=8)):
        scores, srow, scol, dirs = fill_stagger_bucket_async(
            algo, params, b.ref_tokens, b.qry_tokens, b.ref_len, b.qry_len)
        dev = {r.pair_num: r for r in device_traceback_bucket(
            algo, b, scores, srow, scol, dirs, params, STRIPE_S)}
        for i in sorted(dev):
            want = align_pair(algo, params, *pairs[i], pair_num=i,
                              engine="scalar")
            assert dev[i].block() == want.block(), (algo, i)


def test_stagger_last_rows_matches_rowscan():
    """fill_stagger_last_rows_async is bit-identical to the rowscan
    last-row fill (scores, H row, affine F row, Myers-Miller open_top
    credits) -- the Hirschberg recursion can use either kernel."""
    import numpy as np

    from tpu_align.kernels.fill import fill_last_rows_async
    from tpu_align.kernels.stagger import fill_stagger_last_rows_async

    rng = np.random.default_rng(3)
    p = AlignmentParams()
    b, n, m = 8, 128, 48
    refs = rng.integers(65, 69, (b, n)).astype(np.uint8)
    qrys = rng.integers(65, 69, (b, m)).astype(np.uint8)
    rlen = rng.integers(1, n + 1, b).astype(np.int32)
    qlen = rng.integers(1, m + 1, b).astype(np.int32)
    qlen[0] = 1          # single-row edge
    qlen[1] = m          # full-stripe edge
    cases = [(Algorithm.LNW, None), (Algorithm.ANW, None),
             (Algorithm.ANW, np.where(rng.random(b) < 0.5, 0,
                                      p.gap_open).astype(np.int32))]
    for algo, tb in cases:
        a = fill_last_rows_async(algo, p, refs, qrys, rlen, qlen,
                                 interpret=True, open_top=tb)
        s = fill_stagger_last_rows_async(algo, p, refs, qrys, rlen, qlen,
                                         interpret=True, open_top=tb)
        assert (np.asarray(a[0])[:b] == np.asarray(s[0])[:b]).all()
        for k in range(b):
            nn = rlen[k]
            assert (np.asarray(a[1])[:nn, k]
                    == np.asarray(s[1])[:nn, k]).all(), (algo.value, k)
            if algo.is_affine:
                assert (np.asarray(a[2])[:nn, k]
                        == np.asarray(s[2])[:nn, k]).all(), (algo.value, k)
