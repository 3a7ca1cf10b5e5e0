"""Pallas walk kernel vs the XLA while_loop walker.

The two walkers share one move-semantics definition (decide_step), but
the Pallas kernel phases each lane group independently, so the packed
streams may place codes at different global steps.  The contract is:
identical per-lane MOVE SEQUENCES (the nonzero codes in walk order),
hence byte-identical alignment strings after replay.
"""

import random

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy interpret-mode compiles; quick tier skips

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.io import BucketSpec, PairDataset, bucketize
from tpu_align.kernels.stagger import STRIPE_S, fill_stagger_bucket_async
from tpu_align.oracle.api import align_pair
from tpu_align.traceback.device import (
    device_traceback_bucket,
    device_traceback_moves,
    unpack_moves,
)
from tests.conftest import random_dna

PARAMS = AlignmentParams(match=3, mismatch=-1, gap=-2, gap_open=-4,
                         gap_extend=-1)


def _lane_seqs(packed, t):
    codes = unpack_moves(packed, t)
    return [tuple(c for c in codes[:, b] if c)
            for b in range(codes.shape[1])]


def _walk_both(algo, bucket, multi_group=False, monkeypatch=None):
    scores, srow, scol, dirs = fill_stagger_bucket_async(
        algo, PARAMS, bucket.ref_tokens, bucket.qry_tokens,
        bucket.ref_len, bucket.qry_len)
    if multi_group:
        import tpu_align.traceback.walk_kernel as wk
        monkeypatch.setattr(wk, "_group_lanes",
                            lambda b: 8 if b % 8 == 0 else b)
    px, tx = device_traceback_moves(algo, PARAMS, dirs, srow, scol,
                                    scores, STRIPE_S, walker="xla")
    pp, tp = device_traceback_moves(algo, PARAMS, dirs, srow, scol,
                                    scores, STRIPE_S, walker="pallas")
    return (px, tx), (pp, tp), (scores, srow, scol, dirs)


@pytest.mark.parametrize("algo",
                         [Algorithm.LNW, Algorithm.LSW, Algorithm.ANW])
def test_pallas_walker_matches_xla(rng, algo, monkeypatch):
    """Multi-stripe queries, multiple lane groups: per-lane move
    sequences from the Pallas kernel equal the XLA walker's."""
    pairs = [(random_dna(rng, 1, 90), random_dna(rng, 1, 90))
             for _ in range(16)]
    ds = PairDataset.from_pairs(pairs)
    for b in bucketize(ds, BucketSpec(batch_pairs=16, query_multiple=96)):
        xla, pal, _ = _walk_both(algo, b, multi_group=True,
                                 monkeypatch=monkeypatch)
        assert _lane_seqs(*xla) == _lane_seqs(*pal), algo


@pytest.mark.parametrize("algo", [Algorithm.LNW, Algorithm.ANW])
def test_pallas_walker_phase_budget_overflow(algo):
    """The doubling-retry contract holds for the Pallas walker too:
    blocked sequences force per-row serialization past the M+N budget."""
    ref = "A" * 8 + "G" * 48 + "C" * 8
    pairs = [(ref, "A" * k + "C" * (8 - k)) for k in range(1, 8)]
    ds = PairDataset.from_pairs(pairs)
    for b in bucketize(ds, BucketSpec(batch_pairs=8, query_multiple=8)):
        xla, pal, arrs = _walk_both(algo, b)
        assert _lane_seqs(*xla) == _lane_seqs(*pal), algo
        scores, srow, scol, dirs = arrs
        dev = {r.pair_num: r for r in device_traceback_bucket(
            algo, b, scores, srow, scol, dirs, PARAMS, STRIPE_S,
            walker="pallas")}
        for i in sorted(dev):
            want = align_pair(algo, PARAMS, *pairs[i], pair_num=i,
                              engine="scalar")
            assert dev[i].block() == want.block(), (algo, i)


def test_pallas_walker_bucket_strings(rng):
    """End-to-end bucket replay through the Pallas walker is
    byte-identical to the scalar oracle (local algorithm: exercises the
    re-scoring stop and never-started lanes)."""
    algo = Algorithm.LSW
    pairs = [(random_dna(rng, 1, 60, alphabet="AT"),
              random_dna(rng, 1, 60, alphabet="AT")) for _ in range(8)]
    pairs.append(("TTTT", "AAAA"))  # score 0: empty output
    ds = PairDataset.from_pairs(pairs)
    for b in bucketize(ds, BucketSpec(batch_pairs=16, query_multiple=64)):
        scores, srow, scol, dirs = fill_stagger_bucket_async(
            algo, PARAMS, b.ref_tokens, b.qry_tokens, b.ref_len, b.qry_len)
        dev = {r.pair_num: r for r in device_traceback_bucket(
            algo, b, scores, srow, scol, dirs, PARAMS, STRIPE_S,
            walker="pallas")}
        for i in sorted(dev):
            want = align_pair(algo, PARAMS, *pairs[i], pair_num=i,
                              engine="scalar")
            assert dev[i].block() == want.block(), i


def test_banded_device_walk_matches_oracle(rng):
    """BSW device traceback over the skewed banded dirs layout:
    byte-identical to the scalar oracle, including tie-rich
    sparse-alphabet pairs and score-0 pairs."""
    from tpu_align.kernels.banded import fill_banded_bucket_async

    algo = Algorithm.BSW
    params = AlignmentParams(match=3, mismatch=-1, gap=-2, band=4)
    pairs = [(random_dna(rng, 1, 60, alphabet="AT"),
              random_dna(rng, 1, 60, alphabet="AT")) for _ in range(8)]
    pairs.append(("TTTT", "AAAA"))
    ds = PairDataset.from_pairs(pairs)
    for b in bucketize(ds, BucketSpec(batch_pairs=16, query_multiple=64)):
        scores, srow, scol, dirs = fill_banded_bucket_async(
            params, b.ref_tokens, b.qry_tokens, b.ref_len, b.qry_len)
        dev = {r.pair_num: r for r in device_traceback_bucket(
            algo, b, scores, srow, scol, dirs, params, 0)}
        for i in sorted(dev):
            want = align_pair(algo, params, *pairs[i], pair_num=i,
                              engine="scalar")
            assert dev[i].block() == want.block(), i


def test_pallas_banded_walker_matches_xla(rng, monkeypatch):
    """BSW over the skewed banded layout: the Pallas walker's per-lane
    move sequences equal the XLA banded walker's, and bucket replay is
    byte-identical to the scalar oracle (multiple lane groups)."""
    from tpu_align.kernels.banded import fill_banded_bucket_async

    algo = Algorithm.BSW
    params = AlignmentParams(match=3, mismatch=-1, gap=-2, band=4)
    pairs = [(random_dna(rng, 1, 90, alphabet="AT"),
              random_dna(rng, 1, 90, alphabet="AT")) for _ in range(15)]
    pairs.append(("TTTT", "AAAA"))  # score 0: never-started lane
    ds = PairDataset.from_pairs(pairs)
    for b in bucketize(ds, BucketSpec(batch_pairs=16, query_multiple=96)):
        scores, srow, scol, dirs = fill_banded_bucket_async(
            params, b.ref_tokens, b.qry_tokens, b.ref_len, b.qry_len)
        import tpu_align.traceback.walk_kernel as wk
        monkeypatch.setattr(wk, "_group_lanes",
                            lambda b: 8 if b % 8 == 0 else b)
        px, tx = device_traceback_moves(algo, params, dirs, srow, scol,
                                        scores, 0, walker="xla")
        pp, tp = device_traceback_moves(algo, params, dirs, srow, scol,
                                        scores, 0, walker="pallas")
        assert _lane_seqs(px, tx) == _lane_seqs(pp, tp)
        dev = {r.pair_num: r for r in device_traceback_bucket(
            algo, b, scores, srow, scol, dirs, params, 0,
            walker="pallas")}
        for i in sorted(dev):
            want = align_pair(algo, params, *pairs[i], pair_num=i,
                              engine="scalar")
            assert dev[i].block() == want.block(), i


def test_pallas_t_max_cap_falls_back_to_xla(monkeypatch):
    """When a budget retry would exceed the Pallas walker's VMEM scratch
    cap, the dispatcher degrades to the XLA walker instead of failing at
    compile time -- output unchanged."""
    import tpu_align.traceback.device as dev
    import tpu_align.traceback.walk_kernel as wk

    from tpu_align.traceback.device import (
        device_walk_dispatch, device_walk_finalize,
    )

    ds = PairDataset.from_pairs([(random_dna(random.Random(1), 40),
                                  random_dna(random.Random(2), 36))] * 4)
    (b,) = bucketize(ds, BucketSpec(batch_pairs=8, query_multiple=8))
    scores, srow, scol, dirs = fill_stagger_bucket_async(
        Algorithm.LNW, PARAMS, b.ref_tokens, b.qry_tokens,
        b.ref_len, b.qry_len)
    want, tw = device_traceback_moves(
        Algorithm.LNW, PARAMS, np.asarray(dirs), np.asarray(srow),
        np.asarray(scol), np.asarray(scores), STRIPE_S, walker="xla")

    calls = []
    monkeypatch.setattr(wk, "pallas_t_max_cap", lambda *a, **k: 16)
    real_xla = dev._device_walk

    def spy_xla(*a, **k):
        calls.append("xla")
        return real_xla(*a, **k)

    monkeypatch.setattr(dev, "_device_walk", spy_xla)
    got, tg = device_walk_finalize(device_walk_dispatch(
        Algorithm.LNW, PARAMS, dirs, srow, scol, scores, STRIPE_S,
        walker="pallas"))
    assert calls, "cap=16 must route the walk to the XLA walker"
    assert _lane_seqs(got, tg) == _lane_seqs(np.asarray(want), tw)


def test_pallas_t_max_cap_reasonable():
    """The computed cap admits the standard read-workload budget (so the
    Pallas walker actually runs there) and scales down with lane group
    size times t_max VMEM."""
    from tpu_align.traceback.walk_kernel import pallas_t_max_cap

    cap = pallas_t_max_cap((8, 18, 32, 1024))  # 250bp bucket shape
    assert cap >= 2048  # typical budget ~ (M + N + slack)
    assert pallas_t_max_cap((8, 18, 32, 128)) >= cap
