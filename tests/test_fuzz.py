"""Cross-implementation fuzz: random parameters and sequences must agree
across scalar oracle, vectorized oracle, and the Pallas kernel, end to end
(scores AND traceback strings), plus the independent re-scoring verifier.
"""

import random

import pytest

pytestmark = pytest.mark.slow  # heavy interpret-mode compiles; quick tier skips

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.io import PairDataset, BucketSpec, bucketize
from tpu_align.kernels import fill_bucket, fill_banded_bucket
from tpu_align.oracle.api import align_pair
from tpu_align.traceback import traceback_bucket
from tpu_align.verify.golden import OutputBlock, rescore_alignment
from tests.conftest import random_dna

ALGOS = [Algorithm.LNW, Algorithm.LSW, Algorithm.ANW, Algorithm.BSW]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz_params_and_sequences(seed):
    rng = random.Random(seed)
    params = AlignmentParams(
        match=rng.randint(1, 8),
        mismatch=rng.randint(-6, 0),
        gap=rng.randint(-5, -1),
        gap_open=rng.randint(-8, -1),
        gap_extend=rng.randint(-3, -1),
        band=rng.randint(2, 12),
    )
    pairs = [
        (random_dna(rng, 1, 70, alphabet="AT"),  # 2-letter alphabet: tie-rich
         random_dna(rng, 1, 70, alphabet="AT"))
        for _ in range(8)
    ]
    ds = PairDataset.from_pairs(pairs)
    spec = BucketSpec(batch_pairs=8, query_multiple=72)
    for algo in ALGOS:
        for b in bucketize(ds, spec):
            if algo is Algorithm.BSW:
                fill = fill_banded_bucket(params, b.ref_tokens, b.qry_tokens,
                                          b.ref_len, b.qry_len)
            else:
                fill = fill_bucket(algo, params, b.ref_tokens, b.qry_tokens,
                                   b.ref_len, b.qry_len)
            got = {r.pair_num: r
                   for r in traceback_bucket(algo, b, fill, params)}
            for row in range(b.num_real):
                i = int(b.pair_ids[row])
                ref, qry = pairs[i]
                # scalar oracle parity (scores + strings)
                want = align_pair(algo, params, ref, qry, pair_num=i,
                                  engine="scalar")
                g = got[i]
                assert g.score == want.score, (algo, params, pairs[i])
                assert (g.ref_aligned, g.relation, g.query_aligned) == (
                    want.ref_aligned, want.relation, want.query_aligned
                ), (algo, params, pairs[i], g.block(), want.block())
                # vectorized oracle parity (scores)
                want_v = align_pair(algo, params, ref, qry,
                                    engine="vectorized")
                assert want_v.score == want.score, (algo, params, pairs[i])
                # independent re-scoring of the kernel's path
                block = OutputBlock(i, g.score, g.ref_aligned, g.relation,
                                    g.query_aligned)
                assert rescore_alignment(algo, params, ref, qry, block) == [], (
                    algo, params, pairs[i]
                )


@pytest.mark.parametrize("seed", [5, 6])
def test_fuzz_stagger_and_device_walk(seed):
    """Random params x tie-rich sequences through the stagger kernel and
    BOTH traceback paths (host walk over stagger dirs; device move-stream
    walk) -- all byte-identical to the scalar oracle."""
    import numpy as np

    from tpu_align.kernels.stagger import (
        STRIPE_S,
        fill_stagger_bucket,
        fill_stagger_bucket_async,
    )
    from tpu_align.traceback.device import device_traceback_bucket

    rng = random.Random(seed)
    params = AlignmentParams(
        match=rng.randint(1, 8),
        mismatch=rng.randint(-6, 0),
        gap=rng.randint(-5, -1),
        gap_open=rng.randint(-8, -1),
        gap_extend=rng.randint(-3, -1),
    )
    pairs = [
        (random_dna(rng, 1, 70, alphabet="AT"),
         random_dna(rng, 1, 70, alphabet="AT"))
        for _ in range(8)
    ]
    ds = PairDataset.from_pairs(pairs)
    spec = BucketSpec(batch_pairs=8, query_multiple=72)
    for algo in [Algorithm.LNW, Algorithm.LSW, Algorithm.ANW]:
        for b in bucketize(ds, spec):
            fill = fill_stagger_bucket(algo, params, b.ref_tokens,
                                       b.qry_tokens, b.ref_len, b.qry_len)
            host = {r.pair_num: r
                    for r in traceback_bucket(algo, b, fill, params)}
            scores, srow, scol, dirs = fill_stagger_bucket_async(
                algo, params, b.ref_tokens, b.qry_tokens, b.ref_len,
                b.qry_len,
            )
            dev = {r.pair_num: r
                   for r in device_traceback_bucket(
                       algo, b, scores, srow, scol, dirs, params, STRIPE_S)}
            for row in range(b.num_real):
                i = int(b.pair_ids[row])
                want = align_pair(algo, params, *pairs[i], pair_num=i,
                                  engine="scalar")
                assert host[i].block() == want.block(), (algo, params,
                                                         pairs[i])
                assert dev[i].block() == want.block(), (algo, params,
                                                        pairs[i])
