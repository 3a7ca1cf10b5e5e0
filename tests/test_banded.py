"""Banded fast-path kernel vs oracle: scores, starts, and full tracebacks."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy interpret-mode compiles; quick tier skips

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.io import PairDataset, BucketSpec, bucketize
from tpu_align.kernels import fill_banded_bucket
from tpu_align.native import available as native_available
from tpu_align.oracle.api import align_pair
from tpu_align.oracle.scalar import fill_scalar
from tpu_align.traceback import traceback_bucket
from tests.conftest import random_dna


def _check(params, pairs, use_native):
    ds = PairDataset.from_pairs(pairs)
    for b in bucketize(ds, BucketSpec(batch_pairs=64, query_multiple=176)):
        fill = fill_banded_bucket(params, b.ref_tokens, b.qry_tokens,
                                  b.ref_len, b.qry_len)
        assert fill.band == params.band
        results = traceback_bucket(Algorithm.BSW, b, fill, params,
                                   use_native=use_native)
        by_num = {r.pair_num: r for r in results}
        for row in range(b.num_real):
            i = int(b.pair_ids[row])
            want = align_pair(Algorithm.BSW, params, *pairs[i], engine="scalar")
            got = by_num[i]
            assert got.score == want.score, (
                f"pair {i}: {got.score} != {want.score} "
                f"{pairs[i]!r} band={params.band}"
            )
            assert (got.ref_aligned, got.relation, got.query_aligned) == (
                want.ref_aligned, want.relation, want.query_aligned
            ), f"pair {i}: {pairs[i]!r}\n{got.block()}\n{want.block()}"


@pytest.mark.parametrize("band", [2, 5, 16])
def test_banded_kernel_matches_oracle(rng, band):
    params = AlignmentParams(band=band)
    pairs = [(random_dna(rng, 1, 60), random_dna(rng, 1, 50)) for _ in range(12)]
    pairs += [("AAAA", "TTTT"), ("A", "A"), ("ACGT" * 40, "ACGT" * 40)]
    _check(params, pairs, use_native=False)


@pytest.mark.skipif(not native_available(), reason="native library not built")
def test_banded_native_traceback(rng):
    params = AlignmentParams(band=7)
    pairs = [(random_dna(rng, 5, 80), random_dna(rng, 5, 80)) for _ in range(16)]
    _check(params, pairs, use_native=True)


def test_banded_start_cell_semantics(rng):
    """Argmax must match the full-width oracle's first row-major max."""
    params = AlignmentParams(band=6)
    pairs = [(random_dna(rng, 20, 60), random_dna(rng, 20, 60)) for _ in range(8)]
    ds = PairDataset.from_pairs(pairs)
    for b in bucketize(ds, BucketSpec(batch_pairs=8, query_multiple=64)):
        fill = fill_banded_bucket(params, b.ref_tokens, b.qry_tokens,
                                  b.ref_len, b.qry_len, with_traceback=False)
        for row in range(b.num_real):
            i = int(b.pair_ids[row])
            want = fill_scalar(Algorithm.BSW, params, *pairs[i]).local_max()
            got = (int(fill.scores[row]), int(fill.start_row[row]),
                   int(fill.start_col[row]))
            assert got == want, (i, got, want, pairs[i])
