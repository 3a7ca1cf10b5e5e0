"""Native (C++) runtime vs Python fallback parity tests."""

import numpy as np
import pytest

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.io import PairDataset, BucketSpec, bucketize
from tpu_align.io.dataset import parse_pair_text
from tpu_align.kernels import fill_bucket
from tpu_align.native import available, native_parse_pair_bytes
from tpu_align.traceback import traceback_bucket
from tests.conftest import random_dna

pytestmark = pytest.mark.skipif(
    not available(), reason="native library not built"
)

ALGOS = [Algorithm.LNW, Algorithm.LSW, Algorithm.ANW, Algorithm.BSW]


def test_native_parser_matches_python():
    cases = [
        b"0\nACGT\nAC\n1\n0123\n3210\n",
        b"s\r\nACGT\r\nAC",          # CRLF + missing trailing newline
        b"",                          # empty file
        b"x\nA\nT\ny\nGG\nCC\n",
    ]
    for data in cases:
        a = parse_pair_text(data, use_native=True)
        b = parse_pair_text(data, use_native=False)
        assert len(a) == len(b)
        for i in range(len(a)):
            assert a.pair(i) == b.pair(i), (data, i)


def test_native_parser_malformed():
    with pytest.raises(ValueError):
        native_parse_pair_bytes(b"a\nb\n")


def test_native_parser_large_roundtrip():
    from tpu_align.utils import synthetic_dataset

    ds = synthetic_dataset(500, min_len=10, max_len=200, seed=13)
    text = "".join(f"{i}\n{r}\n{q}\n" for i, (r, q) in enumerate(ds.pairs()))
    a = parse_pair_text(text.encode(), use_native=True)
    assert len(a) == 500
    assert a.pair(499) == ds.pair(499)
    assert a.num_cells == ds.num_cells


@pytest.mark.parametrize("algo", ALGOS)
def test_native_traceback_matches_python(rng, algo):
    pairs = [(random_dna(rng, 1, 70), random_dna(rng, 1, 50)) for _ in range(14)]
    # include degenerate local cases (all-mismatch -> score 0)
    pairs += [("AAAA", "TTTT"), ("A", "T")]
    ds = PairDataset.from_pairs(pairs)
    params = AlignmentParams(mismatch=-3)
    for b in bucketize(ds, BucketSpec(batch_pairs=32, query_multiple=64)):
        fill = fill_bucket(algo, params, b.ref_tokens, b.qry_tokens,
                           b.ref_len, b.qry_len)
        got = traceback_bucket(algo, b, fill, params, use_native=True)
        want = traceback_bucket(algo, b, fill, params, use_native=False)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g == w, f"{algo}: pair {g.pair_num}\n{g.block()}\n{w.block()}"


def test_anw_ef_bits_knob_guards_every_walk_entry(monkeypatch):
    """TPU_ALIGN_ANW_EF_BITS=0 (bench-attribution knob) drops the affine
    E/F extend bits from the dirs; every host walk entry point must
    refuse rather than silently emit wrong alignments -- including
    traceback_bucket_arrays, the engine's default native blocks path."""
    from types import SimpleNamespace

    from tpu_align.traceback.host import traceback_bucket_arrays

    monkeypatch.setenv("TPU_ALIGN_ANW_EF_BITS", "0")
    fake_fill = SimpleNamespace(dirs=np.zeros(1, np.int32))
    with pytest.raises(RuntimeError, match="EF_BITS"):
        traceback_bucket(Algorithm.ANW, None, fake_fill, AlignmentParams())
    with pytest.raises(RuntimeError, match="EF_BITS"):
        traceback_bucket_arrays(Algorithm.ANW, None, fake_fill,
                                AlignmentParams())
    # non-affine walks are unaffected by the knob (guard must not fire)
    from tpu_align.traceback.host import _check_affine_walkable

    _check_affine_walkable(Algorithm.LNW)
