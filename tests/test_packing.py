"""2-bit H2D token packing (io/packing) and event-compacted device-walk
readback (traceback/device _compact_events + native ta_replay_events).

The packed upload and the event readback are transfer-layer
optimizations: both must be byte-exact inverses of the raw paths
(PERF.md: the tunnel moves ~35 MB/s, so bytes/pair is the binding e2e
constraint; correctness contract is unchanged output).
"""

import numpy as np
import pytest

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.io.bucketing import PAD_QRY, PAD_REF, BucketSpec, bucketize
from tpu_align.io.packing import maybe_pack_tokens, unpack_tokens
from tpu_align.utils import synthetic_dataset

PARAMS = AlignmentParams()


def test_pack_roundtrip_exact():
    rng = np.random.default_rng(5)
    lens = rng.integers(0, 64, 40).astype(np.int32)
    toks = np.full((40, 64), PAD_REF, np.uint8)
    bases = np.frombuffer(b"ATCG", np.uint8)
    for b in range(40):
        toks[b, : lens[b]] = bases[rng.integers(0, 4, lens[b])]
    out = maybe_pack_tokens(toks, lens)
    assert out is not None
    packed, lut = out
    assert packed.shape == (40, 16)
    back = np.asarray(unpack_tokens(packed, lut, lens, PAD_REF, 64))
    np.testing.assert_array_equal(back, toks)


def test_pack_narrow_and_empty_alphabets():
    lens = np.array([3, 0], np.int32)
    toks = np.full((2, 8), PAD_QRY, np.uint8)
    toks[0, :3] = np.frombuffer(b"AAA", np.uint8)
    packed, lut = maybe_pack_tokens(toks, lens)
    back = np.asarray(unpack_tokens(packed, lut, lens, PAD_QRY, 8))
    np.testing.assert_array_equal(back, toks)
    # all-empty rows still round-trip
    packed, lut = maybe_pack_tokens(np.full((2, 8), PAD_REF, np.uint8),
                                    np.zeros(2, np.int32))
    back = np.asarray(unpack_tokens(packed, lut, np.zeros(2, np.int32),
                                    PAD_REF, 8))
    assert (back == PAD_REF).all()


def test_fused_blob_roundtrip():
    """fuse_bucket_blob -> defuse_bucket_blob must reproduce all six
    arrays exactly (single-transfer bucket upload, engine._upload)."""
    from tpu_align.io.packing import defuse_bucket_blob, fuse_bucket_blob

    rng = np.random.default_rng(11)
    b, n, m = 13, 64, 32
    bases = np.frombuffer(b"ATCG", np.uint8)
    rlen = rng.integers(1, n + 1, b).astype(np.int32)
    qlen = rng.integers(0, m + 1, b).astype(np.int32)
    rt = np.full((b, n), PAD_REF, np.uint8)
    qt = np.full((b, m), PAD_QRY, np.uint8)
    for i in range(b):
        rt[i, : rlen[i]] = bases[rng.integers(0, 4, rlen[i])]
        qt[i, : qlen[i]] = bases[rng.integers(0, 4, qlen[i])]
    rp = maybe_pack_tokens(rt, rlen)
    qp = maybe_pack_tokens(qt, qlen)
    fb = fuse_bucket_blob((rp[0], rp[1], qp[0], qp[1]), rlen, qlen)
    assert fb.blob.dtype == np.uint8 and fb.blob.ndim == 1
    assert fb.blob.size == b * (fb.n4 + fb.m4 + 8) + 8
    import jax.numpy as jnp

    out = defuse_bucket_blob(jnp.asarray(fb.blob), fb.b, fb.n4, fb.m4)
    rp2, rlut2, qp2, qlut2, rl2, ql2 = (np.asarray(x) for x in out)
    np.testing.assert_array_equal(rp2, rp[0])
    np.testing.assert_array_equal(rlut2, rp[1])
    np.testing.assert_array_equal(qp2, qp[0])
    np.testing.assert_array_equal(qlut2, qp[1])
    np.testing.assert_array_equal(rl2, rlen)
    np.testing.assert_array_equal(ql2, qlen)
    # large lengths exercise all four little-endian bytes
    big = np.array([0x01020304, 0x7fffffff], np.int32)
    fb2 = fuse_bucket_blob(
        (rp[0][:2], rp[1], qp[0][:2], qp[1]), big, big[::-1].copy())
    out2 = defuse_bucket_blob(jnp.asarray(fb2.blob), 2, fb2.n4, fb2.m4)
    np.testing.assert_array_equal(np.asarray(out2[4]), big)
    np.testing.assert_array_equal(np.asarray(out2[5]), big[::-1])


def test_pack_rejects_wide_alphabet():
    toks = np.frombuffer(b"ABCDEFGH", np.uint8).reshape(1, 8).copy()
    assert maybe_pack_tokens(toks, np.array([8], np.int32)) is None


def test_packed_fill_matches_raw():
    """The packed-H2D fill path must be bit-identical to the raw path."""
    import os

    from tpu_align.kernels.stagger import fill_stagger_bucket
    ds = synthetic_dataset(48, uniform_len=40, seed=11)
    (b,) = bucketize(ds, BucketSpec(batch_pairs=64, query_multiple=16))
    kw = dict(with_traceback=True, interpret=True)
    packed_fill = fill_stagger_bucket(
        Algorithm.LNW, PARAMS, b.ref_tokens, b.qry_tokens, b.ref_len,
        b.qry_len, **kw)
    os.environ["TPU_ALIGN_PACK_H2D"] = "off"
    try:
        raw_fill = fill_stagger_bucket(
            Algorithm.LNW, PARAMS, b.ref_tokens, b.qry_tokens, b.ref_len,
            b.qry_len, **kw)
    finally:
        del os.environ["TPU_ALIGN_PACK_H2D"]
    np.testing.assert_array_equal(packed_fill.scores, raw_fill.scores)
    np.testing.assert_array_equal(packed_fill.dirs, raw_fill.dirs)


@pytest.mark.parametrize("algo", [Algorithm.LNW, Algorithm.LSW,
                                  Algorithm.ANW])
def test_event_readback_matches_stream(algo):
    """Events-mode device traceback == stream-mode, byte for byte."""
    from tpu_align.kernels.stagger import STRIPE_S, fill_stagger_bucket_async
    from tpu_align.traceback.device import (
        device_traceback_bucket,
        device_walk_dispatch,
        device_walk_dispatch_events,
    )

    ds = synthetic_dataset(40, uniform_len=48, seed=23)
    # query_multiple=64 pads every mutated query to one shape: one bucket
    (b,) = bucketize(ds, BucketSpec(batch_pairs=64, query_multiple=64))
    outs = fill_stagger_bucket_async(
        algo, PARAMS, b.ref_tokens, b.qry_tokens, b.ref_len, b.qry_len,
        with_traceback=True, interpret=True)
    scores, srow, scol, dirs = outs
    hs = device_walk_dispatch(algo, PARAMS, dirs, srow, scol, scores,
                              STRIPE_S, extras=(scores, srow, scol))
    he = device_walk_dispatch_events(algo, PARAMS, dirs, srow, scol,
                                     scores, STRIPE_S,
                                     extras=(scores, srow, scol))
    want = device_traceback_bucket(algo, b, scores, srow, scol, dirs,
                                   PARAMS, STRIPE_S, handle=hs)
    got = device_traceback_bucket(algo, b, scores, srow, scol, dirs,
                                  PARAMS, STRIPE_S, handle=he)
    assert [r.block() for r in got] == [r.block() for r in want]


def test_event_overflow_falls_back_to_stream():
    """A lane with more indels than EV_MAX slots must still be exact
    (the finalize detects overflow and fetches the full stream)."""
    from tpu_align.kernels.stagger import STRIPE_S, fill_stagger_bucket_async
    from tpu_align.traceback.device import (
        device_traceback_bucket,
        device_walk_dispatch_events,
    )
    from tpu_align.traceback.host import traceback_bucket
    from tpu_align.kernels.fill import BucketFill
    from tpu_align.io.dataset import PairDataset

    # ref long, qry short: > EV_MAX forced insertions
    pairs = [("ATCG" * 30, "ATCG"), ("A" * 90, "T" * 3)]
    ds = PairDataset.from_pairs(pairs)
    (b,) = bucketize(ds, BucketSpec(batch_pairs=8, query_multiple=16))
    scores, srow, scol, dirs = fill_stagger_bucket_async(
        Algorithm.LNW, PARAMS, b.ref_tokens, b.qry_tokens, b.ref_len,
        b.qry_len, with_traceback=True, interpret=True)
    he = device_walk_dispatch_events(
        Algorithm.LNW, PARAMS, dirs, srow, scol, scores, STRIPE_S,
        extras=(scores, srow, scol), ev_max=32)
    got = device_traceback_bucket(Algorithm.LNW, b, scores, srow, scol,
                                  dirs, PARAMS, STRIPE_S, handle=he)
    fill = BucketFill(np.asarray(scores), np.asarray(srow),
                      np.asarray(scol), np.asarray(dirs),
                      stagger=STRIPE_S)
    want = traceback_bucket(Algorithm.LNW, b, fill, PARAMS)
    assert [r.block() for r in got] == [r.block() for r in want]


def test_native_replay_events_matches_python():
    """C++ ta_replay_events == the Python fallback decoder on random
    event lists."""
    from tpu_align.native import native_replay_events
    from tpu_align.native.binding import available

    if not available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(3)
    nb, n, m = 24, 32, 32
    bases = np.frombuffer(b"ATCG", np.uint8)
    ref = bases[rng.integers(0, 4, (nb, n))]
    qry = bases[rng.integers(0, 4, (nb, m))]
    # construct consistent event lists: a full walk from (r0, c0) to
    # (0, 0) with random indels; flat (row << 1 | is_ins) uint16 payloads
    # with per-lane ev_off boundaries (the _compact_events layout)
    flat: list[int] = []
    ev_off = np.zeros(nb + 1, np.int64)
    sr = np.zeros(nb, np.int32)
    sj = np.zeros(nb, np.int32)
    for b in range(nb):
        r = c = 20
        sr[b], sj[b] = r, c
        while r > 0 or c > 0:
            mv = rng.integers(0, 4)
            if c == 0 or (mv == 0 and r > 0):  # deletion at row r
                flat.append((r << 1) | 0)
                r -= 1
            elif r == 0 or mv == 1:  # insertion at row r
                flat.append((r << 1) | 1)
                c -= 1
            else:
                r -= 1
                c -= 1
        ev_off[b + 1] = len(flat)
    events = np.array(flat, np.uint16)
    scores = np.full(nb, 999, np.int32)
    out_buf, out_lens = native_replay_events(
        events, ev_off, ref, qry, sr, sj, scores, local=False,
        match=3, mismatch=-1, gap=-2)
    # python mirror via _events_to_codes + moves_to_result
    from tpu_align.traceback.device import _events_to_codes, moves_to_result

    class _B:  # minimal bucket shim
        num_real = nb
        ref_tokens = ref
        qry_tokens = qry

    codes = _events_to_codes(events, ev_off, sr, sj, scores, _B,
                             Algorithm.LNW, PARAMS)
    for b in range(nb):
        res = moves_to_result(
            Algorithm.LNW, b, int(scores[b]), codes[:, b],
            ref[b].tobytes().decode(), qry[b].tobytes().decode(),
            int(sr[b]), int(sj[b]))
        ln = int(out_lens[b])
        assert out_buf[b, 0, :ln].tobytes().decode() == res.ref_aligned
        assert out_buf[b, 1, :ln].tobytes().decode() == res.relation
        assert out_buf[b, 2, :ln].tobytes().decode() == res.query_aligned
