"""End-to-end engine tests: file -> engine -> reference-format output ==
oracle output, byte for byte."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy interpret-mode compiles; quick tier skips

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.io.bucketing import BucketSpec

# coarse buckets: one kernel shape per algorithm (interpret tracing is slow)
_SPEC = BucketSpec(batch_pairs=64, query_multiple=128)
from tpu_align.io import parse_pair_file, write_pair_file
from tpu_align.oracle.api import align_batch
from tpu_align.runtime import AlignmentEngine
from tpu_align.runtime.engine import align_file
from tpu_align.utils import synthetic_dataset

ALGOS = [Algorithm.LNW, Algorithm.LSW, Algorithm.ANW, Algorithm.BSW]


@pytest.mark.parametrize("algo", ALGOS)
def test_engine_matches_oracle_end_to_end(algo):
    ds = synthetic_dataset(40, min_len=8, max_len=120, seed=3)
    engine = AlignmentEngine(algo, bucket_spec=_SPEC)
    out = engine.run(ds)
    want = align_batch(algo, AlignmentParams(), list(ds.pairs()), engine="scalar")
    want_text = "".join(r.block() for r in want)
    assert out.output_text() == want_text
    assert out.num_cells == ds.num_cells
    assert out.timer.seconds["kernel"] > 0


def test_engine_scores_only():
    ds = synthetic_dataset(20, min_len=8, max_len=60, seed=4)
    out = AlignmentEngine(Algorithm.LNW, bucket_spec=_SPEC, with_traceback=False).run(ds)
    want = align_batch(Algorithm.LNW, AlignmentParams(), list(ds.pairs()))
    assert list(out.scores()) == [r.score for r in want]
    assert all(r.ref_aligned == "" for r in out.results)


def test_engine_empty_sequence_fallback(tmp_path):
    path = tmp_path / "p.txt"
    path.write_text("0\nACGT\nAC\n1\n\nACGT\n2\nAC\n\n")
    out = align_file(path, Algorithm.LNW, bucket_spec=_SPEC)
    assert [r.pair_num for r in out.results] == [0, 1, 2]
    p = AlignmentParams()
    # empty reference: query aligned against all-deletions
    assert out.results[1].score == 4 * p.gap
    assert out.results[2].score == 2 * p.gap


def test_engine_file_roundtrip(tmp_path):
    ds = synthetic_dataset(10, min_len=5, max_len=30, seed=5)
    path = tmp_path / "pairs.txt"
    write_pair_file(path, list(ds.pairs()))
    out = align_file(path, Algorithm.LSW, bucket_spec=_SPEC)
    ds2 = parse_pair_file(path)
    assert len(out.results) == len(ds2) == 10


def test_engine_checkpoint_resume(tmp_path, monkeypatch):
    ds = synthetic_dataset(24, min_len=8, max_len=40, seed=6)
    engine = AlignmentEngine(Algorithm.LNW, bucket_spec=_SPEC)
    ckpt = str(tmp_path / "ckpt")
    first = engine.run(ds, checkpoint_dir=ckpt)
    import os

    files = [f for f in os.listdir(ckpt) if f.endswith(".json")]
    assert files
    # resume must not dispatch any kernel work
    def boom(*a, **k):
        raise AssertionError("kernel dispatched on full resume")

    monkeypatch.setattr(engine, "_dispatch", boom)
    second = engine.run(ds, checkpoint_dir=ckpt)
    assert second.output_text() == first.output_text()
    # partial resume: drop one checkpoint, restore dispatch
    monkeypatch.undo()
    os.remove(os.path.join(ckpt, files[0]))
    third = engine.run(ds, checkpoint_dir=ckpt)
    assert third.output_text() == first.output_text()


def test_engine_local_mode_all_routes_to_oracle():
    """local_mode='all' must actually deliver BACKTRACK_ALL semantics end
    to end: every co-optimal path from every max cell, matching the oracle
    (c++/LinearSmithWaterman.h:9)."""
    import random

    from tpu_align.io import PairDataset
    from tests.conftest import random_dna

    r = random.Random(11)
    ds = PairDataset.from_pairs(
        [(random_dna(r, 3, 20, alphabet="AC"),
          random_dna(r, 3, 20, alphabet="AC")) for _ in range(12)]
    )
    out = AlignmentEngine(
        Algorithm.LSW, bucket_spec=_SPEC, local_mode="all"
    ).run(ds)
    want = align_batch(Algorithm.LSW, AlignmentParams(), list(ds.pairs()),
                       engine="scalar", local_mode="all")
    assert out.output_text() == "".join(r.block() for r in want)
    # the mode must produce extra paths somewhere on a workload this size
    assert any(r.extra_paths for r in out.results)


def test_engine_local_mode_all_rejects_affine():
    """local_mode='all' covers lsw/bsw (BACKTRACK_ALL) and lnw (co-optimal
    global path enumeration); only the affine aligner is rejected."""
    with pytest.raises(ValueError):
        AlignmentEngine(Algorithm.ANW, local_mode="all")
    AlignmentEngine(Algorithm.LNW, local_mode="all")  # supported


def test_engine_max_inflight_window():
    """Bounded dispatch (V13 STREAM_BATCH_SIZE analogue) must not change
    results, for any window size."""
    ds = synthetic_dataset(30, min_len=5, max_len=100, seed=12)
    spec = BucketSpec(batch_pairs=8, query_multiple=64)
    texts = []
    for win in (1, 2, 0):  # 0 = unbounded
        out = AlignmentEngine(
            Algorithm.LNW, bucket_spec=spec, max_inflight=win
        ).run(ds)
        texts.append(out.output_text())
    assert texts[0] == texts[1] == texts[2]


def test_engine_checkpoint_preserves_extra_paths(tmp_path):
    from tpu_align.core.result import AlignmentResult

    recs = [
        AlignmentResult(0, 5, "AC", "**", "AC",
                        extra_paths=[("A_C", "* *", "ATC")]),
        AlignmentResult(1, 2, "G", "*", "G"),
    ]
    path = str(tmp_path / "ckpt.json")
    AlignmentEngine._save_checkpoint(path, recs)
    back = AlignmentEngine._load_checkpoint(path)
    assert [r.block() for r in back] == [r.block() for r in recs]


@pytest.mark.parametrize("algo", [Algorithm.LNW, Algorithm.LSW,
                                  Algorithm.ANW, Algorithm.BSW])
def test_engine_device_traceback_matches_host(algo):
    """traceback='device' (the V8 move: on-accelerator walk, only move
    streams transfer) must be byte-identical to the host walk -- all four
    aligners (BSW walks the skewed banded layout)."""
    ds = synthetic_dataset(25, min_len=4, max_len=100, seed=21)
    host = AlignmentEngine(algo, bucket_spec=_SPEC, traceback="host").run(ds)
    dev = AlignmentEngine(algo, bucket_spec=_SPEC, traceback="device").run(ds)
    assert dev.output_text() == host.output_text()


def test_engine_device_traceback_rejects_rowscan():
    with pytest.raises(ValueError):
        AlignmentEngine(Algorithm.LNW, kernel="rowscan", traceback="device")


@pytest.mark.parametrize("algo", ALGOS)
def test_engine_blocks_output_byte_identical(algo):
    """output='blocks' (native block formatter, no per-pair Python
    strings) must be byte-identical to the records path -- all four
    aligners, including zero-score local pairs (empty 3 lines)."""
    ds = synthetic_dataset(30, min_len=6, max_len=100, seed=31)
    rec = AlignmentEngine(algo, bucket_spec=_SPEC).run(ds)
    blk = AlignmentEngine(algo, bucket_spec=_SPEC, output="blocks").run(ds)
    assert blk.blocks is not None and not blk.results
    assert blk.output_bytes() == rec.output_text().encode("ascii")
    assert list(blk.scores()) == list(rec.scores())


def test_engine_blocks_output_device_traceback():
    ds = synthetic_dataset(20, min_len=4, max_len=80, seed=32)
    rec = AlignmentEngine(
        Algorithm.LNW, bucket_spec=_SPEC, traceback="device"
    ).run(ds)
    blk = AlignmentEngine(
        Algorithm.LNW, bucket_spec=_SPEC, traceback="device", output="blocks"
    ).run(ds)
    assert blk.output_bytes() == rec.output_text().encode("ascii")


def test_engine_blocks_empty_pairs_and_scores_only(tmp_path):
    # oracle-fallback pairs (empty sides, negative scores) interleave with
    # kernel pairs and must land in pair order in the byte stream
    path = tmp_path / "p.txt"
    path.write_text("0\nACGT\nAC\n1\n\nACGT\n2\nAC\n\n3\nGATTACA\nGCATGCU\n")
    rec = align_file(path, Algorithm.LNW, bucket_spec=_SPEC)
    blk = align_file(path, Algorithm.LNW, bucket_spec=_SPEC, output="blocks")
    assert blk.output_bytes() == rec.output_text().encode("ascii")
    ds = synthetic_dataset(12, min_len=5, max_len=40, seed=33)
    rec = AlignmentEngine(
        Algorithm.LNW, bucket_spec=_SPEC, with_traceback=False
    ).run(ds)
    blk = AlignmentEngine(
        Algorithm.LNW, bucket_spec=_SPEC, with_traceback=False,
        output="blocks",
    ).run(ds)
    assert blk.output_bytes() == rec.output_text().encode("ascii")
    assert list(blk.scores()) == list(rec.scores())


def test_engine_blocks_local_mode_all():
    out = AlignmentEngine(
        Algorithm.LSW, bucket_spec=_SPEC, local_mode="all", output="blocks"
    ).run(synthetic_dataset(6, min_len=4, max_len=15, seed=35))
    want = AlignmentEngine(
        Algorithm.LSW, bucket_spec=_SPEC, local_mode="all"
    ).run(synthetic_dataset(6, min_len=4, max_len=15, seed=35))
    assert out.output_bytes() == want.output_text().encode("ascii")


def test_engine_blocks_checkpoint_resume(tmp_path, monkeypatch):
    """Kill-and-resume for the blocks path (the CLI default): per-bucket
    .npz parts persist the formatted bytes; a resumed run re-dispatches
    nothing and the final stream is byte-identical."""
    import os

    ds = synthetic_dataset(24, min_len=8, max_len=40, seed=6)
    engine = AlignmentEngine(Algorithm.LNW, bucket_spec=_SPEC,
                             output="blocks")
    ref = engine.run(ds)  # no checkpointing: the byte-stream oracle
    ckpt = str(tmp_path / "ckpt")
    first = engine.run(ds, checkpoint_dir=ckpt)
    assert bytes(first.blocks) == bytes(ref.blocks)
    files = [f for f in os.listdir(ckpt) if f.endswith(".npz")]
    assert files
    # full resume must not dispatch any kernel work
    def boom(*a, **k):
        raise AssertionError("kernel dispatched on full resume")

    monkeypatch.setattr(engine, "_dispatch", boom)
    second = engine.run(ds, checkpoint_dir=ckpt)
    assert bytes(second.blocks) == bytes(ref.blocks)
    # partial resume ("killed" mid-run): drop one part, restore dispatch
    monkeypatch.undo()
    os.remove(os.path.join(ckpt, files[0]))
    third = engine.run(ds, checkpoint_dir=ckpt)
    assert bytes(third.blocks) == bytes(ref.blocks)
    # a records-path run shares the dir without clashing (.json files)
    rec_engine = AlignmentEngine(Algorithm.LNW, bucket_spec=_SPEC)
    rec = rec_engine.run(ds, checkpoint_dir=ckpt)
    assert rec.output_text().encode() == bytes(ref.blocks)


def test_engine_prestage_byte_identical():
    """Device-resident inputs (engine.prestage, the PCIe-host e2e
    configuration bench.py --prestage measures) must run the identical
    pipeline: same blocks bytes and scores as an un-staged run, and the
    staging must actually be consumed (every bucket's blob registered)."""
    ds = synthetic_dataset(30, min_len=6, max_len=100, seed=33)
    ref = AlignmentEngine(
        Algorithm.LNW, bucket_spec=_SPEC, traceback="device",
        output="blocks",
    ).run(ds)
    engine = AlignmentEngine(
        Algorithm.LNW, bucket_spec=_SPEC, traceback="device",
        output="blocks",
    )
    nbytes = engine.prestage(ds)
    assert nbytes > 0
    assert len(engine._prestaged) == len(engine._buckets_of(ds))
    out = engine.run(ds)
    assert bytes(out.blocks) == bytes(ref.blocks)
    assert list(out.scores()) == list(ref.scores())
    # prestage is a no-op for configurations without the fused-blob path
    assert AlignmentEngine(Algorithm.BSW, bucket_spec=_SPEC).prestage(ds) == 0
