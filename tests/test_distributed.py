"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.distributed import (
    fill_sharded, global_stats, make_pairs_mesh, shard_bucket_spec,
)
from tpu_align.io import BucketSpec, bucketize
from tpu_align.oracle.api import align_pair
from tpu_align.utils import synthetic_dataset

import os

GOLDENS_DIR = os.path.join(os.path.dirname(__file__), "..", "goldens")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)]


def test_fill_sharded_matches_oracle():
    mesh = make_pairs_mesh(jax.devices()[:8])
    params = AlignmentParams()
    ds = synthetic_dataset(64, min_len=16, max_len=48, seed=11)
    spec = shard_bucket_spec(mesh, BucketSpec(batch_pairs=64, query_multiple=64))
    assert spec.pair_multiple == 64
    for bucket in bucketize(ds, spec):
        scores, srow, scol, dirs = fill_sharded(
            mesh, Algorithm.LNW, params,
            bucket.ref_tokens, bucket.qry_tokens, bucket.ref_len, bucket.qry_len,
        )
        s = np.asarray(scores)
        # stagger layout: (stripes, W, S, B) with batch on the last axis
        assert dirs.shape[-1] == bucket.batch
        for row in range(bucket.num_real):
            i = int(bucket.pair_ids[row])
            want = align_pair(Algorithm.LNW, params, *ds.pair(i), engine="scalar")
            assert int(s[row]) == want.score


def test_global_stats_collectives():
    mesh = make_pairs_mesh(jax.devices()[:8])
    scores = np.arange(64, dtype=np.int32)
    cells = np.full(64, 10, np.int64)
    mx, total = global_stats(mesh, scores, cells)
    assert int(mx) == 63
    assert int(total) == 640


def test_dryrun_multichip_entrypoint():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, example_args = mod.entry()
    scores, dirs = jax.jit(fn)(*example_args)
    jax.block_until_ready((scores, dirs))
    assert scores.shape[0] == example_args[0].shape[0]


def test_host_shard_and_merge(tmp_path):
    from tpu_align.core.params import AlignmentParams
    from tpu_align.distributed import host_shard, merge_output_files, renumber
    from tpu_align.oracle.api import align_batch

    ds = synthetic_dataset(20, min_len=5, max_len=20, seed=21)
    params = AlignmentParams()
    paths = []
    for pi in range(3):  # simulate 3 hosts
        shard, ids = host_shard(ds, process_index=pi, process_count=3)
        results = align_batch(Algorithm.LNW, params, list(shard.pairs()))
        renumber(results, ids)
        p = tmp_path / f"out_{pi}.txt"
        p.write_text("".join(r.block() for r in results))
        paths.append(p)
    merged = tmp_path / "merged.txt"
    merge_output_files(paths, merged)
    want = "".join(
        r.block() for r in align_batch(Algorithm.LNW, params, list(ds.pairs()))
    )
    assert merged.read_text() == want


def test_walk_sharded_matches_single_device():
    """The full V8 pipeline sharded: fill + device walk both run under the
    pairs mesh; per-lane move sequences equal the single-device walk's
    (each shard phases independently, so raw stream positions differ)."""
    from tpu_align.distributed import walk_sharded
    from tpu_align.kernels.stagger import STRIPE_S
    from tpu_align.traceback.device import (
        device_traceback_moves, unpack_moves,
    )

    mesh = make_pairs_mesh(jax.devices()[:8])
    params = AlignmentParams()
    ds = synthetic_dataset(64, min_len=16, max_len=48, seed=13)
    spec = shard_bucket_spec(mesh, BucketSpec(batch_pairs=64,
                                              query_multiple=64))
    for bucket in bucketize(ds, spec):
        scores, srow, scol, dirs = fill_sharded(
            mesh, Algorithm.LSW, params,
            bucket.ref_tokens, bucket.qry_tokens, bucket.ref_len,
            bucket.qry_len,
        )
        px, tx = device_traceback_moves(
            Algorithm.LSW, params, np.asarray(dirs), np.asarray(srow),
            np.asarray(scol), np.asarray(scores), STRIPE_S, walker="xla")

        def seqs(p, steps):
            codes = unpack_moves(p, steps)
            return [tuple(c for c in codes[:, b] if c)
                    for b in range(codes.shape[1])]

        for walker in ("xla", "pallas"):
            packed, t = walk_sharded(mesh, Algorithm.LSW, params, dirs,
                                     srow, scol, scores, STRIPE_S,
                                     walker=walker)
            assert seqs(packed, t) == seqs(px, tx), walker


def test_merge_streams_without_loading_files(tmp_path):
    """The k-way merge is streaming: many blocks, interleaved ids across
    shards, output equals the globally sorted concatenation."""
    from tpu_align.distributed import merge_output_files

    n_shards, n_blocks = 3, 2000
    paths = []
    blocks = {}
    for s in range(n_shards):
        p = tmp_path / f"shard_{s}.txt"
        with open(p, "w") as f:
            for i in range(s, n_shards * n_blocks, n_shards):
                b = f"{i} | {i % 7}\nAC_GT\n** *|\nACTGA\n"
                blocks[i] = b
                f.write(b)
        paths.append(p)
    out = tmp_path / "merged.txt"
    merge_output_files(paths, out)
    assert out.read_text() == "".join(blocks[i] for i in sorted(blocks))


def test_merge_rejects_unsorted_shard(tmp_path):
    from tpu_align.distributed import merge_output_files

    p = tmp_path / "bad.txt"
    p.write_text("2 | 5\nAA\n**\nAA\n1 | 5\nAA\n**\nAA\n")
    with pytest.raises(ValueError, match="not sorted"):
        merge_output_files([p], tmp_path / "out.txt")


_CHILD_SCRIPT = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from tpu_align.core.params import Algorithm
from tpu_align.distributed import host_shard, renumber
from tpu_align.io.bucketing import BucketSpec
from tpu_align.runtime.engine import AlignmentEngine
from tpu_align.utils import synthetic_dataset

pi, pc, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
ds = synthetic_dataset(24, min_len=5, max_len=20, seed=33)
shard, ids = host_shard(ds, process_index=pi, process_count=pc)
engine = AlignmentEngine(Algorithm.LNW,
                         bucket_spec=BucketSpec(batch_pairs=32),
                         output="records", interpret=True)
out = engine.run(shard)
renumber(out.results, ids)
with open(out_path, "w") as f:
    for r in sorted(out.results, key=lambda r: r.pair_num):
        f.write(r.block())
"""


def test_two_process_multihost_flow(tmp_path):
    """Real 2-process multihost simulation: separate OS processes each
    run the engine on their host_shard (explicit process_index/count --
    the pod flow minus the jax.distributed coordinator), renumber to
    global ids, write per-host files; the parent k-way merges and the
    result must byte-match a single-process run over the whole dataset."""
    import subprocess
    import sys as _sys

    from tpu_align.distributed import merge_output_files
    from tpu_align.io.bucketing import BucketSpec
    from tpu_align.runtime.engine import AlignmentEngine

    script = tmp_path / "child.py"
    script.write_text(_CHILD_SCRIPT)
    paths = [tmp_path / f"host_{pi}.txt" for pi in range(2)]
    procs = [
        subprocess.Popen([_sys.executable, str(script), str(pi), "2",
                          str(paths[pi])])
        for pi in range(2)
    ]
    for pr in procs:
        assert pr.wait(timeout=300) == 0
    merged = tmp_path / "merged.txt"
    merge_output_files(paths, merged)

    ds = synthetic_dataset(24, min_len=5, max_len=20, seed=33)
    want = AlignmentEngine(
        Algorithm.LNW, bucket_spec=BucketSpec(batch_pairs=32),
        output="records", interpret=True,
    ).run(ds).output_text()
    assert merged.read_text() == want


@pytest.mark.parametrize("algo", [Algorithm.ANW, Algorithm.BSW])
def test_fill_and_walk_sharded_all_aligners(algo):
    """Sharded fill + device walk for the affine and banded aligners
    (LNW/LSW covered above): scores match the oracle and the sharded
    walk's per-lane move sequences equal the single-device walk's."""
    from tpu_align.distributed import walk_sharded
    from tpu_align.kernels.stagger import STRIPE_S
    from tpu_align.traceback.device import device_traceback_moves, unpack_moves

    mesh = make_pairs_mesh(jax.devices()[:8])
    params = AlignmentParams()
    ds = synthetic_dataset(64, min_len=16, max_len=48, seed=17)
    spec = shard_bucket_spec(mesh, BucketSpec(batch_pairs=64,
                                              query_multiple=64))
    for bucket in bucketize(ds, spec):
        scores, srow, scol, dirs = fill_sharded(
            mesh, algo, params,
            bucket.ref_tokens, bucket.qry_tokens, bucket.ref_len,
            bucket.qry_len,
        )
        s = np.asarray(scores)
        for row in range(bucket.num_real):
            i = int(bucket.pair_ids[row])
            want = align_pair(algo, params, *ds.pair(i), engine="scalar")
            assert int(s[row]) == want.score, (row, int(s[row]), want.score)
        packed, t = walk_sharded(mesh, algo, params, dirs, srow, scol,
                                 scores, STRIPE_S)
        px, tx = device_traceback_moves(
            algo, params, np.asarray(dirs), np.asarray(srow),
            np.asarray(scol), np.asarray(scores), STRIPE_S, walker="xla")

        def seqs(p, steps):
            codes = unpack_moves(p, steps)
            return [tuple(c for c in codes[:, b] if c)
                    for b in range(codes.shape[1])]

        assert seqs(packed, t) == seqs(px, tx)


@pytest.mark.parametrize("algo,traceback", [
    (Algorithm.LNW, "device"),
    (Algorithm.ANW, "host"),
    (Algorithm.BSW, "device"),
])
def test_engine_sharded_matches_single_device(algo, traceback):
    """Engine-level sharded run: mesh=... must produce byte-identical
    output to the single-device engine (full pipeline under shard_map)."""
    from tpu_align.runtime.engine import AlignmentEngine

    mesh = make_pairs_mesh(jax.devices()[:8])
    ds = synthetic_dataset(48, min_len=12, max_len=40, seed=19)
    kwargs = dict(bucket_spec=BucketSpec(batch_pairs=64),
                  traceback=traceback, output="blocks")
    got = AlignmentEngine(algo, mesh=mesh, **kwargs).run(ds).output_text()
    want = AlignmentEngine(algo, **kwargs).run(ds).output_text()
    assert got == want


def test_cli_mesh_flag(tmp_path):
    """tpu-align -mesh N: the sharded engine is CLI-reachable and its
    output byte-matches the single-device run."""
    from tpu_align.cli import main

    d = os.path.join(GOLDENS_DIR, "lnw")
    a = tmp_path / "mesh.txt"
    b = tmp_path / "single.txt"
    argv = ["-pairs", os.path.join(d, "input-data.txt"), "-algorithm", "lnw",
            "-batch-pairs", "128"]
    assert main(argv + ["-mesh", "-1", "-out", str(a)]) == 0
    assert main(argv + ["-out", str(b)]) == 0
    assert a.read_text() == b.read_text()


def test_engine_sharded_honors_stripe_s():
    """A non-default stagger stripe width must flow through fill_sharded
    into the sharded fill (and match the walkers' view of the dirs
    layout): mesh + stripe_s=16 is byte-identical to the unsharded run
    AND to the default-stripe output.  Regression: fill_sharded used to
    drop stripe_s, silently filling S=32 dirs that the engine then
    decoded as S=16."""
    from tpu_align.runtime.engine import AlignmentEngine

    mesh = make_pairs_mesh(jax.devices()[:8])
    ds = synthetic_dataset(48, min_len=12, max_len=40, seed=23)
    kwargs = dict(bucket_spec=BucketSpec(batch_pairs=64),
                  traceback="device", output="blocks", stripe_s=16)
    got = AlignmentEngine(Algorithm.LNW, mesh=mesh, **kwargs).run(ds)
    want = AlignmentEngine(Algorithm.LNW, **kwargs).run(ds)
    ref = AlignmentEngine(Algorithm.LNW, bucket_spec=BucketSpec(
        batch_pairs=64), output="blocks").run(ds)
    assert got.output_text() == want.output_text() == ref.output_text()


def test_sharded_walk_refuses_ef_bitless_affine(monkeypatch):
    """The sharded walk dispatcher must refuse EF-bit-less affine dirs
    like every other walk entry point (TPU_ALIGN_ANW_EF_BITS=0 is a
    scores-only bench knob)."""
    from tpu_align.distributed.sharding import walk_sharded_dispatch

    monkeypatch.setenv("TPU_ALIGN_ANW_EF_BITS", "0")
    mesh = make_pairs_mesh(jax.devices()[:8])
    with pytest.raises(RuntimeError, match="EF_BITS"):
        walk_sharded_dispatch(mesh, Algorithm.ANW, AlignmentParams(),
                              None, None, None, None, 32)


def test_cli_mesh_rejects_unsharded_modes(tmp_path, capsys):
    """-mesh with -all-paths / -traceback hirschberg exits 2 with a clear
    message instead of an uncaught NotImplementedError."""
    from tpu_align.cli import main as cli_main
    from tpu_align.io import write_pair_file

    path = tmp_path / "p.txt"
    write_pair_file(path, [("ACGT", "ACG")])
    rc = cli_main(["-pairs", str(path), "-mesh", "2",
                   "-traceback", "hirschberg", "-no-output"])
    assert rc == 2
    assert "unsharded" in capsys.readouterr().err
