"""The batch alignment engine: parse -> bucketize -> fill -> traceback -> format.

Pipeline structure mirrors the reference's end-state V19 flow (SURVEY.md
section 3.3): all bucket kernels are dispatched asynchronously up front
(JAX async dispatch = the V19 async kernel launch), then the host walks
tracebacks bucket-by-bucket, blocking only on the bucket it is about to
walk while later kernels still run on device -- the V19 "print batch N-1
while kernel N runs" overlap (V19.cu:536-585).

Phase accounting follows the reference's timer buckets (memory management /
kernel / backtracking / printing, V19.cu:675-680); GCUPS uses the parsed
numCells (c++/parseInput.cpp:100).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import sys
import time

import jax
import numpy as np

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.core.result import AlignmentResult, results_from_arrays
from tpu_align.io.bucketing import Bucket, BucketSpec, bucketize
from tpu_align.io.dataset import PairDataset
from tpu_align.kernels.banded import fill_banded_bucket_async
from tpu_align.kernels.fill import BucketFill, fill_bucket_async
from tpu_align.kernels.stagger import STRIPE_S, fill_stagger_bucket_async
from tpu_align.oracle.api import align_pair
from tpu_align.runtime.profiler import PhaseTimer
from tpu_align.traceback.host import traceback_bucket, traceback_bucket_arrays
from tpu_align.utils.hostmem import tune_malloc_for_large_buffers

# The engine's host pipeline reallocates ~100 MB of block buffers per run;
# keep them heap-resident so first-touch faults are paid once per process
# (utils/hostmem.py).
tune_malloc_for_large_buffers()


@dataclasses.dataclass
class EngineResult:
    results: list[AlignmentResult]  # sorted by pair_num (output="records")
    timer: PhaseTimer
    num_cells: int
    # output="blocks" fast path: the fully formatted reference-format byte
    # stream (pair order) and the matching per-pair scores; `results` is
    # empty -- no per-pair Python objects were ever built.
    blocks: np.ndarray | None = None       # (total_bytes,) uint8
    pair_scores: np.ndarray | None = None  # (num_pairs,) int64, pair order

    @property
    def gcups(self) -> float:
        return self.timer.gcups(self.num_cells, "kernel")

    def output_bytes(self) -> bytes:
        """Reference-format output blocks as raw bytes (pair order)."""
        if self.blocks is not None:
            return self.blocks.tobytes()
        return self.output_text().encode("ascii")

    def output_text(self) -> str:
        """Reference-format output: 4-line blocks in pair order."""
        if self.blocks is not None:
            return self.blocks.tobytes().decode("ascii")
        return "".join(r.block() for r in self.results)

    def scores(self) -> np.ndarray:
        if self.pair_scores is not None:
            return self.pair_scores
        return np.array([r.score for r in self.results], np.int64)


class _BlockCollector:
    """Accumulates formatted output blocks bucket-by-bucket (the V19
    "print batch N-1 while kernel N runs" overlap) and assembles the
    final pair-ordered byte stream.

    The fast path never materializes per-pair Python strings: the native
    walker / replayer hand raw (out_buf, out_lens) arrays to the threaded
    native block formatter (native/tpualign.cpp ta_format_blocks -- the
    reference's per-pair printf loop, c++/backtrack.cpp:205-210,
    vectorized), and the final pair-order gather is one native pass
    (ta_gather_spans).  Oracle-path pairs (empty sides, local_mode="all")
    enter as AlignmentResults and are formatted in Python -- both entry
    points produce byte-identical blocks."""

    def __init__(self):
        # (ids int64 (B,), scores int64 (B,), chunk uint8, spans int64 (B,2))
        self.parts: list[tuple] = []

    def add_arrays(self, ids, scores, out_buf, out_lens) -> None:
        from tpu_align.native import native_format_blocks

        ids = np.asarray(ids)
        scores = np.asarray(scores)
        nat = native_format_blocks(ids, scores, out_buf, out_lens)
        if nat is not None:
            chunk, spans = nat
        else:  # pure-Python fallback (native library absent)
            blobs = []
            for k in range(ids.shape[0]):
                ln = int(out_lens[k])
                blobs.append(
                    f"{int(ids[k])} | {int(scores[k])}\n".encode("ascii")
                    + out_buf[k, 0, :ln].tobytes() + b"\n"
                    + out_buf[k, 1, :ln].tobytes() + b"\n"
                    + out_buf[k, 2, :ln].tobytes() + b"\n"
                )
            chunk, spans = self._spans_of(blobs)
        self.parts.append((ids.astype(np.int64), scores.astype(np.int64),
                           chunk, spans))

    def add_chunk(self, ids, scores, chunk, spans) -> None:
        """Add pre-formatted blocks (the fused native replay+format path,
        ta_replay_events_blocks): chunk holds each pair's 4-line block at
        spans[b] = (offset, length)."""
        self.parts.append((np.asarray(ids, np.int64).reshape(-1),
                           np.asarray(scores, np.int64).reshape(-1),
                           chunk, spans))

    def add_scores(self, ids, scores) -> None:
        """Scores-only blocks: header line + three empty lines (the
        reference's V6 output shape)."""
        n = np.asarray(ids).shape[0]
        self.add_arrays(ids, scores, np.zeros((n, 3, 1), np.uint8),
                        np.zeros(n, np.int32))

    def add_results(self, results: list[AlignmentResult]) -> None:
        if not results:
            return
        chunk, spans = self._spans_of(
            [r.block().encode("ascii") for r in results]
        )
        self.parts.append((
            np.array([r.pair_num for r in results], np.int64),
            np.array([r.score for r in results], np.int64),
            chunk, spans,
        ))

    @staticmethod
    def _spans_of(blobs: list[bytes]):
        spans = np.zeros((len(blobs), 2), np.int64)
        at = 0
        for k, blob in enumerate(blobs):
            spans[k] = (at, len(blob))
            at += len(blob)
        return np.frombuffer(b"".join(blobs), np.uint8), spans

    def finalize(self):
        """-> (blocks uint8 byte stream, scores int64), both pair-ordered.

        The native multi-source gather (ta_gather_parts) copies each
        block straight from its part's chunk into the final buffer --
        one threaded pass over the output bytes instead of
        concatenate + gather (3 full passes at ~78 MB/100k pairs)."""
        from tpu_align.native import native_gather_parts, native_gather_spans

        if not self.parts:
            return np.zeros(0, np.uint8), np.zeros(0, np.int64)
        ids = np.concatenate([p[0] for p in self.parts])
        scores = np.concatenate([p[1] for p in self.parts])
        spans = np.vstack([p[3] for p in self.parts])
        part_of = np.concatenate([
            np.full(p[3].shape[0], k, np.int32)
            for k, p in enumerate(self.parts)
        ])
        order = np.argsort(ids, kind="stable")
        blocks = native_gather_parts([p[2] for p in self.parts], spans,
                                     part_of, order)
        if blocks is None:  # native library absent: concatenate + gather
            base = row = 0
            for p in self.parts:
                spans[row:row + p[3].shape[0], 0] += base
                base += p[2].size
                row += p[3].shape[0]
            src = (np.concatenate([p[2] for p in self.parts])
                   if len(self.parts) > 1 else self.parts[0][2])
            blocks = native_gather_spans(src, spans, order)
            if blocks is None:  # pure-Python fallback
                blocks = (np.concatenate(
                    [src[spans[b, 0]:spans[b, 0] + spans[b, 1]]
                     for b in order]
                ) if order.size else np.zeros(0, np.uint8))
        return blocks, scores[order]


class AlignmentEngine:
    """Aligns PairDatasets on TPU with host traceback.

    with_traceback=False gives the scores-only fast path (no direction
    matrices, no alignment strings -- the V6 mode, V6.cu:28-35).
    """

    def __init__(
        self,
        algorithm: Algorithm,
        params: AlignmentParams | None = None,
        bucket_spec: BucketSpec | None = None,
        with_traceback: bool = True,
        interpret: bool | None = None,
        local_mode: str = "single",
        max_inflight: int = 4,
        kernel: str = "auto",
        traceback: str = "host",
        walker: str = "xla",
        output: str = "records",
        mesh=None,
        stripe_s: int | None = None,
    ):
        """local_mode (local aligners only): "single" follows the CUDA host
        semantics (one path from the first row-major max cell); "all"
        enumerates every co-optimal path from every max cell (the CPU
        BACKTRACK_ALL compile switch, c++/LinearSmithWaterman.h:9) -- this
        mode needs the score matrix, so run() routes EVERY pair through the
        oracle path (no kernels) when it is selected.

        max_inflight bounds the number of bucket kernels dispatched ahead of
        the consumer (the reference's STREAM_BATCH_SIZE,
        cuda/LNW/LinearNeedlemanWunschV13.cu:10): device memory holds at
        most max_inflight buckets' direction tensors at once, so HBM
        footprint is O(max_inflight * bucket) instead of O(dataset).
        0 / None = unbounded.

        kernel selects the fill formulation for LNW/LSW/ANW: "stagger"
        (anti-diagonal wavefront, kernels/stagger.py -- the fast path),
        "rowscan" (row sweep + prefix-max scan, kernels/fill.py), or
        "auto" (stagger).  BSW always uses the skewed banded kernel.

        traceback="device" walks the packed directions ON the accelerator
        (the reference's V8 move, traceback/device.py) so only 2-bit move
        streams cross the host boundary -- ~128x less device-to-host
        transfer than the direction tensor; output is byte-identical to
        the host walk.  LNW/LSW/ANW walk the stagger layout (requires
        kernel="stagger"); BSW walks the skewed banded layout.

        traceback="hirschberg" (LNW/LSW/ANW) stores NO directions at all:
        O(M+N)-memory divide-and-conquer recompute
        (traceback/hirschberg.py) for pairs whose direction tensor cannot
        be materialized.  Emits A co-optimal alignment (exact score), not
        necessarily the byte-identical tie-chain path.

        walker selects the device-walk engine for LNW/LSW/ANW:
        "xla" (jitted while_loop) or "pallas" (one Pallas program with
        the stripe slab in VMEM, traceback/walk_kernel.py).  Per-lane
        move sequences are identical (shared decide_step).

        output="blocks" skips per-pair AlignmentResult objects entirely:
        walker output arrays feed the threaded native block formatter
        (the reference's printf loop, c++/backtrack.cpp:205-210) and
        EngineResult carries one pair-ordered byte stream
        (EngineResult.blocks / output_bytes()) -- byte-identical to the
        "records" text but with no Python-string printing cost.  Both
        output modes support checkpoint_dir (blocks persist per-bucket
        .npz parts; records persist .json).

        mesh: a jax.sharding.Mesh (distributed.make_pairs_mesh) runs every
        bucket's fill -- and device walk, when traceback="device" -- data
        parallel over the mesh's `pairs` axis (shard_map; pure data
        parallelism, collectives only in global_stats).  The bucket spec
        is adjusted so batches divide the mesh; output stays
        byte-identical to the single-device run.  Device traceback over a
        mesh honours `walker` (each chip walks its own shard; the Pallas
        walk kernel runs per-shard inside shard_map)."""
        self.algorithm = algorithm
        self.params = params or AlignmentParams()
        self.bucket_spec = bucket_spec or BucketSpec()
        self.with_traceback = with_traceback
        self.interpret = interpret
        if local_mode not in ("single", "all"):
            raise ValueError(f"unknown local_mode {local_mode!r}")
        if local_mode == "all" and algorithm is Algorithm.ANW:
            raise ValueError(
                "local_mode='all' supports lsw/bsw (BACKTRACK_ALL) and lnw "
                "(co-optimal global paths), not the affine aligner")
        self.local_mode = local_mode
        self.max_inflight = max_inflight or 0
        if kernel not in ("auto", "stagger", "rowscan"):
            raise ValueError(f"unknown kernel {kernel!r}")
        self.kernel = "stagger" if kernel == "auto" else kernel
        if traceback not in ("host", "device", "hirschberg"):
            raise ValueError(f"unknown traceback mode {traceback!r}")
        if (traceback == "device" and self.kernel != "stagger"
                and algorithm is not Algorithm.BSW):
            raise ValueError(
                "traceback='device' requires the stagger kernel "
                "(LNW/LSW/ANW) or the banded BSW kernel"
            )
        if traceback == "hirschberg" and algorithm is Algorithm.BSW:
            raise ValueError(
                "traceback='hirschberg' supports LNW/LSW/ANW (BSW "
                "direction storage is already O(M*band))"
            )
        self.traceback_mode = traceback
        if walker not in ("xla", "pallas"):
            raise ValueError(f"unknown walker {walker!r}")
        self.walker = walker
        if output not in ("records", "blocks"):
            raise ValueError(f"unknown output mode {output!r}")
        self.output = output
        # stagger stripe width (the LNW V1 -threads-per-alignment analogue,
        # cuda/LNW/LinearNeedlemanWunsch.cu:199-225); default = measured
        # optimum STRIPE_S
        self.stripe_s = int(stripe_s) if stripe_s else STRIPE_S
        self.mesh = mesh
        self._prestaged: dict[str, object] = {}  # see prestage()
        if mesh is not None:
            if traceback == "hirschberg" or local_mode == "all":
                raise ValueError(
                    "mesh covers the bucketed kernel path; hirschberg and "
                    "all-paths modes run their own fills -- use host_shard "
                    "to split those workloads across processes instead")
            from tpu_align.distributed.sharding import shard_bucket_spec
            self.bucket_spec = shard_bucket_spec(mesh, self.bucket_spec)

    def _oracle_fallback(self, ds: PairDataset, i: int) -> AlignmentResult:
        ref, qry = ds.pair(i)
        return align_pair(
            self.algorithm, self.params, ref, qry, pair_num=i, engine="scalar",
            local_mode=self.local_mode,
        )

    def _upload(self, b: Bucket):
        """Stage one bucket's packed token upload from a worker thread
        (blocking until the H2D completes): several upload workers run
        concurrent tunnel streams, which move ~1.5x the aggregate
        bytes/sec of one stream (scripts/probe_tunnel.py).  The whole
        bucket -- tokens, LUTs, AND length vectors -- is fused into one
        flat buffer so each bucket costs ONE transfer's ~24 ms dispatch
        overhead instead of six (io/packing.FusedBlob).  Returns the
        prestaged FusedBlob for fill_stagger_bucket_async, or None when
        the packed path does not apply (raw tokens upload at dispatch)."""
        import dataclasses

        from tpu_align.io.packing import fuse_bucket_blob
        from tpu_align.kernels.fill import host_pack_tokens

        t0 = time.perf_counter()
        packed = host_pack_tokens(b.ref_tokens, b.qry_tokens,
                                  b.ref_len, b.qry_len)
        if packed is None:
            return None
        fb = fuse_bucket_blob(packed, b.ref_len, b.qry_len)
        t1 = time.perf_counter()
        staged = jax.device_put(fb.blob)
        jax.block_until_ready(staged)
        if os.environ.get("TPU_ALIGN_TRACE_UPLOAD"):
            t2 = time.perf_counter()
            print(f"[upload] {fb.blob.nbytes / 1e6:.2f} MB: "
                  f"pack {t1 - t0:.3f}s put {t2 - t1:.3f}s "
                  f"({fb.blob.nbytes / 1e6 / max(t2 - t1, 1e-9):.1f} MB/s)",
                  file=sys.stderr, flush=True)
        return dataclasses.replace(fb, blob=staged)

    def _dispatch(self, b: Bucket, prestaged=None):
        """Dispatch one bucket's fill.  BSW takes the skewed banded
        fast-path kernel (O(M*2band) work instead of O(M*N)); the other
        aligners take the stagger wavefront kernel unless kernel="rowscan"
        was requested.  With a mesh, the fill runs shard_map data-parallel
        over the `pairs` axis."""
        if self.mesh is not None:
            from tpu_align.distributed.sharding import fill_sharded
            return fill_sharded(
                self.mesh, self.algorithm, self.params,
                b.ref_tokens, b.qry_tokens, b.ref_len, b.qry_len,
                with_traceback=self.with_traceback, interpret=self.interpret,
                kernel=self.kernel, stripe_s=self.stripe_s,
            )
        if self.algorithm is Algorithm.BSW:
            return fill_banded_bucket_async(
                self.params, b.ref_tokens, b.qry_tokens, b.ref_len, b.qry_len,
                with_traceback=self.with_traceback, interpret=self.interpret,
            )
        if self.kernel == "stagger":
            return fill_stagger_bucket_async(
                self.algorithm, self.params, b.ref_tokens, b.qry_tokens,
                b.ref_len, b.qry_len, stripe_s=self.stripe_s,
                with_traceback=self.with_traceback, interpret=self.interpret,
                prestaged=prestaged,
            )
        return fill_bucket_async(
            self.algorithm, self.params, b.ref_tokens, b.qry_tokens,
            b.ref_len, b.qry_len,
            with_traceback=self.with_traceback, interpret=self.interpret,
        )

    def _walk_dispatch(self, outs):
        """Dispatch the on-device walk behind a bucket's fill; returns a
        device_walk_finalize handle.  Sharded when the engine has a mesh.

        The bucket's scores/starts ride the walk's readback as extras and
        host copies start immediately, so consuming a bucket costs ONE
        device round trip and the transfer overlaps earlier buckets'
        host replay (readback coalescing + D2H pipelining).  For GLOBAL
        aligners the start coordinates are just the pair lengths -- the
        host already has them (the bucket arrays) -- so only the scores
        ride the readback."""
        if self.algorithm.is_local or self.mesh is not None:
            extras = (outs[0], outs[1], outs[2])
        else:
            extras = (outs[0],)  # scores only; starts are host-known
        if self.mesh is not None:
            from tpu_align.distributed.sharding import walk_sharded_dispatch
            return walk_sharded_dispatch(
                self.mesh, self.algorithm, self.params, outs[3], outs[1],
                outs[2], outs[0], self.stripe_s, extras=extras,
                walker=self.walker,
            )
        from tpu_align.traceback.device import device_walk_dispatch_events

        # event-compacted readback (~10x smaller D2H at read-scale indel
        # rates); falls back to the full move stream automatically for
        # shapes its payload encoding cannot represent or on overflow
        return device_walk_dispatch_events(
            self.algorithm, self.params, outs[3], outs[1], outs[2],
            outs[0], self.stripe_s, walker=self.walker, extras=extras,
        )

    def _finalize_args(self, b: Bucket, outs):
        """Arguments for finalize_any beyond the handle: host-side start
        coordinates for global walks (no device fetch), device handles
        otherwise (ignored when the extras rode the readback)."""
        if not self.algorithm.is_local and self.mesh is None:
            return (outs[0], np.ascontiguousarray(b.qry_len, np.int32),
                    np.ascontiguousarray(b.ref_len, np.int32))
        return (outs[0], outs[1], outs[2])

    def warmup(self, ds: PairDataset) -> None:
        """Compile every program this dataset's run will execute (keeps
        compile time out of the measured phases): one fill per distinct
        bucket shape at the REAL batch shape (a different batch is a
        different executable), plus the device-walk program when
        traceback='device'."""
        seen: set[tuple] = set()
        for b in bucketize(ds, self.bucket_spec):
            shape = (b.ref_tokens.shape, b.qry_tokens.shape)
            if shape in seen:
                continue
            seen.add(shape)
            outs = self._dispatch(b)
            if (self.traceback_mode == "device" and self.with_traceback
                    and outs[3] is not None):
                from tpu_align.traceback.device import (
                    device_walk_finalize,
                    device_walk_finalize_events,
                )

                handle = self._walk_dispatch(outs)
                if isinstance(handle, dict):
                    device_walk_finalize_events(handle)
                else:
                    device_walk_finalize(handle)
            jax.block_until_ready([o for o in outs if o is not None])

    def _buckets_of(self, ds: PairDataset) -> list[Bucket]:
        """Bucketize the kernel-eligible pairs with dataset-level ids
        (the same buckets run() processes, in the same order)."""
        main_idx = np.flatnonzero((ds.ref_len > 0) & (ds.qry_len > 0))
        buckets = bucketize(ds.select(main_idx), self.bucket_spec)
        # bucket pair_ids index into the selection; remap to dataset ids
        for b in buckets:
            real = b.pair_ids >= 0
            b.pair_ids[real] = main_idx[b.pair_ids[real]]
        return buckets

    def prestage(self, ds: PairDataset) -> int:
        """Upload every bucket's fused token blob to the device ahead of
        run() (device-resident inputs).  run() then dispatches fills from
        the staged blobs and the measured pipeline carries no bulk H2D --
        the configuration of a host with a direct PCIe link, where the
        reference's own sequence upload costs ~3 ms (50 MB at 16 GB/s;
        cuda/LNW/LinearNeedlemanWunschV19.cu:422-440).  On tunneled
        setups this separates link cost (scripts/probe_tunnel.py) from
        pipeline cost.  Returns the number of bytes staged; 0 when the
        path does not apply (BSW / rowscan / mesh runs)."""
        self._prestaged.clear()
        if (self.kernel != "stagger" or self.algorithm is Algorithm.BSW
                or self.mesh is not None):
            return 0
        total = 0
        for b in self._buckets_of(ds):
            fb = self._upload(b)
            if fb is None:
                continue
            self._prestaged[self._bucket_key(b)] = fb
            total += int(fb.blob.nbytes)
        return total

    def _bucket_key(self, b: Bucket) -> str:
        """Content hash identifying one bucket's work for checkpointing.
        Memoized on the bucket (hashing the multi-MB token arrays costs
        ~10 ms, and _stage_ahead re-checks keys on every _top_up)."""
        cfg = (self.algorithm.value, repr(self.params), self.with_traceback)
        cached = getattr(b, "_key_cache", None)
        if cached is not None and cached[0] == cfg:
            return cached[1]
        h = hashlib.sha1()
        h.update(repr((self.algorithm.value, self.params,
                       self.with_traceback)).encode())
        for arr in (b.pair_ids, b.ref_len, b.qry_len):
            h.update(np.ascontiguousarray(arr).tobytes())
        h.update(b.ref_tokens.tobytes())
        h.update(b.qry_tokens.tobytes())
        key = h.hexdigest()[:24]
        b._key_cache = (cfg, key)
        return key

    @staticmethod
    def _load_checkpoint(path: str) -> list[AlignmentResult] | None:
        try:
            with open(path) as f:
                payload = json.load(f)
        except (OSError, ValueError):
            return None
        return [
            AlignmentResult(*rec[:5], extra_paths=[tuple(p) for p in rec[5]])
            if len(rec) > 5 else AlignmentResult(*rec)
            for rec in payload
        ]

    @staticmethod
    def _save_checkpoint(path: str, results: list[AlignmentResult]) -> None:
        payload = [
            [r.pair_num, r.score, r.ref_aligned, r.relation, r.query_aligned]
            + ([[list(p) for p in r.extra_paths]] if r.extra_paths else [])
            for r in results
        ]
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)  # atomic: a checkpoint is whole or absent

    @staticmethod
    def _load_blocks_checkpoint(path: str):
        """Blocks-path bucket checkpoint: one _BlockCollector part
        (ids, scores, chunk, spans) persisted as .npz.  Blocks bytes are
        traceback-engine-independent (byte-parity invariant), so a part
        written by a host-walk run resumes a device-walk run and vice
        versa."""
        try:
            with np.load(path) as z:
                return (z["ids"], z["scores"], z["chunk"], z["spans"])
        except (OSError, ValueError, KeyError):
            return None

    @staticmethod
    def _save_blocks_checkpoint(path: str, part) -> None:
        ids, scores, chunk, spans = part
        tmp = path + ".tmp.npz"
        with open(tmp, "wb") as f:
            np.savez(f, ids=ids, scores=scores, chunk=chunk, spans=spans)
        os.replace(tmp, path)  # atomic: a checkpoint is whole or absent

    def run(self, ds: PairDataset,
            checkpoint_dir: str | None = None) -> EngineResult:
        """Align a dataset.  With checkpoint_dir set, each bucket's results
        are persisted after its traceback and already-checkpointed buckets
        are skipped on re-run -- batch-level resume (the reference's
        batching makes batches independently restartable in principle but
        persists nothing, SURVEY.md section 5 "Checkpoint / resume")."""
        timer = PhaseTimer()
        collector = _BlockCollector() if self.output == "blocks" else None
        if checkpoint_dir:
            if self.local_mode == "all" or (
                    self.traceback_mode == "hirschberg" and self.with_traceback):
                raise ValueError(
                    "checkpoint_dir is not supported with local_mode='all' or "
                    "traceback='hirschberg' (those modes bypass the bucketed "
                    "kernel path that checkpoints persist)"
                )
            os.makedirs(checkpoint_dir, exist_ok=True)
        if self.local_mode == "all":
            # BACKTRACK_ALL needs the full score matrix per pair (kernels
            # store packed single-path directions only,
            # c++/LinearSmithWaterman.cpp:116-228).  Fills run on the
            # cross-pair BATCHED vectorized oracle (one numpy op per DP
            # row covers a whole chunk of pairs -- ~40x the per-pair
            # scalar fallback at read scale); path enumeration stays the
            # BFS spec.  Pairs with an empty side keep the scalar path.
            from tpu_align.oracle.traceback import traceback_pair
            from tpu_align.oracle.vectorized import fill_vectorized_batch

            results = []
            with timer.phase("backtrack"):
                full = [i for i in range(len(ds))
                        if ds.ref_len[i] > 0 and ds.qry_len[i] > 0]
                # chunk the fill->enumerate loop so resident memory stays
                # O(chunk), not O(dataset): a FillResult is ~315 KB/pair
                # at 250 bp (full int32 H + dirs), so holding all fills
                # for a 100k-pair run would need ~31 GB.  Global length
                # sort keeps each chunk's padding low (results re-sort by
                # pair_num below).
                full.sort(key=lambda k: (int(ds.qry_len[k]),
                                         int(ds.ref_len[k])))
                step = 1024
                for at in range(0, len(full), step):
                    part = full[at: at + step]
                    fills = fill_vectorized_batch(
                        self.algorithm, self.params,
                        [ds.pair(i) for i in part])
                    for i, fill in zip(part, fills):
                        ref, qry = ds.pair(i)
                        results.append(traceback_pair(
                            fill, ref, qry, pair_num=i,
                            local_mode=self.local_mode, params=self.params))
                for i in range(len(ds)):
                    if ds.ref_len[i] == 0 or ds.qry_len[i] == 0:
                        results.append(self._oracle_fallback(ds, i))
            with timer.phase("printing"):
                results.sort(key=lambda r: r.pair_num)
                if collector is not None:
                    collector.add_results(results)
                    blocks, pair_scores = collector.finalize()
                    return EngineResult([], timer, ds.num_cells,
                                        blocks=blocks,
                                        pair_scores=pair_scores)
            return EngineResult(results, timer, ds.num_cells)
        if self.traceback_mode == "hirschberg" and self.with_traceback:
            # O(M+N)-memory traceback: no direction tensor exists in any
            # memory (traceback/hirschberg.py).  Meant for LONG pairs; the
            # recursion is level-batched ACROSS pairs (all pairs' same-depth
            # subproblems share one fill), so a many-long-pairs dataset
            # does not serialize per pair.  For read-scale workloads the
            # packed-dirs modes are still faster (one fill, no recursion).
            from tpu_align.traceback.hirschberg import hirschberg_align_batch

            with timer.phase("backtrack"):
                results = hirschberg_align_batch(
                    self.algorithm, self.params,
                    [ds.pair(i) for i in range(len(ds))],
                    interpret=self.interpret,
                )
            with timer.phase("printing"):
                results.sort(key=lambda r: r.pair_num)
                if collector is not None:
                    collector.add_results(results)
                    blocks, pair_scores = collector.finalize()
                    return EngineResult([], timer, ds.num_cells,
                                        blocks=blocks,
                                        pair_scores=pair_scores)
            return EngineResult(results, timer, ds.num_cells)
        # pairs with an empty side cannot enter the kernel (no DP interior);
        # they fall back to the oracle
        empty_idx = np.flatnonzero((ds.ref_len == 0) | (ds.qry_len == 0))
        with timer.phase("memmgmt"):
            buckets = self._buckets_of(ds)

        results: list[AlignmentResult] = []
        pending: list[Bucket] = []
        if checkpoint_dir:
            for b in buckets:
                base = os.path.join(checkpoint_dir, self._bucket_key(b))
                if collector is not None:
                    part = self._load_blocks_checkpoint(base + ".npz")
                    if part is not None:
                        collector.add_chunk(*part)
                    else:
                        pending.append(b)
                    continue
                restored = self._load_checkpoint(base + ".json")
                if restored is not None:
                    results.extend(restored)
                else:
                    pending.append(b)
        else:
            pending = buckets

        def _ckpt_blocks(b: Bucket, n_before: int) -> None:
            """Persist the part(s) this bucket just appended to the
            collector (each add_* appends exactly one)."""
            if not checkpoint_dir or collector is None:
                return
            if len(collector.parts) == n_before:  # pragma: no cover
                return
            part = collector.parts[-1]
            self._save_blocks_checkpoint(
                os.path.join(checkpoint_dir, self._bucket_key(b) + ".npz"),
                part,
            )

        # Sliding-window dispatch (the V13 STREAM_BATCH_SIZE bound,
        # cuda/LNW/LinearNeedlemanWunschV13.cu:10): keep at most
        # max_inflight buckets' kernels outstanding so the device never
        # holds more than that many direction tensors; the consumer below
        # blocks on the oldest while the rest still run (the V19 overlap).
        # In device-traceback mode the walk is dispatched right behind its
        # bucket's fill (JAX chains them on device), so bucket N+1's fill
        # AND walk both run while the host replays bucket N's strings.
        device_tb = self.traceback_mode == "device" and self.with_traceback
        launches: list[tuple[Bucket, tuple, object, object]] = []
        next_up = 0
        # Readback prefetcher: finalize (device_get) launched buckets from
        # worker threads so several D2H streams run concurrently -- the
        # tunnel moves ~2x more aggregate bytes/sec with two streams
        # (scripts/probe_tunnel.py) and transfers overlap host replay.
        pool = None
        upool = None
        staged: dict[int, object] = {}
        if device_tb and self.mesh is None:
            from concurrent.futures import ThreadPoolExecutor

            # default 4: one worker per in-flight bucket at the headline
            # batch (100k pairs / 32768); measured prestaged e2e 309k ->
            # 335k pairs/sec vs 2 workers (aggregate tunnel D2H rises to
            # ~4 concurrent streams, scripts/probe_tunnel.py), 8 is flat
            workers = int(os.environ.get("TPU_ALIGN_PREFETCH", "4"))
            pool = ThreadPoolExecutor(max_workers=max(workers, 1))
            if self.kernel == "stagger" and self.algorithm is not Algorithm.BSW:
                # upload stager: bucket token H2D runs on worker streams
                # ahead of dispatch (concurrent tunnel streams move ~1.5x
                # one stream's bytes/sec) and overlaps everything else.
                # BSW is excluded: its _dispatch branch takes the banded
                # kernel, which uploads raw tokens itself -- prestaging a
                # FusedBlob would cross the tunnel twice per bucket.
                uworkers = int(os.environ.get("TPU_ALIGN_UPLOAD", "2"))
                upool = ThreadPoolExecutor(max_workers=max(uworkers, 1))

        def _stage_ahead():
            limit = self.max_inflight or len(pending)
            for k in range(next_up, min(next_up + limit, len(pending))):
                if k in staged:
                    continue
                if self._prestaged:
                    fb = self._prestaged.get(self._bucket_key(pending[k]))
                    if fb is not None:
                        from concurrent.futures import Future

                        done: Future = Future()
                        done.set_result(fb)
                        staged[k] = done
                        continue
                if upool is not None:
                    staged[k] = upool.submit(self._upload, pending[k])

        def _top_up():
            nonlocal next_up
            limit = self.max_inflight or len(pending)
            _stage_ahead()
            while next_up < len(pending) and len(launches) < limit:
                b = pending[next_up]
                with timer.phase("dispatch"):
                    sf = staged.pop(next_up, None)
                    outs = self._dispatch(
                        b, prestaged=(sf.result() if sf is not None
                                      else None))
                    handle = fut = None
                    if device_tb and outs[3] is not None:
                        handle = self._walk_dispatch(outs)
                        if pool is not None:
                            from tpu_align.traceback.device import (
                                finalize_any,
                            )
                            fut = pool.submit(finalize_any, handle,
                                              *self._finalize_args(b, outs))
                    else:
                        from tpu_align.traceback.device import (
                            _copy_to_host_async,
                        )
                        _copy_to_host_async(
                            [o for o in outs if o is not None]
                        )
                    launches.append((b, outs, handle, fut))
                next_up += 1

        try:
            _top_up()
            while launches:
                b, (scores, srow, scol, dirs), handle, fut = launches.pop(0)
                if device_tb and dirs is not None:
                    # V8-style: dirs never leave the device; the walk runs
                    # there and only event payloads / packed move streams
                    # transfer.  The finalize (ONE readback per bucket: walk
                    # result + scores/starts in a single device_get) ran on a
                    # prefetch worker, overlapped with earlier buckets' replay.
                    from tpu_align.traceback.device import (
                        bucket_arrays_from_finalized,
                        bucket_blocks_from_finalized,
                        finalize_any,
                    )

                    with timer.phase("backtrack"):
                        fin = (fut.result() if fut is not None
                               else finalize_any(
                                   handle,
                                   *self._finalize_args(b, (scores, srow, scol))))
                    if collector is not None:
                        with timer.phase("printing"):
                            nparts = len(collector.parts)
                            part = bucket_blocks_from_finalized(
                                self.algorithm, b, self.params, fin)
                            if part is not None:
                                # fused native replay+format: event streams ->
                                # final block bytes in one pass
                                collector.add_chunk(*part)
                            else:
                                out = bucket_arrays_from_finalized(
                                    self.algorithm, b, self.params, fin)
                                if isinstance(out, list):  # native lib absent
                                    collector.add_results(out)
                                else:
                                    sc, out_buf, out_lens = out
                                    collector.add_arrays(
                                        b.pair_ids[:b.num_real], sc, out_buf,
                                        out_lens,
                                    )
                            _ckpt_blocks(b, nparts)
                        _top_up()
                        continue
                    with timer.phase("backtrack"):
                        out = bucket_arrays_from_finalized(
                            self.algorithm, b, self.params, fin)
                        if isinstance(out, list):
                            bucket_results = out
                        else:
                            sc, out_buf, out_lens = out
                            bucket_results = results_from_arrays(
                                b.pair_ids, sc, out_buf, out_lens,
                                b.num_real)
                    results.extend(bucket_results)
                    if checkpoint_dir:
                        with timer.phase("printing"):
                            self._save_checkpoint(
                                os.path.join(
                                    checkpoint_dir, self._bucket_key(b) + ".json"
                                ),
                                bucket_results,
                            )
                    _top_up()
                    continue
                with timer.phase("kernel"):
                    # blocks only on this bucket; later kernels keep running.
                    # One coalesced device_get (single round trip on tunneled
                    # backends); the copies were started at dispatch time.
                    got = jax.device_get(
                        (scores, srow, scol) + ((dirs,) if dirs is not None
                                                else ())
                    )
                    is_bsw = self.algorithm is Algorithm.BSW
                    fill = BucketFill(
                        got[0], got[1], got[2],
                        got[3] if dirs is not None else None,
                        band=(self.params.band if is_bsw else None),
                        stagger=(self.stripe_s if (self.kernel == "stagger"
                                              and not is_bsw) else None),
                    )
                if collector is not None:
                    nb = b.num_real
                    nparts = len(collector.parts)
                    if self.with_traceback:
                        with timer.phase("backtrack"):
                            arrays = traceback_bucket_arrays(
                                self.algorithm, b, fill, self.params
                            )
                        with timer.phase("printing"):
                            if arrays is not None:
                                collector.add_arrays(
                                    b.pair_ids[:nb], fill.scores[:nb], *arrays
                                )
                            else:  # native walker absent: Python walk
                                collector.add_results(traceback_bucket(
                                    self.algorithm, b, fill, self.params,
                                    use_native=False,
                                ))
                            _ckpt_blocks(b, nparts)
                    else:
                        with timer.phase("printing"):
                            collector.add_scores(
                                b.pair_ids[:nb], fill.scores[:nb]
                            )
                            _ckpt_blocks(b, nparts)
                    _top_up()
                    continue
                with timer.phase("backtrack"):
                    if self.with_traceback:
                        bucket_results = traceback_bucket(
                            self.algorithm, b, fill, self.params
                        )
                    else:
                        bucket_results = [
                            AlignmentResult(
                                int(b.pair_ids[row]), int(fill.scores[row])
                            )
                            for row in range(b.num_real)
                        ]
                    results.extend(bucket_results)
                if checkpoint_dir:
                    with timer.phase("printing"):
                        self._save_checkpoint(
                            os.path.join(
                                checkpoint_dir, self._bucket_key(b) + ".json"
                            ),
                            bucket_results,
                        )
                _top_up()  # refill the dispatch window
        finally:
            # free the prefetch/upload executors on EVERY exit
            # path -- a raised walk or a wedged backend must not
            # leak threads blocked in device_get/device_put
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)
            if upool is not None:
                upool.shutdown(wait=False, cancel_futures=True)
        with timer.phase("backtrack"):
            for i in empty_idx:
                results.append(self._oracle_fallback(ds, int(i)))
        with timer.phase("printing"):
            if collector is not None:
                collector.add_results(results)  # oracle-fallback pairs only
                blocks, pair_scores = collector.finalize()
                return EngineResult([], timer, ds.num_cells, blocks=blocks,
                                    pair_scores=pair_scores)
            results.sort(key=lambda r: r.pair_num)
        return EngineResult(results, timer, ds.num_cells)


def align_file(
    path,
    algorithm: Algorithm,
    params: AlignmentParams | None = None,
    **engine_kwargs,
) -> EngineResult:
    """Parse a 3-line pair file and align it (the c++/main.cpp entry path)."""
    from tpu_align.io.dataset import parse_pair_file

    ds = parse_pair_file(path)
    return AlignmentEngine(algorithm, params, **engine_kwargs).run(ds)
