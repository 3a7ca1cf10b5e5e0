"""Multi-chip scaling table: aligned pairs/sec at 1/2/4/8 devices.

Answers BASELINE.json's "aligned pairs/sec at 1/8/16 chips" metric.  The
workload is pure data parallelism over pairs (no cross-chip DP dependency,
collectives only in run-level stats), so scaling is linear by construction;
this script MEASURES it instead of asserting it:

  * on a virtual CPU mesh (--cpu N): the sharded fill+walk runs at each
    mesh size over a fixed total workload -- demonstrates the shard_map
    program divides the work (virtual devices share host cores, so
    wall-clock speedup saturates at the core count; the committed table
    reports pairs/sec and the work-division check),
  * on real TPU (default): measures the 1-chip absolute pairs/sec with the
    same sharded program (mesh size 1); N-chip numbers are this x N by the
    data-parallel construction validated on the virtual mesh.

Emits one JSON line per mesh size (appendable to BENCHMATRIX.jsonl).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="run on N virtual CPU devices (mesh sizes "
                         "1,2,4,...,N); default: real backend, mesh size 1")
    ap.add_argument("--pairs", type=int, default=None,
                    help="total pairs (default: 512 cpu / 32768 tpu)")
    ap.add_argument("--len", type=int, dest="seq_len", default=None,
                    help="read length (default: 48 cpu / 250 tpu)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--algorithm", default="lnw")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.cpu} "
            + os.environ.get("XLA_FLAGS", "")
        )
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import numpy as np

    from tpu_align.core.params import Algorithm, AlignmentParams
    from tpu_align.distributed import (
        fill_sharded, global_stats, make_pairs_mesh, shard_bucket_spec,
    )
    from tpu_align.io import BucketSpec, bucketize
    from tpu_align.utils import synthetic_dataset
    from tpu_align.utils.cache import enable_compile_cache

    enable_compile_cache()
    algo = Algorithm(args.algorithm)
    params = AlignmentParams()
    on_tpu = jax.default_backend() == "tpu"
    num_pairs = args.pairs or (32768 if on_tpu else 512)
    seq_len = args.seq_len or (250 if on_tpu else 48)
    ds = synthetic_dataset(num_pairs, uniform_len=seq_len, seed=42)

    sizes = []
    n = 1
    while n <= (args.cpu or 1):
        sizes.append(n)
        n *= 2
    rows = []
    for n_dev in sizes:
        mesh = make_pairs_mesh(jax.devices()[:n_dev])
        spec = shard_bucket_spec(
            mesh, BucketSpec(batch_pairs=num_pairs, query_multiple=16))
        buckets = bucketize(ds, spec)
        staged = [
            tuple(jax.device_put(x) for x in
                  (b.ref_tokens, b.qry_tokens, b.ref_len, b.qry_len))
            for b in buckets
        ]
        cells = [jax.device_put(
            (b.ref_len * b.qry_len).astype(np.int64)) for b in buckets]

        def sweep():
            # cell totals accumulate across ALL buckets (the dataset can
            # bucketize into several shapes); the final readback both
            # syncs the in-order stream (PERF.md) and checks the sum
            totals = []
            for (rt, qt, rl, ql), c in zip(staged, cells):
                scores, srow, scol, dirs = fill_sharded(
                    mesh, algo, params, rt, qt, rl, ql,
                    with_traceback=True,
                )
                totals.append(global_stats(mesh, scores, c)[1])
            acc = totals[0]
            for t in totals[1:]:  # device-side add: ONE readback/RTT total
                acc = acc + t
            return int(np.asarray(acc))

        total = sweep()  # warmup/compile
        assert total == int(ds.num_cells), (total, ds.num_cells)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            sweep()
            best = min(best, time.perf_counter() - t0)
        row = {
            "metric": f"{algo.value}_sharded_pairs_per_sec",
            "n_devices": n_dev,
            "backend": jax.default_backend(),
            "value": round(num_pairs / best),
            "unit": "pairs/sec",
            "seconds": round(best, 4),
            "num_pairs": num_pairs,
            "seq_len": seq_len,
            "cells": int(total),
            "gcups": round(int(total) / best / 1e9, 2),
        }
        rows.append(row)
        print(json.dumps(row))
    if len(rows) > 1:
        base = rows[0]["seconds"]
        for r in rows:
            print(f"# {r['n_devices']} devices: {r['value']} pairs/sec "
                  f"(speedup x{base / r['seconds']:.2f})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
