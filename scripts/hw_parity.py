"""Real-hardware parity check: engine output vs oracle, byte for byte.

The pytest suite exercises the kernels in Pallas interpret mode on CPU;
this script proves the COMPILED kernels (stagger, banded, rowscan), both
traceback modes, both device walkers, and the native blocks formatter
produce byte-identical output on the real TPU -- at the reference's
workload scale (100k pairs, c++/Makefile:4) when asked.

Usage: python scripts/hw_parity.py [num_pairs] [--json PARITY.json]
Prints one OK/FAIL line per configuration; exits nonzero on any mismatch.
The oracle golden (numpy, the goldens/ generator) is computed once per
algorithm across a process pool.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

# the axon plugin registers itself regardless of JAX_PLATFORMS; honor the
# env var through jax.config before any backend is touched (bench.py,
# cli.py and tests/conftest.py do the same)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.io.bucketing import BucketSpec
from tpu_align.runtime.engine import AlignmentEngine
from tpu_align.utils import synthetic_dataset
from tpu_align.utils.cache import enable_compile_cache


def _oracle_chunk(args):
    algo_value, start, pairs = args
    from tpu_align.oracle.api import align_batch

    res = align_batch(Algorithm(algo_value), AlignmentParams(), pairs,
                      engine="vectorized")
    for i, r in enumerate(res):
        r.pair_num = start + i
    return "".join(r.block() for r in res)


def oracle_text(algo: Algorithm, ds, jobs: int) -> str:
    """Golden output blocks for the whole dataset (numpy oracle), computed
    across a process pool (the web-scraper.py external-golden role at
    100k-pair scale)."""
    pairs = list(ds.pairs())
    chunk = max(256, -(-len(pairs) // (jobs * 8)))
    tasks = [(algo.value, s, pairs[s: s + chunk])
             for s in range(0, len(pairs), chunk)]
    if jobs <= 1 or len(tasks) == 1:
        return "".join(_oracle_chunk(t) for t in tasks)
    with ProcessPoolExecutor(max_workers=jobs) as ex:
        return "".join(ex.map(_oracle_chunk, tasks))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("pairs", nargs="?", type=int, default=512)
    ap.add_argument("--json", default=None, metavar="PATH",
                    help="write a machine-readable run record")
    ap.add_argument("--jobs", type=int, default=os.cpu_count() or 1)
    ap.add_argument("--batch", type=int, default=32768)
    args = ap.parse_args()
    enable_compile_cache()
    n = args.pairs
    ds = synthetic_dataset(n, min_len=20, max_len=250, seed=7)
    spec = BucketSpec(batch_pairs=min(args.batch, n), pair_multiple=128,
                      query_multiple=64)
    params = AlignmentParams()
    # algo, kernel, traceback, walker, output
    configs = [
        (Algorithm.LNW, "stagger", "host", "xla", "blocks"),
        (Algorithm.LNW, "stagger", "device", "xla", "blocks"),
        (Algorithm.LNW, "stagger", "device", "pallas", "blocks"),
        (Algorithm.LNW, "stagger", "device", "xla", "records"),
        (Algorithm.LSW, "stagger", "host", "xla", "blocks"),
        (Algorithm.LSW, "stagger", "device", "xla", "blocks"),
        (Algorithm.LSW, "stagger", "device", "pallas", "blocks"),
        (Algorithm.ANW, "stagger", "host", "xla", "blocks"),
        (Algorithm.ANW, "stagger", "device", "xla", "blocks"),
        (Algorithm.ANW, "stagger", "device", "pallas", "blocks"),
        (Algorithm.BSW, "auto", "host", "xla", "blocks"),
        (Algorithm.BSW, "auto", "device", "xla", "blocks"),
        (Algorithm.BSW, "auto", "device", "pallas", "blocks"),
        (Algorithm.LNW, "rowscan", "host", "xla", "blocks"),
    ]
    failures = 0
    golden: dict[Algorithm, str] = {}
    records = []
    import jax

    for algo, kernel, tb, walker, output in configs:
        if algo not in golden:
            t0 = time.perf_counter()
            golden[algo] = oracle_text(algo, ds, args.jobs)
            print(f"oracle[{algo.value}]: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
        out = AlignmentEngine(
            algo, params, bucket_spec=spec, kernel=kernel, traceback=tb,
            walker=walker, output=output,
        ).run(ds)
        ok = out.output_text() == golden[algo]
        ksec = out.timer.seconds.get("kernel", 0.0)
        print(f"{algo.value:4s} kernel={kernel:8s} traceback={tb:6s} "
              f"walker={walker:6s} output={output:7s} "
              f"{'OK' if ok else 'FAIL'}  (kernel phase {ksec:.3f}s)",
              flush=True)
        failures += 0 if ok else 1
        records.append({
            "algorithm": algo.value, "kernel": kernel, "traceback": tb,
            "walker": walker, "output": output, "ok": ok,
            "kernel_phase_s": round(ksec, 4),
        })
    if args.json:
        with open(args.json, "w") as f:
            json.dump({
                "pairs": n, "backend": jax.default_backend(),
                "configs": records, "ok": failures == 0,
            }, f, indent=1)
        print(f"wrote {args.json}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
