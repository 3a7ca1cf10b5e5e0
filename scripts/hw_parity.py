"""Real-hardware parity check: engine output vs oracle, byte for byte.

The pytest suite exercises the kernels in Pallas interpret mode on CPU;
this script proves the COMPILED kernels (stagger, banded, rowscan) and
both traceback modes produce byte-identical output on the real TPU.

Usage: python scripts/hw_parity.py [num_pairs]
Prints one OK/FAIL line per configuration; exits nonzero on any mismatch.
"""

from __future__ import annotations

import sys

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.io.bucketing import BucketSpec
from tpu_align.oracle.api import align_batch
from tpu_align.runtime.engine import AlignmentEngine
from tpu_align.utils import synthetic_dataset
from tpu_align.utils.cache import enable_compile_cache


def main() -> int:
    enable_compile_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ds = synthetic_dataset(n, min_len=20, max_len=250, seed=7)
    spec = BucketSpec(batch_pairs=n, pair_multiple=128, query_multiple=64)
    params = AlignmentParams()
    configs = [
        (Algorithm.LNW, "stagger", "host"),
        (Algorithm.LNW, "stagger", "device"),
        (Algorithm.LSW, "stagger", "host"),
        (Algorithm.LSW, "stagger", "device"),
        (Algorithm.ANW, "stagger", "host"),
        (Algorithm.ANW, "stagger", "device"),
        (Algorithm.BSW, "auto", "host"),
        (Algorithm.LNW, "rowscan", "host"),
    ]
    failures = 0
    oracle_text = {}
    for algo, kernel, tb in configs:
        if algo not in oracle_text:
            want = align_batch(algo, params, list(ds.pairs()),
                               engine="scalar")
            oracle_text[algo] = "".join(r.block() for r in want)
        out = AlignmentEngine(
            algo, params, bucket_spec=spec, kernel=kernel, traceback=tb,
        ).run(ds)
        ok = out.output_text() == oracle_text[algo]
        print(f"{algo.value:4s} kernel={kernel:8s} traceback={tb:6s} "
              f"{'OK' if ok else 'FAIL'}  "
              f"(kernel phase {out.timer.seconds.get('kernel', 0):.3f}s)",
              flush=True)
        failures += 0 if ok else 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
