"""Long-pair benchmark: Hirschberg traceback on pairs whose direction
tensor is impractical to materialize.

Prints one JSON line per configuration with wall time, effective GCUPS
(cells / wall seconds; Hirschberg recomputes ~2x cells so kernel GCUPS is
~2x higher), and the direction-tensor bytes that were never allocated.

Usage:
    python scripts/bench_long.py [--qry 65536] [--ref 8192] [--algorithm lnw]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

# the axon plugin registers itself regardless of JAX_PLATFORMS; pin the
# platform through jax.config before any jax-touching import (cli.py does
# the same)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qry", type=int, default=65536)
    ap.add_argument("--ref", type=int, default=8192)
    ap.add_argument("--algorithm", default="lnw", choices=["lnw", "lsw", "anw"])
    ap.add_argument("--leaf-q", type=int, default=512)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from tpu_align.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax

    from tpu_align.core.params import Algorithm
    from tpu_align.traceback.hirschberg import hirschberg_align

    rnd = random.Random(args.seed)
    ref = "".join(rnd.choice("ACGT") for _ in range(args.ref))
    # query = point-mutated ref tiled to length (long-read-shaped input)
    reps = -(-args.qry // args.ref)
    qry = "".join(
        rnd.choice("ACGT") if rnd.random() < 0.1 else c
        for c in (ref * reps)[: args.qry]
    )

    t0 = time.perf_counter()
    res = hirschberg_align(
        Algorithm(args.algorithm), None, ref, qry, leaf_q=args.leaf_q
    )
    wall = time.perf_counter() - t0
    cells = len(ref) * len(qry)
    bits = 4 if args.algorithm == "anw" else 2
    print(json.dumps({
        "metric": f"{args.algorithm}_hirschberg_long_pair",
        "value": round(cells / wall / 1e9, 3),
        "unit": "GCUPS-effective",
        "wall_s": round(wall, 2),
        "qry": len(qry),
        "ref": len(ref),
        "cells": cells,
        "score": res.score,
        "aligned_cols": len(res.ref_aligned),
        "dirs_bytes_avoided": cells * bits // 8,
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
