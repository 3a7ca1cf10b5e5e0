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


def _batch_bench(args):
    """Many-long-pairs mode: level-batched hirschberg_align_batch vs the
    serial per-pair loop on the same dataset (the round-2 engine behavior;
    VERDICT round-3 item 6 'done' criterion: batch >= 5x)."""
    import jax

    from tpu_align.core.params import Algorithm
    from tpu_align.traceback.hirschberg import (
        hirschberg_align, hirschberg_align_batch,
    )

    rnd = random.Random(args.seed)
    pairs = []
    for _ in range(args.batch):
        ref = "".join(rnd.choice("ACGT") for _ in range(args.ref))
        qry = "".join(
            rnd.choice("ACGT") if rnd.random() < 0.1 else c
            for c in (ref * -(-args.qry // args.ref))[: args.qry]
        )
        pairs.append((ref, qry))
    algo = Algorithm(args.algorithm)

    t0 = time.perf_counter()
    batch_res = hirschberg_align_batch(algo, None, pairs, leaf_q=args.leaf_q)
    wall_batch = time.perf_counter() - t0

    wall_serial = None
    if not args.skip_serial:
        t0 = time.perf_counter()
        serial_res = [
            hirschberg_align(algo, None, r, q, pair_num=i, leaf_q=args.leaf_q)
            for i, (r, q) in enumerate(pairs)
        ]
        wall_serial = time.perf_counter() - t0
        assert [x.score for x in serial_res] == [x.score for x in batch_res]

    cells = sum(len(r) * len(q) for r, q in pairs)
    print(json.dumps({
        "metric": f"{args.algorithm}_hirschberg_batch_{args.batch}pairs",
        "value": round(cells / wall_batch / 1e9, 3),
        "unit": "GCUPS-effective",
        "wall_batch_s": round(wall_batch, 2),
        "wall_serial_s": round(wall_serial, 2) if wall_serial else None,
        "batch_speedup": (round(wall_serial / wall_batch, 2)
                          if wall_serial else None),
        "pairs": args.batch,
        "qry": args.qry,
        "ref": args.ref,
        "cells": cells,
        "backend": jax.default_backend(),
    }))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qry", type=int, default=65536)
    ap.add_argument("--ref", type=int, default=8192)
    ap.add_argument("--algorithm", default="lnw", choices=["lnw", "lsw", "anw"])
    ap.add_argument("--leaf-q", type=int, default=512)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--batch", type=int, default=0, metavar="B",
                    help="many-long-pairs mode: align B pairs with the "
                         "level-batched recursion and report the speedup "
                         "over the serial per-pair loop")
    ap.add_argument("--skip-serial", action="store_true",
                    help="batch mode: skip the serial baseline timing")
    ap.add_argument("--warm", action="store_true",
                    help="single-pair mode: run one unmeasured warmup "
                         "pass first (compiles the shape vocabulary)")
    args = ap.parse_args()

    from tpu_align.utils.cache import enable_compile_cache

    enable_compile_cache()
    if args.batch:
        return _batch_bench(args)
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

    if args.warm:
        # compile warmup: the recursion's shape vocabulary (pow2-padded
        # level fills + split reduces + leaf engine) compiles on the
        # first pass; steady-state wall is the honest per-pair cost on a
        # warm service (same discipline as bench.py's warmup+iters)
        t0 = time.perf_counter()
        hirschberg_align(Algorithm(args.algorithm), None, ref, qry,
                         leaf_q=args.leaf_q)
        print(f"warm pass: {time.perf_counter() - t0:.2f}s",
              file=sys.stderr)
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
