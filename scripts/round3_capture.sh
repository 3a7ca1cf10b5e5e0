#!/usr/bin/env bash
# Round-3 hardware evidence capture: run after the TPU backend recovers.
#
#   1. full benchmark matrix  -> BENCHMATRIX.jsonl + bench_breakdown.png
#   2. 100k-pair byte parity  -> PARITY_r03.json (all 4 aligners, both
#      traceback modes, both walkers, blocks+records)
#   3. virtual-mesh scaling   -> SCALING.jsonl (1/2/4/8 devices, CPU) +
#      real-chip sharded pairs/sec row (inside the matrix)
#
# Each phase is independent; a failure in one does not stop the others.
set -u
cd "$(dirname "$0")/.."

echo "=== phase 0: compile check (tiny runs, fail fast) ===" >&2
for a in lnw anw bsw; do
  timeout 1800 python bench.py --algorithm "$a" --pairs 256 --len 64 \
    --batch 256 --iters 1 --quiet || echo "COMPILE CHECK FAILED: $a" >&2
done

echo "=== phase 1: benchmark matrix ===" >&2
bash scripts/run_benchmarks.sh bench_runs.jsonl \
  && cp bench_runs.jsonl BENCHMATRIX.jsonl \
  || echo "MATRIX FAILED" >&2

echo "=== phase 2: 100k-pair parity ===" >&2
timeout 7200 python scripts/hw_parity.py 100000 --json PARITY_r03.json \
  || echo "PARITY FAILED" >&2

echo "=== phase 3: virtual-mesh scaling table (1/2/4/8/16 devices) ===" >&2
timeout 3000 python scripts/bench_scaling.py --cpu 16 > SCALING.jsonl \
  || echo "SCALING FAILED" >&2

echo "=== artifacts ===" >&2
ls -la BENCHMATRIX.jsonl PARITY_r03.json SCALING.jsonl bench_breakdown.png 2>&1 >&2
