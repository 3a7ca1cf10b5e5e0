#!/usr/bin/env bash
# One-off: fill the BENCHMATRIX.jsonl rows still marked TBD in PERF.md,
# plus the device-walk A/B (xla vs pallas) engine rows.
set -uo pipefail
cd "$(dirname "$0")/.."
out=${1:-bench_missing.jsonl}
: > "$out"
run() { echo "=== $* ===" >&2; timeout 3000 python bench.py "$@" --quiet >> "$out" || echo "FAILED: $*" >&2; }
run --algorithm anw --scores-only
run --algorithm bsw
run --algorithm bsw --scores-only
run --pairs 1536 --len 2048 --batch 1536
run --engine --pairs 20000
run --engine --pairs 20000 --output records
run --engine --pairs 20000 --traceback device
run --engine --pairs 20000 --traceback device --walker pallas
run --engine --pairs 20000 --algorithm bsw --traceback device
echo "done -> $out" >&2
