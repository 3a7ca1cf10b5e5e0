#!/usr/bin/env bash
# Ops parity with the reference's cluster scripts (cuda/sendToCluster,
# readLastLog.sh, timing_analysis/): run the benchmark matrix, collect
# phase records, and render the breakdown table/chart.
set -euo pipefail
cd "$(dirname "$0")/.."
out=${1:-bench_runs.jsonl}
: > "$out"
for algo in lnw lsw anw bsw; do
  python bench.py --algorithm "$algo" --quiet >> "$out"
done
python bench.py --engine --quiet >> "$out"
python -m tpu_align.utils.timing_analysis "$out" bench_breakdown.png || true
echo "wrote $out"
