#!/usr/bin/env bash
# Ops parity with the reference's cluster scripts (cuda/sendToCluster,
# readLastLog.sh, timing_analysis/): run the full hardware benchmark
# matrix -- all four aligners, traceback and scores-only, the end-to-end
# engine breakdowns (host and device traceback), and a 2k-length row --
# collect phase records, and render the breakdown table/chart.
#
# Results are appended to bench_runs.jsonl (committed as BENCHMATRIX.jsonl
# after a full hardware run; see PERF.md for the rendered table).
set -euo pipefail
cd "$(dirname "$0")/.."
out=${1:-bench_runs.jsonl}
: > "$out"
for algo in lnw lsw anw bsw; do
  python bench.py --algorithm "$algo" --quiet >> "$out"
  python bench.py --algorithm "$algo" --scores-only --quiet >> "$out"
done
# long sequences: 2048 x 2048 (sized to keep runtime moderate)
python bench.py --pairs 1536 --len 2048 --batch 1536 --quiet >> "$out"
# end-to-end engine with phase breakdown, host vs device traceback
python bench.py --engine --pairs 20000 --quiet >> "$out"
python bench.py --engine --pairs 20000 --traceback device --quiet >> "$out"
python -m tpu_align.utils.timing_analysis "$out" bench_breakdown.png || true
echo "wrote $out"
