#!/usr/bin/env bash
# CPU smoke of every row in scripts/run_benchmarks.sh at tiny sizes.
#
# The hardware matrix runs unattended after a backend outage
# (scripts/round3_capture.sh); a Python-level error in ANY row would
# silently drop that row from BENCHMATRIX.jsonl.  This script exercises
# the exact same bench.py / bench_long.py / bench_scaling.py code paths
# on the CPU interpreter in ~2 minutes so such errors surface before the
# capture, not during it.  Fails (non-zero exit) if any row fails.
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
out=$(mktemp /tmp/smoke_matrix.XXXX.jsonl)
fails=0
run() {
  echo "--- $* ---" >&2
  if ! timeout 600 python bench.py "$@" \
      --pairs 96 --len 48 --batch 96 --iters 1 --runs 1 --quiet >> "$out"
  then echo "SMOKE FAILED: bench.py $*" >&2; fails=$((fails + 1)); fi
}
for algo in lnw lsw anw bsw; do
  run --algorithm "$algo"
  run --algorithm "$algo" --scores-only
done
run --stripe 16
run --stripe 64
run --algorithm anw --stripe 16
run --algorithm anw --stripe 48
run --algorithm anw --stripe 64
run --engine
run --engine --output records
run --engine --traceback device
run --engine --traceback device --output records
run --engine --traceback device --walker pallas
run --engine --algorithm bsw --traceback device
echo "--- bench_long ---" >&2
timeout 600 python scripts/bench_long.py --qry 1024 --ref 512 \
  --leaf-q 128 >> "$out" \
  || { echo "SMOKE FAILED: bench_long" >&2; fails=$((fails + 1)); }
echo "--- bench_long --batch ---" >&2
timeout 600 python scripts/bench_long.py --batch 4 --qry 512 --ref 512 \
  --leaf-q 128 >> "$out" \
  || { echo "SMOKE FAILED: bench_long --batch" >&2; fails=$((fails + 1)); }
echo "--- bench_scaling ---" >&2
timeout 600 python scripts/bench_scaling.py --cpu 2 --pairs 64 --len 32 \
  --reps 1 >> "$out" \
  || { echo "SMOKE FAILED: bench_scaling" >&2; fails=$((fails + 1)); }
echo "--- timing_analysis render ---" >&2
python -m tpu_align.utils.timing_analysis "$out" /tmp/smoke_breakdown.png \
  || { echo "SMOKE FAILED: timing_analysis" >&2; fails=$((fails + 1)); }
n=$(wc -l < "$out")
echo "smoke: $n records in $out, $fails failures" >&2
exit $((fails > 0))
