#!/usr/bin/env bash
# Ops parity with the reference's cluster scripts (cuda/sendToCluster,
# readLastLog.sh, timing_analysis/): run the full hardware benchmark
# matrix -- all four aligners, traceback and scores-only, the stagger
# stripe-width sweep, the end-to-end engine breakdowns (host and device
# traceback, both walk engines, blocks and records assembly), a
# 2k-length row, and the long-pair Hirschberg bench -- collect phase
# records, and render the breakdown table/chart.
#
# Results are appended to bench_runs.jsonl (committed as BENCHMATRIX.jsonl
# after a full hardware run; see PERF.md for the rendered table).
set -uo pipefail
cd "$(dirname "$0")/.."
out=${1:-bench_runs.jsonl}
: > "$out"
# the bench's internal supervisor budget must match the outer timeout,
# or its 540 s default self-terminates cold-cache runs long before the
# timeout this script actually grants
export TPU_ALIGN_BENCH_BUDGET=${TPU_ALIGN_BENCH_BUDGET:-2900}
run() { echo "=== $* ===" >&2; timeout 3000 python bench.py "$@" --quiet >> "$out" || echo "FAILED: $*" >&2; }
for algo in lnw lsw anw bsw; do
  run --algorithm "$algo"
  run --algorithm "$algo" --scores-only
done
# stagger stripe-width sweep (headline config; S=32 is the default)
run --stripe 16
run --stripe 64
# affine-specific stripe sweep (VERDICT r3 item 2: the affine step carries
# ~2x the slab ops, so its fill/drain-vs-latency optimum may differ)
run --algorithm anw --stripe 16
run --algorithm anw --stripe 48
run --algorithm anw --stripe 64
# long sequences: 2048 x 2048 (sized to keep runtime moderate)
run --pairs 1536 --len 2048 --batch 1536
# end-to-end engine with phase breakdown: host vs device traceback,
# both walk engines, native blocks vs per-pair records assembly
run --engine --pairs 20000
run --engine --pairs 20000 --output records
run --engine --pairs 20000 --traceback device
run --engine --pairs 20000 --traceback device --output records
run --engine --pairs 20000 --traceback device --walker pallas
run --engine --pairs 20000 --algorithm bsw --traceback device
# the reference-workload e2e (100k pairs, V12 comparison rows): measured
# over the tunnel AND with device-resident inputs (the PCIe-host
# configuration; see engine.prestage).  Commit the same-session
# probe_tunnel record alongside -- the tunnel row moves with the link.
run --engine --pairs 100000 --traceback device --walker pallas --runs 5
run --engine --pairs 100000 --traceback device --walker pallas --runs 5 \
  --prestage
timeout 600 python scripts/probe_tunnel.py >> "$out" \
  || echo "FAILED: probe_tunnel" >&2
# long-pair Hirschberg (no direction storage).  The flagship row is the
# WARM 131kbp x 16kbp pair (executables reused across recursion depths;
# cold-compile overhead attributed separately in hirsch_r05.jsonl).
timeout 3000 python scripts/bench_long.py --warm --qry 131072 --ref 16384 \
  >> "$out" || echo "FAILED: bench_long 131k" >&2
timeout 3000 python scripts/bench_long.py --warm --qry 16384 --ref 4096 \
  >> "$out" || echo "FAILED: bench_long" >&2
# many-long-pairs Hirschberg: level-batched across pairs vs serial loop
timeout 6000 python scripts/bench_long.py --batch 64 --qry 16384 \
  --ref 16384 >> "$out" || echo "FAILED: bench_long --batch" >&2
# sharded pairs/sec at mesh size 1 on the real chip (scaling table rows
# at 2/4/8 come from the virtual CPU mesh: bench_scaling.py --cpu 8)
timeout 3000 python scripts/bench_scaling.py >> "$out" \
  || echo "FAILED: bench_scaling" >&2
python -m tpu_align.utils.timing_analysis "$out" bench_breakdown.png || true
echo "wrote $out"
