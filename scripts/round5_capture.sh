#!/usr/bin/env bash
# Round-5 hardware evidence capture, ordered by VERDICT priority.  Each
# phase is independent; run after the TPU worker is confirmed responsive
# (timeout 60 python /tmp/wedge_probe.py tiny).
#
#   1. default bench end-to-end (VERDICT #1: the verified perf channel)
#      -- also warms the persistent compile cache for the driver's run
#   2. e2e upload-concurrency sweep (VERDICT #2: beat 227k pairs/sec)
#   3. kernel A/B singles (VERDICT #4: rollref / hmax2 / EF attribution)
#   4. Hirschberg warm single-pair + batch (VERDICT #5)
#   5. full matrix + PARITY_r05 + scaling (VERDICT #3)
#
# Usage: scripts/round5_capture.sh [phase...]   (default: all)
set -uo pipefail   # the bench|sed pipes must fail when BENCH fails
cd "$(dirname "$0")/.."
phases=${*:-"1 2 3 4 5"}
# internal bench budget tracks the outer timeouts (see run_benchmarks.sh)
export TPU_ALIGN_BENCH_BUDGET=${TPU_ALIGN_BENCH_BUDGET:-2300}
log() { echo "=== $(date +%H:%M:%S) $* ===" >&2; }

run_ab() {  # run_ab <label> <env...> -- <bench args...>
  local label=$1; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  log "A/B $label"
  env "${envs[@]}" timeout 2400 python bench.py "$@" --quiet \
    | sed "s/}$/, \"ab\": \"$label\"}/" >> ab_r05.jsonl \
    || echo "AB FAILED: $label" >&2
}

for phase in $phases; do case $phase in
1)
  log "phase 1: default bench (warms driver cache)"
  timeout 3000 python bench.py | tee /tmp/bench_r5_default.json
  ;;
2)
  log "phase 2: e2e upload sweep (device traceback, pallas walker)"
  for up in 2 4 8; do
    log "e2e upload=$up"
    TPU_ALIGN_UPLOAD=$up timeout 3000 python bench.py --engine \
      --traceback device --walker pallas --quiet \
      | sed "s/}$/, \"upload\": $up}/" >> e2e_r05.jsonl \
      || echo "E2E FAILED: upload=$up" >&2
  done
  for bp in 8192 16384; do
    log "e2e batch=$bp (best upload rerun manually if it differs)"
    TPU_ALIGN_UPLOAD=4 timeout 3000 python bench.py --engine --batch $bp \
      --traceback device --walker pallas --quiet \
      | sed "s/}$/, \"upload\": 4, \"batch_sweep\": $bp}/" >> e2e_r05.jsonl \
      || echo "E2E FAILED: batch=$bp" >&2
  done
  ;;
3)
  log "phase 3: kernel A/Bs (single-bucket 32768-pair shape)"
  AB="--pairs 32768 --batch 32768 --iters 3"
  run_ab lnw-base NOOP=1 -- $AB
  run_ab lnw-rollref TPU_ALIGN_ROLLREF=1 -- $AB
  run_ab anw-base NOOP=1 -- $AB --algorithm anw
  run_ab anw-rollref TPU_ALIGN_ROLLREF=1 -- $AB --algorithm anw
  run_ab anw-hmax2 TPU_ALIGN_ANW_HMAX2=1 -- $AB --algorithm anw
  run_ab anw-ef0 TPU_ALIGN_ANW_EF_BITS=0 -- $AB --algorithm anw
  run_ab lsw-rollref TPU_ALIGN_ROLLREF=1 -- $AB --algorithm lsw
  ;;
4)
  log "phase 4: Hirschberg warm long-pair + batch"
  timeout 3000 python scripts/bench_long.py --warm --qry 131072 \
    --ref 16384 >> hirsch_r05.jsonl || echo "HIRSCH long FAILED" >&2
  timeout 3000 python scripts/bench_long.py --warm --qry 16384 \
    --ref 4096 >> hirsch_r05.jsonl || echo "HIRSCH r3-shape FAILED" >&2
  timeout 6000 python scripts/bench_long.py --batch 64 --qry 16384 \
    --ref 16384 --skip-serial >> hirsch_r05.jsonl \
    || echo "HIRSCH batch FAILED" >&2
  ;;
5)
  log "phase 5: full matrix + parity + scaling"
  bash scripts/run_benchmarks.sh bench_runs.jsonl \
    && cp bench_runs.jsonl BENCHMATRIX.jsonl || echo "MATRIX FAILED" >&2
  timeout 7200 python scripts/hw_parity.py 100000 --json PARITY_r05.json \
    || echo "PARITY FAILED" >&2
  timeout 3000 python scripts/bench_scaling.py --cpu 16 > SCALING.jsonl \
    || echo "SCALING FAILED" >&2
  ;;
esac; done
log "done; artifacts: ab_r05.jsonl e2e_r05.jsonl hirsch_r05.jsonl BENCHMATRIX.jsonl"
