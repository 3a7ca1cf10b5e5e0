#!/usr/bin/env bash
# Kernel-change attribution ladder (run AFTER scripts/round3_capture.sh).
#
# The round-2 headline (198.6 GCUPS LNW fill+dirs) was measured at kernel
# state 3ff0997; every stagger.py change since has only CPU-interpret
# evidence.  This script checks out each ladder step in a throwaway git
# worktree and runs that step's own bench.py on the same 100k-pair
# workload (synthetic_dataset seed 42 — identical across all steps), so a
# regression at HEAD can be attributed to (and reverted at) the exact
# commit that caused it.
#
#   3ff0997  round-2 measured state (198.6 LNW+dirs / 122.8 ANW+dirs)
#   64af138  LSW encoded argmax + hoisted global capture
#   43ba1dc  anti-diagonal G-space scores + carried diag
#   2889d48  compile-time step phase for dirs packing
#   535c66f  loop-carried critical-path reassociation
#   HEAD     current tree (includes the Hirschberg last-rows capture)
#
# Usage: bash scripts/ab_kernels.sh [out.jsonl]   (default AB_KERNELS.jsonl)
set -uo pipefail
cd "$(dirname "$0")/.."
out=${1:-AB_KERNELS.jsonl}
: > "$out"
LADDER="3ff0997 64af138 43ba1dc 2889d48 535c66f"

bench_at() {  # $1 = dir, $2 = tag
  local dir=$1 tag=$2 algo
  for algo in lnw anw; do
    echo "=== $tag $algo ===" >&2
    ( cd "$dir" && timeout 3000 python bench.py --algorithm "$algo" \
        --iters 3 --quiet ) \
      | python -c "import json,sys; r=json.loads(sys.stdin.read()); \
r['ladder']='$tag'; print(json.dumps(r))" >> "$out" \
      || echo "AB FAILED: $tag $algo" >&2
  done
}

for sha in $LADDER; do
  wt=/tmp/ab_$sha
  git worktree add --detach "$wt" "$sha" >&2 || { echo "worktree $sha failed" >&2; continue; }
  bench_at "$wt" "$sha"
  git worktree remove --force "$wt" >&2
done
bench_at . HEAD
echo "wrote $out" >&2
