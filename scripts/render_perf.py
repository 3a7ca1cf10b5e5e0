"""Render the PERF.md hardware-matrix tables from BENCHMATRIX.jsonl.

Usage: python scripts/render_perf.py [BENCHMATRIX.jsonl]
Prints markdown: the fill-kernel table (GCUPS best + mean +- std), the
engine phase-breakdown table, and any scaling/long-pair rows -- paste
into PERF.md after a capture so the committed tables always match the
committed records.
"""

from __future__ import annotations

import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCHMATRIX.jsonl"
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))

    fill = [r for r in rows if r.get("metric", "").endswith("_fill_gcups")]
    engine = [r for r in rows if "_e2e_" in r.get("metric", "")]
    other = [r for r in rows if r not in fill and r not in engine]

    if fill:
        print("| Workload | Kernel | ms (best) | GCUPS (best) | "
              "GCUPS mean+-std | vs H100 baseline |")
        print("|---|---|---|---|---|---|")
        for r in fill:
            algo = r["metric"].split("_")[0]
            mode = "fill + dirs" if r.get("traceback") else "scores-only"
            extra = ""
            if r.get("seq_len", 250) != 250:
                extra = f" {r['seq_len']}bp"
            if r.get("stripe"):
                extra += f" S={r['stripe']}"
            ms = r.get("kernel_ms", "")
            spread = (f"{r['gcups_mean']} +- {r['gcups_std']}"
                      if "gcups_mean" in r else "")
            print(f"| {algo.upper()} {mode}{extra} | {r.get('kernel','')} | "
                  f"{ms} | {r['value']} | {spread} | "
                  f"{r.get('vs_baseline','')}x |")
        print()
    if engine:
        print("| Engine config | pairs/sec (best) | total s "
              "(mean +- spread) | kernel phase GCUPS |")
        print("|---|---|---|---|")
        for r in engine:
            lbl = r.get("label", r["metric"])
            tot = (f"{r['total_s_mean']} +- {r['total_s_spread']}"
                   if "total_s_mean" in r else r.get("total_s", ""))
            print(f"| {lbl} | {r['value']} | {tot} | "
                  f"{r.get('gcups_kernel_phase','')} |")
        print()
    for r in other:
        print(f"- `{json.dumps(r)}`")
    return 0


if __name__ == "__main__":
    sys.exit(main())
