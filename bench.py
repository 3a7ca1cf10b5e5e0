"""Headline benchmark: LNW DP-fill GCUPS on a 100k-pair read workload.

Mirrors the reference's benchmark definition: 100,000 pairs (the bandedSWA
SRR7733443 "small" workload shape, c++/Makefile:4 -- LFS-absent, so we
regenerate a statistically similar ~250bp read workload), weights
match/mismatch/gap = 3/-1/-2, GCUPS = numCells / kernel_seconds
(cuda/LNW/LinearNeedlemanWunschV19.cu:669-673 with numCells from
c++/parseInput.cpp:100).

Baseline: the strongest committed reference kernel measurement is LNW V12 on
H100, 51.8 ms kernel for the 100k-pair workload (BASELINE.md, 'V12
Comparison' sheet).  The reference never committed its dataset's cell count;
assuming the published SRR7733443 mean read length (~250bp both sides),
numCells ~= 100k * 250 * 250 = 6.25e9, giving ~120.7 GCUPS on H100 (and
~32.8 on the V100 where the 190 ms kernel ran).  vs_baseline compares our
GCUPS/chip against the H100-implied 120.7.

Prints ONE JSON line: {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

# the axon plugin registers itself regardless of JAX_PLATFORMS; honor the
# env var through jax.config before any backend is touched (same pattern
# as cli.py / tests/conftest.py)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

BASELINE_GCUPS_H100 = 120.7  # implied: 6.25e9 cells / 51.8 ms (BASELINE.md)

# Time-budget guard (round-4 postmortem: the driver's `python bench.py`
# hit its timeout during a cold-cache warmup and the round ended with NO
# verified number).  The budget is measured from process start; once the
# unavoidable parts (warmup/compile, RTT baseline) have eaten most of it,
# the measurement loop degrades gracefully -- fewer iterations, fewer
# reps -- instead of running past the external timeout.  At least one
# measured iteration always runs so the JSON line always prints.
_T_PROC_START = time.monotonic()


def _budget_deadline() -> float | None:
    """Absolute monotonic deadline from TPU_ALIGN_BENCH_BUDGET (seconds
    from process start; default 540; 0/off disables)."""
    raw = os.environ.get("TPU_ALIGN_BENCH_BUDGET", "540").strip().lower()
    if raw in ("0", "off", "none", "no", ""):
        return None
    try:
        secs = float(raw)
    except ValueError:
        print(f"bench: ignoring malformed TPU_ALIGN_BENCH_BUDGET={raw!r}; "
              "using 540", file=sys.stderr)
        secs = 540.0
    return _T_PROC_START + secs


def _remaining(deadline: float | None) -> float:
    return float("inf") if deadline is None else deadline - time.monotonic()


def run_bench(num_pairs=100_000, seq_len=250, with_traceback=True,
              batch_pairs=32768, iters=5, algorithm="lnw", verbose=True,
              profile_dir=None, kernel="auto", stripe=None, deadline=None):
    from tpu_align.utils.cache import enable_compile_cache

    enable_compile_cache()
    import functools

    from tpu_align.core.params import Algorithm, AlignmentParams
    from tpu_align.io import BucketSpec, bucketize
    from tpu_align.kernels.fill import fill_bucket_async
    from tpu_align.kernels.stagger import STRIPE_S, fill_stagger_bucket_async
    from tpu_align.utils import synthetic_dataset

    algo = Algorithm(algorithm)
    if kernel == "auto":
        kernel = "banded" if algo.is_banded else "stagger"
    if kernel == "stagger":
        fill_bucket_async = functools.partial(
            fill_stagger_bucket_async, stripe_s=stripe or STRIPE_S
        )
    elif kernel == "banded":
        from tpu_align.kernels.banded import fill_banded_bucket_async

        def fill_bucket_async(algo_, params_, *a, **k):
            return fill_banded_bucket_async(params_, *a, **k)
    params = AlignmentParams()
    log = (lambda *a: print(*a, file=sys.stderr)) if verbose else (lambda *a: None)

    t0 = time.perf_counter()
    ds = synthetic_dataset(num_pairs, uniform_len=seq_len, seed=42)
    log(f"dataset: {num_pairs} pairs, {ds.num_cells / 1e9:.2f} Gcells, "
        f"gen {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    # query_multiple=32 keeps the distinct kernel-shape count (and thus
    # remote compile time) minimal -- 2 shapes for the 100k workload at
    # the same 95.03% padding efficiency as 16 (measured round 5)
    spec = BucketSpec(batch_pairs=batch_pairs, pair_multiple=128,
                      query_multiple=32)
    buckets = bucketize(ds, spec)
    pad_cells = sum(b.batch * b.padded_qry * b.padded_ref for b in buckets)
    log(f"bucketize: {len(buckets)} buckets in {time.perf_counter() - t0:.1f}s, "
        f"padding efficiency {ds.num_cells / pad_cells:.2%}")

    # pre-stage device inputs so the measured loop is kernel-only
    t0 = time.perf_counter()
    staged = [
        tuple(jax.device_put(x) for x in
              (b.ref_tokens, b.qry_tokens, b.ref_len, b.qry_len))
        for b in buckets
    ]
    jax.block_until_ready(staged[-1])
    log(f"staged {len(staged)} buckets in {time.perf_counter() - t0:.1f}s")

    def dispatch_all(reps=1):
        out = None
        for _ in range(reps):
            for (rt, qt, rl, ql) in staged:
                out = fill_bucket_async(
                    algo, params, rt, qt, rl, ql,
                    with_traceback=with_traceback,
                )
        # The device stream is in-order: one tiny readback of the LAST
        # dispatched bucket's scores proves every kernel finished.  (On
        # remote/tunneled backends block_until_ready can return before
        # execution completes, and per-bucket readbacks would pay one
        # round trip each.)  Dispatching `reps` sweeps before the single
        # sync amortizes the host<->device round trip, which on tunneled
        # backends is comparable to the kernel time itself.
        np.asarray(out[0])

    t0 = time.perf_counter()
    dispatch_all()  # warmup / compile
    log(f"warmup+compile: {time.perf_counter() - t0:.1f}s")

    # host<->device round-trip baseline, subtracted from measured times
    tiny = jax.device_put(np.zeros(4, np.int32))
    np.asarray(tiny + 1)
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(tiny + 1)
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    log(f"round-trip baseline: {rtt * 1e3:.1f} ms")

    if profile_dir:
        # jax.profiler trace of one sweep (open with TensorBoard / xprof)
        with jax.profiler.trace(profile_dir):
            dispatch_all()
        log(f"profiler trace written to {profile_dir}")

    reps = 4
    if _remaining(deadline) < 30:
        # warmup ate nearly the whole budget: take the cheapest valid
        # measurement rather than none (higher spread, still a number)
        reps = 1
        log(f"budget: {_remaining(deadline):.0f}s left after warmup; "
            f"degrading to reps=1")
    times = []
    last_iter_wall = 0.0
    for it in range(iters):
        if times and _remaining(deadline) < 2.0 * last_iter_wall:
            log(f"budget: stopping after {len(times)}/{iters} iters "
                f"({_remaining(deadline):.0f}s left)")
            break
        t0 = time.perf_counter()
        dispatch_all(reps=reps)
        last_iter_wall = time.perf_counter() - t0
        times.append(max((last_iter_wall - rtt) / reps, 1e-9))
        log(f"iter {it}: kernel {times[-1] * 1e3:.1f} ms, "
            f"{ds.num_cells / times[-1] / 1e9:.1f} GCUPS")
    best = min(times)
    gcups = ds.num_cells / best / 1e9
    # multi-run statistics (the reference commits 10 runs/version in
    # Timing_Analysis.xlsx): per-iteration GCUPS samples + mean +- spread
    # alongside the best-of headline
    g_samples = [ds.num_cells / t / 1e9 for t in times]
    g_mean = sum(g_samples) / len(g_samples)
    g_std = (sum((g - g_mean) ** 2 for g in g_samples)
             / max(len(g_samples) - 1, 1)) ** 0.5
    return {
        "metric": f"{algo.value}_fill_gcups",
        "value": round(gcups, 2),
        "unit": "GCUPS/chip",
        "vs_baseline": round(gcups / BASELINE_GCUPS_H100, 3),
        "gcups_mean": round(g_mean, 2),
        "gcups_std": round(g_std, 2),
        "gcups_samples": [round(g, 1) for g in g_samples],
        "kernel_ms": round(best * 1e3, 1),
        "kernel_ms_samples": [round(t * 1e3, 2) for t in times],
        "pairs_per_sec": round(num_pairs / best),
        "num_pairs": num_pairs,
        "seq_len": seq_len,
        "cells": ds.num_cells,
        "traceback": with_traceback,
        "kernel": kernel,
        "stripe": stripe,
        "backend": jax.default_backend(),
    }


def run_engine_bench(num_pairs=100_000, seq_len=250, batch_pairs=4096,
                     algorithm="lnw", verbose=True, traceback_mode="host",
                     walker="xla", output="blocks", runs=3, deadline=None,
                     prestage=False):
    """End-to-end engine run (fill + traceback + formatting) with the V19
    phase breakdown; emits a record consumable by
    tpu_align.utils.timing_analysis.  traceback_mode='device' exercises
    the V8-style on-accelerator walk (only move streams transfer);
    output='blocks' uses the native block formatter (no per-pair Python
    strings), 'records' the per-pair AlignmentResult path."""
    from tpu_align.core.params import Algorithm
    from tpu_align.io.bucketing import BucketSpec
    from tpu_align.runtime.engine import AlignmentEngine
    from tpu_align.utils import synthetic_dataset
    from tpu_align.utils.cache import enable_compile_cache

    enable_compile_cache()
    algo = Algorithm(algorithm)
    log = (lambda *a: print(*a, file=sys.stderr)) if verbose else (lambda *a: None)
    ds = synthetic_dataset(num_pairs, uniform_len=seq_len, seed=42)
    engine = AlignmentEngine(
        algo,
        # pair_multiple=4096 keeps every bucket batch divisible by the
        # Pallas walker's widest lane group (walk time ~ B/group)
        bucket_spec=BucketSpec(batch_pairs=batch_pairs, pair_multiple=4096),
        traceback=traceback_mode,
        walker=walker,
        output=output,
    )
    engine.warmup(ds)
    prestage_bytes = prestage_s = 0
    if prestage:
        # device-resident inputs: measures the pipeline a PCIe-attached
        # host would see (the reference's sequence H2D is ~3 ms at
        # 16 GB/s; this tunnel moves ~20 MB/s -- scripts/probe_tunnel.py).
        # Reported alongside the tunnel-measured row, never instead of it.
        t0 = time.perf_counter()
        prestage_bytes = engine.prestage(ds)
        prestage_s = time.perf_counter() - t0
        log(f"prestaged {prestage_bytes / 1e6:.1f} MB in {prestage_s:.2f}s")
    totals = []
    best = None  # (total, out, nbytes): phases reported from the FASTEST run
    for _ in range(max(runs, 1)):
        if totals and _remaining(deadline) < 2.0 * totals[-1]:
            log(f"budget: stopping after {len(totals)}/{runs} runs "
                f"({_remaining(deadline):.0f}s left)")
            break
        t0 = time.perf_counter()
        out = engine.run(ds)
        with out.timer.phase("printing"):
            # the reference's printing analogue: stream the blocks to an
            # output sink (write(2) of the final byte stream; no extra
            # in-memory copy of the ~80 MB output)
            if out.blocks is not None:
                with open(os.devnull, "wb") as sink:
                    out.blocks.tofile(sink)
                nbytes = int(out.blocks.size)
            else:
                nbytes = len(out.output_bytes())
        totals.append(time.perf_counter() - t0)
        if best is None or totals[-1] < best[0]:
            best = (totals[-1], out, nbytes)
        log(f"run {len(totals)}: {totals[-1]:.3f}s")
    total, out, data_len = best
    mean = sum(totals) / len(totals)
    spread = max(totals) - min(totals)
    log(out.timer.report())
    return {
        "metric": f"{algo.value}_e2e_pairs_per_sec",
        "value": round(num_pairs / total),
        "unit": "pairs/sec",
        "vs_baseline": round((num_pairs / total) / (100_000 / 0.4406), 3),
        "num_pairs": num_pairs,
        "seq_len": seq_len,
        "batch_pairs": batch_pairs,
        "total_s_samples": [round(t, 4) for t in totals],
        "total_s_mean": round(mean, 4),
        "total_s_spread": round(spread, 4),
        "label": f"{algo.value}-e2e-{traceback_mode}"
                 + (f"-{walker}" if traceback_mode == "device" else "")
                 + ("-records" if output == "records" else "")
                 + ("-prestaged" if prestage else ""),
        "prestage_bytes": prestage_bytes or None,
        "prestage_s": round(prestage_s, 3) if prestage else None,
        "traceback_mode": traceback_mode,
        "walker": walker if traceback_mode == "device" else None,
        "output": output,
        "phases": {k: round(v, 6) for k, v in out.timer.seconds.items()},
        "total_s": round(total, 4),
        "gcups_kernel_phase": round(out.gcups, 2),
        "output_bytes": data_len,
        "backend": jax.default_backend(),
    }


_TRANSIENT_MARKERS = (  # matched case-insensitively
    "unavailable", "unable to initialize backend", "deadline_exceeded",
    "deadline exceeded", "aborted", "socket", "broken pipe",
    "connection", "failed to connect", "stream terminated",
    "stream removed",
)


def _is_transient(e: BaseException) -> bool:
    """True for errors that look like a remote-worker outage/restart
    (worth retrying), False for real failures (bad config, code bugs)."""
    msg = f"{type(e).__name__}: {e}".lower()
    return any(m in msg for m in _TRANSIENT_MARKERS)


def _wait_for_backend(max_wait_s=600, verbose=True):
    """Retry backend initialization for a bounded window.

    The remote TPU worker occasionally restarts; a transient UNAVAILABLE
    at init time should not turn a benchmark run into a failure.  Retries
    touch the backend with a trivial op; gives up after max_wait_s.
    Non-transient init failures (bad config, missing plugin) surface
    immediately instead of stalling out the window."""
    log = (lambda *a: print(*a, file=sys.stderr)) if verbose else (lambda *a: None)
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        try:
            jax.device_put(np.zeros(1, np.int32)).block_until_ready()
            return
        except Exception as e:  # backend init raises RuntimeError/JaxRuntimeError
            if not _is_transient(e):
                raise
            attempt += 1
            if time.monotonic() >= deadline:
                raise
            log(f"backend unavailable (attempt {attempt}): {e}; retrying")
            time.sleep(min(60, max(5, deadline - time.monotonic())))


def _run_with_retry(fn, max_wait_s, verbose=True, max_retries=3):
    """Run the WHOLE benchmark under outage protection.

    A worker restart mid-run (e.g. during jax.device_put staging or a
    measured sweep, the round-2 BENCH_r02 failure mode) raises from deep
    inside the run; if it looks transient, wait for the backend to come
    back and re-run from scratch (stale device buffers from the dead
    worker must not be reused).  Each retry gets the FULL backend-wait
    budget -- benchmark runtime itself must not consume it (a >10-minute
    matrix sweep would otherwise exhaust the window before the outage
    even happens); max_retries bounds repeatedly-dying runs instead."""
    log = (lambda *a: print(*a, file=sys.stderr)) if verbose else (lambda *a: None)
    for attempt in range(max_retries + 1):
        try:
            return fn()
        except Exception as e:
            if not _is_transient(e) or attempt == max_retries:
                raise
            log(f"benchmark run failed on a transient backend error ({e}); "
                f"waiting for backend and retrying "
                f"(attempt {attempt + 1}/{max_retries})")
            _wait_for_backend(max(max_wait_s, 1), verbose=verbose)


def _supervise(argv) -> int:
    """Run the benchmark in a child process with a hard per-attempt
    timeout, retrying while budget remains.

    The in-process guards cannot interrupt a HUNG backend RPC (the
    remote worker occasionally becomes unresponsive without raising;
    rounds 4-5 saw `python bench.py` block indefinitely inside
    device_put/compile).  A supervisor converts hangs into bounded
    retries; the worker's server-side compile cache makes every retry
    cheaper than the last (shapes compiled by a killed attempt stay
    compiled).  Exit code 0 + one JSON line on stdout on success."""
    import subprocess

    deadline = _budget_deadline()
    if deadline is None:
        return None  # supervision needs a budget; run inline
    if any(a in ("-h", "--help") for a in argv):
        return None  # argparse help: run inline, full output
    attempt = 0
    fast_fails = 0
    while True:
        remaining = deadline - time.monotonic()
        if remaining < 45:
            print("bench supervisor: budget exhausted "
                  f"after {attempt} attempts", file=sys.stderr)
            return 1
        # first attempt gets ~60% of the budget so a hang leaves room
        # for one full retry; later attempts take what is left
        att = remaining * 0.6 if attempt == 0 else remaining - 15
        att = max(min(att, remaining - 15), 45)
        env = dict(os.environ)
        env["TPU_ALIGN_BENCH_CHILD"] = "1"
        env["TPU_ALIGN_BENCH_BUDGET"] = str(int(att))
        attempt += 1
        print(f"bench supervisor: attempt {attempt}, "
              f"{att:.0f}s timeout ({remaining:.0f}s budget left)",
              file=sys.stderr)
        t_att = time.monotonic()
        try:
            # kill timeout gets headroom over the child's own budget so
            # the child's degraded final iteration (run_bench always
            # emits one JSON line) can finish before the SIGKILL
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + argv,
                env=env,
                timeout=min(att + 30, max(deadline - time.monotonic(), 45)),
                capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired as e:
            print(f"bench supervisor: attempt {attempt} timed out "
                  f"(backend hang?); retrying", file=sys.stderr)
            if e.stderr:
                tail = e.stderr if isinstance(e.stderr, str) else \
                    e.stderr.decode("utf-8", "replace")
                print(tail[-2000:], file=sys.stderr)
            continue
        sys.stderr.write(proc.stderr[-8000:])
        if proc.returncode == 0 and proc.stdout.strip():
            # forward only the final JSON line (the contract)
            print(proc.stdout.strip().splitlines()[-1])
            return 0
        if proc.returncode == 2:  # argparse usage error: deterministic
            sys.stdout.write(proc.stdout)
            return 2
        if time.monotonic() - t_att < 45:
            # died quickly: likely a deterministic failure (import error,
            # bad knob), not a backend hang -- don't churn the budget
            fast_fails += 1
            if fast_fails >= 2:
                print("bench supervisor: 2 fast failures "
                      f"(rc={proc.returncode}); giving up", file=sys.stderr)
                return proc.returncode or 1
        else:
            fast_fails = 0
        print(f"bench supervisor: attempt {attempt} exited "
              f"rc={proc.returncode}; retrying", file=sys.stderr)


def main():
    if (os.environ.get("TPU_ALIGN_BENCH_CHILD") != "1"
            and os.environ.get("TPU_ALIGN_BENCH_SUPERVISE", "1") != "0"):
        rc = _supervise(sys.argv[1:])
        if rc is not None:
            sys.exit(rc)
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=100_000)
    ap.add_argument("--len", type=int, dest="seq_len", default=250)
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=5,
                    help="fill-bench timing iterations (samples for "
                         "mean +- spread; headline is the best)")
    ap.add_argument("--runs", type=int, default=3,
                    help="engine-bench end-to-end repetitions")
    ap.add_argument("--algorithm", default="lnw")
    ap.add_argument("--kernel", default="auto",
                    choices=["auto", "stagger", "rowscan", "banded"],
                    help="fill kernel: stagger wavefront (default for "
                         "lnw/lsw/anw), row-scan, or the skewed-band "
                         "fast path (default for bsw)")
    ap.add_argument("--stripe", type=int, default=None,
                    help="stagger stripe width S (default STRIPE_S)")
    ap.add_argument("--scores-only", action="store_true")
    ap.add_argument("--engine", action="store_true",
                    help="end-to-end engine bench with phase breakdown "
                         "(vs_baseline: reference V12 total 440.6 ms / 100k)")
    ap.add_argument("--traceback", default="host",
                    choices=["host", "device"],
                    help="engine bench traceback mode (device = V8-style "
                         "on-accelerator walk)")
    ap.add_argument("--walker", default="xla", choices=["xla", "pallas"],
                    help="device-walk engine for --traceback device")
    ap.add_argument("--output", default="blocks",
                    choices=["blocks", "records"],
                    help="engine bench result assembly: native block "
                         "formatter (default) or per-pair records")
    ap.add_argument("--prestage", action="store_true",
                    help="engine bench: upload token blobs before the "
                         "timed runs (device-resident inputs -- the "
                         "PCIe-host configuration; see engine.prestage)")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of one sweep to DIR")
    ap.add_argument("--backend-wait", type=int, default=600, metavar="S",
                    help="retry a transiently-unavailable backend for up "
                         "to S seconds before failing (0 = no retry)")
    args = ap.parse_args()
    deadline = _budget_deadline()
    if args.backend_wait:
        _wait_for_backend(args.backend_wait, verbose=not args.quiet)
    if args.engine:
        run = lambda: run_engine_bench(  # noqa: E731
            num_pairs=args.pairs, seq_len=args.seq_len,
            batch_pairs=args.batch, algorithm=args.algorithm,
            verbose=not args.quiet, traceback_mode=args.traceback,
            walker=args.walker, output=args.output, runs=args.runs,
            deadline=deadline, prestage=args.prestage,
        )
    else:
        run = lambda: run_bench(  # noqa: E731
            num_pairs=args.pairs, seq_len=args.seq_len,
            with_traceback=not args.scores_only, batch_pairs=args.batch,
            iters=args.iters, algorithm=args.algorithm, verbose=not args.quiet,
            profile_dir=args.profile, kernel=args.kernel, stripe=args.stripe,
            deadline=deadline,
        )
    # the retry protects the WHOLE run: a worker restart mid-sweep
    # (BENCH_r02's failure mode raised from jax.device_put inside
    # run_bench) re-runs the benchmark once the backend returns
    result = _run_with_retry(run, max_wait_s=args.backend_wait or 1,
                             verbose=not args.quiet)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
