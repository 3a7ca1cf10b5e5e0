"""Command-line driver: the c++/main.cpp / CUDA main() equivalent.

Flags mirror the reference CLI (c++/main.cpp:118-150): -pairs, -match,
-mismatch, -gap, -open, -extend; algorithm selection is a runtime flag
instead of the reference's compile-time #defines (main.cpp:22-24), plus
TPU-specific knobs (bucketing, traceback, scores-only).

Usage:
    python -m tpu_align -pairs input.txt -algorithm lnw -match 3 -mismatch -1 -gap -2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# Honor JAX_PLATFORMS before any jax-touching import: some platform
# plugins (e.g. the tunneled axon TPU) register themselves regardless of
# the env var, so pin the platform through jax.config explicitly.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.io.bucketing import BucketSpec
from tpu_align.io.dataset import parse_pair_file
from tpu_align.runtime.engine import AlignmentEngine


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tpu_align",
        description="TPU-native pairwise sequence alignment",
    )
    p.add_argument("-pairs", required=True, help="3-line-per-pair input file")
    p.add_argument("-algorithm", default="lnw",
                   choices=[a.value for a in Algorithm],
                   help="lnw | lsw | anw | bsw")
    p.add_argument("-match", type=int, default=3)
    p.add_argument("-mismatch", type=int, default=-1)
    p.add_argument("-gap", type=int, default=-2)
    p.add_argument("-open", dest="gap_open", type=int, default=-4)
    p.add_argument("-extend", dest="gap_extend", type=int, default=-1)
    p.add_argument("-band", type=int, default=16, help="BSW band half-width")
    p.add_argument("-batch-pairs", type=int, default=2048,
                   help="pairs per kernel batch (V19 BATCH_SIZE analogue)")
    p.add_argument("-scores-only", action="store_true",
                   help="skip traceback (V6-style fast path)")
    p.add_argument("-all-paths", action="store_true",
                   help="emit every co-optimal path: local aligners walk "
                        "every max cell (the CPU BACKTRACK_ALL switch, "
                        "c++/LinearSmithWaterman.h:9), lnw enumerates all "
                        "co-optimal global paths "
                        "(python/LinearNeedlemanWunsch.py:98-191); oracle "
                        "path, no kernels")
    p.add_argument("-traceback", default="host",
                   choices=["host", "device", "hirschberg"],
                   help="walk packed directions on the host (threaded "
                        "native walker), on the accelerator (V8-style; "
                        "only move streams transfer), or store no "
                        "directions at all (hirschberg: O(M+N)-memory "
                        "recompute for very long pairs; lnw/lsw/anw)")
    p.add_argument("-walker", default="xla", choices=["xla", "pallas"],
                   help="device-walk engine for -traceback device "
                        "(lnw/lsw/anw): jitted while_loop or the Pallas "
                        "walk kernel")
    p.add_argument("-kernel", default="auto",
                   choices=["auto", "stagger", "rowscan"],
                   help="fill formulation for lnw/lsw/anw")
    p.add_argument("-stripe", type=int, default=0, metavar="S",
                   help="stagger stripe width: query rows per wavefront "
                        "stripe (the LNW V1 -threads-per-alignment knob, "
                        "cuda/LNW/LinearNeedlemanWunsch.cu:199-225); "
                        "0 = measured optimum (32)")
    p.add_argument("-max-inflight", type=int, default=4,
                   help="bucket kernels outstanding at once (V13 "
                        "STREAM_BATCH_SIZE analogue; 0 = unbounded)")
    p.add_argument("-no-output", action="store_true",
                   help="suppress per-pair blocks; print stats only")
    p.add_argument("-output", default="auto",
                   choices=["auto", "records", "blocks"],
                   help="result assembly: per-pair records or the native "
                        "block formatter (no per-pair Python strings; "
                        "byte-identical output).  auto = blocks; both "
                        "modes support -checkpoint-dir")
    p.add_argument("-out", default=None, help="write output blocks to file")
    p.add_argument("-checkpoint-dir", default=None,
                   help="persist per-batch results; re-runs resume from here")
    p.add_argument("-mesh", type=int, default=0, metavar="N",
                   help="run data-parallel over N local devices (0 = single "
                        "device; -1 = all).  Fills -- and device walks -- "
                        "run under shard_map on a `pairs` mesh; output is "
                        "byte-identical to the single-device run")
    return p


def main(argv=None) -> int:
    from tpu_align.utils.cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    algorithm = Algorithm(args.algorithm)
    params = AlignmentParams(
        match=args.match, mismatch=args.mismatch, gap=args.gap,
        gap_open=args.gap_open, gap_extend=args.gap_extend, band=args.band,
    )
    t0 = time.perf_counter()
    ds = parse_pair_file(args.pairs)
    parse_s = time.perf_counter() - t0
    st = ds.stats()
    if args.all_paths and algorithm is Algorithm.ANW:
        print("-all-paths supports lnw (all co-optimal global paths, "
              "python/LinearNeedlemanWunsch.py:98-191) and lsw/bsw "
              "(BACKTRACK_ALL), not anw", file=sys.stderr)
        return 2
    output = args.output
    if output == "auto":
        output = "blocks"
    if args.mesh and (args.all_paths or args.traceback == "hirschberg"):
        print("-mesh covers the bucketed kernel path; -all-paths and "
              "-traceback hirschberg run unsharded -- drop -mesh for "
              "those modes", file=sys.stderr)
        return 2
    mesh = None
    if args.mesh:
        import jax

        from tpu_align.distributed import make_pairs_mesh

        devs = jax.devices()
        n = len(devs) if args.mesh < 0 else args.mesh
        if n > len(devs):
            print(f"-mesh {n}: only {len(devs)} devices visible",
                  file=sys.stderr)
            return 2
        mesh = make_pairs_mesh(devs[:n])
    engine = AlignmentEngine(
        algorithm, params,
        bucket_spec=BucketSpec(batch_pairs=args.batch_pairs),
        with_traceback=not args.scores_only,
        local_mode="all" if args.all_paths else "single",
        max_inflight=args.max_inflight,
        kernel=args.kernel,
        traceback=args.traceback,
        walker=args.walker,
        output=output,
        mesh=mesh,
        stripe_s=args.stripe or None,
    )
    out = engine.run(ds, checkpoint_dir=args.checkpoint_dir)
    if not args.no_output:
        data = out.output_bytes()
        if args.out:
            with open(args.out, "wb") as f:
                f.write(data)
        else:
            sys.stdout.buffer.write(data)
            sys.stdout.flush()
    # dataset banner + phase timers, after the blocks like the reference
    # (cuda/LNW/LinearNeedlemanWunschV19.cu:662-680)
    err = sys.stderr
    print(f"Number of pairs: {st.num_pairs}", file=err)
    print(f"Total number of cells: {st.num_cells}", file=err)
    print(f"Reference length min/max/avg: {st.min_reference_length}/"
          f"{st.max_reference_length}/{st.avg_reference_length:.1f}", file=err)
    print(f"Query length min/max/avg: {st.min_query_length}/"
          f"{st.max_query_length}/{st.avg_query_length:.1f}", file=err)
    print(f"{'parse':>12}: {parse_s * 1e6:14.1f} us", file=err)
    print(out.timer.report(), file=err)
    if out.timer.seconds.get("kernel"):
        print(f"GCUPS (kernel): {out.gcups:.3f}", file=err)
    else:
        # device-traceback runs never block in a host-visible kernel
        # phase (fill+walk overlap dispatch/backtrack); a 0.000 here
        # would misread as a broken kernel
        print("GCUPS (kernel): n/a (device-overlapped; see total)",
              file=err)
    return 0


if __name__ == "__main__":
    sys.exit(main())
