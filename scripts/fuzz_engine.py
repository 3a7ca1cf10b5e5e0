"""Engine-level fuzz: random params + sequences through the FULL pipeline
(bucketize -> compiled-path fills -> device walk -> native blocks), byte-
compared against the scalar oracle.  Complements tests/test_fuzz.py (which
fuzzes kernels directly) by covering bucketing, the blocks formatter, and
the engine's dispatch pipeline under random parameters.

Usage:
  python scripts/fuzz_engine.py            # driver until FUZZ_BUDGET_S
  python scripts/fuzz_engine.py worker A B
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHUNK = 6
DEADLINE_S = float(os.environ.get("FUZZ_BUDGET_S", "3600"))


def worker(a: int, b: int) -> int:
    os.chdir(REPO)
    sys.path.insert(0, REPO)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import tests.conftest  # noqa: F401
    import random

    import jax

    jax.config.update("jax_platforms", "cpu")
    from tests.conftest import random_dna
    from tpu_align.core.params import Algorithm, AlignmentParams
    from tpu_align.io.bucketing import BucketSpec
    from tpu_align.io.dataset import PairDataset
    from tpu_align.oracle.api import align_batch
    from tpu_align.runtime.engine import AlignmentEngine

    algos = [Algorithm.LNW, Algorithm.LSW, Algorithm.ANW, Algorithm.BSW]
    for seed in range(a, b):
        rng = random.Random(seed)
        params = AlignmentParams(
            match=rng.randint(1, 6), mismatch=rng.randint(-5, 0),
            gap=rng.randint(-5, -1), gap_open=rng.randint(-8, -1),
            gap_extend=rng.randint(-3, -1), band=rng.randint(2, 14),
        )
        # longer sequences than test_fuzz: cross stripe (S=32) and
        # direction-word boundaries several times; tie-rich alphabet
        pairs = [(random_dna(rng, 1, 300, alphabet="AT"),
                  random_dna(rng, 1, 300, alphabet="AT"))
                 for _ in range(12)]
        ds = PairDataset.from_pairs(pairs)
        spec = BucketSpec(batch_pairs=8, query_multiple=64)
        for algo in algos:
            want = align_batch(algo, params, pairs, engine="scalar")
            for i, w in enumerate(want):
                w.pair_num = i
            golden = "".join(w.block() for w in want)
            for tb, walker in (("host", "xla"), ("device", "pallas")):
                out = AlignmentEngine(
                    algo, params=params, bucket_spec=spec, traceback=tb,
                    walker=walker, output="blocks",
                ).run(ds)
                got = out.output_bytes().decode("ascii")
                if got != golden:
                    print(f"MISMATCH seed={seed} {algo} tb={tb} "
                          f"walker={walker} params={params}")
                    for gl, wl in zip(got.splitlines(),
                                      golden.splitlines()):
                        if gl != wl:
                            print(" got:", gl[:120])
                            print(" want:", wl[:120])
                            break
                    return 1
        jax.clear_caches()
    print(f"worker ok {a}..{b}")
    return 0


def driver() -> int:
    t_end = time.monotonic() + DEADLINE_S
    seed = int(os.environ.get("FUZZ_START_SEED", "5000"))
    done = 0
    while time.monotonic() < t_end:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "worker",
             str(seed), str(seed + CHUNK)],
            capture_output=True, text=True, timeout=2400,
        )
        if r.returncode != 0:
            print(f"FUZZ FAILURE in seeds {seed}..{seed + CHUNK}:")
            print(r.stdout[-3000:])
            print(r.stderr[-6000:])
            return 1
        done += CHUNK
        seed += CHUNK
        print(f"{done} engine seeds clean", flush=True)
    print(f"DONE: {done} engine seeds clean")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        sys.exit(worker(int(sys.argv[2]), int(sys.argv[3])))
    sys.exit(driver())
