"""Extended cross-implementation fuzz sweep.

Drives the repo's fuzz flows (tests/test_fuzz.py) over many fresh seeds,
recycling the worker process every CHUNK seeds so XLA:CPU executable
accumulation can't segfault a long run.

Usage:
  python scripts/fuzz_sweep.py            # driver: run seeds until deadline
  python scripts/fuzz_sweep.py worker A B # worker: run seeds [A, B)
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHUNK = 12
DEADLINE_S = float(os.environ.get("FUZZ_BUDGET_S", "3600"))


def worker(a: int, b: int) -> int:
    os.chdir(REPO)
    sys.path.insert(0, REPO)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import tests.conftest  # noqa: F401  (applies the XLA:CPU env guards)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tests.test_fuzz import (
        test_fuzz_params_and_sequences,
        test_fuzz_stagger_and_device_walk,
    )

    for seed in range(a, b):
        test_fuzz_params_and_sequences(seed)
        test_fuzz_stagger_and_device_walk(seed)
        if (seed - a) % 4 == 3:
            jax.clear_caches()
    print(f"worker ok {a}..{b}")
    return 0


def driver() -> int:
    t_end = time.monotonic() + DEADLINE_S
    seed = int(os.environ.get("FUZZ_START_SEED", "100"))
    done = 0
    while time.monotonic() < t_end:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "worker",
             str(seed), str(seed + CHUNK)],
            capture_output=True, text=True, timeout=1800,
        )
        if r.returncode != 0:
            print(f"FUZZ FAILURE in seeds {seed}..{seed + CHUNK}:")
            print(r.stdout[-3000:])
            print(r.stderr[-6000:])
            return 1
        done += CHUNK
        seed += CHUNK
        print(f"{done} seeds clean ({time.monotonic() - t_end + DEADLINE_S:.0f}s)",
              flush=True)
    print(f"DONE: {done} seeds clean")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        sys.exit(worker(int(sys.argv[2]), int(sys.argv[3])))
    sys.exit(driver())
