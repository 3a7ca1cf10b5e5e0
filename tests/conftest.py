"""Test configuration: force the JAX CPU backend with 8 virtual devices.

The session's real hardware is a single TPU chip; multi-chip sharding tests
run on a virtual 8-device CPU mesh instead, and Pallas kernels run in
interpreter mode (the kernels module auto-selects interpret=True off-TPU).
Set TPU_ALIGN_TEST_BACKEND=tpu to run the suite against real hardware.
"""

import os

if os.environ.get("TPU_ALIGN_TEST_BACKEND", "cpu") == "cpu":
    # --xla_cpu_max_isa=AVX2: this box is a VM advertising AVX-512/AMX
    # that the XLA:CPU JIT cannot reliably use here (cpu_aot_loader.cc
    # machine-feature mismatches; intermittent hard crashes inside
    # backend_compile_and_load).  Capping codegen at AVX2 keeps compile
    # and execution on features the host actually handles.
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=8 "
        "--xla_cpu_max_isa=AVX2 "
        + os.environ.get("XLA_FLAGS", "")
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    # silence the XLA:CPU AOT cache-loader machine-feature chatter (E-level
    # logs about 'prefer-no-scatter' preference flags, benign on-host)
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import jax

    jax.config.update("jax_platforms", "cpu")

    # Deliberately NO persistent compilation cache here: XLA:CPU AOT
    # executable (de)serialization segfaults on machine-feature mismatch
    # (cpu_aot_loader.cc) -- with a cache dir present the suite crashed
    # 100% of the time inside jax's cache put/get path (round-3 verdict).
    # utils/cache.py now skips CPU backends; TPU_ALIGN_CACHE=on overrides.

import random

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables at every test-module boundary.

    This environment's XLA:CPU JIT segfaults inside
    backend_compile_and_load after a few hundred live executables
    accumulate in one process (reproduced at tests/test_walk_kernel.py
    ~96% through the suite; the same file passes in isolation).  Capping
    codegen ISA did not help; dropping executable references at module
    boundaries reproduces the isolation behavior in-process."""
    yield
    import jax

    jax.clear_caches()


@pytest.fixture
def rng():
    return random.Random(0xDB9)


def random_dna(rng, lo=1, hi=40, alphabet="ATCG"):
    n = rng.randint(lo, hi)
    return "".join(rng.choice(alphabet) for _ in range(n))
