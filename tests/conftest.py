"""Test configuration: force the JAX CPU backend with 8 virtual devices.

The session's real hardware is a single TPU chip; multi-chip sharding tests
run on a virtual 8-device CPU mesh instead, and Pallas kernels run in
interpreter mode (the kernels module auto-selects interpret=True off-TPU).
Set TPU_ALIGN_TEST_BACKEND=tpu to run the suite against real hardware.
"""

import os

if os.environ.get("TPU_ALIGN_TEST_BACKEND", "cpu") == "cpu":
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=8 "
        + os.environ.get("XLA_FLAGS", "")
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    # silence the XLA:CPU AOT cache-loader machine-feature chatter (E-level
    # logs about 'prefer-no-scatter' preference flags, benign on-host)
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import jax

    jax.config.update("jax_platforms", "cpu")

    # the suite's cost is almost entirely XLA:CPU compiles of the
    # interpret-mode kernels (~5-10 s per distinct shape); the persistent
    # cache makes each shape a one-time cost across pytest runs
    from tpu_align.utils.cache import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.expanduser("~"), ".cache", "tpu_align",
                     "xla-cpu-tests")
    )

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xDB9)


def random_dna(rng, lo=1, hi=40, alphabet="ATCG"):
    n = rng.randint(lo, hi)
    return "".join(rng.choice(alphabet) for _ in range(n))
