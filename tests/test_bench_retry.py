"""bench.py outage protection: the round's official capture must survive
a remote-worker restart mid-run (the BENCH_r02 failure mode) without
retrying on genuine failures."""

import importlib.util
import os

import pytest


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_is_transient_classification():
    b = _bench()
    assert b._is_transient(RuntimeError(
        "Unable to initialize backend 'axon': UNAVAILABLE: TPU backend "
        "setup/compile error (Unavailable)."))
    assert b._is_transient(RuntimeError("UNAVAILABLE: socket write failed"))
    assert not b._is_transient(ValueError("batch 100 not divisible by 8"))
    assert not b._is_transient(TypeError("unexpected keyword 'stripe'"))


def test_run_with_retry_retries_transient(monkeypatch):
    b = _bench()
    monkeypatch.setattr(b, "_wait_for_backend", lambda *a, **k: None)
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("UNAVAILABLE: worker restarted mid-sweep")
        return {"ok": True}

    assert b._run_with_retry(flaky, max_wait_s=60) == {"ok": True}
    assert len(calls) == 3


def test_run_with_retry_raises_non_transient(monkeypatch):
    b = _bench()
    monkeypatch.setattr(b, "_wait_for_backend", lambda *a, **k: None)

    def broken():
        raise ValueError("real bug")

    with pytest.raises(ValueError):
        b._run_with_retry(broken, max_wait_s=60)


def test_wait_for_backend_raises_non_transient_immediately(monkeypatch):
    b = _bench()

    def bad_device_put(*a, **k):
        raise RuntimeError("plugin not found: misconfigured")

    monkeypatch.setattr(b.jax, "device_put", bad_device_put)
    with pytest.raises(RuntimeError, match="plugin not found"):
        b._wait_for_backend(max_wait_s=30, verbose=False)
