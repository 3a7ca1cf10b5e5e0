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


def test_budget_deadline_parsing(monkeypatch):
    b = _bench()
    monkeypatch.setenv("TPU_ALIGN_BENCH_BUDGET", "off")
    assert b._budget_deadline() is None
    monkeypatch.setenv("TPU_ALIGN_BENCH_BUDGET", "0")
    assert b._budget_deadline() is None
    monkeypatch.setenv("TPU_ALIGN_BENCH_BUDGET", "120")
    d = b._budget_deadline()
    assert d is not None and b._remaining(d) <= 120
    monkeypatch.delenv("TPU_ALIGN_BENCH_BUDGET")
    assert b._budget_deadline() is not None  # default 540 stays on


def test_bench_emits_json_with_exhausted_budget():
    """The rc=124 regression: a warmup that eats the whole budget must
    still produce a result line (one reps=1 iteration), not die silently."""
    import time
    b = _bench()
    # deadline already in the past when the measurement loop starts
    res = b.run_bench(num_pairs=64, seq_len=24, batch_pairs=64,
                      iters=5, verbose=False, deadline=time.monotonic() - 1)
    assert res["metric"] == "lnw_fill_gcups"
    assert res["kernel_ms"] > 0
    assert len(res["gcups_samples"]) == 1  # degraded to a single iteration


def test_bench_budget_off_runs_all_iters():
    b = _bench()
    res = b.run_bench(num_pairs=64, seq_len=24, batch_pairs=64,
                      iters=3, verbose=False, deadline=None)
    assert len(res["gcups_samples"]) == 3


def test_supervisor_retries_hang_then_succeeds(monkeypatch, capsys):
    """A hung first attempt (TimeoutExpired) must be killed and retried;
    the second attempt's final stdout line is forwarded verbatim."""
    import subprocess

    b = _bench()
    monkeypatch.setenv("TPU_ALIGN_BENCH_BUDGET", "300")
    calls = []

    def fake_run(cmd, env=None, timeout=None, **kw):
        calls.append(timeout)
        if len(calls) == 1:
            raise subprocess.TimeoutExpired(cmd, timeout, stderr="hung")
        class P:
            returncode = 0
            stdout = "warmup noise\n{\"metric\": \"x\", \"value\": 1}\n"
            stderr = "child log\n"
        return P()

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert b._supervise([]) == 0
    assert len(calls) == 2
    assert calls[0] < 300  # first attempt leaves retry headroom
    out = capsys.readouterr().out.strip()
    assert out == '{"metric": "x", "value": 1}'


def test_supervisor_gives_up_when_budget_gone(monkeypatch):
    import time as _t

    b = _bench()
    monkeypatch.setenv("TPU_ALIGN_BENCH_BUDGET", "1")
    _t.sleep(1.1)  # NOTE: deadline measured from process start, long past
    assert b._supervise([]) == 1


def test_budget_deadline_malformed_falls_back(monkeypatch, capsys):
    b = _bench()
    monkeypatch.setenv("TPU_ALIGN_BENCH_BUDGET", "9m")
    d = b._budget_deadline()
    assert d is not None  # falls back to the 540 default, no ValueError
    assert "malformed" in capsys.readouterr().err


def test_supervisor_stops_on_fast_deterministic_failures(monkeypatch):
    """A child that dies immediately (import error, bad knob) must not
    be re-spawned until the budget drains: two fast failures give up."""
    import subprocess

    b = _bench()
    monkeypatch.setenv("TPU_ALIGN_BENCH_BUDGET", "300")
    calls = []

    def fake_run(cmd, env=None, timeout=None, **kw):
        calls.append(timeout)
        class P:
            returncode = 1
            stdout = ""
            stderr = "Traceback: boom\n"
        return P()

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert b._supervise([]) == 1
    assert len(calls) == 2


def test_supervisor_forwards_argparse_errors(monkeypatch):
    """rc=2 (argparse usage error) is deterministic: no retry, child rc
    forwarded."""
    import subprocess

    b = _bench()
    monkeypatch.setenv("TPU_ALIGN_BENCH_BUDGET", "300")
    calls = []

    def fake_run(cmd, env=None, timeout=None, **kw):
        calls.append(timeout)
        class P:
            returncode = 2
            stdout = "usage: bench.py ...\n"
            stderr = "error: unrecognized arguments\n"
        return P()

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert b._supervise([]) == 2
    assert len(calls) == 1


def test_supervisor_help_runs_inline(monkeypatch):
    b = _bench()
    monkeypatch.setenv("TPU_ALIGN_BENCH_BUDGET", "300")
    assert b._supervise(["--help"]) is None  # caller falls through to main


def test_supervisor_kill_timeout_exceeds_child_budget(monkeypatch, capsys):
    """The parent's kill timeout must give the child headroom past its
    own TPU_ALIGN_BENCH_BUDGET so the degraded final iteration can
    still emit its JSON line."""
    import subprocess

    b = _bench()
    monkeypatch.setenv("TPU_ALIGN_BENCH_BUDGET", "300")
    seen = {}

    def fake_run(cmd, env=None, timeout=None, **kw):
        seen["child_budget"] = float(env["TPU_ALIGN_BENCH_BUDGET"])
        seen["kill_timeout"] = timeout
        class P:
            returncode = 0
            stdout = '{"metric": "x", "value": 1}\n'
            stderr = ""
        return P()

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert b._supervise([]) == 0
    assert seen["kill_timeout"] > seen["child_budget"]
