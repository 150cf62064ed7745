"""The benchmark's accelerator-init guard (bench.py::_require_accelerator)
must never re-exec when an accelerator is present, when retries are
exhausted, or when the wall budget is already spent — and must never crash
on a raising backend."""

import importlib.util
import os


def _load_bench(monkeypatch, **env):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Dev:
    def __init__(self, platform):
        self.platform = platform


class _Jax:
    def __init__(self, platform=None, raises=None):
        self._p, self._r = platform, raises

    def devices(self):
        if self._r:
            raise self._r
        return [_Dev(self._p)]


def test_accelerator_present_returns(monkeypatch):
    bench = _load_bench(monkeypatch)
    bench._require_accelerator(_Jax("tpu"))  # must not exec/sleep/raise


def test_budget_spent_continues_on_cpu(monkeypatch, capsys):
    # EPOCH0 far in the past -> elapsed exceeds the retry window
    bench = _load_bench(monkeypatch, BENCH_EPOCH0="0")
    bench._require_accelerator(_Jax("cpu"))
    assert "continuing on CPU" in capsys.readouterr().err


def test_retries_exhausted_continues_on_cpu(monkeypatch, capsys):
    bench = _load_bench(monkeypatch, BENCH_INIT_TRY="4",
                        BENCH_INIT_MAX_TRIES="4")
    bench._require_accelerator(_Jax("cpu"))
    assert "continuing on CPU" in capsys.readouterr().err


def test_raising_backend_does_not_propagate(monkeypatch, capsys):
    bench = _load_bench(monkeypatch, BENCH_INIT_TRY="4",
                        BENCH_INIT_MAX_TRIES="4")
    bench._require_accelerator(_Jax(raises=RuntimeError("axon not known")))
    assert "axon not known" in capsys.readouterr().err


def test_retry_branch_re_execs(monkeypatch, capsys):
    """With retries available and a cpu-only backend the guard re-execs
    after a wait (both syscalls stubbed)."""
    bench = _load_bench(monkeypatch, BENCH_INIT_TRY="0",
                        BENCH_INIT_MAX_TRIES="4")
    calls = {}
    monkeypatch.setattr(bench.time, "sleep", lambda s: calls.setdefault(
        "slept", s))
    monkeypatch.setattr(bench.os, "execve", lambda *a: calls.setdefault(
        "execve", a))
    bench._require_accelerator(_Jax("cpu"))
    assert calls["slept"] > 0
    exe, argv, env = calls["execve"]
    assert env["BENCH_INIT_TRY"] == "1"
    assert "BENCH_EPOCH0" in env
    assert argv[1].endswith("bench.py")
