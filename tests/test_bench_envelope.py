"""bench._envelope_legs quiet-window gate (VERDICT r8 #4) — hermetic:
the calibration kernel and both legs are monkeypatched, so this tests
the retry/void logic itself, not the host."""

import importlib.util
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    yield mod
    sys.modules.pop("bench_under_test", None)


def _patch(monkeypatch, bench, scales):
    """scales: successive cpu_scale values _calibration() will report."""
    it = iter(scales)
    calls = {"decode": 0, "latency": 0}
    monkeypatch.setattr(
        bench, "_calibration", lambda: {"cpu_scale": next(it)}
    )

    def decode(spark, cpus):
        calls["decode"] += 1
        return {"msgs_per_sec": 400_000}

    def latency(spark):
        calls["latency"] += 1
        return {"ms": 900}

    monkeypatch.setattr(bench, "_pgoutput_decode_throughput", decode)
    monkeypatch.setattr(bench, "_e2e_visibility_latency", latency)
    return calls


def test_quiet_first_window_no_retry(bench, monkeypatch):
    calls = _patch(monkeypatch, bench, [1.0, 1.02])
    d, l, cal, env = bench._envelope_legs(None, 4)
    assert calls == {"decode": 1, "latency": 1}
    assert env["attempts"] == 1
    assert env["cpu_scale_windows"] == [1.02]  # worst of pre/post
    assert env["tenancy_voided"] is False
    assert cal == {"cpu_scale": 1.02}  # the post-leg measurement


def test_noisy_then_quiet_retries_and_accepts(bench, monkeypatch):
    # attempt 1: pre 1.2 / post 1.1 (noisy); attempt 2: 1.01 / 1.03
    calls = _patch(monkeypatch, bench, [1.2, 1.1, 1.01, 1.03])
    d, l, cal, env = bench._envelope_legs(None, 4)
    assert calls == {"decode": 2, "latency": 2}
    assert env["attempts"] == 2
    assert env["cpu_scale_windows"] == [1.2, 1.03]
    assert env["cpu_scale_window"] == 1.03
    assert env["tenancy_voided"] is False


def test_never_quiet_voids_with_provenance(bench, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ENVELOPE_RETRIES", "2")
    calls = _patch(monkeypatch, bench, [1.3, 1.2, 1.25, 1.4])
    d, l, cal, env = bench._envelope_legs(None, 4)
    assert calls == {"decode": 2, "latency": 2}  # bounded by retries
    assert env["attempts"] == 2
    assert env["cpu_scale_windows"] == [1.3, 1.4]
    assert env["tenancy_voided"] is True
    # the legs' numbers are still returned — annotated, not dropped
    assert d["msgs_per_sec"] == 400_000 and l["ms"] == 900
