"""The bench probe gate's dispersion guard (no Spark needed).

A round-5 rerun showed the failure mode directly: tier-pipeline passes
of 5.9 / 39.2 / 92.2 s inside a bracket whose two INSTANTANEOUS sha
probes agreed and sat in band — mid-pass steal bursts are invisible to
endpoint sampling.  The gate therefore also requires repeated passes of
the same deterministic job to agree with each other (ratio ≤ DISP_MAX
once the spread exceeds the sub-second-jitter floor DISP_ABS_S), and
prefers a self-consistent window over a faster-probed dispersed one.
"""

import importlib.util
import os
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench_mod(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DOCS", "1")
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, _ROOT)
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.pop(0)
    return mod


def _stub_probes(mod, mops_seq):
    it = iter(mops_seq)

    def fake():
        return {"ops_per_sec": next(it) * 1e6}

    mod._hw_probe = fake


def test_dispersed_window_retries_and_cites_consistent_one(bench_mod):
    gate = bench_mod._ProbeGate()
    _stub_probes(bench_mod, [13.0, 12.0, 14.0, 14.2])
    vals = iter([5.9, 92.2, 39.2, 6.0, 6.1, 5.9])
    rec = gate.measure("x", lambda: next(vals), 3, max_attempts=2)
    assert rec["passes"] == [6.0, 6.1, 5.9]
    assert rec["probe"]["healthy"]
    assert rec["probe"]["disp_ok"]
    assert rec["probe"]["attempts"] == 2


def test_dispersion_alone_marks_unhealthy(bench_mod):
    gate = bench_mod._ProbeGate()
    # probes perfect both attempts; passes never self-agree
    _stub_probes(bench_mod, [14.0, 14.0, 14.0, 14.0, 14.0, 14.0])
    vals = iter([5.0, 40.0, 12.0, 6.0, 30.0, 11.0])
    rec = gate.measure("x", lambda: next(vals), 3, max_attempts=2)
    assert not rec["probe"]["healthy"]
    assert not rec["probe"]["disp_ok"]


def test_subsecond_jitter_does_not_flag(bench_mod):
    gate = bench_mod._ProbeGate()
    _stub_probes(bench_mod, [14.0, 14.0])
    # 0.1 -> 0.35 s is a 3.5x ratio but inside the absolute floor
    vals = iter([0.1, 0.35, 0.2])
    rec = gate.measure("x", lambda: next(vals), 3, max_attempts=1)
    assert rec["probe"]["disp_ok"]
    assert rec["probe"]["healthy"]


def test_consistent_window_preferred_over_faster_probed_dispersed(bench_mod):
    gate = bench_mod._ProbeGate()
    # attempt 1: fast probes (15) but dispersed passes; attempt 2:
    # probes at 8.0 — run median is 11.5, band 0.75×11.5 = 8.625, so
    # attempt 2 is genuinely below band (unhealthy) but self-consistent.
    # With NO healthy attempt the gate must cite the self-consistent
    # one via _better, not the faster-probed dispersed one.
    _stub_probes(bench_mod, [15.0, 15.0, 8.0, 8.0])
    vals = iter([5.0, 40.0, 12.0, 20.0, 21.0, 20.5])
    rec = gate.measure("x", lambda: next(vals), 3, max_attempts=2)
    assert rec["passes"] == [20.0, 21.0, 20.5]
    assert rec["probe"]["disp_ok"]
    assert not rec["probe"]["healthy"]  # below band — _better chose it
