"""Bench self-validation tests (VERDICT r3 item 1: round 3's bench
published physically impossible numbers — 48e9 utt/s from an RTT-
subtraction clamp — without noticing.  These tests pin the new
two-point-differencing timer's failure behavior: a measurement whose
signal is indistinguishable from tunnel noise must come back as an
explicit error, never as a clamped or impossible rate)."""

import time

import numpy as np
import pytest

from pwn_tpu import benchmarks
from pwn_tpu.benchmarks import (
    _plausibility_check,
    _rate_result,
    _time_chain,
    analytic_dp_efficiency,
    dp_equivalence_check,
)
from pwn_tpu.config import get_config, override


def _fake_chain(overhead_s: float, per_iter_s: float):
    """Simulates the axon tunnel: fixed RTT + linear per-iteration work."""

    def chain(n):
        n = int(n)
        time.sleep(overhead_s + per_iter_s * n)
        return np.float32(n)

    return chain


def test_time_chain_recovers_per_iter_time(monkeypatch):
    monkeypatch.setattr(benchmarks, "measure_round_trip_ms", lambda: 5.0)
    dt, meta = _time_chain(_fake_chain(0.020, 0.010), n_iters=4, reps=2)
    assert dt is not None
    # the 20 ms fixed overhead must cancel, leaving ~10 ms/iter
    assert 0.007 < dt < 0.014, (dt, meta)
    assert "timing_error" not in meta


def test_time_chain_refuses_sub_noise_signal(monkeypatch):
    """The r03 pathology: per-iteration work ~0, all time is overhead.
    The old code clamped (best - rtt) to 1e-9 and reported 48e9 utt/s;
    the new code must return an explicit error and no number."""
    monkeypatch.setattr(benchmarks, "measure_round_trip_ms", lambda: 30.0)
    dt, meta = _time_chain(
        _fake_chain(0.030, 0.0), n_iters=2, reps=1, max_doublings=2
    )
    assert dt is None
    assert "timing_error" in meta
    assert "refusing" in meta["timing_error"]


def test_rate_result_zeroes_rates_on_error():
    out = _rate_result(
        None, {"timing_error": "boom"},
        {"utt_per_s": lambda s: 8 / s}, {"batch": 8},
    )
    assert out["utt_per_s"] == 0.0
    assert out["step_ms"] == 0.0
    assert out["error"] == "boom"


def test_rate_result_passes_through_valid_timing():
    out = _rate_result(
        0.010, {"n_iters": 4}, {"utt_per_s": lambda s: 8 / s}, {"batch": 8}
    )
    assert out["utt_per_s"] == pytest.approx(800.0)
    assert out["step_ms"] == pytest.approx(10.0)
    assert "error" not in out


def test_plausibility_rejects_sub_floor_step():
    # 1 TFLOP of work in 1 us would be 1000 TFLOP/s >> any datasheet peak
    err = _plausibility_check(
        step_ms=0.001, flops_per_step=1e12, peak_tflops=197.0
    )
    assert err is not None and "floor" in err
    # r03's literal failure mode: step_ms == 0.0
    assert _plausibility_check(0.0, 1e12, 197.0) is not None
    # a sane number passes: 1e12 FLOPs in 10 ms = 100 TFLOP/s < 197 peak
    assert _plausibility_check(10.0, 1e12, 197.0) is None
    # unknown hardware: only the positivity check applies
    assert _plausibility_check(10.0, 1e12, None) is None
    assert _plausibility_check(-1.0, 1e12, None) is not None


def test_analytic_dp_guards_invalid_step():
    cfg = get_config("tiny_teacher")
    out = analytic_dp_efficiency(cfg, step_ms=0.0)
    assert "error" in out and "rows" not in out
    out = analytic_dp_efficiency(cfg, step_ms=18.0, counts=(8,))
    assert out["rows"][0]["predicted_efficiency"] > 0.9


@pytest.mark.distributed
def test_dp_equivalence_check_passes_on_sim_mesh():
    """The audit that replaced the CPU-sim throughput table must itself
    pass on the 8-virtual-device mesh."""
    cfg = override(get_config("tiny_teacher"), "train.crop_samples", 1024)
    cfg = override(cfg, "train.global_batch_size", 8)
    out = dp_equivalence_check(cfg)
    assert out["pass"], out
    assert out["devices"] == 8
