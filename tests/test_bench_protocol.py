"""The bench's measurement-protocol helpers (bench.py) — the chain-sweep
fit must stay physical under batch jitter (round-3 advisor finding: a
two-point fit with t100 > 2*t200 yields a negative device time that reads
as nonsense telemetry in BENCH artifacts)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from bench import _fit_chain_sweep  # noqa: E402


def _rows(ms_by_n):
    return {n: {"solves_per_sec": 1000.0 / ms} for n, ms in ms_by_n.items()}


def test_fit_recovers_exact_model():
    # t(n) = 0.5 + 25/n exactly
    fit = _fit_chain_sweep(_rows({25: 1.5, 100: 0.75, 200: 0.625}))
    assert not fit["fit_degenerate"]
    assert abs(fit["fit_device_ms_per_solve"] - 0.5) < 1e-6
    assert abs(fit["fit_tunnel_sync_ms"] - 25.0) < 1e-6


def test_fit_clamps_negative_device_time_and_flags():
    # jittered batches where t100 > 2*t200: the unconstrained fit goes
    # negative — must clamp at 0 and flag, never emit negative telemetry
    fit = _fit_chain_sweep(_rows({100: 1.4, 200: 0.6}))
    assert fit["fit_degenerate"]
    assert fit["fit_device_ms_per_solve"] >= 0.0
    assert fit["fit_tunnel_sync_ms"] >= 0.0


def test_fit_clamps_negative_sync_and_flags():
    # a chain sweep where longer chains measure SLOWER per solve (host
    # noise during the long batch): sync fits negative — clamp + flag
    fit = _fit_chain_sweep(_rows({25: 0.6, 100: 0.62, 200: 0.7}))
    assert fit["fit_degenerate"]
    assert fit["fit_tunnel_sync_ms"] == 0.0
    assert fit["fit_device_ms_per_solve"] >= 0.0


def test_fit_least_squares_uses_all_points():
    # three points, mild noise: LSQ lands near truth instead of riding
    # any single pair
    fit = _fit_chain_sweep(_rows({25: 1.52, 100: 0.74, 200: 0.63}))
    assert not fit["fit_degenerate"]
    assert 0.4 < fit["fit_device_ms_per_solve"] < 0.6
    assert 20.0 < fit["fit_tunnel_sync_ms"] < 30.0
