"""Parity tests for the fused exact-costmap Pallas kernel (interpret mode).

The exact kernel must bit-match the scan path's semantics: same texture
point-sampling (``costs.cu:128-154``), same cost terms and crash latch,
same noise protocol.  Both the fast windowed path and the full-map
fallback sweep are exercised (the fallback by shrinking the window so the
rollout swarm cannot fit).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.ops import rollout_kernel as rk
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

NN_NPZ = ("/root/reference/autorally_control/src/path_integral/params/"
          "models/autorally_nnet_09_12_2018.npz")

K, T = 256, 24


def _setup(ppm=2.0):
    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T, hz=50)
    data, xb, yb = oval_track(ppm=ppm)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    cost = MPPICost()
    solver = MPPISolver(model, cost, cfg)
    cp = CostParams()
    state = jnp.asarray([25.0, 0.0, np.pi / 2, 0.0, 3.0, 0.0, 0.0],
                        dtype=jnp.float32)
    U = jnp.tile(jnp.asarray([0.0, 0.3], jnp.float32), (T, 1))
    eps = jax.random.normal(jax.random.PRNGKey(7), (T, K, 2),
                            dtype=jnp.float32)
    return cfg, cm, model, params, cost, solver, cp, state, U, eps


def _compare(cfg, cm, model, params, cost, solver, cp, state, U, eps):
    ref_total, ref_useq, ref_crash = solver.rollout_costs(
        params, cp, cm, state, U, eps)
    total, useq, crash = rk.fused_exact_rollout_cost_pallas(
        model, params, cfg, cp, cm, state, U, eps,
        l1_cost=cost.l1_cost, interpret=True)
    np.testing.assert_allclose(np.asarray(total), np.asarray(ref_total),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(crash), np.asarray(ref_crash))
    # u_seq: fused is (C, T, K) component-major, scan is (T, K, C)
    np.testing.assert_allclose(
        np.asarray(useq).transpose(1, 2, 0), np.asarray(ref_useq),
        rtol=1e-6, atol=1e-6)


def test_exact_fused_matches_scan_fast_path():
    """Normal swarm spread: the dynamic window covers every lookup."""
    _compare(*_setup())


def test_exact_fused_matches_scan_fallback_sweep(monkeypatch):
    """Window shrunk below the swarm spread: the full-map banded sweep
    must produce identical (still exact) results."""
    monkeypatch.setattr(rk, "EXACT_WIN_ROWS", 8)
    monkeypatch.setattr(rk, "EXACT_WIN_BLOCKS", 1)
    _compare(*_setup())


def test_exact_fused_solver_dispatch_off_on():
    """cfg.exact_fused=False keeps the dynamics-chain + epilogue path;
    the supported() predicate respects the VMEM budget."""
    cfg, cm, *_ = _setup()
    assert rk.exact_pallas_supported(cm, 256) == rk.pallas_supported(256)
    monkey_budget = rk.EXACT_VMEM_BUDGET
    try:
        rk.EXACT_VMEM_BUDGET = 16
        assert not rk.exact_pallas_supported(cm, 256)
    finally:
        rk.EXACT_VMEM_BUDGET = monkey_budget


def test_exact_fused_nan_state_finite():
    """NaN coordinates route to texel 0 (lookup semantics) and the cost
    clamp keeps totals finite (costs.cu:405-407)."""
    cfg, cm, model, params, cost, solver, cp, state, U, eps = _setup()
    bad = state.at[0].set(jnp.nan)
    total, _, _ = rk.fused_exact_rollout_cost_pallas(
        model, params, cfg, cp, cm, bad, U, eps,
        l1_cost=cost.l1_cost, interpret=True)
    assert bool(jnp.all(jnp.isfinite(total)))
