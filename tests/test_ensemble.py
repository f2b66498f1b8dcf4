"""Ensemble-dynamics solver integration (the EP-like axis, SURVEY.md §2.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.models import EnsembleDynamics, NeuralNetDynamics
from autorally_tpu.models.ensemble import member_params, stack_params
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

NN_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/autorally_nnet_09_12_2018.npz"
START = np.array([0.0, -15.0, 0.0, 0.0, 2.0, 0.0, 0.0], dtype=np.float32)


def make_ensemble(num_members=4, noise=0.05, seed=0):
    base = NeuralNetDynamics(0.02, control_ranges=((-0.99, 0.99),
                                                   (-0.99, 0.65)))
    p0 = base.load_params(NN_NPZ)
    rng = np.random.RandomState(seed)
    members = []
    for m in range(num_members):
        scale = 0.0 if m == 0 else noise
        members.append({
            "weights": [W + scale * jnp.asarray(
                rng.randn(*W.shape).astype(np.float32))
                for W in p0["weights"]],
            "biases": [b + scale * jnp.asarray(
                rng.randn(*b.shape).astype(np.float32))
                for b in p0["biases"]],
            "control_rngs": p0["control_rngs"],
        })
    model = EnsembleDynamics(base, num_members)
    return model, stack_params(members), p0, base


def test_ensemble_dynamics_blocks():
    model, params, p0, base = make_ensemble()
    K = 64
    states = jnp.tile(jnp.asarray(START), (K, 1))
    controls = jnp.tile(jnp.asarray([0.1, 0.3]), (K, 1))
    out = model.dynamics(params, states, controls)
    # member 0 (rollouts 0..15) is the unperturbed reference model
    ref = base.dynamics(p0, states[:16], controls[:16])
    np.testing.assert_allclose(np.asarray(out[:16]), np.asarray(ref),
                               rtol=1e-5)
    # perturbed members differ
    assert not np.allclose(np.asarray(out[16:32]), np.asarray(ref))


def test_ensemble_solve_runs():
    model, params, *_ = make_ensemble()
    cfg = MPPIConfig(num_rollouts=128, num_timesteps=16)
    data, xb, yb = oval_track(ppm=2.0)
    solver = MPPISolver(model, MPPICost(), cfg)
    assert not solver.use_pallas_rollout   # ensembles use the scan path
    cs = solver.init_state()
    cs2, stats = solver.solve(params, CostParams(), make_costmap(data, xb, yb),
                              START, cs)
    assert np.isfinite(np.asarray(cs2.U)).all()
    assert float(stats.ess) > 1.0


def test_ensemble_spread_lowers_ess():
    """Model disagreement spreads rollout costs -> lower effective sample
    size than a single-model solve with the same noise."""
    cfg = MPPIConfig(num_rollouts=128, num_timesteps=24)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    eps = jax.random.normal(jax.random.PRNGKey(5), (24, 128, 2),
                            dtype=jnp.float32)

    model_e, params_e, p0, base = make_ensemble(noise=0.3)
    solver_e = MPPISolver(model_e, MPPICost(), cfg)
    solver_s = MPPISolver(base, MPPICost(), cfg)
    U0 = solver_e.init_state().U
    _, stats_e = jax.jit(lambda e: solver_e.iterate(
        params_e, CostParams(), cm, jnp.asarray(START), U0, e))(eps)
    _, stats_s = jax.jit(lambda e: solver_s.iterate(
        p0, CostParams(), cm, jnp.asarray(START), U0, e))(eps)
    assert float(stats_e.ess) < float(stats_s.ess)


def test_member_params_roundtrip():
    model, params, p0, _ = make_ensemble()
    m0 = member_params(params, 0)
    np.testing.assert_allclose(np.asarray(m0["weights"][0]),
                               np.asarray(p0["weights"][0]))


# ----------------------------------------------------------------------
# EnsembleMPPISolver: the per-member fused-kernel decomposition
# ----------------------------------------------------------------------

def test_ensemble_fused_solver_matches_ensemble_dynamics():
    """EnsembleMPPISolver's member-block decomposition must reproduce the
    EnsembleDynamics vmap path exactly (same global noise): identical
    rollout costs, identical update — the launcher-level split is a pure
    re-batching."""
    from autorally_tpu.solver import EnsembleMPPISolver

    model_e, stacked, p0, base = make_ensemble(num_members=4, noise=0.2)
    cfg = MPPIConfig(num_rollouts=128, num_timesteps=16)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    eps = jax.random.normal(jax.random.PRNGKey(3), (16, 128, 2),
                            dtype=jnp.float32)

    ref = MPPISolver(model_e, MPPICost(), cfg)          # vmap path
    fused = EnsembleMPPISolver(base, MPPICost(), cfg, num_members=4)
    U0 = ref.init_state().U
    st = jnp.asarray(START)

    t_ref, u_ref, c_ref = ref.rollout_costs(stacked, CostParams(), cm,
                                            st, U0, eps)
    t_f, u_f, c_f = fused.rollout_costs(stacked, CostParams(), cm,
                                        st, U0, eps)
    # on CPU both run the scan path -> same (T, K, C) layout
    np.testing.assert_allclose(np.asarray(t_f), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_ref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(c_f), np.asarray(c_ref))

    U_ref, st_ref = ref.iterate(stacked, CostParams(), cm, st, U0, eps)
    U_f, st_f = fused.iterate(stacked, CostParams(), cm, st, U0, eps)
    np.testing.assert_allclose(np.asarray(U_f), np.asarray(U_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(st_f.ess), float(st_ref.ess),
                               rtol=1e-5)


def test_ensemble_fused_solver_full_solve_and_nominal():
    """Full jitted solve runs; the nominal trajectory uses member 0."""
    from autorally_tpu.solver import EnsembleMPPISolver

    _, stacked, p0, base = make_ensemble(num_members=4, noise=0.2)
    cfg = MPPIConfig(num_rollouts=128, num_timesteps=16)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    solver = EnsembleMPPISolver(base, MPPICost(), cfg, num_members=4)
    cs2, stats = solver.solve(stacked, CostParams(), cm, START,
                              solver.init_state())
    assert np.isfinite(np.asarray(cs2.U)).all()
    assert float(stats.ess) > 1.0
    # nominal re-rollout == member-0 single-model re-rollout
    single = MPPISolver(base, MPPICost(), cfg)
    s_ref, c_ref = single.nominal_trajectory(p0, jnp.asarray(START), cs2.U)
    s_e, c_e = solver.nominal_trajectory(stacked, jnp.asarray(START), cs2.U)
    np.testing.assert_allclose(np.asarray(s_e), np.asarray(s_ref),
                               rtol=1e-6)


def test_ensemble_fused_solver_rejects_indivisible():
    from autorally_tpu.solver import EnsembleMPPISolver

    base = NeuralNetDynamics(0.02)
    with pytest.raises(ValueError, match="not divisible"):
        EnsembleMPPISolver(base, MPPICost(),
                           MPPIConfig(num_rollouts=100, num_timesteps=8),
                           num_members=8)
