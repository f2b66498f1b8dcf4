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
