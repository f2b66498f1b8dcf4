"""Dynamics-model parity tests vs the literal NumPy reference port."""

import numpy as np
import pytest

import jax.numpy as jnp

from autorally_tpu.models import NeuralNetDynamics, BasisFunctionDynamics
from tests.reference_mppi import RefNNModel, RefBFModel

NN_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/autorally_nnet_09_12_2018.npz"
BF_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/basis_function_09_12_2018.npz"
CTRL_RNGS = [[-0.99, 0.99], [-0.99, 0.65]]
DT = 1.0 / 50


def random_states(rng, n):
    s = rng.randn(n, 7).astype(np.float32)
    s[:, 4] = np.abs(s[:, 4]) * 5  # forward speeds
    return s


def test_nn_matches_reference(rng):
    model = NeuralNetDynamics(DT)
    params = model.load_params(NN_NPZ)
    ref = RefNNModel.from_npz(NN_NPZ, CTRL_RNGS, DT)

    states = random_states(rng, 64)
    controls = rng.uniform(-0.9, 0.6, (64, 2)).astype(np.float32)

    ours = np.asarray(model.state_deriv(params, jnp.asarray(states),
                                        jnp.asarray(controls)))
    theirs = np.stack([ref.state_deriv(s, u) for s, u in zip(states, controls)])
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-5)


def test_nn_negate_yaw_der():
    model_neg = NeuralNetDynamics(DT, negate_yaw_der=True)
    model_pos = NeuralNetDynamics(DT, negate_yaw_der=False)
    params = model_neg.load_params(NN_NPZ)
    s = jnp.array([0.0, 0.0, 0.5, 0.0, 3.0, 0.1, 0.7])
    u = jnp.array([0.1, 0.2])
    d_neg = model_neg.state_deriv(params, s, u)
    d_pos = model_pos.state_deriv(params, s, u)
    assert np.isclose(d_neg[2], -0.7)
    assert np.isclose(d_pos[2], 0.7)
    np.testing.assert_allclose(d_neg[3:], d_pos[3:])


def test_bf_matches_reference(rng):
    model = BasisFunctionDynamics(DT)
    params = model.load_params(BF_NPZ)
    ref = RefBFModel.from_npz(BF_NPZ, CTRL_RNGS, DT)

    states = random_states(rng, 64)
    # include slow states to cover the ux <= 0.1 branch
    states[:8, 4] = 0.05
    controls = rng.uniform(-0.9, 0.6, (64, 2)).astype(np.float32)

    ours = np.asarray(model.state_deriv(params, jnp.asarray(states),
                                        jnp.asarray(controls)))
    theirs = np.stack([ref.state_deriv(s, u) for s, u in zip(states, controls)])
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-5)


def test_enforce_constraints():
    model = NeuralNetDynamics(DT)
    params = model.load_params(NN_NPZ)
    u = jnp.array([[-2.0, 2.0], [0.5, 0.5], [2.0, -2.0]])
    out = np.asarray(model.enforce_constraints(params, u))
    np.testing.assert_allclose(out, [[-0.99, 0.65], [0.5, 0.5], [0.99, -0.99]])


def test_npz_roundtrip(tmp_path):
    model = NeuralNetDynamics(DT)
    params = model.load_params(NN_NPZ)
    path = str(tmp_path / "roundtrip.npz")
    model.save_params(params, path)
    params2 = model.load_params(path)
    for W1, W2 in zip(params["weights"], params2["weights"]):
        np.testing.assert_allclose(np.asarray(W1), np.asarray(W2))


def test_update_model_hot_swap(rng):
    model = NeuralNetDynamics(DT)
    params = model.load_params(NN_NPZ)
    # Build a flat buffer in the live-update wire format
    # (weights row-major (out, in) first, then biases).
    flat = np.concatenate(
        [np.asarray(W).T.reshape(-1) for W in params["weights"]]
        + [np.asarray(b) for b in params["biases"]])
    flat2 = flat * 2.0
    params2 = model.update_model(params, model.layers, flat2)
    np.testing.assert_allclose(np.asarray(params2["weights"][0]),
                               2 * np.asarray(params["weights"][0]))
    # wrong structure -> unchanged
    params3 = model.update_model(params, (6, 16, 4), flat2)
    assert params3 is params


def test_from_npz_infers_every_reference_asset():
    """Every shipped reference network asset loads with its architecture
    inferred from the npz — including the 6-64-64-64-64-4 wider/deeper
    net (``params/models/README.md`` inventory)."""
    base = ("/root/reference/autorally_control/src/path_integral/params/"
            "models/")
    expect = {
        "autorally_nnet_09_12_2018.npz": (6, 32, 32, 4),
        "gazebo_nnet_09_12_2018.npz": (6, 32, 32, 4),
        "shallow_network_08_20_2020.npz": (6, 32, 32, 4),
        "wider_deeper_network_08_20_2020.npz": (6, 64, 64, 64, 64, 4),
    }
    for fname, layers in expect.items():
        model, params = NeuralNetDynamics.from_npz(base + fname, DT)
        assert model.layers == layers, fname
        s = jnp.asarray([[0.0, 0.0, 0.5, 0.0, 3.0, 0.1, 0.05]],
                        dtype=jnp.float32)
        u = jnp.asarray([[0.1, 0.3]], dtype=jnp.float32)
        d = model.state_deriv(params, s, u)
        assert d.shape == (1, 7) and bool(jnp.all(jnp.isfinite(d))), fname


def test_wider_deeper_through_solver_and_kernel():
    """The 5-layer net runs a full solve on the scan path AND through the
    Pallas chain kernel (interpret) — the kernels are layer-count generic."""
    import jax

    from autorally_tpu.config import CostParams, MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.costs.costmap import make_costmap
    from autorally_tpu.ops import rollout_kernel as rk
    from autorally_tpu.solver.mppi import MPPISolver
    from autorally_tpu.tools.track_generator import oval_track

    base = ("/root/reference/autorally_control/src/path_integral/params/"
            "models/")
    model, params = NeuralNetDynamics.from_npz(
        base + "wider_deeper_network_08_20_2020.npz", DT)
    K, T = 128, 16
    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    solver = MPPISolver(model, MPPICost(), cfg)
    state = jnp.asarray([25.0, 0.0, np.pi / 2, 0.0, 3.0, 0.0, 0.0],
                        dtype=jnp.float32)
    cs, stats = solver.solve(params, CostParams(), cm, state,
                             solver.init_state())
    assert bool(jnp.all(jnp.isfinite(cs.U)))

    eps = jax.random.normal(jax.random.PRNGKey(2), (T, K, 2),
                            dtype=jnp.float32)
    states, useq = rk.dynamics_chain_pallas(
        model, params, cfg, state, cs.U, eps, interpret=True)
    assert states.shape == (8, T, K)
    assert bool(jnp.all(jnp.isfinite(states[:7])))
