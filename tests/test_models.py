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
