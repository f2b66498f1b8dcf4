"""ML-pipeline tests: preprocessing, training convergence, evaluation,
and the train->solve integration property (trained pytree drops straight
into the MPPI solver)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.ml import (DynamicsDataset, TrainConfig,
                              instantaneous_errors, multistep_errors,
                              preprocess_trajectory, standardize,
                              train_dynamics)
from autorally_tpu.ml.train import smooth_l1
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

NN_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/autorally_nnet_09_12_2018.npz"
DT = 0.02


def generate_log(n=2000, seed=3):
    """Simulate the reference-trained model to produce a ground-truth log."""
    rng = np.random.RandomState(seed)
    model = NeuralNetDynamics(DT)
    params = model.load_params(NN_NPZ)
    s = jnp.asarray(np.array([0, 0, 0, 0, 2.0, 0, 0], dtype=np.float32))
    states, controls = [], []
    u = np.zeros(2, dtype=np.float32)
    for i in range(n):
        # smooth random controls
        u = 0.95 * u + 0.05 * rng.uniform([-0.6, -0.2], [0.6, 0.6])
        states.append(np.asarray(s))
        controls.append(u.astype(np.float32))
        s, _ = model.update_state(params, s, jnp.asarray(u))
    return np.stack(states), np.stack(controls), model, params


def test_smooth_l1_matches_torch_semantics():
    x = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    out = np.asarray(smooth_l1(x, jnp.zeros(5)))
    np.testing.assert_allclose(out, [1.5, 0.125, 0.0, 0.125, 1.5])


def test_preprocess_trajectory():
    t = np.linspace(0, 10, 500)
    states = np.zeros((500, 7))
    states[:, 4] = np.sin(t)          # u_x = sin(t) -> d/dt = cos(t)
    controls = np.zeros((500, 2))
    inputs, labels = preprocess_trajectory(t, states, controls)
    assert inputs.shape == (500, 6) and labels.shape == (500, 4)
    np.testing.assert_allclose(labels[50:-50, 1], np.cos(t)[50:-50],
                               atol=5e-3)


def test_standardize_roundtrip(rng):
    x = rng.randn(100, 4) * 5 + 3
    xs, mean, std = standardize(x)
    np.testing.assert_allclose(xs.mean(axis=0), 0, atol=1e-12)
    np.testing.assert_allclose(xs * std + mean, x, rtol=1e-12)


def test_training_learns_dynamics():
    states, controls, teacher, teacher_params = generate_log()
    t = np.arange(len(states)) * DT
    inputs, labels = preprocess_trajectory(t, states, controls)
    ds = DynamicsDataset(inputs, labels)
    train, val = ds.split(0.2, seed=1)

    student = NeuralNetDynamics(DT)
    init = student.init_params(jax.random.PRNGKey(0))
    cfg = TrainConfig(epochs=30, lr=5e-3, batch_size=64, log_every=100)
    best, history = train_dynamics(student, init, train, val, cfg,
                                   verbose=False)

    assert history["val"][-1] < history["val"][0] * 0.5, history["val"][:3]
    # multi-step drift of the trained model must be modest over 25 steps
    res = multistep_errors(student, best, states[:500], controls[:500],
                           horizon=25)
    assert res["pos_error_mean"][-1] < 1.0, res["pos_error_mean"][-1]
    # and much better than the untrained init
    res0 = multistep_errors(student, init, states[:500], controls[:500],
                            horizon=25)
    assert (res["pos_error_mean"][-1] < 0.5 * res0["pos_error_mean"][-1])


def test_instantaneous_errors_near_zero_for_teacher():
    states, controls, teacher, params = generate_log(n=500)
    t = np.arange(len(states)) * DT
    inputs, labels = preprocess_trajectory(t, states, controls)
    res = instantaneous_errors(teacher, params, inputs, labels)
    # teacher generated the data; spline-derivative noise only
    assert res["rmse"].max() < 0.2, res["rmse"]


def test_trained_params_drop_into_solver():
    """The integration property: train -> hand the pytree to MPPI."""
    states, controls, _, _ = generate_log(n=600)
    t = np.arange(len(states)) * DT
    inputs, labels = preprocess_trajectory(t, states, controls)
    train, val = DynamicsDataset(inputs, labels).split()

    model = NeuralNetDynamics(DT, control_ranges=((-0.99, 0.99), (-0.99, 0.65)))
    init = model.init_params(jax.random.PRNGKey(1))
    best, _ = train_dynamics(model, init, train, val,
                             TrainConfig(epochs=3, log_every=100),
                             verbose=False)

    cfg = MPPIConfig(num_rollouts=64, num_timesteps=16)
    data, xb, yb = oval_track(ppm=2.0)
    solver = MPPISolver(model, MPPICost(), cfg)
    cs = solver.init_state()
    cs2, stats = solver.solve(best, CostParams(), make_costmap(data, xb, yb),
                              np.zeros(7, np.float32), cs)
    assert np.isfinite(np.asarray(cs2.U)).all()


def test_npz_export_import_roundtrip(tmp_path):
    """Trained model -> reference .npz -> reload == same predictions."""
    model = NeuralNetDynamics(DT)
    params = model.init_params(jax.random.PRNGKey(2))
    path = str(tmp_path / "trained.npz")
    model.save_params(params, path)
    params2 = model.load_params(path)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 7).astype(np.float32))
    u = jnp.zeros((8, 2))
    np.testing.assert_allclose(np.asarray(model.dynamics(params, x, u)),
                               np.asarray(model.dynamics(params2, x, u)),
                               rtol=1e-6)


def test_compare_nn_to_ode():
    """NN vs analytic-ODE cross-check (model_vehicle_dynamics port)."""
    from autorally_tpu.ml.ode_compare import compare_nn_to_ode

    model = NeuralNetDynamics(0.01)
    params = model.load_params(NN_NPZ)
    res = compare_nn_to_ode(model, params, steering=0.0, throttle=0.3,
                            time_horizon=1.0, dt=0.01)
    assert res["nn"].shape == res["ode"].shape == (100, 7)
    assert np.isfinite(res["final_divergence"]).all()
    # both predict forward motion under throttle
    assert res["nn"][-1, 4] > 0.3 and res["ode"][-1, 4] > 0.3
    # ramped controls variant runs
    res2 = compare_nn_to_ode(model, params, 0.2, 0.3, 0.5,
                             linear_varying_ctrls=True)
    np.testing.assert_allclose(res2["controls"][-1], [0.2, 0.3], rtol=1e-5)


def test_sensor_noise_stats():
    from autorally_tpu.ml.ode_compare import sensor_noise_stats

    rng = np.random.RandomState(0)
    log = np.stack([rng.randn(500) * 0.01 + 3.0,
                    rng.randn(500) * 0.05], axis=1)
    stats = sensor_noise_stats(log, ("x", "y"))
    assert stats["x"]["std"] == pytest.approx(0.01, rel=0.2)
    assert stats["y"]["std"] == pytest.approx(0.05, rel=0.2)


def test_legacy_txt_costmap_conversion(tmp_path):
    from autorally_tpu.costs.costmap import load_costmap
    from autorally_tpu.tools.track_generator import convert_legacy_txt

    H, W, ppm = 8, 12, 2.0
    vals = np.arange(H * W, dtype=np.float32) / (H * W)
    txt = " ".join(["0", str(W / ppm), "0", str(H / ppm), str(ppm)]
                   + [str(v) for v in vals])
    p = tmp_path / "legacy.txt"
    p.write_text(txt)
    out = str(tmp_path / "legacy.npz")
    convert_legacy_txt(str(p), out)
    cm = load_costmap(out)
    assert cm.data.shape == (H, W, 4)
    np.testing.assert_allclose(np.asarray(cm.data[..., 0]).reshape(-1), vals)
