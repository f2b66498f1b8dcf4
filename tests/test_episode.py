"""Fused episode-runner tests (device-speed closed-loop simulation)."""

import math

import numpy as np
import pytest

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.runtime.episode import EpisodeRunner
from autorally_tpu.runtime.telemetry import LapStats
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

NN_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/autorally_nnet_09_12_2018.npz"


def build(n_ticks=150, K=128, T=24):
    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T)
    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=6.0, ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    runner = EpisodeRunner(solver, n_ticks=n_ticks)
    return runner, params, cm


def test_episode_drives_the_car():
    runner, params, cm = build()
    start = np.array([30.0, 0.0, math.pi / 2, 0, 0, 0, 0], dtype=np.float32)
    res = runner.run(params, CostParams(desired_speed=5.0), cm, start)
    states = np.asarray(res.states)
    assert states.shape == (150, 7)
    assert np.isfinite(states).all()
    # accelerates and progresses along the oval
    assert states[-1, 4] > 2.0
    dist = np.hypot(states[-1, 0] - 30.0, states[-1, 1])
    assert dist > 3.0
    # both controllers get used over the episode (tube arbitration is live)
    used = np.asarray(res.used_actual)
    assert used.any()
    assert np.isfinite(np.asarray(res.ess)).all()


def test_episode_asymmetric_tube_drives():
    """Asymmetric tube budgets inside the fused episode scan: the
    predicted half runs K/4 and the closed loop must still drive the
    oval with live arbitration (round 5; see AsyncTubeController)."""
    cfg = MPPIConfig(num_rollouts=128, num_timesteps=24)
    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=6.0, ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    solver_pred = MPPISolver(model, MPPICost(),
                             cfg.replace(num_rollouts=32))
    runner = EpisodeRunner(solver, n_ticks=150,
                           solver_predicted=solver_pred)
    start = np.array([30.0, 0.0, math.pi / 2, 0, 0, 0, 0],
                     dtype=np.float32)
    res = runner.run(params, CostParams(desired_speed=5.0), cm, start)
    states = np.asarray(res.states)
    assert np.isfinite(states).all()
    assert states[-1, 4] > 2.0
    assert np.hypot(states[-1, 0] - 30.0, states[-1, 1]) > 3.0
    used = np.asarray(res.used_actual)
    # arbitration live across the asymmetric pair
    assert used.any() and not used.all()

    # an ESS target the smaller predicted solver can never reach would
    # ratchet the shared gamma to the clamp — rejected at construction
    with pytest.raises(ValueError, match="unreachable"):
        EpisodeRunner(solver, n_ticks=10, solver_predicted=solver_pred,
                      ess_target_frac=0.5)


def test_episode_model_mismatch():
    """Controller plans with the reference model but the plant runs a
    perturbed true model — the loop must still function."""
    import jax

    runner, params, cm = build(n_ticks=80)
    start = np.array([30.0, 0.0, math.pi / 2, 0, 0, 0, 0], dtype=np.float32)
    perturbed = {
        **params,
        "weights": [W * 1.05 for W in params["weights"]],
    }
    res = runner.run(params, CostParams(desired_speed=4.0), cm, start,
                     params_true=perturbed)
    assert np.isfinite(np.asarray(res.states)).all()
    assert np.asarray(res.states)[-1, 4] > 1.0


def test_episode_feeds_lap_stats():
    runner, params, cm = build(n_ticks=120)
    start = np.array([30.0, 0.0, math.pi / 2, 0, 0, 0, 0], dtype=np.float32)
    res = runner.run(params, CostParams(desired_speed=5.0), cm, start)
    laps = LapStats(line=(0.0, 0.0, 25.0, 35.0))
    states = np.asarray(res.states)
    dt = 0.02
    for i, s in enumerate(states):
        laps.process_pose(i * dt, s[0], s[1], s[4], s[5])
    assert laps.max_speed > 2.0


def test_episode_feedback_gains_change_executed_controls():
    """Tube feedback at device speed (autorally_plant.cpp:215-250): with a
    model-mismatched plant, K(x - x_des) must alter the executed controls
    relative to pure feedforward, and keep the loop finite."""
    cfg = MPPIConfig(num_rollouts=128, num_timesteps=24)
    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=6.0, ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    perturbed = {**params,
                 "weights": [W * 1.08 for W in params["weights"]]}
    start = np.array([30.0, 0.0, math.pi / 2, 0, 1.0, 0, 0],
                     dtype=np.float32)
    cp = CostParams(desired_speed=4.0)

    r_ff = EpisodeRunner(solver, n_ticks=50)
    r_fb = EpisodeRunner(solver, n_ticks=50, use_feedback_gains=True)
    res_ff = r_ff.run(params, cp, cm, start, params_true=perturbed)
    res_fb = r_fb.run(params, cp, cm, start, params_true=perturbed)

    u_ff = np.asarray(res_ff.controls)
    u_fb = np.asarray(res_fb.controls)
    assert np.isfinite(u_fb).all()
    assert np.isfinite(np.asarray(res_fb.states)).all()
    # feedback genuinely modifies the executed commands
    assert np.abs(u_ff - u_fb).max() > 1e-3
    # and respects the publication clamps (throttle_max=0.65 default)
    assert u_fb[:, 0].max() <= 0.99 and u_fb[:, 0].min() >= -0.99
    assert u_fb[:, 1].max() <= 0.65 + 1e-6


def test_episode_pose_rate_interpolation():
    """pose_substeps > 1: the plant integrates at a finer dt through the
    alpha-interpolated solution (the 50 Hz-solution / faster-pose split of
    the reference plant)."""
    cfg = MPPIConfig(num_rollouts=128, num_timesteps=24)
    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=6.0, ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    fine_model = NeuralNetDynamics(cfg.dt / 4,
                                   control_ranges=cfg.control_ranges)
    start = np.array([30.0, 0.0, math.pi / 2, 0, 1.0, 0, 0],
                     dtype=np.float32)

    with pytest.raises(ValueError):
        EpisodeRunner(solver, true_model=fine_model, n_ticks=10,
                      pose_substeps=2)

    r = EpisodeRunner(solver, true_model=fine_model, n_ticks=60,
                      pose_substeps=4, use_feedback_gains=True)
    res = r.run(params, CostParams(desired_speed=4.0), cm, start)
    states = np.asarray(res.states)
    assert np.isfinite(states).all()
    assert states[-1, 4] > 1.5          # still drives


def test_episode_drives_winding_track():
    """The winding spline circuit (CCRF-track role): the controller must
    carry speed through alternating curves without crashing."""
    from autorally_tpu.tools.track_generator import spline_track

    cfg = MPPIConfig(num_rollouts=256, num_timesteps=40)
    data, xb, yb = spline_track(track_width=6.0, ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    runner = EpisodeRunner(solver, n_ticks=500)
    start = np.array([0.0, 0.0, math.atan2(-2.0, 12.0), 0, 0, 0, 0],
                     dtype=np.float32)
    res = runner.run(params, CostParams(desired_speed=4.5), cm, start)
    states = np.asarray(res.states)
    assert np.isfinite(states).all()
    # reaches cruising speed and keeps it through the curves
    assert states[250:, 4].mean() > 3.0
    # covers real distance around the circuit
    path_len = np.hypot(np.diff(states[:, 0]), np.diff(states[:, 1])).sum()
    assert path_len > 25.0
    # stays on the 6 m track: crash fraction stays low
    assert float(np.asarray(res.crash_frac).mean()) < 0.1


def test_episode_moving_obstacle():
    """A circle crossing the car's path, positions fed per tick through
    obstacle_traj (device-side moving-obstacle avoidance): the episode
    with the obstacle cost must keep more clearance from the MOVING
    circle than the plain-cost episode."""
    from autorally_tpu.costs.obstacles import ObstacleCost, make_obstacles

    n_ticks, cap = 250, 4
    cfg = MPPIConfig(num_rollouts=256, num_timesteps=40)
    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=8.0, ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    start = np.array([30.0, 0.0, math.pi / 2, 0, 4.0, 0, 0],
                     dtype=np.float32)

    # a circle drifting across the lane around y~6, where the car arrives
    # after ~1.5 s at ~4.5 m/s
    traj = np.full((n_ticks, cap, 3), -1.0, dtype=np.float32)
    t = np.arange(n_ticks) * cfg.dt
    traj[:, 0, 0] = 31.5 - 1.2 * t          # x drifts left through the lane
    traj[:, 0, 1] = 6.0
    traj[:, 0, 2] = 0.5

    def min_clearance(cost):
        solver = MPPISolver(model, cost, cfg)
        runner = EpisodeRunner(solver, n_ticks=n_ticks)
        res = runner.run(params, CostParams(desired_speed=4.5), cm, start,
                         obstacle_traj=(traj if isinstance(cost,
                                                           ObstacleCost)
                                        else None))
        states = np.asarray(res.states)
        d = np.hypot(states[:, 0] - traj[:, 0, 0],
                     states[:, 1] - traj[:, 0, 1])
        return float(d.min()), states

    clear_obs, st_obs = min_clearance(
        ObstacleCost(make_obstacles([], capacity=cap),
                     obstacle_coeff=300.0, inflation=1.5))
    clear_plain, _ = min_clearance(MPPICost())
    assert np.isfinite(st_obs).all()
    assert clear_plain < 1.0, f"plain plan should pass near it: {clear_plain}"
    assert clear_obs > clear_plain + 0.3, (clear_obs, clear_plain)
