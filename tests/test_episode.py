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
