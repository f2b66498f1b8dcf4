"""Vectorized CostParams sweep (tools/param_sweep.py).

The sweep's claim is that vmapping the episode over a stacked CostParams
pytree gives the SAME result as running each setting alone — N tuning
episodes in one compiled program.  These tests check the stacking, the
lane-vs-solo equivalence, and that parameter differences actually steer
the closed-loop outcome.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.runtime.episode import EpisodeRunner
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.param_sweep import (build_grid, lane_metrics,
                                             run_sweep, stack_cost_params)
from autorally_tpu.tools.track_generator import oval_track

NN_NPZ = ("/root/reference/autorally_control/src/path_integral/params/"
          "models/autorally_nnet_09_12_2018.npz")


def test_build_grid_cartesian_product():
    grid = build_grid({"a": [1.0, 2.0], "b": [10.0, 20.0, 30.0]})
    assert len(grid) == 6
    assert {"a": 1.0, "b": 30.0} in grid
    assert all(set(pt) == {"a", "b"} for pt in grid)


def test_stack_cost_params_lane_axis():
    grid = [{"desired_speed": 4.0}, {"desired_speed": 6.0}]
    stacked = stack_cost_params(CostParams(), grid)
    assert stacked.desired_speed.shape == (2,)
    np.testing.assert_allclose(np.asarray(stacked.desired_speed), [4.0, 6.0])
    # non-swept fields replicate the base value down the lane axis
    assert stacked.crash_coeff.shape == (2,)
    np.testing.assert_allclose(np.asarray(stacked.crash_coeff),
                               [10000.0, 10000.0])


@pytest.fixture(scope="module")
def rig():
    cfg = MPPIConfig(num_rollouts=64, num_timesteps=16)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    runner = EpisodeRunner(solver, n_ticks=80)
    start = np.array([25.0, 0.0, math.pi / 2, 0, 0, 0, 0], dtype=np.float32)
    return runner, params, cm, start


def test_sweep_lane_matches_solo_episode(rig):
    """Lane i of the vmapped sweep == a solo run with that CostParams."""
    runner, params, cm, start = rig
    grid = [{"desired_speed": 3.0}, {"desired_speed": 5.0}]
    stacked = stack_cost_params(CostParams(), grid)
    res = run_sweep(runner, params, stacked, cm, start)

    solo = runner.run(params, CostParams(desired_speed=jnp.float32(5.0)),
                      cm, start)
    np.testing.assert_allclose(np.asarray(res.states)[1],
                               np.asarray(solo.states),
                               rtol=2e-4, atol=2e-4)


def test_sweep_parameters_steer_the_outcome(rig):
    """Higher desired speed must drive the closed loop faster."""
    runner, params, cm, start = rig
    grid = [{"desired_speed": 2.0}, {"desired_speed": 5.0}]
    stacked = stack_cost_params(CostParams(), grid)
    res = run_sweep(runner, params, stacked, cm, start)
    rows = lane_metrics(res, grid, settle=20)
    assert rows[1]["mean_speed"] > rows[0]["mean_speed"] + 0.5
    assert all(np.isfinite(r["score"]) for r in rows)


def test_gamma_is_sweepable(rig):
    """The traced gamma override makes the softmax temperature itself a
    sweepable hyperparameter: per-lane ESS must fall monotonically as
    gamma rises (peakier weights), all in ONE vmapped program."""
    runner, params, cm, start = rig
    grid = [{"gamma": 0.05}, {"gamma": 0.15}, {"gamma": 0.6}]
    stacked = stack_cost_params(CostParams(), grid)
    res = run_sweep(runner, params, stacked, cm, start)
    ess = np.asarray(res.ess).mean(axis=1)          # (3,) per-lane mean
    assert ess[0] > ess[1] > ess[2], f"ESS not monotone in gamma: {ess}"
    # lanes solved at genuinely different temperatures -> different plans
    states = np.asarray(res.states)
    assert not np.allclose(states[0], states[2])
