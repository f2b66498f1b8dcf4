"""Dynamic obstacle cost tests (the reference's unimplemented TODO,
costs.cu:296-299, made real)."""

import numpy as np
import pytest

import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.costs.obstacles import ObstacleCost, make_obstacles
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

NN_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/autorally_nnet_09_12_2018.npz"


def test_make_obstacles_padding():
    obs = make_obstacles([[1.0, 2.0, 0.5]], capacity=4)
    assert obs.shape == (4, 3)
    assert float(obs[0, 2]) == 0.5
    assert (np.asarray(obs[1:, 2]) == -1.0).all()
    with pytest.raises(ValueError):
        make_obstacles(np.zeros((5, 3)), capacity=4)


def test_obstacle_cost_geometry():
    cost = ObstacleCost(make_obstacles([[0.0, 0.0, 1.0]]),
                        obstacle_coeff=100.0, inflation=1.0)
    p = CostParams()
    xs = jnp.asarray([0.0, 1.5, 2.5, 0.5])
    ys = jnp.zeros(4)
    crash = jnp.zeros(4, dtype=jnp.int32)
    c, crash = cost.obstacle_cost_c(p, xs, ys, crash)
    c = np.asarray(c)
    assert c[0] == 100.0               # at center: full penalty
    assert 0 < c[1] < 100.0            # in the inflation band
    assert c[2] == 0.0                 # outside the band
    np.testing.assert_array_equal(np.asarray(crash), [1, 0, 0, 1])


def test_solver_avoids_obstacle():
    """Place an obstacle dead ahead: the plan must steer around it."""
    cfg = MPPIConfig(num_rollouts=512, num_timesteps=40)
    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=8.0, ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)

    # moving at 5 m/s along +y from the right apex; obstacle 4 m ahead
    start = np.array([30.0, 0.0, np.pi / 2, 0, 5.0, 0, 0], dtype=np.float32)
    obstacle = [[29.7, 4.0, 0.6]]

    def min_clearance(cost):
        solver = MPPISolver(model, cost, cfg)
        cs = solver.init_state()
        for _ in range(4):
            cs, _ = solver.solve(params, CostParams(desired_speed=5.0), cm,
                                 start, cs)
        traj = np.asarray(cs.state_solution)
        return np.min(np.hypot(traj[:, 0] - 29.7, traj[:, 1] - 4.0))

    from autorally_tpu.costs import MPPICost

    clear_plain = min_clearance(MPPICost())
    clear_obst = min_clearance(ObstacleCost(make_obstacles(obstacle),
                                            obstacle_coeff=300.0,
                                            inflation=1.5))
    # without the obstacle term the plan drives straight through it
    assert clear_plain < 0.6
    assert clear_obst > clear_plain + 0.2
    assert clear_obst > 0.6


def test_obstacle_hot_swap_shapes():
    cost = ObstacleCost(make_obstacles([], capacity=8))
    cost2 = cost.with_obstacles([[1, 1, 0.3], [2, 2, 0.4]])
    assert cost2.obstacles.shape == (8, 3)
