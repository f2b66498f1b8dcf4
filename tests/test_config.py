"""Config system tests: roslaunch XML parsing against the REAL reference
launch files (standalone-mode parity with param_getter.cpp:75-151)."""

import numpy as np
import pytest

from autorally_tpu.config import (CostParams, MPPIConfig, config_from_params,
                                  load_launch_params)

NN_LAUNCH = "/root/reference/autorally_control/launch/path_integral_nn.launch"
BF_LAUNCH = "/root/reference/autorally_control/launch/path_integral_bf.launch"


def test_parse_nn_launch():
    params = load_launch_params(NN_LAUNCH,
                                env={"AR_MPPI_PARAMS_PATH": "/assets"})
    assert params["hz"] == 50
    assert params["num_timesteps"] == 100
    assert params["gamma"] == 0.15
    assert params["desired_speed"] == 8.0
    assert params["steering_std"] == 0.275
    assert params["max_throttle"] == 0.65
    assert params["l1_cost"] is False
    assert params["use_feedback_gains"] is True
    assert params["negate_yaw_der"] is True
    # $(env ...) substitution
    assert params["model_path"].startswith("/assets/models/")


def test_parse_bf_launch_untyped_params():
    """The BF launch omits type attributes — values must still coerce."""
    params = load_launch_params(BF_LAUNCH,
                                env={"AR_MPPI_PARAMS_PATH": ""})
    assert params["hz"] == 50
    assert isinstance(params["hz"], int)
    assert params["gamma"] == pytest.approx(0.15)
    assert params["init_throttle"] == pytest.approx(-0.01)
    assert params["desired_speed"] == 6.0
    assert params["debug_mode"] is True


def test_config_from_params_end_to_end():
    params = load_launch_params(NN_LAUNCH, env={"AR_MPPI_PARAMS_PATH": ""})
    cfg, costs = config_from_params(params)
    assert isinstance(cfg, MPPIConfig)
    assert cfg.hz == 50 and cfg.num_timesteps == 100
    assert cfg.gamma == 0.15
    assert cfg.max_throttle == 0.65
    assert cfg.control_ranges[1][1] == 0.65
    assert float(costs.desired_speed) == 8.0
    assert float(costs.track_coeff) == 200.0
    assert float(costs.crash_coeff) == 10000.0
    assert float(costs.boundary_threshold) == 0.65


def test_cost_params_is_pytree():
    import jax

    p = CostParams(desired_speed=5.0)
    leaves = jax.tree_util.tree_leaves(p)
    assert len(leaves) == 11
    p2 = jax.tree_util.tree_map(lambda x: x, p)
    assert float(p2.desired_speed) == 5.0


def test_mppi_config_replace():
    cfg = MPPIConfig().replace(num_rollouts=64)
    assert cfg.num_rollouts == 64
    assert cfg.dt == pytest.approx(0.02)
