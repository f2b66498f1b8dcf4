"""End-to-end estimation -> control: noisy GPS+IMU through the EKF into
the plant pipeline and the MPPI controller (the reference's
StateEstimator -> /pose_estimate -> AutorallyPlant -> MPPI path)."""

import math

import numpy as np
import pytest

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.runtime.plant import BasePlant
from autorally_tpu.runtime.state_estimator import ErrorStateEKF
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track
from tests.test_vehicle_io import synth_trajectory

NN_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/autorally_nnet_09_12_2018.npz"


def test_ekf_feeds_plant_and_controller():
    # noisy sensors of a circular drive
    poses, imu = synth_trajectory(T=6.0, dt=0.005)
    rng = np.random.RandomState(7)
    ekf = ErrorStateEKF()
    t0, p0, yaw0 = poses[0]
    ekf.initialize(t0, p0, yaw0)

    # controller + plant wired at 50 Hz off the 200 Hz EKF stream
    cfg = MPPIConfig(num_rollouts=64, num_timesteps=16)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    plant = BasePlant(cfg.dt, cfg.num_timesteps, use_feedback_gains=False)

    cs = solver.init_state()
    published = 0
    est_errors = []
    for i, ((t, pos, yaw), (a, w)) in enumerate(zip(poses, imu)):
        if i > 0:
            ekf.imu_update(t, a + rng.randn(3) * 0.05,
                           w + rng.randn(3) * 0.005)
        if i % 40 == 0:
            ekf.gps_update(pos + rng.randn(3) * 0.03)
        if i % 4 == 0 and i > 0:          # 50 Hz pose into the plant
            yaw_rate = 0.5                # omega = speed/radius
            sv = ekf.state_vector(yaw_rate)
            out = plant.receive_state_vector(t, sv)
            if out is not None:
                published += 1
            est_errors.append(np.hypot(sv[0] - pos[0], sv[1] - pos[1]))
        if i % 40 == 0:                   # replan at 5 Hz (cheap test)
            state = plant.get_state().to_vector()
            cs, stats = solver.solve(params, CostParams(desired_speed=5.0),
                                     cm, state, cs)
            plant.set_solution(np.asarray(cs.state_solution),
                               np.asarray(cs.control_solution), None, ts=t)

    # the estimator tracked the true trajectory closely at pose rate
    assert np.mean(est_errors[len(est_errors) // 2:]) < 0.3
    # and the plant published interpolated controls from EKF-driven state
    assert published > 100
    assert np.isfinite(np.asarray(cs.U)).all()
