"""State-estimator quantification (VERDICT round-1 item 7): accuracy,
bias convergence, and covariance consistency on synthetic GPS+IMU with
known ground truth — then the closed loop driven from the ESTIMATE.

The reference's GTSAM estimator ships with zero tests
(``StateEstimator.cpp:217-642``); these establish measured bounds."""

import math

import numpy as np
import pytest

from autorally_tpu.runtime.state_estimator import (ErrorStateEKF,
                                                   EstimatorConfig)
from autorally_tpu.sim.sensors import SensorSimConfig, SensorSimulator

NN_NPZ = ("/root/reference/autorally_control/src/path_integral/params/"
          "models/autorally_nnet_09_12_2018.npz")


def _run_circle(seconds=40.0, imu_hz=200, gps_hz=10, vel_hz=50,
                speed=5.0, radius=15.0, sensor_cfg=None, est_cfg=None):
    """Drive a perfect circle; return (ekf, per-sample logs).

    Closed-form truth: yaw(t) = w t, position on the circle, body
    velocity (speed, 0), centripetal specific force (0, speed*w)."""
    cfg = sensor_cfg or SensorSimConfig()
    rng = np.random.RandomState(cfg.seed + 1)
    ekf = ErrorStateEKF(est_cfg or EstimatorConfig())
    w = speed / radius
    dt = 1.0 / imu_hz
    gps_every = imu_hz // gps_hz
    vel_every = imu_hz // vel_hz

    ekf.initialize(0.0, [radius, 0.0, 0.0], yaw=math.pi / 2)
    n = int(seconds * imu_hz)
    logs = {"t": [], "pos_err": [], "yaw_err": [], "vel_err": [],
            "nees_pos": []}
    for i in range(1, n + 1):
        t = i * dt
        yaw = math.pi / 2 + w * t
        px = radius * math.cos(w * t)
        py = radius * math.sin(w * t)
        # body-frame: forward speed, centripetal accel a_y = v * w
        accel = (np.array([0.0, speed * w, 9.80665])
                 + np.asarray(cfg.accel_bias)
                 + rng.randn(3) * cfg.accel_noise)
        gyro = (np.array([0.0, 0.0, w]) + np.asarray(cfg.gyro_bias)
                + rng.randn(3) * cfg.gyro_noise)
        ekf.imu_update(t, accel, gyro)
        if i % vel_every == 0:
            ekf.velocity_update(np.array([speed, 0.0, 0.0])
                                + rng.randn(3) * cfg.vel_noise)
        if i % gps_every == 0:
            ekf.gps_update(np.array([px, py, 0.0])
                           + rng.randn(3) * cfg.gps_noise)

        e_p = ekf.p[:2] - np.array([px, py])
        logs["t"].append(t)
        logs["pos_err"].append(np.linalg.norm(e_p))
        yv = _yaw_vec(ekf)
        yaw_est = math.atan2(yv[1], yv[0])
        logs["yaw_err"].append(abs(np.angle(np.exp(1j * (yaw_est - yaw)))))
        vw_true = SensorSimulator.world_velocity(yaw, speed, 0.0)
        logs["vel_err"].append(np.linalg.norm(ekf.v[:2] - vw_true[:2]))
        e3 = np.concatenate([e_p, [ekf.p[2] - 0.0]])
        P_pos = ekf.P[:3, :3]
        logs["nees_pos"].append(float(e3 @ np.linalg.solve(P_pos, e3)))
    return ekf, {k: np.asarray(v) for k, v in logs.items()}


def _yaw_vec(ekf):
    from autorally_tpu.runtime.state_estimator import _quat_to_rot

    R = _quat_to_rot(ekf.q)
    return np.array([R[0, 0], R[1, 0]])


def test_ekf_accuracy_on_synthetic_circle():
    ekf, logs = _run_circle(seconds=40.0)
    n = len(logs["t"])
    conv = slice(n // 4, None)            # after convergence transient
    pos_rmse = float(np.sqrt((logs["pos_err"][conv] ** 2).mean()))
    yaw_rmse = float(np.sqrt((logs["yaw_err"][conv] ** 2).mean()))
    vel_rmse = float(np.sqrt((logs["vel_err"][conv] ** 2).mean()))
    # RTK-class GPS (0.15 m) + MEMS IMU: the filter must do better than
    # raw GPS on position and hold tight yaw/velocity
    assert pos_rmse < 0.15, pos_rmse
    assert yaw_rmse < 0.05, yaw_rmse
    assert vel_rmse < 0.20, vel_rmse


def test_ekf_gyro_bias_convergence():
    cfg = SensorSimConfig()
    ekf, _ = _run_circle(seconds=40.0, sensor_cfg=cfg)
    # the z gyro bias (0.004 rad/s) is strongly observable from
    # GPS+velocity vs integrated heading; it must converge
    err = abs(ekf.b_g[2] - cfg.gyro_bias[2])
    assert err < 0.4 * abs(cfg.gyro_bias[2]), (ekf.b_g, cfg.gyro_bias)


def test_ekf_covariance_consistency():
    """Average position NEES must sit near its chi-square expectation
    (dim=3): a filter reporting uncertainty it doesn't have (or hiding
    error it does have) fails this band."""
    _, logs = _run_circle(seconds=40.0)
    n = len(logs["nees_pos"])
    nees = logs["nees_pos"][n // 4:]
    avg = float(nees.mean())
    assert 0.3 < avg < 9.0, avg


def test_closed_loop_on_estimated_state():
    """The full stack driven from /pose_estimate instead of ground truth:
    the vehicle must still drive the oval, and the estimate must stay
    within realistic bounds of the truth."""
    from autorally_tpu.config import CostParams, MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.costs.costmap import make_costmap
    from autorally_tpu.models import NeuralNetDynamics
    from autorally_tpu.runtime import (ControlLoopConfig, Controller,
                                       run_control_loop)
    from autorally_tpu.sim import SimVehicleEstimatedPlant
    from autorally_tpu.solver.mppi import MPPISolver
    from autorally_tpu.tools.track_generator import oval_track

    cfg = MPPIConfig(num_rollouts=96, num_timesteps=24)
    # half_length=30 puts the start pose (30, 0) ON the track centerline
    # (the default oval's straights sit at x=±25, which left this test
    # driving alongside the circuit from an off-track spawn)
    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=6.0, ppm=2.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    cp = CostParams(desired_speed=4.0)
    actual = Controller(solver, params, cp, cm)
    predicted = Controller(solver, params, cp, cm, seed=3)

    start = np.array([30.0, 0.0, math.pi / 2, 0, 0, 0, 0],
                     dtype=np.float32)
    plant = SimVehicleEstimatedPlant(start, cfg.dt, cfg.num_timesteps,
                                     use_feedback_gains=False)
    plant.receive_state_vector(0.0, start)

    # 500 ticks: the on-track standstill start needs ~2 s of
    # acceleration before the >20 m distance bound is comfortably met
    lcfg = ControlLoopConfig(hz=cfg.hz, num_timesteps=cfg.num_timesteps,
                             use_feedback_gains=False, max_iter=500)
    run_control_loop(predicted, actual, plant, lcfg)

    truth = np.asarray(plant.truth_log)
    assert truth[-1, 4] > 2.0                       # still driving
    errs = plant.estimation_errors()
    # the controller consumed the estimate the whole run; the estimate
    # stayed within realistic sensor-limited bounds of the truth
    assert errs["pos_rmse"] < 0.5, errs
    assert errs["yaw_rmse"] < 0.15, errs
    assert errs["vel_rmse"] < 0.5, errs
    # the vehicle moved a nontrivial distance around the track
    dist = np.sum(np.linalg.norm(np.diff(truth[:, :2], axis=0), axis=1))
    assert dist > 20.0, dist
