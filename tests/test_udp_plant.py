"""Distributed-plant integration: simulator and controller exchanging pose/
control over the native UDP transport (the reference's ROS pub/sub role),
with the full realtime control loop in between."""

import math
import threading
import time

import numpy as np
import pytest

from autorally_tpu.runtime.native import Pacer, Ring, UdpLink, native_available
from autorally_tpu.runtime.pose import euler_123_to_quat

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib unavailable")

POSE_PORT = 47810
CTRL_PORT = 47811


def test_udp_plant_pipeline_roundtrip():
    from autorally_tpu.runtime.udp_plant import UdpPlant

    plant = UdpPlant(dt=0.02, num_timesteps=10, pose_port=POSE_PORT,
                     control_port=CTRL_PORT, fmt="state",
                     use_feedback_gains=False)
    ctrl_ring = Ring(capacity=64, record_len=3)
    ctrl_link = UdpLink(CTRL_PORT, ctrl_ring)
    try:
        ctrl = np.tile([0.25, 0.5], (10, 1)).astype(np.float32)
        plant.set_solution(np.zeros((10, 7)), ctrl, None, ts=100.0)

        UdpLink.send(POSE_PORT, np.array(
            [100.02, 1, 2, 0.1, 0, 3, 0, 0], dtype=np.float32))
        deadline = time.time() + 5
        out = None
        while out is None and time.time() < deadline:
            out = plant.poll_once()
            time.sleep(0.005)
        assert out is not None
        assert out[0] == pytest.approx(0.25)
        assert out[1] == pytest.approx(0.5)
        # the command went out over UDP
        deadline = time.time() + 5
        rec = None
        while rec is None and time.time() < deadline:
            rec = ctrl_ring.pop_latest()
            time.sleep(0.005)
        np.testing.assert_allclose(rec, [100.02, 0.25, 0.5], rtol=1e-6)
        # plant state updated from the pose
        st = plant.get_state()
        assert st.x_pos == 1 and st.u_x == pytest.approx(3.0)
    finally:
        plant.stop()
        ctrl_link.close()


def test_udp_plant_odom_format():
    from autorally_tpu.runtime.udp_plant import UdpPlant

    plant = UdpPlant(dt=0.02, num_timesteps=10, pose_port=POSE_PORT + 10,
                     control_port=CTRL_PORT + 10, fmt="odom",
                     use_feedback_gains=False)
    try:
        yaw = 1.0
        q = euler_123_to_quat(0.05, 0.0, yaw)
        # world velocity purely forward at the car's heading
        vx, vy = 4.0 * math.cos(yaw), 4.0 * math.sin(yaw)
        UdpLink.send(POSE_PORT + 10, np.array(
            [5.0, 10.0, -3.0, 0.0, *q, vx, vy, 0.0, 0.2], dtype=np.float32))
        deadline = time.time() + 5
        while plant.pose_count == 0 and time.time() < deadline:
            plant.poll_once()
            time.sleep(0.005)
        st = plant.get_state()
        assert st.x_pos == pytest.approx(10.0)
        assert st.yaw == pytest.approx(yaw, abs=1e-5)
        assert st.u_x == pytest.approx(4.0, abs=1e-5)
        assert st.u_y == pytest.approx(0.0, abs=1e-5)
        assert st.yaw_mder == pytest.approx(-0.2, abs=1e-6)
    finally:
        plant.stop()


def test_realtime_loop_against_udp_simulator():
    """End-to-end: a 'remote' simulator thread publishes poses over UDP and
    applies received controls; the realtime control loop closes the loop."""
    import jax

    from autorally_tpu.config import CostParams, MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.costs.costmap import make_costmap
    from autorally_tpu.models import NeuralNetDynamics
    from autorally_tpu.runtime.control_loop import (ControlLoopConfig,
                                                    run_control_loop)
    from autorally_tpu.runtime.controller import Controller
    from autorally_tpu.runtime.udp_plant import UdpPlant
    from autorally_tpu.tools.track_generator import oval_track

    NN = ("/root/reference/autorally_control/src/path_integral/params/"
          "models/autorally_nnet_09_12_2018.npz")
    cfg = MPPIConfig(num_rollouts=64, num_timesteps=16, hz=50)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN)
    from autorally_tpu.solver.mppi import MPPISolver

    solver = MPPISolver(model, MPPICost(), cfg)
    actual = Controller(solver, params, CostParams(desired_speed=4.0), cm)
    predicted = Controller(solver, params, CostParams(desired_speed=4.0),
                           cm, seed=3)

    plant = UdpPlant(dt=cfg.dt, num_timesteps=cfg.num_timesteps,
                     pose_port=POSE_PORT + 20, control_port=CTRL_PORT + 20,
                     fmt="state", use_feedback_gains=False)
    plant.start()

    # remote simulator: integrates the model with the last received control
    ctrl_ring = Ring(capacity=64, record_len=3)
    ctrl_link = UdpLink(CTRL_PORT + 20, ctrl_ring)
    state = np.array([30.0, 0.0, math.pi / 2, 0, 0, 0, 0], dtype=np.float32)
    sim_alive = [True]
    import jax.numpy as jnp

    @jax.jit
    def sim_step(s, u):
        return model.update_state(params, s, u)

    def simulator():
        t = 0.0
        u = np.zeros(2, dtype=np.float32)
        pacer = Pacer(cfg.dt)
        nonlocal_state = state
        while sim_alive[0]:
            pacer.wait()
            rec = ctrl_ring.pop_latest()
            if rec is not None:
                u = np.array(rec[1:3], dtype=np.float32)
            s_next, _ = sim_step(jnp.asarray(nonlocal_state), jnp.asarray(u))
            nonlocal_state = np.asarray(s_next)
            t += cfg.dt
            UdpLink.send(POSE_PORT + 20,
                         np.concatenate([[t], nonlocal_state]).astype(
                             np.float32))
        pacer.close()

    sim = threading.Thread(target=simulator, daemon=True)
    sim.start()
    time.sleep(0.2)  # let first poses arrive

    lcfg = ControlLoopConfig(hz=cfg.hz, num_timesteps=cfg.num_timesteps,
                             use_feedback_gains=False, realtime=True,
                             max_iter=40)
    try:
        timing = run_control_loop(predicted, actual, plant, lcfg)
    finally:
        sim_alive[0] = False
        sim.join(timeout=2)
        plant.stop()
        ctrl_link.close()

    assert timing.num_iter == 40
    # poses flowed, controls published, the car moved under closed loop
    assert plant.pose_count > 10
    assert len(plant.published) > 5
    st = plant.get_state()
    moved = math.hypot(st.x_pos - 30.0, st.y_pos - 0.0)
    assert st.u_x > 0.2 or moved > 0.05, (st.u_x, moved)
