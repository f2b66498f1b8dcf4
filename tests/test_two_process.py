"""True two-process closed loop: the simulator node as a separate OS
process (the reference's controller-process <-> Gazebo-process
architecture, over the native UDP transport instead of ROS)."""

import math
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from autorally_tpu.runtime.native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib unavailable")

PORTS = {"model": (47930, 47931), "physics": (47934, 47935)}


@pytest.mark.parametrize("sim_kind", ["model", "physics"])
def test_two_process_closed_loop(sim_kind):
    from autorally_tpu.config import CostParams, MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.costs.costmap import make_costmap
    from autorally_tpu.models import NeuralNetDynamics
    from autorally_tpu.runtime.control_loop import (ControlLoopConfig,
                                                    run_control_loop)
    from autorally_tpu.runtime.controller import Controller
    from autorally_tpu.runtime.udp_plant import UdpPlant
    from autorally_tpu.solver.mppi import MPPISolver
    from autorally_tpu.tools.track_generator import oval_track

    NN = ("/root/reference/autorally_control/src/path_integral/params/"
          "models/autorally_nnet_09_12_2018.npz")

    pose_port, ctrl_port = PORTS[sim_kind]
    # the simulator runs as its own OS process; "physics" mode integrates
    # the independent four-wheel model (the Gazebo-oracle configuration)
    env = dict(os.environ)
    sim = subprocess.Popen(
        [sys.executable, "-m", "autorally_tpu.tools.sim_node",
         "--cpu", "--hz", "50", "--duration", "20",
         "--pose-port", str(pose_port), "--control-port", str(ctrl_port)]
        + (["--physics"] if sim_kind == "physics" else []),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)

    try:
        cfg = MPPIConfig(num_rollouts=64, num_timesteps=16, hz=50)
        data, xb, yb = oval_track(ppm=2.0)
        cm = make_costmap(data, xb, yb)
        model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
        params = model.load_params(NN)
        solver = MPPISolver(model, MPPICost(), cfg)
        cp = CostParams(desired_speed=4.0)
        actual = Controller(solver, params, cp, cm)
        predicted = Controller(solver, params, cp, cm, seed=9)

        plant = UdpPlant(dt=cfg.dt, num_timesteps=cfg.num_timesteps,
                         pose_port=pose_port, control_port=ctrl_port,
                         fmt="state", use_feedback_gains=False)
        plant.start()

        # wait for the sim process's pose stream
        deadline = time.time() + 15
        while plant.pose_count == 0 and time.time() < deadline:
            time.sleep(0.05)
        assert plant.pose_count > 0, "no poses from the simulator process"

        lcfg = ControlLoopConfig(hz=cfg.hz, num_timesteps=cfg.num_timesteps,
                                 use_feedback_gains=False, realtime=True,
                                 max_iter=60)
        run_control_loop(predicted, actual, plant, lcfg)

        st = plant.get_state()
        moved = math.hypot(st.x_pos - 30.0, st.y_pos)
        # the OTHER process's vehicle responded to our commands
        assert st.u_x > 0.2 or moved > 0.05, (st.u_x, moved)
        assert len(plant.published) > 10
        plant.stop()
    finally:
        try:
            sim.terminate()
            out, _ = sim.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            sim.kill()
            out, _ = sim.communicate()
    assert "sim_node:" in out
