"""The closed drive->log->train->hot-swap loop against the independent
physics plant (VERDICT round-1 item 4 'done' criterion), shrunk to test
scale: the mechanism — honest data capture, multi-topic ingest, fine-
tuning, and a live model swap through the plant's update queue — must
demonstrably change the running controller's model and improve its fit
of the plant."""

import json
import math

import numpy as np

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.ml import (DynamicsDataset, TrainConfig, ingest_log,
                              instantaneous_errors, train_dynamics)
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.runtime import (ControlLoopConfig, Controller,
                                   run_control_loop)
from autorally_tpu.sim import SimVehiclePlant
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

from examples.ml_loop_demo import write_log_record

NN_NPZ = ("/root/reference/autorally_control/src/path_integral/params/"
          "models/autorally_nnet_09_12_2018.npz")


def test_drive_log_train_hotswap_loop(tmp_path):
    cfg = MPPIConfig(num_rollouts=96, num_timesteps=24)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params0 = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    cp = CostParams(desired_speed=4.0)
    actual = Controller(solver, params0, cp, cm)
    predicted = Controller(solver, params0, cp, cm, seed=5)

    start = np.array([30.0, 0.0, math.pi / 2, 0, 0, 0, 0],
                     dtype=np.float32)
    plant = SimVehiclePlant(start, cfg.dt, cfg.num_timesteps,
                            use_feedback_gains=False)
    plant.receive_state_vector(0.0, start)

    # phase 1: drive the PHYSICS plant in lockstep, recording the log
    log = str(tmp_path / "drive.jsonl")
    with open(log, "w") as f:
        def on_tick(i, chosen, used, state):
            if plant.published:
                u = plant.published[-1][1:3]
                write_log_record(f, plant.sim_time, plant.true_state, u,
                                 plant.wheel_speeds(), i)

        lcfg = ControlLoopConfig(hz=cfg.hz, num_timesteps=cfg.num_timesteps,
                                 use_feedback_gains=False, max_iter=300)
        run_control_loop(predicted, actual, plant, lcfg, on_tick=on_tick)

    assert plant.true_state[4] > 1.0      # the physics vehicle moved

    # phase 2: ingest the multi-topic log, fine-tune the model
    df = ingest_log(log)
    assert len(df) > 200
    feats = df[["roll", "u_x", "u_y", "yaw_mder", "steering",
                "throttle"]].to_numpy(np.float32)
    labels = df[["roll_der", "u_x_der", "u_y_der",
                 "yaw_mder_der"]].to_numpy(np.float32)
    rmse0 = instantaneous_errors(model, params0, feats, labels)["rmse"]
    train, val = DynamicsDataset(feats, labels).split(0.2, 0)
    params1, _ = train_dynamics(
        model, params0, train, val,
        TrainConfig(epochs=15, batch_size=64, lr=1e-3), verbose=False)
    rmse1 = instantaneous_errors(model, params1, feats, labels)["rmse"]
    # fine-tuning on the physics-plant log must fit it better than the
    # stock (other-simulator-trained) weights
    assert rmse1.mean() < rmse0.mean(), (rmse1, rmse0)

    # phase 3: hot-swap into the running loop; the controllers must
    # actually consume the new params
    plant.push_model_params(params1)
    lcfg2 = ControlLoopConfig(hz=cfg.hz, num_timesteps=cfg.num_timesteps,
                              use_feedback_gains=False, max_iter=5)
    run_control_loop(predicted, actual, plant, lcfg2)
    swapped = actual.model_params
    got = np.asarray(swapped["weights"][0])
    want = np.asarray(params1["weights"][0])
    old = np.asarray(params0["weights"][0])
    np.testing.assert_array_equal(got, want)
    assert np.abs(want - old).max() > 1e-6   # training actually moved them
