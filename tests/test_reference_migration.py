"""Reference-data migration: a reference user's config.yml + process_bag
CSVs flow end-to-end into a solver-ready dynamics model.

The reference pipeline is rosbag -> process_bag.py (per-topic CSVs) ->
DataClass preprocessing -> torch training -> npz -> MPPI.  The migration
path starts from the SAME artifacts the user already has: their
``config.yml`` (parsed verbatim from the reference tree here) and their
per-topic CSVs in ``extract_bag_to_csv``'s flattened-Odometry schema.
"""

import math
import os

import numpy as np
import pytest

REF_CFG = ("/root/reference/autorally_control/src/path_integral/scripts/"
           "ml_pipeline/config.yml")

pytestmark = pytest.mark.skipif(not os.path.exists(REF_CFG),
                                reason="reference config.yml not mounted")


def _write_process_bag_csvs(outdir: str) -> None:
    """Synthesize per-topic CSVs in the exact schema extract_bag_to_csv
    produces (process_bag.py:82-160): flattened Odometry with pandas
    dedup suffixes for the state topic, chassisState for controls."""
    import pandas as pd

    # state topic at 50 Hz, smooth analytic signals
    t = np.arange(0.0, 20.0, 0.02)
    yaw = 0.25 * np.sin(0.3 * t)
    yaw_rate = 0.25 * 0.3 * np.cos(0.3 * t)
    u_x = 3.0 + np.sin(0.5 * t)
    u_y = 0.1 * np.cos(0.7 * t)
    roll_rate = 0.02 * np.sin(1.1 * t)
    x = np.cumsum(u_x * np.cos(yaw) * 0.02)
    y = np.cumsum(u_x * np.sin(yaw) * 0.02)
    state = pd.DataFrame({
        "secs": np.floor(t).astype(int),
        "nsecs": np.round((t - np.floor(t)) * 1e9).astype(int),
        # position
        "x": x, "y": y, "z": np.zeros_like(t),
        # orientation quaternion (roll=pitch=0)
        "x.1": np.zeros_like(t), "y.1": np.zeros_like(t),
        "z.1": np.sin(yaw / 2), "w": np.cos(yaw / 2),
        # linear velocity (body frame, ground_truth/state_transformed)
        "x.2": u_x, "y.2": u_y, "z.2": np.zeros_like(t),
        # angular velocity
        "x.3": roll_rate, "y.3": np.zeros_like(t), "z.3": yaw_rate,
    })
    # shuffle a few rows out of order: read_csv_topics must reorder by
    # stamp exactly like reorder_bag
    rows = np.arange(len(state))
    rows[100], rows[101] = rows[101], rows[100]
    state = state.iloc[rows].reset_index(drop=True)
    state.to_csv(os.path.join(outdir, "df_state.csv"), index=False)

    # chassis topic at 70 Hz (different rate; the config's resample
    # matches it to the state topic's row count)
    tc = np.arange(0.0, 20.0, 1.0 / 70.0)
    ctrl = pd.DataFrame({
        "secs": np.floor(tc).astype(int),
        "nsecs": np.round((tc - np.floor(tc)) * 1e9).astype(int),
        "steering": 0.3 * np.sin(0.4 * tc),
        "throttle": 0.45 + 0.2 * np.sin(0.2 * tc),
    })
    ctrl.to_csv(os.path.join(outdir, "df_ctrl.csv"), index=False)


@pytest.fixture(scope="module")
def migrated_table(tmp_path_factory):
    from autorally_tpu.ml.reference_config import (ingest_reference_csvs,
                                                   load_reference_config)

    outdir = str(tmp_path_factory.mktemp("refcsv"))
    _write_process_bag_csvs(outdir)
    cfg = load_reference_config(REF_CFG)
    table = ingest_reference_csvs(outdir, cfg["topics"])
    return cfg, table


def test_reference_config_parses():
    from autorally_tpu.ml.reference_config import load_reference_config

    cfg = load_reference_config(REF_CFG)
    assert cfg["nn_layers"] == [6, 32, 32, 4]
    assert cfg["feature_cols"] == ["roll", "u_x", "u_y", "yaw_der",
                                   "steering", "throttle"]
    assert cfg["label_cols"] == ["roll_der", "u_x_der", "u_y_der",
                                 "yaw_der_der"]
    assert len(cfg["topics"]) == 2
    assert cfg["loss_weights"] == [1.0, 1.0, 1.0, 0.5]


def test_csv_ingest_produces_training_table(migrated_table):
    cfg, table = migrated_table
    for col in (cfg["state_cols"] + cfg["ctrl_cols"]
                + cfg["feature_cols"] + cfg["label_cols"]):
        assert col in table.columns, col
    assert len(table) > 100
    assert np.isfinite(table[cfg["feature_cols"]].to_numpy()).all()
    # controls were truncated into [-1, 1] per the config's trunc spec
    assert table["steering"].abs().max() <= 1.0
    # the analytic signals survive the pipeline: u_x in [2, 4]
    assert 1.5 < table["u_x"].min() < table["u_x"].max() < 4.5
    # spline derivative of u_x tracks the analytic cos(0.5 t) * 0.5
    t = table["time"].to_numpy()
    interior = (t > 2.0) & (t < 18.0)
    expect = 0.5 * np.cos(0.5 * t[interior])
    got = table["u_x_der"].to_numpy()[interior]
    assert np.abs(got - expect).mean() < 0.05


def test_migrated_data_trains_and_drives_solver(migrated_table):
    """The full story: reference CSVs -> table -> trained pytree ->
    MPPI solve, no npz detour."""
    from autorally_tpu.config import CostParams, MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.costs.costmap import make_costmap
    from autorally_tpu.ml import DynamicsDataset, TrainConfig, train_dynamics
    from autorally_tpu.models import NeuralNetDynamics
    from autorally_tpu.solver.mppi import MPPISolver
    from autorally_tpu.tools.track_generator import oval_track

    cfg, table = migrated_table
    ds = DynamicsDataset(
        table[cfg["feature_cols"]].to_numpy(np.float32),
        table[cfg["label_cols"]].to_numpy(np.float32))
    train, val = ds.split(val_frac=0.2)

    mcfg = MPPIConfig(num_rollouts=128, num_timesteps=16)
    model = NeuralNetDynamics(mcfg.dt, layers=tuple(cfg["nn_layers"]),
                              control_ranges=mcfg.control_ranges)
    import jax

    init = model.init_params(jax.random.PRNGKey(0))
    tcfg = TrainConfig(epochs=20, batch_size=64, lr=5e-3,
                       loss_weights=tuple(cfg["loss_weights"]))
    best, history = train_dynamics(model, init, train, val, tcfg,
                                   verbose=False)
    assert history["val"][-1] < history["val"][0]

    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    solver = MPPISolver(model, MPPICost(), mcfg)
    start = np.array([0, -15.0, 0, 0, 3.0, 0, 0], np.float32)
    cs, stats = solver.solve(best, CostParams(desired_speed=4.0), cm,
                             start, solver.init_state())
    assert np.isfinite(np.asarray(cs.U)).all()
    assert float(stats.ess) > 1.0
