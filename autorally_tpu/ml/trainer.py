"""Three-phase ML pipeline driver: preprocess -> train -> test.

CLI equivalent of the reference ``ml_pipeline/trainer.py:244-264`` driven
by a YAML config with the same phase switches (``config.yml``):

.. code-block:: yaml

    preprocess_data: true
    train_model: true
    test_model: true
    data_csv: logs/run1.csv          # t,x,y,yaw,roll,u_x,u_y,yaw_mder,steering,throttle
    results_dir: ml_results
    nn_layers: [6, 32, 32, 4]
    epochs: 300
    batch_size: 64
    lr: 0.005
    loss_weights: [1.0, 1.0, 1.0, 0.5]
    state_step: 0.02                 # model dt
    horizons: [10, 50, 100]          # multi-step eval horizons

Run: ``python -m autorally_tpu.ml.trainer --config config.yml``
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

DEFAULTS = dict(
    preprocess_data=True, train_model=True, test_model=True,
    results_dir="ml_results", nn_layers=[6, 32, 32, 4], epochs=300,
    batch_size=64, lr=5e-3, weight_decay=0.0,
    loss_weights=[1.0, 1.0, 1.0, 0.5], state_step=0.02,
    horizons=[10, 50, 100], val_frac=0.2, seed=0,
)


def load_config(path):
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    out = dict(DEFAULTS)
    out.update(cfg or {})
    return out


def run(cfg: dict) -> dict:
    import jax

    from autorally_tpu.ml import (DynamicsDataset, TrainConfig,
                                  instantaneous_errors, multistep_errors,
                                  preprocess_trajectory, train_dynamics)
    from autorally_tpu.models import NeuralNetDynamics

    os.makedirs(cfg["results_dir"], exist_ok=True)
    results = {}

    # -- phase 1: preprocess (trainer.py preprocess_data) --------------------
    raw = np.loadtxt(cfg["data_csv"], delimiter=",", skiprows=1)
    t = raw[:, 0]
    states = raw[:, 1:8]
    controls = raw[:, 8:10]
    if cfg["preprocess_data"]:
        inputs, labels = preprocess_trajectory(t, states, controls)
        np.savez(os.path.join(cfg["results_dir"], "dataset.npz"),
                 inputs=inputs, labels=labels)
    else:
        d = np.load(os.path.join(cfg["results_dir"], "dataset.npz"))
        inputs, labels = d["inputs"], d["labels"]

    model = NeuralNetDynamics(cfg["state_step"], layers=cfg["nn_layers"])

    # -- phase 2: train (trainer.py train_model) -----------------------------
    model_npz = os.path.join(cfg["results_dir"], "model.npz")
    if cfg["train_model"]:
        train, val = DynamicsDataset(inputs, labels).split(
            cfg["val_frac"], cfg["seed"])
        init = model.init_params(jax.random.PRNGKey(cfg["seed"]))
        tcfg = TrainConfig(epochs=cfg["epochs"], batch_size=cfg["batch_size"],
                           lr=cfg["lr"], weight_decay=cfg["weight_decay"],
                           loss_weights=tuple(cfg["loss_weights"]),
                           seed=cfg["seed"])
        params, history = train_dynamics(model, init, train, val, tcfg)
        model.save_params(params, model_npz)      # reference interchange
        results["best_val_loss"] = min(history["val"])
        results["model_npz"] = model_npz
    else:
        params = model.load_params(model_npz)

    # -- phase 3: test (trainer.py test_model) -------------------------------
    if cfg["test_model"]:
        inst = instantaneous_errors(model, params, inputs, labels)
        results["instantaneous_rmse"] = inst["rmse"].tolist()
        results["multistep"] = {}
        for h in cfg["horizons"]:
            ms = multistep_errors(model, params, states.astype(np.float32),
                                  controls.astype(np.float32), horizon=h)
            results["multistep"][str(h)] = {
                "pos_error_mean_final": float(ms["pos_error_mean"][-1]),
                "pos_error_p90_final": float(ms["pos_error_p90"][-1]),
            }
            np.savez(os.path.join(cfg["results_dir"], f"multistep_h{h}.npz"),
                     pos_error_mean=ms["pos_error_mean"],
                     pos_error_median=ms["pos_error_median"],
                     pos_error_p90=ms["pos_error_p90"],
                     state_rmse=ms["state_rmse"])

    with open(os.path.join(cfg["results_dir"], "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    args = ap.parse_args()
    results = run(load_config(args.config))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
