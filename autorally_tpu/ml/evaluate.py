"""Model evaluation: instantaneous and multi-step closed-loop errors.

Port of ``generate_predictions`` (``train_dynamics_model.py:156-347``): the
decisive metric for an MPPI dynamics model is not one-step loss but how far
closed-loop rollouts drift from ground truth over the control horizon.
Given a logged trajectory, every index starts an H-step rollout integrated
with the trained model (full kinematics + dynamics, matching
``compute_state_ders``, ``utils.py:132-152``), and errors are aggregated
per horizon step — vectorized over all start points at once instead of the
reference's per-batch Python loop.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from autorally_tpu.models.base import Dynamics


def instantaneous_errors(model: Dynamics, params, inputs: np.ndarray,
                         labels: np.ndarray) -> Dict[str, np.ndarray]:
    """Per-output one-step prediction errors (pred - label)."""
    x = jnp.asarray(inputs)
    states = jnp.concatenate(
        [jnp.zeros((x.shape[0], model.KINEMATICS_DIM)), x[:, :4]], axis=1)
    preds = np.asarray(model.dynamics(params, states, x[:, 4:]))
    err = preds - labels
    return {
        "errors": err,
        "mean_abs": np.abs(err).mean(axis=0),
        "rmse": np.sqrt((err ** 2).mean(axis=0)),
    }


def multistep_errors(model: Dynamics, params, states: np.ndarray,
                     controls: np.ndarray, horizon: int
                     ) -> Dict[str, np.ndarray]:
    """Closed-loop rollout error vs horizon.

    ``states``: (N, 7) ground-truth trajectory at the model dt;
    ``controls``: (N, 2) executed controls.  From every start index i the
    model is rolled ``horizon`` steps against controls[i:i+H], and compared
    to states[i+1:i+1+H].  Returns per-horizon-step position and full-state
    error statistics (the reference's boxplot data,
    train_dynamics_model.py:250-330).
    """
    N = len(states) - horizon
    if N <= 0:
        raise ValueError("trajectory shorter than horizon")
    S = states.shape[1]

    starts = jnp.asarray(states[:N])                      # (N, S)
    # windows of controls: (N, H, C); window i = controls[i:i+H]
    idx = np.arange(N)[:, None] + np.arange(horizon)[None, :]
    ctrl_windows = jnp.asarray(controls[idx])             # (N, H, C)
    truth = jnp.asarray(states[idx + 1])                  # (N, H, S)

    def rollout(s0, us):
        def step(s, u):
            u = model.enforce_constraints(params, u)
            s_next = s + model.state_deriv(params, s, u) * model.dt
            return s_next, s_next
        _, traj = jax.lax.scan(step, s0, us)
        return traj                                       # (H, S)

    trajs = jax.vmap(rollout)(starts, ctrl_windows)       # (N, H, S)
    err = np.asarray(trajs - truth)                       # (N, H, S)
    pos_err = np.linalg.norm(err[..., :2], axis=-1)       # (N, H)
    return {
        "state_errors": err,
        "pos_error_mean": pos_err.mean(axis=0),           # (H,)
        "pos_error_median": np.median(pos_err, axis=0),
        "pos_error_p90": np.percentile(pos_err, 90, axis=0),
        "state_rmse": np.sqrt((err ** 2).mean(axis=0)),   # (H, S)
    }
