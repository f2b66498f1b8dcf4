"""Dynamics-model training: optax Adam + weighted smooth-L1, best-val
checkpointing.

Re-design of ``ml_pipeline/train_dynamics_model.py:16-153`` (PyTorch) in
JAX: the trained object IS the :class:`NeuralNetDynamics` params pytree, so
the result feeds the MPPI solver with zero conversion; ``save_params``
still exports the reference ``.npz`` interchange for the CUDA controller.

Defaults mirror ``config.yml``: Adam lr 5e-3, batch 64, smooth-L1 with
per-output loss weights [1, 1, 1, 0.5].
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from autorally_tpu.ml.dataset import DynamicsDataset
from autorally_tpu.models.neural_net import NeuralNetDynamics


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 50
    batch_size: int = 64
    lr: float = 5e-3
    weight_decay: float = 0.0
    loss_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 0.5)
    seed: int = 0
    log_every: int = 10


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise smooth-L1 (torch SmoothL1Loss semantics, beta=1):
    0.5 x^2 for |x| < 1 else |x| - 0.5."""
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def weighted_loss(pred, target, weights):
    """The reference scales outputs AND labels by the loss weights before
    the criterion (train_dynamics_model.py:81-83)."""
    w = jnp.asarray(weights)
    return jnp.mean(smooth_l1(pred * w, target * w))


def train_dynamics(model: NeuralNetDynamics, params, train: DynamicsDataset,
                   val: DynamicsDataset, cfg: TrainConfig = TrainConfig(),
                   verbose: bool = True) -> Tuple[Dict, Dict]:
    """Train the MLP; returns (best_params, history).

    Only ``weights``/``biases`` train; ``control_rngs`` rides along
    untouched (it is configuration, not a parameter).
    """

    def forward(wb, x):
        acts = x
        n = len(wb["weights"])
        for i, (W, b) in enumerate(zip(wb["weights"], wb["biases"])):
            acts = jnp.dot(acts, W, preferred_element_type=jnp.float32) + b
            if i < n - 1:
                acts = jnp.tanh(acts)
        return acts

    if cfg.weight_decay > 0:
        tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    else:
        tx = optax.adam(cfg.lr)

    wb = {"weights": list(params["weights"]), "biases": list(params["biases"])}
    opt_state = tx.init(wb)

    @jax.jit
    def train_step(wb, opt_state, x, y):
        def loss_fn(wb):
            return weighted_loss(forward(wb, x), y, cfg.loss_weights)

        loss, grads = jax.value_and_grad(loss_fn)(wb)
        updates, opt_state = tx.update(grads, opt_state, wb)
        wb = optax.apply_updates(wb, updates)
        return wb, opt_state, loss

    @jax.jit
    def eval_loss(wb, x, y):
        return weighted_loss(forward(wb, x), y, cfg.loss_weights)

    best_val = np.inf
    best_wb = wb
    history = {"train": [], "val": []}

    for epoch in range(cfg.epochs):
        epoch_loss, n_batches = 0.0, 0
        for x, y in train.batches(cfg.batch_size, seed=cfg.seed + epoch):
            wb, opt_state, loss = train_step(wb, opt_state,
                                             jnp.asarray(x), jnp.asarray(y))
            epoch_loss += float(loss)
            n_batches += 1
        train_loss = epoch_loss / max(n_batches, 1)
        val_loss = float(eval_loss(wb, jnp.asarray(val.inputs),
                                   jnp.asarray(val.labels)))
        history["train"].append(train_loss)
        history["val"].append(val_loss)

        # best-validation checkpointing (train_dynamics_model.py:115-120)
        if val_loss < best_val:
            best_val = val_loss
            best_wb = jax.tree_util.tree_map(lambda x: x, wb)

        if verbose and (epoch % cfg.log_every == 0 or epoch == cfg.epochs - 1):
            print(f"epoch {epoch:4d}  train {train_loss:.5f}  "
                  f"val {val_loss:.5f}  best {best_val:.5f}")

    best_params = {**params, "weights": best_wb["weights"],
                   "biases": best_wb["biases"]}
    return best_params, history


def fold_standardization(params, feat_mean, feat_std,
                         label_mean, label_std):
    """Fold feature/label standardization into the first/last layers.

    The reference trains on StandardScaler-transformed data and must
    carry the scaler pickles to inference (``trainer.py:120-133``,
    config.yml NOTE #2: forgetting them silently breaks predictions).
    Folding the affine transforms into the weights instead produces a
    raw-space model: with the framework's ``acts @ W`` convention,

        W0' = W0 / s_f[:, None],      b0' = b0 - (m_f / s_f) @ W0
        WL' = WL * s_l[None, :],      bL' = bL * s_l + m_l

    so ``NN'(x) == unstandardize(NN(standardize(x)))`` exactly and the
    exported ``.npz`` drops into the controller with no side files."""
    import jax.numpy as jnp

    W = [jnp.asarray(w, jnp.float32) for w in params["weights"]]
    b = [jnp.asarray(x, jnp.float32) for x in params["biases"]]
    fm = jnp.asarray(feat_mean, jnp.float32)
    fs = jnp.asarray(feat_std, jnp.float32)
    lm = jnp.asarray(label_mean, jnp.float32)
    ls = jnp.asarray(label_std, jnp.float32)

    b[0] = b[0] - (fm / fs) @ W[0]
    W[0] = W[0] / fs[:, None]
    b[-1] = b[-1] * ls + lm
    W[-1] = W[-1] * ls[None, :]
    return {**params, "weights": W, "biases": b}
