"""Neural costmap: the track surface as an MXU-evaluable neural field.

TPU has no texture hardware, and pointwise gathers run at ~4 ns/element —
at K=65K rollouts the reference's per-step texture lookup becomes 13M
gathers per solve and dominates everything (SURVEY.md §7 hard-part (b) at
scale).  The TPU-native fix is to make the *data* MXU-shaped: distill the
costmap's channel 0 into a small Fourier-feature MLP.  Lookups become
batched matmuls — ~6 KFLOP/point on the MXU instead of a latency-bound
scatter into HBM — and scale with FLOPs, not gather latency.

This is an *approximation* of the exact point-sampled texture
(:class:`autorally_tpu.costs.costmap.Costmap` remains the default and the
parity path).  :func:`fit_neural_costmap` reports the approximation
quality, including the metric that matters for control: the fraction of
pixels whose crash-boundary classification (``value >=
boundary_threshold``, costs.cu:389-391) flips.

Duck-typed against ``Costmap``: implements ``lookup_ch0`` (the hot path
used by ``MPPICost.track_cost_c``) and ``world_to_norm``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NeuralCostmap:
    """Fourier-feature MLP field over normalized map coordinates."""

    weights: tuple            # ((in, out), ...) float32 or bfloat16
    biases: tuple
    freqs: jnp.ndarray        # (F,) fourier frequencies (powers of 2 * pi)
    r_c1: jnp.ndarray
    r_c2: jnp.ndarray
    trs: jnp.ndarray

    def world_to_norm(self, x, y):
        u = self.r_c1[0] * x + self.r_c2[0] * y + self.trs[0]
        v = self.r_c1[1] * x + self.r_c2[1] * y + self.trs[1]
        w = self.r_c1[2] * x + self.r_c2[2] * y + self.trs[2]
        return u / w, v / w

    def _features(self, u, v):
        """Fourier positional encoding of normalized coords: (N, 4F+2).

        Block layout [u, v, sin(u*F), sin(v*F), cos(u*F), cos(v*F)] —
        chosen so the fused Pallas kernel can build each F-row block as one
        full-sublane broadcast+trig op (interleaved layouts force 1-sublane
        rows and an 8x VPU utilization loss)."""
        ang_u = u[..., None] * self.freqs                     # (..., F)
        ang_v = v[..., None] * self.freqs
        feats = jnp.concatenate(
            [jnp.stack([u, v], axis=-1), jnp.sin(ang_u), jnp.sin(ang_v),
             jnp.cos(ang_u), jnp.cos(ang_v)], axis=-1)
        return feats

    def lookup_ch0(self, x, y):
        """Approximate channel-0 sample at world (x, y) — batched MLP."""
        u, v = self.world_to_norm(x, y)
        u = jnp.nan_to_num(jnp.clip(u, 0.0, 1.0))
        v = jnp.nan_to_num(jnp.clip(v, 0.0, 1.0))
        shape = u.shape
        acts = self._features(u.reshape(-1), v.reshape(-1))
        acts = acts.astype(self.weights[0].dtype)
        n = len(self.weights)
        # Default (fast bf16-pass) matmul precision: the field's *fit*
        # error (~1e-2) dominates evaluation precision by 10x, so paying
        # 3-6x MXU passes for f32 exactness buys nothing here.  The fused
        # Pallas kernel makes the same choice.
        for i, (W, b) in enumerate(zip(self.weights, self.biases)):
            acts = jnp.dot(acts, W, preferred_element_type=jnp.float32) + b
            if i < n - 1:
                acts = jnp.maximum(acts, 0.0)                # ReLU
            acts = acts.astype(W.dtype)
        return acts.reshape(*shape, -1)[..., 0].astype(jnp.float32)

    def lookup(self, x, y):
        """4-channel interface parity: channel 0 learned, rest zero."""
        ch0 = self.lookup_ch0(x, y)
        return jnp.stack([ch0, jnp.zeros_like(ch0), jnp.zeros_like(ch0),
                          jnp.zeros_like(ch0)], axis=-1)


def _flatten_nc(nc):
    return ((nc.weights, nc.biases, nc.freqs, nc.r_c1, nc.r_c2, nc.trs), None)


jax.tree_util.register_pytree_node(
    NeuralCostmap, _flatten_nc,
    lambda aux, c: NeuralCostmap(*c))


def fit_neural_costmap(costmap, hidden: Tuple[int, ...] = (64, 64),
                       num_freqs: int = 8, epochs: int = 4000,
                       batch: int = 16384, lr: float = 2e-3,
                       boundary_threshold: float = 0.65,
                       dtype=jnp.float32, seed: int = 0,
                       verbose: bool = False
                       ) -> Tuple[NeuralCostmap, Dict[str, float]]:
    """Distill ``costmap`` channel 0 into a NeuralCostmap.

    Returns (field, metrics) with metrics: ``mae``, ``max_err`` (on-track
    region), ``boundary_flip_rate`` — fraction of pixels near the track
    whose crash classification changes.
    """
    import optax

    H, W = costmap.height, costmap.width
    ch0 = np.asarray(costmap.data[..., 0])
    # training coords: pixel centers in normalized map space
    vs = (np.arange(H) + 0.5) / H
    us = (np.arange(W) + 0.5) / W
    UU, VV = np.meshgrid(us, vs)
    coords = np.stack([UU.reshape(-1), VV.reshape(-1)], axis=1)
    targets = ch0.reshape(-1, 1)
    # emphasize the region that matters: cap off-track values (the cost
    # clamps/crashes there anyway) to keep the fit budget on-track
    cap = max(3.0, boundary_threshold * 3)
    targets = np.minimum(targets, cap).astype(np.float32)

    freqs = jnp.asarray((2.0 ** np.arange(num_freqs)) * np.pi,
                        dtype=jnp.float32)
    feat_dim = 2 + 4 * num_freqs
    layers = (feat_dim,) + tuple(hidden) + (1,)

    key = jax.random.PRNGKey(seed)
    weights, biases = [], []
    for i in range(len(layers) - 1):
        key, sub = jax.random.split(key)
        scale = np.sqrt(2.0 / layers[i])
        weights.append(scale * jax.random.normal(
            sub, (layers[i], layers[i + 1]), dtype=jnp.float32))
        biases.append(jnp.zeros((layers[i + 1],), dtype=jnp.float32))

    def forward(wb, p):
        ang_u = p[:, 0:1] * freqs
        ang_v = p[:, 1:2] * freqs
        acts = jnp.concatenate(
            [p, jnp.sin(ang_u), jnp.sin(ang_v),
             jnp.cos(ang_u), jnp.cos(ang_v)], axis=-1)
        n = len(wb["w"])
        for i, (Wm, b) in enumerate(zip(wb["w"], wb["b"])):
            acts = jnp.dot(acts, Wm,
                           preferred_element_type=jnp.float32) + b
            if i < n - 1:
                acts = jnp.maximum(acts, 0.0)
        return acts

    tx = optax.adam(lr)
    wb = {"w": weights, "b": biases}
    opt_state = tx.init(wb)

    n = len(coords)
    coords_d = jnp.asarray(coords)
    targets_d = jnp.asarray(targets)

    # The whole training loop runs on-device (one jit, lax.scan over
    # steps) — per-step host round-trips would dominate otherwise.
    @jax.jit
    def train(wb, opt_state, key):
        def step(carry, k):
            wb, opt_state = carry
            idx = jax.random.randint(k, (batch,), 0, n)
            p = coords_d[idx]
            t = targets_d[idx]

            def loss_fn(wb):
                return jnp.mean((forward(wb, p) - t) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(wb)
            updates, opt_state = tx.update(grads, opt_state)
            wb = optax.apply_updates(wb, updates)
            return (wb, opt_state), loss

        keys = jax.random.split(key, epochs)
        (wb, opt_state), losses = jax.lax.scan(step, (wb, opt_state), keys)
        return wb, losses

    wb, losses = train(wb, opt_state, jax.random.PRNGKey(seed + 1))
    if verbose:
        print(f"  nc fit: loss {float(losses[0]):.5f} -> "
              f"{float(losses[-1]):.5f} over {epochs} steps")

    # validation on the full grid (chunked)
    preds = []
    fwd = jax.jit(lambda p: forward(wb, p))
    for i in range(0, n, 1 << 18):
        preds.append(np.asarray(fwd(jnp.asarray(coords[i:i + (1 << 18)]))))
    pred = np.concatenate(preds).reshape(-1)
    true = targets.reshape(-1)
    on_track = true < cap - 1e-3      # exclude the capped plateau
    err = np.abs(pred - true)
    flips = ((pred >= boundary_threshold) != (true >= boundary_threshold))
    near = np.abs(true - boundary_threshold) < 1.0
    metrics = {
        "mae": float(err[on_track].mean()),
        "max_err": float(err[on_track].max()),
        "boundary_flip_rate": float(flips[near].mean()),
    }

    field = NeuralCostmap(
        weights=tuple(w.astype(dtype) for w in wb["w"]),
        biases=tuple(b.astype(jnp.float32) for b in wb["b"]),
        freqs=freqs, r_c1=costmap.r_c1, r_c2=costmap.r_c2, trs=costmap.trs)
    return field, metrics
