"""Fully-connected tanh MLP dynamics model.

TPU-native equivalent of the reference ``NeuralNetModel`` CUDA template
(``neural_net_model.cuh:48-132`` / ``neural_net_model.cu``).  The reference
evaluates the MLP per rollout in shared memory with neuron-level thread
parallelism (``neural_net_model.cu:358-410``); here the whole rollout batch
goes through the network at once, so each layer is a single ``(K, in) @
(in, out)`` matmul that XLA tiles onto the MXU.

Input to the net (matching ``neural_net_model.cu:372-377``)::

    acts = [roll, u_x, u_y, yaw_der, steering, throttle]   # (D + C = 6)

Output: d/dt of [roll, u_x, u_y, yaw_der]  (DYNAMICS_DIM = 4).

Weights load from the reference's ``.npz`` interchange format
(``dynamics_W{i}`` / ``dynamics_b{i}`` float64 arrays, i = 1..L-1;
``neural_net_model.cu:73-106``), cast to float32 exactly like the CUDA
loader.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from autorally_tpu.models.base import Dynamics, Params, control_ranges_array


class NeuralNetDynamics(Dynamics):
    """MLP dynamics; ``layers`` mirrors the reference template spec, e.g.
    ``NeuralNetModel<7,2,3,6,32,32,4>`` -> ``layers=(6, 32, 32, 4)``
    (``path_integral_main.cu:69``)."""

    def __init__(self, dt: float, layers: Sequence[int] = (6, 32, 32, 4),
                 control_ranges=((-0.99, 0.99), (-0.99, 0.65)),
                 negate_yaw_der: bool = True):
        super().__init__(dt, negate_yaw_der)
        self.layers = tuple(int(l) for l in layers)
        if self.layers[0] != self.DYNAMICS_DIM + self.CONTROL_DIM:
            raise ValueError(
                f"first layer must be {self.DYNAMICS_DIM + self.CONTROL_DIM}, "
                f"got {self.layers[0]}")
        if self.layers[-1] != self.DYNAMICS_DIM:
            raise ValueError(
                f"last layer must be {self.DYNAMICS_DIM}, got {self.layers[-1]}")
        self._control_ranges = control_ranges

    # -- parameters ---------------------------------------------------------

    def init_params(self, key: jax.Array) -> Params:
        """Random init (Glorot) — used for training from scratch."""
        weights, biases = [], []
        for i in range(len(self.layers) - 1):
            key, sub = jax.random.split(key)
            fan_in, fan_out = self.layers[i], self.layers[i + 1]
            scale = jnp.sqrt(2.0 / (fan_in + fan_out))
            weights.append(scale * jax.random.normal(
                sub, (fan_in, fan_out), dtype=jnp.float32))
            biases.append(jnp.zeros((fan_out,), dtype=jnp.float32))
        return {
            "weights": weights,
            "biases": biases,
            "control_rngs": control_ranges_array(self._control_ranges),
        }

    @classmethod
    def from_npz(cls, path: str, dt: float,
                 control_ranges=((-0.99, 0.99), (-0.99, 0.65)),
                 negate_yaw_der: bool = True):
        """Build a model with the layer spec *inferred from the npz* and
        its params loaded — covers every reference asset without knowing
        the architecture up front (the CUDA build needs the spec at
        compile time as template args, ``path_integral_main.cu:69``;
        e.g. ``wider_deeper_network_08_20_2020.npz`` is 6-64-64-64-64-4).
        Returns ``(model, params)``."""
        data = np.load(path)
        layers = []
        i = 1
        while f"dynamics_W{i}" in data.files:
            # infer from element COUNTS (bias size = fan_out), so flat or
            # oddly-shaped weight arrays — which load_params reshapes —
            # infer the same spec it will load
            out = int(np.asarray(data[f"dynamics_b{i}"]).size)
            if not layers:
                layers.append(
                    int(np.asarray(data[f"dynamics_W{i}"]).size) // out)
            layers.append(out)
            i += 1
        model = cls(dt, layers=layers, control_ranges=control_ranges,
                    negate_yaw_der=negate_yaw_der)
        return model, model.load_params(path)

    def load_params(self, path: str) -> Params:
        """Load ``dynamics_W{i}/b{i}`` from ``.npz`` (float64 -> float32),
        exactly as ``neural_net_model.cu:73-106``.

        Reference weight ``W_i`` has shape (out, in); we store the (in, out)
        transpose so the batched forward pass is ``acts @ W``.
        """
        data = np.load(path)
        weights, biases = [], []
        for i in range(1, len(self.layers)):
            W = np.asarray(data[f"dynamics_W{i}"], dtype=np.float32)
            b = np.asarray(data[f"dynamics_b{i}"], dtype=np.float32).reshape(-1)
            expect = (self.layers[i], self.layers[i - 1])
            if W.shape != expect:
                W = W.reshape(expect)
            weights.append(jnp.asarray(W.T))
            biases.append(jnp.asarray(b))
        return {
            "weights": weights,
            "biases": biases,
            "control_rngs": control_ranges_array(self._control_ranges),
        }

    def save_params(self, params: Params, path: str) -> None:
        """Export to the reference ``.npz`` interchange format (float64,
        (out, in) weight layout) for drop-in use by the CUDA controller."""
        out = {}
        for i, (W, b) in enumerate(zip(params["weights"], params["biases"])):
            out[f"dynamics_W{i+1}"] = np.asarray(W, dtype=np.float64).T
            out[f"dynamics_b{i+1}"] = np.asarray(b, dtype=np.float64)
        np.savez(path, **out)

    # -- in-kernel form (ops/rollout_kernel.py) ------------------------------

    KERNEL_KIND = "mlp"

    def kernel_spec(self) -> tuple:
        return self.layers

    def kernel_weights(self, params: Params) -> list:
        """(out, in) weight panels + (out, 1) bias columns, the layout the
        kernels' per-step ``(out, in) @ (in, K)`` matmuls consume."""
        wb = []
        for W, b in zip(params["weights"], params["biases"]):
            wb.append(jnp.transpose(W))
            wb.append(b[:, None])
        return wb

    # -- forward ------------------------------------------------------------

    def dynamics(self, params: Params, states: jnp.ndarray,
                 controls: jnp.ndarray) -> jnp.ndarray:
        """Batched MLP forward pass (tanh hidden, linear output), mirroring
        ``neural_net_model.cu:358-410`` (device) / ``:202-230`` (host)."""
        acts = jnp.concatenate(
            [states[..., self.KINEMATICS_DIM:], controls], axis=-1)
        n = len(params["weights"])
        for i, (W, b) in enumerate(zip(params["weights"], params["biases"])):
            # HIGHEST: true-f32 MXU passes, matching the reference's fp32
            # CUDA math and the Pallas kernel (TPU default is bf16 passes).
            acts = jnp.dot(acts, W, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST) + b
            if i < n - 1:
                acts = jnp.tanh(acts)
        return acts

    # -- live update --------------------------------------------------------

    def update_model(self, params: Params, description: Sequence[int],
                     flat_data: np.ndarray) -> Params:
        """Hot-swap weights from a flat buffer (the reference's live
        ``neuralNetModel`` ROS-topic update, ``neural_net_model.cu:152-180``):
        all weight matrices first (row-major (out, in)), then all biases.
        Returns unchanged params if the layer spec mismatches."""
        if tuple(description) != self.layers:
            return params
        flat = np.asarray(flat_data, dtype=np.float32)
        weights, biases = [], []
        stride = 0
        for i in range(len(self.layers) - 1):
            fan_in, fan_out = self.layers[i], self.layers[i + 1]
            W = flat[stride:stride + fan_out * fan_in].reshape(fan_out, fan_in)
            weights.append(jnp.asarray(W.T))
            stride += fan_out * fan_in
        for i in range(len(self.layers) - 1):
            fan_out = self.layers[i + 1]
            biases.append(jnp.asarray(flat[stride:stride + fan_out]))
            stride += fan_out
        return {**params, "weights": weights, "biases": biases}

    @property
    def num_params(self) -> int:
        """Total parameter count (``meta_math.h:38-71``)."""
        n = 0
        for i in range(len(self.layers) - 1):
            n += self.layers[i] * self.layers[i + 1] + self.layers[i + 1]
        return n
