"""Generalized-linear (basis function) dynamics model.

TPU-native equivalent of ``GeneralizedLinear<CarBasisFuncs,7,2,25,
CarKinematics,3>`` (``generalized_linear.cuh/.cu``, ``car_bfs.cuh``).  The
reference loops the 25 basis functions over ``threadIdx.y`` and accumulates
with ``atomicAdd`` (``generalized_linear.cu:226-245``); here the basis
vector is computed for the whole rollout batch at once — (K, 25) — and the
model evaluation is a single ``(K, 25) @ (25, 4)`` matmul on the MXU.

The 25 hand-crafted car basis functions are ported exactly from
``car_bfs.cuh:44-121`` (throttle powers, slip-angle tan/atan terms, roll
couplings, and their magic normalization constants).  Branches on
``u_x > 0.1`` become masked ``jnp.where`` with safe denominators so the
model is also differentiable for the DDP feedback-gain solver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from autorally_tpu.models.base import Dynamics, Params, control_ranges_array

NUM_BFS = 25


def car_basis_functions(states: jnp.ndarray, controls: jnp.ndarray) -> jnp.ndarray:
    """Evaluate all 25 basis functions: (..., S), (..., C) -> (..., 25).

    Port of the ``switch`` in ``car_bfs.cuh:44-121``.  The CUDA code guards
    slip-angle terms with ``s[4] > .1``; the vectorized version computes both
    branches with division-safe denominators and selects with ``where``.
    """
    roll = states[..., 3]
    ux = states[..., 4]
    uy = states[..., 5]
    yd = states[..., 6]
    steer = controls[..., 0]
    thr = controls[..., 1]

    moving = ux > 0.1
    safe_ux = jnp.where(moving, ux, 1.0)

    # atan(uy/ux + .45*yd/ux) - steer   (front slip proxy)
    front = jnp.arctan(uy / safe_ux + 0.45 * yd / safe_ux) - steer
    tan_front = jnp.tan(jnp.where(moving, front, -steer))
    sin_st = jnp.sin(steer)

    # rear slip proxy terms
    r13 = uy / safe_ux - 0.35 * yd / safe_ux

    phi = [
        thr,                                                       # 0
        ux / 10.0,                                                 # 1
        sin_st * tan_front / 1200.0,                               # 2
        sin_st * tan_front * jnp.abs(tan_front) / 1440000.0,       # 3
        sin_st * tan_front ** 3 / 1728000000.0,                    # 4
        yd * uy / 25.0,                                            # 5
        yd / 10.0,                                                 # 6
        uy / 10.0,                                                 # 7
        sin_st,                                                    # 8
        jnp.where(moving, uy / safe_ux / 40.0, 0.0),               # 9
        tan_front / 1400.0,                                        # 10
        tan_front * jnp.abs(tan_front) / 1960000.0,                # 11
        tan_front ** 3 / 2744000000.0,                             # 12
        jnp.where(moving, r13 / 40.0, 0.0),                        # 13
        jnp.where(moving, r13 * jnp.abs(r13) / 1600.0, 0.0),       # 14
        jnp.where(moving, r13 ** 3 / 64000.0, 0.0),                # 15
        yd * ux / 50.0,                                            # 16
        roll,                                                      # 17
        roll * yd,                                                 # 18
        roll * ux / 3.0,                                           # 19
        roll * ux * yd / 5.0,                                      # 20
        ux ** 2 / 100.0,                                           # 21
        ux ** 3 / 1000.0,                                          # 22
        thr ** 2,                                                  # 23
        thr ** 3,                                                  # 24
    ]
    return jnp.stack(phi, axis=-1)


class BasisFunctionDynamics(Dynamics):
    """theta @ phi(s, u) dynamics with theta of shape (25, 4) (stored
    transposed relative to the reference's (4, 25) ``W`` so evaluation is a
    right-matmul over the batch)."""

    def __init__(self, dt: float,
                 control_ranges=((-0.99, 0.99), (-0.99, 0.65)),
                 negate_yaw_der: bool = True):
        # CarKinematics (car_kinematics.cuh:47-52) always negates yaw_der.
        super().__init__(dt, negate_yaw_der)
        self._control_ranges = control_ranges

    def init_params(self, key: jax.Array) -> Params:
        theta = 0.01 * jax.random.normal(
            key, (NUM_BFS, self.DYNAMICS_DIM), dtype=jnp.float32)
        return {"theta": theta,
                "control_rngs": control_ranges_array(self._control_ranges)}

    def load_params(self, path: str) -> Params:
        """Load ``W`` (4, 25) float64 from ``.npz``
        (``generalized_linear.cu:92-108``)."""
        data = np.load(path)
        W = np.asarray(data["W"], dtype=np.float32)
        if W.shape != (self.DYNAMICS_DIM, NUM_BFS):
            W = W.reshape(self.DYNAMICS_DIM, NUM_BFS)
        return {"theta": jnp.asarray(W.T),
                "control_rngs": control_ranges_array(self._control_ranges)}

    def save_params(self, params: Params, path: str) -> None:
        np.savez(path, W=np.asarray(params["theta"], dtype=np.float64).T)

    def dynamics(self, params: Params, states: jnp.ndarray,
                 controls: jnp.ndarray) -> jnp.ndarray:
        phi = car_basis_functions(states, controls)
        return jnp.dot(phi, params["theta"],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    # -- in-kernel form (ops/rollout_kernel.py) ------------------------------

    KERNEL_KIND = "bf"

    def kernel_spec(self) -> tuple:
        return (NUM_BFS, self.DYNAMICS_DIM)

    def kernel_weights(self, params: Params) -> list:
        """One (4, 25) theta panel: the kernel evaluates the basis vector
        as (25, K) rows and applies ``theta_T @ phi`` as one MXU matmul
        (the lane-batched form of ``generalized_linear.cu:226-245``)."""
        return [jnp.transpose(params["theta"])]
