"""Dynamics-model interface.

TPU-native re-design of the reference's ``DYNAMICS_T`` template concept
(``neural_net_model.cuh:48-132``, ``generalized_linear.cuh:46-112``).  Where
the reference evaluates one rollout per CUDA thread with neuron-level
``blockDim.y`` parallelism, here every method is *batched over rollouts*: a
model maps ``(params, states (..., S), controls (..., C))`` to derivatives,
so the inner evaluation vectorizes across the VPU/MXU and composes with
``vmap``/``scan``/``shard_map``.

State layout (identical to the reference, ``neural_net_model.cuh:54-62``)::

    s = [x, y, yaw, roll, u_x, u_y, yaw_der]        (STATE_DIM = 7)
    u = [steering, throttle]                        (CONTROL_DIM = 2)

The first ``KINEMATICS_DIM = 3`` states evolve by closed-form kinematics;
the trailing ``DYNAMICS_DIM`` states by the learned model.

Model parameters are pytrees (not object state) so they can be donated,
sharded, hot-swapped between steps (the reference's live ``neuralNetModel``
topic update, ``neural_net_model.cu:152-180``) and trained end-to-end.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

Params = Any


class Dynamics:
    """Base class for batched dynamics models."""

    STATE_DIM: int = 7
    CONTROL_DIM: int = 2
    KINEMATICS_DIM: int = 3

    #: In-kernel evaluation kind for the fused Pallas rollout kernels
    #: (``ops/rollout_kernel.py``): ``"mlp"`` (tanh MLP layers), ``"bf"``
    #: (generalized-linear basis functions), or ``None`` when the model has
    #: no in-kernel form (the solver falls back to the ``lax.scan`` path).
    KERNEL_KIND = None

    def kernel_spec(self) -> tuple:
        """Static (hashable) structure descriptor for the Pallas kernels —
        part of the jit cache key alongside :attr:`KERNEL_KIND`."""
        raise NotImplementedError

    def kernel_weights(self, params: Params) -> list:
        """Parameter arrays, in the layout the in-kernel evaluator of this
        :attr:`KERNEL_KIND` expects, to be passed as VMEM refs."""
        raise NotImplementedError

    def __init__(self, dt: float, negate_yaw_der: bool = True):
        self.dt = float(dt)
        # The reference pose pipeline reports the negative yaw derivative;
        # provided models were trained against it (neural_net_model.cu:352-354,
        # launch param negate_yaw_der).
        self.negate_yaw_der = bool(negate_yaw_der)

    @property
    def DYNAMICS_DIM(self) -> int:
        return self.STATE_DIM - self.KINEMATICS_DIM

    # -- parameters ---------------------------------------------------------

    def init_params(self, key: jax.Array) -> Params:
        raise NotImplementedError

    def load_params(self, path: str) -> Params:
        """Load a params pytree from the reference ``.npz`` interchange format."""
        raise NotImplementedError

    # -- dynamics -----------------------------------------------------------

    def kinematics(self, states: jnp.ndarray) -> jnp.ndarray:
        """Closed-form kinematic derivative for [x, y, yaw].

        Mirrors ``neural_net_model.cu:347-355`` /
        ``car_kinematics.cuh:47-52``.  ``states``: (..., S) -> (..., 3).
        """
        yaw = states[..., 2]
        u_x = states[..., 4]
        u_y = states[..., 5]
        yaw_der = states[..., 6]
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        dx = c * u_x - s * u_y
        dy = s * u_x + c * u_y
        dyaw = -yaw_der if self.negate_yaw_der else yaw_der
        return jnp.stack([dx, dy, dyaw], axis=-1)

    def dynamics(self, params: Params, states: jnp.ndarray,
                 controls: jnp.ndarray) -> jnp.ndarray:
        """Learned derivative of the trailing DYNAMICS_DIM states: (..., D)."""
        raise NotImplementedError

    def state_deriv(self, params: Params, states: jnp.ndarray,
                    controls: jnp.ndarray) -> jnp.ndarray:
        """Full (..., S) state derivative (``computeStateDeriv``)."""
        kin = self.kinematics(states)
        dyn = self.dynamics(params, states, controls)
        return jnp.concatenate([kin, dyn], axis=-1)

    # -- constraints & integration -----------------------------------------

    def enforce_constraints(self, params: Params,
                            controls: jnp.ndarray) -> jnp.ndarray:
        """Clamp controls to the model's control ranges.

        The ranges live in the params pytree as ``control_rngs`` (C, 2) so
        that e.g. the emergency throttle cut (``mppi_controller.cu:459-466``)
        is a parameter update, not a recompile.
        """
        rngs = params["control_rngs"]
        return jnp.clip(controls, rngs[:, 0], rngs[:, 1])

    def step(self, params: Params, states: jnp.ndarray,
             controls: jnp.ndarray) -> jnp.ndarray:
        """One Euler step: ``s + ds*dt`` (``incrementState``,
        ``neural_net_model.cu:334-344``).  Controls must be pre-clamped."""
        return states + self.state_deriv(params, states, controls) * self.dt

    def update_state(self, params: Params, states: jnp.ndarray,
                     controls: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Clamp + integrate; returns (next_state, clamped_control).

        Mirrors the host-side ``updateState`` (``neural_net_model.cu:280-288``)
        used for the nominal-trajectory re-rollout and the debug-mode plant.
        """
        u = self.enforce_constraints(params, controls)
        return self.step(params, states, u), u


def control_ranges_array(ranges) -> jnp.ndarray:
    """((lo, hi), ...) -> (C, 2) float32 array for the params pytree."""
    return jnp.asarray(ranges, dtype=jnp.float32)
