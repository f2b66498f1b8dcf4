"""Model-ensemble dynamics: rollouts partitioned across M parameter sets.

The reference has no multi-model rollouts, but its robust-MPPI lineage
(tube-MPPI, RSS'18) motivates sampling trajectories under an ensemble of
dynamics models.  TPU-natively this is EP-like sharding (SURVEY.md §2.4):
the K rollouts are split into M contiguous blocks, block m evaluated under
parameter set m.  Params are stacked pytrees (leading axis M) and the
evaluation is a ``vmap`` over models — each member still runs batched
matmuls on its K/M block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from autorally_tpu.models.base import Dynamics, Params


def stack_params(params_list) -> Params:
    """Stack M params pytrees into one pytree with leading axis M."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def member_params(params: Params, m: int) -> Params:
    """Extract member m's params from a stacked pytree."""
    return jax.tree_util.tree_map(lambda x: x[m], params)


class EnsembleDynamics(Dynamics):
    """Wrap a base model with M stacked parameter sets.

    ``dynamics``/``state_deriv`` accept a batch whose leading dim K is
    divisible by M; block ``m`` (rollouts m*K/M .. (m+1)*K/M) is evaluated
    under member ``m``.  Single-state calls (nominal-trajectory re-rollout,
    debug plant) use member 0.
    """

    def __init__(self, base: Dynamics, num_members: int):
        super().__init__(base.dt, base.negate_yaw_der)
        self.base = base
        self.num_members = int(num_members)

    def init_params(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, self.num_members)
        return stack_params([self.base.init_params(k) for k in keys])

    def dynamics(self, params: Params, states: jnp.ndarray,
                 controls: jnp.ndarray) -> jnp.ndarray:
        if states.ndim == 1:  # single state -> member 0
            return self.base.dynamics(member_params(params, 0), states, controls)
        K = states.shape[0]
        M = self.num_members
        if K % M != 0:
            raise ValueError(f"batch {K} not divisible by ensemble size {M}")
        sh = states.reshape(M, K // M, *states.shape[1:])
        ch = controls.reshape(M, K // M, *controls.shape[1:])
        out = jax.vmap(self.base.dynamics)(params, sh, ch)
        return out.reshape(K, -1)

    def enforce_constraints(self, params: Params,
                            controls: jnp.ndarray) -> jnp.ndarray:
        # Control ranges are shared: use member 0's.
        rngs = params["control_rngs"][0]
        return jnp.clip(controls, rngs[:, 0], rngs[:, 1])
