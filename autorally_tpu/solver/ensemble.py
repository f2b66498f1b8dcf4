"""Single-chip M-member ensemble MPPI with the fused Pallas path.

:class:`~autorally_tpu.models.ensemble.EnsembleDynamics` evaluates the
K rollouts in M contiguous member blocks via a ``vmap`` over stacked
params — correct, but it has no in-kernel form (``KERNEL_KIND`` is
``None``), so the solver falls back to the ``lax.scan`` dynamics chain
and the fused Pallas rollout kernels (``ops/rollout_kernel.py``) sit
idle.  On the chip that costs most of the ensemble's throughput.

:class:`EnsembleMPPISolver` keeps the exact block semantics but
decomposes the rollout kernel *at the launcher level*: member m's K/M
block runs through the base model's fused kernel (dynamics chain + cost,
weights resident in VMEM) with ``k_offset = m*K/M``, and the per-member
results concatenate before the softmax update.  M is static, so the
whole solve is still ONE jitted program with M kernel launches inside —
no host round-trips, and each launch is a full MXU-batched rollout over
its block.  This is the single-chip row of BASELINE config #5 (the
8-model ensemble); the multi-chip variant is
:class:`~autorally_tpu.parallel.ensemble_sharded.EnsembleShardedMPPISolver`,
which shards the same member blocks over a 2-D (ensemble, rollouts)
mesh.

Global-numbering semantics are unchanged from the reference protocol:
rollout 0 (member 0's first rollout) is noise-free and the last 1% of
the *global* K are pure noise (``mppi_controller.cu:130-155``), because
each member call receives the true global ``k_offset``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs.costmap import Costmap
from autorally_tpu.costs.mppi_cost import MPPICost
from autorally_tpu.models.base import Dynamics
from autorally_tpu.models.ensemble import EnsembleDynamics, member_params
from autorally_tpu.solver.mppi import MPPISolver


class _MemberSolver(MPPISolver):
    """Per-member solver: kernel decisions (Pallas lane alignment) key
    off the member's K/M block size, while ``cfg.num_rollouts`` stays
    the GLOBAL K so the noise-free / pure-noise masks keep their global
    numbering inside ``rollout_costs``."""

    def __init__(self, model, cost, cfg, num_members: int):
        self._num_members = int(num_members)
        super().__init__(model, cost, cfg)

    def _local_rollouts(self) -> int:
        return self.cfg.num_rollouts // self._num_members


class EnsembleMPPISolver(MPPISolver):
    """MPPI over M stacked parameter sets, one fused kernel per member.

    ``solve`` takes the stacked params pytree (leading axis M, from
    :func:`~autorally_tpu.models.ensemble.stack_params`).  Member m
    evaluates rollouts [m*K/M, (m+1)*K/M); the nominal-trajectory
    re-rollout and constraint ranges use member 0 (the canonical model),
    matching :class:`EnsembleDynamics` semantics.
    """

    def __init__(self, base: Dynamics, cost: MPPICost, cfg: MPPIConfig,
                 num_members: int):
        if cfg.num_rollouts % num_members:
            raise ValueError(
                f"num_rollouts {cfg.num_rollouts} not divisible by "
                f"ensemble size {num_members}")
        self.num_members = int(num_members)
        # the per-member solver owns the fused-kernel decision (base
        # model KERNEL_KIND, lane alignment of the K/M block, backend)
        self._base_solver = _MemberSolver(base, cost, cfg, num_members)
        super().__init__(EnsembleDynamics(base, num_members), cost, cfg)
        # follow the member solver's backend choice: u_seq layout
        # ((C, T, K) fused vs (T, K, C) scan) and the iterate einsum spec
        # key off use_pallas_rollout
        self.use_pallas_rollout = self._base_solver.use_pallas_rollout

    # interpret-mode flag forwards to the member solver (that is where
    # the Pallas calls actually happen)
    @property
    def _pallas_interpret(self):
        return self._base_solver._pallas_interpret

    @_pallas_interpret.setter
    def _pallas_interpret(self, value):
        self._base_solver._pallas_interpret = value

    def rollout_costs(self, stacked_params, cost_params: CostParams,
                      costmap: Costmap, state: jnp.ndarray, U: jnp.ndarray,
                      eps: jnp.ndarray, k_offset=0
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        M = self.num_members
        K = eps.shape[1]
        if K % M:
            raise ValueError(f"batch {K} not divisible by ensemble {M}")
        K_m = K // M
        totals, u_seqs, crashes = [], [], []
        for m in range(M):                       # static: M launches, one jit
            t, u, c = self._base_solver.rollout_costs(
                member_params(stacked_params, m), cost_params, costmap,
                state, U, eps[:, m * K_m:(m + 1) * K_m, :],
                k_offset=k_offset + m * K_m)
            totals.append(t)
            u_seqs.append(u)
            crashes.append(c)
        k_axis = 2 if self._base_solver.use_pallas_rollout else 1
        return (jnp.concatenate(totals),
                jnp.concatenate(u_seqs, axis=k_axis),
                jnp.concatenate(crashes))

    def nominal_trajectory(self, stacked_params, state: jnp.ndarray,
                           U: jnp.ndarray):
        """Re-rollout under the canonical member (member 0)."""
        return self._base_solver.nominal_trajectory(
            member_params(stacked_params, 0), state, U)
