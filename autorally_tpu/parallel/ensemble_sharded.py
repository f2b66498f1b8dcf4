"""Ensemble-sharded MPPI: a 2-D (ensemble, rollouts) device mesh.

The EP-like axis from SURVEY.md §2.4 made first-class: the M ensemble
members' parameter sets shard across the ``ensemble`` mesh axis (each
chip holds ONE member's weights — no replication of the model), and each
member's share of the rollouts further shards across the ``rollouts``
axis.  Globally the K rollouts are partitioned into M contiguous member
blocks (matching :class:`EnsembleDynamics`'s single-chip block layout),
so the noise-free rollout and pure-noise band keep their global-index
semantics.

Communication per iteration is unchanged from the 1-D solver — pmin +
two psums, now over both axes — because the MPPI update is a flat
importance-weighted average regardless of which member produced which
rollout.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from autorally_tpu.config import CostParams, MPPIConfig, effective_gamma
from autorally_tpu.costs.costmap import Costmap
from autorally_tpu.costs.mppi_cost import MPPICost
from autorally_tpu.models.base import Dynamics
from autorally_tpu.solver.mppi import (ControllerState, MPPISolver,
                                       SolveStats, savitzky_golay)

ENSEMBLE_AXIS = "ensemble"
ROLLOUT_AXIS = "rollouts"


class EnsembleShardedMPPISolver(MPPISolver):
    """MPPI over an M-member ensemble on a 2-D mesh.

    ``model`` is the *base* (single-member) dynamics; ``solve`` takes the
    stacked params pytree (leading axis M).  Member m evaluates rollouts
    [m*K/M, (m+1)*K/M); member 0 owns the noise-free rollout.  The
    nominal-trajectory re-rollout uses member 0 (the canonical model),
    matching :class:`EnsembleDynamics` single-chip semantics.
    """

    def __init__(self, model: Dynamics, cost: MPPICost, cfg: MPPIConfig,
                 mesh: Mesh, ensemble_axis: str = ENSEMBLE_AXIS,
                 rollout_axis: str = ROLLOUT_AXIS):
        self.mesh = mesh
        self.ensemble_axis = ensemble_axis
        self.rollout_axis = rollout_axis
        self.num_members = mesh.shape[ensemble_axis]
        self.n_rollout_shards = mesh.shape[rollout_axis]
        n_total = self.num_members * self.n_rollout_shards
        if cfg.num_rollouts % n_total:
            raise ValueError(
                f"num_rollouts {cfg.num_rollouts} not divisible by "
                f"{n_total} (= {self.num_members} members x "
                f"{self.n_rollout_shards} rollout shards)")
        super().__init__(model, cost, cfg)

    def _local_rollouts(self) -> int:
        return self.cfg.num_rollouts // (self.num_members
                                         * self.n_rollout_shards)

    def _member_params_spec(self, stacked_params):
        """PartitionSpec tree: stacked leading axis over the ensemble
        mesh axis, everything else replicated."""
        return jax.tree_util.tree_map(
            lambda _: P(self.ensemble_axis), stacked_params)

    def _sharded_iterate(self, stacked_params, cost_params, costmap, state,
                         U, key) -> Tuple[jnp.ndarray, SolveStats]:
        cfg = self.cfg
        T, C = cfg.num_timesteps, self.model.CONTROL_DIM
        K_local = self._local_rollouts()
        e_axis, r_axis = self.ensemble_axis, self.rollout_axis
        both = (e_axis, r_axis)
        K_per_member = cfg.num_rollouts // self.num_members

        def body(member_params, cost_params, costmap, state, U, key):
            # this shard's member slice arrives with a leading axis of 1
            member_params = jax.tree_util.tree_map(
                lambda x: x[0], member_params)
            e_idx = lax.axis_index(e_axis)
            r_idx = lax.axis_index(r_axis)
            shard_key = jax.random.fold_in(
                jax.random.fold_in(key, e_idx), r_idx)
            eps = self._sample_noise(shard_key, (T, K_local, C))
            k_offset = e_idx * K_per_member + r_idx * K_local
            total, u_seq, crash = self.rollout_costs(
                member_params, cost_params, costmap, state, U, eps,
                k_offset=k_offset)

            baseline = lax.pmin(lax.pmin(jnp.min(total), e_axis), r_axis)
            w = jnp.exp(-effective_gamma(cfg, cost_params)
                        * (total - baseline))
            eta = lax.psum(lax.psum(jnp.sum(w), e_axis), r_axis)
            sum_w2 = lax.psum(lax.psum(jnp.sum(w * w), e_axis), r_axis)
            spec = "k,ctk->tc" if self.use_pallas_rollout else "k,tkc->tc"
            numer = lax.psum(lax.psum(
                jnp.einsum(spec, w, u_seq), e_axis), r_axis)
            U_new = numer / eta

            psum2 = lambda x: lax.psum(lax.psum(x, e_axis), r_axis)
            stats = SolveStats(
                baseline=baseline, normalizer=eta,
                trajectory_cost=sum_w2 / eta,
                ess=(eta * eta) / sum_w2,
                mean_cost=psum2(jnp.sum(total)) / cfg.num_rollouts,
                crash_frac=psum2(jnp.sum(crash.astype(jnp.float32)))
                / cfg.num_rollouts)
            return U_new, stats

        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(self._member_params_spec(stacked_params),
                      P(), P(), P(), P(), P()),
            out_specs=(P(), SolveStats(*([P()] * 6))),
            check_vma=False)
        return fn(stacked_params, cost_params, costmap, state, U, key)

    def _solve(self, stacked_params, cost_params: CostParams,
               costmap: Costmap, state: jnp.ndarray, cs: ControllerState
               ) -> Tuple[ControllerState, SolveStats]:
        cfg = self.cfg
        U, key, stats = cs.U, cs.key, None
        for _ in range(cfg.num_iters):
            key, sub = jax.random.split(key)
            U, stats = self._sharded_iterate(
                stacked_params, cost_params, costmap, state, U, sub)
        U = savitzky_golay(U, cs.control_hist)
        # nominal trajectory under the canonical member (member 0)
        member0 = jax.tree_util.tree_map(lambda x: x[0], stacked_params)
        states_sol, controls_sol = self.nominal_trajectory(member0, state, U)
        return cs._replace(U=U, state_solution=states_sol,
                           control_solution=controls_sol, key=key), stats
