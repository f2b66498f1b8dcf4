"""Multi-chip MPPI: rollouts sharded over a device mesh with ``shard_map``.

The scalable axis of MPPI is K (samples) — embarrassingly parallel except
for three reductions per iteration (SURVEY.md §2.4, §5).  Each chip:

1. derives its own noise stream by folding the shard index into the PRNG
   key (per-shard cuRAND-equivalent, replacing ``mppi_controller.cu:612``),
2. runs the rollout scan on its K/N shard (the same code as the
   single-chip solver, with a global ``k_offset`` so rollout 0 / the pure-
   noise band follow the global numbering),
3. joins the cross-chip reductions: ``pmin`` for the cost baseline,
   ``psum`` for the softmax normalizer and the (T, C) weighted-control
   numerator — two scalars and one tiny tensor over ICI per iteration.

Everything else (Savitzky-Golay, slide, nominal trajectory) is replicated
host-side-free math on each chip.  The reference caps K at 1920-2560 on one
GPU (``path_integral_main.cu:66-74``); this layer takes K to 100K+ by
adding chips with near-linear scaling (the collectives are O(T*C)).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from autorally_tpu.config import CostParams, MPPIConfig, effective_gamma
from autorally_tpu.costs.costmap import Costmap
from autorally_tpu.costs.mppi_cost import MPPICost
from autorally_tpu.models.base import Dynamics
from autorally_tpu.parallel.mesh import ROLLOUT_AXIS, rollout_mesh
from autorally_tpu.solver.mppi import (ControllerState, MPPISolver,
                                       SolveStats, savitzky_golay)


class ShardedMPPISolver(MPPISolver):
    """MPPI with rollouts sharded across a 1-D mesh axis.

    Drop-in replacement for :class:`MPPISolver`: same ``solve``/``slide``
    API, same semantics (verified against the single-chip solver by the
    sharding tests), K/N rollouts per chip.
    """

    def __init__(self, model: Dynamics, cost: MPPICost, cfg: MPPIConfig,
                 mesh: Optional[Mesh] = None, axis_name: str = ROLLOUT_AXIS,
                 force_shard_map: bool = False):
        self.mesh = rollout_mesh() if mesh is None else mesh
        self.axis_name = axis_name
        self.n_shards = self.mesh.shape[axis_name]
        if cfg.num_rollouts % self.n_shards:
            raise ValueError(
                f"num_rollouts {cfg.num_rollouts} not divisible by "
                f"{self.n_shards} shards")
        # On a 1-device mesh, shard_map buys nothing and costs real device
        # time (round-2 bench: ~164 vs ~390 solves/s at K=1920 on one
        # chip), so the iterates run the body inline with identity
        # reductions — bit-identical output because the per-shard noise
        # key is still fold_in(key, 0).  ``force_shard_map`` keeps the
        # wrapped path reachable for overhead forensics
        # (tools/solve_breakdown, scaling_bench).
        self._inline_body = self.n_shards == 1 and not force_shard_map
        super().__init__(model, cost, cfg)

    def _local_rollouts(self) -> int:
        return self.cfg.num_rollouts // self.n_shards

    def _shard_ops(self):
        """(axis_index, pmin, psum) — identity on the inline fast path."""
        if self._inline_body:
            return ((lambda: jnp.int32(0)), (lambda x: x), (lambda x: x))
        axis = self.axis_name
        return ((lambda: lax.axis_index(axis)),
                (lambda x: lax.pmin(x, axis)),
                (lambda x: lax.psum(x, axis)))

    def _run_body(self, body, *operands):
        if self._inline_body:
            return body(*operands)
        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=tuple(P() for _ in operands),
            out_specs=(P(), SolveStats(*([P()] * 6))),
            check_vma=False,
        )
        return fn(*operands)

    # The sharded iteration: replicated inputs, replicated outputs; the K
    # axis exists only *inside* the shard_map body (each chip materializes
    # just its own noise and rollout buffers — at K=262144, N=32 that is
    # 8K rollouts of state per chip instead of 262K).
    def _sharded_iterate(self, model_params, cost_params, costmap, state, U,
                         key) -> Tuple[jnp.ndarray, SolveStats]:
        cfg = self.cfg
        T, C = cfg.num_timesteps, self.model.CONTROL_DIM
        K_local = cfg.num_rollouts // self.n_shards
        axis_index, pmin, psum = self._shard_ops()

        def body(model_params, cost_params, costmap, state, U, key):
            idx = axis_index()
            shard_key = jax.random.fold_in(key, idx)
            eps = self._sample_noise(shard_key, (T, K_local, C))
            total, u_seq, crash = self.rollout_costs(
                model_params, cost_params, costmap, state, U, eps,
                k_offset=idx * K_local)

            # Cross-chip reductions (the only communication).
            baseline = pmin(jnp.min(total))
            w = jnp.exp(-effective_gamma(cfg, cost_params)
                        * (total - baseline))
            eta = psum(jnp.sum(w))
            sum_w2 = psum(jnp.sum(w * w))
            spec = "k,ctk->tc" if self.use_pallas_rollout else "k,tkc->tc"
            numer = psum(jnp.einsum(spec, w, u_seq))
            U_new = numer / eta

            stats = SolveStats(
                baseline=baseline,
                normalizer=eta,
                trajectory_cost=sum_w2 / eta,
                ess=(eta * eta) / sum_w2,
                mean_cost=psum(jnp.sum(total)) / cfg.num_rollouts,
                crash_frac=psum(jnp.sum(crash.astype(jnp.float32)))
                / cfg.num_rollouts,
            )
            return U_new, stats

        return self._run_body(
            body, model_params, cost_params, costmap, state, U, key)

    # kernel-RNG (nothing-in-HBM) mode, sharded: each chip seeds the
    # Mosaic PRNG from its own folded key — the per-chip cuRAND stream of
    # ``mppi_controller.cu:612`` — and the softmax joins globally (pmin
    # baseline, psum eta/numerator) between the two kernel passes.
    def _sharded_rng_iterate(self, model_params, cost_params, field, state,
                             U, key) -> Tuple[jnp.ndarray, SolveStats]:
        cfg = self.cfg
        K_local = cfg.num_rollouts // self.n_shards
        axis_index, pmin, psum = self._shard_ops()

        def body(model_params, cost_params, field, state, U, key):
            from autorally_tpu.ops.rollout_kernel import (fused_rng_costs,
                                                          fused_rng_numer)

            idx = axis_index()
            shard_key = jax.random.fold_in(key, idx)
            total, crash, ctx = fused_rng_costs(
                self.model, model_params, cfg, cost_params, field,
                state.astype(jnp.float32), U, shard_key,
                l1_cost=self.cost.l1_cost, k_offset=idx * K_local,
                K_local=K_local, interpret=self._pallas_interpret,
                precision=cfg.matmul_precision,
                **self._obstacle_kwargs(cost_params))

            baseline = pmin(jnp.min(total))
            w = jnp.exp(-effective_gamma(cfg, cost_params)
                        * (total - baseline))
            eta = psum(jnp.sum(w))
            sum_w2 = psum(jnp.sum(w * w))
            numer = psum(fused_rng_numer(ctx, w))
            U_new = (numer / eta).T

            stats = SolveStats(
                baseline=baseline,
                normalizer=eta,
                trajectory_cost=sum_w2 / eta,
                ess=(eta * eta) / sum_w2,
                mean_cost=psum(jnp.sum(total)) / cfg.num_rollouts,
                crash_frac=psum(jnp.sum(crash.astype(jnp.float32)))
                / cfg.num_rollouts,
            )
            return U_new, stats

        return self._run_body(
            body, model_params, cost_params, field, state, U, key)

    def _solve(self, model_params, cost_params: CostParams, costmap: Costmap,
               state: jnp.ndarray, cs: ControllerState
               ) -> Tuple[ControllerState, SolveStats]:
        cfg = self.cfg
        U, key, stats = cs.U, cs.key, None
        iterate = (self._sharded_rng_iterate if self._use_kernel_rng(costmap)
                   else self._sharded_iterate)
        for _ in range(cfg.num_iters):
            key, sub = jax.random.split(key)
            U, stats = iterate(
                model_params, cost_params, costmap, state, U, sub)
        U = savitzky_golay(U, cs.control_hist)
        states_sol, controls_sol = self.nominal_trajectory(model_params, state, U)
        new_cs = cs._replace(U=U, state_solution=states_sol,
                             control_solution=controls_sol, key=key)
        return new_cs, stats
