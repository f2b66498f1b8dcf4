"""Dynamic obstacle costs — implementing the reference's empty stubs.

The reference declares obstacle support but never implemented it
(``MPPICosts::updateObstacles`` and ``updateCostmap`` are empty,
``costs.cu:296-299``; the loop plumbs the messages anyway,
``run_control_loop.cuh:188-196``).  Here obstacles are first-class: a
fixed-capacity array of circles (x, y, radius) — a traced pytree, so
obstacle updates are pytree swaps at pose rate with no recompilation
(the moving-obstacle case the reference's TODO dreams of).

:class:`ObstacleCost` extends :class:`MPPICost` by adding, per
rollout-step, a repulsive penalty inside an inflation band around each
obstacle and a crash latch on penetration — composed into the track term
so every solver path picks it up: the scan path and chain+epilogue path
dispatch through ``track_cost_c``; the fully-fused Pallas kernels
(exact, neural-field, and kernel-RNG) evaluate the same circle terms
in-kernel from the SMEM scalar vector (``rollout_kernel._obstacle_terms``,
parity-tested against this class).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from autorally_tpu.config import CostParams
from autorally_tpu.costs.mppi_cost import MPPICost


def make_obstacles(circles, capacity: int = 16) -> jnp.ndarray:
    """(N, 3) [x, y, radius] -> padded (capacity, 3) array; unused slots
    get radius -1 (inactive).  Fixed capacity keeps shapes static so
    obstacle count changes never recompile."""
    import numpy as np

    out = np.full((capacity, 3), -1.0, dtype=np.float32)
    circles = np.asarray(circles, dtype=np.float32).reshape(-1, 3)
    if len(circles) > capacity:
        raise ValueError(f"{len(circles)} obstacles > capacity {capacity}")
    out[: len(circles)] = circles
    return jnp.asarray(out)


class ObstacleCost(MPPICost):
    """MPPICost + circular obstacles.

    ``obstacles``: (N, 3) padded array (see :func:`make_obstacles`).  The
    construction-time array is baked into the jitted solve as a constant;
    for LIVE obstacle motion pass the current array per replan through
    ``CostParams(obstacles=...)`` — a traced pytree leaf, so position
    updates at pose rate never recompile (same capacity ⇒ same trace).
    ``obstacle_coeff``: penalty scale inside the inflation band.
    ``inflation``: band width (m) beyond the radius where cost ramps.
    """

    def __init__(self, obstacles: jnp.ndarray, obstacle_coeff: float = 100.0,
                 inflation: float = 1.0, l1_cost: bool = False):
        super().__init__(l1_cost)
        self.obstacles = jnp.asarray(obstacles, dtype=jnp.float32)
        self.obstacle_coeff = float(obstacle_coeff)
        self.inflation = float(inflation)

    def with_obstacles(self, circles, capacity: int = None) -> "ObstacleCost":
        cap = capacity or self.obstacles.shape[0]
        return ObstacleCost(make_obstacles(circles, cap),
                            self.obstacle_coeff, self.inflation,
                            self.l1_cost)

    def obstacle_cost_c(self, p: CostParams, x, y,
                        crash) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Penalty + crash latch against all obstacle circles.

        Cost ramps linearly from 0 at radius+inflation to
        ``obstacle_coeff`` at the boundary; penetration latches crash
        (same latch the track boundary uses, costs.cu:389-391).
        ``p.obstacles``, when set, overrides the construction-time array —
        the live (zero-recompile) obstacle-update path.
        """
        obstacles = (p.obstacles if p.obstacles is not None
                     else self.obstacles)
        ox = obstacles[:, 0]
        oy = obstacles[:, 1]
        orad = obstacles[:, 2]
        active = orad > 0
        # distance from each sample to each obstacle: (..., N)
        d = jnp.sqrt((x[..., None] - ox) ** 2 + (y[..., None] - oy) ** 2)
        margin = d - orad
        band = jnp.clip(1.0 - margin / self.inflation, 0.0, 1.0)
        band = jnp.where(active, band, 0.0)
        cost = self.obstacle_coeff * jnp.max(band, axis=-1)
        hit = jnp.any(active & (margin <= 0.0), axis=-1)
        crash = jnp.where(hit, 1, crash)
        return cost, crash

    def track_cost_c(self, p: CostParams, costmap, x, y, yaw, crash):
        """Track term + obstacle term (so every solver phase-2 path and
        the scan path compose it without changes)."""
        track, crash = super().track_cost_c(p, costmap, x, y, yaw, crash)
        obst, crash = self.obstacle_cost_c(p, x, y, crash)
        return track + obst, crash
