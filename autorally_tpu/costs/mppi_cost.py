"""MPPI running cost — all terms of the reference ``MPPICosts``.

Exact semantic port of ``costs.cu:301-414`` in batched JAX: every function
maps over the rollout batch (shapes ``(K,)``/``(K, d)``) so the whole cost
evaluation is fused elementwise VPU work plus one gather for the track
lookup.  Per-rollout conditional logic (crash latch, slip kill) is masking,
never branching.

Term inventory (coefficients in :class:`autorally_tpu.config.CostParams`):

- control cost   ``costs.cu:307-313``
- speed cost (L1 or L2)  ``costs.cu:315-326``
- track cost via costmap lookup at car front/back (+crash on boundary)
  ``costs.cu:359-393``
- stabilizing (slip-angle) cost with kill above ``max_slip_ang``
  ``costs.cu:337-349``
- crash cost weighted ``(1 - discount)``  ``costs.cu:396-409``
- roll-over crash latch (|roll| > 1.57)  ``costs.cu:301-305``
- NaN / overflow clamp to 1e12  ``costs.cu:405-407``
- terminal cost = 0  ``costs.cu:411-414``
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from autorally_tpu.config import CostParams
from autorally_tpu.costs.costmap import Costmap

# Distance from the GPS receiver to the front/back of the car
# (costs.cuh:271-272).
FRONT_D = 0.5
BACK_D = -0.5

COST_CLAMP = 1.0e12


class MPPICost:
    """Batched MPPI cost.  ``l1_cost`` is static (launch-time) config; all
    coefficients are traced (live-tunable without recompile)."""

    def __init__(self, l1_cost: bool = False):
        self.l1_cost = bool(l1_cost)

    # -- individual terms, component form (layout-agnostic: every argument
    # is a same-shaped array of one state/control component, so callers can
    # feed batch-last (K, S) slices or the Pallas kernel's lanes-major
    # (T, S, K) rows without transposing) ------------------------------------

    def control_cost_c(self, p: CostParams, u0, u1, du0, du1,
                       nu) -> jnp.ndarray:
        """``getControlCost`` (costs.cu:307-313).  ``u*`` are the *clamped*
        controls, ``du*`` the raw scaled noise — matching the kernel call
        site (mppi_controller.cu:164)."""
        return (p.steering_coeff * du0 * (u0 - du0) / (nu[0] * nu[0])
                + p.throttle_coeff * du1 * (u1 - du1) / (nu[1] * nu[1]))

    def speed_cost_c(self, p: CostParams, ux) -> jnp.ndarray:
        """``getSpeedCost`` (costs.cu:315-326)."""
        err = ux - p.desired_speed
        cost = jnp.abs(err) if self.l1_cost else err * err
        return p.speed_coeff * cost

    @staticmethod
    def footprint_track_cost(costmap: Costmap, x, y, yaw) -> jnp.ndarray:
        """Max of the front/back channel-0 samples at one vehicle
        footprint — the EXACT points the crash latch below tests
        (``getTrackCost``, costs.cu:359-393).  Shared by the degeneracy
        guard's position gate (runtime/controller.py, runtime/
        async_loop.py) so the gate cannot drift from the latch."""
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        pts = costmap.lookup_ch0(
            jnp.stack([x + FRONT_D * c, x + BACK_D * c]),
            jnp.stack([y + FRONT_D * s, y + BACK_D * s]))
        return jnp.max(pts)

    def track_cost_c(self, p: CostParams, costmap: Costmap, x, y, yaw,
                     crash) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``getTrackCost`` (costs.cu:359-393): costmap channel 0 sampled at
        the car's front and back; boundary crossing latches the crash flag."""
        c, sn = jnp.cos(yaw), jnp.sin(yaw)
        xf = x + FRONT_D * c
        yf = y + FRONT_D * sn
        xb = x + BACK_D * c
        yb = y + BACK_D * sn
        # One fused gather for all front+back points (channel 0 only,
        # costs.cu:379-380) through the fast row-gather layout.
        both = costmap.lookup_ch0(jnp.stack([xf, xb]), jnp.stack([yf, yb]))
        front, back = both[0], both[1]
        track = (jnp.abs(front) + jnp.abs(back)) / 2.0
        track = jnp.where(jnp.abs(track) < p.track_slop, 0.0,
                          p.track_coeff * track)
        crash = jnp.where((front >= p.boundary_threshold)
                          | (back >= p.boundary_threshold), 1, crash)
        return track, crash

    def stabilizing_cost_c(self, p: CostParams, ux, uy) -> jnp.ndarray:
        """``getStabilizingCost`` (costs.cu:337-349): slip-angle penalty and
        trajectory kill above ``max_slip_ang``."""
        active = jnp.abs(ux) > 0.001
        slip = -jnp.arctan(uy / jnp.where(active, jnp.abs(ux), 1.0))
        cost = p.slip_penalty * slip * slip
        cost = cost + jnp.where(jnp.abs(slip) > p.max_slip_ang,
                                p.crash_coeff, 0.0)
        return jnp.where(active, cost, 0.0)

    # -- batch-last convenience wrappers ((..., S) states) -------------------

    def control_cost(self, p: CostParams, u: jnp.ndarray, du: jnp.ndarray,
                     nu: jnp.ndarray) -> jnp.ndarray:
        return self.control_cost_c(p, u[..., 0], u[..., 1],
                                   du[..., 0], du[..., 1], nu)

    def speed_cost(self, p: CostParams, s: jnp.ndarray) -> jnp.ndarray:
        return self.speed_cost_c(p, s[..., 4])

    def track_cost(self, p: CostParams, costmap: Costmap, s: jnp.ndarray,
                   crash: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.track_cost_c(p, costmap, s[..., 0], s[..., 1],
                                 s[..., 2], crash)

    def stabilizing_cost(self, p: CostParams, s: jnp.ndarray) -> jnp.ndarray:
        return self.stabilizing_cost_c(p, s[..., 4], s[..., 5])

    def crash_cost(self, p: CostParams, crash: jnp.ndarray) -> jnp.ndarray:
        """``getCrashCost`` (costs.cu:328-335)."""
        return jnp.where(crash > 0, p.crash_coeff, 0.0)

    # -- composition --------------------------------------------------------

    def compute_cost(self, p: CostParams, costmap: Costmap, s: jnp.ndarray,
                     u: jnp.ndarray, du: jnp.ndarray, nu: jnp.ndarray,
                     crash: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``computeCost`` (costs.cu:396-409).  Returns (cost (K,), crash).

        Evaluation order matters: the track term latches the crash flag
        *before* the crash term reads it (C++ sequencing of the local
        initializers in computeCost).
        """
        control = self.control_cost(p, u, du, nu)
        track, crash = self.track_cost(p, costmap, s, crash)
        speed = self.speed_cost(p, s)
        crash_c = (1.0 - p.discount) * self.crash_cost(p, crash)
        stab = self.stabilizing_cost(p, s)
        cost = control + speed + crash_c + track + stab
        cost = jnp.where((cost > COST_CLAMP) | jnp.isnan(cost),
                         COST_CLAMP, cost)
        return cost, crash

    def get_crash(self, s: jnp.ndarray, crash: jnp.ndarray) -> jnp.ndarray:
        """Roll-over latch, applied after each state update
        (``getCrash``, costs.cu:301-305; rolloutKernel mppi_controller.cu:176-178)."""
        return jnp.where(jnp.abs(s[..., 3]) > 1.57, 1, crash)

    def terminal_cost(self, s: jnp.ndarray) -> jnp.ndarray:
        """``terminalCost`` (costs.cu:411-414) — identically zero."""
        return jnp.zeros(s.shape[:-1], dtype=jnp.float32)
