"""ESS-targeted softmax-temperature tuning (beyond-reference extension).

MPPI's importance-sampled update degrades at both temperature extremes:
too-high ``gamma`` collapses the effective sample size (a handful of
rollouts carry all the weight — noisy, twitchy controls), too-low
``gamma`` flattens the weights toward a plain average (ignores cost
structure).  The reference pins gamma at launch time
(``path_integral_nn.launch``: 0.15) and never adapts; practitioners
re-tune it by hand per track/speed.

Because this framework's solve paths read the temperature through the
*traced* ``CostParams.gamma`` override (``config.effective_gamma``),
adapting it at pose rate costs nothing — no recompiles, no extra device
work (the softmax already consumes a scalar).  :class:`EssTuner` is a
host-side multiplicative controller on the measured effective sample
size: after each solve,

    gamma <- gamma * (ess / ess_target)^alpha,   clamped to
    [base/headroom, base*headroom]

so ESS below target lowers the temperature (flattens weights, raises
ESS) and vice versa; in log-space this is a proportional controller on
``log(ess)``, and the multiplicative step makes it scale-free.  Feed the
returned gamma back through the hot-update path
(``plant.push_cost_params`` or ``tube.update_cost_params``) — the same
channel the reference's dynamic_reconfigure uses for cost coefficients.

Usage::

    tuner = EssTuner(cfg, target_frac=0.25)
    ...each tick, after reading SolveStats...
    cp = cp.replace(gamma=tuner.update(float(stats.ess)))
    plant.push_cost_params(cp)
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def gamma_step_traced(gamma, ess, target, alpha, lo, hi):
    """One multiplicative ESS->gamma step as traced jnp ops — the SAME
    law as :meth:`EssTuner.update`, for use inside jitted programs (the
    episode runner's on-device adaptation).  The host tuner deliberately
    does NOT call this: a jnp op per control tick would dispatch a device
    program (25 ms tunnel sync on the dev rig); lockstep between the two
    implementations is enforced by
    ``tests/test_ess_tuner.py::test_traced_law_matches_host_tuner``.
    A non-finite ESS sample or result leaves gamma unchanged (an inf
    would otherwise launder into the hi clamp rather than be ignored
    the way the host tuner ignores it)."""
    step = (jnp.maximum(ess, 1.0) / target) ** alpha
    g = jnp.clip(gamma * step, lo, hi)
    return jnp.where(jnp.isfinite(ess) & jnp.isfinite(g), g, gamma)


class EssTuner:
    """Multiplicative ESS -> temperature controller (host-side scalar)."""

    def __init__(self, cfg, target_frac: float = 0.25, alpha: float = 0.25,
                 headroom: float = 8.0):
        """``target_frac``: desired ESS as a fraction of K.  ``alpha``:
        adaptation gain per solve (0.25 converges in a few ticks without
        oscillating through the plant's closed loop).  ``headroom``:
        multiplicative clamp around the configured base gamma — the tuner
        trims the temperature, it must not be able to turn the solver
        into argmin-following (gamma -> inf) or plain averaging
        (gamma -> 0) under a transient ESS excursion."""
        if not (0.0 < target_frac <= 1.0):
            raise ValueError(f"target_frac in (0, 1]: {target_frac}")
        self.base = float(cfg.gamma)
        self.target = float(target_frac) * float(cfg.num_rollouts)
        self.alpha = float(alpha)
        self.lo = self.base / float(headroom)
        self.hi = self.base * float(headroom)
        self.gamma = self.base

    def update(self, ess: float) -> float:
        """One adaptation step from the latest solve's measured ESS;
        returns the gamma to place in ``CostParams.gamma``.  A non-finite
        ESS sample (a NaN solve is a transient the plant layer already
        survives, ``autorally_plant.cpp:353-375``) leaves gamma unchanged
        — it must not latch the tuner to NaN."""
        ess = float(ess)
        if not math.isfinite(ess):
            return self.gamma
        ratio = max(ess, 1.0) / self.target
        self.gamma = min(max(self.gamma * ratio ** self.alpha, self.lo),
                         self.hi)
        return self.gamma

    def seed(self, cost_params):
        """Return ``cost_params`` with gamma pre-set to the tuner's
        current value.  Call BEFORE the first solve/warmup dispatch: the
        None->scalar flip changes the CostParams pytree STRUCTURE, so an
        unseeded first :meth:`update` would force one full recompile
        mid-drive (minutes-scale for the fused tube program)."""
        return cost_params.replace(gamma=jnp.float32(self.gamma))

    def reset(self) -> None:
        self.gamma = self.base

    # -- loop integration --------------------------------------------------

    def attach(self, *controllers):
        """``on_tick`` hook for :func:`~autorally_tpu.runtime.control_loop.
        run_control_loop`: read the winning controller's measured ESS,
        adapt, and apply the new gamma to every controller (both tube
        halves must solve at the same temperature or the arbitration's
        trajectory-cost comparison would be apples-to-oranges).

        Attaching also :meth:`seed`\\ s any controller whose cost params
        still carry ``gamma=None`` — the first ``update`` would otherwise
        flip the CostParams pytree structure (None -> scalar) and force a
        full recompile of the jitted solve mid-drive (round-4 advisor
        finding)."""
        for c in controllers:
            if c.cost_params.gamma is None:
                c.update_cost_params(self.seed(c.cost_params))

        def on_tick(num_iter, chosen, used, state):
            if chosen.stats is None:
                return
            g = jnp.float32(self.update(float(chosen.stats.ess)))
            for c in controllers:
                c.update_cost_params(c.cost_params.replace(gamma=g))

        return on_tick

    def attach_async(self, tube):
        """``on_tick`` hook for :func:`~autorally_tpu.runtime.async_loop.
        run_control_loop_async`: the harvested ``TubeTickOutput.ess`` is
        ``depth`` ticks stale, which this slow multiplicative controller
        tolerates by design; the new gamma rides the next dispatch's
        traced cost params (zero recompiles).  Seeds an unseeded tube at
        attach time (same recompile guard as :meth:`attach`)."""
        if tube.cost_params.gamma is None:
            tube.update_cost_params(self.seed(tube.cost_params))

        def on_tick(num_iter, used, state, out, harvest_ms, age_s):
            g = jnp.float32(self.update(float(out.ess)))
            tube.update_cost_params(tube.cost_params.replace(gamma=g))

        return on_tick
