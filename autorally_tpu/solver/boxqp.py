"""Projected-Newton box-constrained QP in JAX.

Port of the reference ``BoxQP`` (``autorally_control/include/
autorally_control/ddp/boxqp.h``, the Tassa-style projected-Newton solver
DDP instantiates for box-constrained control steps).  Solves::

    min_x 0.5 x'H x + g'x    s.t.  lower <= x <= upper

with an active-set projected-Newton iteration: clamp, identify the
clamped set from the gradient sign, Newton-step the free block, and
projected line search.  All control flow is ``lax.while_loop`` so the
solver jits and vmaps (e.g. one QP per timestep in a constrained DDP
backward pass).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class BoxQPResult(NamedTuple):
    x: jnp.ndarray             # solution
    value: jnp.ndarray         # objective at solution
    free: jnp.ndarray          # free-set mask (bool)
    iterations: jnp.ndarray
    converged: jnp.ndarray


def boxqp(H: jnp.ndarray, g: jnp.ndarray, lower: jnp.ndarray,
          upper: jnp.ndarray, x0=None, max_iter: int = 100,
          tol: float = 1e-8, min_step: float = 1e-10) -> BoxQPResult:
    """Solve the box QP.  ``H`` must be positive definite on free blocks."""
    n = g.shape[0]
    x_init = jnp.clip(jnp.zeros(n) if x0 is None else x0, lower, upper)

    def objective(x):
        return 0.5 * x @ H @ x + g @ x

    def cond(state):
        x, it, done = state
        return (~done) & (it < max_iter)

    def body(state):
        x, it, _ = state
        grad = g + H @ x
        at_lo = (x <= lower + 1e-12) & (grad > 0)
        at_hi = (x >= upper - 1e-12) & (grad < 0)
        clamped = at_lo | at_hi
        free = ~clamped

        # converged if free gradient is tiny or everything is clamped
        gnorm = jnp.linalg.norm(jnp.where(free, grad, 0.0))
        all_clamped = ~jnp.any(free)

        # Newton step on the free block: solve (H_ff) dx_f = -grad_f.
        # Masked formulation: rows/cols of clamped vars replaced by
        # identity so one dense solve handles any active set.
        fmask = free.astype(H.dtype)
        H_mod = (H * fmask[:, None] * fmask[None, :]
                 + jnp.diag(1.0 - fmask))
        rhs = -jnp.where(free, grad, 0.0)
        dx = jnp.linalg.solve(H_mod, rhs)
        dx = jnp.where(free, dx, 0.0)

        # projected backtracking line search (Armijo)
        f0 = objective(x)
        expected = grad @ dx

        def ls_cond(ls):
            alpha, accepted = ls
            return (~accepted) & (alpha > min_step)

        def ls_body(ls):
            alpha, _ = ls
            x_new = jnp.clip(x + alpha * dx, lower, upper)
            improve = objective(x_new) - f0
            ok = improve <= 0.1 * alpha * expected
            return (jnp.where(ok, alpha, alpha * 0.5), ok)

        alpha, accepted = lax.while_loop(
            ls_cond, ls_body, (jnp.asarray(1.0, H.dtype), jnp.bool_(False)))
        x_new = jnp.clip(x + alpha * dx, lower, upper)
        x_new = jnp.where(accepted, x_new, x)

        done = all_clamped | (gnorm < tol) | (~accepted)
        return (jnp.where(done, x, x_new), it + 1, done)

    x, it, done = lax.while_loop(cond, body, (x_init, jnp.int32(0),
                                              jnp.bool_(False)))
    grad = g + H @ x
    at_lo = (x <= lower + 1e-12) & (grad > 0)
    at_hi = (x >= upper - 1e-12) & (grad < 0)
    free = ~(at_lo | at_hi)
    gnorm = jnp.linalg.norm(jnp.where(free, grad, 0.0))
    return BoxQPResult(x=x, value=objective(x), free=free, iterations=it,
                       converged=(gnorm < 1e-6) | (~jnp.any(free)))
