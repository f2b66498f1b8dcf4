"""Costmap debug view — the live cost window around the car.

Port of ``debugCostKernel`` (``debug_kernels.cuh:39-88``) / the host wrapper
``MPPICosts::getDebugDisplay`` (``costs.cu:271-284``): renders a
(width_m x height_m) window of the track cost centered on the car, with a
heading arrow drawn in vehicle frame (outlined wedge pointing forward).
One jitted vectorized evaluation replaces the CUDA kernel; works with both
the exact :class:`Costmap` and the :class:`NeuralCostmap` field.

Returns a (height_m*ppm, width_m*ppm) float image, row 0 at the top
(y decreasing downward), matching the reference's OpenCV display layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("width_m", "height_m", "ppm"))
def debug_cost_view(costmap, x: float, y: float, heading: float,
                    width_m: int = 10, height_m: int = 10,
                    ppm: int = 50) -> jnp.ndarray:
    """Render the cost window (getDebugDisplay default 10x10 m @ 50 ppm)."""
    W = width_m * ppm
    H = height_m * ppm
    xi = jnp.arange(W, dtype=jnp.float32)
    yi = jnp.arange(H, dtype=jnp.float32)
    XX, YY = jnp.meshgrid(xi, yi)
    # pixel -> world (debug_kernels.cuh:46-52)
    x_pos = XX / ppm - width_m / 2.0 + x
    y_pos = YY / ppm - height_m / 2.0 + y

    cost = costmap.lookup_ch0(x_pos, y_pos)

    # heading arrow in vehicle frame (debug_kernels.cuh:62-71)
    ch = jnp.cos(heading)
    sh = jnp.sin(heading)
    x_t = ch * (x_pos - x) + sh * (y_pos - y)
    y_t = -sh * (x_pos - x) + ch * (y_pos - y)
    dist = 0.25 * jnp.abs(x_t) + jnp.abs(y_t)
    in_wedge = (dist < 0.15) & (x_t > 0)
    inner = (dist < 0.1) & (x_t > 0.05)
    cost = jnp.where(in_wedge, jnp.where(inner, 1.0, 0.0), cost)

    # flip vertically: row 0 = max y (debug_kernels.cuh:73)
    return cost[::-1]
