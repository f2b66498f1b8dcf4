"""Noise sampling strategies for MPPI exploration.

The reference samples i.i.d. Gaussian perturbations (cuRAND,
``mppi_controller.cu:612``).  Research descendants of AutoRally MPPI
improve sample efficiency with temporally-correlated exploration; this
module provides those as drop-in noise generators, all shaped
``(T, K, C)`` to feed ``MPPISolver.iterate``:

- :func:`gaussian_noise` — the reference protocol (white).
- :func:`colored_noise` — power-law spectrum 1/f^beta noise via
  frequency-domain shaping (pink/red noise explores smoother control
  perturbations; beta=0 reduces to white).  Normalized to unit variance
  per sample so the ``nu`` scaling semantics are unchanged.
- :func:`ou_noise` — Ornstein-Uhlenbeck (AR(1)) temporally-correlated
  noise with per-step stationarity.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gaussian_noise(key: jax.Array, shape: Tuple[int, int, int]) -> jnp.ndarray:
    """White Gaussian N(0,1) draws (the reference protocol)."""
    return jax.random.normal(key, shape, dtype=jnp.float32)


def colored_noise(key: jax.Array, shape: Tuple[int, int, int],
                  beta: float = 1.0) -> jnp.ndarray:
    """1/f^beta colored noise along the horizon axis, unit variance.

    Frequency-domain shaping: white spectrum scaled by f^{-beta/2}, then
    inverse real FFT over T.  beta=0 -> white; beta=1 pink; beta=2 red
    (random-walk-like, smooth perturbations).
    """
    T, K, C = shape
    nf = T // 2 + 1
    key_r, key_i = jax.random.split(key)
    freqs = jnp.fft.rfftfreq(T, d=1.0)
    scale = jnp.where(freqs > 0, freqs ** (-beta / 2.0), 0.0)
    # match white-noise DC handling: keep DC at the f_min scale
    f_min = freqs[1]
    scale = scale.at[0].set(f_min ** (-beta / 2.0))

    re = jax.random.normal(key_r, (nf, K, C), dtype=jnp.float32)
    im = jax.random.normal(key_i, (nf, K, C), dtype=jnp.float32)
    spec = (re + 1j * im) * scale[:, None, None]
    x = jnp.fft.irfft(spec, n=T, axis=0).astype(jnp.float32)
    # unit per-sample second moment (rms, not mean-removed std: the DC
    # offset is part of the exploration signal)
    rms = jnp.sqrt(jnp.mean(x * x, axis=0, keepdims=True))
    return x / jnp.maximum(rms, 1e-8)


def ou_noise(key: jax.Array, shape: Tuple[int, int, int],
             theta: float = 0.15) -> jnp.ndarray:
    """Ornstein-Uhlenbeck (AR(1)) noise, stationary unit variance.

    x_{t+1} = a x_t + sqrt(1-a^2) w_t with a = 1 - theta, so every
    timestep is marginally N(0,1) while consecutive steps correlate.
    """
    T, K, C = shape
    a = 1.0 - theta
    b = jnp.sqrt(1.0 - a * a)
    w = jax.random.normal(key, shape, dtype=jnp.float32)

    def step(x, w_t):
        x = a * x + b * w_t
        return x, x

    _, xs = jax.lax.scan(step, w[0], w[1:])
    return jnp.concatenate([w[:1], xs], axis=0)


SAMPLERS = {
    "gaussian": lambda key, shape, p: gaussian_noise(key, shape),
    "colored": lambda key, shape, p: colored_noise(key, shape, p),
    "ou": lambda key, shape, p: ou_noise(key, shape, p),
}


def make_sampler(kind: str = "gaussian", param: float = 1.0):
    """Return a (key, shape) -> (T, K, C) noise fn for the solver."""
    if kind not in SAMPLERS:
        raise ValueError(f"unknown sampler {kind!r}; options {list(SAMPLERS)}")
    fn = SAMPLERS[kind]
    return lambda key, shape: fn(key, shape, param)
