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


def _irfft_basis(T: int, beta: float):
    """Scaled inverse-real-DFT basis matrices (numpy, trace-time const).

    Returns ``(cosM, sinM)`` of shape (T, nf) such that for a half
    spectrum ``re + i*im`` the signal ``x = cosM @ re - sinM @ im``
    equals ``irfft((re + i*im) * scale, n=T, axis=0)`` with the 1/f^beta
    amplitude ``scale`` folded in.  The horizon T is ~100, so frequency
    shaping as a (T, nf) matmul is both backend-independent (the axon
    TPU runtime has no FFT op — measured round 5) and MXU-friendly;
    an FFT would win only at T in the thousands.
    """
    import numpy as np

    nf = T // 2 + 1
    freqs = np.fft.rfftfreq(T, d=1.0)
    scale = np.empty(nf)
    scale[1:] = freqs[1:] ** (-beta / 2.0)
    # match white-noise DC handling: keep DC at the f_min scale
    scale[0] = freqs[1] ** (-beta / 2.0)
    # inverse-DFT coefficients: interior bins count twice (conjugate
    # pair), DC once, Nyquist (T even) once
    coef = np.full(nf, 2.0)
    coef[0] = 1.0
    if T % 2 == 0:
        coef[-1] = 1.0
    t = np.arange(T)[:, None]
    ang = 2.0 * np.pi * t * freqs[None, :]
    w = (coef * scale / T)[None, :]
    return ((np.cos(ang) * w).astype(np.float32),
            (np.sin(ang) * w).astype(np.float32))


def colored_noise(key: jax.Array, shape: Tuple[int, int, int],
                  beta: float = 1.0) -> jnp.ndarray:
    """1/f^beta colored noise along the horizon axis, unit variance.

    Frequency-domain shaping: white half-spectrum scaled by f^{-beta/2},
    inverse real DFT over T (as an MXU matmul against a precomputed
    (T, nf) basis — see :func:`_irfft_basis`).  beta=0 -> white; beta=1
    pink; beta=2 red (random-walk-like, smooth perturbations).
    """
    T, K, C = shape
    nf = T // 2 + 1
    key_r, key_i = jax.random.split(key)
    cosM, sinM = _irfft_basis(T, beta)
    re = jax.random.normal(key_r, (nf, K * C), dtype=jnp.float32)
    im = jax.random.normal(key_i, (nf, K * C), dtype=jnp.float32)
    x = (jnp.asarray(cosM) @ re - jnp.asarray(sinM) @ im).reshape(T, K, C)
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
