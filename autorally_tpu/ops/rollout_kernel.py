"""Pallas rollout kernel: the fused MPPI dynamics chain.

TPU-native replacement for the core of ``rolloutKernel``
(``mppi_controller.cu:72-184``).  The reference CUDA kernel assigns one
rollout per thread with neuron-level parallelism and shared-memory
activations; the TPU kernel instead keeps **K on the vector lanes**: the
state is an ``(8, K)`` VMEM-resident array, each MLP layer is one
``(out, in) @ (in, K)`` MXU matmul over the whole rollout batch, and the
entire T-step horizon runs inside a single kernel with zero HBM traffic
for intermediates — weights, state, and activations stay in VMEM across
all timesteps (the fix for SURVEY.md §7 hard-part (b)).

Cost evaluation is deliberately NOT fused (unlike the CUDA kernel): the
track-cost costmap gather has no efficient in-kernel form on TPU (Mosaic
supports lane-wise gathers only), so the kernel emits the state and
control trajectories and the batched cost pass in ``MPPISolver``
consumes them.  The per-step semantics here are bit-matched to the scan
path (same noise protocol, clamp, Euler order), which the parity tests
check in interpreter mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# state rows are padded 7 -> 8 sublanes
SPAD = 8
LANE = 128


def pallas_supported(K: int) -> bool:
    """The kernel requires the rollout batch to fill whole lane groups."""
    try:
        return (K % LANE == 0
                and jax.default_backend() == "tpu")
    except Exception:
        return False


def _rollout_kernel(n_layers: int, T: int, negate_yaw_der: bool, dt: float,
                    scalars_ref, s0_ref, U_ref, eps_ref, *refs):
    """Kernel body.

    refs layout: [W_0, b_0, ..., W_{L-1}, b_{L-1}, states_out, useq_out,
                  s_scratch]

    - ``scalars_ref`` (SMEM, (9,)): [nu0, nu1, lo0, hi0, lo1, hi1,
      opt_delay, pure_thresh_minus_koffset, k0_flag] (see caller).
    - ``s0_ref``   (SPAD, K): initial state rows (padded)
    - ``U_ref``    (T, C): nominal controls (VMEM; rows read per step)
    - ``eps_ref``  (T, C, K): N(0,1) draws
    - ``W_i``      (out, in), ``b_i`` (out, 1): MLP params
    - ``states_out`` (SPAD, T, K): component planes — states_out[i, t] is
      state component i after step t.  Component-major so the downstream
      cost pass slices contiguous (T, K) planes with zero relayout.
    - ``useq_out``   (C, T, K): pre-clamp perturbed controls, same idea
    """
    weights = refs[:2 * n_layers]
    states_out = refs[2 * n_layers]
    useq_out = refs[2 * n_layers + 1]
    s_ref = refs[2 * n_layers + 2]

    K = s0_ref.shape[-1]
    nu0 = scalars_ref[0]
    nu1 = scalars_ref[1]
    lo0, hi0 = scalars_ref[2], scalars_ref[3]
    lo1, hi1 = scalars_ref[4], scalars_ref[5]
    opt_delay = scalars_ref[6]
    pure_thresh = scalars_ref[7]   # pure_noise_frac*K_total - k_offset
    k0_flag = scalars_ref[8]       # 1.0 if this shard owns global rollout 0

    s_ref[:, :] = s0_ref[:, :]

    k_idx = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1).astype(jnp.float32)
    zero_rollout = (k_idx == 0.0) & (k0_flag > 0.5)
    pure_noise = k_idx >= pure_thresh

    def step(t, _):
        frozen = zero_rollout | (t.astype(jnp.float32) < opt_delay)

        eps_t = eps_ref[t]                       # (C, K)
        du0 = eps_t[0:1, :] * nu0                # (1, K)
        du1 = eps_t[1:2, :] * nu1
        U_t0 = U_ref[t, 0]
        U_t1 = U_ref[t, 1]
        u0 = jnp.where(frozen, U_t0,
                       jnp.where(pure_noise, du0, U_t0 + du0))
        u1 = jnp.where(frozen, U_t1,
                       jnp.where(pure_noise, du1, U_t1 + du1))
        useq_out[0, t, :] = u0[0]                # pre-clamp (cu:153)
        useq_out[1, t, :] = u1[0]
        u0 = jnp.clip(u0, lo0, hi0)
        u1 = jnp.clip(u1, lo1, hi1)

        s = s_ref[:, :]                          # (SPAD, K)
        yaw = s[2:3, :]
        ux = s[4:5, :]
        uy = s[5:6, :]
        yd = s[6:7, :]
        cy = jnp.cos(yaw)
        sy = jnp.sin(yaw)
        dx = cy * ux - sy * uy
        dy = sy * ux + cy * uy
        dyaw = -yd if negate_yaw_der else yd

        # MLP forward: acts (6, K) -> ... -> (4, K), each layer one MXU
        # matmul (neural_net_model.cu:358-410, batched over lanes).
        acts = jnp.concatenate([s[3:7, :], u0, u1], axis=0)
        for i in range(n_layers):
            W = weights[2 * i][:, :]             # (out, in)
            b = weights[2 * i + 1][:, :]         # (out, 1)
            acts = jax.lax.dot_general(
                W, acts, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b
            if i < n_layers - 1:
                acts = jnp.tanh(acts)

        deriv = jnp.concatenate(
            [dx, dy, dyaw, acts, jnp.zeros((SPAD - 7, K), jnp.float32)],
            axis=0)
        s_new = s + deriv * dt
        s_ref[:, :] = s_new
        for i in range(SPAD):
            states_out[i, t, :] = s_new[i]
        return 0

    jax.lax.fori_loop(0, T, step, 0)


@functools.partial(jax.jit, static_argnames=("layers", "T", "K",
                                             "negate_yaw_der", "dt",
                                             "interpret"))
def _dynamics_chain(layers: Tuple[int, ...], T: int, K: int,
                    negate_yaw_der: bool, dt: float, interpret: bool,
                    scalars, s0, U, eps, *wb):
    n_layers = len(layers) - 1
    C = 2
    kernel = functools.partial(_rollout_kernel, n_layers, T,
                               negate_yaw_der, dt)
    states, useq = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((SPAD, T, K), jnp.float32),
            jax.ShapeDtypeStruct((C, T, K), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + 2 * n_layers),
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((SPAD, K), jnp.float32)],
        interpret=interpret,
    )(scalars, s0, U, eps, *wb)
    return states, useq


def dynamics_chain_pallas(model, model_params, cfg, state, U, eps,
                          k_offset=0, interpret=False):
    """Run the fused rollout dynamics chain.

    Args mirror ``MPPISolver.rollout_costs`` phase 1: ``state`` (S,),
    ``U`` (T, C), ``eps`` (T, K, C) standard-normal; ``k_offset`` may be a
    traced value (the sharded solver passes ``axis_index * K_local``).
    Returns component-major ``(states (SPAD, T, K), u_seq (C, T, K))``:
    ``states[i, t]`` is state component i after t+1 integration steps.
    """
    T, K, C = eps.shape
    S = model.STATE_DIM
    rngs = model_params["control_rngs"]
    nu = jnp.asarray(cfg.exploration_std, dtype=jnp.float32)
    k_offset = jnp.asarray(k_offset, dtype=jnp.float32)
    scalars = jnp.concatenate([
        nu,
        jnp.stack([rngs[0, 0], rngs[0, 1], rngs[1, 0], rngs[1, 1]]),
        jnp.asarray(cfg.optimization_stride, dtype=jnp.float32)[None],
        (cfg.pure_noise_frac * cfg.num_rollouts - k_offset)[None],
        jnp.where(k_offset == 0, 1.0, 0.0)[None],
    ]).astype(jnp.float32)

    s0 = jnp.zeros((SPAD, K), jnp.float32) + jnp.pad(
        state.astype(jnp.float32), (0, SPAD - S))[:, None]
    eps_t = jnp.transpose(eps, (0, 2, 1))        # (T, C, K)

    wb = []
    for W, b in zip(model_params["weights"], model_params["biases"]):
        wb.append(jnp.transpose(W))              # (out, in)
        wb.append(b[:, None])                    # (out, 1)

    # Component-major outputs — K stays on the vector lanes and each state
    # component is a contiguous (T, K) plane for the cost pass.
    return _dynamics_chain(
        tuple(model.layers), T, K, model.negate_yaw_der, float(model.dt),
        interpret, scalars, s0, U.astype(jnp.float32), eps_t, *wb)


def nominal_trajectory_pallas(model, model_params, cfg, state, U,
                              interpret=False):
    """Nominal-trajectory re-rollout through the fused kernel.

    ``computeNominalTraj`` (mppi_controller.cu:501-519) is a T-step
    single-state chain; as a ``lax.scan`` it costs ~0.4 ms of pure loop
    latency.  Running it through the rollout kernel with one lane group
    (K=128 identical noise-free rollouts, lane 0 read back) cuts it to
    kernel latency.  Returns (state_solution (T, S), control_solution
    (T, C)) with the reference's record-before-update convention.
    """
    T, C = U.shape
    S = model.STATE_DIM
    eps = jnp.zeros((T, LANE, C), dtype=jnp.float32)
    states, _ = dynamics_chain_pallas(model, model_params, cfg, state, U,
                                      eps, interpret=interpret)
    # states[i, t, 0] = component i after t+1 steps; prepend the start state.
    traj = states[:S, :, 0].T                    # (T, S): s_1 .. s_T
    states_sol = jnp.concatenate(
        [state[None, :].astype(jnp.float32), traj[:-1]], axis=0)
    rngs = jnp.reshape(model_params["control_rngs"], (-1, 2))[-C:]
    controls_sol = jnp.clip(U, rngs[:, 0], rngs[:, 1])
    return states_sol, controls_sol
