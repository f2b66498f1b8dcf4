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

Three kernel variants:

- ``dynamics_chain_pallas`` — dynamics only; the kernel emits
  state/control trajectories and the batched cost pass in ``MPPISolver``
  consumes them (one big XLA row-gather for the track cost).  The
  fallback for cost subclasses and oversized maps.
- ``fused_rollout_cost_pallas`` — dynamics AND cost in one kernel, for
  the *neural costmap* (``costs/neural_costmap.py``).  A neural track
  field has no gather — it is matmuls — so the entire reference
  ``rolloutKernel`` (``mppi_controller.cu:72-184``: perturb, clamp, cost
  with crash latch, dynamics, Euler) fuses into a single Pallas program
  whose intermediates never touch HBM.  At large K this removes both the
  gather bottleneck and the (T, K, S) state materialization.
- ``fused_exact_rollout_cost_pallas`` — dynamics AND cost with the
  *exact* reference costmap, VMEM-resident, sampled by an in-kernel
  windowed gather with a proven-exact fast path and a full-map fallback
  sweep (see the section comment below).  Reference texture semantics at
  large K without XLA's per-lookup gather cost.

The per-step semantics are bit-matched to the scan path (same noise
protocol, clamp, Euler order), which the parity tests check.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autorally_tpu.config import effective_gamma

# state rows are padded 7 -> 8 sublanes
SPAD = 8
LANE = 128


def _atan(z: jnp.ndarray) -> jnp.ndarray:
    """Polynomial arctangent (Mosaic has no atan primitive).

    Minimax odd polynomial on [0, 1] + the reflection
    ``atan(z) = pi/2 - atan(1/z)`` for |z| > 1; max error ~1e-7, well
    inside float32 cost tolerance for the slip-angle term
    (costs.cu:337-349)."""
    az = jnp.abs(z)
    inv = az > 1.0
    x = jnp.where(inv, 1.0 / jnp.maximum(az, 1e-30), az)
    x2 = x * x
    p = jnp.float32(-0.0040540580)
    for c in (0.0218612288, -0.0559098861, 0.0964200441, -0.1390853351,
              0.1994653599, -0.3332985605, 0.9999993329):
        p = p * x2 + jnp.float32(c)
    p = p * x
    p = jnp.where(inv, jnp.float32(jnp.pi / 2) - p, p)
    return jnp.where(z < 0, -p, p)


def _bf_deriv(theta_ref, mm_prec, d4, u0, u1):
    """In-kernel generalized-linear dynamics: ``theta_T @ phi(s, u)``.

    The lane-batched form of ``generalized_linear.cu:226-245`` — the
    reference loops the 25 basis functions over ``threadIdx.y`` with
    ``atomicAdd`` accumulation; here the basis vector is materialized as
    (25, K) rows and applied with one (4, 25) @ (25, K) MXU matmul.
    Formulas port ``car_bfs.cuh:44-121`` exactly (see
    ``models/basis_function.py::car_basis_functions``, the scan-path
    twin); ``tan`` is computed as sin/cos and ``atan`` by the minimax
    polynomial above (Mosaic has neither primitive), which bounds the
    Pallas-vs-scan drift at ~1e-7 in the slip angle.

    ``d4``: (4, K) dynamics-state block [roll, u_x, u_y, yaw_der];
    ``u0``/``u1``: (1, K) clamped steering/throttle.  Returns (4, K).
    """
    roll = d4[0:1, :]
    ux = d4[1:2, :]
    uy = d4[2:3, :]
    yd = d4[3:4, :]
    moving = ux > 0.1
    safe_ux = jnp.where(moving, ux, 1.0)
    front = _atan(uy / safe_ux + 0.45 * yd / safe_ux) - u0
    arg = jnp.where(moving, front, -u0)
    tan_front = jnp.sin(arg) / jnp.cos(arg)
    abs_tf = jnp.abs(tan_front)
    sin_st = jnp.sin(u0)
    r13 = uy / safe_ux - 0.35 * yd / safe_ux
    rows = [
        u1,                                                    # 0
        ux / 10.0,                                             # 1
        sin_st * tan_front / 1200.0,                           # 2
        sin_st * tan_front * abs_tf / 1440000.0,               # 3
        sin_st * tan_front ** 3 / 1728000000.0,                # 4
        yd * uy / 25.0,                                        # 5
        yd / 10.0,                                             # 6
        uy / 10.0,                                             # 7
        sin_st,                                                # 8
        jnp.where(moving, uy / safe_ux / 40.0, 0.0),           # 9
        tan_front / 1400.0,                                    # 10
        tan_front * abs_tf / 1960000.0,                        # 11
        tan_front ** 3 / 2744000000.0,                         # 12
        jnp.where(moving, r13 / 40.0, 0.0),                    # 13
        jnp.where(moving, r13 * jnp.abs(r13) / 1600.0, 0.0),   # 14
        jnp.where(moving, r13 ** 3 / 64000.0, 0.0),            # 15
        yd * ux / 50.0,                                        # 16
        roll,                                                  # 17
        roll * yd,                                             # 18
        roll * ux / 3.0,                                       # 19
        roll * ux * yd / 5.0,                                  # 20
        ux ** 2 / 100.0,                                       # 21
        ux ** 3 / 1000.0,                                      # 22
        u1 ** 2,                                               # 23
        u1 ** 3,                                               # 24
    ]
    phi = jnp.concatenate(rows, axis=0)                        # (25, K)
    th = theta_ref[:, :]                                       # (4, 25)
    return jax.lax.dot_general(th, phi, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=mm_prec)


def _n_weight_refs(kind: str, spec: tuple) -> int:
    """Number of VMEM refs ``Dynamics.kernel_weights`` contributes."""
    return 2 * (len(spec) - 1) if kind == "mlp" else 1


def _mlp_deriv_concat(wrefs, mm_prec, d4, u0, u1):
    """Concat-input MLP forward (``neural_net_model.cu:358-410``, batched
    over lanes): acts (6, K) -> ... -> (4, K), each layer one MXU matmul.
    Shared by the chain, exact, and RNG kernels; the neural-field kernel
    keeps its split-W0 variant (no input concat)."""
    n_layers = len(wrefs) // 2
    acts = jnp.concatenate([d4, u0, u1], axis=0)
    for i in range(n_layers):
        W = wrefs[2 * i][:, :]               # (out, in)
        b = wrefs[2 * i + 1][:, :]           # (out, 1)
        acts = jax.lax.dot_general(
            W, acts, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mm_prec) + b
        if i < n_layers - 1:
            acts = jnp.tanh(acts)
    return acts


def _make_obstacle_terms(sc, n_obs: int):
    """Build the in-kernel circular-obstacle evaluator.

    Lane-batched ``ObstacleCost.obstacle_cost_c`` (costs/obstacles.py):
    linear band from 0 at radius+inflation to ``obstacle_coeff`` at the
    boundary, hit inside the radius.  Obstacle scalars ride the SMEM
    vector at [40:40+3*n_obs] as [ox..., oy..., radius...] (radius <= 0
    = inactive slot), so obstacle *moves* are traced-value updates — the
    fixed capacity ``n_obs`` is the only compile-time part.

    The circle columns are materialized ONCE as (n_obs, 1) blocks outside
    the horizon loop, so each step is one batched (n_obs, K) computation
    + a sublane max-reduce rather than n_obs separate (1, K) passes.

    Returns ``terms(x, y) -> (cost (1, K), hit (1, K))``.
    """
    coeff = sc[36]
    inflation = sc[37]
    base = 40
    col = lambda off: jnp.concatenate(
        [jnp.full((1, 1), sc[base + off + i]) for i in range(n_obs)],
        axis=0)                                           # (n_obs, 1)
    ox = col(0)
    oy = col(n_obs)
    orad = col(2 * n_obs)
    active = orad > 0.0

    def terms(x, y):
        d = jnp.sqrt((x - ox) ** 2 + (y - oy) ** 2)       # (n_obs, K)
        margin = d - orad
        band = jnp.clip(1.0 - margin / inflation, 0.0, 1.0)
        band = jnp.where(active, band, 0.0)
        cost = coeff * jnp.max(band, axis=0, keepdims=True)
        hit = jnp.max(jnp.where(active & (margin <= 0.0), 1.0, 0.0),
                      axis=0, keepdims=True)
        return cost, hit

    return terms


def _append_obstacles(sc, obstacles, obstacle_coeff: float,
                      inflation: float):
    """Extend the (40,) scalar vector with the obstacle block; returns
    (sc, n_obs).  ``obstacles``: (capacity, 3) [x, y, radius] or None."""
    if obstacles is None:
        return sc, 0
    n_obs = int(obstacles.shape[0])
    sc = jnp.concatenate([sc, jnp.zeros((3 * n_obs,), jnp.float32)])
    sc = sc.at[36].set(obstacle_coeff)
    sc = sc.at[37].set(inflation)
    sc = sc.at[40:40 + n_obs].set(obstacles[:, 0])
    sc = sc.at[40 + n_obs:40 + 2 * n_obs].set(obstacles[:, 1])
    sc = sc.at[40 + 2 * n_obs:40 + 3 * n_obs].set(obstacles[:, 2])
    return sc, n_obs


def _pack_scalars(cfg, rngs, nu, k_offset, state, transform, cost_params):
    """Build the shared (40,) SMEM scalar vector of the fused kernels
    (layout documented on ``_fused_kernel``).  ``transform`` is any
    object with ``r_c1 / r_c2 / trs`` (Costmap or NeuralCostmap).  One
    packer for all three fused callers so the layout cannot diverge."""
    sc = jnp.zeros((40,), dtype=jnp.float32)
    sc = sc.at[0:2].set(nu)
    sc = sc.at[2:6].set(jnp.stack([rngs[0, 0], rngs[0, 1],
                                   rngs[1, 0], rngs[1, 1]]))
    sc = sc.at[6].set(cfg.optimization_stride)
    sc = sc.at[7].set(cfg.pure_noise_frac * cfg.num_rollouts - k_offset)
    sc = sc.at[8].set(jnp.where(k_offset == 0, 1.0, 0.0))
    sc = sc.at[9:16].set(state.astype(jnp.float32))
    sc = sc.at[16:19].set(transform.r_c1)
    sc = sc.at[19:22].set(transform.r_c2)
    sc = sc.at[22:25].set(transform.trs)
    sc = sc.at[25].set(cost_params.desired_speed)
    sc = sc.at[26].set(cost_params.speed_coeff)
    sc = sc.at[27].set(cost_params.track_coeff)
    sc = sc.at[28].set(cost_params.max_slip_ang)
    sc = sc.at[29].set(cost_params.slip_penalty)
    sc = sc.at[30].set(cost_params.track_slop)
    sc = sc.at[31].set(cost_params.crash_coeff)
    sc = sc.at[32].set(cost_params.steering_coeff)
    sc = sc.at[33].set(cost_params.throttle_coeff)
    sc = sc.at[34].set(cost_params.boundary_threshold)
    sc = sc.at[35].set(cost_params.discount)
    return sc


def _make_field_eval(sc, wf, freqs_ref, n_field_layers: int):
    """Build the in-kernel neural track field evaluator (one shared
    definition for the eps-fed and RNG fused kernels).

    Mirrors ``NeuralCostmap.lookup_ch0`` exactly (same block feature
    order) so the same fitted weights drive both paths.  The Fourier
    features are built as full-sublane (F, L) blocks — one broadcast
    multiply + one trig op per block keeps the VPU dense (1-sublane rows
    would cost 8x).  Returns ``field_eval(x, y) -> (1, L)`` for world
    coordinate rows ``(1, L)``."""
    rc1x, rc1y, rc1w = sc[16], sc[17], sc[18]
    rc2x, rc2y, rc2w = sc[19], sc[20], sc[21]
    trsx, trsy, trsw = sc[22], sc[23], sc[24]

    def field_eval(x, y):
        u = rc1x * x + rc2x * y + trsx
        v = rc1y * x + rc2y * y + trsy
        w = rc1w * x + rc2w * y + trsw
        u = jnp.clip(u / w, 0.0, 1.0)
        v = jnp.clip(v / w, 0.0, 1.0)
        # NaN coords -> (0, 0), matching NeuralCostmap.lookup_ch0's
        # nan_to_num (and the exact kernel's map_indices): without this a
        # NaN state would yield NaN track cost here but a finite value on
        # the XLA path
        u = jnp.where(jnp.isnan(u), 0.0, u)
        v = jnp.where(jnp.isnan(v), 0.0, v)
        fcol = freqs_ref[:, :]                                # (F, 1)
        ang_u = fcol * u                                      # (F, L)
        ang_v = fcol * v
        acts = jnp.concatenate(
            [u, v, jnp.sin(ang_u), jnp.sin(ang_v),
             jnp.cos(ang_u), jnp.cos(ang_v)], axis=0)         # (2+4F, L)
        for i in range(n_field_layers):
            Wt = wf[2 * i][:, :]                              # (out, in)
            b = wf[2 * i + 1][:, :]                           # (out, 1)
            # default precision: fit error dominates eval precision (see
            # NeuralCostmap.lookup_ch0)
            acts = jax.lax.dot_general(
                Wt, acts, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b
            if i < n_field_layers - 1:
                acts = jnp.maximum(acts, 0.0)
        return acts                                           # (1, L)

    return field_eval


def _make_cost_step(sc, lookup, obstacle_terms, l1_cost: bool, K: int):
    """Build the shared per-step cost + crash-latch block of the fused
    kernels (``computeCost``, ``costs.cu:396-409``) — ONE definition so a
    semantic fix cannot silently miss a kernel.

    ``lookup(px, py) -> (1, 2K)`` samples the track surface (neural field
    or exact costmap) at the stacked front/back points.  Returns
    ``cost_step(t, x, y, cy, sy, ux, uy, u0, u1, du0, du1, running,
    crash) -> (running, crash)`` where ``running`` is the reference's
    running average (``mppi_controller.cu:162-165``; t=0 contributes 0)
    and ``crash`` the persistent boundary/obstacle latch (roll is latched
    by the caller after the Euler update)."""
    nu0, nu1 = sc[0], sc[1]
    desired_speed, speed_coeff, track_coeff = sc[25], sc[26], sc[27]
    max_slip_ang, slip_penalty, track_slop, crash_coeff = (
        sc[28], sc[29], sc[30], sc[31])
    steering_coeff, throttle_coeff = sc[32], sc[33]
    boundary_threshold, discount = sc[34], sc[35]

    def cost_step(t, x, y, cy, sy, ux, uy, u0, u1, du0, du1,
                  running, crash):
        # track: surface sampled at car front/back; both point sets
        # batched along the lane axis -> one (1, 2K) evaluation
        px = jnp.concatenate([x + 0.5 * cy, x - 0.5 * cy], axis=1)
        py = jnp.concatenate([y + 0.5 * sy, y - 0.5 * sy], axis=1)
        fb = lookup(px, py)                                   # (1, 2K)
        front = fb[:, :K]
        back = fb[:, K:]
        track = (jnp.abs(front) + jnp.abs(back)) * 0.5
        track = jnp.where(jnp.abs(track) < track_slop, 0.0,
                          track_coeff * track)
        # Boundary latch only from cost steps t >= 1 — the scan path and
        # the reference never boundary-check the initial state (cost step
        # 0 contributes nothing; getTrackCost runs inside computeCost).
        crash = jnp.maximum(crash, jnp.where(
            ((front >= boundary_threshold) | (back >= boundary_threshold))
            & (t > 0), 1.0, 0.0))
        if obstacle_terms is not None:
            ob_cost, ob_hit = obstacle_terms(x, y)
            track = track + ob_cost
            crash = jnp.maximum(crash, jnp.where(
                (ob_hit > 0.0) & (t > 0), 1.0, 0.0))

        err = ux - desired_speed
        speed = speed_coeff * (jnp.abs(err) if l1_cost else err * err)

        active = jnp.abs(ux) > 0.001
        slip = -_atan(uy / jnp.where(active, jnp.abs(ux), 1.0))
        stab = slip_penalty * slip * slip
        stab = stab + jnp.where(jnp.abs(slip) > max_slip_ang,
                                crash_coeff, 0.0)
        stab = jnp.where(active, stab, 0.0)

        control = (steering_coeff * du0 * (u0 - du0) / (nu0 * nu0)
                   + throttle_coeff * du1 * (u1 - du1) / (nu1 * nu1))
        crash_c = (1.0 - discount) * jnp.where(crash > 0.0, crash_coeff,
                                               0.0)

        c = control + speed + crash_c + track + stab
        c = jnp.where((c > 1e12) | jnp.isnan(c), 1e12, c)
        # running average (mppi_controller.cu:162-165); t=0 contributes 0
        t_f = t.astype(jnp.float32)
        running = jnp.where(
            t > 0, running + (c - running) / jnp.maximum(t_f, 1.0),
            running)
        return running, crash

    return cost_step


PRECISIONS = {"highest": jax.lax.Precision.HIGHEST,
              "high": jax.lax.Precision.HIGH,
              "default": jax.lax.Precision.DEFAULT}


def _prec(name: str):
    """Kernel-side precision: Mosaic lowers only DEFAULT (1-pass bf16)
    and HIGHEST (6-pass) dots — Precision.HIGH raises NotImplementedError
    in the TPU lowering — so ``"high"`` rounds up to HIGHEST inside
    kernels (the XLA paths still honor the real 3-pass HIGH).  Measured
    on v5e (K=65536, T=100 exact-fused): default saves ~13% per solve at
    ~3e-3 max control drift over 20 chained solves; highest is the
    parity default."""
    if name == "high":
        return jax.lax.Precision.HIGHEST
    return PRECISIONS[name]


def pallas_supported(K: int) -> bool:
    """The kernel requires the rollout batch to fill whole lane groups."""
    try:
        return (K % LANE == 0
                and jax.default_backend() == "tpu")
    except Exception:
        return False


def _rollout_kernel(kind: str, spec: tuple, T: int, negate_yaw_der: bool,
                    dt: float, mm_prec, scalars_ref, s0_ref, U_ref, eps_ref,
                    *refs):
    """Kernel body.

    refs layout: [<model weight refs per kernel_weights>, states_out,
                  useq_out, s_scratch] — for ``kind="mlp"``
    [W_0, b_0, ..., W_{L-1}, b_{L-1}], for ``kind="bf"`` [theta_T]

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
    n_w = _n_weight_refs(kind, spec)
    weights = refs[:n_w]
    states_out = refs[n_w]
    useq_out = refs[n_w + 1]
    s_ref = refs[n_w + 2]

    K = s0_ref.shape[-1]           # tile width (lanes) of this grid cell
    nu0 = scalars_ref[0]
    nu1 = scalars_ref[1]
    lo0, hi0 = scalars_ref[2], scalars_ref[3]
    lo1, hi1 = scalars_ref[4], scalars_ref[5]
    opt_delay = scalars_ref[6]
    pure_thresh = scalars_ref[7]   # pure_noise_frac*K_total - k_offset
    k0_flag = scalars_ref[8]       # 1.0 if this shard owns global rollout 0

    s_ref[:, :] = s0_ref[:, :]

    # global-within-shard rollout index: grid cells tile the K axis
    tile0 = (pl.program_id(0) * K).astype(jnp.float32)
    k_idx = tile0 + jax.lax.broadcasted_iota(
        jnp.int32, (1, K), 1).astype(jnp.float32)
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

        if kind == "bf":
            acts = _bf_deriv(weights[0], mm_prec, s[3:7, :], u0, u1)
        else:
            acts = _mlp_deriv_concat(weights, mm_prec, s[3:7, :], u0, u1)

        deriv = jnp.concatenate(
            [dx, dy, dyaw, acts, jnp.zeros((SPAD - 7, K), jnp.float32)],
            axis=0)
        s_new = s + deriv * dt
        s_ref[:, :] = s_new
        for i in range(SPAD):
            states_out[i, t, :] = s_new[i]
        return 0

    jax.lax.fori_loop(0, T, step, 0)


# Largest K handled in a single VMEM-resident grid cell.  Bigger batches
# tile the lane axis; the Pallas grid double-buffers each cell's blocks
# (eps in, states/useq out), so multi-cell tiles must fit VMEM twice.
SINGLE_TILE = 2048
MAX_TILE = 1024
# the fused rollout+cost kernels carry no (T, K) state output, so their
# per-cell VMEM footprint is ~half the chain kernel's and tiles can be 2x
FUSED_MAX_TILE = 2048


def _pick_tile(K: int, max_tile: int = MAX_TILE) -> int:
    if K <= SINGLE_TILE:
        return K
    tile = max_tile
    while K % tile:
        tile -= LANE
    return tile


@functools.partial(jax.jit, static_argnames=("kind", "spec", "T", "K",
                                             "negate_yaw_der", "dt",
                                             "interpret", "precision"))
def _dynamics_chain(kind: str, spec: Tuple[int, ...], T: int, K: int,
                    negate_yaw_der: bool, dt: float, interpret: bool,
                    scalars, s0, U, eps, *wb, precision: str = "highest"):
    C = 2
    tile = _pick_tile(K)
    grid = (K // tile,)
    kernel = functools.partial(_rollout_kernel, kind, spec, T,
                               negate_yaw_der, dt, _prec(precision))

    rep = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    states, useq = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((SPAD, T, K), jnp.float32),
            jax.ShapeDtypeStruct((C, T, K), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [
            pl.BlockSpec((SPAD, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),       # s0
            rep(T, C),                                   # U
            pl.BlockSpec((T, C, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),       # eps
        ]
        + [rep(*w.shape) for w in wb],                   # weights/biases
        out_specs=(
            pl.BlockSpec((SPAD, T, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, T, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((SPAD, tile), jnp.float32)],
        interpret=interpret,
    )(scalars, s0, U, eps, *wb)
    return states, useq


def dynamics_chain_pallas(model, model_params, cfg, state, U, eps,
                          k_offset=0, interpret=False,
                          precision: str = "highest"):
    """Run the fused rollout dynamics chain.

    Args mirror ``MPPISolver.rollout_costs`` phase 1: ``state`` (S,),
    ``U`` (T, C), ``eps`` (T, K, C) standard-normal; ``k_offset`` may be a
    traced value (the sharded solver passes ``axis_index * K_local``).
    Returns component-major ``(states (SPAD, T, K), u_seq (C, T, K))``:
    ``states[i, t]`` is state component i after t+1 integration steps.
    """
    T, K, C = eps.shape
    S = model.STATE_DIM
    rngs = jnp.reshape(model_params["control_rngs"], (-1, 2))[-C:]
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

    wb = model.kernel_weights(model_params)

    # Component-major outputs — K stays on the vector lanes and each state
    # component is a contiguous (T, K) plane for the cost pass.
    return _dynamics_chain(
        model.KERNEL_KIND, tuple(model.kernel_spec()), T, K,
        model.negate_yaw_der, float(model.dt), interpret, scalars, s0,
        U.astype(jnp.float32), eps_t, *wb, precision=precision)


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


# ---------------------------------------------------------------------------
# fused rollout + neural-field cost kernel
# ---------------------------------------------------------------------------

def _fused_kernel(kind: str, spec: tuple, n_field_layers: int,
                  num_freqs: int, n_obs: int, T: int, negate_yaw_der: bool,
                  l1_cost: bool, dt: float, mm_prec, scalars_ref, U_ref,
                  eps_ref, *refs):
    """Rollout + cost in one program (the full ``rolloutKernel``).

    ``scalars_ref`` (SMEM, (40 + obstacle block,)) packing (see
    ``fused_rollout_cost_pallas``):
      [0:2]        nu0, nu1
      [2:6]        lo0, hi0, lo1, hi1
      [6:9]        opt_delay, pure_thresh (k_offset folded), k0_flag
      [9:16]       s0 (7 state components)
      [16:25]      r_c1 (3), r_c2 (3), trs (3) map transform
      [25:32]      cost params: desired_speed, speed_coeff, track_coeff,
                   max_slip_ang, slip_penalty, track_slop, crash_coeff
      [32:36]      steering_coeff, throttle_coeff, boundary_threshold,
                   discount
      [36:38]      obstacle_coeff, inflation (``_make_obstacle_terms``)
      [38:40]      zero padding
      [40:40+3n]   obstacle circles [x..., y..., radius...] when
                   ``n_obs > 0`` (radius <= 0 = inactive slot)
    New scalar params must extend the packing in ALL THREE fused callers
    (``fused_rollout_cost_pallas``, ``fused_exact_rollout_cost_pallas``,
    ``fused_rng_costs``) — the layouts are kept in lockstep.

    refs: [W_dyn..., b_dyn..., W_field..., b_field..., freqs,
           costs_out, crash_out, useq_out]
    """
    n_w = _n_weight_refs(kind, spec)
    n_layers = len(spec) - 1
    wd = refs[:n_w]
    wf = refs[n_w:n_w + 2 * n_field_layers]
    freqs_ref = refs[n_w + 2 * n_field_layers]
    costs_out = refs[-3]
    crash_out = refs[-2]
    useq_out = refs[-1]

    K = useq_out.shape[-1]
    sc = scalars_ref
    nu0, nu1 = sc[0], sc[1]
    lo0, hi0, lo1, hi1 = sc[2], sc[3], sc[4], sc[5]
    opt_delay, pure_thresh, k0_flag = sc[6], sc[7], sc[8]

    tile0 = (pl.program_id(0) * K).astype(jnp.float32)
    k_idx = tile0 + jax.lax.broadcasted_iota(
        jnp.int32, (1, K), 1).astype(jnp.float32)
    zero_rollout = (k_idx == 0.0) & (k0_flag > 0.5)
    pure_noise = k_idx >= pure_thresh

    # State carried as separate blocks — kinematics rows (1, K) each and
    # the dynamics block d4 = [roll, u_x, u_y, yaw_mder] as one (4, K)
    # panel — so the Euler update and the MLP input need no per-step
    # concatenation (DESIGN.md §6 concat-free target; measured 0.2-0.4 us
    # per concat per step per grid cell).
    x0 = jnp.full((1, K), sc[9])
    y0 = jnp.full((1, K), sc[10])
    yaw0 = jnp.full((1, K), sc[11])
    d40 = jnp.concatenate([jnp.full((1, K), sc[12 + i])
                           for i in range(4)], axis=0)        # (4, K)

    field_eval = _make_field_eval(sc, wf, freqs_ref, n_field_layers)
    obstacle_terms = _make_obstacle_terms(sc, n_obs) if n_obs else None
    cost_step = _make_cost_step(sc, field_eval, obstacle_terms, l1_cost, K)

    def step(t, carry):
        x, y, yaw, d4, running, crash = carry
        frozen = zero_rollout | (t.astype(jnp.float32) < opt_delay)

        eps_t = eps_ref[t]
        du0 = eps_t[0:1, :] * nu0
        du1 = eps_t[1:2, :] * nu1
        U_t0 = U_ref[t, 0]
        U_t1 = U_ref[t, 1]
        u0 = jnp.where(frozen, U_t0, jnp.where(pure_noise, du0, U_t0 + du0))
        u1 = jnp.where(frozen, U_t1, jnp.where(pure_noise, du1, U_t1 + du1))
        useq_out[0, t, :] = u0[0]                             # pre-clamp
        useq_out[1, t, :] = u1[0]
        du0 = jnp.where(frozen, 0.0, du0)
        du1 = jnp.where(frozen, 0.0, du1)
        u0 = jnp.clip(u0, lo0, hi0)
        u1 = jnp.clip(u1, lo1, hi1)

        ux = d4[1:2, :]
        uy = d4[2:3, :]
        yd = d4[3:4, :]
        cy = jnp.cos(yaw)
        sy = jnp.sin(yaw)

        # ---- cost of the current state (shared _make_cost_step block) ----
        running, crash = cost_step(t, x, y, cy, sy, ux, uy, u0, u1,
                                   du0, du1, running, crash)

        # ---- dynamics + Euler --------------------------------------------
        dx = cy * ux - sy * uy
        dy_ = sy * ux + cy * uy
        dyaw = -yd if negate_yaw_der else yd
        if kind == "bf":
            acts = _bf_deriv(wd[0], mm_prec, d4, u0, u1)
        else:
            # Layer 0 split: the (out, 4) @ d4 matmul plus rank-1 broadcast
            # terms for the two controls — no (6, K) input materialization.
            W0, b0 = wd[0], wd[1]
            acts = (jax.lax.dot_general(
                W0[:, 0:4], d4, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mm_prec)
                + W0[:, 4:5] * u0 + W0[:, 5:6] * u1 + b0[:, :])
            if n_layers > 1:
                acts = jnp.tanh(acts)
            for i in range(1, n_layers):
                W = wd[2 * i][:, :]
                b = wd[2 * i + 1][:, :]
                acts = jax.lax.dot_general(
                    W, acts, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mm_prec) + b
                if i < n_layers - 1:
                    acts = jnp.tanh(acts)
        x = x + dx * dt
        y = y + dy_ * dt
        yaw = yaw + dyaw * dt
        d4 = d4 + acts * dt
        # roll-over latch after the update (getCrash, costs.cu:301-305);
        # gated t < T-1 so only s_1..s_{T-1} are checked — the scan path
        # (solver/mppi.py roll_flag over states[:-1]) and the reference
        # never roll-check the final integrated state s_T
        crash = jnp.maximum(crash, jnp.where(
            (jnp.abs(d4[0:1, :]) > 1.57) & (t < T - 1), 1.0, 0.0))
        return (x, y, yaw, d4, running, crash)

    running0 = jnp.zeros((1, K), jnp.float32)
    crash0 = jnp.zeros((1, K), jnp.float32)
    _, _, _, _, running, crash = jax.lax.fori_loop(
        0, T, step, (x0, y0, yaw0, d40, running0, crash0))
    costs_out[0, :] = running[0]                              # + terminal 0
    crash_out[0, :] = crash[0]


@functools.partial(jax.jit, static_argnames=(
    "kind", "spec", "field_layers", "num_freqs", "n_obs", "T", "K",
    "negate_yaw_der", "l1_cost", "dt", "interpret", "precision"))
def _fused_rollout_cost(kind, spec, field_layers, num_freqs, n_obs, T, K,
                        negate_yaw_der, l1_cost, dt, interpret,
                        scalars, U, eps, *wb, precision: str = "highest"):
    n_field = len(field_layers) - 1
    C = 2
    tile = _pick_tile(K, FUSED_MAX_TILE)
    grid = (K // tile,)
    kernel = functools.partial(_fused_kernel, kind, spec, n_field, num_freqs,
                               n_obs, T, negate_yaw_der, l1_cost, dt,
                               _prec(precision))
    rep = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    costs, crash, useq = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct((C, T, K), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [
            rep(T, C),                                       # U
            pl.BlockSpec((T, C, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),           # eps
        ]
        + [rep(*w.shape) for w in wb],
        out_specs=(
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, T, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(scalars, U, eps, *wb)
    return costs, crash, useq


def fused_rollout_cost_pallas(model, model_params, cfg, cost_params, field,
                              state, U, eps, l1_cost=False, k_offset=0,
                              interpret=False, precision: str = "highest",
                              obstacles=None, obstacle_coeff: float = 0.0,
                              inflation: float = 1.0):
    """Fully-fused rollout + cost for a :class:`NeuralCostmap` field.

    Returns (total_costs (K,), u_seq (C, T, K), crash (K,)) — the
    ``rollout_costs`` contract, computed in one kernel.
    """
    T, K, C = eps.shape
    rngs = jnp.reshape(model_params["control_rngs"], (-1, 2))[-C:]
    nu = jnp.asarray(cfg.exploration_std, dtype=jnp.float32)
    k_offset = jnp.asarray(k_offset, dtype=jnp.float32)

    sc = _pack_scalars(cfg, rngs, nu, k_offset, state, field, cost_params)
    sc, n_obs = _append_obstacles(sc, obstacles, obstacle_coeff, inflation)

    eps_t = jnp.transpose(eps, (0, 2, 1))

    wb = list(model.kernel_weights(model_params))
    field_layer_dims = [field.weights[0].shape[0]]
    for W, b in zip(field.weights, field.biases):
        wb.append(jnp.transpose(W).astype(jnp.float32))
        wb.append(b[:, None].astype(jnp.float32))
        field_layer_dims.append(W.shape[1])
    num_freqs = int(field.freqs.shape[0])
    wb.append(field.freqs[:, None])                           # (F, 1)

    costs, crash, useq = _fused_rollout_cost(
        model.KERNEL_KIND, tuple(model.kernel_spec()),
        tuple(field_layer_dims), num_freqs, n_obs, T, K,
        model.negate_yaw_der, l1_cost, float(model.dt), interpret,
        sc, U.astype(jnp.float32), eps_t, *wb, precision=precision)
    return costs[0], useq, crash[0].astype(jnp.int32)


# ---------------------------------------------------------------------------
# fused rollout + EXACT costmap kernel
# ---------------------------------------------------------------------------
#
# The reference's track cost is a point-sampled texture lookup
# (``costs.cu:351-393``).  TPUs have no texture unit and XLA's gather runs
# at ~5 ns/lookup (70 ms for the 13M lookups of a K=65536 solve), so the
# exact path used to be the one place reference semantics and scale were
# in tension (the round-1 EVAL's 55 ms).  This kernel keeps the whole
# costmap VMEM-resident and gathers with the two Mosaic primitives that
# actually lower fast:
#
# - per-row lane gather (``take_along_axis`` axis=1 over a (ROWS, 128)
#   panel — one hardware op per 8 rows), which extracts, for 128 lookups
#   at once, their *columns* across every row of a window panel;
# - a one-hot row select + sublane-tree reduction (pure f32 VPU select,
#   no matmul, hence bit-exact and NaN-safe).
#
# Cost is linear in the window area per 128 lookups, so the kernel picks a
# small dynamic window per (grid-cell, timestep): origin = aligned min of
# the swarm's map indices, validity = max index inside the window — both
# computed in-kernel, so the fast path is *proven* exact per step.  When
# the swarm spread exceeds the window (divergent rollouts, huge
# exploration noise) a banded sweep over the whole map runs instead under
# ``pl.when`` — still exact, just slower, and only for the steps that
# need it.  Measured: 13.1M lookups in ~16 ms with the 256x256 window
# (4.4x the XLA gather), putting the exact fused solve within the
# neural-field kernel's envelope.
#
# Window sizing: the one-hot row select costs O(RW * 128) per lane
# group per step REGARDLESS of K, so RW is the exact path's dominant
# knob.  The swarm at any single timestep is spatially tight (all
# rollouts share the start state; cross-K spread after a 2 s horizon is
# a few meters), so 64 rows (32 m at the reference's 2 px/m) keeps the
# fast path proven everywhere while quartering the gather cost.
# Measured (v5e, chained solves, bit-identical controls): K=1920
# 270->396 solves/s, K=65536 38.6->50.2 vs the 256-row window; 32 rows
# is slightly better at K=65536 but worse at K=1920 and has less
# spread headroom.

EXACT_WIN_ROWS = 64       # dynamic-window height in map rows (8-aligned)
EXACT_WIN_BLOCKS = 2      # window width in 128-lane column panels
EXACT_VMEM_BUDGET = 6 * 1024 * 1024   # max costmap bytes held in VMEM


def _exact_dims(H: int, W: int):
    """Static padded layout for the VMEM-resident map: (Wblk, Hp, 128)
    column panels; window (RW rows x CB panels) tiles it exactly."""
    Hp8 = -(-H // 8) * 8
    RW = min(EXACT_WIN_ROWS, Hp8)
    Hp = -(-Hp8 // RW) * RW
    Wp = -(-W // (EXACT_WIN_BLOCKS * LANE)) * (EXACT_WIN_BLOCKS * LANE)
    Wblk = Wp // LANE
    return Hp, RW, Wp, Wblk, EXACT_WIN_BLOCKS


def exact_map_tiles(ch0: jnp.ndarray):
    """(Wblk, Hp, 128) VMEM panel layout of costmap channel 0 for the
    exact fused kernels, or ``None`` when the padded map exceeds the
    VMEM budget (the exact kernel then doesn't apply).

    ``Costmap.build`` precomputes this once and carries it as a pytree
    leaf (``ch0_tiles``): recomputing it inside every jitted replan
    would pay an Hp*Wp*4-byte HBM pad+transpose per solve for a map
    that is constant across replans.
    """
    H, W = int(ch0.shape[0]), int(ch0.shape[1])
    Hp, _, Wp, Wblk, _ = _exact_dims(H, W)
    if Hp * Wp * 4 > EXACT_VMEM_BUDGET:
        return None
    return jnp.transpose(
        jnp.pad(ch0, ((0, Hp - H), (0, Wp - W))).reshape(Hp, Wblk, LANE),
        (1, 0, 2))


def exact_map_fits(costmap) -> bool:
    """True when the (padded) costmap fits the in-kernel VMEM budget."""
    try:
        H, W = costmap.height, costmap.width
    except AttributeError:
        return False
    Hp, _, Wp, _, _ = _exact_dims(H, W)
    return Hp * Wp * 4 <= EXACT_VMEM_BUDGET


def exact_pallas_supported(costmap, K: int) -> bool:
    """The exact-costmap fused kernel applies when the (padded) map fits
    the VMEM budget and the rollout batch fills whole lane groups."""
    return pallas_supported(K) and exact_map_fits(costmap)


def _make_exact_lookup(map3_ref, vals_ref, sc, H: int, W: int, Hp: int,
                       RW: int, Wblk: int, CB: int, K: int):
    """Build the in-kernel exact costmap sampler (windowed gather with
    proven-exact fast path + banded full-map fallback — see the section
    comment above).  Shared by the eps-fed exact kernel and the exact
    kernel-RNG mode.  Returns ``exact_lookup(px, py) -> (1, 2K)``."""
    rc1x, rc1y, rc1w = sc[16], sc[17], sc[18]
    rc2x, rc2y, rc2w = sc[19], sc[20], sc[21]
    trsx, trsy, trsw = sc[22], sc[23], sc[24]
    G2 = (2 * K) // LANE

    def map_indices(px, py):
        """World (1, M) coords -> clamped texel indices, bit-matching
        ``Costmap.lookup_ch0`` (coorTransform + point sample + clamp)."""
        u = rc1x * px + rc2x * py + trsx
        v = rc1y * px + rc2y * py + trsy
        w = rc1w * px + rc2w * py + trsw
        fx = jnp.floor((u / w) * jnp.float32(W))
        fy = jnp.floor((v / w) * jnp.float32(H))
        fx = jnp.where(jnp.isnan(fx), 0.0, fx)                # nan_to_num
        fy = jnp.where(jnp.isnan(fy), 0.0, fy)
        ix = jnp.clip(fx, 0.0, W - 1).astype(jnp.int32)
        iy = jnp.clip(fy, 0.0, H - 1).astype(jnp.int32)
        return ix, iy

    def window_vals(oy, bxb, iy_all, ix_all):
        """Gather map[iy, ix] for all 2K lookups from the window whose
        origin is (row oy, column panel bxb).  Out-of-window lookups
        contribute exactly 0 (mask by select, never multiply, so NaN
        texels cannot poison other lanes)."""
        ly_all = iy_all - oy
        lx_all = ix_all - bxb * LANE
        outs = []
        for g in range(G2):
            lyg = ly_all[0, g * LANE:(g + 1) * LANE]          # (128,)
            lxg = lx_all[0, g * LANE:(g + 1) * LANE]
            riota = jax.lax.broadcasted_iota(jnp.int32, (RW, LANE), 0)
            rowmask = riota == lyg[None, :]
            val = jnp.zeros((1, LANE), jnp.float32)
            for cb in range(CB):
                panel = map3_ref[bxb + cb, pl.ds(oy, RW), :]  # (RW, 128)
                li = jnp.clip(lxg - cb * LANE, 0, LANE - 1)
                A = jnp.take_along_axis(
                    panel, jnp.broadcast_to(li[None, :], (RW, LANE)),
                    axis=1)
                v = jnp.sum(jnp.where(rowmask, A, 0.0), axis=0,
                            keepdims=True)                    # (1, 128)
                inb = ((lxg >= cb * LANE)
                       & (lxg < (cb + 1) * LANE))[None, :]
                val = val + jnp.where(inb, v, 0.0)
            outs.append(val)
        return jnp.concatenate(outs, axis=1)                  # (1, 2K)

    def exact_lookup(px, py):
        """(1, 2K) world coords -> (1, 2K) channel-0 values, exact."""
        ix_all, iy_all = map_indices(px, py)
        mn_ix = jnp.min(ix_all)
        mx_ix = jnp.max(ix_all)
        mn_iy = jnp.min(iy_all)
        mx_iy = jnp.max(iy_all)
        bxb = jnp.clip(mn_ix // LANE, 0, Wblk - CB)
        oy = jnp.clip((mn_iy // 8) * 8, 0, Hp - RW)
        fast = (mx_ix < (bxb + CB) * LANE) & (mx_iy < oy + RW)

        vals_ref[...] = window_vals(oy, bxb, iy_all, ix_all)

        @pl.when(jnp.logical_not(fast))
        def _full_sweep():
            # swarm spread exceeds the window: exact banded sweep over
            # the bands intersecting the swarm's index bounding box —
            # every lookup lies in [mn..mx] by construction, so its
            # owning band is inside the swept rectangle (each lookup is
            # owned by exactly one band; out-of-band contributions are 0
            # by the window masks).  Sweeping only the box makes the
            # slow path cost proportional to the SPREAD, not the map:
            # on the real-circuit maps (ppm=10, 64 rows = 6.4 m) the
            # full-map sweep was 30 bands where the swarm typically
            # touches 2-6.
            by0 = mn_iy // RW
            by1 = mx_iy // RW                       # inclusive band rows
            bx0 = mn_ix // (CB * LANE)
            bx1 = mx_ix // (CB * LANE)              # inclusive band cols
            nx = bx1 - bx0 + 1

            def band(b, acc):
                by = (by0 + b // nx) * RW
                bx = (bx0 + b % nx) * CB
                return acc + window_vals(by, bx, iy_all, ix_all)

            vals_ref[...] = jax.lax.fori_loop(
                0, (by1 - by0 + 1) * nx, band,
                jnp.zeros((1, 2 * K), jnp.float32))

        return vals_ref[...]

    return exact_lookup


def _fused_exact_kernel(kind: str, spec: tuple, n_obs: int, T: int,
                        H: int, W: int,
                        Hp: int, RW: int, Wblk: int, CB: int,
                        negate_yaw_der: bool, l1_cost: bool, dt: float,
                        mm_prec, scalars_ref, U_ref, eps_ref, *refs):
    """Rollout + cost in one program with *exact* point-sampled costmap
    lookups (texture semantics of ``costs.cu:128-154, 351-393``).

    Same scalar packing and per-step semantics as ``_fused_kernel``; the
    neural field evaluation is replaced by the windowed exact gather.

    refs: [map3 (Wblk, Hp, 128), W_dyn..., b_dyn..., costs_out, crash_out,
           useq_out, vals_scratch (1, 2K)]
    """
    map3_ref = refs[0]
    wd = refs[1:1 + _n_weight_refs(kind, spec)]
    costs_out = refs[-4]
    crash_out = refs[-3]
    useq_out = refs[-2]
    vals_ref = refs[-1]

    K = useq_out.shape[-1]
    sc = scalars_ref
    nu0, nu1 = sc[0], sc[1]
    lo0, hi0, lo1, hi1 = sc[2], sc[3], sc[4], sc[5]
    opt_delay, pure_thresh, k0_flag = sc[6], sc[7], sc[8]

    tile0 = (pl.program_id(0) * K).astype(jnp.float32)
    k_idx = tile0 + jax.lax.broadcasted_iota(
        jnp.int32, (1, K), 1).astype(jnp.float32)
    zero_rollout = (k_idx == 0.0) & (k0_flag > 0.5)
    pure_noise = k_idx >= pure_thresh

    s0 = jnp.concatenate(
        [jnp.full((1, K), sc[9 + i]) for i in range(7)]
        + [jnp.zeros((1, K), jnp.float32)], axis=0)           # (SPAD, K)

    exact_lookup = _make_exact_lookup(map3_ref, vals_ref, sc, H, W, Hp,
                                      RW, Wblk, CB, K)
    obstacle_terms = _make_obstacle_terms(sc, n_obs) if n_obs else None
    cost_step = _make_cost_step(sc, exact_lookup, obstacle_terms, l1_cost, K)

    def step(t, carry):
        s, running, crash = carry
        frozen = zero_rollout | (t.astype(jnp.float32) < opt_delay)

        eps_t = eps_ref[t]
        du0 = eps_t[0:1, :] * nu0
        du1 = eps_t[1:2, :] * nu1
        U_t0 = U_ref[t, 0]
        U_t1 = U_ref[t, 1]
        u0 = jnp.where(frozen, U_t0, jnp.where(pure_noise, du0, U_t0 + du0))
        u1 = jnp.where(frozen, U_t1, jnp.where(pure_noise, du1, U_t1 + du1))
        useq_out[0, t, :] = u0[0]                             # pre-clamp
        useq_out[1, t, :] = u1[0]
        du0 = jnp.where(frozen, 0.0, du0)
        du1 = jnp.where(frozen, 0.0, du1)
        u0 = jnp.clip(u0, lo0, hi0)
        u1 = jnp.clip(u1, lo1, hi1)

        x = s[0:1, :]
        y = s[1:2, :]
        yaw = s[2:3, :]
        ux = s[4:5, :]
        uy = s[5:6, :]
        yd = s[6:7, :]
        cy = jnp.cos(yaw)
        sy = jnp.sin(yaw)

        # cost of the current state (shared _make_cost_step block; the
        # exact-costmap front/back samples share the per-step window)
        running, crash = cost_step(t, x, y, cy, sy, ux, uy, u0, u1,
                                   du0, du1, running, crash)

        dx = cy * ux - sy * uy
        dy_ = sy * ux + cy * uy
        dyaw = -yd if negate_yaw_der else yd
        if kind == "bf":
            acts = _bf_deriv(wd[0], mm_prec, s[3:7, :], u0, u1)
        else:
            acts = _mlp_deriv_concat(wd, mm_prec, s[3:7, :], u0, u1)
        deriv = jnp.concatenate(
            [dx, dy_, dyaw, acts, jnp.zeros((SPAD - 7, K), jnp.float32)],
            axis=0)
        s = s + deriv * dt
        # roll latch gated t < T-1: only s_1..s_{T-1}, matching the scan
        # path (see _fused_kernel)
        crash = jnp.maximum(crash, jnp.where(
            (jnp.abs(s[3:4, :]) > 1.57) & (t < T - 1), 1.0, 0.0))
        return (s, running, crash)

    running0 = jnp.zeros((1, K), jnp.float32)
    crash0 = jnp.zeros((1, K), jnp.float32)
    _, running, crash = jax.lax.fori_loop(0, T, step, (s0, running0, crash0))
    costs_out[0, :] = running[0]
    crash_out[0, :] = crash[0]


@functools.partial(jax.jit, static_argnames=(
    "kind", "spec", "n_obs", "T", "K", "H", "W", "Hp", "RW", "Wblk", "CB",
    "negate_yaw_der", "l1_cost", "dt", "interpret", "precision"))
def _fused_exact_call(kind, spec, n_obs, T, K, H, W, Hp, RW, Wblk, CB,
                      negate_yaw_der, l1_cost, dt, interpret,
                      scalars, U, eps, map3, *wb, precision: str = "highest"):
    C = 2
    tile = _pick_tile(K, FUSED_MAX_TILE)
    grid = (K // tile,)
    kernel = functools.partial(_fused_exact_kernel, kind, spec, n_obs, T,
                               H, W, Hp,
                               RW, Wblk, CB, negate_yaw_der, l1_cost, dt,
                               _prec(precision))
    rep = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    costs, crash, useq = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct((C, T, K), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [
            rep(T, C),                                       # U
            pl.BlockSpec((T, C, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),           # eps
            rep(Wblk, Hp, LANE),                             # map panels
        ]
        + [rep(*w.shape) for w in wb],
        out_specs=(
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, T, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((1, 2 * tile), jnp.float32)],
        interpret=interpret,
    )(scalars, U, eps, map3, *wb)
    return costs, crash, useq


def fused_exact_rollout_cost_pallas(model, model_params, cfg, cost_params,
                                    costmap, state, U, eps, l1_cost=False,
                                    k_offset=0, interpret=False,
                                    precision: str = "highest",
                                    obstacles=None,
                                    obstacle_coeff: float = 0.0,
                                    inflation: float = 1.0):
    """Fully-fused rollout + cost with the *exact* reference costmap.

    Same contract as :func:`fused_rollout_cost_pallas` but for a
    :class:`~autorally_tpu.costs.costmap.Costmap` (texture-semantics
    point sampling, ``costs.cu:128-154``) instead of a neural field.
    Returns (total_costs (K,), u_seq (C, T, K), crash (K,)).
    """
    T, K, C = eps.shape
    rngs = jnp.reshape(model_params["control_rngs"], (-1, 2))[-C:]
    nu = jnp.asarray(cfg.exploration_std, dtype=jnp.float32)
    k_offset = jnp.asarray(k_offset, dtype=jnp.float32)

    sc = _pack_scalars(cfg, rngs, nu, k_offset, state, costmap, cost_params)
    sc, n_obs = _append_obstacles(sc, obstacles, obstacle_coeff, inflation)

    eps_t = jnp.transpose(eps, (0, 2, 1))

    wb = model.kernel_weights(model_params)

    ch0 = costmap.data[..., 0]
    H, W = int(ch0.shape[0]), int(ch0.shape[1])
    Hp, RW, Wp, Wblk, CB = _exact_dims(H, W)
    map3 = getattr(costmap, "ch0_tiles", None)                # (Wblk, Hp, 128)
    if map3 is None:
        map3 = exact_map_tiles(ch0)

    costs, crash, useq = _fused_exact_call(
        model.KERNEL_KIND, tuple(model.kernel_spec()), n_obs, T, K, H, W,
        Hp, RW,
        Wblk, CB, model.negate_yaw_der, l1_cost, float(model.dt), interpret,
        sc, U.astype(jnp.float32), eps_t, map3, *wb, precision=precision)
    return costs[0], useq, crash[0].astype(jnp.int32)


# ---------------------------------------------------------------------------
# in-kernel RNG (two-pass, nothing-in-HBM large-K mode)
# ---------------------------------------------------------------------------

def _kernel_normals(shape):
    """Standard normals from the Mosaic per-core PRNG via Box-Muller.

    Replaces the host-side jax.random draw: at K=262144 the (T, K, C)
    noise array is ~200 MB of HBM traffic per solve; generating in-kernel
    makes noise free.  23-bit uniforms (top bits of the raw stream),
    guarded away from log(0).
    """
    def bits():
        raw = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        sh = jax.lax.shift_right_logical(raw, jnp.uint32(9))
        return pltpu.bitcast(sh, jnp.int32).astype(jnp.float32) * (
            1.0 / (1 << 23))

    u1 = bits() + 1e-7
    u2 = bits()
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * jnp.pi * u2)


def _fused_rng_kernel(kind: str, spec: tuple, cost_mode: str,
                      n_field_layers: int, num_freqs: int, n_obs: int,
                      T: int,
                      H: int, W: int, Hp: int, RW: int, Wblk: int, CB: int,
                      negate_yaw_der: bool, l1_cost: bool, dt: float,
                      ou_a: float,
                      mm_prec, scalars_ref, seed_ref, U_ref, *refs):
    """Pass 1 of the RNG mode: identical to ``_fused_kernel`` /
    ``_fused_exact_kernel`` (``cost_mode`` = "field" | "exact") but noise
    is generated in-kernel (seeded per grid cell) and ONLY costs/crash are
    emitted — no eps input, no u_seq output, nothing per-(t,k) in HBM.

    ``ou_a``: 0.0 = white gaussian draws (the reference protocol);
    otherwise the AR(1) coefficient of Ornstein-Uhlenbeck exploration
    (``a = 1 - theta``, ``ops/sampling.py::ou_noise``) — the recursion
    ``x_t = a x_{t-1} + sqrt(1-a^2) w_t`` streams through the step loop
    with one extra (2, K) carry, so temporally-correlated exploration
    (measured ~5% faster laps, EVAL round 5) composes with the
    nothing-in-HBM capacity mode at zero HBM cost.  The DFT-shaped
    ``colored`` sampler stays host-path: its horizon-global mixing
    needs all nf frequency draws live at once.

    refs: field mode [wd..., wf..., freqs, costs_out, crash_out];
    exact mode [map3, wd..., costs_out, crash_out, vals_scratch]."""
    n_w = _n_weight_refs(kind, spec)
    if cost_mode == "exact":
        map3_ref = refs[0]
        wd = refs[1:1 + n_w]
        costs_out = refs[-3]
        crash_out = refs[-2]
        vals_ref = refs[-1]
    else:
        wd = refs[:n_w]
        wf = refs[n_w:n_w + 2 * n_field_layers]
        freqs_ref = refs[n_w + 2 * n_field_layers]
        costs_out = refs[-2]
        crash_out = refs[-1]

    K = costs_out.shape[-1]
    sc = scalars_ref
    nu0, nu1 = sc[0], sc[1]
    lo0, hi0, lo1, hi1 = sc[2], sc[3], sc[4], sc[5]
    opt_delay, pure_thresh, k0_flag = sc[6], sc[7], sc[8]

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    tile0 = (pl.program_id(0) * K).astype(jnp.float32)
    k_idx = tile0 + jax.lax.broadcasted_iota(
        jnp.int32, (1, K), 1).astype(jnp.float32)
    zero_rollout = (k_idx == 0.0) & (k0_flag > 0.5)
    pure_noise = k_idx >= pure_thresh

    s0 = jnp.concatenate(
        [jnp.full((1, K), sc[9 + i]) for i in range(7)]
        + [jnp.zeros((1, K), jnp.float32)], axis=0)

    if cost_mode == "exact":
        lookup = _make_exact_lookup(map3_ref, vals_ref, sc, H, W, Hp,
                                    RW, Wblk, CB, K)
    else:
        lookup = _make_field_eval(sc, wf, freqs_ref, n_field_layers)
    obstacle_terms = _make_obstacle_terms(sc, n_obs) if n_obs else None
    cost_step = _make_cost_step(sc, lookup, obstacle_terms, l1_cost, K)

    def step(t, carry):
        s, running, crash, xn = carry
        frozen = zero_rollout | (t.astype(jnp.float32) < opt_delay)

        eps_t = _kernel_normals((2, K))          # one draw per step
        if ou_a != 0.0:
            # OU stream: x_0 = w_0, x_t = a x_{t-1} + b w_t (matches
            # ops/sampling.py::ou_noise step for step)
            b = (1.0 - ou_a * ou_a) ** 0.5
            xn = jnp.where(t == 0, eps_t, ou_a * xn + b * eps_t)
            eps_t = xn
        du0 = eps_t[0:1, :] * nu0
        du1 = eps_t[1:2, :] * nu1
        U_t0 = U_ref[t, 0]
        U_t1 = U_ref[t, 1]
        u0 = jnp.where(frozen, U_t0, jnp.where(pure_noise, du0, U_t0 + du0))
        u1 = jnp.where(frozen, U_t1, jnp.where(pure_noise, du1, U_t1 + du1))
        du0 = jnp.where(frozen, 0.0, du0)
        du1 = jnp.where(frozen, 0.0, du1)
        u0 = jnp.clip(u0, lo0, hi0)
        u1 = jnp.clip(u1, lo1, hi1)

        x = s[0:1, :]
        y = s[1:2, :]
        yaw = s[2:3, :]
        ux = s[4:5, :]
        uy = s[5:6, :]
        yd = s[6:7, :]
        cy = jnp.cos(yaw)
        sy = jnp.sin(yaw)

        # cost of the current state (shared _make_cost_step block)
        running, crash = cost_step(t, x, y, cy, sy, ux, uy, u0, u1,
                                   du0, du1, running, crash)

        dx = cy * ux - sy * uy
        dy_ = sy * ux + cy * uy
        dyaw = -yd if negate_yaw_der else yd
        if kind == "bf":
            acts = _bf_deriv(wd[0], mm_prec, s[3:7, :], u0, u1)
        else:
            acts = _mlp_deriv_concat(wd, mm_prec, s[3:7, :], u0, u1)
        deriv = jnp.concatenate(
            [dx, dy_, dyaw, acts, jnp.zeros((SPAD - 7, K), jnp.float32)],
            axis=0)
        s = s + deriv * dt
        # roll latch gated t < T-1: only s_1..s_{T-1}, matching the scan
        # path (see _fused_kernel)
        crash = jnp.maximum(crash, jnp.where(
            (jnp.abs(s[3:4, :]) > 1.57) & (t < T - 1), 1.0, 0.0))
        return (s, running, crash, xn)

    running0 = jnp.zeros((1, K), jnp.float32)
    crash0 = jnp.zeros((1, K), jnp.float32)
    xn0 = jnp.zeros((2, K), jnp.float32)
    _, running, crash, _ = jax.lax.fori_loop(
        0, T, step, (s0, running0, crash0, xn0))
    costs_out[0, :] = running[0]
    crash_out[0, :] = crash[0]


def _weighted_update_kernel(T: int, ou_a: float, scalars_ref, seed_ref,
                            U_ref, w_ref, numer_out):
    """Pass 2 of the RNG mode: regenerate the identical noise stream (same
    seed + grid cell, same draw order as pass 1) and accumulate the
    importance-weighted control numerator sum_k w_k u_{k,t,c} for this
    tile.  Controls are pre-clamp, matching the reference's du_d store
    (mppi_controller.cu:153)."""
    K = w_ref.shape[-1]
    sc = scalars_ref
    nu0, nu1 = sc[0], sc[1]
    opt_delay, pure_thresh, k0_flag = sc[6], sc[7], sc[8]

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    tile0 = (pl.program_id(0) * K).astype(jnp.float32)
    k_idx = tile0 + jax.lax.broadcasted_iota(
        jnp.int32, (1, K), 1).astype(jnp.float32)
    zero_rollout = (k_idx == 0.0) & (k0_flag > 0.5)
    pure_noise = k_idx >= pure_thresh
    w = w_ref[0:1, :]

    def step(t, xn):
        frozen = zero_rollout | (t.astype(jnp.float32) < opt_delay)
        eps_t = _kernel_normals((2, K))          # same draw order as pass 1
        if ou_a != 0.0:
            # identical OU recursion as pass 1 — the streams must match
            b = (1.0 - ou_a * ou_a) ** 0.5
            xn = jnp.where(t == 0, eps_t, ou_a * xn + b * eps_t)
            eps_t = xn
        du0 = eps_t[0:1, :] * nu0
        du1 = eps_t[1:2, :] * nu1
        U_t0 = U_ref[t, 0]
        U_t1 = U_ref[t, 1]
        u0 = jnp.where(frozen, U_t0, jnp.where(pure_noise, du0, U_t0 + du0))
        u1 = jnp.where(frozen, U_t1, jnp.where(pure_noise, du1, U_t1 + du1))
        numer_out[0, 0, t] = jnp.sum(w * u0)
        numer_out[0, 1, t] = jnp.sum(w * u1)
        return xn

    jax.lax.fori_loop(0, T, step, jnp.zeros((2, K), jnp.float32))


@functools.partial(jax.jit, static_argnames=(
    "kind", "spec", "cost_mode", "field_layers", "num_freqs", "n_obs",
    "T", "K",
    "H", "W", "Hp", "RW", "Wblk", "CB", "negate_yaw_der",
    "l1_cost", "dt", "ou_a", "interpret", "precision"))
def _fused_rng_pass1(kind, spec, cost_mode, field_layers, num_freqs, n_obs,
                     T, K,
                     H, W, Hp, RW, Wblk, CB,
                     negate_yaw_der, l1_cost, dt, ou_a, interpret,
                     scalars, seed, U, *wb, precision: str = "highest"):
    n_field = len(field_layers) - 1
    tile = _pick_tile(K, FUSED_MAX_TILE)
    grid = (K // tile,)
    kernel = functools.partial(_fused_rng_kernel, kind, spec, cost_mode,
                               n_field, num_freqs, n_obs, T, H, W, Hp, RW,
                               Wblk,
                               CB, negate_yaw_der, l1_cost, dt, ou_a,
                               _prec(precision))
    rep = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    costs, crash = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [rep(T, 2)]
        + [rep(*w.shape) for w in wb],   # exact mode: wb[0] is the map
        out_specs=(
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=([pltpu.VMEM((1, 2 * tile), jnp.float32)]
                        if cost_mode == "exact" else []),
        interpret=interpret,
    )(scalars, seed, U, *wb)
    return costs, crash


@functools.partial(jax.jit, static_argnames=("T", "K", "ou_a", "interpret"))
def _fused_rng_pass2(T, K, ou_a, interpret, scalars, seed, U, w):
    tile = _pick_tile(K, FUSED_MAX_TILE)
    grid = (K // tile,)
    G = K // tile
    kernel = functools.partial(_weighted_update_kernel, T, ou_a)
    partials = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((G, 2, T), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((T, 2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, T), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
        interpret=interpret,
    )(scalars, seed, U, w)
    return jnp.sum(partials, axis=0)                      # (2, T)


def fused_rng_costs(model, model_params, cfg, cost_params, field, state, U,
                    key, l1_cost=False, k_offset=0, K_local=None,
                    interpret=False, precision: str = "highest",
                    obstacles=None, obstacle_coeff: float = 0.0,
                    inflation: float = 1.0):
    """Pass 1 of the nothing-in-HBM mode as a standalone step: in-kernel
    noise, returns ``(total (K_local,), crash (K_local,), ctx)`` where
    ``ctx`` replays the identical noise stream in :func:`fused_rng_numer`.

    ``k_offset``/``K_local`` let a sharded caller run its own shard of the
    global rollout batch with a per-shard seed (the ``mppi_controller.cu:612``
    per-controller cuRAND stream, one per chip).

    ``cfg.noise_sampler`` may be "gaussian" (white, the reference
    protocol) or "ou" (in-kernel AR(1) stream, see ``_fused_rng_kernel``);
    the DFT-based "colored" sampler cannot stream and must use the
    host-noise path (the solver's dispatch enforces this)."""
    if model.KERNEL_KIND is None:
        raise NotImplementedError(
            "kernel-RNG (nothing-in-HBM) mode needs a model with an "
            "in-kernel form (Dynamics.KERNEL_KIND)")
    if cfg.noise_sampler == "ou":
        # a = 1-theta must be a stationary AR(1) coefficient; a == 0
        # (theta == 1) degenerates to white draws, which the kernels
        # handle natively via the ou_a == 0.0 static branch
        ou_a = 1.0 - float(cfg.noise_param)
        if not (-1.0 < ou_a < 1.0):
            raise ValueError(
                f"kernel-RNG OU needs theta in (0, 2): {cfg.noise_param}")
    elif cfg.noise_sampler == "gaussian":
        ou_a = 0.0
    else:
        raise NotImplementedError(
            f"kernel-RNG mode supports gaussian/ou noise, not "
            f"{cfg.noise_sampler!r} (DFT-shaped colored noise needs the "
            f"whole horizon axis live — host-noise path only)")
    T = U.shape[0]
    K = cfg.num_rollouts if K_local is None else K_local
    rngs = jnp.reshape(model_params["control_rngs"], (-1, 2))[-2:]
    nu = jnp.asarray(cfg.exploration_std, dtype=jnp.float32)
    k_offset = jnp.asarray(k_offset, dtype=jnp.float32)

    sc = _pack_scalars(cfg, rngs, nu, k_offset, state, field, cost_params)
    sc, n_obs = _append_obstacles(sc, obstacles, obstacle_coeff, inflation)

    # deterministic seed from the jax key (plus a large odd stride per
    # iteration is the caller's job via key folding)
    seed = jax.random.key_data(key).reshape(-1)[-1].astype(jnp.int32)
    seed = jnp.stack([seed, seed]).astype(jnp.int32)

    from autorally_tpu.costs.neural_costmap import NeuralCostmap

    wb = list(model.kernel_weights(model_params))
    if isinstance(field, NeuralCostmap):
        cost_mode = "field"
        field_layer_dims = [field.weights[0].shape[0]]
        for W, b in zip(field.weights, field.biases):
            wb.append(jnp.transpose(W).astype(jnp.float32))
            wb.append(b[:, None].astype(jnp.float32))
            field_layer_dims.append(W.shape[1])
        num_freqs = int(field.freqs.shape[0])
        wb.append(field.freqs[:, None])
        H = W = Hp = RW = Wblk = CB = 0
    else:
        # exact reference costmap, VMEM-resident (same layout as
        # fused_exact_rollout_cost_pallas)
        cost_mode = "exact"
        field_layer_dims = [1, 1]
        num_freqs = 0
        ch0 = field.data[..., 0]
        H, W = int(ch0.shape[0]), int(ch0.shape[1])
        Hp, RW, Wp, Wblk, CB = _exact_dims(H, W)
        map3 = getattr(field, "ch0_tiles", None)
        if map3 is None:
            map3 = exact_map_tiles(ch0)
        wb = [map3] + wb

    costs, crash = _fused_rng_pass1(
        model.KERNEL_KIND, tuple(model.kernel_spec()), cost_mode,
        tuple(field_layer_dims), num_freqs, n_obs, T, K,
        H, W, Hp, RW, Wblk, CB,
        model.negate_yaw_der, l1_cost, float(model.dt), ou_a, interpret,
        sc, seed, U.astype(jnp.float32), *wb, precision=precision)
    ctx = (T, K, ou_a, interpret, sc, seed, U.astype(jnp.float32))
    return costs[0], crash[0].astype(jnp.int32), ctx


def fused_rng_numer(ctx, w):
    """Pass 2 of the nothing-in-HBM mode: regenerate the pass-1 noise
    stream and contract with softmax weights ``w (K_local,)``.  Returns
    the (C, T) weighted-control numerator (un-normalized — a sharded
    caller ``psum``\\ s it before dividing by the global eta)."""
    T, K, ou_a, interpret, sc, seed, U = ctx
    return _fused_rng_pass2(T, K, ou_a, interpret, sc, seed, U, w[None, :])


def fused_rng_solve_iteration(model, model_params, cfg, cost_params, field,
                              state, U, key, l1_cost=False, k_offset=0,
                              interpret=False, precision: str = "highest",
                              obstacles=None, obstacle_coeff: float = 0.0,
                              inflation: float = 1.0):
    """One full MPPI iteration in nothing-in-HBM mode: pass 1 computes
    rollout costs with in-kernel noise; the softmax weights are computed
    in XLA; pass 2 regenerates the same noise and contracts it with the
    weights.  HBM traffic per iteration is O(K + T*C), independent of
    K*T.  Returns (U_new (T, C), total_costs (K,), crash (K,))."""
    total, crash, ctx = fused_rng_costs(
        model, model_params, cfg, cost_params, field, state, U, key,
        l1_cost=l1_cost, k_offset=k_offset, interpret=interpret,
        precision=precision, obstacles=obstacles,
        obstacle_coeff=obstacle_coeff, inflation=inflation)
    baseline = jnp.min(total)
    w = jnp.exp(-effective_gamma(cfg, cost_params) * (total - baseline))
    eta = jnp.sum(w)
    numer = fused_rng_numer(ctx, w)
    U_new = (numer / eta).T                              # (T, C)
    return U_new, total, crash
