"""Typed configuration tree for the MPPI framework.

Replaces the reference's four config mechanisms (roslaunch ``<param>`` blocks,
``param_getter.cpp``, dynamic_reconfigure, and compile-time template args —
see ``autorally_control/src/path_integral/param_getter.cpp:40-151`` and
``launch/path_integral_nn.launch``) with one typed dataclass tree.

Runtime-tunable cost parameters (the reference's dynamic_reconfigure surface,
``cfg/PathIntegralParams.cfg:12-21``) live in :class:`CostParams`, which is a
JAX pytree passed as a *traced argument* to the jitted solve — updating them
never triggers recompilation.  Shape-defining parameters (K, T, layer sizes)
are Python-level static config, mirroring the reference's template arguments
(``path_integral_main.cu:65-78``).
"""

from __future__ import annotations

import dataclasses
import os
import re
import xml.etree.ElementTree as ET
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


# Dev-rig defaults for the reference's shipped model weights (the .npz
# interchange format, ``params/models/README.md``).  Examples and tools
# use these as ARGUMENT DEFAULTS only — the library never loads them
# implicitly; override with ``AUTORALLY_TPU_ASSETS`` or explicit paths.
_ASSETS = os.environ.get(
    "AUTORALLY_TPU_ASSETS",
    "/root/reference/autorally_control/src/path_integral/params/models")
REFERENCE_NN_NPZ = os.path.join(_ASSETS, "autorally_nnet_09_12_2018.npz")
REFERENCE_BF_NPZ = os.path.join(_ASSETS, "basis_function_09_12_2018.npz")


def _pytree_dataclass(cls):
    """Register a dataclass whose fields are all pytree leaves."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, name) for name in fields), None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
class CostParams:
    """Runtime-tunable cost parameters (a JAX pytree of scalars).

    Mirrors the reference ``MPPICosts::CostParams`` struct
    (``costs.cuh:67-86``); defaults from ``launch/path_integral_nn.launch``.
    Because this is a pytree traced into the jitted solve, live tuning (the
    reference's dynamic_reconfigure path, ``costs.cu:75-87``) is free.
    """

    desired_speed: jnp.ndarray = 8.0
    speed_coeff: jnp.ndarray = 4.25
    track_coeff: jnp.ndarray = 200.0
    max_slip_ang: jnp.ndarray = 1.25
    slip_penalty: jnp.ndarray = 10.0
    track_slop: jnp.ndarray = 0.0
    crash_coeff: jnp.ndarray = 10000.0
    steering_coeff: jnp.ndarray = 0.0
    throttle_coeff: jnp.ndarray = 0.0
    boundary_threshold: jnp.ndarray = 0.65
    discount: jnp.ndarray = 0.1
    # Live obstacle positions for ObstacleCost: (capacity, 3) [x, y, radius]
    # (see costs/obstacles.py::make_obstacles) or None to use the cost
    # object's construction-time array.  A traced pytree leaf, so MOVING
    # obstacles update at pose rate with zero recompiles (capacity fixed).
    obstacles: Any = None
    # Runtime softmax-temperature override — an EXTENSION beyond the
    # reference's CostParams struct (the reference fixes gamma at launch,
    # path_integral_nn.launch).  None (default) uses the static
    # ``MPPIConfig.gamma``; a scalar here is traced into every solve path
    # (single-chip, sharded, ensemble, kernel-RNG), so live temperature
    # tuning — e.g. :class:`~autorally_tpu.runtime.ess_tuner.EssTuner`
    # holding the effective sample size in a target band — never
    # recompiles.
    gamma: Any = None

    def replace(self, **kw) -> "CostParams":
        return dataclasses.replace(self, **kw)


def effective_gamma(cfg: "MPPIConfig", cost_params: CostParams):
    """The softmax temperature a solve should use: the traced
    ``CostParams.gamma`` override when set, else the static config's."""
    return cfg.gamma if cost_params.gamma is None else cost_params.gamma


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    """Static solver configuration (shapes & compile-time switches).

    The reference splits these between roslaunch params
    (``path_integral_nn.launch``) and compile-time template arguments
    (``path_integral_main.cu:65-78``); here they are one static config that
    keys the jit cache.
    """

    num_rollouts: int = 1920          # K  (path_integral_main.cu:66)
    num_timesteps: int = 100          # T  (launch: num_timesteps)
    hz: int = 50
    optimization_stride: int = 1
    gamma: float = 0.15               # temperature
    num_iters: int = 1                # opt iterations per replan
    init_steering: float = 0.0
    init_throttle: float = 0.0
    steering_std: float = 0.275
    throttle_std: float = 0.3
    max_throttle: float = 0.65
    # Steering range and the throttle floor are fixed at +/-0.99 by the
    # reference (path_integral_main.cu:98) — see ``control_ranges``.
    l1_cost: bool = False             # L1 vs L2 speed cost (costs.cu:315-326)
    seed: int = 1234                  # reference cuRAND seed (mppi_controller.cu:331)
    use_feedback_gains: bool = True
    debug_mode: bool = False
    # Fraction of rollouts that are pure noise (mppi_controller.cu:141).
    pure_noise_frac: float = 0.99
    # lax.scan unroll factor for the horizon loops (TPU perf knob: merges
    # scan iterations to amortize per-step overhead; no semantic effect).
    scan_unroll: int = 10
    # Fused Pallas rollout kernel: None = auto (TPU + a model with an
    # in-kernel form (MLP or basis functions) + lane-aligned K),
    # True/False = force.  No semantic effect.
    use_pallas_rollout: bool = None
    # Exploration noise: 'gaussian' (reference protocol), 'colored'
    # (1/f^beta, noise_param = beta), or 'ou' (AR(1), noise_param = theta).
    noise_sampler: str = "gaussian"
    noise_param: float = 1.0
    # Generate noise inside the fused Pallas kernel (Box-Muller from the
    # Mosaic PRNG) with a two-pass weighted update: HBM traffic becomes
    # O(K), independent of K*T.  Requires TPU + an in-kernel model form +
    # gaussian sampler + either a NeuralCostmap or an exact Costmap that
    # fits the VMEM budget.  Different (equally valid) noise stream than
    # the jax.random path.
    kernel_rng: bool = False
    # Fuse the *exact* costmap lookup into the Pallas rollout kernel
    # (windowed VMEM-resident gather with a full-map exact fallback).
    # Applies when the padded map fits the VMEM budget; bit-matches the
    # scan path.  False falls back to dynamics-chain + XLA gather.
    exact_fused: bool = True
    # Dynamics matmul precision inside the Pallas kernels: 'highest' (true
    # f32, matches the scan path bit-for-bit), 'high' (3 bf16 passes), or
    # 'default' (fastest; ~28% faster chains at large K, trajectories
    # drift ~1e-2 relative over T=100 vs f32).
    matmul_precision: str = "highest"

    @property
    def dt(self) -> float:
        return 1.0 / self.hz

    @property
    def exploration_std(self) -> Tuple[float, float]:
        return (self.steering_std, self.throttle_std)

    @property
    def init_u(self) -> Tuple[float, float]:
        return (self.init_steering, self.init_throttle)

    @property
    def control_ranges(self) -> Tuple[Tuple[float, float], Tuple[float, float]]:
        """((steer_min, steer_max), (throttle_min, throttle_max)).

        Matches ``path_integral_main.cu:98`` which hard-codes steering to
        (-0.99, 0.99) and throttle to (-0.99, max_throttle).
        """
        return ((-0.99, 0.99), (-0.99, self.max_throttle))

    def replace(self, **kw) -> "MPPIConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# roslaunch XML loading (parity with param_getter.cpp:75-151)
# ---------------------------------------------------------------------------

_ENV_RE = re.compile(r"\$\(env\s+([A-Za-z_][A-Za-z0-9_]*)\)")
_FIND_RE = re.compile(r"\$\(find\s+([A-Za-z_][A-Za-z0-9_]*)\)")


def _substitute(value: str, env: Optional[Dict[str, str]] = None) -> str:
    """Expand ``$(env VAR)`` substitutions like ``param_getter.cpp:93-117``."""
    env = dict(os.environ) if env is None else env

    def env_repl(m: "re.Match[str]") -> str:
        return env.get(m.group(1), "")

    value = _ENV_RE.sub(env_repl, value)
    value = _FIND_RE.sub(lambda m: m.group(1), value)  # best-effort for $(find pkg)
    return value


def _coerce(value: str, type_hint: Optional[str]) -> Any:
    if type_hint == "int":
        return int(value)
    if type_hint == "double":
        return float(value)
    if type_hint == "bool":
        return value.strip().lower() in ("1", "true", "yes")
    if type_hint in ("str", "string"):
        return value
    # Untyped (path_integral_bf.launch omits types): infer.
    v = value.strip()
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    return value


def load_launch_params(path: str, node_name: str = "mppi_controller",
                       env: Optional[Dict[str, str]] = None) -> Dict[str, Any]:
    """Parse a roslaunch XML file into a flat param dict.

    Standalone-mode parity with ``param_getter.cpp:75-151`` (which reads the
    launch XML directly so the controller can run without a ROS master).
    """
    tree = ET.parse(path)
    params: Dict[str, Any] = {}
    for node in tree.getroot().iter("node"):
        if node.get("name") != node_name:
            continue
        for p in node.iter("param"):
            name = p.get("name")
            raw = _substitute(p.get("value", ""), env)
            params[name] = _coerce(raw, p.get("type"))
    return params


def config_from_params(params: Dict[str, Any]) -> Tuple[MPPIConfig, CostParams]:
    """Build the typed configs from a launch-file param dict."""
    cfg_kw = {}
    for src, dst in [
        ("hz", "hz"), ("num_timesteps", "num_timesteps"),
        ("optimization_stride", "optimization_stride"), ("gamma", "gamma"),
        ("num_iters", "num_iters"), ("init_steering", "init_steering"),
        ("init_throttle", "init_throttle"), ("steering_std", "steering_std"),
        ("throttle_std", "throttle_std"), ("max_throttle", "max_throttle"),
        ("l1_cost", "l1_cost"), ("use_feedback_gains", "use_feedback_gains"),
        ("debug_mode", "debug_mode"),
    ]:
        if src in params:
            cfg_kw[dst] = params[src]
    cfg = MPPIConfig(**cfg_kw)

    cost_kw = {}
    for src, dst in [
        ("desired_speed", "desired_speed"),
        ("speed_coefficient", "speed_coeff"),
        ("track_coefficient", "track_coeff"),
        ("max_slip_angle", "max_slip_ang"),
        ("slip_penalty", "slip_penalty"),
        ("track_slop", "track_slop"),
        ("crash_coeff", "crash_coeff"),
        ("steering_coeff", "steering_coeff"),
        ("throttle_coeff", "throttle_coeff"),
        ("boundary_threshold", "boundary_threshold"),
        ("discount", "discount"),
    ]:
        if src in params:
            cost_kw[dst] = float(params[src])
    costs = CostParams(**cost_kw)
    return cfg, costs
