"""autorally_tpu — a TPU-native Model Predictive Path Integral (MPPI) control framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the AutoRally
platform's path-integral controller (reference: rdesc/autorally,
``autorally_control/include/autorally_control/path_integral/``), built for
TPU hardware:

- Rollout sampling is a single jitted program (``solver.mppi``): noise
  generation, K parallel trajectory rollouts (``lax.scan`` over the horizon,
  batched over rollouts so the MLP dynamics run as MXU matmuls), softmax
  weighting and the weighted control update all stay on-device.  The
  reference CUDA pipeline performs three device->host round-trips per solve
  (``mppi_controller.cu:618-660``); here there are zero.
- Scaling is via ``jax.sharding``/``shard_map`` over a device mesh
  (``parallel.sharded``): rollouts shard across chips, and the only
  cross-chip communication is two scalar collectives (min for the cost
  baseline, sum for the softmax normalizer) plus one (T, C) weighted-sum
  all-reduce per optimization iteration.
- Feedback gains come from a scan-based iLQR/DDP solver in pure JAX
  (``solver.ddp``) replacing the reference's Eigen implementation
  (``autorally_control/include/autorally_control/ddp/ddp.h``).
- The real-time control loop, plant interfaces, ML training pipeline, and
  observability layers mirror the reference's behavior with typed configs
  instead of roslaunch XML (loaders for the reference's formats included).
"""

__version__ = "0.1.0"

from autorally_tpu.config import MPPIConfig, CostParams, load_launch_params

__all__ = [
    "MPPIConfig",
    "CostParams",
    "load_launch_params",
    "__version__",
]
