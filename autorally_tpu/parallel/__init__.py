"""Multi-chip sharding: mesh utilities and the sharded MPPI solvers."""

from autorally_tpu.parallel.mesh import make_mesh, rollout_mesh
from autorally_tpu.parallel.sharded import ShardedMPPISolver
from autorally_tpu.parallel.ensemble_sharded import EnsembleShardedMPPISolver

__all__ = ["make_mesh", "rollout_mesh", "ShardedMPPISolver",
           "EnsembleShardedMPPISolver"]
