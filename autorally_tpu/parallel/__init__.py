"""Multi-chip sharding: mesh utilities and the sharded MPPI solver."""

from autorally_tpu.parallel.mesh import make_mesh, rollout_mesh
from autorally_tpu.parallel.sharded import ShardedMPPISolver

__all__ = ["make_mesh", "rollout_mesh", "ShardedMPPISolver"]
