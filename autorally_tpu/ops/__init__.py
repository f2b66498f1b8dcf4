"""Low-level TPU ops: Pallas kernels for the MPPI hot path."""

from autorally_tpu.ops.rollout_kernel import (dynamics_chain_pallas,
                                              pallas_supported)

__all__ = ["dynamics_chain_pallas", "pallas_supported"]
