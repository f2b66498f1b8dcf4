"""Checkpointing and interchange IO."""

from autorally_tpu.io.checkpoint import (load_controller_state,
                                         save_controller_state)

__all__ = ["save_controller_state", "load_controller_state"]
