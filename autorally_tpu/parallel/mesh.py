"""Device-mesh construction helpers.

The reference has no multi-device compute (SURVEY.md §2.4); its one
parallel axis — K rollouts over CUDA blocks — maps here to a 1-D
``rollouts`` mesh axis spanning every chip (ICI within a slice, DCN across
hosts, both handled by XLA collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


ROLLOUT_AXIS = "rollouts"


def rollout_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the given) devices along the rollouts axis."""
    devices = jax.devices() if devices is None else list(devices)
    return Mesh(np.array(devices), (ROLLOUT_AXIS,))


def make_mesh(shape: Sequence[int], axis_names: Sequence[str],
              devices: Optional[Sequence] = None) -> Mesh:
    """N-D mesh, e.g. ``make_mesh((hosts, chips), ('dp', 'rollouts'))``."""
    devices = jax.devices() if devices is None else list(devices)
    n = int(np.prod(shape))
    if n != len(devices):
        raise ValueError(f"mesh shape {tuple(shape)} needs {n} devices, "
                         f"have {len(devices)}")
    return Mesh(np.array(devices).reshape(shape), tuple(axis_names))
