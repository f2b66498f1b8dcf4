"""Multi-host setup: jax.distributed bootstrap + host-aware meshes.

The reference has no multi-node compute (SURVEY.md §2.4); its scale story
ends at one GPU.  This framework's scale axis is the rollouts mesh, and
crossing hosts changes nothing in solver code — the same ``shard_map``
program runs over a mesh whose devices span hosts, with XLA routing the
``pmin``/``psum`` collectives over ICI within a slice and DCN between
hosts.  What multi-host *does* need is process bootstrap and a mesh whose
axis order keeps the heavy axis on ICI:

- the rollouts axis varies fastest within a host (ICI) so the weighted-
  sum all-reduce rides the fast fabric;
- an optional ensemble axis maps across hosts (members never exchange
  data except through the final scalar reductions, so DCN latency is
  irrelevant to it).

Typical launch (one process per host)::

    from autorally_tpu.parallel.multihost import (initialize,
                                                  multihost_rollout_mesh)
    initialize(coordinator="10.0.0.1:8476", num_processes=4, process_id=i)
    mesh = multihost_rollout_mesh()
    solver = ShardedMPPISolver(model, cost, cfg, mesh=mesh)

Every process executes the same program; inputs are replicated (the
controller state is tiny) and each device computes its rollout shard.
The only state I/O (pose in, control out) happens on process 0 — exactly
the SURVEY.md §5 recommendation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh

from autorally_tpu.parallel.mesh import ROLLOUT_AXIS


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               initialization_timeout: Optional[float] = None) -> None:
    """Bootstrap the jax.distributed runtime (no-op if single-process or
    already initialized).

    ``initialization_timeout``: seconds a non-coordinator process waits
    for the coordinator before failing (default: jax's, 300 s).
    """
    if num_processes is None or num_processes <= 1:
        return
    # Idempotent bootstrap: re-init after a successful init is a no-op.
    # Everything else — bad coordinator address, wrong process count,
    # called too late — must surface, not silently leave the process
    # single-host (round-2 advisor finding).
    if jax.distributed.is_initialized():
        return
    kw = {}
    if initialization_timeout is not None:
        kw["initialization_timeout"] = int(initialization_timeout)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def multihost_rollout_mesh() -> Mesh:
    """1-D rollouts mesh over every device of every host, ordered so
    devices of the same host are adjacent (collectives stay on ICI for
    the intra-host segments of the ring)."""
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devices), (ROLLOUT_AXIS,))


def multihost_ensemble_mesh(ensemble_axis: str = "ensemble",
                            rollout_axis: str = ROLLOUT_AXIS) -> Mesh:
    """2-D (hosts x local-devices) mesh: ensemble members across hosts
    (DCN-tolerant), rollouts across each host's local devices (ICI)."""
    n_hosts = jax.process_count()
    per_host = jax.local_device_count()
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    grid = np.array(devices).reshape(n_hosts, per_host)
    return Mesh(grid, (ensemble_axis, rollout_axis))


def is_primary() -> bool:
    """True on the host that owns state I/O (pose in / control out)."""
    return jax.process_index() == 0
