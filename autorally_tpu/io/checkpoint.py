"""Controller-state checkpoint/resume.

The reference controller has no checkpointing — restart IS its recovery
(SURVEY.md §5) because state is only the 2 s control horizon.  Cheap to do
better: the :class:`ControllerState` pytree (plan, control history,
solutions, PRNG key) round-trips through ``.npz``, so a controller process
can resume mid-plan after a crash or migrate hosts.  Model checkpointing
lives with the models (``NeuralNetDynamics.save_params`` — the reference
``.npz`` interchange, ``utils.py:68-90``).
"""

from __future__ import annotations

import numpy as np

from autorally_tpu.solver.mppi import ControllerState


def _flatten(cs: ControllerState, prefix: str = "") -> dict:
    """One serialization convention for every checkpoint in this module:
    ``_fields``-driven, so a future ``ControllerState`` field is carried
    by ALL savers or by none (never a silent divergence between the
    single-state and tube formats)."""
    return {prefix + f: np.asarray(v) for f, v in cs._asdict().items()}


def _unflatten(d, prefix: str = "") -> ControllerState:
    import jax.numpy as jnp

    return ControllerState(**{f: jnp.asarray(d[prefix + f])
                              for f in ControllerState._fields})


def save_controller_state(cs: ControllerState, path: str) -> None:
    np.savez(path, **_flatten(cs))


def load_controller_state(path: str) -> ControllerState:
    # materialize inside the context — _unflatten reads lazily from the
    # NpzFile's zip handle (round-4 advisor finding)
    with np.load(path) as d:
        return _unflatten(d)


def _tube_pair(tube):
    """Accepts an ``AsyncTubeController`` (``cs_a``/``cs_p``), a pair of
    :class:`~autorally_tpu.runtime.controller.Controller` objects (the
    sequential loop's actual/predicted, each owning ``.cs``), or a pair
    of raw :class:`ControllerState`."""
    if hasattr(tube, "cs_a"):
        return tube.cs_a, tube.cs_p
    a, p = tube
    return (a.cs if hasattr(a, "cs") else a), (p.cs if hasattr(p, "cs") else p)


def save_tube_state(tube, path: str) -> None:
    """Checkpoint a deployed tube pair — both controllers' states in one
    ``.npz`` — so a tube deployment resumes mid-plan.  ``tube``: an
    :class:`~autorally_tpu.runtime.async_loop.AsyncTubeController`, an
    ``(actual, predicted)`` pair of the sequential loop's
    :class:`~autorally_tpu.runtime.controller.Controller` objects, or a
    pair of raw :class:`ControllerState`."""
    cs_a, cs_p = _tube_pair(tube)
    np.savez(path, **_flatten(cs_a, "a_"), **_flatten(cs_p, "p_"))


def load_tube_state(path: str):
    """-> (cs_actual, cs_predicted) from :func:`save_tube_state`."""
    with np.load(path) as d:
        return _unflatten(d, "a_"), _unflatten(d, "p_")
