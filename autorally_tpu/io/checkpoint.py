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


def save_controller_state(cs: ControllerState, path: str) -> None:
    np.savez(path,
             U=np.asarray(cs.U),
             control_hist=np.asarray(cs.control_hist),
             state_solution=np.asarray(cs.state_solution),
             control_solution=np.asarray(cs.control_solution),
             key=np.asarray(cs.key))


def load_controller_state(path: str) -> ControllerState:
    import jax.numpy as jnp

    d = np.load(path)
    return ControllerState(
        U=jnp.asarray(d["U"]),
        control_hist=jnp.asarray(d["control_hist"]),
        state_solution=jnp.asarray(d["state_solution"]),
        control_solution=jnp.asarray(d["control_solution"]),
        key=jnp.asarray(d["key"]))


def save_tube_state(tube, path: str) -> None:
    """Checkpoint a deployed tube pair — both controllers' states in one
    ``.npz`` — so a tube deployment (the sequential loop's two
    :class:`~autorally_tpu.runtime.controller.Controller` objects or an
    :class:`~autorally_tpu.runtime.async_loop.AsyncTubeController`)
    resumes mid-plan.  ``tube``: anything with ``cs_a``/``cs_p``
    :class:`ControllerState` attributes."""
    flat = {}
    for tag, cs in (("a", tube.cs_a), ("p", tube.cs_p)):
        for field, v in cs._asdict().items():
            flat[f"{tag}_{field}"] = np.asarray(v)
    np.savez(path, **flat)


def load_tube_state(path: str):
    """-> (cs_actual, cs_predicted) from :func:`save_tube_state`."""
    import jax.numpy as jnp

    d = np.load(path)
    out = []
    for tag in ("a", "p"):
        out.append(ControllerState(
            **{f: jnp.asarray(d[f"{tag}_{f}"])
               for f in ControllerState._fields}))
    return tuple(out)
