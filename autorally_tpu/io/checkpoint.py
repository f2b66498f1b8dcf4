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
