"""Plant over the independent physics vehicle.

Drop-in alternative to :class:`autorally_tpu.runtime.plant.SyntheticPlant`
that integrates the first-principles four-wheel model instead of a
``Dynamics``-family model, so closed-loop evaluation faces genuine model
mismatch (the role of Gazebo + the ground-truth republisher for the
reference, ``autorally_gazebo/nodes/``).
"""

from __future__ import annotations

import numpy as np

from autorally_tpu.runtime.plant import BasePlant
from autorally_tpu.sim.actuation import (ActuationLimits, SimCommand,
                                         SimCommandArbiter, wheel_speeds)
from autorally_tpu.sim.vehicle import (SimState, VehicleParams,
                                       controller_state, init_sim_state,
                                       vehicle_step)


class SimVehiclePlant(BasePlant):
    """Closed-loop plant simulated with the wheel-level physics model.

    ``step_sim`` advances one control period: the controller's last
    published command goes through the sim-side arbiter (priority +
    staleness + runstop, like the Gazebo node), drives the physics, and
    the resulting pose re-enters the control pipeline.
    """

    def __init__(self, init_state: np.ndarray, dt: float,
                 num_timesteps: int, params: VehicleParams = VehicleParams(),
                 n_sub: int = 20, **kw):
        super().__init__(dt, num_timesteps, **kw)
        self.params = params
        self.n_sub = int(n_sub)
        x, y, yaw = (float(init_state[0]), float(init_state[1]),
                     float(init_state[2]))
        vx = float(init_state[4]) if len(init_state) > 4 else 0.0
        self.sim_state: SimState = init_sim_state(x=x, y=y, yaw=yaw, vx=vx)
        self.sim_time = 0.0
        self.arbiter = SimCommandArbiter(["mppi"], ActuationLimits())
        self._jit_step = None

    def _step_fn(self):
        if self._jit_step is None:
            import jax

            @jax.jit
            def f(p, s, cmd):
                return vehicle_step(p, s, cmd, self.dt, self.n_sub)

            self._jit_step = f
        return self._jit_step

    def on_control(self, t: float, steering: float, throttle: float) -> None:
        self.arbiter.put_command(SimCommand(
            sender="mppi", steering=steering, throttle=throttle, stamp=t))

    def step_sim(self, n_steps: int = 1) -> None:
        import jax.numpy as jnp

        step = self._step_fn()
        for _ in range(n_steps):
            s_cmd, t_cmd, b_cmd, _ = self.arbiter.arbitrate(self.sim_time)
            cmd = jnp.asarray([s_cmd, t_cmd, b_cmd], dtype=jnp.float32)
            self.sim_state = step(self.params, self.sim_state, cmd)
            self.sim_time += self.dt
            s7 = np.asarray(controller_state(self.sim_state),
                            dtype=np.float32)
            self.receive_state_vector(self.sim_time, s7)

    @property
    def true_state(self) -> np.ndarray:
        return np.asarray(controller_state(self.sim_state), dtype=np.float32)

    def wheel_speeds(self) -> np.ndarray:
        return wheel_speeds(self.params, self.sim_state)
