"""Four-wheel rigid-body vehicle model — the independent physics oracle.

This is a first-principles re-creation of the physics Gazebo provides for
the reference: a planar rigid body with roll, four wheels with spin
dynamics and slip-based tire forces, a rate-limited steering servo, and
effort-controlled axles.  Parameters come from the reference's URDF
(``autorally_description/urdf/autoRallyPlatform.urdf.xacro``: chassis
mass 20.5 kg, wheelbase 0.570 m, hub distance 0.4 m, tire Ø 0.19 m,
tire friction mu1=0.7, CoM height 0.12 m, shock positions 0.34/0.23 m)
and from the Gazebo controller node's actuation mapping
(``autorally_gazebo/nodes/autorally_controller.py:268-271``: rear axle
effort 8·throttle forward / 4·throttle braking, front brake effort 2.5,
steering range ±25°).

It deliberately shares NOTHING with the controller's dynamics families
(``models/neural_net.py``, ``models/basis_function.py``): the state is
wheel-level (13 components incl. four wheel speeds and the steering
angle), forces come from a brush tire model with a friction ellipse, and
integration runs sub-stepped semi-implicit Euler.  Closed-loop results
against this plant therefore measure the controller under genuine model
mismatch — the role Gazebo plays for the reference (SURVEY.md §4).

Everything is pure JAX and jittable, so the model serves both the
host-side sim node (50 Hz real time) and fully on-device episode rollers.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    names = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_pytree_node(
        cls,
        lambda o: (tuple(getattr(o, n) for n in names), None),
        lambda _, c: cls(*c))
    return cls


@_pytree_dataclass
class VehicleParams:
    """Physical parameters (defaults = reference URDF / Gazebo node)."""

    mass: float = 23.9            # chassis 20.5 + 4 wheels (~3.4) [kg]
    izz: float = 1.2              # yaw inertia (box estimate; the URDF's
    #                               token value is non-physical)
    ixx: float = 0.35             # roll inertia
    wheelbase: float = 0.570      # urdf wheelbase
    a: float = 0.34               # CoM -> front axle (cm_to_front_shock)
    b: float = 0.23               # CoM -> rear axle  (cm_to_rear_shock)
    track: float = 0.4            # hex_hub_dist
    h_cg: float = 0.12            # chassis_cm_height
    wheel_radius: float = 0.095   # tire_dia / 2
    wheel_inertia: float = 0.004  # cylinder, rear wheel mass 0.89
    wheel_damping: float = 0.001  # urdf axle joint damping
    wheel_friction: float = 0.05  # rolling resistance torque scale [N m]
    mu: float = 0.7               # urdf mu1 (dirt-like)
    c_alpha: float = 6.0          # cornering stiffness per unit load [/rad]
    c_slip: float = 9.0           # longitudinal stiffness per unit slip
    v_ref: float = 0.4            # low-speed slip regularization [m/s]
    drag: float = 0.7             # aero drag F = -drag*vx*|vx|

    max_steer: float = math.radians(25.0)   # controller node :358
    steer_sign: float = -1.0      # steer_ang = -25deg*cmd (node :358)
    servo_tau: float = 0.08      # steering joint lag (damping-88 joint)
    servo_rate: float = 6.0       # max steering rate [rad/s]

    rear_effort: float = 8.0      # rear_axle_max_effort (node :273)
    rear_brake_effort: float = 4.0
    front_brake_effort: float = 2.5

    roll_k: float = 80.0          # shock roll stiffness [N m/rad]
    roll_c: float = 6.0           # shock roll damping

    def replace(self, **kw) -> "VehicleParams":
        return dataclasses.replace(self, **kw)


class SimState(NamedTuple):
    """Wheel-level vehicle state (a pytree of scalars + (4,) wheels)."""

    x: jnp.ndarray
    y: jnp.ndarray
    yaw: jnp.ndarray
    roll: jnp.ndarray
    roll_rate: jnp.ndarray
    vx: jnp.ndarray               # body longitudinal velocity
    vy: jnp.ndarray               # body lateral velocity
    yaw_rate: jnp.ndarray
    steer: jnp.ndarray            # virtual front steering angle [rad]
    omega: jnp.ndarray            # (4,) wheel spin [lf, rf, lr, rr] [rad/s]


def init_sim_state(x=0.0, y=0.0, yaw=0.0, vx=0.0) -> SimState:
    z = lambda v: jnp.asarray(v, dtype=jnp.float32)
    return SimState(x=z(x), y=z(y), yaw=z(yaw), roll=z(0.0),
                    roll_rate=z(0.0), vx=z(vx), vy=z(0.0), yaw_rate=z(0.0),
                    steer=z(0.0),
                    omega=jnp.full((4,), vx / 0.095, dtype=jnp.float32))


def controller_state(s: SimState) -> jnp.ndarray:
    """The controller's 7-state [x, y, yaw, roll, u_x, u_y, yaw_mder].

    ``yaw_mder`` uses the plant's negated convention
    (``autorally_plant.cpp:212``): the controller state carries -yaw_rate.
    """
    return jnp.stack([s.x, s.y, s.yaw, s.roll, s.vx, s.vy, -s.yaw_rate])


def _wheel_steer(p: VehicleParams, steer: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-wheel Ackermann angles (left, right) for virtual angle
    ``steer`` (``_ctrl_steering``, autorally_controller.py:497-521)."""
    tan_s = jnp.tan(steer)
    safe = jnp.where(jnp.abs(tan_s) < 1e-6, 1e-6, tan_s)
    center_y = p.wheelbase / safe                 # signed turn-center offset
    d_l = jnp.arctan(p.wheelbase / (center_y - p.track / 2))
    d_r = jnp.arctan(p.wheelbase / (center_y + p.track / 2))
    small = jnp.abs(steer) < 1e-4
    return (jnp.where(small, steer, d_l), jnp.where(small, steer, d_r))


def _substep(p: VehicleParams, s: SimState, cmd: jnp.ndarray,
             dt: float) -> SimState:
    """One semi-implicit Euler physics substep.

    ``cmd``: [steer_cmd, throttle_cmd, front_brake] with the chassis
    command ranges [-1, 1] / [0, 1].
    """
    steer_cmd, throttle, front_brake = cmd[0], cmd[1], cmd[2]

    # --- steering servo (position-controlled joint -> first-order lag
    #     with rate limit) --------------------------------------------------
    steer_des = p.steer_sign * p.max_steer * jnp.clip(steer_cmd, -1.0, 1.0)
    d_steer = jnp.clip((steer_des - s.steer) / p.servo_tau,
                       -p.servo_rate, p.servo_rate)
    steer = s.steer + d_steer * dt

    d_l, d_r = _wheel_steer(p, steer)
    # wheel layout [lf, rf, lr, rr]; body frame: x forward, y left
    wx = jnp.array([1.0, 1.0, -1.0, -1.0]) * jnp.array(
        [p.a, p.a, p.b, p.b])
    wy = jnp.array([1.0, -1.0, 1.0, -1.0]) * (p.track / 2)
    delta = jnp.stack([d_l, d_r, jnp.zeros_like(d_l), jnp.zeros_like(d_l)])

    # --- contact-point velocities in tire frames --------------------------
    vcx = s.vx - s.yaw_rate * wy
    vcy = s.vy + s.yaw_rate * wx
    cd, sd = jnp.cos(delta), jnp.sin(delta)
    v_long = cd * vcx + sd * vcy
    v_lat = -sd * vcx + cd * vcy
    v_den = jnp.maximum(jnp.abs(v_long), p.v_ref)

    # --- normal loads: static split + lateral/longitudinal transfer -------
    g = 9.81
    ay_est = s.yaw_rate * s.vx
    fz_front = p.mass * g * p.b / p.wheelbase / 2
    fz_rear = p.mass * g * p.a / p.wheelbase / 2
    fz_static = jnp.array([1.0, 1.0, 0.0, 0.0]) * fz_front + \
        jnp.array([0.0, 0.0, 1.0, 1.0]) * fz_rear
    dfz_lat = p.mass * ay_est * p.h_cg / p.track / 2
    fz = jnp.maximum(fz_static - jnp.sign(wy) * dfz_lat, 0.1)

    # --- drive / brake torques (autorally_controller.py:268-271, 383-391;
    #     effort published identically to both wheels of an axle) ----------
    rear_tau = jnp.where(throttle >= 0.0, p.rear_effort * throttle,
                         p.rear_brake_effort * throttle)
    front_ws = (s.omega[0] + s.omega[1]) * p.wheel_radius / 2
    front_tau = -jnp.sign(front_ws) * p.front_brake_effort * \
        jnp.clip(front_brake, 0.0, 1.0)
    tau = jnp.stack([front_tau, front_tau, rear_tau, rear_tau])

    # --- wheel spin: semi-implicit in the slip force ----------------------
    # Fx = k (omega r - v_long) / v_den with k = c_slip * fz; solving the
    # spin update implicitly keeps the stiff wheel/slip coupling stable at
    # 1 kHz substeps.
    k = p.c_slip * fz
    r, iw = p.wheel_radius, p.wheel_inertia
    denom = 1.0 + dt * (r * r * k / v_den + p.wheel_damping) / iw
    rolling = p.wheel_friction * jnp.tanh(s.omega * 0.5)
    omega = (s.omega + dt / iw * (tau - rolling + r * k * v_long / v_den)) \
        / denom

    # --- tire forces with friction ellipse --------------------------------
    slip = (omega * r - v_long) / v_den
    fx0 = k * slip
    alpha = jnp.arctan(v_lat / v_den)
    fy0 = -p.c_alpha * fz * jnp.tan(alpha)
    f_mag = jnp.sqrt(fx0 * fx0 + fy0 * fy0) + 1e-6
    scale = jnp.minimum(1.0, p.mu * fz / f_mag)
    fx_t, fy_t = fx0 * scale, fy0 * scale

    fx_b = cd * fx_t - sd * fy_t
    fy_b = sd * fx_t + cd * fy_t

    # --- rigid-body update -------------------------------------------------
    fx_tot = jnp.sum(fx_b) - p.drag * s.vx * jnp.abs(s.vx)
    fy_tot = jnp.sum(fy_b)
    mz = jnp.sum(wx * fy_b - wy * fx_b)

    ax = fx_tot / p.mass + s.yaw_rate * s.vy
    ay = fy_tot / p.mass - s.yaw_rate * s.vx
    vx = s.vx + ax * dt
    vy = s.vy + ay * dt
    yaw_rate = s.yaw_rate + mz / p.izz * dt

    # roll from lateral load on the sprung mass through the shocks
    roll_acc = (-p.mass * (fy_tot / p.mass) * p.h_cg
                - p.roll_k * s.roll - p.roll_c * s.roll_rate) / p.ixx
    roll_rate = s.roll_rate + roll_acc * dt
    roll = s.roll + roll_rate * dt

    cy, sy = jnp.cos(s.yaw), jnp.sin(s.yaw)
    x = s.x + (vx * cy - vy * sy) * dt
    y = s.y + (vx * sy + vy * cy) * dt
    yaw = s.yaw + yaw_rate * dt

    return SimState(x=x, y=y, yaw=yaw, roll=roll, roll_rate=roll_rate,
                    vx=vx, vy=vy, yaw_rate=yaw_rate, steer=steer,
                    omega=omega)


def vehicle_step(p: VehicleParams, s: SimState, cmd: jnp.ndarray,
                 dt: float, n_sub: int = 20) -> SimState:
    """Advance one control period ``dt`` with ``n_sub`` physics substeps.

    Jittable (``dt``/``n_sub`` static).  ``cmd`` = [steering, throttle,
    front_brake] in chassis-command units.
    """
    cmd = jnp.asarray(cmd, dtype=jnp.float32)
    sub = dt / n_sub

    def body(carry, _):
        return _substep(p, carry, cmd, sub), None

    out, _ = jax.lax.scan(body, s, None, length=n_sub)
    return out
