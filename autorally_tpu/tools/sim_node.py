"""Standalone simulator node — the Gazebo-stand-in process.

The reference closes its loop across processes: the controller binary and
the Gazebo simulator exchange pose/command over ROS pub/sub.  This node
is that architecture without ROS: a separate OS process that integrates
the vehicle dynamics in real time (native pacer), publishes pose records
over UDP at the control rate, and applies whatever actuation commands
arrive — the counterpart of ``autorally_gazebo`` + the ground-truth
republisher for the UDP plant (``runtime/udp_plant.py``).

Run::

    python -m autorally_tpu.tools.sim_node --pose-port 47800 \
        --control-port 47801 [--model PATH | --physics] [--hz 50]

``--physics`` integrates the independent four-wheel physics model
(:mod:`autorally_tpu.sim`) instead of a learned dynamics model — the
closest equivalent of running against Gazebo.

Wire formats match :class:`autorally_tpu.runtime.udp_plant.UdpPlant`
(``fmt='state'``): pose out = 8 float32 [t, x, y, yaw, roll, u_x, u_y,
yaw_mder]; command in = 3 float32 [t, steering, throttle].
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from autorally_tpu.config import REFERENCE_NN_NPZ as DEFAULT_MODEL


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pose-port", type=int, default=47800,
                    help="UDP port the controller listens for poses on")
    ap.add_argument("--control-port", type=int, default=47801,
                    help="UDP port this node listens for commands on")
    ap.add_argument("--model", default=DEFAULT_MODEL)
    ap.add_argument("--physics", action="store_true",
                    help="integrate the independent four-wheel physics "
                         "model (autorally_tpu.sim) instead of the learned "
                         "dynamics — the Gazebo-oracle configuration")
    ap.add_argument("--urdf", default=None,
                    help="vehicle description file for --physics (defaults "
                         "to the bundled assets/autorally_platform.urdf)")
    ap.add_argument("--world", default=None,
                    help="world JSON (spawn pose + surface friction "
                         "override); overrides --start")
    ap.add_argument("--hz", type=int, default=50)
    ap.add_argument("--duration", type=float, default=30.0,
                    help="seconds of simulated driving (<=0: forever)")
    ap.add_argument("--start", default="30,0,1.5708,0,0,0,0",
                    help="initial state CSV [x,y,yaw,roll,ux,uy,yaw_mder]")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--log", default=None,
                    help="write a multi-topic JSONL log (the 'rosbag "
                         "record' role): ground_truth/state at the sim "
                         "rate, chassisState at half rate, wheelSpeeds at "
                         "a fifth — feeds autorally_tpu.ml.ingest")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from autorally_tpu.models import NeuralNetDynamics
    from autorally_tpu.runtime.native import Pacer, Ring, UdpLink

    dt = 1.0 / args.hz
    state = np.array([float(v) for v in args.start.split(",")],
                     dtype=np.float32)
    world = None
    if args.world is not None:
        from autorally_tpu.sim.description import load_world

        world = load_world(args.world)
        state = np.zeros(7, dtype=np.float32)
        state[0], state[1], state[2] = (world.spawn_x, world.spawn_y,
                                        world.spawn_yaw)

    if args.physics:
        from autorally_tpu.sim.description import (
            DEFAULT_URDF, load_urdf, vehicle_params_from_description)
        from autorally_tpu.sim.vehicle import (controller_state,
                                               init_sim_state, vehicle_step)

        overrides = {}
        if world is not None and world.mu is not None:
            overrides["mu"] = world.mu
        vp = vehicle_params_from_description(
            load_urdf(args.urdf or DEFAULT_URDF), **overrides)
        sim_state = init_sim_state(x=float(state[0]), y=float(state[1]),
                                   yaw=float(state[2]), vx=float(state[4]))
        phys_step = jax.jit(
            lambda s, cmd: vehicle_step(vp, s, cmd, dt, 20))

        def step(s7, u):
            nonlocal sim_state
            cmd = jnp.asarray([u[0], u[1], 0.0], dtype=jnp.float32)
            sim_state = phys_step(sim_state, cmd)
            return controller_state(sim_state)
    else:
        model = NeuralNetDynamics(dt)
        params = model.load_params(args.model)

        @jax.jit
        def step(s, u):
            s_next, _ = model.update_state(params, s, u)
            return s_next
    ctrl_ring = Ring(capacity=64, record_len=3)
    ctrl_link = UdpLink(args.control_port, ctrl_ring)
    pacer = Pacer(dt)

    u = np.zeros(2, dtype=np.float32)
    t = 0.0
    n_ticks = int(args.duration * args.hz) if args.duration > 0 else -1
    log = open(args.log, "w") if args.log else None

    def log_topics(i):
        """Emit rosbag-record-style per-topic rows at distinct rates
        (ground-truth odometry with quaternion orientation, chassis
        actuation, wheel speeds) so the ingest pipeline has real
        multi-rate merging to do (process_bag.py role)."""
        import json as _json
        import math as _math

        secs = int(t)
        nsecs = int(round((t - secs) * 1e9))
        hy, hr = 0.5 * float(state[2]), 0.5 * float(state[3])
        cy, sy = _math.cos(hy), _math.sin(hy)
        cr, sr = _math.cos(hr), _math.sin(hr)
        # q = qz(yaw) * qx(roll), pitch = 0  (R = Rz Ry Rx convention)
        log.write(_json.dumps({
            "topic": "ground_truth/state", "secs": secs, "nsecs": nsecs,
            "x": float(state[0]), "y": float(state[1]), "z": 0.0,
            "qx": cy * sr, "qy": sy * sr, "qz": sy * cr, "qw": cy * cr,
            "u_x": float(state[4]), "u_y": float(state[5]),
            "yaw_mder": float(state[6])}) + "\n")
        if i % 2 == 0:
            log.write(_json.dumps({
                "topic": "chassisState", "secs": secs, "nsecs": nsecs,
                "steering": float(u[0]), "throttle": float(u[1]),
                "frontBrake": 0.0}) + "\n")
        if i % 5 == 0:
            if args.physics:
                w = np.asarray(sim_state.omega) * 0.095
            else:
                w = np.full(4, float(state[4]))
            log.write(_json.dumps({
                "topic": "wheelSpeeds", "secs": secs, "nsecs": nsecs,
                "lfSpeed": float(w[0]), "rfSpeed": float(w[1]),
                "lbSpeed": float(w[2]), "rbSpeed": float(w[3])}) + "\n")

    print(f"sim_node: {args.hz} Hz, pose->127.0.0.1:{args.pose_port}, "
          f"cmd<-:{args.control_port}", flush=True)
    try:
        i = 0
        while n_ticks < 0 or i < n_ticks:
            pacer.wait()
            rec = ctrl_ring.pop_latest()
            if rec is not None:
                u = np.asarray(rec[1:3], dtype=np.float32)
            state = np.asarray(step(jnp.asarray(state), jnp.asarray(u)))
            t += dt
            UdpLink.send(args.pose_port,
                         np.concatenate([[t], state]).astype(np.float32))
            if log is not None:
                log_topics(i)
            i += 1
    except KeyboardInterrupt:
        pass
    finally:
        ctrl_link.close()
        pacer.close()
        if log is not None:
            log.close()
    print(f"sim_node: done at t={t:.2f}s pos=({state[0]:.2f},{state[1]:.2f}) "
          f"speed={state[4]:.2f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
