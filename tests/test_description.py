"""Scene description tests (autorally_description role): the bundled
URDF must parse into the platform's published constants, map onto the
physics oracle's parameters and the sensor rig, reject malformed
documents, and drive the actual simulator; worlds round-trip as JSON."""

import math
import os

import numpy as np
import pytest

from autorally_tpu.sim.description import (DEFAULT_URDF, DescriptionError,
                                           WorldDescription, load_urdf,
                                           load_world, save_world,
                                           sensor_config_from_description,
                                           vehicle_params_from_description)


def test_bundled_urdf_matches_platform_spec():
    desc = load_urdf(DEFAULT_URDF)
    assert desc.name == "autorally_platform"
    assert desc.chassis_mass == 20.5
    assert abs(desc.total_mass - 23.92) < 1e-9     # + 2x0.82 + 2x0.89
    assert abs(desc.wheelbase - 0.570) < 1e-9
    assert abs(desc.track - 0.40) < 1e-9
    assert desc.wheel_radius == 0.095
    assert abs(desc.max_steer - math.radians(25.0)) < 1e-3
    assert desc.mu == 0.7
    assert desc.com_height == 0.12
    assert desc.axle_effort == 8.0


def test_bundled_urdf_sensor_rig():
    desc = load_urdf(DEFAULT_URDF)
    assert desc.sensors["imu"].update_rate == 200.0
    assert desc.sensors["gps"].update_rate == 20.0
    assert desc.sensors["stereo_camera"].update_rate == 60.0
    cfg = sensor_config_from_description(desc, control_hz=50.0)
    assert cfg.accel_noise == 0.2
    assert cfg.gyro_noise == 0.02
    assert cfg.gps_noise == 0.15
    # 20 Hz GPS at a 50 Hz control rate -> every 2-3 ticks
    assert cfg.gps_every in (2, 3)


def test_vehicle_params_mapping_and_override():
    desc = load_urdf(DEFAULT_URDF)
    vp = vehicle_params_from_description(desc)
    assert abs(vp.mass - 23.92) < 1e-9
    assert abs(vp.wheelbase - 0.570) < 1e-9
    assert vp.a == 0.34 and vp.b == 0.23
    assert vp.mu == 0.7
    vp2 = vehicle_params_from_description(desc, mu=0.4)
    assert vp2.mu == 0.4


def test_description_drives_the_physics_sim():
    import jax.numpy as jnp

    from autorally_tpu.sim.vehicle import (controller_state, init_sim_state,
                                           vehicle_step)

    vp = vehicle_params_from_description(load_urdf(DEFAULT_URDF))
    s = init_sim_state(x=0.0, y=0.0, yaw=0.0, vx=0.0)
    cmd = jnp.asarray([0.0, 0.5, 0.0], jnp.float32)
    for _ in range(50):                        # 1 s of full throttle
        s = vehicle_step(vp, s, cmd, 0.02, 10)
    out = np.asarray(controller_state(s))
    assert out[4] > 1.0                        # accelerates forward
    assert np.isfinite(out).all()


def test_malformed_urdf_rejected(tmp_path):
    bad = tmp_path / "bad.urdf"
    bad.write_text("<robot name='x'><link name='chassis'>"
                   "<inertial><mass value='1'/></inertial></link></robot>")
    with pytest.raises(DescriptionError):
        load_urdf(str(bad))
    notrobot = tmp_path / "notrobot.urdf"
    notrobot.write_text("<material name='x'/>")
    with pytest.raises(DescriptionError):
        load_urdf(str(notrobot))


def test_world_roundtrip_and_validation(tmp_path):
    w = WorldDescription(name="ccrf", track="maps/ccrf.npz",
                         spawn_x=1.0, spawn_y=-2.0, spawn_yaw=0.5,
                         mu=0.55, desired_speed=8.0)
    path = str(tmp_path / "ccrf.json")
    save_world(w, path)
    assert load_world(path) == w
    import json

    with open(path) as f:
        doc = json.load(f)
    doc["gravity"] = -9.8
    with open(path, "w") as f:
        json.dump(doc, f)
    with pytest.raises(DescriptionError):
        load_world(path)


def test_sim_node_accepts_urdf_and_world(tmp_path):
    """The sim node constructs its plant from the scene description
    (the roslaunch spawn path)."""
    import subprocess
    import sys

    world = tmp_path / "w.json"
    save_world(WorldDescription(spawn_x=3.0, spawn_y=4.0, spawn_yaw=0.0),
               str(world))
    out = subprocess.run(
        [sys.executable, "-m", "autorally_tpu.tools.sim_node", "--cpu",
         "--physics", "--urdf", DEFAULT_URDF, "--world", str(world),
         "--duration", "0.3", "--hz", "20",
         "--pose-port", "48890", "--control-port", "48891"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "done at" in out.stdout
    assert "pos=(3.00,4.00" in out.stdout.replace(" ", "").replace(
        "pos=(", "pos=(") or "3.0" in out.stdout


def test_default_urdf_exists_in_package():
    assert os.path.exists(DEFAULT_URDF)
