"""Scene camera: rendered frames close the exposure loop end-to-end.

The round-4 "partial" (SURVEY §2.3 cameras): every consumer of camera
frames was ported but nothing produced a scene image.  These tests pin
the producer — the ground-plane rasterizer renders the TRACK the car is
on, the exposure controller reacts to driving into a rendered shadow,
and the frames flow through the ImageRepublisher into the console's
image panel (the OCS view, ``autorally_core/src/ocs/``).
"""

import math

import numpy as np
import pytest

from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.tools.track_generator import oval_track
from autorally_tpu.vision.auto_balance import (AutoBalanceConfig,
                                               CameraAutoBalance)
from autorally_tpu.vision.scene_camera import (SceneCamera, SceneConfig,
                                               SceneRenderer, ascii_frame)


@pytest.fixture(scope="module")
def costmap():
    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=6.0, ppm=4.0)
    return make_costmap(data, xb, yb)


def test_renderer_shows_the_track(costmap):
    """From the right apex heading +y, the lower image rows must sample
    asphalt (dark) and the upper rows sky (bright); looking from the
    infield outward, grass dominates the mid-field."""
    r = SceneRenderer(costmap, SceneConfig(width=160, height=120))
    img = r.radiance((30.0, 0.0, math.pi / 2))      # on-track, along it
    lum = img.mean(axis=2)
    sky = lum[:20].mean()
    # median: the bright painted centerline underfoot is a minority of
    # road pixels but would skew a mean
    road = np.median(lum[-30:])
    assert sky > 0.6, f"sky too dark: {sky}"
    assert road < 0.35, f"road not asphalt-dark: {road}"
    # the centerline stripe is present and bright
    assert lum[-30:].max() > 0.7
    # off-track view from the map center: grass reflectance in mid-rows
    img2 = r.radiance((0.0, 0.0, 0.0))
    mid = img2[70:110]
    # grass is green-dominant in BGR
    assert mid[..., 1].mean() > mid[..., 0].mean()


def test_renderer_pose_changes_frame(costmap):
    r = SceneRenderer(costmap, SceneConfig())
    a = r.radiance((30.0, 0.0, math.pi / 2))
    b = r.radiance((30.0, 0.0, -math.pi / 2))
    assert np.abs(a - b).mean() > 0.01


def test_shadow_darkens_scene(costmap):
    shadow = (30.0, 10.0, 6.0, 0.25)
    lit = SceneRenderer(costmap, SceneConfig())
    shd = SceneRenderer(costmap, SceneConfig(shadows=(shadow,)))
    pose = (30.0, 6.0, math.pi / 2)                 # shadow dead ahead
    assert shd.radiance(pose).mean() < lit.radiance(pose).mean() - 0.01


def test_exposure_reacts_to_driving_into_shadow(costmap):
    """Drive along the right straight into a shaded section: the MSV
    must drop on entry and the controller must raise exposure
    (shutter x gain) to pull it back toward the reference — the full
    CameraAutoBalance.cpp:150-215 loop against rendered scene content."""
    shadow = (30.0, 14.0, 8.0, 0.22)
    cam = SceneCamera(SceneRenderer(costmap, SceneConfig(
        width=160, height=120, shadows=(shadow,), noise_std=0.5)))
    ab = CameraAutoBalance(cam, AutoBalanceConfig(
        roi=(0, 60, 160, 120),                      # road half of frame
        k_shutter=2e-3, k_gain=2e-3, max_shutter=30000.0))

    # converge in the lit section (stationary, many control steps)
    pose_lit = (30.0, -6.0, math.pi / 2)
    for _ in range(300):
        v_lit = ab.process_frame(cam.capture(pose_lit))
    exp_lit = ab.shutter * max(ab.gain, 1e-6)
    assert abs(ab.msv_error) <= 25.0, f"never converged: {v_lit}"

    # drive north into the shadow disc; first frame inside is darker
    v_enter = ab.process_frame(cam.capture((30.0, 14.0, math.pi / 2)))
    assert v_enter < v_lit - 10.0, (v_enter, v_lit)

    # hold inside the shadow: exposure must rise and MSV recover
    for _ in range(400):
        v_shadow = ab.process_frame(cam.capture((30.0, 14.0, math.pi / 2)))
    exp_shadow = ab.shutter * max(ab.gain, 1e-6)
    assert exp_shadow > exp_lit * 1.5, (exp_shadow, exp_lit)
    assert v_shadow > v_enter + 10.0, (v_shadow, v_enter)


def test_frames_flow_to_console_image_panel(costmap):
    """SceneCamera -> ImageRepublisher -> telemetry record -> console
    render: the ASCII panel must appear with scene structure."""
    from autorally_tpu.tools.console import ConsoleState
    from autorally_tpu.vision.image_republisher import ImageRepublisher

    cam = SceneCamera(SceneRenderer(costmap, SceneConfig()))
    cam.set_shutter(1000.0)
    cam.set_gain(0.5)

    state = ConsoleState()
    clock = [0.0]

    def on_frame(small, ts):
        state.ingest({"kind": "image",
                      "ascii": ascii_frame(small),
                      "msv": 120.0, "shutter": cam.shutter,
                      "gain": cam.gain}, now=ts)

    rep = ImageRepublisher(on_frame, max_hz=5.0, scale=2,
                           clock=lambda: clock[0])
    frames = 0
    for i in range(20):
        clock[0] = i * 0.02                          # 50 Hz camera
        if rep.process(cam.capture((30.0, 0.0, math.pi / 2))):
            frames += 1
    assert frames == 2                               # 5 Hz cap over 0.4 s
    assert rep.dropped == 18
    out = state.render(now=clock[0], color=False)
    assert "camera" in out and "shutter=" in out
    rows = [ln for ln in out.splitlines() if ln.startswith("  |")]
    assert len(rows) >= 10
    # scene structure: sky rows brighter (denser ramp chars) than road
    ramp = " .:-=+*#%@"
    mean_level = lambda s: np.mean([ramp.index(c) for c in s.strip("|  ")
                                    if c in ramp])
    assert mean_level(rows[0]) > mean_level(rows[-1])


def test_projection_inverts_rasterizer(costmap):
    """project_points must invert the renderer's ray-ground mapping:
    ground points synthesized FROM pixel rays land back on their own
    pixels."""
    import math as m

    from autorally_tpu.vision.scene_camera import project_points

    cfg = SceneConfig(width=160, height=120)
    r = SceneRenderer(costmap, cfg)
    pose = (30.0, 0.0, m.pi / 2)
    sp, cp = m.sin(r._pitch), m.cos(r._pitch)
    # pick below-horizon pixels and rebuild their world ground points
    px = [(40, 90), (80, 100), (120, 80), (80, 119)]
    f = (cfg.width / 2.0) / m.tan(m.radians(cfg.hfov_deg) / 2.0)
    world = []
    for (ux, vy) in px:
        u_t = (ux - (cfg.width - 1) / 2.0) / f
        v_t = (vy - (cfg.height - 1) / 2.0) / f
        dz = v_t * cp + sp
        t = cfg.cam_height / dz
        fwd, rgt = t * (cp - v_t * sp), t * u_t
        cy, sy = m.cos(pose[2]), m.sin(pose[2])
        world.append([pose[0] + fwd * cy + rgt * sy,
                      pose[1] + fwd * sy - rgt * cy])
    pts = project_points(r, pose, np.array(world))
    assert pts[:, 2].all(), "synthesized ground points not visible"
    got = pts[:, :2]
    want = np.array(px, dtype=float)
    np.testing.assert_allclose(got, want, atol=0.51)


def test_draw_path_overlays_plan(costmap):
    """The nominal trajectory ahead of the car must appear as overlay
    pixels in the frame (the OCS image-mask role)."""
    import math as m

    from autorally_tpu.vision.scene_camera import PATH_COLOR, draw_path

    r = SceneRenderer(costmap, SceneConfig(width=160, height=120))
    cam = SceneCamera(r)
    cam.set_shutter(1000.0)
    cam.set_gain(0.5)
    pose = (30.0, 0.0, m.pi / 2)
    frame = cam.capture(pose)
    # a straight 10 m plan ahead (along +y), like a state_solution
    ys = np.linspace(1.0, 10.0, 25)
    states = np.stack([np.full_like(ys, 30.0), ys], axis=1)
    out = draw_path(frame, r, pose, states)
    marked = (out == PATH_COLOR).all(axis=2)
    assert marked.sum() >= 20, "path overlay missing"
    assert not (frame == PATH_COLOR).all(axis=2).any()
    # the plan recedes toward the horizon: marked rows span a vertical
    # range ending above the bottom edge
    rows = np.where(marked.any(axis=1))[0]
    assert rows.max() - rows.min() > 20
