"""Smoke tests for the scene renderer / video recorder."""

import numpy as np

import upright_tpu.config as cfg
from upright_tpu.sim.camera import Camera, SceneRenderer, VideoRecorder
from upright_tpu.sim.simulation import UprightSimulation


def make_sim():
    path = cfg.resolve_package_path({"package": "configs", "path": "demos/ur10_demo.yaml"})
    conf = cfg.load_config(path)
    return UprightSimulation(conf["simulation"])


def test_camera_from_config():
    cam = Camera.from_config({"target": [1, 0, 1], "position": [1, 1, 1]})
    elev, azim = cam.view_angles()
    assert np.isclose(azim, 90.0)
    cam2 = Camera.from_config(
        {"relative_target": [0, 0, 0.1], "relative_position": [0.4, -1, 0.6]},
        r_ew_w=[1.0, 2.0, 1.0],
    )
    assert np.allclose(cam2.target, [1, 2, 1.1])
    cam3 = Camera.from_config({"target": [0, 0, 0], "distance": 1.8, "pitch": -29, "yaw": 147.6})
    assert cam3.distance == 1.8


def test_render_frame(tmp_path):
    sim = make_sim()
    state = sim.initial_state()
    renderer = SceneRenderer(sim)
    out = renderer.render(state, path=tmp_path / "frame.png", t=0.0)
    assert (tmp_path / "frame.png").exists()


def test_video_recorder(tmp_path):
    sim = make_sim()
    state = sim.initial_state()
    rec = VideoRecorder(SceneRenderer(sim), tmp_path / "video", timestep=0.1)
    captured = 0
    for i in range(10):
        if rec.maybe_capture(state, i * 0.05):
            captured += 1
    assert captured == 5
    assert len(list((tmp_path / "video").glob("*.png"))) == 5


def test_video_encode_gif(tmp_path):
    sim = make_sim()
    state = sim.initial_state()
    rec = VideoRecorder(SceneRenderer(sim), tmp_path / "video", timestep=0.1)
    for i in range(4):
        rec.maybe_capture(state, i * 0.1)
    out = rec.save()
    assert out.exists() and out.suffix == ".gif" and out.stat().st_size > 5_000


def test_solid_rendering_has_occluded_faces(tmp_path):
    """The renderer draws shaded solids (Poly3DCollections), not just
    wireframe lines."""
    sim = make_sim()
    state = sim.initial_state()
    fig = SceneRenderer(sim).render(state, t=0.0)
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    polys = [c for c in fig.axes[0].collections if isinstance(c, Poly3DCollection)]
    # tray + the bottle at least
    assert len(polys) >= 2
