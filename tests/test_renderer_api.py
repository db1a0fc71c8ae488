"""8-method renderer interface parity tests (ref renderer_ogl.py:75-101)."""

import numpy as np

from gaussiansplattingviewer_tpu.config import RenderMode
from gaussiansplattingviewer_tpu.models import naive_gaussian
from gaussiansplattingviewer_tpu.renderer import TPURenderer
from gaussiansplattingviewer_tpu.utils.camera import (
    Camera,
    sphere_orbit_path,
    sphere_orbit_pose,
)


def test_renderer_full_flow():
    scene, _, _ = naive_gaussian()
    cam = Camera(h=96, w=160)
    cam.camera_position = np.array([0.0, 0.0, 3.0], np.float32)
    cam.camera_front = np.array([0.0, 0.0, -1.0], np.float32)
    cam.camera_up = np.array([0.0, -1.0, 0.0], np.float32)

    r = TPURenderer(160, 96, backend="tile")
    r.update_gaussian_data(scene)
    r.sort_and_update(cam)
    r.update_camera_intrin(cam)
    r.update_camera_pose(cam)
    r.set_scale_modifier(1.0)
    r.set_render_mod(int(RenderMode.SH0))
    img = r.draw()
    assert img.shape == (96, 160, 3)
    cy, cx = 48, 80
    assert img[cy - 1 : cy + 1, cx - 1 : cx + 1, 2].max() > 0.9  # blue splat

    # mode switch (the reference's render-mode combo)
    r.set_render_mod(int(RenderMode.DEPTH))
    disp = r.draw()
    np.testing.assert_allclose(disp[..., 0], disp[..., 1])

    # resolution change (ref set_render_reso)
    r.set_render_reso(80, 48)
    r.update_camera_intrin(Camera(h=48, w=80))
    img2 = r.draw()
    assert img2.shape[1] == 80  # mode stays DEPTH


def test_renderer_pose_dict():
    """use_file pose path like the reference's COLMAP flow
    (renderer_ogl.py:160-168)."""
    scene, _, _ = naive_gaussian()
    cam = Camera(h=64, w=64)
    r = TPURenderer(64, 64, backend="tile")
    r.update_gaussian_data(scene)
    r.update_camera_intrin(cam)
    pose, pose_right = sphere_orbit_pose(3.0, 90.0, 0.0)
    r.update_camera_pose(cam, use_file=True, pose=pose)
    img_l = r.draw()
    r.update_camera_pose(cam, use_file=True, pose=pose_right)
    img_r = r.draw()
    assert img_l.shape == (64, 64, 3)
    assert np.abs(img_l - img_r).max() > 0  # stereo pair differs


def test_sphere_orbit_path():
    path = sphere_orbit_path(3.0, 8)
    assert len(path) == 8
    for pose, pose_r in path:
        p = pose["camera_position"]
        assert np.isclose(np.linalg.norm(p), 3.0, atol=1e-5)
        # right eye is baseline away
        d = np.linalg.norm(pose_r["camera_position"] - p)
        assert np.isclose(d, 0.193001, atol=1e-5)


def test_metric_plots(tmp_path):
    from gaussiansplattingviewer_tpu.eval.plots import (
        plot_blur_scores,
        plot_chunked_median,
        plot_outlier_scores,
    )

    rng = np.random.default_rng(0)
    series = {"rendered": rng.uniform(0.2, 0.4, 50), "original": rng.uniform(0.3, 0.5, 50)}
    stats = plot_blur_scores(series, tmp_path / "blur.png")
    assert (tmp_path / "blur.png").exists()
    assert 0.2 < stats["rendered"]["mean"] < 0.4
    meds = plot_chunked_median(series, tmp_path / "chunk.png")
    assert len(meds["rendered"]) == 5
    plot_outlier_scores({"0.5": rng.uniform(0, 0.1, 20)}, tmp_path / "sob.png")
    assert (tmp_path / "sob.png").exists()
