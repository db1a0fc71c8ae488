"""COLMAP-intrinsics projection: calibrated fx/fy/cx/cy drive the render.

The reference parses cameras.txt intrinsics and then discards them
(/root/reference/main.py:628-632, overridden by the hard-coded default lens
at main.py:633-636); this framework wires them through
transforms.perspective_from_intrinsics / colmap.camera_projection.  These
tests pin the pixel mapping: a splat at a known view-space point must land
at fx*x/(-z)+cx, cy-fy*y/(-z) — including a far-off-center principal point.
"""

import numpy as np
import pytest

from gaussiansplattingviewer_tpu.config import RenderConfig
from gaussiansplattingviewer_tpu.models.gaussians import GaussianData
from gaussiansplattingviewer_tpu.ops.render import render
from gaussiansplattingviewer_tpu.utils import colmap
from gaussiansplattingviewer_tpu.utils import transforms as tf


def _one_splat(world_xyz, sigma=0.02):
    xyz = np.asarray([world_xyz], dtype=np.float32)
    rot = np.array([[1.0, 0, 0, 0]], np.float32)
    scale = np.full((1, 3), sigma, np.float32)
    opacity = np.ones((1, 1), np.float32)
    sh = np.full((1, 3), 1.0, np.float32)  # bright DC
    return GaussianData(xyz, rot, scale, opacity, sh)


def _origin_view():
    # camera at origin looking down -z, up (0,-1,0): view-space
    # (x,y,z) = (-x_w, -y_w, z_w)
    return tf.look_at([0.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, -1.0, 0.0])


def test_centered_intrinsics_match_perspective():
    """cx=W/2, cy=H/2 reduces exactly to the fov-based perspective()."""
    W, H, fy = 320, 240, 260.0
    fovy = 2.0 * np.arctan(H / (2.0 * fy))
    fx = fy  # square pixels -> aspect handled by W/H
    P_int = tf.perspective_from_intrinsics(fx, fy, W / 2, H / 2, W, H)
    P_fov = tf.perspective(fovy, (W / H) * (fy / fx), 0.1, 100.0)
    np.testing.assert_allclose(P_int, P_fov, atol=1e-6)


@pytest.mark.parametrize(
    "point,fx,fy,cx,cy",
    [
        ((0.5, -0.3, -5.0), 800.0, 700.0, 300.0, 200.0),
        ((-0.2, 0.1, -3.0), 500.0, 500.0, 120.0, 300.0),
    ],
)
def test_splat_lands_at_pinhole_pixel(point, fx, fy, cx, cy):
    W, H = 640, 480
    view = _origin_view()
    proj = tf.perspective_from_intrinsics(fx, fy, cx, cy, W, H)
    scene = _one_splat(point).pad_to_multiple(128)
    cfg = RenderConfig(width=W, height=H)
    img = np.asarray(
        render(scene, view, proj, np.zeros(3, np.float32), cfg,
               backend="tile")
    )
    lum = img.sum(axis=-1)
    py, px = np.unravel_index(np.argmax(lum), lum.shape)
    xw, yw, zw = point
    xv, yv, zv = -xw, -yw, zw  # origin view above
    expect_x = fx * xv / (-zv) + cx
    expect_y = -fy * yv / (-zv) + cy
    assert abs(px + 0.5 - expect_x) <= 1.5, (px, expect_x)
    assert abs(py + 0.5 - expect_y) <= 1.5, (py, expect_y)


def test_focal_scales_footprint():
    """Doubling fx/fy doubles the rendered splat footprint (EWA focal is
    taken from the projection matrix, ops/projection.py:217-221)."""
    W, H = 256, 256
    view = _origin_view()
    scene = _one_splat((0.0, 0.0, -4.0), sigma=0.05).pad_to_multiple(128)
    cfg = RenderConfig(width=W, height=H)

    def support(f):
        proj = tf.perspective_from_intrinsics(f, f, W / 2, H / 2, W, H)
        img = np.asarray(
            render(scene, view, proj, np.zeros(3, np.float32), cfg,
                   backend="tile")
        )
        return (img.sum(axis=-1) > 0.05).sum()

    s1, s2 = support(200.0), support(400.0)
    # area scales ~4x when focal doubles
    assert 3.0 < s2 / max(s1, 1) < 5.0, (s1, s2)


def test_camera_projection_rescales():
    """camera_projection preserves fov fractions across resolutions."""
    cam = colmap.ColmapCamera(
        camera_id=1, model="PINHOLE", width=1920, height=1080,
        fx=1000.0, fy=990.0, cx=980.0, cy=500.0,
    )
    P_native = colmap.camera_projection(cam)
    P_half = colmap.camera_projection(cam, 960, 540)
    # P00 = 2 fx / W is resolution-invariant under uniform rescale
    np.testing.assert_allclose(P_half[:2, :3], P_native[:2, :3], atol=1e-6)


def test_camera_for_pose():
    cams = [
        colmap.ColmapCamera(1, "PINHOLE", 10, 10, 1, 1, 5, 5),
        colmap.ColmapCamera(2, "PINHOLE", 20, 20, 2, 2, 10, 10),
    ]
    pose = colmap.ColmapPose(0, np.zeros(4), np.zeros(3), 2, "x.png")
    assert colmap.camera_for_pose(cams, pose).camera_id == 2
    pose9 = colmap.ColmapPose(0, np.zeros(4), np.zeros(3), 9, "x.png")
    assert colmap.camera_for_pose(cams, pose9).camera_id == 1
