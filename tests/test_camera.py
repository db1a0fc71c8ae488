"""Camera math tests against hand-computed matrices and reference constants."""

import math

import numpy as np

from gaussiansplattingviewer_tpu.utils import colmap, transforms as tf
from gaussiansplattingviewer_tpu.utils.camera import DEFAULT_FOVY, Camera


def test_look_at_known_case():
    # eye +3z looking at origin, up -y: right=(-1,0,0), up'=(0,-1,0), fwd=-z
    V = tf.look_at([0, 0, 3], [0, 0, 0], [0, -1, 0])
    expected = np.array(
        [
            [-1, 0, 0, 0],
            [0, -1, 0, 0],
            [0, 0, 1, -3],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
    np.testing.assert_allclose(V, expected, atol=1e-6)
    # the camera origin maps to view-space (0,0,-3): 3 units in front (-z)
    p = V @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(p, [0, 0, -3, 1], atol=1e-6)


def test_look_at_inverse_recovers_eye():
    eye = np.array([1.5, -2.0, 0.7])
    V = tf.look_at(eye, [0, 1, 0], [0, -1, 0])
    np.testing.assert_allclose(np.linalg.inv(V)[:3, 3], eye, atol=1e-5)
    # rotation part orthonormal
    R = V[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_perspective_matches_reference_formula():
    # ref util.py:72-80
    fovy, aspect, near, far = 0.9, 1.5, 0.1, 100.0
    P = tf.perspective(fovy, aspect, near, far)
    f = 1.0 / np.tan(fovy / 2)
    assert np.isclose(P[0, 0], f / aspect)
    assert np.isclose(P[1, 1], f)
    assert np.isclose(P[2, 2], -(far + near) / (far - near))
    assert np.isclose(P[2, 3], -2 * far * near / (far - near))
    assert np.isclose(P[3, 2], -1.0)
    # near-plane center maps to ndc z=-1, far-plane to z=+1
    for z, ndc_z in [(-near, -1.0), (-far, 1.0)]:
        clip = P @ np.array([0, 0, z, 1.0])
        assert np.isclose(clip[2] / clip[3], ndc_z, atol=1e-5)


def test_default_fovy_is_reference_lens():
    # ref util.py:20
    assert np.isclose(DEFAULT_FOVY, 2 * math.atan(2088.0 / (3443.915946 * 2)))


def test_htanfovxy_focal():
    cam = Camera(h=522, w=1160)
    htanx, htany, focal = cam.get_htanfovxy_focal()
    assert np.isclose(htany, math.tan(cam.fovy / 2))
    assert np.isclose(htanx, htany * 1160 / 522)
    assert np.isclose(focal, 522 / (2 * htany))
    # focal consistency with the projection matrix recovery used on-device
    P = cam.get_project_matrix()
    assert np.isclose(1.0 / P[1, 1], htany, atol=1e-6)
    assert np.isclose(1.0 / P[0, 0], htanx, atol=1e-5)


def test_quat_rotmat_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = tf.quat_to_rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.isclose(np.linalg.det(R), 1.0)
        q2 = tf.rotmat_to_quat(R)
        np.testing.assert_allclose(q2, q, atol=1e-8)


def test_rotate_quat_vec_matches_matrix():
    rng = np.random.default_rng(4)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    v = rng.normal(size=(5, 3))
    np.testing.assert_allclose(
        tf.rotate_quat_vec(q, v), v @ tf.quat_to_rotmat(q).T, atol=1e-10
    )


def test_orbit_preserves_target_distance():
    cam = Camera(h=100, w=100)
    d0 = np.linalg.norm(cam.position - cam.target)
    cam.orbit(30.0, -12.0)
    d1 = np.linalg.norm(cam.position - cam.target)
    assert np.isclose(d0, d1, atol=1e-5)
    assert cam.is_pose_dirty


def test_zoom_moves_along_view_dir():
    cam = Camera(h=100, w=100)
    front = (cam.target - cam.position) / np.linalg.norm(cam.target - cam.position)
    p0 = cam.position.copy()
    cam.zoom(2.0)
    np.testing.assert_allclose(
        cam.position - p0, front * 2.0 * cam.zoom_sensitivity, atol=1e-6
    )


def test_colmap_identity_pose():
    # identity quaternion, zero translation: camera at origin;
    # conversion flips handedness (main.py:197-215)
    cam_pos, center, up = colmap.colmap_look_at(1, 0, 0, 0, 0, 0, 0)
    np.testing.assert_allclose(cam_pos, [0, 0, 0], atol=1e-12)
    # R=I transposed, flip z: forward (0,0,-1) -> (0,0,+1); up (0,-1,0) kept
    np.testing.assert_allclose(center, [0, 0, 1], atol=1e-12)
    np.testing.assert_allclose(up, [0, -1, 0], atol=1e-12)


def test_colmap_stereo_baseline():
    from gaussiansplattingviewer_tpu.utils.colmap import ColmapPose, pose_to_stereo_views

    pose = ColmapPose(
        image_id=1,
        qvec=np.array([0.9, 0.1, -0.2, 0.3]) / np.linalg.norm([0.9, 0.1, -0.2, 0.3]),
        tvec=np.array([0.4, -1.0, 2.0]),
        camera_id=1,
        name="img.png",
    )
    vl, vr, pl, pr = pose_to_stereo_views(pose, baseline=-0.5)
    # right view = view-space translate by baseline (main.py:376-380):
    # a world point's view coords shift by (-0.5, 0, 0)
    p = np.array([0.3, 0.7, -2.0, 1.0])
    np.testing.assert_allclose((vr @ p)[:3], (vl @ p)[:3] + [-0.5, 0, 0], atol=1e-5)
    # the two camera centers are 0.5 apart
    assert np.isclose(np.linalg.norm(pl - pr), 0.5, atol=1e-5)


def test_colmap_parsing(tmp_path):
    images = tmp_path / "images.txt"
    images.write_text(
        "# comment line\n"
        "1 0.9 0.1 -0.2 0.3 0.4 -1.0 2.0 1 img1.png\n"
        "100 200 1\n"
        "2 1 0 0 0 0 0 0 1 img2.png\n"
        "\n"
    )
    cameras = tmp_path / "cameras.txt"
    cameras.write_text("# cams\n1 PINHOLE 1160 522 3443.9 3443.9 580 261\n")
    poses, cams = (
        colmap.read_images_txt(images),
        colmap.read_cameras_txt(cameras),
    )
    assert len(poses) == 2
    assert poses[0].image_id == 1 and poses[1].name == "img2.png"
    np.testing.assert_allclose(poses[0].tvec, [0.4, -1.0, 2.0])
    assert cams[0].width == 1160 and cams[0].fx == 3443.9
