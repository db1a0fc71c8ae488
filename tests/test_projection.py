"""Projection tests: analytic checks of the EWA pipeline on the naive scene."""

import numpy as np
import jax.numpy as jnp

from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode
from gaussiansplattingviewer_tpu.models import naive_gaussian
from gaussiansplattingviewer_tpu.ops.projection import (
    compute_cov3d,
    compute_cov2d,
    project,
)
from gaussiansplattingviewer_tpu.utils import transforms as tf
from gaussiansplattingviewer_tpu.utils.camera import Camera


def _setup(cfg):
    scene, _, _ = naive_gaussian()
    cam = Camera(h=cfg.height, w=cfg.width)
    view = tf.look_at([0, 0, 3], [0, 0, 0], [0, -1, 0])
    proj = cam.get_project_matrix()
    cam_pos = np.array([0, 0, 3.0], np.float32)
    return scene, view, proj, cam_pos, cam


def test_cov3d_isotropic():
    s = jnp.array([[0.1, 0.1, 0.1]])
    q = jnp.array([[1.0, 0, 0, 0]])
    cov = compute_cov3d(s, q)
    np.testing.assert_allclose(cov[0], 0.01 * np.eye(3), atol=1e-7)


def test_cov3d_rotation_invariant_trace():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(5, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    s = jnp.abs(jnp.array(rng.normal(size=(5, 3)), jnp.float32)) + 0.1
    cov = compute_cov3d(s, jnp.array(q))
    # trace(R S^2 R^T) = sum(s^2); eigvals = s^2
    np.testing.assert_allclose(
        np.trace(np.asarray(cov), axis1=1, axis2=2),
        np.sum(np.asarray(s) ** 2, axis=1),
        rtol=1e-5,
    )
    ev = np.sort(np.linalg.eigvalsh(np.asarray(cov)), axis=1)
    np.testing.assert_allclose(ev, np.sort(np.asarray(s) ** 2, axis=1), rtol=1e-4)


def test_cov2d_isotropic_on_axis():
    """Splat on the optical axis: cov2d = (focal*s/z)^2 I + 0.3 I."""
    cfg = RenderConfig(width=160, height=96)
    cam = Camera(h=cfg.height, w=cfg.width)
    htanx, htany, focal = cam.get_htanfovxy_focal()
    view = tf.look_at([0, 0, 3], [0, 0, 0], [0, -1, 0])
    s = 0.2
    cov3d = compute_cov3d(jnp.array([[s, s, s]]), jnp.array([[1.0, 0, 0, 0]]))
    mean_view = jnp.array([[0.0, 0.0, -3.0]])
    cov2d = compute_cov2d(
        mean_view, cov3d, jnp.asarray(view), focal, htanx, htany
    )
    expected = (focal * s / 3.0) ** 2 + 0.3
    np.testing.assert_allclose(cov2d[0, 0], expected, rtol=1e-5)
    np.testing.assert_allclose(cov2d[0, 2], expected, rtol=1e-5)
    np.testing.assert_allclose(cov2d[0, 1], 0.0, atol=1e-5)


def test_project_centers_and_depths():
    cfg = RenderConfig(width=160, height=96)
    scene, view, proj, cam_pos, cam = _setup(cfg)
    sp = project(scene.to_device(), view, proj, cam_pos, cfg)
    # origin splat projects to the image center, 3 in front
    np.testing.assert_allclose(
        sp.mean2d[0], [cfg.width / 2, cfg.height / 2], atol=1e-3
    )
    np.testing.assert_allclose(sp.depth[0], 3.0, rtol=1e-6)
    # +z splat is nearer (depth 2), also centered
    np.testing.assert_allclose(sp.depth[3], 2.0, rtol=1e-6)
    np.testing.assert_allclose(
        sp.mean2d[3], [cfg.width / 2, cfg.height / 2], atol=1e-3
    )
    # +x splat: view x = -1 (view flips x), ndc_x = P00*(-1)/3
    ndc_x = proj[0, 0] * (-1.0) / 3.0
    np.testing.assert_allclose(
        sp.mean2d[1, 0], (ndc_x + 1) / 2 * cfg.width, rtol=1e-5
    )
    assert bool(np.all(sp.valid))


def test_project_culls_behind_camera():
    cfg = RenderConfig(width=160, height=96)
    scene, view, proj, cam_pos, _ = _setup(cfg)
    # move the whole scene behind the camera
    scene.xyz = scene.xyz + np.array([0, 0, 10], np.float32)
    sp = project(scene.to_device(), view, proj, cam_pos, cfg)
    assert not bool(np.any(sp.valid))


def test_project_culls_padding():
    cfg = RenderConfig(width=160, height=96)
    scene, view, proj, cam_pos, _ = _setup(cfg)
    padded = scene.pad_to(64)
    sp = project(padded.to_device(), view, proj, cam_pos, cfg)
    assert bool(np.all(sp.valid[:4]))
    assert not bool(np.any(sp.valid[4:]))


def test_project_sh0_color_recovers_rgb():
    """DC-only SH roundtrips the naive scene's RGB (util_gau.py:50 inverse
    vs gau_vert.glsl:217,250 forward differ only by 0.28209 truncation)."""
    cfg = RenderConfig(width=160, height=96)
    scene, view, proj, cam_pos, _ = _setup(cfg)
    sp = project(scene.to_device(), view, proj, cam_pos, cfg)
    rgb = np.array([[1, 0, 1], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(sp.color, rgb, atol=2e-4)


def test_depth_mode_disparity():
    """DEPTH mode: disparity = |x_ndc_l - x_ndc_r|/2 with the world shifted
    by baseline (gau_vert.glsl:182-211).  For a fronto-parallel view the
    analytic value is htanx-normalized baseline/z."""
    cfg = RenderConfig(width=160, height=96, mode=RenderMode.DEPTH)
    scene, view, proj, cam_pos, cam = _setup(cfg)
    sp = project(scene.to_device(), view, proj, cam_pos, cfg)
    # gray: r == g == b
    np.testing.assert_allclose(sp.color[:, 0], sp.color[:, 1])
    # analytic: x_ndc = P00 * x_view / (-z_view); shifting world x by b
    # shifts view x by -b (view flips x); disparity = P00*|b|/z / 2
    for i, z in [(0, 3.0), (3, 2.0)]:
        expected = proj[0, 0] * 0.5 / z / 2
        np.testing.assert_allclose(sp.color[i, 0], expected, rtol=1e-4)


def test_radius_is_3_sigma():
    cfg = RenderConfig(width=160, height=96)
    scene, view, proj, cam_pos, cam = _setup(cfg)
    sp = project(scene.to_device(), view, proj, cam_pos, cfg)
    htanx, htany, focal = cam.get_htanfovxy_focal()
    s = 0.03
    expected = 3.0 * np.sqrt((focal * s / 3.0) ** 2 + 0.3)
    np.testing.assert_allclose(sp.radius[0], [expected, expected], rtol=1e-5)
