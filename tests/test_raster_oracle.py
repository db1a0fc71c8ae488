"""Oracle rasterizer tests: analytic blending checks on the naive scene."""

import jax
import numpy as np

from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode
from gaussiansplattingviewer_tpu.models import naive_gaussian
from gaussiansplattingviewer_tpu.ops.render import render, render_with_aux
from gaussiansplattingviewer_tpu.utils import transforms as tf
from gaussiansplattingviewer_tpu.utils.camera import Camera


def _setup(cfg):
    scene, _, _ = naive_gaussian()
    cam = Camera(h=cfg.height, w=cfg.width)
    view = tf.look_at([0, 0, 3], [0, 0, 0], [0, -1, 0])
    proj = cam.get_project_matrix()
    cam_pos = np.array([0, 0, 3.0], np.float32)
    return scene.to_device(), view, proj, cam_pos


def test_center_pixel_blend_order():
    """Blue splat (depth 2) must composite IN FRONT of magenta (depth 3):
    center = 0.99*blue + 0.01*0.99*magenta + background*T."""
    cfg = RenderConfig(width=160, height=96)
    scene, view, proj, cam_pos = _setup(cfg)
    img = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="oracle"))
    cy, cx = cfg.height // 2, cfg.width // 2
    # pixel centers are offset half a pixel from the exact splat center;
    # sample the 2x2 block around it and take the max alpha pixel
    px = img[cy - 1 : cy + 1, cx - 1 : cx + 1].reshape(-1, 3)
    center = px[np.argmax(px[:, 2])]
    # blue (nearest) dominates; magenta bleeds through only via (1 - a_blue)
    assert center[2] > 0.95
    assert center[1] < 1e-5  # no green anywhere at the center
    assert 0.0 < center[0] < 0.1  # faint magenta behind the blue splat


def test_background_far_corner():
    cfg = RenderConfig(width=160, height=96, background=0.25)
    scene, view, proj, cam_pos = _setup(cfg)
    img, aux = render_with_aux(scene, view, proj, cam_pos, cfg, backend="oracle")
    img = np.asarray(img)
    np.testing.assert_allclose(img[0, 0], [0.25] * 3, atol=1e-6)
    assert np.isclose(float(aux["transmittance"][0, 0]), 1.0)


def test_red_splat_left_of_center():
    cfg = RenderConfig(width=160, height=96)
    scene, view, proj, cam_pos = _setup(cfg)
    img = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="oracle"))
    ndc_x = proj[0, 0] * (-1.0) / 3.0
    px = int((ndc_x + 1) / 2 * cfg.width)
    py = cfg.height // 2
    patch = img[py - 2 : py + 2, px - 2 : px + 2]
    assert patch[..., 0].max() > 0.5  # strongly red
    assert patch[..., 2].max() < 0.2  # not blue


def test_empty_scene_is_background():
    cfg = RenderConfig(width=64, height=32, background=0.5)
    scene, view, proj, cam_pos = _setup(cfg)
    scene.opacity = scene.opacity * 0.0  # all padding-like
    img = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="oracle"))
    np.testing.assert_allclose(img, 0.5, atol=1e-6)


def test_depth_mode_grayscale():
    cfg = RenderConfig(width=160, height=96, mode=RenderMode.DEPTH)
    scene, view, proj, cam_pos = _setup(cfg)
    img = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="oracle"))
    np.testing.assert_allclose(img[..., 0], img[..., 1], atol=1e-7)
    np.testing.assert_allclose(img[..., 0], img[..., 2], atol=1e-7)
    # nearest splat (z=1, depth 2) disparity at center
    cy, cx = cfg.height // 2, cfg.width // 2
    expected = proj[0, 0] * 0.5 / 2.0 / 2
    block = img[cy - 1 : cy + 1, cx - 1 : cx + 1, 0]
    assert abs(block.max() - expected * 0.99) / expected < 0.05


def test_billboard_mode_opaque():
    cfg = RenderConfig(width=160, height=96, mode=RenderMode.BILLBOARD)
    scene, view, proj, cam_pos = _setup(cfg)
    img = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="oracle"))
    cy, cx = cfg.height // 2, cfg.width // 2
    # nearest (blue) splat's quad fully covers the center, alpha == 1
    np.testing.assert_allclose(img[cy, cx], [0, 0, 1.0], atol=2e-4)


def test_ball_modes():
    for mode in (RenderMode.FLAT_BALL, RenderMode.GAUSSIAN_BALL):
        cfg = RenderConfig(width=160, height=96, mode=mode)
        scene, view, proj, cam_pos = _setup(cfg)
        img = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="oracle"))
        cy, cx = cfg.height // 2, cfg.width // 2
        b = img[cy, cx, 2]
        if mode == RenderMode.FLAT_BALL:
            assert b > 0.95  # alpha binarized to 1, flat color
        else:
            assert 0.5 < b <= 1.0  # darkened by exp(power) near center


def test_scale_modifier_shrinks_footprint():
    cfg_big = RenderConfig(width=160, height=96, scale_modifier=1.0)
    cfg_small = RenderConfig(width=160, height=96, scale_modifier=0.2)
    scene, view, proj, cam_pos = _setup(cfg_big)
    img_big = np.asarray(render(scene, view, proj, cam_pos, cfg_big, backend="oracle"))
    img_small = np.asarray(
        render(scene, view, proj, cam_pos, cfg_small, backend="oracle")
    )
    assert (img_big.sum(-1) > 0.05).sum() > (img_small.sum(-1) > 0.05).sum()


def test_gradients_flow():
    cfg = RenderConfig(width=64, height=32)
    scene, view, proj, cam_pos = _setup(cfg)

    def loss(sc):
        img = render(sc, view, proj, cam_pos, cfg, backend="oracle")
        return (img**2).sum()

    g = jax.grad(loss)(scene)
    for name in ("xyz", "scale", "rot", "opacity", "sh"):
        arr = np.asarray(getattr(g, name))
        assert np.all(np.isfinite(arr)), name
    # visible splats must receive nonzero position gradients
    assert np.abs(np.asarray(g.xyz)).max() > 0
    assert np.abs(np.asarray(g.sh)).max() > 0
    assert np.abs(np.asarray(g.opacity)).max() > 0
