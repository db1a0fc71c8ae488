"""Pallas blend kernel vs the XLA tile executor and the oracle.

On CPU the kernel runs in interpreter mode (same math, no Mosaic); the
driver's bench exercises the compiled path on real TPU hardware."""

import numpy as np
import pytest

from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode
from gaussiansplattingviewer_tpu.models import naive_gaussian, random_scene
from gaussiansplattingviewer_tpu.ops.render import render
from gaussiansplattingviewer_tpu.utils import transforms as tf
from gaussiansplattingviewer_tpu.utils.camera import Camera


def _setup(cfg, scene=None):
    if scene is None:
        scene, _, _ = naive_gaussian()
    cam = Camera(h=cfg.height, w=cfg.width)
    view = tf.look_at([0, 0, 3], [0, 0, 0], [0, -1, 0])
    proj = cam.get_project_matrix()
    cam_pos = np.array([0, 0, 3.0], np.float32)
    return scene.to_device(), view, proj, cam_pos


@pytest.mark.parametrize(
    "mode",
    [RenderMode.SH0, RenderMode.DEPTH, RenderMode.BILLBOARD, RenderMode.GAUSSIAN_BALL],
)
def test_pallas_matches_xla_naive(mode):
    cfg = RenderConfig(width=96, height=64, mode=mode, background=0.2)
    scene, view, proj, cam_pos = _setup(cfg)
    img_x = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="tile"))
    img_p = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="pallas"))
    np.testing.assert_allclose(img_p, img_x, atol=1e-5)


def test_pallas_matches_oracle_random():
    cfg = RenderConfig(width=96, height=64)
    scene = random_scene(600, sh_degree=2, seed=21, extent=2.0, mean_scale=0.06)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    img_o = np.asarray(render(scene_d, view, proj, cam_pos, cfg, backend="oracle"))
    img_p = np.asarray(render(scene_d, view, proj, cam_pos, cfg, backend="pallas"))
    assert img_o.max() > 0.05
    np.testing.assert_allclose(img_p, img_o, atol=2e-4)


def test_pallas_empty_tiles_background():
    cfg = RenderConfig(width=96, height=64, background=0.7)
    scene, view, proj, cam_pos = _setup(cfg)
    scene.opacity = scene.opacity * 0.0
    img = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="pallas"))
    np.testing.assert_allclose(img, 0.7, atol=1e-6)
