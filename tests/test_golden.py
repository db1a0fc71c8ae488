"""Golden-image regression tests.

The 4-splat naive scene rendered from a fixed pose is the de-facto smoke
test of the reference (SURVEY.md §4); here its render is pinned to a stored
golden so optimization work can never silently change semantics.  The
golden is (re)generated with --force-golden via GSV_REGEN_GOLDEN=1.
"""

import os

import numpy as np
import pytest

from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode
from gaussiansplattingviewer_tpu.eval.compare import compare_backends
from gaussiansplattingviewer_tpu.models import naive_gaussian, random_scene
from gaussiansplattingviewer_tpu.ops.render import render
from gaussiansplattingviewer_tpu.utils import transforms as tf
from gaussiansplattingviewer_tpu.utils.camera import Camera

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _render_case(mode):
    cfg = RenderConfig(width=128, height=96, mode=mode, background=0.1)
    scene, _, _ = naive_gaussian()
    cam = Camera(h=cfg.height, w=cfg.width)
    cam.fovy = 1.0
    view = tf.look_at([0.8, -0.5, 2.5], [0.2, 0.2, 0.2], [0, -1, 0])
    img = render(
        scene.to_device(),
        view,
        cam.get_project_matrix(),
        np.array([0.8, -0.5, 2.5], np.float32),
        cfg,
        backend="tile",
    )
    return np.asarray(img)


@pytest.mark.parametrize("mode", [RenderMode.SH0, RenderMode.DEPTH])
def test_golden_naive(mode):
    img = _render_case(mode)
    path = os.path.join(GOLDEN_DIR, f"naive_{int(mode)}.npz")
    if os.environ.get("GSV_REGEN_GOLDEN") or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, img=img.astype(np.float16))
        pytest.skip("golden (re)generated")
    golden = np.load(path)["img"].astype(np.float32)
    np.testing.assert_allclose(img, golden, atol=2e-3)


# --- full-mode goldens at the reference resolution --------------------------
#
# Every render-mode switch of the reference UI (main.py:98-99 ->
# gau_frag.glsl:15-38) pinned at the reference's own 1160x522 resolution
# (main.py:634-635) on a 10k-splat anisotropic SH-deg-3 scene: a regression
# in any SH band's compositing, in the ball thresholds, or in billboard
# coverage flips the corresponding test.

REF_W, REF_H = 1160, 522  # ref main.py:634-635
_REF_SCENE = {}


def _ref_scene():
    if "scene" not in _REF_SCENE:
        _REF_SCENE["scene"] = (
            random_scene(
                10_000, sh_degree=3, seed=5, extent=3.0, mean_scale=0.04,
                anisotropy=0.7,
            )
            .pad_to_multiple(1024)
            .to_device()
        )
    return _REF_SCENE["scene"]


@pytest.mark.parametrize(
    "mode",
    [
        RenderMode.SH1,
        RenderMode.SH2,
        RenderMode.SH3,
        RenderMode.DEPTH,
        RenderMode.BILLBOARD,
        RenderMode.FLAT_BALL,
        RenderMode.GAUSSIAN_BALL,
    ],
)
def test_golden_refres_modes(mode):
    cfg = RenderConfig(width=REF_W, height=REF_H, mode=mode)
    cam = Camera(h=REF_H, w=REF_W)
    cam.fovy = 1.0
    eye = np.array([0.5, -0.4, 6.0])
    view = tf.look_at(eye, [0, 0, 0], [0, -1, 0])
    img = np.asarray(
        render(
            _ref_scene(), view, cam.get_project_matrix(),
            eye.astype(np.float32), cfg, backend="tile",
        )
    )
    path = os.path.join(GOLDEN_DIR, f"refres10k_{int(mode)}.npz")
    if os.environ.get("GSV_REGEN_GOLDEN") or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, img=img.astype(np.float16))
        pytest.skip("golden (re)generated")
    golden = np.load(path)["img"].astype(np.float32)
    # f16 storage quantization ~1e-3 relative at these magnitudes; colors
    # can exceed 1 so scale the tolerance by the stored maximum
    atol = 2e-3 * max(1.0, float(np.abs(golden).max()))
    np.testing.assert_allclose(img, golden, atol=atol, err_msg=str(mode))
    assert img.sum() > 0.0  # scene actually renders


def test_backend_flip_harness():
    """The quantitative version of the reference's backend flip test."""
    cfg = RenderConfig(width=96, height=64)
    scene = random_scene(400, sh_degree=1, seed=17, extent=2.0, mean_scale=0.06)
    cam = Camera(h=cfg.height, w=cfg.width)
    view = tf.look_at([0, 0, 3], [0, 0, 0], [0, -1, 0])
    res = compare_backends(
        scene.to_device(),
        view,
        cam.get_project_matrix(),
        np.array([0, 0, 3.0], np.float32),
        cfg,
        backends=("oracle", "tile", "pallas"),
    )
    assert res["oracle_vs_tile"]["max_abs"] < 1e-4
    assert res["oracle_vs_pallas"]["max_abs"] < 1e-4
    assert res["tile_vs_pallas"]["max_abs"] < 1e-5
