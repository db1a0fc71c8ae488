"""Native C++ data-path tests: PLY fast loader + PNG encoder vs the pure
Python implementations."""

import numpy as np
import pytest

from gaussiansplattingviewer_tpu import native
from gaussiansplattingviewer_tpu.models import load_ply, random_scene, save_ply
from gaussiansplattingviewer_tpu.models.ply import _load_ply_native
from gaussiansplattingviewer_tpu.utils.image_io import (
    read_image,
    write_disparity16,
    write_rgb8,
)

needs_native = pytest.mark.skipif(
    native.get_lib() is None, reason="native toolchain unavailable"
)


@needs_native
def test_native_ply_matches_python(tmp_path):
    scene = random_scene(1000, sh_degree=3, seed=13)
    p = tmp_path / "s.ply"
    save_ply(scene, p)
    nat = _load_ply_native(p)
    assert nat is not None
    scene_n, bbox_n, center_n = nat
    scene_p, bbox_p, center_p = load_ply(p, use_native=False)
    np.testing.assert_allclose(scene_n.xyz, scene_p.xyz, atol=1e-7)
    np.testing.assert_allclose(scene_n.rot, scene_p.rot, atol=1e-6)
    np.testing.assert_allclose(scene_n.scale, scene_p.scale, rtol=1e-6)
    np.testing.assert_allclose(scene_n.opacity, scene_p.opacity, atol=1e-6)
    np.testing.assert_allclose(scene_n.sh, scene_p.sh, atol=1e-7)
    np.testing.assert_allclose(bbox_n, bbox_p, atol=1e-6)


@needs_native
def test_native_ply_degree1(tmp_path):
    scene = random_scene(64, sh_degree=1, seed=1)
    p = tmp_path / "s1.ply"
    save_ply(scene, p)
    got, _, _ = load_ply(p)  # native path active by default
    np.testing.assert_allclose(np.asarray(got.sh), scene.sh, atol=1e-6)


@needs_native
def test_native_png_rgb8_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 61, 3), dtype=np.uint8)
    p = tmp_path / "a.png"
    write_rgb8(p, img)
    back = read_image(p)
    np.testing.assert_array_equal(back, img)


@needs_native
def test_native_png_gray16_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    disp = rng.uniform(0, 1, (23, 41)).astype(np.float32)
    p = tmp_path / "d.png"
    write_disparity16(p, disp)
    back = read_image(p)
    assert back.dtype in (np.uint16, np.int32)
    expect = np.clip(disp * 65535, 0, 65535).astype(np.uint16)
    np.testing.assert_array_equal(back.astype(np.uint16), expect)


def test_ply_to_render_full_path(tmp_path):
    """The full real-checkpoint path at small scale: save_ply -> NATIVE
    load_ply -> autotune -> render must reproduce the in-memory scene's
    frame (scripts/ply_roundtrip_tpu.py runs this at garden scale on the
    TPU; ref flow main.py:721-725 -> renderer draw)."""
    import jax

    from gaussiansplattingviewer_tpu.config import RenderConfig
    from gaussiansplattingviewer_tpu.ops.autotune import autotune
    from gaussiansplattingviewer_tpu.ops.render import render
    from gaussiansplattingviewer_tpu.utils import transforms as tf
    from gaussiansplattingviewer_tpu.utils.camera import Camera

    scene = random_scene(3000, sh_degree=2, seed=5, extent=2.0,
                         mean_scale=0.04)
    p = str(tmp_path / "point_cloud.ply")
    save_ply(scene, p)
    loaded, _, _ = load_ply(p)

    cfg = RenderConfig(width=160, height=96)
    cam = Camera(h=cfg.height, w=cfg.width)
    cam.fovy = 1.0
    eye = np.array([0, 0, 5.0], np.float32)
    view = np.asarray(tf.look_at(eye, np.zeros(3), [0, -1, 0]), np.float32)
    proj = np.asarray(cam.get_project_matrix(), np.float32)

    imgs = []
    for sc in (scene, loaded):
        tuned = autotune(sc, [view], [proj], [eye], cfg, probe=True)
        img = render(sc.to_device(), view, proj, eye, tuned,
                     backend="pallas")
        imgs.append(np.asarray(img))
    np.testing.assert_allclose(imgs[1], imgs[0], atol=5e-4)
