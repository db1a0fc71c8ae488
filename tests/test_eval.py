"""Eval/metrics suite tests (reference C15-C22 parity)."""

import numpy as np
import pytest

from gaussiansplattingviewer_tpu.eval import (
    blur_effect,
    disparity_to_depth,
    disparity_to_pointcloud,
    mse,
    psnr,
    remove_statistical_outliers,
    sharpen_disparity,
    ssim,
)
from gaussiansplattingviewer_tpu.eval.outliers import outlier_score
from gaussiansplattingviewer_tpu.eval.reproject import (
    disparity16_to_pixels,
    save_pointcloud_ply,
)
from gaussiansplattingviewer_tpu.eval import packaging, viz


def test_psnr_reference_formula():
    a = np.zeros((8, 8), np.uint8)
    b = np.full((8, 8), 10, np.uint8)
    # MSE=100 -> PSNR = 20*log10(255/10) (ref metrics/psnr_calculation.py:7-14)
    assert np.isclose(psnr(a, b), 20 * np.log10(25.5))
    assert psnr(a, a) == float("inf")
    assert mse(a, b) == 100.0


def test_ssim_properties():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 255, (64, 64)).astype(np.uint8)
    assert np.isclose(ssim(a, a), 1.0, atol=1e-6)
    noisy = np.clip(a + rng.normal(0, 40, a.shape), 0, 255).astype(np.uint8)
    s = ssim(a, noisy)
    assert 0.0 < s < 0.95


def test_blur_effect_ranks_blur():
    rng = np.random.default_rng(1)
    sharp = (rng.uniform(0, 1, (96, 96)) > 0.5).astype(np.float64)
    from scipy.ndimage import gaussian_filter

    blurry = gaussian_filter(sharp, 3.0)
    b_sharp = blur_effect(sharp, h_size=11)
    b_blur = blur_effect(blurry, h_size=11)
    assert 0 <= b_sharp < b_blur <= 1.0


def test_outlier_removal():
    rng = np.random.default_rng(2)
    cloud = rng.normal(0, 0.1, (500, 3))
    outliers = rng.uniform(5, 10, (20, 3))
    pts = np.concatenate([cloud, outliers])
    kept, mask = remove_statistical_outliers(pts, nb_neighbors=20, std_ratio=2.0)
    # all far outliers removed, most of the cloud kept
    assert mask[:500].mean() > 0.95
    assert mask[500:].mean() < 0.2
    score = outlier_score(pts)
    assert score["n_removed"] >= 15


def test_disparity_depth_roundtrip():
    focal, baseline = 500.0, 0.5
    depth_true = np.array([[2.0, 4.0], [8.0, 0.0]])
    disp = np.where(depth_true > 0, focal * baseline / np.maximum(depth_true, 1e-9), 0.0)
    depth = disparity_to_depth(disp, focal, baseline)
    np.testing.assert_allclose(depth, depth_true, atol=1e-9)
    # uint16 encoding roundtrip (ref main.py:876 scale x65535)
    width = 1160
    disp_frac = disp / width
    d16 = np.clip(disp_frac * 65535, 0, 65535).astype(np.uint16)
    back = disparity16_to_pixels(d16, width)
    np.testing.assert_allclose(back, disp, atol=width / 65535 + 1e-6)


def test_pointcloud_backprojection_geometry():
    focal, baseline = 100.0, 0.5
    h, w = 32, 32
    disp = np.full((h, w), focal * baseline / 2.0)  # constant depth 2
    rgb = np.ones((h, w, 3), np.float32) * 0.5
    pts, cols = disparity_to_pointcloud(disp, focal, baseline, rgb=rgb)
    assert pts.shape[0] == h * w
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-9)
    # center pixel back-projects to the optical axis
    center_idx = (h // 2) * w + w // 2
    np.testing.assert_allclose(pts[center_idx, :2], [0, 0], atol=2.0 * 2 / focal)
    assert cols.shape == (h * w, 3)


def test_save_pointcloud_ply(tmp_path):
    pts = np.random.default_rng(0).normal(size=(50, 3))
    cols = np.random.default_rng(1).uniform(0, 1, (50, 3))
    p = tmp_path / "cloud.ply"
    save_pointcloud_ply(p, pts, cols)
    from gaussiansplattingviewer_tpu.models.ply import read_ply_vertices

    v = read_ply_vertices(p)
    np.testing.assert_allclose(v["x"], pts[:, 0].astype(np.float32))
    assert v["red"].dtype == np.uint8


def test_sharpen_disparity_repairs_edges():
    d = np.zeros((32, 32))
    d[:, 16:] = 10.0
    # inject flying pixels along the edge
    noisy = d.copy()
    noisy[:, 15] = 5.0  # halfway values = flying pixels
    out = sharpen_disparity(noisy, grad_threshold=3.0)
    # flying column snapped to one of the surfaces
    assert np.isin(out[:, 15], [0.0, 10.0]).all()
    # flat regions untouched
    np.testing.assert_array_equal(out[:, :10], 0.0)


def test_disparity_scale_calibration_synthetic():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    h, w = 128, 256
    # textured left image, right = left shifted by d=6 px
    base = (rng.uniform(0, 255, (h, w + 32))).astype(np.uint8)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(base.astype(float), 1.5)
    d_true = 6
    left = base[:, 32:].copy()
    right = base[:, 32 - d_true : w + 32 - d_true].copy()
    disp_map = np.full((h, w), float(d_true))

    from gaussiansplattingviewer_tpu.eval.disp_scale import (
        calibrate_disparity_scale,
    )

    scale, n = calibrate_disparity_scale(left, right, disp_map)
    assert n > 5
    assert scale is not None and abs(scale - 1.0) < 0.05


def test_packaging_roundtrip(tmp_path):
    root = tmp_path / "out"
    for scene in ("0001", "0002"):
        for sub in ("left", "right", "depth"):
            d = root / scene / sub
            d.mkdir(parents=True)
            for i in range(3):
                (d / f"{i}.png").write_bytes(b"xx")
    bad = packaging.check_scene_files(root, expected=3)
    assert bad == {}
    bad = packaging.check_scene_files(root, expected=100)
    assert set(bad) == {"0001", "0002"}

    zips = packaging.zip_all_scenes(root)
    assert len(zips) == 2
    dest = tmp_path / "unzipped"
    done = packaging.unzip_all(root, dest)
    assert len(done) == 2
    assert (dest / "0001" / "left" / "0.png").exists()


def test_viz_utilities():
    d16 = (np.arange(64, dtype=np.uint16).reshape(8, 8) * 100)
    disp8 = viz.normalize_depth_for_display(d16)
    assert disp8.dtype == np.uint8 and disp8.max() == 255 and disp8.min() == 0
    cm = viz.colormap_disparity(d16)
    assert cm.shape == (8, 8, 3)

    left = np.zeros((32, 32, 3), np.uint8)
    right = np.zeros((32, 32, 3), np.uint8)
    disp = np.full((32, 32), 4.0)
    lm, rm = viz.stereo_shift_check(left, right, disp, points=[(16, 16)])
    assert lm.sum() > 0 and rm.sum() > 0
    # the right-image mark is shifted 4 px left
    ly, lx = np.argwhere(lm[..., 0] > 0).mean(axis=0)
    ry, rx = np.argwhere(rm[..., 0] > 0).mean(axis=0)
    assert abs((lx - rx) - 4.0) < 0.6 and abs(ly - ry) < 0.6


def test_radial_undistort_identity_and_center():
    img = np.random.default_rng(4).uniform(0, 255, (32, 32)).astype(np.uint8)
    out = viz.radial_undistort(img, k1=0.0)
    np.testing.assert_array_equal(out, img)
    out2 = viz.radial_undistort(img.astype(np.float64), k1=0.3)
    # center pixel unchanged by pure radial distortion
    assert abs(float(out2[16, 16]) - float(img[16, 16])) < 30
