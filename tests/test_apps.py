"""End-to-end app tests: viewer CLI, stereo dataset generator, batch driver."""

import json
import os

import numpy as np
import pytest

from gaussiansplattingviewer_tpu.apps import dataset_gen, render_all, viewer
from gaussiansplattingviewer_tpu.models import random_scene, save_ply
from gaussiansplattingviewer_tpu.utils.image_io import read_image


@pytest.fixture(scope="module")
def scene_fixture(tmp_path_factory):
    """A fake pretrained-scene dir: point_cloud/iteration_30000/point_cloud.ply
    + COLMAP sparse/0 with 3 poses (the reference's on-disk layout,
    main.py:722, render_all.py:28-31)."""
    root = tmp_path_factory.mktemp("scenes")
    scene_dir = root / "0001"
    ply_dir = scene_dir / "point_cloud" / "iteration_30000"
    ply_dir.mkdir(parents=True)
    scene = random_scene(500, sh_degree=1, seed=3, extent=1.5, mean_scale=0.05)
    save_ply(scene, ply_dir / "point_cloud.ply")

    sparse = scene_dir / "sparse" / "0"
    sparse.mkdir(parents=True)
    lines = ["# images.txt"]
    for i in range(3):
        # (w,x,y,z) near (0,0,1,0): after the reference's transpose+z-flip
        # conversion (main.py:197-215) this camera looks at the origin
        q = np.array([0.02 * i, 0.01 * i, 1.0, 0.0])
        q /= np.linalg.norm(q)
        t = [0.1 * i, 0.05 * i, -3.0]
        lines.append(
            f"{i+1} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} 1 im{i}.png"
        )
        lines.append("0 0 1")  # 2D points line (skipped by parser)
    (sparse / "images.txt").write_text("\n".join(lines) + "\n")
    (sparse / "cameras.txt").write_text(
        "1 PINHOLE 1160 522 3443.9 3443.9 580 261\n"
    )
    return root, scene_dir


def test_viewer_single_frame(tmp_path, scene_fixture):
    _, scene_dir = scene_fixture
    out = tmp_path / "frames"
    rc = viewer.main(
        [
            "--gs-model", str(scene_dir),
            "--width", "128", "--height", "96",
            "--backend", "tile",
            "--out", str(out),
        ]
    )
    assert rc == 0
    img = read_image(out / "0.png")
    assert img.shape == (96, 128, 3) and img.dtype == np.uint8


def test_viewer_orbit_and_poses(tmp_path):
    out = tmp_path / "frames"
    poses_csv = tmp_path / "camera_data.csv"
    rc = viewer.main(
        [
            "--width", "64", "--height", "48",
            "--backend", "tile",
            "--orbit", "4",
            "--eye", "0", "0", "3",
            "--target", "0", "0", "0",
            "--out", str(out),
            "--save-poses", str(poses_csv),
        ]
    )
    assert rc == 0
    assert sorted(os.listdir(out)) == ["0.png", "1.png", "2.png", "3.png"]
    rows = poses_csv.read_text().strip().split("\n")
    assert len(rows) == 4 and len(rows[0].split(",")) == 9


def test_viewer_depth_mode(tmp_path):
    out = tmp_path / "frames"
    rc = viewer.main(
        [
            "--width", "64", "--height", "48",
            "--backend", "tile",
            "--mode", "depth",
            "--eye", "0", "0", "3",
            "--target", "0", "0", "0",
            "--out", str(out),
        ]
    )
    assert rc == 0
    img = read_image(out / "0.png")
    assert img.dtype in (np.uint16, np.int32) and img.ndim == 2


def test_dataset_gen_and_resume(tmp_path, scene_fixture):
    _, scene_dir = scene_fixture
    out = tmp_path / "out_baseline_05"
    argv = [
        "--gs-model", str(scene_dir),
        "--colmap-poses", str(scene_dir / "sparse" / "0"),
        "--out", str(out),
        "--width", "128", "--height", "64",
        "--backend", "tile",
    ]
    rc = dataset_gen.main(argv)
    assert rc == 0
    sdir = out / "0001"
    for sub in ("left", "right", "depth"):
        files = sorted(os.listdir(sdir / sub))
        assert files == ["0.png", "1.png", "2.png"], (sub, files)
    left = read_image(sdir / "left" / "0.png")
    depth = read_image(sdir / "depth" / "0.png")
    assert left.shape == (64, 128, 3)
    assert depth.shape == (64, 128) and depth.dtype in (np.uint16, np.int32)
    manifest = json.loads((sdir / "manifest.json").read_text())
    assert manifest["n_poses"] == 3 and manifest["rendered_this_run"] == 3
    # left and right eye must differ (stereo baseline applied)
    right = read_image(sdir / "right" / "0.png")
    assert np.abs(left.astype(int) - right.astype(int)).max() > 0

    # resume: second run renders nothing new
    rc = dataset_gen.main(argv)
    manifest = json.loads((sdir / "manifest.json").read_text())
    assert manifest["rendered_this_run"] == 0


def test_render_all_batch(tmp_path, scene_fixture):
    scenes_root, _ = scene_fixture
    report = tmp_path / "report.json"
    rc = render_all.main(
        [
            "--scenes-root", str(scenes_root),
            "--out", str(tmp_path / "out"),
            "--report", str(report),
            "--width", "64", "--height", "48",
            "--backend", "tile",
        ]
    )
    rep = json.loads(report.read_text())
    assert rep.get("0001") == "ok", rep
    assert rc == 0


def test_train_self_distill(tmp_path):
    """The differentiable path end-to-end: perturb a scene and watch the
    loss fall while recovering it from its own renders."""
    from gaussiansplattingviewer_tpu.apps import train

    out = tmp_path / "trained.npz"
    rc = train.main(
        [
            "--self-distill",
            "--steps", "80",
            "--width", "64", "--height", "48",
            "--backend", "tile",
            "--lr", "2e-3",
            "--out", str(out),
            "--log-every", "10",
        ]
    )
    assert rc == 0
    assert out.exists()


def test_viewer_poses_csv_replay(tmp_path):
    csv_path = tmp_path / "camera_data.csv"
    csv_path.write_text(
        "0,0,-1,0,-1,0,0,0,3\n"
        "0,0,-1,0,-1,0,0.2,0,3\n"
    )
    out = tmp_path / "frames"
    rc = viewer.main(
        [
            "--width", "64", "--height", "48",
            "--backend", "tile",
            "--poses-csv", str(csv_path),
            "--out", str(out),
        ]
    )
    assert rc == 0
    assert sorted(os.listdir(out)) == ["0.png", "1.png"]


def test_serve_endpoints():
    """Interactive web viewer: page, info, and render endpoints."""
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from gaussiansplattingviewer_tpu.apps.serve import ViewerState, make_handler
    from gaussiansplattingviewer_tpu.config import RenderConfig
    from gaussiansplattingviewer_tpu.models import naive_gaussian

    scene, bbox, center = naive_gaussian()
    state = ViewerState(
        scene.to_device(), center, 2.5,
        RenderConfig(width=96, height=64), "tile",
    )
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30
        ).read()
        assert b"<img id=v" in page
        info = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/info", timeout=30
        ).read()
        assert b"n_gaussians" in info
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?yaw=0.4&pitch=0.2&radius=2.5"
            "&mode=sh0&scale=1",
            timeout=120,
        ).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        # free-fly mode: camera at an explicit position, orientation from
        # yaw/pitch; page must expose the toggle
        assert b"fly" in page
        png_fly = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?fly=1&px=0&py=0&pz=2.5"
            "&yaw=3.14159&pitch=0&mode=sh0&scale=1",
            timeout=120,
        ).read()
        assert png_fly[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        server.shutdown()
