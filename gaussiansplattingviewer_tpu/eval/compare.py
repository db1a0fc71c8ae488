"""Cross-backend comparison harness.

The reference could only compare its two renderers by eyeballing a backend
combo flip (README.md:55 "slightly different results"; main.py:944-947).
Here the comparison is quantitative and scriptable: render the same scene
with any subset of backends and report per-pair image deltas + PSNR.
"""

from __future__ import annotations

import numpy as np

from gaussiansplattingviewer_tpu.config import RenderConfig
from gaussiansplattingviewer_tpu.eval.metrics import psnr


def compare_backends(
    scene,
    view,
    proj,
    cam_pos,
    cfg: RenderConfig,
    backends=("oracle", "tile", "pallas"),
) -> dict:
    """Render with each backend and compare all pairs.

    Returns {"<a>_vs_<b>": {"max_abs": float, "mean_abs": float,
    "psnr": float}} plus {"images": {backend: array}}.
    """
    from gaussiansplattingviewer_tpu.ops.render import render

    images = {
        b: np.asarray(render(scene, view, proj, cam_pos, cfg, backend=b))
        for b in backends
    }
    out = {"images": images}
    names = list(backends)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            d = np.abs(images[a] - images[b])
            out[f"{a}_vs_{b}"] = {
                "max_abs": float(d.max()),
                "mean_abs": float(d.mean()),
                "psnr": psnr(
                    np.clip(images[a], 0, 1), np.clip(images[b], 0, 1)
                ),
            }
    return out


def main(argv=None):  # pragma: no cover - thin CLI
    import argparse

    from gaussiansplattingviewer_tpu.apps.viewer import load_scene
    from gaussiansplattingviewer_tpu.utils import transforms as tf
    from gaussiansplattingviewer_tpu.utils.camera import Camera

    ap = argparse.ArgumentParser(description="cross-backend flip test")
    ap.add_argument("--gs-model", default=None)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--backends", nargs="+",
                    default=["oracle", "tile", "pallas"])
    args = ap.parse_args(argv)

    scene, bbox, center = load_scene(args.gs_model)
    scene = scene.pad_to_multiple(256).to_device()
    cfg = RenderConfig(width=args.width, height=args.height)
    cam = Camera(h=cfg.height, w=cfg.width)
    extent = float(np.linalg.norm(np.asarray(bbox[1]) - np.asarray(bbox[0])))
    eye = np.asarray(center) + np.array([0, 0, max(extent, 1.0)])
    view = tf.look_at(eye, center, [0, -1, 0])
    res = compare_backends(
        scene, view, cam.get_project_matrix(), eye.astype(np.float32), cfg,
        tuple(args.backends),
    )
    for k, v in res.items():
        if k != "images":
            print(k, v)
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
