"""Stereo training-data generator: left/right/disparity triplets from COLMAP poses.

The TPU-native rebuild of the reference's dataset loop (main.py:793-923):
for every COLMAP pose, render
  * left RGB   (current render mode, pose view matrix),
  * disparity  (render mode -1: per-splat |x_l - x_r| in image-width units,
                scaled x65535 to uint16 — main.py:875-879),
  * right RGB  (view translated by the stereo baseline in view space,
                main.py:376-380),
into ``<out>/<scene>/{left,right,depth}/<index>.png`` (main.py:702-711).

Differences from the reference, by design:
  * headless and batched — no GLFW window, no FBO round-trips, no every-5th
    -frame settling (main.py:808-815): each pose renders exactly once;
  * resumable like the reference's saved_image[] (main.py:713,839) but
    across restarts: existing complete triplets are skipped unless --force;
  * a manifest.json records scene, pose count, baseline and resolution.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode
from gaussiansplattingviewer_tpu.apps.viewer import MODE_NAMES, find_ply, load_scene
from gaussiansplattingviewer_tpu.utils import colmap
from gaussiansplattingviewer_tpu.utils.camera import Camera
from gaussiansplattingviewer_tpu.utils.image_io import (
    ensure_dirs,
    write_disparity16,
    write_rgb8,
)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--gs-model", "--gs_model", dest="gs_model", required=True)
    ap.add_argument("--colmap-poses", "--colmap_poses", dest="colmap_poses",
                    required=True, help="COLMAP sparse dir with images.txt")
    ap.add_argument("--out", default="out_baseline_05")  # ref main.py:696
    ap.add_argument("--baseline", type=float, default=-0.5)  # ref main.py:280
    ap.add_argument("--width", type=int, default=1160)
    ap.add_argument("--height", type=int, default=522)
    ap.add_argument("--mode", choices=sorted(MODE_NAMES), default="sh3")
    ap.add_argument("--backend", choices=["oracle", "tile", "pallas"],
                    default=None)
    ap.add_argument("--scale-modifier", type=float, default=1.0)
    ap.add_argument("--force", action="store_true",
                    help="re-render even if the triplet exists")
    ap.add_argument("--max-poses", type=int, default=None)
    ap.add_argument("--use-intrinsics", action="store_true",
                    help="build the projection from cameras.txt fx/fy/cx/cy "
                    "(rescaled to the render resolution) instead of the "
                    "default lens; the reference parses these and discards "
                    "them (main.py:628-632)")
    return ap


def triplet_paths(scene_dir: str, idx: int):
    return (
        os.path.join(scene_dir, "left", f"{idx}.png"),
        os.path.join(scene_dir, "right", f"{idx}.png"),
        os.path.join(scene_dir, "depth", f"{idx}.png"),
    )


def generate(args) -> int:
    import jax

    from gaussiansplattingviewer_tpu.ops.render import render

    backend = args.backend or (
        "pallas" if jax.default_backend() == "tpu" else "tile"
    )

    poses, cams = colmap.load_sparse_dir(args.colmap_poses)
    if args.max_poses:
        poses = poses[: args.max_poses]
    print(f"{len(poses)} poses from {args.colmap_poses}", file=sys.stderr)

    scene, bbox, center = load_scene(args.gs_model)
    scene = scene.pad_to_multiple(256).to_device()

    scene_name = os.path.basename(os.path.normpath(args.gs_model)) or "0000"
    scene_dir = os.path.join(args.out, scene_name)
    ensure_dirs(
        os.path.join(scene_dir, "left"),
        os.path.join(scene_dir, "right"),
        os.path.join(scene_dir, "depth"),
    )

    cfg_rgb = RenderConfig(
        width=args.width, height=args.height,
        mode=MODE_NAMES[args.mode], scale_modifier=args.scale_modifier,
        stereo_baseline=args.baseline,
    )
    cfg_disp = cfg_rgb.with_(mode=RenderMode.DEPTH)
    cam = Camera(h=args.height, w=args.width)
    default_proj = cam.get_project_matrix()

    done = 0
    t0 = time.time()
    for idx, pose in enumerate(poses):
        lp, rp, dp = triplet_paths(scene_dir, idx)
        if not args.force and all(os.path.exists(p) for p in (lp, rp, dp)):
            continue
        proj = default_proj
        if args.use_intrinsics:
            ccam = colmap.camera_for_pose(cams, pose)
            if ccam is not None:
                proj = colmap.camera_projection(
                    ccam, args.width, args.height
                )
        view_l, view_r, cam_l, cam_r = colmap.pose_to_stereo_views(
            pose, baseline=args.baseline
        )
        img_l = np.asarray(render(scene, view_l, proj, cam_l, cfg_rgb,
                                  backend=backend))
        disp = np.asarray(render(scene, view_l, proj, cam_l, cfg_disp,
                                 backend=backend))
        img_r = np.asarray(render(scene, view_r, proj, cam_r, cfg_rgb,
                                  backend=backend))
        write_rgb8(lp, np.clip(img_l, 0, 1))
        write_rgb8(rp, np.clip(img_r, 0, 1))
        write_disparity16(dp, disp[..., 0])
        done += 1
        if done % 10 == 0:
            print(f"  {done} triplets ({(time.time()-t0)/done*1000:.0f} "
                  f"ms each)", file=sys.stderr)

    manifest = {
        "scene": scene_name,
        "n_poses": len(poses),
        "rendered_this_run": done,
        "baseline": args.baseline,
        "width": args.width,
        "height": args.height,
        "mode": args.mode,
        "use_intrinsics": bool(args.use_intrinsics),
        "backend": backend,
        "n_gaussians": int(len(scene)),
    }
    with open(os.path.join(scene_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"scene {scene_name}: {done} new triplets -> {scene_dir}",
          file=sys.stderr)
    return 0


def main(argv=None) -> int:
    return generate(build_parser().parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
