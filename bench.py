"""Benchmark: Mpix/s/chip forward+backward at 1080p (BASELINE.json metric).

Scene: 1M synthetic Gaussians statistically similar to a MipNeRF-360
pretrained PLY (no pretrained checkpoints ship with this repo; "garden" is
~5.8M splats — scale via --n-splats when a real PLY is available, or pass
--ply PATH to load one).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline divides by 36.6 Mpix/s — the reference viewer's estimated
FORWARD-ONLY throughput (0.61 Mpix at ~60 fps, README.md:46's "comparable
to the official CUDA renderer"; it publishes no numbers, BASELINE.md) —
while this measures forward+BACKWARD, so >1.0 means the differentiable TPU
path beats the reference's display-only path.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-splats", type=int, default=1_000_000)
    ap.add_argument("--ply", type=str, default=None)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--forward-only", action="store_true")
    ap.add_argument("--backend", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussiansplattingviewer_tpu.config import RenderConfig
    from gaussiansplattingviewer_tpu.models import load_ply, random_scene
    from gaussiansplattingviewer_tpu.ops.render import render
    from gaussiansplattingviewer_tpu.utils import transforms as tf
    from gaussiansplattingviewer_tpu.utils.camera import Camera

    backend = args.backend or (
        "pallas" if jax.default_backend() == "tpu" else "tile"
    )

    cfg = RenderConfig(width=args.width, height=args.height)
    if args.ply:
        scene, bbox, center = load_ply(args.ply)
        eye = center + np.array([0, 0, 3.0])
        look = center
    else:
        scene = random_scene(
            args.n_splats, sh_degree=3, seed=0, extent=4.0, mean_scale=0.015
        )
        eye = np.array([0, 0, 9.0])
        look = np.zeros(3)
    scene = scene.pad_to_multiple(1024).to_device()

    cam = Camera(h=cfg.height, w=cfg.width)
    cam.fovy = 1.0  # wide enough to see most of the synthetic box
    view = jnp.asarray(tf.look_at(eye, look, [0, -1, 0]))
    proj = jnp.asarray(cam.get_project_matrix())
    cam_pos = jnp.asarray(eye.astype(np.float32))

    if args.forward_only:
        def step(sc):
            return render(sc, view, proj, cam_pos, cfg, backend=backend)
    else:
        def loss(sc):
            img = render(sc, view, proj, cam_pos, cfg, backend=backend)
            return jnp.sum(img * img)

        grad_fn = jax.grad(loss)

        def step(sc):
            return grad_fn(sc)

    def hard_sync(out):
        # jax.block_until_ready can return early on tunneled/remote
        # backends; a host readback of a leaf slice cannot
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.reshape(-1)[:4])

    # warmup / compile
    for _ in range(max(args.warmup, 1)):
        out = step(scene)
    hard_sync(out)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = step(scene)
    hard_sync(out)
    dt = time.perf_counter() - t0

    mpix = cfg.width * cfg.height / 1e6
    mpix_s = mpix * args.iters / dt
    ref_forward_only_mpix_s = 36.6  # see module docstring
    result = {
        "metric": "Mpix/s/chip fwd+bwd 1080p"
        if not args.forward_only
        else "Mpix/s/chip fwd 1080p",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / ref_forward_only_mpix_s, 3),
    }
    print(json.dumps(result))
    print(
        f"# backend={backend} n={len(scene)} {cfg.width}x{cfg.height} "
        f"iters={args.iters} time={dt:.2f}s ms/frame={dt/args.iters*1000:.1f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
