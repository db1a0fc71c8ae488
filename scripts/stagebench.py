"""Per-stage TPU timing breakdown: projection / binning / blend, fwd and bwd.

Guides optimization (PERF.md); not part of the driver bench contract.
Usage: python scripts/stagebench.py [--n-splats N] [--iters K]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-splats", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussiansplattingviewer_tpu.config import RenderConfig
    from gaussiansplattingviewer_tpu.models import random_scene
    from gaussiansplattingviewer_tpu.ops import binning, projection
    from gaussiansplattingviewer_tpu.ops.render import render
    from gaussiansplattingviewer_tpu.utils import transforms as tf
    from gaussiansplattingviewer_tpu.utils.camera import Camera

    cfg = RenderConfig(width=1920, height=1080)
    scene = random_scene(
        args.n_splats, sh_degree=3, seed=0, extent=4.0, mean_scale=0.015
    ).pad_to_multiple(1024).to_device()
    cam = Camera(h=cfg.height, w=cfg.width)
    cam.fovy = 1.0
    eye = np.array([0, 0, 9.0])
    view = jnp.asarray(tf.look_at(eye, np.zeros(3), [0, -1, 0]))
    proj = jnp.asarray(cam.get_project_matrix())
    cam_pos = jnp.asarray(eye.astype(np.float32))

    def hard_sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.reshape(-1)[:4])

    def timeit(name, fn, *a):
        out = fn(*a)
        hard_sync(out)
        out = fn(*a)
        hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        hard_sync(out)
        ms = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name:30s} {ms:8.1f} ms")
        return out

    project = jax.jit(projection.project, static_argnames=("cfg",))
    splats = timeit("projection fwd", project, scene, view, proj, cam_pos, cfg)
    binned = timeit(
        "bin_splats fwd", lambda s: binning.bin_splats(s, cfg), splats
    )

    def proj_bin(sc):
        return binning.bin_splats(
            projection.project(sc, view, proj, cam_pos, cfg), cfg
        )

    timeit("projection+binning fwd", jax.jit(proj_bin), scene)

    fwd = jax.jit(
        lambda sc: render(sc, view, proj, cam_pos, cfg, backend="pallas")
    )
    timeit("full render fwd", fwd, scene)

    # grad of projection+binning only (binning VJP + projection VJP)
    def pb_loss(sc):
        b = proj_bin(sc)
        return jnp.sum(b.table * b.table)

    timeit("proj+bin fwd+bwd", jax.jit(jax.grad(pb_loss)), scene)

    def loss(sc):
        img = render(sc, view, proj, cam_pos, cfg, backend="pallas")
        return jnp.sum(img * img)

    timeit("full fwd+bwd", jax.jit(jax.grad(loss)), scene)


if __name__ == "__main__":
    main()
