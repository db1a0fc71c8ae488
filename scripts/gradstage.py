"""One-off: incremental single-jit bisection of the BACKWARD pass.

For each pipeline prefix, times fwd-only and grad(loss) as single jits;
(grad - fwd) deltas between stages attribute backward cost to projection
VJP, pack VJP, binning VJP (gather/fold/inv-perm), and the Pallas blend
bwd kernel.
"""

import time

import numpy as np


def main():
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
        1_000_000, sh_degree=3, seed=0, extent=4.0, mean_scale=0.015
    ).pad_to_multiple(1024).to_device()
    cam = Camera(h=cfg.height, w=cfg.width)
    cam.fovy = 1.0
    eye = np.array([0, 0, 9.0])
    view = jnp.asarray(tf.look_at(eye, np.zeros(3), [0, -1, 0]))
    proj = jnp.asarray(cam.get_project_matrix())
    cam_pos = jnp.asarray(eye.astype(np.float32))

    from gaussiansplattingviewer_tpu.ops.autotune import autotune

    cfg = autotune(scene, [view], [proj], [cam_pos], cfg)  # match bench.py

    def hard_sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(np.asarray(leaf).reshape(-1)[:1])

    def timeit(fn, *a):
        out = fn(*a)
        hard_sync(out)
        out = fn(*a)
        hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(*a)
        hard_sync(out)
        return (time.perf_counter() - t0) / 8 * 1000

    def loss_proj(sc):
        s = projection.project(sc, view, proj, cam_pos, cfg)
        m = s.valid.astype(jnp.float32)
        return (
            jnp.sum(s.mean2d**2 * m[:, None])
            + jnp.sum(s.conic**2 * m[:, None])
            + jnp.sum(s.color**2 * m[:, None])
            + jnp.sum(s.opacity**2 * m)
            + jnp.sum(s.depth**2 * m)
            + jnp.sum(s.radius**2 * m[:, None])
        )

    def loss_pack(sc):
        s = projection.project(sc, view, proj, cam_pos, cfg)
        return jnp.sum(binning.pack_table(s) ** 2)

    def loss_bin(sc):
        s = projection.project(sc, view, proj, cam_pos, cfg)
        b = binning.bin_splats(s, cfg)
        return jnp.sum(b.table**2)

    def loss_full(sc):
        img = render(sc, view, proj, cam_pos, cfg, backend="pallas")
        return jnp.sum(img * img)

    stages = [
        ("projection", loss_proj),
        ("pack_table", loss_pack),
        ("binning", loss_bin),
        ("full render", loss_full),
    ]
    prev_f = prev_g = 0.0
    for name, loss in stages:
        f = timeit(jax.jit(loss), scene)
        g = timeit(jax.jit(jax.grad(loss)), scene)
        print(
            f"{name:14s} fwd {f:7.1f} ms  grad {g:7.1f} ms  "
            f"bwd-only {g - f:7.1f}  stage-bwd-delta {(g - f) - (prev_g - prev_f):+7.1f}",
            flush=True,
        )
        prev_f, prev_g = f, g


if __name__ == "__main__":
    main()
