"""One-off: attribute full-train-step time (fwd / bwd / image assembly).

Times, as single jits (8-iter mean, hard host sync — block_until_ready lies
on this backend):
  * forward render -> image, loss on image
  * forward render -> tiles, loss on tiles (no image assembly)
  * grad of both
  * the bench's fused lax.scan step for reference

Deltas isolate the cost of the tiles->image transpose (+ its VJP) inside
the train loop, and the fwd/bwd split after the binning rework.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gaussiansplattingviewer_tpu.config import RenderConfig
    from gaussiansplattingviewer_tpu.models import random_scene
    from gaussiansplattingviewer_tpu.ops import binning
    from gaussiansplattingviewer_tpu.ops.autotune import autotune
    from gaussiansplattingviewer_tpu.ops.blend import blend_tiles
    from gaussiansplattingviewer_tpu.ops.projection import project
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

    cfg = autotune(scene, [view], [proj], [cam_pos], cfg)
    print(f"tuned: k1={cfg.dense_small_slots} ladder={cfg.pool_ladder} "
          f"rows={cfg.table_budget_rows}", flush=True)

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

    def loss_img(sc):
        img = render(sc, view, proj, cam_pos, cfg, backend="pallas")
        return jnp.sum(img * img)

    def loss_tiles(sc):
        splats = project(sc, view, proj, cam_pos, cfg)
        binned = binning.bin_splats(splats, cfg)
        rgb_tiles, trans_tiles = blend_tiles(
            cfg, True, cfg.tiles_y, 1,
            binned.table, binned.tile_starts, binned.tile_counts,
            jnp.int32(0),
        )
        return jnp.sum(rgb_tiles * rgb_tiles) + jnp.sum(trans_tiles)

    for name, loss in (("img-loss", loss_img), ("tile-loss", loss_tiles)):
        f = timeit(jax.jit(loss), scene)
        g = timeit(jax.jit(jax.grad(loss)), scene)
        print(f"{name:10s} fwd {f:7.1f} ms  grad {g:7.1f} ms  "
              f"bwd-only {g - f:7.1f}", flush=True)


if __name__ == "__main__":
    main()
