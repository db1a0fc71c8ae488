"""One-off: tile-coverage distribution of the bench scene at 1080p.

Informs the static two-level binning budgets (dense_small_slots, pool size,
dup_factor) — see PERF.md.
"""

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # pure analysis, no TPU needed
    import jax.numpy as jnp

    from gaussiansplattingviewer_tpu.config import RenderConfig
    from gaussiansplattingviewer_tpu.models import random_scene
    from gaussiansplattingviewer_tpu.ops import binning, projection
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

    splats = jax.jit(projection.project, static_argnames=("cfg",))(
        scene, view, proj, cam_pos, cfg
    )
    _, _, _, _, count, overflowed = binning.tile_bbox(splats, cfg)
    count = np.asarray(count)
    live = count[count > 0]
    print(f"n={count.size} live={live.size} total_dups={live.sum()}")
    print(f"mean={live.mean():.2f} median={np.median(live)}")
    for t in [1, 2, 3, 4, 6, 8, 12, 16]:
        frac = (live <= t).mean()
        covered = np.minimum(live, t).sum()
        print(
            f"  count<={t:2d}: {frac:6.1%} of live splats; "
            f"slots used if k1={t}: {live.size * t / 1e6:.2f}M, "
            f"dups covered {covered / live.sum():6.1%}"
        )
    big4 = live[live > 4]
    print(f"splats with count>4: {big4.size} need {big4.sum() - 4 * big4.size} extra slots")
    big2 = live[live > 2]
    print(f"splats with count>2: {big2.size} need {big2.sum() - 2 * big2.size} extra slots")


if __name__ == "__main__":
    main()
