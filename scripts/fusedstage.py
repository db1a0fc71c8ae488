"""One-off: bisect the FUSED train step (bench.py's lax.scan configuration).

Separate-jit stage timings (gradstage.py) mischarge costs on this backend:
outputs that XLA would fuse into the SGD update get materialized at program
boundaries.  This script times six fused lax.scan variants, each carrying a
different pipeline suffix as the trained variable, so successive deltas
attribute cost WITHIN the single-program setting the bench measures:

  full       scene -> project -> bin -> blend -> img loss   (== bench step)
  splat      splats (projected) as the variable: bin -> blend -> img loss
  table      binned table as the variable: blend -> img loss
  *_fwd      forward-only scans of the same prefixes

  blend fwd  = table_fwd            blend bwd = table - table_fwd
  bin fwd    = splat_fwd - table_fwd
  fold(+pack vjp) = (splat - splat_fwd) - (table - table_fwd)
  proj fwd   = full_fwd - splat_fwd  proj bwd  = (full-full_fwd) - (splat-splat_fwd)
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--garden", action="store_true",
                    help="garden-scale scene (5.8M anisotropic splats)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--fused", action="store_true",
                    help="bisect the FUSED super-op path (ops/fused.py): "
                    "stages full / splat / tsrc with blend_fused inside")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussiansplattingviewer_tpu.config import RenderConfig
    from gaussiansplattingviewer_tpu.models import random_scene
    from gaussiansplattingviewer_tpu.ops import binning
    from gaussiansplattingviewer_tpu.ops.autotune import autotune
    from gaussiansplattingviewer_tpu.ops.blend import blend_tiles
    from gaussiansplattingviewer_tpu.ops.projection import project
    from gaussiansplattingviewer_tpu.ops.raster_tiles import _tiles_to_image
    from gaussiansplattingviewer_tpu.utils import transforms as tf
    from gaussiansplattingviewer_tpu.utils.camera import Camera

    ITERS = args.iters
    cfg = RenderConfig(width=1920, height=1080)
    if args.garden:
        scene = random_scene(
            5_800_000, sh_degree=3, seed=0, extent=6.0, mean_scale=0.012,
            anisotropy=1.0, opacity_mix=True,
        ).pad_to_multiple(1024).to_device()
        eye = np.array([0, 0, 11.0])
    else:
        scene = random_scene(
            1_000_000, sh_degree=3, seed=0, extent=4.0, mean_scale=0.015
        ).pad_to_multiple(1024).to_device()
        eye = np.array([0, 0, 9.0])
    cam = Camera(h=cfg.height, w=cfg.width)
    cam.fovy = 1.0
    view = jnp.asarray(tf.look_at(eye, np.zeros(3), [0, -1, 0]))
    proj = jnp.asarray(cam.get_project_matrix())
    cam_pos = jnp.asarray(eye.astype(np.float32))
    cfg = autotune(scene, [view], [proj], [cam_pos], cfg, probe=True,
                   fused=(True if args.fused else False))
    print(f"tuned: k1={cfg.dense_small_slots} rows={cfg.table_budget_rows} "
          f"fused={cfg.fused_grad} K={cfg.prefix_rows} "
          f"kb={cfg.prefix_budget_rows} rb={cfg.residual_budget_rows} "
          f"gb={cfg.grad_budget_rows}", flush=True)

    lr = 1e-12

    def img_loss_from_tiles(rgb_tiles, trans_tiles):
        img, trans = _tiles_to_image(rgb_tiles, trans_tiles, cfg)
        img = img + cfg.background * trans[..., None]
        return jnp.sum(img * img)

    def from_table(tb, starts, counts):
        rgb_t, tr_t = blend_tiles(
            cfg, True, cfg.tiles_y, 1, tb, starts, counts, jnp.int32(0)
        )
        return img_loss_from_tiles(rgb_t, tr_t)

    def from_splats(sp):
        binned = binning.bin_splats(sp, cfg)
        return from_table(binned.table, binned.tile_starts, binned.tile_counts)

    def from_scene(sc):
        return from_splats(project(sc, view, proj, cam_pos, cfg))

    if args.fused:
        from gaussiansplattingviewer_tpu.ops.fused import blend_fused

        def from_tsrc(tsrc, rows_sorted, starts_full):
            rgb_t, tr_t, _ = blend_fused(
                cfg, cfg.tiles_y, 1, tsrc, rows_sorted, starts_full,
                jnp.int32(0),
            )
            return img_loss_from_tiles(rgb_t, tr_t)

        def from_splats_fused(sp):
            pres = binning.bin_splats_presort(sp, cfg)
            return from_tsrc(
                pres.table_src, pres.rows_sorted, pres.starts_full
            )

        def from_scene_fused(sc):
            return from_splats_fused(project(sc, view, proj, cam_pos, cfg))

        splats0 = jax.jit(
            lambda sc: project(sc, view, proj, cam_pos, cfg)
        )(scene)
        pres0 = jax.jit(
            lambda sp: binning.bin_splats_presort(sp, cfg)
        )(splats0)
    else:
        splats0 = jax.jit(
            lambda sc: project(sc, view, proj, cam_pos, cfg)
        )(scene)
    binned0 = jax.jit(
        lambda sp: binning.bin_splats(sp, cfg)
    )(splats0)
    table0, starts0, counts0 = (
        binned0.table, binned0.tile_starts, binned0.tile_counts,
    )

    def scan_train(loss_fn):
        # differentiate/update only inexact leaves (ProjectedSplats carries
        # a bool `valid`)
        def split(v):
            leaves, td = jax.tree.flatten(v)
            fl = [l for l in leaves if jnp.issubdtype(l.dtype, jnp.floating)]
            def rebuild(fl):
                it = iter(fl)
                return jax.tree.unflatten(
                    td,
                    [next(it) if jnp.issubdtype(l.dtype, jnp.floating) else l
                     for l in leaves],
                )
            return fl, rebuild

        def run(v0):
            fl, rebuild = split(v0)

            def step2(fl, _):
                l, g = jax.value_and_grad(lambda f: loss_fn(rebuild(f)))(fl)
                fl = jax.tree.map(lambda p, gg: p - lr * gg, fl, g)
                return fl, l

            _, ls = jax.lax.scan(step2, fl, None, length=ITERS)
            return ls

        return jax.jit(run)

    def scan_fwd(loss_fn):
        # the carry MUST change per iteration or XLA hoists the whole
        # loop-invariant loss out of the scan (LICM) and the timing reads
        # cost/ITERS; a 1e-38*loss perturbation of the first float leaf
        # forces a real evaluation each step at negligible extra work
        def step(c, _):
            l = loss_fn(c)
            leaves, td = jax.tree.flatten(c)
            for i, lv in enumerate(leaves):
                if jnp.issubdtype(lv.dtype, jnp.floating):
                    leaves[i] = lv + jnp.asarray(1e-38 * l, lv.dtype)
                    break
            return jax.tree.unflatten(td, leaves), l

        def run(v0):
            _, ls = jax.lax.scan(step, v0, None, length=ITERS)
            return ls

        return jax.jit(run)

    def hard_sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(np.asarray(leaf).reshape(-1)[:1])

    def timeit(fn, *a):
        out = fn(*a)
        hard_sync(out)
        t0 = time.perf_counter()
        out = fn(*a)
        hard_sync(out)
        return (time.perf_counter() - t0) / ITERS * 1000

    results = {}
    if args.fused:
        rs0, sf0 = pres0.rows_sorted, pres0.starts_full
        cases = [
            ("table_fwd", scan_fwd(lambda t: from_tsrc(t, rs0, sf0)),
             pres0.table_src),
            ("table", scan_train(lambda t: from_tsrc(t, rs0, sf0)),
             pres0.table_src),
            ("splat_fwd", scan_fwd(from_splats_fused), splats0),
            ("splat", scan_train(from_splats_fused), splats0),
            ("full_fwd", scan_fwd(from_scene_fused), scene),
            ("full", scan_train(from_scene_fused), scene),
        ]
    else:
        cases = [
            ("table_fwd", scan_fwd(lambda t: from_table(t, starts0, counts0)), table0),
            ("table", scan_train(lambda t: from_table(t, starts0, counts0)), table0),
            ("splat_fwd", scan_fwd(from_splats), splats0),
            ("splat", scan_train(from_splats), splats0),
            ("full_fwd", scan_fwd(from_scene), scene),
            ("full", scan_train(from_scene), scene),
        ]
    for name, fn, arg in cases:
        results[name] = t = timeit(fn, arg)
        print(f"{name:10s} {t:7.1f} ms/iter", flush=True)

    r = results
    lbl = "gather+blend" if args.fused else "blend"
    binlbl = "presort" if args.fused else "bin fwd"
    print(f"\n{lbl} fwd   {r['table_fwd']:7.1f}")
    print(f"{lbl} bwd   {r['table'] - r['table_fwd']:7.1f}")
    print(f"{binlbl}        {r['splat_fwd'] - r['table_fwd']:7.1f}")
    print(f"fold+pack vjp  {(r['splat'] - r['splat_fwd']) - (r['table'] - r['table_fwd']):7.1f}")
    print(f"proj fwd       {r['full_fwd'] - r['splat_fwd']:7.1f}")
    print(f"proj bwd       {(r['full'] - r['full_fwd']) - (r['splat'] - r['splat_fwd']):7.1f}")


if __name__ == "__main__":
    main()
