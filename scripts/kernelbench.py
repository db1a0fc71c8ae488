"""One-off: price the blend kernels and the layout transposes around them.

Times (8-iter mean, hard host sync):
  * fwd kernel given AoS table (includes the (Dpad,16)->(16,Dpad) transpose)
  * fwd kernel given pre-transposed SoA table (kernel work only)
  * bwd kernel AoS in/out (2 transposes) vs SoA in/out (none)
  * the fold's 9 column slices: sort of SoA rows vs AoS column extracts

The deltas decide whether to re-plumb the pipeline in SoA (the kernels'
native layout) end-to-end.
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
    from gaussiansplattingviewer_tpu.ops.pallas.tile_raster_fwd import (
        rasterize_binned_pallas,
        rasterize_binned_pallas_soa,
    )
    from gaussiansplattingviewer_tpu.ops.pallas.tile_raster_bwd import (
        blend_bwd_pallas,
        blend_bwd_pallas_soa,
    )
    from gaussiansplattingviewer_tpu.ops.projection import project
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

    splats = jax.jit(project, static_argnames=("cfg",))(
        scene, view, proj, cam_pos, cfg
    )
    binned = binning.bin_splats(splats, cfg)
    table_soa = jax.device_put(np.asarray(binned.table))
    table = jax.device_put(np.asarray(binned.table).T.copy())
    starts = jax.device_put(np.asarray(binned.tile_starts))
    counts = jax.device_put(np.asarray(binned.tile_counts))
    print(f"table {table.shape}", flush=True)

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

    r0 = jnp.int32(0)
    fA = jax.jit(lambda t: rasterize_binned_pallas(t, starts, counts, r0, cfg))
    fB = jax.jit(
        lambda t: rasterize_binned_pallas_soa(t, starts, counts, r0, cfg)
    )
    tA = timeit(fA, table)
    tB = timeit(fB, table_soa)
    print(f"fwd kernel AoS (incl .T) {tA:7.1f} ms  SoA {tB:7.1f} ms  "
          f"transpose {tA - tB:+6.1f}", flush=True)

    from gaussiansplattingviewer_tpu.ops.pallas.tile_raster_fwd import (
        rasterize_binned_pallas_train,
    )

    rgb, trans, ckpt, nproc = rasterize_binned_pallas_train(
        table_soa, starts, counts, r0, cfg
    )
    g_rgb = jnp.ones_like(rgb)
    g_trans = jnp.zeros_like(trans)
    bA = jax.jit(lambda t: blend_bwd_pallas(
        t, starts, counts, nproc, ckpt, r0, g_rgb, g_trans, trans, cfg
    ))
    bB = jax.jit(lambda t: blend_bwd_pallas_soa(
        t, starts, counts, nproc, ckpt, r0, g_rgb, g_trans, trans, cfg
    ))
    tbA = timeit(bA, table)
    tbB = timeit(bB, table_soa)
    print(f"bwd kernel AoS (2x .T)   {tbA:7.1f} ms  SoA {tbB:7.1f} ms  "
          f"transposes {tbA - tbB:+6.1f}", flush=True)

    # fold column-extraction cost: sort with 9 payload columns taken from
    # AoS columns vs SoA rows (keys identical)
    cap = table.shape[0] - binning.TABLE_PAD
    perm = jax.device_put(
        np.random.default_rng(0).permutation(cap).astype(np.int32)
    )
    g_aos = table[:cap]
    g_soa = table_soa[:, :cap]

    def fold_aos(g):
        cols = [g[:, j] for j in range(9)]
        return jax.lax.sort((perm, *cols), num_keys=1)[1]

    def fold_soa(g):
        cols = [g[j] for j in range(9)]
        return jax.lax.sort((perm, *cols), num_keys=1)[1]

    ta = timeit(jax.jit(fold_aos), g_aos)
    ts = timeit(jax.jit(fold_soa), g_soa)
    print(f"fold sort from AoS cols  {ta:7.1f} ms  from SoA rows {ts:7.1f} "
          f"ms  col-extract {ta - ts:+6.1f}", flush=True)


if __name__ == "__main__":
    main()
