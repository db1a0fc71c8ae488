"""Micro-bench of bin_splats sub-stages on TPU (guides PERF.md work).

Times each internal piece of ops/binning.bin_splats in isolation:
key construction, the fused u32 sort, searchsorted, the table gather,
and the permutation-inversion sorts the backward needs.
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
        print(f"{name:34s} {ms:8.1f} ms", flush=True)
        return out

    splats = jax.jit(projection.project, static_argnames=("cfg",))(
        scene, view, proj, cam_pos, cfg
    )
    n = splats.depth.shape[0]
    num_tiles = cfg.num_tiles
    k1 = cfg.dense_small_slots
    k2 = cfg.dup_factor - k1
    n_big_cap = min(n, max(n // 4, 4096))
    cap = n * k1 + n_big_cap * k2
    cap_mat = min(cap, cfg.table_budget_factor * n)
    print(f"n={n} cap={cap} cap_mat={cap_mat} tiles={num_tiles}")

    # --- stage 1: bbox + two-level bookkeeping (incl. two 1M sorts)
    def bookkeeping(s):
        x0, y0, w, h, count, _ = binning.tile_bbox(s, cfg)
        is_big = count > k1
        sel = jnp.argsort(
            jnp.where(is_big, 0, 1).astype(jnp.int32), stable=True
        )
        pos = binning._invert_permutation(sel)
        return x0, y0, w, h, count, sel, pos

    timeit("bbox+pool bookkeeping", jax.jit(bookkeeping), splats)

    # --- stage 2: key construction only
    def make_keys(s):
        x0, y0, w, h, count, sel, pos = bookkeeping(s)
        depth_bits = 32 - int(num_tiles + 1).bit_length()
        dq = jax.lax.bitcast_convert_type(
            jnp.maximum(s.depth.astype(jnp.float32), 0.0), jnp.uint32
        ) >> jnp.uint32(32 - depth_bits)
        big_ids = sel[:n_big_cap]
        sentinel = jnp.int32(num_tiles)

        def level_keys(ids, k_lo, k_hi):
            kk = jnp.arange(k_lo, k_hi, dtype=jnp.int32)[None, :]
            w_s = jnp.maximum(w[ids], 1)[:, None]
            tiles = (y0[ids][:, None] + kk // w_s) * cfg.tiles_x + (
                x0[ids][:, None] + kk % w_s
            )
            live = kk < count[ids][:, None]
            tiles = jnp.where(live, tiles, sentinel).astype(jnp.uint32)
            return (
                (tiles << jnp.uint32(depth_bits)) | dq[ids][:, None]
            ).reshape(-1)

        all_ids = jnp.arange(n, dtype=jnp.int32)
        keys = jnp.concatenate(
            [level_keys(all_ids, 0, k1), level_keys(big_ids, k1, k1 + k2)]
        )
        return keys

    keys = timeit("key construction (7M u32)", jax.jit(make_keys), splats)
    keys = jax.device_put(np.asarray(keys))

    # --- stage 3: the sorts
    vals = jnp.arange(cap, dtype=jnp.int32)
    timeit(
        "sort_key_val 7M (u32,i32)",
        jax.jit(lambda k: jax.lax.sort_key_val(k, vals, is_stable=True)),
        keys,
    )
    timeit(
        "sort keys-only 7M u32",
        jax.jit(lambda k: jax.lax.sort(k, is_stable=True)),
        keys,
    )
    _, perm = jax.lax.sort_key_val(keys, vals, is_stable=True)
    perm = jax.device_put(np.asarray(perm))
    timeit(
        "invert_permutation 7M",
        jax.jit(binning._invert_permutation),
        perm,
    )

    # --- stage 4: the table gather
    table_src = jax.jit(binning.pack_table)(splats)
    rows = jax.device_put(
        np.random.default_rng(0).integers(
            0, n, size=cap_mat, dtype=np.int32
        )
    )
    timeit(
        "perm slice+row map (7M gather)",
        jax.jit(lambda p: perm[:cap_mat]),
        perm,
    )
    timeit(
        "table row gather (7M x 16 f32)",
        jax.jit(lambda t, r: t[r]),
        table_src,
        rows,
    )
    # narrower gather for comparison
    timeit(
        "table row gather (7M x 8 f32)",
        jax.jit(lambda t, r: t[:, :8][r]),
        table_src,
        rows,
    )

    # live duplicate count (how much of cap is real work)
    b = jax.jit(
        lambda s: binning.bin_splats(s, cfg), static_argnums=()
    )(splats)
    print(
        f"live duplicates: {int(b.num_duplicates)} / cap {cap} "
        f"({int(b.num_duplicates)/cap:.1%}), truncated={int(b.truncated)}"
    )


if __name__ == "__main__":
    main()
