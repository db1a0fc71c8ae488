"""One-off: incremental single-jit bisection of bin_splats device time.

Each stage is ONE jitted program computing a prefix of the binning pipeline
and reducing every live intermediate to a scalar (sum) so nothing is DCE'd
but output transfer stays trivial.  Stage-to-stage deltas are real device
time, immune to per-dispatch overhead.

NOTE: replicates ops/binning.bin_splats internals as of the TWO-level
scheme; binning has since moved to three pool levels — keep deltas
directionally, re-sync before trusting absolute numbers.
"""

import time

import numpy as np


def main():
    import jax
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
    splats = jax.tree.map(lambda a: jax.device_put(np.asarray(a)), splats)

    n = splats.depth.shape[0]
    num_tiles = cfg.num_tiles
    k1 = cfg.dense_small_slots
    k2 = cfg.dup_factor - k1
    n_big_cap = min(n, max(n // 4, 4096))
    cap = n * k1 + n_big_cap * k2
    cap_mat = min(cap, cfg.table_budget_factor * n)
    depth_bits = 32 - int(num_tiles + 1).bit_length()
    sentinel = jnp.int32(num_tiles)

    def upto(stage):
        def f(s):
            acc = []
            x0, y0, w, h, count, overflowed = binning.tile_bbox(s, cfg)
            acc += [jnp.sum(x0), jnp.sum(y0), jnp.sum(w), jnp.sum(count)]
            if stage == 0:
                return acc
            is_big = count > k1
            sel = jnp.argsort(
                jnp.where(is_big, 0, 1).astype(jnp.int32), stable=True
            )
            pos = binning._invert_permutation(sel)
            in_pool = pos < n_big_cap
            spilled = is_big & ~in_pool
            count2 = jnp.where(spilled, k1, count)
            big_ids = sel[:n_big_cap]
            big_pos = jnp.where(is_big & in_pool, pos, n)
            acc += [jnp.sum(big_ids), jnp.sum(big_pos)]
            if stage == 1:
                return acc
            dq = jax.lax.bitcast_convert_type(
                jnp.maximum(s.depth.astype(jnp.float32), 0.0), jnp.uint32
            ) >> jnp.uint32(32 - depth_bits)

            def level_keys(vx0, vy0, vw, vcount, vdq, k_lo, k_hi):
                kk = jnp.arange(k_lo, k_hi, dtype=jnp.int32)[:, None]
                w_s = jnp.maximum(vw, 1)[None, :]
                qq = binning._floordiv_small(kk, w_s)
                rr = kk - qq * w_s
                tiles = (vy0[None, :] + qq) * cfg.tiles_x + (
                    vx0[None, :] + rr
                )
                live = kk < vcount[None, :]
                tiles = jnp.where(live, tiles, sentinel).astype(jnp.uint32)
                return (
                    (tiles << jnp.uint32(depth_bits)) | vdq[None, :]
                ).reshape(-1)

            all_ids = jnp.arange(n, dtype=jnp.int32)
            keys = jnp.concatenate(
                [
                    level_keys(x0, y0, w, count2, dq, 0, k1),
                    level_keys(
                        x0[big_ids], y0[big_ids], w[big_ids],
                        count2[big_ids], dq[big_ids], k1, k1 + k2,
                    ),
                ]
            )
            slot_row = jnp.concatenate(
                [
                    jnp.broadcast_to(all_ids[None, :], (k1, n)).reshape(-1),
                    jnp.broadcast_to(
                        big_ids[None, :], (k2, n_big_cap)
                    ).reshape(-1),
                ]
            )
            acc += [jnp.sum(keys), jnp.sum(slot_row)]
            if stage == 2:
                return acc
            key_sorted, rows_sorted, perm = jax.lax.sort(
                (keys, slot_row, jnp.arange(cap, dtype=jnp.int32)),
                num_keys=1,
                is_stable=True,
            )
            acc += [jnp.sum(key_sorted), jnp.sum(perm), jnp.sum(rows_sorted)]
            if stage == 3:
                return acc
            starts = jnp.searchsorted(
                key_sorted,
                jnp.arange(num_tiles + 1, dtype=jnp.uint32)
                << jnp.uint32(depth_bits),
                side="left",
            ).astype(jnp.int32)
            starts = jnp.minimum(starts, cap_mat)
            acc += [jnp.sum(starts)]
            if stage == 4:
                return acc
            table_src = binning.pack_table(s)
            acc += [jnp.sum(table_src)]
            if stage == 45:  # pack_table isolation
                return acc
            rows_trunc = rows_sorted[:cap_mat]
            table = table_src[rows_trunc]
            acc += [jnp.sum(table)]
            if stage == 5:
                return acc
            inv_perm = binning._invert_permutation(perm)
            acc += [jnp.sum(inv_perm)]
            return acc

        return jax.jit(f)

    def hard_sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(np.asarray(leaf).reshape(-1)[:1])

    names = [
        (0, "s0 bbox"),
        (1, "s1 +pool bookkeeping (2x 1M sort)"),
        (2, "s2 +key construction"),
        (3, "s3 +7M sort (3 operands)"),
        (4, "s4 +searchsorted"),
        (45, "s45 +pack_table"),
        (5, "s5 +table gather"),
        (6, "s6 +invert_permutation(7M)"),
    ]
    prev = 0.0
    for stage, name in names:
        fn = upto(stage)
        out = fn(splats)
        hard_sync(out)
        out = fn(splats)
        hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(splats)
        hard_sync(out)
        ms = (time.perf_counter() - t0) / 8 * 1000
        print(f"{name:36s} {ms:8.1f} ms   (delta {ms - prev:+7.1f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
