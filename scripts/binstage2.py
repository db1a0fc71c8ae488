"""Incremental single-jit bisection of TODAY's bin_splats (round 4).

Mirrors ops/binning.bin_splats stage by stage (three-level pools,
autotuned ladder, fused u32 keys, tight culling, SOA gather); each stage
is ONE jit computing a prefix of the pipeline reduced to scalars, so
successive deltas are true device time (see CLAUDE.md: separate-jit
micro-benchmarks lie on this backend).

Keep in sync with ops/binning.py when the pipeline changes.
"""

import math
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gaussiansplattingviewer_tpu.config import RenderConfig
    from gaussiansplattingviewer_tpu.models import random_scene
    from gaussiansplattingviewer_tpu.ops import binning, projection
    from gaussiansplattingviewer_tpu.ops.autotune import autotune
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
    cfg = autotune(scene, [view], [proj], [cam_pos], cfg, probe=True)
    print(f"ladder={cfg.pool_ladder} rows={cfg.table_budget_rows}",
          flush=True)

    splats = jax.jit(projection.project, static_argnames=("cfg",))(
        scene, view, proj, cam_pos, cfg
    )
    splats = jax.tree.map(lambda a: jax.device_put(np.asarray(a)), splats)

    n = splats.depth.shape[0]
    num_tiles = cfg.num_tiles
    sentinel = jnp.int32(num_tiles)
    depth_bits = 32 - int(num_tiles + 1).bit_length()
    k1 = min(cfg.dense_small_slots, cfg.dup_factor)
    span_cap = num_tiles
    huge_entries = cfg.pool_huge_entries or max(n // 16384, 32)
    ladder = [(int(kx), int(c)) for kx, c in cfg.pool_ladder]
    k2h = span_cap if (not ladder or span_cap > ladder[0][0]) else 0
    specs = ([(k2h, huge_entries)] if k2h else []) + [
        (kx, c) for kx, c in ladder if kx < span_cap
    ]
    kxs, caps = [], []
    left = n
    for kx, c in specs:
        c = max(min(left, c), 0)
        kxs.append(kx)
        caps.append(c)
        left -= c
    nt_pool = len(kxs)
    offs = [sum(caps[:t]) for t in range(nt_pool + 1)]
    total_pool = offs[-1]
    cap = n * k1 + sum(kx * c for kx, c in zip(kxs, caps))
    budget = cfg.table_budget_rows or cfg.table_budget_factor * n
    cap_mat = min(cap, budget)
    print(f"cap={cap} cap_mat={cap_mat}", flush=True)
    log_alpha_min = math.log(cfg.alpha_min)

    def upto(stage):
        def f(s):
            acc = []
            x0, y0, w, h, count, overflowed = binning.tile_bbox(s, cfg)
            acc += [jnp.sum(x0), jnp.sum(y0), jnp.sum(w), jnp.sum(count)]
            if stage == 0:
                return acc
            # tier partition
            need_any = count > k1
            needs = [
                count > k1 + (kxs[t + 1] if t + 1 < nt_pool else 0)
                for t in range(nt_pool)
            ]
            cat = jnp.full_like(count, nt_pool) - sum(
                nd.astype(jnp.int32) for nd in needs
            )
            sel = jnp.argsort(cat, stable=True)
            pos = binning._invert_permutation(sel)
            in_any = need_any & (pos < total_pool)
            tier_ids = [sel[offs[t]: offs[t + 1]] for t in range(nt_pool)]
            big_pos = jnp.where(in_any, pos, total_pool)
            acc += [jnp.sum(pos), jnp.sum(big_pos)] + [
                jnp.sum(t) for t in tier_ids
            ]
            if stage == 1:
                return acc
            # augmented table source
            f32 = jnp.float32
            table_src = binning.pack_table(s)
            table_src = table_src.at[:, binning.COL_X0].set(x0.astype(f32))
            table_src = table_src.at[:, binning.COL_Y0].set(y0.astype(f32))
            table_src = table_src.at[:, binning.COL_W].set(w.astype(f32))
            table_src = table_src.at[:, binning.COL_COUNT].set(
                count.astype(f32)
            )
            acc += [jnp.sum(table_src)]
            if stage == 2:
                return acc
            dq = jax.lax.bitcast_convert_type(
                jnp.maximum(s.depth.astype(jnp.float32), 0.0), jnp.uint32
            ) >> jnp.uint32(32 - depth_bits)

            def tight_fields(mx, my, ca_, cb_, cc_, opac):
                thr = 2.0 * (
                    jnp.log(jnp.maximum(opac, 1e-20)) - log_alpha_min
                )
                ca_ = jnp.maximum(ca_, 1e-12)
                cc_ = jnp.maximum(cc_, 1e-12)
                return dict(ccx=mx, ccy=my, ca=ca_, cb=cb_, cc=cc_,
                            rbc=cb_ / cc_, rba=cb_ / ca_, thr=thr)

            def level_keys(v, k_lo, k_hi):
                kk = jnp.arange(k_lo, k_hi, dtype=jnp.int32)[:, None]
                w_s = jnp.maximum(v["w"], 1)[None, :]
                qq = binning._floordiv_small(kk, w_s)
                rr = kk - qq * w_s
                tx_i = v["x0"][None, :] + rr
                ty_i = v["y0"][None, :] + qq
                live = kk < v["count"][None, :]
                ts = float(cfg.tile_size)
                xlo = tx_i.astype(jnp.float32) * ts + 0.5 - v["ccx"][None, :]
                ylo = ty_i.astype(jnp.float32) * ts + 0.5 - v["ccy"][None, :]
                xhi = xlo + (ts - 1.0)
                yhi = ylo + (ts - 1.0)
                va, vb, vc = (v["ca"][None, :], v["cb"][None, :],
                              v["cc"][None, :])
                vrbc, vrba = v["rbc"][None, :], v["rba"][None, :]

                def edge_x(ex):
                    dy = jnp.clip(-vrbc * ex, ylo, yhi)
                    return ex * (va * ex + 2.0 * vb * dy) + vc * dy * dy

                def edge_y(ey):
                    dx = jnp.clip(-vrba * ey, xlo, xhi)
                    return dx * (va * dx + 2.0 * vb * ey) + vc * ey * ey

                f_min = jnp.minimum(
                    jnp.minimum(edge_x(xlo), edge_x(xhi)),
                    jnp.minimum(edge_y(ylo), edge_y(yhi)),
                )
                inside = (xlo <= 0.0) & (xhi >= 0.0) & (ylo <= 0.0) & (
                    yhi >= 0.0
                )
                f_min = jnp.where(inside, 0.0, f_min)
                live = live & (f_min <= v["thr"][None, :])
                tiles = ty_i * cfg.tiles_x + tx_i
                tiles = jnp.where(live, tiles, sentinel).astype(jnp.uint32)
                return (
                    (tiles << jnp.uint32(depth_bits)) | v["dq"][None, :]
                ).reshape(-1)

            op_m = jnp.where(s.valid, s.opacity, 0.0)
            vfull = dict(x0=x0, y0=y0, w=w, count=count, dq=dq)
            vfull.update(tight_fields(
                s.mean2d[:, 0], s.mean2d[:, 1], s.conic[:, 0],
                s.conic[:, 1], s.conic[:, 2], op_m,
            ))
            all_ids = jnp.arange(n, dtype=jnp.int32)
            keys_parts = [level_keys(vfull, 0, k1)]
            row_parts = [
                jnp.broadcast_to(all_ids[None, :], (k1, n)).reshape(-1)
            ]
            for ids, kx, clen in zip(tier_ids, kxs, caps):
                if clen == 0:
                    continue
                rows_e = table_src[ids]
                ve = dict(
                    x0=rows_e[:, binning.COL_X0].astype(jnp.int32),
                    y0=rows_e[:, binning.COL_Y0].astype(jnp.int32),
                    w=rows_e[:, binning.COL_W].astype(jnp.int32),
                    count=rows_e[:, binning.COL_COUNT].astype(jnp.int32),
                    dq=jax.lax.bitcast_convert_type(
                        jnp.maximum(rows_e[:, binning.COL_DEPTH], 0.0),
                        jnp.uint32,
                    ) >> jnp.uint32(32 - depth_bits),
                )
                ve.update(tight_fields(
                    rows_e[:, binning.COL_CX], rows_e[:, binning.COL_CY],
                    rows_e[:, binning.COL_A], rows_e[:, binning.COL_B],
                    rows_e[:, binning.COL_C],
                    rows_e[:, binning.COL_OPACITY],
                ))
                keys_parts.append(level_keys(ve, k1, k1 + kx))
                row_parts.append(
                    jnp.broadcast_to(ids[None, :], (kx, clen)).reshape(-1)
                )
            keys = jnp.concatenate(keys_parts)
            slot_row = jnp.concatenate(row_parts)
            acc += [jnp.sum(keys), jnp.sum(slot_row)]
            if stage == 3:
                return acc
            key_sorted, rows_sorted, perm = jax.lax.sort(
                (keys, slot_row, jnp.arange(cap, dtype=jnp.int32)),
                num_keys=2,
                is_stable=True,
            )
            acc += [jnp.sum(key_sorted), jnp.sum(rows_sorted),
                    jnp.sum(perm)]
            if stage == 4:
                return acc
            starts = jnp.searchsorted(
                key_sorted,
                jnp.arange(num_tiles + 1, dtype=jnp.uint32)
                << jnp.uint32(depth_bits),
                side="left",
            ).astype(jnp.int32)
            acc += [jnp.sum(starts)]
            if stage == 5:
                return acc
            rows_trunc = rows_sorted[:cap_mat]
            table = table_src[rows_trunc].T
            acc += [jnp.sum(table)]
            return acc

        return jax.jit(f)

    def hard_sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(np.asarray(leaf).reshape(-1)[:1])

    names = [
        (0, "s0 bbox"),
        (1, "s1 +tier partition (2x 1M sort)"),
        (2, "s2 +pack/augment table_src"),
        (3, "s3 +keys (tight culling)"),
        (4, f"s4 +{cap/1e6:.1f}M sort (3 ops, 2 keys)"),
        (5, "s5 +searchsorted"),
        (6, f"s6 +table gather ({cap_mat/1e6:.1f}M rows, SOA out)"),
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
        print(f"{name:44s} {ms:8.1f} ms   (delta {ms - prev:+7.1f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
