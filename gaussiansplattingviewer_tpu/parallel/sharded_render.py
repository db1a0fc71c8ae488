"""Multi-chip rendering: image tile rows sharded over the mesh.

Design (SURVEY.md §2.4 / BASELINE config 5):
  * Gaussian parameters REPLICATED on every chip (they are the "weights");
  * the image's tile rows sharded over the ``tiles`` mesh axis: each chip
    projects all splats (cheap, embarrassingly parallel recompute — avoids
    an all-gather of culled lists), bins only the splats touching its band,
    and runs the Pallas/XLA blend on its band;
  * the output image is left sharded by rows (devices hold their bands);
  * under jax.grad, shard_map's transpose inserts ONE psum over the scene
    gradients — the gradient all-reduce rides ICI and XLA overlaps it with
    the remaining backward work.

The tile-row count is padded to a multiple of the mesh size; padded rows
render background and are cropped off.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from gaussiansplattingviewer_tpu.config import RenderConfig
from gaussiansplattingviewer_tpu.models.gaussians import GaussianData
from gaussiansplattingviewer_tpu.ops import binning
from gaussiansplattingviewer_tpu.ops.blend import blend_tiles
from gaussiansplattingviewer_tpu.ops.compaction import (
    compact_by_mask,
    compact_splats,
    pack_splats,
    unpack_splats,
)
from gaussiansplattingviewer_tpu.ops.projection import project
from gaussiansplattingviewer_tpu.parallel.mesh import TILE_AXIS, tile_axes


def _rows_per_shard(cfg: RenderConfig, n_shards: int) -> int:
    return -(-cfg.tiles_y // n_shards)


def _round_budget(b: int, n: int) -> int:
    return min(n, max(-(-b // 1024) * 1024, 4096))


_EXCHANGE_DENSE_SLOTS = 4  # dests covered without the pool (spans <= 4 bands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _exchange_gather(levels, pack12, ids_take, perm, key_sorted, starts,
                     pool_pos):
    """pack12[ids_take] — materialize the per-destination splat rows.

    ``levels = (k_d, n_loc, kx, cap_pool, budget, n_shards)`` describes the
    dest-slot layout (see _exchange_parts).  The VJP routes the
    (n_shards, budget, 12) row gradients back to the n_loc source splats
    without any scatter, mirroring binning._gather_table_rows: scatter the
    taken grads into sorted-position order with ONE small gather (position
    p was taken iff p - starts[key_sorted[p]] < budget), ONE key-value
    sort by ``perm`` restores flat-slot order, then contiguous reshape
    sums fold the dense slots and ``pool_pos`` routes the pool slots.
    """
    return pack12[ids_take]


def _exchange_gather_fwd(levels, pack12, ids_take, perm, key_sorted, starts,
                         pool_pos):
    return pack12[ids_take], (perm, key_sorted, starts, pool_pos)


def _exchange_gather_bwd(levels, res, g):
    k_d, n_loc, kx, cap_pool, budget, n_shards = levels
    perm, key_sorted, starts, pool_pos = res
    cap = perm.shape[0]
    width = g.shape[-1]
    # sorted position -> (dest, rank-in-dest); taken iff rank < budget
    pos = jnp.arange(cap, dtype=jnp.int32)
    dest = jnp.minimum(key_sorted.astype(jnp.int32), n_shards)
    rank = pos - starts[jnp.minimum(dest, n_shards - 1)]
    taken = (dest < n_shards) & (rank < budget)
    g_flat = jnp.concatenate(
        [g.reshape(n_shards * budget, width),
         jnp.zeros((1, width), g.dtype)], axis=0
    )
    idx = jnp.where(taken, dest * budget + rank, n_shards * budget)
    g_sorted = g_flat[idx]  # (cap, 12) in sorted order
    ops = (perm,) + tuple(g_sorted[:, j] for j in range(width))
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    g_by_flat = jnp.stack(sorted_ops[1:], axis=0).T  # (cap, 12) flat order
    g1 = g_by_flat[: n_loc * k_d].reshape(k_d, n_loc, width).sum(axis=0)
    if kx > 0 and cap_pool > 0:
        gp = (
            g_by_flat[n_loc * k_d :]
            .reshape(kx, cap_pool, width)
            .sum(axis=0)
        )
        gp = jnp.concatenate([gp, jnp.zeros((1, width), g.dtype)], axis=0)
        g1 = g1 + gp[jnp.minimum(pool_pos, cap_pool)]
    return g1, None, None, None, None, None


_exchange_gather.defvjp(_exchange_gather_fwd, _exchange_gather_bwd)


def _exchange_parts(splats, cfg: RenderConfig, rows: int, n_shards: int,
                    exchange_budget_factor: float, row_stride: int = 1):
    """Send side of exchange mode: partition this chip's projected splats
    by destination tile-row owner.  Returns (rows (n_shards, budget, 12),
    valid (n_shards, budget), dropped () i32) — one all_to_all away from
    every chip holding exactly the splats touching its rows.  Factored out
    so scripts/scaling.py can time one shard's send-side compute
    standalone (collectives can't run single-device).

    row_stride == 1: chip d owns the contiguous band [d*rows, (d+1)*rows);
    row_stride == n_shards: chip d owns the interleaved rows {d + s*n} —
    the load-balanced assignment.  A splat goes to chip d iff its global
    tile-row span [y0, y1] contains a row ≡ d (mod n).

    TPU-native partition (one sort, not n_shards compactions — the old
    per-destination ``compact_by_mask`` loop cost n_shards · O(n_loc),
    which grew the per-chip send cost with the shard count and capped
    exchange-mode strong scaling):
      1. every splat gets ``k_d`` dense destination SLOTS (slot j =
         its j-th destination band; splats span 1-2 bands overwhelmingly);
         splats spanning more bands draw a full-width pool entry
         (n_shards - k_d extra slots) via one stable partition, exactly
         like ops/binning's tiered duplicate expansion;
      2. ONE stable sort by (dest, splat-id) orders all slots by
         destination (sentinel dests sort to the tail);
      3. searchsorted boundaries + a static (n_shards, budget) position
         grid turn the segments into the fixed-shape all_to_all operand
         with ONE row gather.
    The gather's VJP (see _exchange_gather) folds row gradients back with
    one sort — no scatter, so grads flow to the owning shard through the
    reverse all_to_all with O(n_loc) local work.
    """
    n_loc = splats.valid.shape[0]
    _, y0g, _, hh, cnt, _ = binning.tile_bbox(splats, cfg)
    live = cnt > 0
    frac = min(1.0, rows / cfg.tiles_y * exchange_budget_factor)
    budget = _round_budget(int(n_loc * frac), n_loc)
    sent = jnp.uint32(n_shards)

    if row_stride == 1:
        d0 = jnp.clip(y0g // rows, 0, n_shards - 1)
        d1 = jnp.clip((y0g + hh - 1) // rows, 0, n_shards - 1)
        nd = jnp.where(live, d1 - d0 + 1, 0)

        def dest_j(j):
            return d0 + j
    else:
        assert row_stride == n_shards
        nd = jnp.where(live, jnp.minimum(hh, n_shards), 0)
        y0m = jnp.mod(y0g, n_shards)

        def dest_j(j):
            d = y0m + j
            return jnp.where(d >= n_shards, d - n_shards, d)

    k_d = min(_EXCHANGE_DENSE_SLOTS, n_shards)
    kx = n_shards - k_d
    if kx > 0:
        # stable partition: splats spanning > k_d bands claim a pool entry
        need = nd > k_d
        sel = jnp.argsort(
            jnp.where(need, 0, 1).astype(jnp.int32), stable=True
        )
        _, pos = jax.lax.sort_key_val(
            sel, jnp.arange(n_loc, dtype=jnp.int32)
        )
        cap_pool = min(n_loc, max(n_loc // 8, 512))
        in_pool = need & (pos < cap_pool)
        dropped_pool = jnp.sum(need & ~in_pool)
        pool_ids = sel[:cap_pool]
        pool_pos = jnp.where(in_pool, pos, cap_pool)
    else:
        cap_pool = 0
        dropped_pool = jnp.int32(0)
        pool_ids = None
        pool_pos = jnp.zeros((n_loc,), jnp.int32)

    # slot-major keys: dense slot j covers dest_j for every splat; pool
    # slot j covers dest_{k_d + j} for pool entries only
    jj = jnp.arange(k_d, dtype=jnp.int32)[:, None]
    keys_dense = jnp.where(
        jj < nd[None, :], dest_j(jj).astype(jnp.uint32), sent
    )
    ids_dense = jnp.broadcast_to(
        jnp.arange(n_loc, dtype=jnp.int32)[None, :], (k_d, n_loc)
    )
    keys_parts = [keys_dense.reshape(-1)]
    id_parts = [ids_dense.reshape(-1)]
    if kx > 0 and cap_pool > 0:
        jj = jnp.arange(kx, dtype=jnp.int32)[:, None] + k_d
        nd_p = nd[pool_ids][None, :]
        y0_p = (y0g if row_stride != 1 else d0)[pool_ids][None, :]
        if row_stride == 1:
            dpj = y0_p + jj
        else:
            dpj = jnp.mod(y0_p, n_shards) + jj
            dpj = jnp.where(dpj >= n_shards, dpj - n_shards, dpj)
        keys_pool = jnp.where(jj < nd_p, dpj.astype(jnp.uint32), sent)
        ids_pool = jnp.broadcast_to(pool_ids[None, :], (kx, cap_pool))
        keys_parts.append(keys_pool.reshape(-1))
        id_parts.append(ids_pool.reshape(-1))
    keys = jnp.concatenate(keys_parts) if len(keys_parts) > 1 else keys_parts[0]
    src = jnp.concatenate(id_parts) if len(id_parts) > 1 else id_parts[0]
    cap = keys.shape[0]

    # (dest, splat-id) pairs are unique -> deterministic total order; per
    # destination, splats arrive in original-id order (matches the old
    # per-destination stable compaction)
    key_sorted, src_sorted, perm = jax.lax.sort(
        (keys, src, jnp.arange(cap, dtype=jnp.int32)), num_keys=2
    )
    starts = jnp.searchsorted(
        key_sorted, jnp.arange(n_shards + 1, dtype=jnp.uint32), side="left"
    ).astype(jnp.int32)
    seg_len = jnp.diff(starts)
    dropped = jnp.sum(jnp.maximum(seg_len - budget, 0)) + dropped_pool

    jgrid = jnp.arange(budget, dtype=jnp.int32)[None, :]
    posmat = starts[:-1, None] + jgrid  # (n_shards, budget)
    valid_take = jgrid < seg_len[:, None]
    ids_take = src_sorted[jnp.minimum(posmat, cap - 1)]

    pack12 = pack_splats(splats)[0][:, :12]  # drop spare cols on the wire
    rows12 = _exchange_gather(
        (k_d, n_loc, kx, cap_pool, budget, n_shards),
        pack12, ids_take, perm, key_sorted, starts, pool_pos,
    )
    # a row is live on the receiver iff it was a real segment entry AND
    # the source splat was valid (pack zeroes invalid opacity; the valid
    # bit rides separately)
    valid = valid_take & splats.valid[ids_take]
    return rows12, valid, dropped


def _splats_from_received(rows_rx, valid_rx):
    """Receive side of exchange mode: packed 12-col rows -> ProjectedSplats."""
    rows_rx = jnp.concatenate(
        [rows_rx, jnp.zeros(rows_rx.shape[:1] + (4,), rows_rx.dtype)],
        axis=1,
    )
    return unpack_splats(rows_rx, valid_rx)


def band_precull_mask(scene, view, proj, cfg: RenderConfig, ty_lo, ty_hi,
                      row_stride: int = 1):
    """CHEAP conservative test: can this splat's footprint touch the tile
    rows {ty_lo + s * row_stride} ∩ [ty_lo, ty_hi)?

    Runs BEFORE full projection so a shard can compact the raw scene and
    pay projection/SH/covariance only on its band's candidates — the
    per-chip O(N) floor that capped replicated-mode strong scaling at
    ~0.4 by 8 shards (VERDICT r4).  Costs one fused elementwise pass:
    view transform + a radius UPPER BOUND from the largest scale axis.

    Conservative by construction (never drops a splat the exact path
    keeps): the y radius is bounded via |T_row| * s_max >= sqrt(cov_yy)
    (operator-norm bound on the EWA Jacobian row, gau_vert.glsl:95-120),
    the NDC cull uses the exact reference limit plus an fp margin, and
    both are inflated 1%.  Splats it keeps that the exact path culls are
    merely re-culled later, so sharded output stays bit-exact.
    """
    f32 = jnp.float32
    xyz = scene.xyz.astype(f32)
    view = jnp.asarray(view, f32)
    proj = jnp.asarray(proj, f32)
    mean_view = xyz @ view[:3, :3].T + view[:3, 3]
    n = xyz.shape[0]
    clip = jnp.concatenate(
        [mean_view, jnp.ones((n, 1), f32)], axis=-1
    ) @ proj.T
    w = clip[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    ndc = clip[..., :3] / w_safe[..., None]
    # exact global culls with an fp margin (project() recomputes exactly)
    lim = cfg.ndc_cull_limit * 1.001 + 1e-5
    maybe_visible = jnp.all(jnp.abs(ndc) <= lim, axis=-1) & (w > 0.0)
    maybe_visible &= scene.opacity[..., 0] > 0.0

    # y-radius upper bound: 3*sqrt(|t1|^2 s_max^2 + 0.3) with
    # |t1| <= (focal/|tz|) * (1 + 1.3 tanfovy)  (J row norm x unit view
    # rows; the 1.3 factor is the fov clamp's worst case)
    mode = int(cfg.mode)
    from gaussiansplattingviewer_tpu.config import RenderMode

    scale_mult = cfg.scale_modifier * (
        cfg.depth_scale_inflate if mode == RenderMode.DEPTH else 1.0
    )
    s_max = jnp.max(scene.scale.astype(f32), axis=-1) * scale_mult
    htany = 1.0 / proj[1, 1]
    focal = cfg.height / (2.0 * htany)
    tz = jnp.maximum(jnp.abs(mean_view[..., 2]), 1e-8)
    t1 = focal / tz * (1.0 + 1.3 * htany)
    ry = 3.0 * jnp.sqrt((t1 * s_max) ** 2 + 0.3) * 1.01 + 0.5

    py = (1.0 - ndc[..., 1]) * 0.5 * cfg.height
    ts = float(cfg.tile_size)
    y0 = jnp.floor((py - ry) / ts).astype(jnp.int32)
    y1 = jnp.floor((py + ry) / ts).astype(jnp.int32)
    ty_lo = jnp.asarray(ty_lo, jnp.int32)
    ty_hi = jnp.asarray(ty_hi, jnp.int32)
    if row_stride == 1:
        in_band = (y1 >= ty_lo) & (y0 <= ty_hi - 1)
    else:
        lo = jnp.maximum(y0 - ty_lo, 0)
        hi = jnp.minimum(y1, ty_hi - 1) - ty_lo
        s0 = (lo + (row_stride - 1)) // row_stride
        s1 = jnp.where(hi >= 0, hi // row_stride, -1)
        in_band = (y1 >= 0) & (s1 >= s0)
    return maybe_visible & in_band


def _render_band(scene, view, proj, cam_pos, cfg: RenderConfig, rows: int,
                 use_pallas: bool, shard_splats: bool = False,
                 row_stride: int = 1, band_budget_factor: float | None = 2.5,
                 gather_budget_factor: float | None = None,
                 exchange: bool = False, n_shards: int = 1,
                 exchange_budget_factor: float = 3.0,
                 precull_budget_factor: float | None = None,
                 idx=None, axis=TILE_AXIS):
    """Per-device body: render this device's set of tile rows — the
    contiguous band {idx*rows + s} (row_stride == 1) or the INTERLEAVED
    set {idx + s * n_shards} (row_stride == n_shards), which de-skews load
    when scene density is top/bottom-heavy.

    shard_splats=True: ``scene`` arrives sharded over splats; each chip
    projects+culls its N/ndev shard and the compact screen-space splats
    (~1/4 the bytes of raw parameters) are all-gathered over ICI — the
    "frustum-culled splat lists sharded across chips" scheme (SURVEY.md
    §2.4 growth path).  Under grad, the all-gather transposes to a
    reduce-scatter, so parameter gradients come back splat-sharded too.

    exchange=True (requires shard_splats, contiguous bands): instead of
    all-gathering the full projected array, each chip PARTITIONS its local
    frustum survivors by destination tile-row band and an ``all_to_all``
    delivers to every chip exactly the splats touching ITS band.  Both the
    collective bytes AND the downstream binning input are then
    ~N * factor / n_shards per chip — the strong-scaling regime the
    replicated design can't reach (its per-chip O(N) projection/binning
    floor caps 8-chip efficiency, SCALING.json).  Under grad the
    all_to_all transposes to the reverse all_to_all, so parameter
    gradients come back to the owning shard with no extra collective.

    ``idx`` defaults to the mesh axis index (the shard_map path); the
    scaling harness (scripts/scaling.py) passes a concrete shard index to
    run ONE shard's exact program on a single device and time its work.

    Returns the device's image rows (rows*tile_size, padded_width, 3), in
    local order (de-interleaving is the caller's job when row_stride > 1).
    """
    if idx is None:
        idx = jax.lax.axis_index(axis)
    row0 = jnp.asarray(
        idx * (rows if row_stride == 1 else 1), jnp.int32
    )

    if (
        precull_budget_factor is not None
        and rows < cfg.tiles_y
        and not shard_splats
    ):
        # cheap conservative band pre-cull BEFORE projection: the full
        # EWA/SH projection (the largest replicated O(N) term) then runs
        # only on this band's candidates.  Conservative keep-set +
        # order-preserving compaction => sharded output stays bit-exact
        # (tests/test_sharding.py).  Band compaction below is subsumed.
        ty_hi = (
            row0 + rows
            if row_stride == 1
            else row0 + (rows - 1) * row_stride + 1
        )
        mask = band_precull_mask(
            scene, view, proj, cfg, row0, ty_hi, row_stride
        )
        n_all = mask.shape[0]
        frac = min(1.0, rows / cfg.tiles_y * precull_budget_factor)
        budget = _round_budget(int(n_all * frac), n_all)
        # ONE wide row gather instead of five per-leaf gathers: row-gather
        # cost is per CALL (~7 ns/row regardless of width), so per-leaf
        # compaction made pre-cull a net loss on hardware at 8 shards.
        # Assemble the (N, 11+sh) view via transposes (measured ~free on
        # TPU) + a major-axis concat, never a minor-dim stack.
        sh_dim = scene.sh.shape[1]
        wide = jnp.concatenate(
            [scene.xyz.T, scene.rot.T, scene.scale.T,
             scene.opacity.reshape(1, -1) if scene.opacity.ndim == 1
             else scene.opacity.T,
             scene.sh.T],
            axis=0,
        ).T  # (N, 11 + sh_dim)
        (wide_c,), kept, _ = compact_by_mask((wide,), mask, budget)
        op_c = jnp.where(kept[:, None], wide_c[:, 10:11], 0.0)
        scene = dataclasses.replace(
            scene,
            xyz=wide_c[:, 0:3],
            rot=wide_c[:, 3:7],
            scale=wide_c[:, 7:10],
            # tail rows beyond the kept count are masked via opacity
            # (project treats opacity 0 as padding)
            opacity=op_c,
            sh=wide_c[:, 11 : 11 + sh_dim],
        )
        band_budget_factor = None

    splats = project(scene, view, proj, cam_pos, cfg)
    if shard_splats and exchange:
        rows12, valid12, _ = _exchange_parts(
            splats, cfg, rows, n_shards, exchange_budget_factor, row_stride
        )

        def a2a(a):
            # (n_shards, budget, ...) -> same shape with axis-0 slice s now
            # holding what chip s sent to THIS chip; flatten to a single
            # received buffer of n_shards * budget candidate splats
            out = jax.lax.all_to_all(
                a, axis, split_axis=0, concat_axis=0, tiled=True
            )
            return out.reshape((-1,) + out.shape[2:])

        splats = _splats_from_received(a2a(rows12), a2a(valid12))
    elif shard_splats:
        if gather_budget_factor is not None:
            # frustum-survivor compaction BEFORE the collective: the
            # all-gather moves ~survivor bytes instead of raw-N bytes
            # (BASELINE north star "frustum-culled splat lists sharded
            # across chips").  Survivors beyond the budget drop (rare;
            # size the factor for the workload's visible fraction).
            n_loc = splats.valid.shape[0]
            budget = _round_budget(
                int(n_loc * gather_budget_factor), n_loc
            )
            splats, kept, _ = compact_splats(splats, splats.valid, budget)
            splats = dataclasses.replace(
                splats, valid=splats.valid & kept
            )
        splats = jax.tree.map(
            lambda a: jax.lax.all_gather(a, axis, axis=0, tiled=True),
            splats,
        )
    if (
        band_budget_factor is not None
        and rows < cfg.tiles_y
        and not exchange
    ):
        # band compaction: keep only splats whose footprint intersects
        # THIS chip's tile rows, so binning's per-splat slot allocation
        # (the O(N) term every chip used to pay in full) scales with the
        # shard's share of the image.  The budget is this shard's
        # proportional share times the safety factor; overfull bands drop
        # trailing splats (use interleaved assignment to keep per-shard
        # density near-uniform).
        n_all = splats.valid.shape[0]
        ty_hi = (
            row0 + rows
            if row_stride == 1
            else row0 + (rows - 1) * row_stride + 1
        )
        _, _, _, _, cnt, _ = binning.tile_bbox(
            splats, cfg, ty_lo=row0, ty_hi=ty_hi, row_stride=row_stride
        )
        frac = min(1.0, rows / cfg.tiles_y * band_budget_factor)
        budget = _round_budget(int(n_all * frac), n_all)
        splats, kept, _ = compact_splats(splats, cnt > 0, budget)
        splats = dataclasses.replace(splats, valid=splats.valid & kept)
    binned = binning.bin_splats(
        splats, cfg, row_offset=row0, local_rows=rows, row_stride=row_stride
    )
    rgb_tiles, trans_tiles = blend_tiles(
        cfg,
        use_pallas,
        rows,
        row_stride,
        binned.table,
        binned.tile_starts,
        binned.tile_counts,
        row0,
    )
    ts = cfg.tile_size
    tx_n = cfg.tiles_x
    img = rgb_tiles.reshape(rows, tx_n, ts, ts, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(rows * ts, tx_n * ts, 3)
    trans = trans_tiles.reshape(rows, tx_n, ts, ts)
    trans = trans.transpose(0, 2, 1, 3).reshape(rows * ts, tx_n * ts)
    img = img + cfg.background * trans[..., None]
    return img


def make_sharded_render_fn(mesh, cfg: RenderConfig, use_pallas: bool | None = None,
                           shard_splats: bool = False,
                           interleaved: bool = False,
                           band_budget_factor: float | None = 2.5,
                           gather_budget_factor: float | None = None,
                           exchange: bool = False,
                           exchange_budget_factor: float = 3.0,
                           precull_budget_factor: float | None = None):
    """Build a jit'd sharded render: (scene, view, proj, cam_pos) -> (H, W, 3).

    Camera inputs are replicated; the image is computed with its tile rows
    sharded over the mesh — contiguous bands by default, or round-robin
    rows with interleaved=True (better load balance on scenes whose splat
    density varies by image row: sky rows vs ground rows).  The scene is
    replicated by default; with shard_splats=True it must arrive sharded
    over splats (see shard_scene_splats) and projection/culling are split
    across chips with an ICI all-gather of the compact screen-space
    splats — or, with exchange=True as well, an all_to_all that delivers
    each chip ONLY the splats touching its band (per-chip work AND
    collective bytes ~1/n_shards; the strong-scaling mode).
    Differentiable: reverse-mode inserts the psum (replicated),
    reduce-scatter (all-gather splat sharding), or reverse all_to_all
    (exchange) gradient collective.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if exchange and not shard_splats:
        raise ValueError("exchange=True requires shard_splats=True")
    axes = tile_axes(mesh)  # 1-D "tiles" or the ("hosts", "chips") product
    n_shards = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    rows = _rows_per_shard(cfg, n_shards)
    stride = n_shards if interleaved else 1

    body = functools.partial(
        _render_band, cfg=cfg, rows=rows, use_pallas=use_pallas,
        shard_splats=shard_splats, row_stride=stride,
        band_budget_factor=band_budget_factor,
        gather_budget_factor=gather_budget_factor,
        exchange=exchange, n_shards=n_shards,
        exchange_budget_factor=exchange_budget_factor,
        precull_budget_factor=precull_budget_factor, axis=axes,
    )

    scene_spec = P(axes) if shard_splats else P()
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(scene_spec, P(), P(), P()),
        out_specs=P(axes, None, None),  # device-major image rows
        check_vma=False,
    )

    ts = cfg.tile_size

    @jax.jit
    def render_fn(scene, view, proj, cam_pos):
        img = sharded(scene, view, proj, cam_pos)
        if interleaved:
            # device-major (n, rows, ts, W, C) -> global row-major: global
            # tile row of (device d, local row s) is d + s * n_shards
            w = img.shape[1]
            img = img.reshape(n_shards, rows, ts, w, 3)
            img = img.transpose(1, 0, 2, 3, 4).reshape(
                n_shards * rows * ts, w, 3
            )
        return img[: cfg.height, : cfg.width]

    return render_fn


def render_sharded(scene: GaussianData, view, proj, cam_pos, cfg: RenderConfig,
                   mesh, use_pallas: bool | None = None):
    """One-shot sharded render (compiles per cfg/mesh — prefer
    make_sharded_render_fn for loops)."""
    fn = make_sharded_render_fn(mesh, cfg, use_pallas)
    return fn(
        scene,
        jnp.asarray(view, jnp.float32),
        jnp.asarray(proj, jnp.float32),
        jnp.asarray(cam_pos, jnp.float32),
    )


def shard_scene_splats(scene, mesh):
    """Place the scene sharded over splats (axis 0) on the mesh (any axis
    layout; splats shard over the product); pads to a mesh-size multiple
    first."""
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    n = len(scene.xyz)
    scene = scene.pad_to(-(-n // n_dev) * n_dev) if n % n_dev else scene
    sharding = NamedSharding(mesh, P(tile_axes(mesh)))
    return jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sharding), scene)


def make_sharded_train_step(mesh, cfg: RenderConfig, optimizer=None,
                            use_pallas: bool | None = None,
                            shard_splats: bool = False,
                            interleaved: bool = False,
                            band_budget_factor: float | None = 2.5,
                            gather_budget_factor: float | None = None,
                            exchange: bool = False,
                            exchange_budget_factor: float = 3.0,
                            precull_budget_factor: float | None = None):
    """Full multi-chip training step: L2 loss against a target image,
    gradient all-reduce over the mesh, optax update.

    Returns step(scene, opt_state, view, proj, cam_pos, target) ->
    (scene, opt_state, loss).  This is the flagship train path the driver's
    dryrun_multichip exercises.
    """
    import optax

    if optimizer is None:
        optimizer = optax.adam(1e-3)
    render_fn_inner = make_sharded_render_fn(
        mesh, cfg, use_pallas, shard_splats=shard_splats,
        interleaved=interleaved, band_budget_factor=band_budget_factor,
        gather_budget_factor=gather_budget_factor,
        exchange=exchange, exchange_budget_factor=exchange_budget_factor,
        precull_budget_factor=precull_budget_factor,
    )

    def loss_fn(scene, view, proj, cam_pos, target):
        img = render_fn_inner(scene, view, proj, cam_pos)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(scene, opt_state, view, proj, cam_pos, target):
        loss, grads = jax.value_and_grad(loss_fn)(
            scene, view, proj, cam_pos, target
        )
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        scene = optax.apply_updates(scene, updates)
        return scene, opt_state, loss

    return step
