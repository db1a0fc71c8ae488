"""Tile binning: duplicate splats into (tile, depth)-ordered contiguous lists.

This subsystem replaces two native pieces of the reference at once:
  * the global CUDA argsort backends (renderer_ogl.py:22-53), and
  * the duplicate-per-tile + radix-sort stage inside the
    diff-gaussian-rasterization C++/CUDA library (SURVEY.md §3.4).

TPU/XLA design constraints shape the algorithm (SURVEY.md §7 "hard parts"):
shapes must be static, so the duplicated key buffer has a fixed capacity
``D = dup_factor * N`` and each splat is capped at ``max_tiles_per_gaussian``
duplicates.  The pipeline:

  1. depth-argsort all N splats (nearest first) and reorder their attributes
     — ONE O(N log N) device sort;
  2. compute each splat's tile-bbox span and duplicate-count; exclusive
     cumsum gives each splat a contiguous span in the duplicate buffer;
  3. K scatter passes (K = max_tiles_per_gaussian, static) write
     (tile_id, row_id) pairs.  Because splats were pre-sorted by depth and
     offsets are monotone, entries of any given tile appear in the buffer in
     DEPTH order already;
  4. one STABLE argsort by tile_id compacts per-tile lists contiguously
     while preserving that depth order — this replaces the 64-bit
     (tileID<<32|depth) radix sort of the CUDA reference with a cheaper
     int32 key sort;
  5. tile ranges via searchsorted; splat attributes gathered into a padded
     (D, 16) row table the blend kernels stream.

Everything is pure jnp -> runs under jit, shard_map, and on CPU for tests.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from gaussiansplattingviewer_tpu.config import RenderConfig
from gaussiansplattingviewer_tpu.ops.projection import ProjectedSplats

# Row layout of the packed splat table (lane-padded to 16 floats):
# [cx, cy, conic_a, conic_b, conic_c, r, g, b, opacity, rx, ry, depth, 0...]
TABLE_WIDTH = 16
COL_CX, COL_CY = 0, 1
COL_A, COL_B, COL_C = 2, 3, 4
COL_R, COL_G, COL_BCH = 5, 6, 7
COL_OPACITY = 8
COL_RX, COL_RY = 9, 10
COL_DEPTH = 11


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BinnedSplats:
    """Contiguous, depth-ordered per-tile splat lists.

    table: (D + pad, TABLE_WIDTH) f32 — splat rows in sorted buffer order;
      the trailing ``chunk_pad`` zero rows let blend kernels read fixed-size
      chunks without bounds clamping.
    tile_starts: (num_tiles + 1,) i32 — tile t owns rows
      [tile_starts[t], tile_starts[t+1]).
    num_duplicates: () i32 — total live entries (diagnostics).
    overflow: () i32 — splats whose tile span was clamped by the static
      ``max_tiles_per_gaussian`` cap (diagnostics; 0 in normal operation).
    """

    table: jax.Array
    tile_starts: jax.Array
    num_duplicates: jax.Array
    overflow: jax.Array


def tile_bbox(splats: ProjectedSplats, cfg: RenderConfig):
    """Per-splat tile-index bbox (x0, y0, w, h) clamped to the grid and to
    the static duplicate cap.  Returns (x0, y0, w, h, count, overflowed)."""
    ts = float(cfg.tile_size)
    tx_n, ty_n = cfg.tiles_x, cfg.tiles_y
    cx, cy = splats.mean2d[:, 0], splats.mean2d[:, 1]
    rx, ry = splats.radius[:, 0], splats.radius[:, 1]

    x0 = jnp.floor((cx - rx) / ts).astype(jnp.int32)
    x1 = jnp.floor((cx + rx) / ts).astype(jnp.int32)
    y0 = jnp.floor((cy - ry) / ts).astype(jnp.int32)
    y1 = jnp.floor((cy + ry) / ts).astype(jnp.int32)

    # drop splats entirely outside the image
    onscreen = (x1 >= 0) & (x0 < tx_n) & (y1 >= 0) & (y0 < ty_n)
    x0 = jnp.clip(x0, 0, tx_n - 1)
    x1 = jnp.clip(x1, 0, tx_n - 1)
    y0 = jnp.clip(y0, 0, ty_n - 1)
    y1 = jnp.clip(y1, 0, ty_n - 1)

    w = x1 - x0 + 1
    h = y1 - y0 + 1
    # static cap: shrink the span symmetrically around the center tile
    kmax = cfg.max_tiles_per_gaussian
    overflowed = (w * h) > kmax
    # greedy clamp: bound each axis at kmax, then bound h by kmax // w
    w_c = jnp.minimum(w, kmax)
    h_c = jnp.minimum(h, jnp.maximum(kmax // jnp.maximum(w_c, 1), 1))
    # recenter the clamped window on the splat's own tile
    ctx = jnp.clip((cx / ts).astype(jnp.int32), 0, tx_n - 1)
    cty = jnp.clip((cy / ts).astype(jnp.int32), 0, ty_n - 1)
    x0 = jnp.where(
        overflowed,
        jnp.clip(ctx - w_c // 2, 0, tx_n - w_c),
        x0,
    )
    y0 = jnp.where(
        overflowed,
        jnp.clip(cty - h_c // 2, 0, ty_n - h_c),
        y0,
    )
    w = jnp.where(overflowed, w_c, w)
    h = jnp.where(overflowed, h_c, h)

    live = splats.valid & onscreen
    count = jnp.where(live, w * h, 0)
    return x0, y0, w, h, count, overflowed & live


def pack_table(splats: ProjectedSplats) -> jax.Array:
    """Pack per-splat render attributes into (N, TABLE_WIDTH) f32 rows."""
    n = splats.depth.shape[0]
    cols = jnp.zeros((n, TABLE_WIDTH), jnp.float32)
    cols = cols.at[:, COL_CX].set(splats.mean2d[:, 0])
    cols = cols.at[:, COL_CY].set(splats.mean2d[:, 1])
    cols = cols.at[:, COL_A].set(splats.conic[:, 0])
    cols = cols.at[:, COL_B].set(splats.conic[:, 1])
    cols = cols.at[:, COL_C].set(splats.conic[:, 2])
    cols = cols.at[:, COL_R].set(splats.color[:, 0])
    cols = cols.at[:, COL_G].set(splats.color[:, 1])
    cols = cols.at[:, COL_BCH].set(splats.color[:, 2])
    cols = cols.at[:, COL_OPACITY].set(
        jnp.where(splats.valid, splats.opacity, 0.0)
    )
    cols = cols.at[:, COL_RX].set(splats.radius[:, 0])
    cols = cols.at[:, COL_RY].set(splats.radius[:, 1])
    cols = cols.at[:, COL_DEPTH].set(splats.depth)
    return cols


@functools.partial(jax.jit, static_argnames=("cfg", "chunk_pad"))
def bin_splats(
    splats: ProjectedSplats, cfg: RenderConfig, chunk_pad: int = 64
) -> BinnedSplats:
    """Build depth-ordered per-tile lists (see module docstring)."""
    n = splats.depth.shape[0]
    cap = cfg.dup_factor * n
    num_tiles = cfg.num_tiles
    sentinel = jnp.int32(num_tiles)

    # ---- 1. depth sort (nearest first; invalid splats to the end).
    # Replaces the reference's per-frame CUDA argsort round trip
    # (renderer_ogl.py:41-53) with a resident device sort.
    depth_key = jnp.where(splats.valid, splats.depth, jnp.inf)
    order = jnp.argsort(depth_key)
    sorted_splats = jax.tree.map(lambda a: a[order], splats)

    # ---- 2. spans and offsets
    x0, y0, w, h, count, overflowed = tile_bbox(sorted_splats, cfg)
    offsets = jnp.cumsum(count) - count  # exclusive
    total = jnp.minimum(offsets[-1] + count[-1], cap)

    # ---- 3. K scatter passes building (tile_id, row_id)
    kmax = cfg.max_tiles_per_gaussian
    row_ids_src = jnp.arange(n, dtype=jnp.int32)

    def scatter_k(k, carry):
        tile_buf, row_buf = carry
        alive = k < count
        kx = jnp.where(w > 0, k % jnp.maximum(w, 1), 0)
        ky = jnp.where(w > 0, k // jnp.maximum(w, 1), 0)
        tile = (y0 + ky) * cfg.tiles_x + (x0 + kx)
        idx = jnp.where(alive, offsets + k, cap)  # cap -> dropped
        idx = jnp.minimum(idx, cap)  # budget overflow -> dropped
        tile_buf = tile_buf.at[idx].set(
            tile.astype(jnp.int32), mode="drop"
        )
        row_buf = row_buf.at[idx].set(row_ids_src, mode="drop")
        return tile_buf, row_buf

    tile_buf = jnp.full((cap,), sentinel, jnp.int32)
    row_buf = jnp.zeros((cap,), jnp.int32)
    tile_buf, row_buf = jax.lax.fori_loop(
        0, kmax, scatter_k, (tile_buf, row_buf)
    )

    # ---- 4. stable compaction sort by tile (preserves depth order)
    perm = jnp.argsort(tile_buf, stable=True)
    tile_sorted = tile_buf[perm]
    row_sorted = row_buf[perm]

    # ---- 5. ranges + gathered attribute table
    tile_starts = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    table_src = pack_table(sorted_splats)
    table = table_src[row_sorted]
    # zero out dead rows (sentinel region) so blend kernels see opacity 0,
    # then pad so chunked reads never run off the end
    dead = (tile_sorted >= sentinel)[:, None]
    table = jnp.where(dead, 0.0, table)
    table = jnp.concatenate(
        [table, jnp.zeros((chunk_pad, TABLE_WIDTH), jnp.float32)], axis=0
    )

    return BinnedSplats(
        table=table,
        tile_starts=tile_starts,
        num_duplicates=total.astype(jnp.int32),
        overflow=jnp.sum(overflowed).astype(jnp.int32),
    )
