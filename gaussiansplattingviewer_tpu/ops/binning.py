"""Tile binning: duplicate splats into (tile, depth)-ordered contiguous lists.

This subsystem replaces two native pieces of the reference at once:
  * the global CUDA argsort backends (renderer_ogl.py:22-53), and
  * the duplicate-per-tile + radix-sort stage inside the
    diff-gaussian-rasterization C++/CUDA library (SURVEY.md §3.4).

TPU/XLA design constraints shape the algorithm (SURVEY.md §7 "hard parts"):
shapes must be static, so the duplicated key buffer has a fixed capacity
``D = dup_factor * N`` and each splat is capped at ``max_tiles_per_gaussian``
duplicates.  The pipeline:

  1. compute each splat's clamped tile-bbox span on the original order;
  2. DENSE duplicate expansion: a (N, dup_factor) matrix holds the tile id
     of each splat's k-th covered tile (sentinel when unused) — no scatter
     is ever issued (TPU scatters are pathologically slow; an earlier
     64-pass scatter formulation dominated the frame);
  3. ONE stable two-key (tile, depth) sort orders every tile's list
     front-to-back in a single pass — subsuming both the reference's
     per-frame global depth argsort (renderer_ogl.py:41-53) and the CUDA
     library's 64-bit tileID<<32|depth radix sort, with deterministic
     tie-breaking by splat index;
  4. tile ranges via searchsorted and ONE budgeted row gather materializes
     the compact (D, 16) table the blend kernels stream (kernels read
     lane-aligned windows and mask segment overhang, so no padding or
     re-placement pass exists).  The gathers carry custom inverse-
     permutation VJPs so the backward never scatters either.

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


# Chunk granularity of the Pallas blend kernels (128 f32 = one TPU lane
# tile).  Segments are stored compactly; kernels read aligned windows of
# this size around each segment and mask the overhang.
SEGMENT_ALIGN = 128


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BinnedSplats:
    """Contiguous, depth-ordered per-tile splat lists.

    table: (N*dup_factor + SEGMENT_ALIGN, TABLE_WIDTH) f32 — splat rows in
      (tile, depth) order, stored COMPACTLY: tile t's rows are
      [tile_starts[t], tile_starts[t+1]); sentinel entries sit past
      tile_starts[-1] and a SEGMENT_ALIGN tail pad keeps aligned kernel
      windows in bounds.
    tile_starts: (num_tiles + 1,) i32 — segment boundaries.
    tile_counts: (num_tiles,) i32 — rows per tile (= diff(tile_starts)).
    num_duplicates: () i32 — total live entries (diagnostics).
    overflow: () i32 — splats whose tile span was clamped by the static
      ``max_tiles_per_gaussian`` cap (diagnostics; 0 in normal operation).
    truncated: () i32 — duplicate entries dropped by the table budget
      (cfg.table_budget_factor; 0 in normal operation).
    """

    table: jax.Array
    tile_starts: jax.Array
    tile_counts: jax.Array
    num_duplicates: jax.Array
    overflow: jax.Array
    truncated: jax.Array


def tile_bbox(splats: ProjectedSplats, cfg: RenderConfig, ty_lo=0, ty_hi=None):
    """Per-splat tile-index bbox clamped to the grid, to the tile-row window
    [ty_lo, ty_hi) (used by the multi-chip row sharding; defaults to the
    full grid), and to the static duplicate cap.

    Returns (x0, y0_local, w, h, count, overflowed) where y0_local is
    relative to ty_lo.
    """
    ts = float(cfg.tile_size)
    tx_n, ty_n = cfg.tiles_x, cfg.tiles_y
    if ty_hi is None:
        ty_hi = ty_n
    ty_lo = jnp.asarray(ty_lo, jnp.int32)
    ty_hi = jnp.asarray(ty_hi, jnp.int32)
    cx, cy = splats.mean2d[:, 0], splats.mean2d[:, 1]
    rx, ry = splats.radius[:, 0], splats.radius[:, 1]

    x0 = jnp.floor((cx - rx) / ts).astype(jnp.int32)
    x1 = jnp.floor((cx + rx) / ts).astype(jnp.int32)
    y0 = jnp.floor((cy - ry) / ts).astype(jnp.int32)
    y1 = jnp.floor((cy + ry) / ts).astype(jnp.int32)

    # clip to the GLOBAL grid first (never to the band): the overflow clamp
    # below must be band-invariant so that multi-chip row sharding covers
    # exactly the same tiles as a single chip
    onscreen = (x1 >= 0) & (x0 < tx_n) & (y1 >= 0) & (y0 < ty_n)
    x0 = jnp.clip(x0, 0, tx_n - 1)
    x1 = jnp.clip(x1, 0, tx_n - 1)
    y0 = jnp.clip(y0, 0, ty_n - 1)
    y1 = jnp.clip(y1, 0, ty_n - 1)

    w = x1 - x0 + 1
    h = y1 - y0 + 1
    # static cap: shrink the span symmetrically around the center tile.
    # The dense duplicate expansion stores exactly dup_factor slots per
    # splat, so that is the hard per-splat tile budget.
    kmax = min(cfg.max_tiles_per_gaussian, cfg.dup_factor)
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
    y1 = jnp.where(overflowed, y0 + h_c - 1, y1)

    # now intersect the (possibly clamped) window with the band
    y0b = jnp.maximum(y0, ty_lo)
    y1b = jnp.minimum(y1, ty_hi - 1)
    h = y1b - y0b + 1
    in_band = h > 0

    live = splats.valid & onscreen & in_band
    count = jnp.where(live, w * h, 0)
    return x0, y0b - ty_lo, w, jnp.maximum(h, 0), count, overflowed & live


# ---------------------------------------------------------------------------
# Permutation gathers with hand-written transposes.
#
# JAX's autodiff transposes a gather into a scatter-add; TPU scatters are
# catastrophically slow at these sizes (a 16M-row scatter-add dominated the
# backward).  Both gathers in this module are (multi-)permutations, so their
# exact VJPs are expressible as gathers through the inverse permutation —
# which costs one extra key-value sort in the forward (and is DCE'd away in
# inference graphs, where the cotangent path is never built).
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _permute_rows(x, order, inv_order):
    """x[order] for a permutation ``order``; VJP gathers via ``inv_order``."""
    return x[order]


def _permute_rows_fwd(x, order, inv_order):
    return x[order], (inv_order,)


def _permute_rows_bwd(res, g):
    (inv_order,) = res
    return g[inv_order], None, None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_table_rows(k_per, pack, perm_trunc, inv_perm):
    """pack[perm_trunc // k_per] — each pack row is replicated into its live
    duplicate slots; ``perm_trunc`` may be a truncated prefix of the sorted
    order (table budget).  The VJP inverts the sort with the FULL
    ``inv_perm`` and reduces the k_per contiguous slots per splat (gather +
    reshape-sum, no scatter); slots sorted past the truncation get zero."""
    return pack[perm_trunc // k_per]


def _gather_table_rows_fwd(k_per, pack, perm_trunc, inv_perm):
    return pack[perm_trunc // k_per], (pack.shape[0], inv_perm)


def _gather_table_rows_bwd(k_per, res, g):
    n, inv_perm = res
    cap_mat = g.shape[0]
    g_ext = jnp.concatenate(
        [g, jnp.zeros((1, g.shape[-1]), g.dtype)], axis=0
    )
    idx = jnp.minimum(inv_perm, cap_mat)  # truncated slots -> zero row
    g_by_flat = g_ext[idx]  # back to (splat-major, k) flat order
    g_pack = g_by_flat.reshape(n, k_per, g.shape[-1]).sum(axis=1)
    return g_pack, None, None


_gather_table_rows.defvjp(_gather_table_rows_fwd, _gather_table_rows_bwd)


def _invert_permutation(perm: jax.Array) -> jax.Array:
    """Inverse permutation via one key-value sort (no scatter)."""
    n = perm.shape[0]
    _, inv = jax.lax.sort_key_val(perm, jnp.arange(n, dtype=jnp.int32))
    return inv


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


@functools.partial(jax.jit, static_argnames=("cfg", "local_rows"))
def bin_splats(
    splats: ProjectedSplats,
    cfg: RenderConfig,
    row_offset=0,
    local_rows: int | None = None,
) -> BinnedSplats:
    """Build depth-ordered per-tile lists (see module docstring).

    row_offset / local_rows select a horizontal band of ``local_rows`` tile
    rows starting at tile row ``row_offset`` — the unit of multi-chip image
    sharding (parallel/).  Defaults cover the whole image.  ``local_rows``
    is static (shapes depend on it); ``row_offset`` may be traced
    (e.g. lax.axis_index inside shard_map).
    """
    n = splats.depth.shape[0]
    cap = cfg.dup_factor * n
    if local_rows is None:
        local_rows = cfg.tiles_y
    num_tiles = local_rows * cfg.tiles_x
    sentinel = jnp.int32(num_tiles)

    # ---- 1+2. spans and dense duplicate expansion on the ORIGINAL splat
    # order (scatter-free: TPU scatters are the single slowest XLA op; the
    # dense (N, K) tile matrix + one sort replaced a 64-pass scatter loop
    # that dominated the frame).  Duplicate k of splat i covers the k-th
    # tile of its clamped span.
    row_offset = jnp.asarray(row_offset, jnp.int32)
    x0, y0, w, h, count, overflowed = tile_bbox(
        splats, cfg, ty_lo=row_offset, ty_hi=row_offset + local_rows
    )
    k_per = cfg.dup_factor
    k_idx = jnp.arange(k_per, dtype=jnp.int32)[None, :]  # (1, K)
    w_safe = jnp.maximum(w, 1)[:, None]
    kx = k_idx % w_safe
    ky = k_idx // w_safe
    alive = k_idx < count[:, None]  # (N, K)
    tile_nk = (y0[:, None] + ky) * cfg.tiles_x + (x0[:, None] + kx)
    flat_tiles = jnp.where(alive, tile_nk, sentinel).reshape(-1)  # (N*K,)
    depth_flat = jnp.broadcast_to(
        splats.depth.astype(jnp.float32)[:, None], (n, k_per)
    ).reshape(-1)

    # ---- 3+4. ONE stable two-key sort by (tile, depth) replaces the
    # reference's 64-bit tileID<<32|depth radix sort AND its separate
    # global depth argsort (renderer_ogl.py:41-53): front-to-back order
    # per tile falls out directly, ties broken deterministically by the
    # original splat index (stability).
    tile_sorted, _, perm = jax.lax.sort(
        (flat_tiles, depth_flat, jnp.arange(cap, dtype=jnp.int32)),
        num_keys=2,
        is_stable=True,
    )

    starts = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = jnp.diff(starts)  # (T,)
    total = starts[num_tiles]

    # ---- 5. the compact table: ONE row gather in sorted order.  Tile t's
    # rows are [starts[t], starts[t+1]); segments are NOT padded — the
    # blend kernels read lane-ALIGNED 128-row windows around each segment
    # and mask the out-of-range rows, so no gather-based re-placement (and
    # no zero rows) is needed.  Sentinel entries sort to the tail and are
    # outside every range; a CHUNK of physical padding keeps the kernels'
    # last aligned window in bounds.
    # table budget: only the first cap_mat sorted entries are materialized
    # (live entries rarely exceed ~4 per splat; sentinels and any truncated
    # tail sort last).  Ranges are clamped to match.
    cap_mat = min(cap, cfg.table_budget_factor * n)
    truncated = jnp.maximum(total - cap_mat, 0)
    starts = jnp.minimum(starts, cap_mat)
    counts = jnp.diff(starts)

    table_src = pack_table(splats)
    inv_perm = _invert_permutation(perm)
    table = _gather_table_rows(k_per, table_src, perm[:cap_mat], inv_perm)
    table = jnp.concatenate(
        [table, jnp.zeros((SEGMENT_ALIGN, TABLE_WIDTH), jnp.float32)], axis=0
    )

    return BinnedSplats(
        table=table,
        tile_starts=starts,
        tile_counts=counts,
        num_duplicates=jnp.minimum(total, cap_mat).astype(jnp.int32),
        overflow=jnp.sum(overflowed).astype(jnp.int32),
        truncated=truncated.astype(jnp.int32),
    )
