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
  2. THREE-LEVEL dense duplicate expansion: every splat owns
     ``dense_small_slots`` slots (level 1); splats covering more tiles
     draw extra slots from a bounded MID pool (``dense_mid_slots`` each)
     or, above that, a FULL pool (up to ``dup_factor``) — sentinel when
     unused, no scatter is ever issued (TPU scatters are pathologically
     slow; an earlier 64-pass scatter formulation dominated the frame).
     All slot buffers are SLOT-MAJOR (k, n) so flattening is a free
     major-axis reshape;
  3. ONE stable sort over fused u32 (tile | quantized-depth) keys orders
     every tile's list front-to-back in a single pass — subsuming both the
     reference's per-frame global depth argsort (renderer_ogl.py:41-53)
     and the CUDA library's 64-bit tileID<<32|depth radix sort, with
     deterministic tie-breaking by flat slot index; the splat id and the
     flat slot index ride as payloads (no second big gather; the flat-slot
     payload doubles as the sort key of the backward's sort-carry fold);
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

from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode
from gaussiansplattingviewer_tpu.ops.projection import ProjectedSplats
from gaussiansplattingviewer_tpu.ops.stride_gather import gather_rows_strided

# Row layout of the packed splat table (lane-padded to 16 floats):
# [cx, cy, conic_a, conic_b, conic_c, r, g, b, opacity, rx, ry, depth,
#  x0, y0, w, count].  Columns 12-15 hold the per-splat tile-bbox (exact
# small ints in f32) ONLY inside bin_splats' augmented copy, so pool-tier
# key generation gathers ONE row per entry instead of 13 per-field
# gathers (measured: the per-field gathers made fine-grained pool ladders
# a net loss).  The blend kernels never read those columns.
TABLE_WIDTH = 16
COL_CX, COL_CY = 0, 1
COL_A, COL_B, COL_C = 2, 3, 4
COL_R, COL_G, COL_BCH = 5, 6, 7
COL_OPACITY = 8
COL_RX, COL_RY = 9, 10
COL_DEPTH = 11
COL_X0, COL_Y0, COL_W, COL_COUNT = 12, 13, 14, 15
# columns 0..8 (cx..opacity) are the only ones the blend differentiates;
# radius/depth/padding are forward-only
GRAD_WIDTH = COL_OPACITY + 1


# Alignment granularity of the Pallas blend kernels' windows (128 f32 =
# one TPU lane tile).  Segments are stored compactly; kernels read
# SEGMENT_ALIGN-aligned windows of KERNEL_CHUNK rows around each segment
# and mask the overhang; TABLE_PAD tail rows keep the last window in
# bounds.
SEGMENT_ALIGN = 128
# rows per kernel inner iteration (one DMA + one loop step).  The prefix
# scans inside the kernels stay SCAN_BLOCK=128 lanes wide — widening THEM
# to 256 was measured NET SLOWER (180.8 vs 175.5 ms/frame; the triangular
# prefix matmuls cost O(S^2) per chunk) — but streaming 2 scan blocks per
# loop iteration halves the fixed per-iteration cost (DMA issue/wait,
# while_loop condition, bookkeeping) at unchanged MXU work.
# KERNEL_CHUNK 512 was measured NET SLOWER in r4 (178.5 vs 167.2
# ms/frame): the coarser early-stop granularity and window overhang cost
# more than the halved per-iteration overhead saves.  256 is the optimum.
KERNEL_CHUNK = 256
SCAN_BLOCK = 128
TABLE_PAD = 2 * KERNEL_CHUNK


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BinnedSplats:
    """Contiguous, depth-ordered per-tile splat lists.

    table: ATTRIBUTE-MAJOR (TABLE_WIDTH, cap + TABLE_PAD) f32, where cap
      is the slot capacity bounded by the table budget — splat rows in
      (tile, depth) order along axis 1, stored COMPACTLY: tile t's rows
      are columns [tile_starts[t], tile_starts[t+1]); sentinel entries
      sit past tile_starts[-1] and a TABLE_PAD tail keeps aligned kernel
      windows in bounds.  Attribute-major is the layout the Pallas blend
      kernels stream and their backward emits — keeping it end-to-end
      avoids two full-table transposes per training step.
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


def _floordiv_small(a, b):
    """Exact ``a // b`` for small non-negative ints via f32 math.

    TPU has no integer-divide hardware; XLA lowers ``//`` by a *traced*
    divisor to a long bit-serial sequence (measured: the ``kk // w`` pair in
    key construction alone cost ~145 ms/frame at 1M splats — 2/3 of the
    whole binning stage).  For 0 <= a < 2^20 and 1 <= b < 2^12,
    ``floor((a + 0.5) / b)`` in f32 is exact: writing a = q*b + r with
    0 <= r < b, (a + 0.5)/b = q + (r + 0.5)/b lies in (q, q + 1) with
    margin >= 0.5/b on both sides — orders of magnitude above f32 rounding
    error at these magnitudes."""
    q = jnp.floor(
        (jnp.asarray(a).astype(jnp.float32) + 0.5)
        / jnp.asarray(b).astype(jnp.float32)
    )
    return q.astype(jnp.int32)


def tile_bbox(
    splats: ProjectedSplats,
    cfg: RenderConfig,
    ty_lo=0,
    ty_hi=None,
    row_stride: int = 1,
):
    """Per-splat tile-index bbox clamped to the grid, to the tile-row set
    owned by this shard, and to the static duplicate cap.

    The shard owns the arithmetic progression of GLOBAL tile rows
    ``{ty_lo + s * row_stride : ty_lo + s * row_stride < ty_hi}`` —
    ``row_stride == 1`` is the contiguous band [ty_lo, ty_hi) of the
    default sharding, ``row_stride == n_shards`` with ``ty_lo = idx`` is
    the INTERLEAVED assignment that de-skews load when scene density is
    top/bottom-heavy (sky rows vs ground rows).

    Returns (x0, y0_local, w, h, count, overflowed) where y0_local indexes
    the shard's local row sequence (s above).
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
    # OPTIONAL static cap (cfg.max_tiles_per_gaussian > 0): shrink the
    # span symmetrically around the center tile.  The default (0) is
    # UNBOUNDED like the reference quad coverage (gau_vert.glsl:174-178);
    # the huge pool in bin_splats provides full-grid slot spans, so no
    # clamp is needed here and ``overflowed`` stays False.
    kmax = (
        cfg.max_tiles_per_gaussian
        if cfg.max_tiles_per_gaussian > 0
        else tx_n * ty_n
    )
    overflowed = (w * h) > kmax
    # greedy clamp: bound each axis at kmax, then bound h by kmax // w
    w_c = jnp.minimum(w, kmax)
    h_c = jnp.minimum(
        h, jnp.maximum(_floordiv_small(kmax, jnp.maximum(w_c, 1)), 1)
    )
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

    # now intersect the (possibly clamped) window with the shard's row set
    # {ty_lo + s * row_stride} ∩ [ty_lo, ty_hi): first local row s0 is the
    # smallest s with ty_lo + s*stride >= y0, last is the largest with
    # ty_lo + s*stride <= min(y1, ty_hi - 1)
    if row_stride == 1:
        y0b = jnp.maximum(y0, ty_lo)
        y1b = jnp.minimum(y1, ty_hi - 1)
        s0 = y0b - ty_lo
        h = y1b - y0b + 1
    else:
        lo = jnp.maximum(y0 - ty_lo, 0)
        hi = jnp.minimum(y1, ty_hi - 1) - ty_lo
        s0 = _floordiv_small(lo + (row_stride - 1), row_stride)
        s1 = _floordiv_small(jnp.maximum(hi, 0), row_stride)
        s1 = jnp.where(hi < 0, -1, s1)
        h = s1 - s0 + 1
    in_band = h > 0

    live = splats.valid & onscreen & in_band
    count = jnp.where(live, w * h, 0)
    return x0, s0, w, jnp.maximum(h, 0), count, overflowed & live


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_table_rows(levels, pack, rows_trunc, perm, big_pos):
    """pack[rows_trunc].T — materialize the splat-attribute rows of the
    (truncated) sorted duplicate slots, ATTRIBUTE-MAJOR (16, cap_mat).

    SOA in, SOA out: the Pallas kernels stream the (16, Dpad) layout
    directly and the backward kernel emits gradients in it, so keeping the
    custom_vjp boundary attribute-major removes two full-table transposes
    per training step AND makes the fold below read contiguous gradient
    rows instead of 9 stride-16 column slices.

    ``levels = (k1, pools, fold_bf16)`` with ``pools`` a tuple of
    (extra-slots-per-entry, entry-count) for each pool tier in cat-major
    rank order (hungriest span first: huge, big, full, mid).

    The VJP folds slot gradients back onto splats without any scatter:
    ONE key-value ``lax.sort`` with ``perm`` (the flat slot of each sorted
    position) as the key and the gradient rows as payloads delivers the
    gradients in flat-slot order (measured cheaper than the old
    inverse-permutation row gather, scripts/foldbench.py); each dense
    level is then reduced with contiguous per-row reshapes and the pool
    levels route back to their splats through ``big_pos`` (one small row
    gather).  With fold_bf16, the 9 payload rows are rounded to bf16 and
    packed PAIRWISE into 5 u32 operands — sort cost is dominated by
    OPERAND COUNT, not bytes (foldbench E vs F vs H), so the packing is
    where the speedup lives; sums happen in f32 after unpacking.

    Flat-slot layout is SLOT-MAJOR: level-1 slot (s, splat i) lives at
    flat = s * n + i, pool slot (s, pool entry p) at
    region_offset + s * pool_cap + p.  Slot-major keeps every reshape on
    the MAJOR axis — a (k, n) -> (k*n,) flatten is free, whereas the
    splat-major (n, k) -> (n*k,) interleave is a TPU relayout pass
    (measured ~45 ms per 7M-element flatten; key construction was ~99 ms
    of the frame before this layout).
    """
    return pack[rows_trunc].T


def _gather_table_rows_fwd(levels, pack, rows_trunc, perm, big_pos):
    return pack[rows_trunc].T, (pack.shape[0], perm, big_pos)


def _pack_bf16_pairs(cols):
    """Round f32 arrays to bf16 and pack them pairwise into u32 words."""
    u16s = [
        jax.lax.bitcast_convert_type(
            c.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        for c in cols
    ]
    if len(u16s) % 2:
        u16s.append(jnp.zeros_like(u16s[0]))
    return [
        u16s[2 * i] | (u16s[2 * i + 1] << jnp.uint32(16))
        for i in range(len(u16s) // 2)
    ]


def _unpack_bf16_pairs(packed, count):
    """Inverse of _pack_bf16_pairs -> ``count`` f32 arrays."""
    cols = []
    for p in packed:
        for sh in (0, 16):
            cols.append(
                jax.lax.bitcast_convert_type(
                    ((p >> jnp.uint32(sh)) & jnp.uint32(0xFFFF)).astype(
                        jnp.uint16
                    ),
                    jnp.bfloat16,
                ).astype(jnp.float32)
            )
    return cols[:count]


def _gather_table_rows_bwd(levels, res, g):
    k1, pools, fold_bf16 = levels
    n, perm, big_pos = res
    cap = perm.shape[0]
    cap_mat = g.shape[1]
    # only the first GRAD_WIDTH rows (cx..opacity, see layout above) ever
    # carry gradient — the blend kernels never differentiate radius/depth —
    # so the sort carries 9 payload columns, not 16
    width = GRAD_WIDTH
    cols = [g[j] for j in range(width)]  # contiguous SOA rows
    if cap > cap_mat:
        # budget-truncated sorted slots were never materialized: zero grad
        pad = jnp.zeros((cap - cap_mat,), g.dtype)
        cols = [jnp.concatenate([c, pad]) for c in cols]
    if fold_bf16:
        payload = _pack_bf16_pairs(cols)
    else:
        payload = cols
    # perm is a permutation of arange(cap): sorting by it as the key puts
    # payload row j at flat slot j — no scatter, no inverse permutation
    sorted_ops = jax.lax.sort((perm, *payload), num_keys=1)
    if fold_bf16:
        flat_cols = _unpack_bf16_pairs(sorted_ops[1:], width)
    else:
        flat_cols = list(sorted_ops[1:])

    total_pool = sum(c for _, c in pools)
    g1_cols, gp_tiers = [], [[] for _ in pools]
    for c in flat_cols:
        # dense level: contiguous major-axis reshape sum -> (n,)
        g1_cols.append(c[: n * k1].reshape(k1, n).sum(axis=0))
        off = n * k1
        for t, (kx, clen) in enumerate(pools):
            if clen == 0:
                continue
            gp_tiers[t].append(
                c[off : off + kx * clen].reshape(kx, clen).sum(axis=0)
            )
            off += kx * clen
    if total_pool > 0:
        # pool entries are ranks in ONE cat-major order (tiers
        # concatenated) — one concatenated gradient table, one routing
        # row gather via big_pos (sentinel total_pool -> zero row).
        # The table is GRAD_WIDTH (9) columns, not 16: row-gather cost
        # grows with SOURCE bytes, and columns 9-15 are always zero.
        parts = [
            jnp.stack(tier, axis=1) for tier in gp_tiers if tier
        ]
        parts.append(jnp.zeros((1, width), jnp.float32))
        gp = jnp.concatenate(parts, axis=0)  # (total_pool + 1, 9)
        # big_pos is mostly the constant sentinel with embedded ascending
        # tier-rank runs — stride-interleave it like every monotone stream
        routed = gather_rows_strided(
            gp, jnp.minimum(big_pos, total_pool)
        )  # (n, 9)
        g1_cols = [c + routed[:, j] for j, c in enumerate(g1_cols)]
    # (n, 16) cotangent for ``pack``: N-scale stack (cheap — the
    # pathological relayouts are at cap scale, not N scale)
    zero_n = jnp.zeros((n,), jnp.float32)
    g1 = jnp.stack(
        g1_cols + [zero_n] * (TABLE_WIDTH - width), axis=1
    )
    return g1, None, None, None


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


def _prepare_binning(
    splats: ProjectedSplats,
    cfg: RenderConfig,
    row_offset,
    local_rows: int,
    row_stride: int,
):
    """Steps 1-2 of bin_splats (spans, tiered slot expansion, fused sort
    keys) — shared by the classic path (bin_splats) and the fused
    super-op's presort (bin_splats_presort).  Returns a dict with the
    unsorted keys/slot_row, the augmented table source, the level layout
    for the slot-space gradient fold, and the overflow diagnostic."""
    n = splats.depth.shape[0]
    num_tiles = local_rows * cfg.tiles_x
    sentinel = jnp.int32(num_tiles)

    # ---- 1. spans on the ORIGINAL splat order
    row_offset = jnp.asarray(row_offset, jnp.int32)
    ty_hi = (
        row_offset + local_rows
        if row_stride == 1
        else row_offset + (local_rows - 1) * row_stride + 1
    )
    x0, y0, w, h, count, overflowed = tile_bbox(
        splats, cfg, ty_lo=row_offset, ty_hi=ty_hi, row_stride=row_stride
    )

    # ---- 2. TIERED dense duplicate expansion (scatter-free).  Level 1
    # gives every splat k1 slots (~87% of live splats cover <= 4 tiles);
    # splats needing more join a GEOMETRIC ladder of pools — MID (k2m
    # extras, covers <= k1+k2m tiles, ~97% of live splats), FULL (k2f =
    # dup_factor - k1 extras), BIG (dense_big_slots extras, ~100+-tile
    # footprints of medium close-ups) and finally HUGE, whose per-entry
    # slot span is the whole (band) tile grid, so per-splat coverage is
    # UNBOUNDED like the reference quad's (gau_vert.glsl:174-178).  The
    # geometric spans keep per-splat slot waste <= ~2x while the pool
    # entry counts stay a small fraction of N — the sorted key volume (and
    # with it the sort, both big gathers, and the backward inverse fold)
    # tracks the LIVE duplicate count.
    k1 = min(cfg.dense_small_slots, cfg.dup_factor)
    k2f = cfg.dup_factor - k1
    k2m = min(cfg.dense_mid_slots, k2f)
    span_cap = num_tiles
    if cfg.max_tiles_per_gaussian > 0:
        span_cap = min(span_cap, cfg.max_tiles_per_gaussian)
    # tier specs, hungriest first: (extra_slots, entry_count).  A tier is
    # active only when it covers strictly more than the next smaller one
    # (else the smaller tier subsumes it).  An explicit cfg.pool_ladder
    # (per-scene autotuned, ops/autotune.py) replaces the derived
    # mid/full/big tiers; the whole-grid HUGE tier is always on top so
    # per-splat coverage stays unbounded like the reference quad's
    # (gau_vert.glsl:174-178).
    huge_entries = cfg.pool_huge_entries or max(
        n // cfg.pool_huge_fraction, 32
    )
    if cfg.pool_ladder:
        ladder = [
            (int(kx), int(c))
            for kx, c in cfg.pool_ladder
            if int(kx) > 0 and int(c) > 0
        ]
        assert all(
            a[0] > b[0] for a, b in zip(ladder, ladder[1:])
        ), "pool_ladder extra_slots must be strictly decreasing"
        k2h = span_cap if (not ladder or span_cap > ladder[0][0]) else 0
        specs = ([(k2h, huge_entries)] if k2h else []) + [
            (kx, c) for kx, c in ladder if kx < span_cap
        ]
    else:
        k2b = min(cfg.dense_big_slots, span_cap)
        k2h = span_cap if span_cap > k2b else 0
        specs = []
        if k2h > k2b:
            specs.append((k2h, huge_entries))
        if k2b > k2f:
            specs.append((k2b, max(n // cfg.pool_big_fraction, 2048)))
        if k2f > 0:
            specs.append((k2f, max(n // cfg.pool_full_fraction, 4096)))
        if 0 < k2m < k2f:
            specs.append((k2m, max(n // cfg.pool_mid_fraction, 4096)))
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

    # a splat NEEDS tier t when the next smaller tier can't hold it; spans
    # decrease with t, so need[0] => need[1] => ... and the category is
    # nt_pool - (# tiers needed): 0 = hungriest tier, nt_pool = small.
    need_any = count > k1
    needs = [
        count > k1 + (kxs[t + 1] if t + 1 < nt_pool else 0)
        for t in range(nt_pool)
    ]
    cat = jnp.full_like(count, nt_pool) - sum(
        nd.astype(jnp.int32) for nd in needs
    )
    # stable partition: one argsort; ranks are pool positions.  Entries a
    # hungrier class leaves unused are filled by the next class (a small
    # splat holding a pool entry simply leaves its extras as sentinels).
    sel = jnp.argsort(cat, stable=True)
    pos = _invert_permutation(sel)  # splat -> rank in cat-major order
    in_tier = [
        (pos >= offs[t]) & (pos < offs[t + 1]) for t in range(nt_pool)
    ]
    # pool-exhaustion demotions truncate a splat's tile list to the tier it
    # actually got (trailing row-major tiles drop).  All count as overflow
    # (quality diagnostics), none break the render; with default pool
    # sizes nothing demotes on real scenes.  NOTE the raw ``count`` needs
    # no clamping for key generation: slot kk is live iff kk < count, and
    # every slot a demoted/spilled splat still OWNS has kk below its
    # clamped count anyway (the clamp only removes slots that don't
    # exist) — so keys below use raw counts everywhere.
    demoted = jnp.zeros_like(need_any)
    for t in range(nt_pool):
        over = in_tier[t] & (count > k1 + kxs[t])
        demoted = demoted | over
    in_any = need_any & (pos < total_pool)
    spilled = need_any & ~in_any
    tier_ids = [sel[offs[t] : offs[t + 1]] for t in range(nt_pool)]
    big_pos = jnp.where(in_any, pos, total_pool)

    # fused (tile, depth) sort key: tile id in the high bits, the top
    # ``depth_bits`` of the positive-f32 bit pattern (monotonic in depth —
    # 8-bit exponent + >=11 mantissa bits, ~0.05% relative depth
    # resolution) in the low bits.  One u32 key replaces the 3-operand
    # two-key sort: ~2/3 the sorted bytes and half the comparator work.
    depth_bits = 32 - int(num_tiles + 1).bit_length()
    dq = jax.lax.bitcast_convert_type(
        jnp.maximum(splats.depth.astype(jnp.float32), 0.0), jnp.uint32
    ) >> jnp.uint32(32 - depth_bits)

    # tight-culling per-splat inputs: the exact alpha test needs the
    # screen center, the conic, and the log-opacity threshold.
    # max over a tile of alpha = min(clamp, op*exp(-0.5*f_min)) with
    # f_min = min over the tile's pixel-center rect of the conic quadratic
    # f(d) = A dx^2 + 2B dx dy + C dy^2 (power = -0.5 f); the tile is dead
    # (contributes exactly 0 through the alpha_min cutoff,
    # gau_frag.glsl:25) iff f_min > thr = 2*(ln op - ln alpha_min).
    do_tight = bool(cfg.tight_culling) and int(cfg.mode) != int(
        RenderMode.BILLBOARD
    )
    import math as _math

    log_alpha_min = _math.log(cfg.alpha_min)

    # the packed table, augmented with the per-splat tile bbox in its four
    # spare columns: pool-tier key generation below gathers ONE row per
    # pool entry (per-row gather cost is ~width-independent) instead of 13
    # per-field gathers — the per-field formulation made fine-grained pool
    # ladders a net LOSS (each pool entry cost ~13 x 7ns of gathers).
    # The blend kernels ignore columns 12-15 and the gradient fold zeroes
    # them, so the augmented table doubles as the kernel table source.
    f32 = jnp.float32
    table_src = pack_table(splats)
    table_src = table_src.at[:, COL_X0].set(x0.astype(f32))
    table_src = table_src.at[:, COL_Y0].set(y0.astype(f32))
    table_src = table_src.at[:, COL_W].set(w.astype(f32))
    table_src = table_src.at[:, COL_COUNT].set(count.astype(f32))

    def _tight_fields(mean_x, mean_y, conic_a, conic_b, conic_c, opac):
        """Derived tight-culling fields (recomputed per pool entry after
        the row gather; bit-identical math to the all-N computation).

        PD PRECONDITION: the edge minimization (and these clamps, which
        guard the divisions) is only output-exact for positive-definite
        conics.  projection.py guarantees PD (it inverts cov2d + 0.3*I,
        gau_vert.glsl:117-118); if a future projection change can emit
        non-PD conics, skip culling for those splats or this test may
        cull a tile the blend kernels would render.
        """
        thr = 2.0 * (jnp.log(jnp.maximum(opac, 1e-20)) - log_alpha_min)
        ca = jnp.maximum(conic_a, 1e-12)
        cc = jnp.maximum(conic_c, 1e-12)
        # per-splat ratios so the per-slot edge minimizations are div-free
        return dict(
            ccx=mean_x, ccy=mean_y, ca=ca, cb=conic_b, cc=cc,
            rbc=conic_b / cc, rba=conic_b / ca, thr=thr,
        )

    def level_keys(v, k_lo, k_hi):
        """Fused sort keys for slots [k_lo, k_hi), SLOT-MAJOR (k, n) layout.

        Slot-major means the flatten to 1-D is a free major-axis reshape;
        the splat-major (n, k) layout's flatten was a TPU relayout pass
        costing ~45 ms per 7M elements (see _gather_table_rows docstring).
        ``v`` holds the per-splat/per-entry 1-D field arrays.
        """
        kk = jnp.arange(k_lo, k_hi, dtype=jnp.int32)[:, None]
        w_s = jnp.maximum(v["w"], 1)[None, :]
        qq = _floordiv_small(kk, w_s)  # kk // w_s without integer divide
        rr = kk - qq * w_s  # kk % w_s
        tx_i = v["x0"][None, :] + rr
        ty_i = v["y0"][None, :] + qq
        live = kk < v["count"][None, :]
        if do_tight:
            ts = float(cfg.tile_size)
            # pixel-center rect of the candidate tile, relative to the
            # splat center (ty_i is band-local; row_offset restores the
            # global pixel row)
            xlo = tx_i.astype(jnp.float32) * ts + 0.5 - v["ccx"][None, :]
            gy = row_offset + ty_i * row_stride  # global tile row
            ylo = gy.astype(jnp.float32) * ts + 0.5 - v["ccy"][None, :]
            xhi = xlo + (ts - 1.0)
            yhi = ylo + (ts - 1.0)
            va, vb, vc = v["ca"][None, :], v["cb"][None, :], v["cc"][None, :]
            vrbc, vrba = v["rbc"][None, :], v["rba"][None, :]

            def edge_x(ex):  # min of f over the edge dx = ex
                dy = jnp.clip(-vrbc * ex, ylo, yhi)
                return ex * (va * ex + 2.0 * vb * dy) + vc * dy * dy

            def edge_y(ey):
                dx = jnp.clip(-vrba * ey, xlo, xhi)
                return dx * (va * dx + 2.0 * vb * ey) + vc * ey * ey

            f_min = jnp.minimum(
                jnp.minimum(edge_x(xlo), edge_x(xhi)),
                jnp.minimum(edge_y(ylo), edge_y(yhi)),
            )
            inside = (xlo <= 0.0) & (xhi >= 0.0) & (ylo <= 0.0) & (yhi >= 0.0)
            f_min = jnp.where(inside, 0.0, f_min)
            live = live & (f_min <= v["thr"][None, :])
        tiles = ty_i * cfg.tiles_x + tx_i
        tiles = jnp.where(live, tiles, sentinel).astype(jnp.uint32)
        return (
            (tiles << jnp.uint32(depth_bits)) | v["dq"][None, :]
        ).reshape(-1)

    def full_fields():
        v = dict(x0=x0, y0=y0, w=w, count=count, dq=dq)
        if do_tight:
            op_m = jnp.where(splats.valid, splats.opacity, 0.0)
            v.update(_tight_fields(
                splats.mean2d[:, 0], splats.mean2d[:, 1],
                splats.conic[:, 0], splats.conic[:, 1], splats.conic[:, 2],
                op_m,
            ))
        return v

    def entry_fields(ids):
        # ONE row gather per pool entry; ids come from the STABLE
        # partition argsort, so they ascend within every tier — the
        # stride interleave dodges the monotone-query gather penalty
        # (ops/stride_gather, ~38.5 -> 22 ns/row on big tiers)
        rows = gather_rows_strided(table_src, ids)
        v = dict(
            x0=rows[:, COL_X0].astype(jnp.int32),
            y0=rows[:, COL_Y0].astype(jnp.int32),
            w=rows[:, COL_W].astype(jnp.int32),
            count=rows[:, COL_COUNT].astype(jnp.int32),
            dq=jax.lax.bitcast_convert_type(
                jnp.maximum(rows[:, COL_DEPTH], 0.0), jnp.uint32
            ) >> jnp.uint32(32 - depth_bits),
        )
        if do_tight:
            v.update(_tight_fields(
                rows[:, COL_CX], rows[:, COL_CY],
                rows[:, COL_A], rows[:, COL_B], rows[:, COL_C],
                rows[:, COL_OPACITY],
            ))
        return v

    all_ids = jnp.arange(n, dtype=jnp.int32)
    keys_parts = [level_keys(full_fields(), 0, k1)]
    row_parts = [jnp.broadcast_to(all_ids[None, :], (k1, n)).reshape(-1)]
    # pool order MUST match the cat-major rank order (hungriest tier
    # first): the VJP fold routes pool gradients back by rank via big_pos
    for ids, kx, clen in zip(tier_ids, kxs, caps):
        if clen == 0:
            continue
        keys_parts.append(level_keys(entry_fields(ids), k1, k1 + kx))
        row_parts.append(
            jnp.broadcast_to(ids[None, :], (kx, clen)).reshape(-1)
        )
    keys = (
        jnp.concatenate(keys_parts) if len(keys_parts) > 1 else keys_parts[0]
    )
    slot_row = (
        jnp.concatenate(row_parts) if len(row_parts) > 1 else row_parts[0]
    )

    overflow_total = jnp.sum(overflowed | spilled | demoted)
    return dict(
        keys=keys,
        slot_row=slot_row,
        table_src=table_src,
        levels=(k1, tuple(zip(kxs, caps))),
        big_pos=big_pos,
        overflow=overflow_total.astype(jnp.int32),
        num_tiles=num_tiles,
        depth_bits=depth_bits,
        n=n,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "local_rows", "row_stride")
)
def bin_splats(
    splats: ProjectedSplats,
    cfg: RenderConfig,
    row_offset=0,
    local_rows: int | None = None,
    row_stride: int = 1,
) -> BinnedSplats:
    """Build depth-ordered per-tile lists (see module docstring).

    row_offset / local_rows / row_stride select the arithmetic progression
    of ``local_rows`` GLOBAL tile rows {row_offset + s * row_stride} — the
    unit of multi-chip image sharding (parallel/): stride 1 is a
    contiguous band, stride n_shards the interleaved assignment.  Defaults
    cover the whole image.  ``local_rows``/``row_stride`` are static
    (shapes depend on them); ``row_offset`` may be traced
    (e.g. lax.axis_index inside shard_map).
    """
    if local_rows is None:
        local_rows = cfg.tiles_y
    row_offset = jnp.asarray(row_offset, jnp.int32)
    prep = _prepare_binning(splats, cfg, row_offset, local_rows, row_stride)
    keys, slot_row = prep["keys"], prep["slot_row"]
    table_src, big_pos = prep["table_src"], prep["big_pos"]
    k1, pools = prep["levels"]
    num_tiles, depth_bits, n = (
        prep["num_tiles"], prep["depth_bits"], prep["n"]
    )
    cap = keys.shape[0]

    # ---- 3. ONE stable sort over (fused key, splat id) replaces the
    # reference's 64-bit tileID<<32|depth radix sort AND its separate
    # global depth argsort (renderer_ogl.py:41-53): front-to-back order
    # per tile falls out directly.  The splat id is the SECONDARY key, not
    # just a payload: equal (tile, depth-quantum) entries must blend in
    # splat-id order to match the reference's stable radix over per-splat
    # duplication order (and the oracle's stable argsort) — with id as a
    # mere payload, ties ordered by flat slot index, which interleaves
    # binning LEVELS, not ids.  The flat slot index payload is the sort
    # KEY of the backward's sort-carry gradient fold (dead weight in
    # inference graphs, where the custom_vjp primal ignores it).
    # is_stable=False is SAFE here: the composite (fused key, splat id) is
    # unique for live entries (a splat duplicates a given tile at most
    # once, and its depth quantum is fixed), so stability cannot change
    # the order of anything the render reads.  Dead entries (sentinel
    # keys) of one splat DO tie, but they sort past every tile range and
    # their relative order only permutes zero-gradient fold rows; ``perm``
    # stays a valid permutation either way.  A stable sort costs an extra
    # hidden iota operand in XLA's lowering.
    key_sorted, rows_sorted, perm = jax.lax.sort(
        (keys, slot_row, jnp.arange(cap, dtype=jnp.int32)),
        num_keys=2,
        is_stable=False,
    )

    starts = jnp.searchsorted(
        key_sorted,
        jnp.arange(num_tiles + 1, dtype=jnp.uint32) << jnp.uint32(depth_bits),
        side="left",
    ).astype(jnp.int32)
    total = starts[num_tiles]

    # ---- 4. the compact table: ONE budgeted row gather in sorted order.
    # Tile t's rows are [starts[t], starts[t+1]); segments are NOT padded —
    # the blend kernels read lane-ALIGNED 128-row windows around each
    # segment and mask the out-of-range rows.  Sentinel entries sort to the
    # tail, outside every range; TABLE_PAD tail rows keep the kernels' last
    # aligned window in bounds — the tightest consumer is the train
    # forward's SHIFTED checkpoint put, which needs
    # TABLE_PAD >= KERNEL_CHUNK + SCAN_BLOCK (asserted in
    # tile_raster_fwd.py at import).
    budget = cfg.table_budget_rows or cfg.table_budget_factor * n
    cap_mat = min(cap, budget)
    truncated = jnp.maximum(total - cap_mat, 0)
    starts = jnp.minimum(starts, cap_mat)
    counts = jnp.diff(starts)

    rows_trunc = rows_sorted[:cap_mat]
    table = _gather_table_rows(
        (k1, pools, bool(cfg.grad_fold_bf16)),
        table_src,
        rows_trunc,
        perm,
        big_pos,
    )
    table = jnp.concatenate(
        [table, jnp.zeros((TABLE_WIDTH, TABLE_PAD), jnp.float32)], axis=1
    )

    return BinnedSplats(
        table=table,
        tile_starts=starts,
        tile_counts=counts,
        num_duplicates=jnp.minimum(total, cap_mat).astype(jnp.int32),
        # one count per affected splat (a splat can both hit the static
        # bbox clamp and miss a pool; double-counting made it noisy)
        overflow=prep["overflow"],
        truncated=truncated.astype(jnp.int32),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PresortedBins:
    """bin_splats minus the table gather — the fused super-op's input.

    table_src: (N, TABLE_WIDTH) augmented splat table (pack_table + bbox
      columns; COL_COUNT still holds the tile count — the super-op
      replaces it with the splat id before gathering).
    rows_sorted: (cap,) i32 splat id per sorted duplicate slot, in fused
      (tile | depth) key order; dead slots sort past every tile range.
    starts_full: (num_tiles + 1,) i32 UNCLIPPED segment boundaries into
      the sorted order (budget clipping happens inside the super-op).
    num_duplicates / overflow: diagnostics as in BinnedSplats.
    """

    table_src: jax.Array
    rows_sorted: jax.Array
    starts_full: jax.Array
    num_duplicates: jax.Array
    overflow: jax.Array


@functools.partial(
    jax.jit, static_argnames=("cfg", "local_rows", "row_stride")
)
def bin_splats_presort(
    splats: ProjectedSplats,
    cfg: RenderConfig,
    row_offset=0,
    local_rows: int | None = None,
    row_stride: int = 1,
) -> PresortedBins:
    """Duplicate expansion + fused (tile|depth) sort WITHOUT the table
    gather: the fused super-op (ops/fused.py) gathers per-tile row
    prefixes itself and folds gradients by splat id, so it needs neither
    the materialized table nor the ``perm`` payload the slot-space fold
    required — the main sort drops to 2 operands.
    """
    if local_rows is None:
        local_rows = cfg.tiles_y
    row_offset = jnp.asarray(row_offset, jnp.int32)
    prep = _prepare_binning(splats, cfg, row_offset, local_rows, row_stride)
    num_tiles, depth_bits = prep["num_tiles"], prep["depth_bits"]
    # same deterministic total order as bin_splats (see its comment): the
    # composite (fused key, splat id) is unique for live entries, so live
    # order is identical with or without the perm payload.
    key_sorted, rows_sorted = jax.lax.sort(
        (prep["keys"], prep["slot_row"]), num_keys=2, is_stable=False
    )
    starts_full = jnp.searchsorted(
        key_sorted,
        jnp.arange(num_tiles + 1, dtype=jnp.uint32)
        << jnp.uint32(depth_bits),
        side="left",
    ).astype(jnp.int32)
    return PresortedBins(
        table_src=prep["table_src"],
        rows_sorted=rows_sorted,
        starts_full=starts_full,
        num_duplicates=starts_full[num_tiles],
        overflow=prep["overflow"],
    )
