"""Fused binning+blend super-op: budgeted prefix gather, residual pass,
and a compact id-folded backward — one custom_vjp spanning both stages.

Motivation (PERF.md r4): at garden scale 81% of the sort/gather/fold
volume is rows the blend kernels never read — 90% of tiles saturate
(transmittance early-stop) long before their depth-sorted lists end.  The
classic pipeline (binning.bin_splats -> blend.blend_tiles) cannot exploit
that because the table gather runs before the blend and the gradient fold
is sized by slot capacity.  This op restructures the boundary:

  forward
    1. PREFIX gather: only the first min(count, K) rows per tile are
       gathered (K = cfg.prefix_rows; sum bounded by prefix_budget_rows).
       Saturating tiles never need the rest.
    2. pass-1 blend (the standard kernels) -> rgb1, trans1.
    3. tiles that neither saturated nor fit in K get a RESIDUAL pass:
       their remaining rows are gathered (residual_budget_rows) and blended
       SEEDED with trans1 — exact by compositional associativity:
       out = out_K + blend(rest | T_in = T_K), T_out = T_rest.
  backward
    4. both passes run the fused backward kernel
       (tile_raster_bwd.blend_bwd_fused): gradients land ROW-major at
       CHUNK-aligned compacted offsets (write-exclusive tiles — the
       boundary RMW of the classic kernel is gone), with the owning splat
       id carried beside them.  Pass 1's suffix carry is seeded with
       g . rgb_residual so dL/dalpha sees the residual splats behind it.
    5. ONE id fold (ops/fold.fold_rows_by_id) over ~processed rows —
       instead of the slot-dense fold over ~capacity rows — produces the
       (N, 16) table cotangent.

The whole op is exact w.r.t. the single-pass semantics up to fp
summation-order (pass-1 + residual adds in the same splat order; the only
re-association is the final rgb1 + rgb2).  With prefix_rows == 0 it
degenerates to a single full pass whose backward still uses the compact
id fold.  Requires the Pallas executor (interpret mode on CPU).

Reference semantics unchanged: the per-fragment math is the same
gau_frag.glsl / diff-gaussian-rasterization blend as ops/blend.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gaussiansplattingviewer_tpu.config import RenderConfig
from gaussiansplattingviewer_tpu.ops import binning
from gaussiansplattingviewer_tpu.ops.binning import (
    KERNEL_CHUNK,
    SEGMENT_ALIGN,
    TABLE_PAD,
    TABLE_WIDTH,
)
from gaussiansplattingviewer_tpu.ops.fold import fold_rows_by_id
from gaussiansplattingviewer_tpu.ops.stride_gather import (
    stride_perm_iota,
    unpermute_rows,
)


def _ragged_rows(starts_c, shift, rows_sorted, budget):
    """Budgeted ragged per-tile gather of ``rows_sorted``.

    Output position i belongs to tile t (the rightmost with
    starts_c[t] <= i); its source index is i + shift[t].  Positions past
    the last tile's segment read a clamped (dead) index — they sit outside
    every [starts_c[t], starts_c[t+1]) so the kernels mask them and their
    gradients are zero.

    The query stream runs in STRIDE-INTERLEAVED order (ops/stride_gather):
    i + shift[t] ascends tile by tile, and monotone small-step gathers pay
    the measured 1.7x penalty; the interleave gets the random-stream rate
    and a free transpose restores natural order.
    """
    cap = rows_sorted.shape[0]
    i = stride_perm_iota(budget)  # padded grid; tail positions are dead
    # method="sort": ONE 2-operand sort of (boundaries ++ queries).  The
    # default "scan" binary search does log2(T) GATHER passes over ALL
    # queries — measured catastrophic at millions of queries on TPU
    # (~9 ns/row per pass; +500 ms at garden scale).
    t = jnp.searchsorted(
        starts_c.astype(jnp.int32), i, side="right", method="sort"
    ).astype(jnp.int32) - 1
    t = jnp.clip(t, 0, shift.shape[0] - 1)
    src = jnp.clip(i + shift[t], 0, cap - 1)
    return unpermute_rows(rows_sorted[src], budget)


def _num_chunks(starts_c, counts):
    """Per-tile processed-window chunk count, exactly as the kernels
    compute it (aligned window around the compact segment)."""
    start = starts_c[:-1]
    end = start + counts
    base = (start // SEGMENT_ALIGN) * SEGMENT_ALIGN
    return jnp.where(
        counts > 0, -((base - end) // KERNEL_CHUNK), 0
    ).astype(jnp.int32)


def _pad_table(tb):
    return jnp.concatenate(
        [tb, jnp.zeros((TABLE_WIDTH, TABLE_PAD), jnp.float32)], axis=1
    )


def _grad_budget2(cfg: RenderConfig, num_tiles: int) -> int:
    """Static compact-gradient budget for the RESIDUAL pass:
    cfg.grad_residual_budget_rows if set (autotuned ~ unfinished tiles +
    slack), else the safe bound residual rows + one chunk per tile —
    correct but mostly-empty, inflating the id fold."""
    b = cfg.grad_residual_budget_rows or (
        int(cfg.residual_budget_rows) + (num_tiles + 1) * KERNEL_CHUNK
    )
    return -(-b // KERNEL_CHUNK) * KERNEL_CHUNK


def _grad_budget(cfg: RenderConfig, table_rows: int, num_tiles: int) -> int:
    """Static compact-gradient budget for a pass: cfg.grad_budget_rows if
    set (autotuned ~ processed rows), else the safe upper bound
    table_rows + one alignment-slack chunk per tile."""
    b = cfg.grad_budget_rows or (
        table_rows + (num_tiles + 1) * KERNEL_CHUNK
    )
    return -(-b // KERNEL_CHUNK) * KERNEL_CHUNK


def _forward(cfg, local_rows, row_stride, table_src, rows_sorted,
             starts_full, row_offset, train: bool):
    from gaussiansplattingviewer_tpu.ops.pallas.tile_raster_fwd import (
        rasterize_binned_pallas_seeded,
        rasterize_binned_pallas_soa,
        rasterize_binned_pallas_train,
    )

    n = table_src.shape[0]
    assert n < (1 << 24), "splat ids must be exact in f32"
    num_tiles = local_rows * cfg.tiles_x
    cap = rows_sorted.shape[0]
    counts_full = jnp.diff(starts_full)
    k = int(cfg.prefix_rows)
    if k > 0:
        assert cfg.residual_budget_rows > 0, (
            "prefix_rows requires residual_budget_rows"
        )

    # the gathered table carries the splat ID in its spare COL_COUNT
    # column (exact f32 integers; the backward kernel copies it beside the
    # gradient rows for the id fold)
    ts_id = table_src.at[:, binning.COL_COUNT].set(
        jnp.arange(n, dtype=jnp.float32)
    )

    # ---- pass 1: per-tile prefix of min(count, K) rows
    cmin = jnp.minimum(counts_full, k) if k > 0 else counts_full
    kb = cfg.prefix_budget_rows or cfg.table_budget_rows or (
        cfg.table_budget_factor * n
    )
    kb = min(kb, cap)
    pstarts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cmin).astype(jnp.int32)]
    )
    ptrunc = jnp.maximum(pstarts[num_tiles] - kb, 0)
    pstarts_c = jnp.minimum(pstarts, kb)
    pcounts = jnp.diff(pstarts_c)
    if k > 0:
        rows1 = _ragged_rows(
            pstarts_c, starts_full[:-1] - pstarts_c[:-1], rows_sorted, kb
        )
    else:
        # K disabled: prefix positions are the sorted order itself (the
        # classic budgeted slice) — no index machinery
        rows1 = rows_sorted[:kb]
    table1 = _pad_table(ts_id[rows1].T)

    if train:
        rgb1, trans1, ckpt1, nproc1 = rasterize_binned_pallas_train(
            table1, pstarts_c, pcounts, row_offset, cfg, local_rows,
            row_stride,
        )
    else:
        rgb1, trans1 = rasterize_binned_pallas_soa(
            table1, pstarts_c, pcounts, row_offset, cfg, local_rows,
            row_stride,
        )
        ckpt1 = nproc1 = None

    out = dict(
        table1=table1, pstarts_c=pstarts_c, pcounts=pcounts,
        ckpt1=ckpt1, nproc1=nproc1, rgb1=rgb1, trans1=trans1,
        ptrunc=ptrunc, rtrunc=jnp.int32(0), n=n,
    )
    if k == 0:
        out.update(rgb=rgb1, trans=trans1)
        return out

    # ---- pass 2: residual rows of unfinished tiles, seeded with trans1
    finished = (
        jnp.max(trans1, axis=1) <= cfg.early_stop_transmittance
    ) | (counts_full <= k)
    rc = jnp.where(finished, 0, counts_full - k)
    rb = int(cfg.residual_budget_rows)
    rstarts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(rc).astype(jnp.int32)]
    )
    rtrunc = jnp.maximum(rstarts[num_tiles] - rb, 0)
    rstarts_c = jnp.minimum(rstarts, rb)
    rcounts = jnp.diff(rstarts_c)
    rows2 = _ragged_rows(
        rstarts_c, starts_full[:-1] + k - rstarts_c[:-1], rows_sorted, rb
    )
    table2 = _pad_table(ts_id[rows2].T)

    res2 = rasterize_binned_pallas_seeded(
        table2, rstarts_c, rcounts, trans1, row_offset, cfg, local_rows,
        row_stride, train=train,
    )
    if train:
        rgb2, trans2, ckpt2, nproc2 = res2
    else:
        rgb2, trans2 = res2
        ckpt2 = nproc2 = None

    out.update(
        table2=table2, rstarts_c=rstarts_c, rcounts=rcounts,
        ckpt2=ckpt2, nproc2=nproc2, rgb2=rgb2,
        rgb=rgb1 + rgb2, trans=trans2, rtrunc=rtrunc,
    )
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def probe_forward(splats, cfg: RenderConfig):
    """Autotune probe: one full-table train forward measuring what the
    fused path's budgets must cover.

    Returns (counts (T,), processed_rows (T,), saturated (T,) bool,
    num_duplicates) — per-tile list lengths, rows the blend actually
    consumed before early-stop (chunk-granular), and whether the tile
    saturated.  ops/autotune.py turns these into prefix_rows /
    prefix_budget_rows / residual_budget_rows / grad_budget_rows.
    """
    from gaussiansplattingviewer_tpu.ops.binning import bin_splats_presort

    pres = bin_splats_presort(splats, cfg)
    counts = jnp.diff(pres.starts_full)
    # clear ALL fused budgets: a re-tune of an already-fused config must
    # probe the FULL table, not a truncating prefix budget
    cfg0 = cfg.with_(
        prefix_rows=0, prefix_budget_rows=0, residual_budget_rows=0,
        grad_budget_rows=0, grad_residual_budget_rows=0,
    )
    f = _forward(
        cfg0, cfg.tiles_y, 1, pres.table_src, pres.rows_sorted,
        pres.starts_full, jnp.int32(0), train=True,
    )
    nchunks = _num_chunks(f["pstarts_c"], f["pcounts"])
    processed = (
        jnp.minimum(f["nproc1"], nchunks) * KERNEL_CHUNK
    ).astype(jnp.int32)
    sat = jnp.max(f["trans1"], axis=1) <= cfg.early_stop_transmittance
    return counts, processed, sat, pres.num_duplicates


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def blend_fused(cfg: RenderConfig, local_rows: int, row_stride: int,
                table_src, rows_sorted, starts_full, row_offset):
    """-> (rgb_tiles (T, P, 3), trans_tiles (T, P), diag (4,) f32).

    diag = [prefix_trunc, residual_trunc, grad_rows_needed,
    grad_rows_dropped]; the gradient entries are only populated when the
    op runs under differentiation (the inference primal reports 0).
    Differentiable w.r.t. table_src only.
    """
    f = _forward(
        cfg, local_rows, row_stride, table_src, rows_sorted, starts_full,
        row_offset, train=False,
    )
    diag = jnp.stack(
        [f["ptrunc"].astype(jnp.float32), f["rtrunc"].astype(jnp.float32),
         jnp.float32(0), jnp.float32(0)]
    )
    return f["rgb"], f["trans"], diag


def _blend_fused_fwd(cfg, local_rows, row_stride, table_src, rows_sorted,
                     starts_full, row_offset):
    f = _forward(
        cfg, local_rows, row_stride, table_src, rows_sorted, starts_full,
        row_offset, train=True,
    )
    num_tiles = local_rows * cfg.tiles_x
    k = int(cfg.prefix_rows)

    # compact-gradient regions: exclusive cumsum of per-tile processed
    # chunks; tiles whose region exceeds the static budget are dropped
    # from the backward (their table gradients are lost for the step) and
    # counted in diag[3] — the same probe/overflow-retune contract as the
    # pool ladder.
    def regions(starts_c, counts, nproc, budget):
        np_eff = jnp.minimum(nproc, _num_chunks(starts_c, counts))
        sizes = np_eff * KERNEL_CHUNK
        goff = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(sizes).astype(jnp.int32)]
        )
        fits = goff[1:] <= budget
        dropped = jnp.sum(jnp.where(fits, 0, sizes))
        return (
            jnp.where(fits, np_eff, 0), goff[:-1], goff[num_tiles],
            dropped,
        )

    g1_budget = _grad_budget(cfg, f["table1"].shape[1], num_tiles)
    np1, goff1, need1, drop1 = regions(
        f["pstarts_c"], f["pcounts"], f["nproc1"], g1_budget
    )
    need, dropped = need1, drop1
    pass2 = None
    if k > 0:
        g2_budget = _grad_budget2(cfg, num_tiles)
        np2, goff2, need2, drop2 = regions(
            f["rstarts_c"], f["rcounts"], f["nproc2"], g2_budget
        )
        need = need + need2
        dropped = dropped + drop2
        pass2 = (
            f["table2"], f["rstarts_c"], f["rcounts"], f["ckpt2"], np2,
            goff2, f["rgb2"],
        )

    diag = jnp.stack(
        [f["ptrunc"].astype(jnp.float32), f["rtrunc"].astype(jnp.float32),
         need.astype(jnp.float32), dropped.astype(jnp.float32)]
    )
    # zero-size token carrying the static splat count into the bwd (py
    # ints in residual pytrees would arrive as tracers)
    n_token = jnp.zeros((f["n"], 0), jnp.float32)
    res = (
        f["table1"], f["pstarts_c"], f["pcounts"], f["ckpt1"], np1, goff1,
        f["trans1"], f["trans"], pass2, row_offset, n_token,
    )
    return (f["rgb"], f["trans"], diag), res


def _blend_fused_bwd(cfg, local_rows, row_stride, res, cotangents):
    from gaussiansplattingviewer_tpu.ops.pallas.tile_raster_bwd import (
        blend_bwd_fused,
    )

    (table1, pstarts_c, pcounts, ckpt1, np1, goff1, trans1,
     trans, pass2, row_offset, n_token) = res
    g_rgb, g_trans, _ = cotangents
    p = cfg.tile_size * cfg.tile_size
    num_tiles = local_rows * cfg.tiles_x
    n = n_token.shape[0]
    ones_tp = jnp.ones((num_tiles, p), jnp.float32)
    # static budgets recomputed (residual pytrees may not carry py ints)
    g1_budget = _grad_budget(cfg, table1.shape[1], num_tiles)

    if pass2 is not None:
        (table2, rstarts_c, rcounts, ckpt2, np2, goff2, rgb2) = pass2
        g2_budget = _grad_budget2(cfg, num_tiles)
        g2_rows = blend_bwd_fused(
            table2, rstarts_c, rcounts, np2, goff2, ckpt2, row_offset,
            g_rgb, g_trans, trans, jnp.zeros((num_tiles, p), jnp.float32),
            trans1, g2_budget, cfg, local_rows, row_stride,
        )
        # pass-1 splats see the residual splats BEHIND them: seed the
        # backward suffix carry with g . rgb_residual per pixel
        suffix1 = jnp.einsum(
            "tpc,tpc->tp", g_rgb, rgb2,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        g2_rows = None
        suffix1 = jnp.zeros((num_tiles, p), jnp.float32)

    g1_rows = blend_bwd_fused(
        table1, pstarts_c, pcounts, np1, goff1, ckpt1, row_offset,
        g_rgb, g_trans, trans, suffix1, ones_tp, g1_budget, cfg,
        local_rows, row_stride,
    )
    g_all = (
        g1_rows if g2_rows is None
        else jnp.concatenate([g1_rows, g2_rows], axis=1)
    )
    g_src = fold_rows_by_id(g_all, n, bool(cfg.grad_fold_bf16))
    return g_src, None, None, None


blend_fused.defvjp(_blend_fused_fwd, _blend_fused_bwd)
