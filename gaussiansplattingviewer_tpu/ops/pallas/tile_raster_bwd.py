"""Pallas TPU kernel: fused tile-blend backward pass.

Implements the gradient semantics documented in ops/blend.py (the
diff-gaussian-rasterization backward the reference links but never runs,
renderer_cuda.py:214) as a front-to-back RE-TRAVERSAL: no per-splat
residuals are stored — each tile streams its splat rows again, recomputes
alpha/transmittance, and emits per-row gradients for (center, conic,
opacity, color) with the streaming identity g.S_i = g.out - g.A_i.

Layout mirrors the forward kernel (tile_raster_fwd.py): pixels on sublanes,
splats on lanes, attribute-major (16, Dpad) table, lane-aligned chunk DMAs.
Each table row belongs to exactly one tile, so gradient rows are pure
writes — no atomics, no collisions.  The output buffer is zero-initialized
through input/output aliasing so rows of chunks skipped by the
transmittance early-stop (which contributed nothing in the forward) keep
exactly zero gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode
from gaussiansplattingviewer_tpu.ops import binning
from gaussiansplattingviewer_tpu.ops.binning import (
    KERNEL_CHUNK,
    SCAN_BLOCK,
    SEGMENT_ALIGN,
    TABLE_WIDTH,
)
from gaussiansplattingviewer_tpu.ops.pallas.tile_raster_fwd import (
    _exclusive_cumprod_lanes,
    _tri_matmul_f32,
)

CHUNK = KERNEL_CHUNK  # see tile_raster_fwd
N_BUF = 2


def _inclusive_cumsum_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along axis 1 as ONE triangular matmul on the
    MXU (the roll-add Hillis-Steele scan was 21 VPU ops on the full
    block); f32-accurate 3-pass split, see _tri_matmul_f32."""
    s = x.shape[1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    tri_incl = (ri <= ci).astype(jnp.float32)  # [j, i] = 1 iff j <= i
    return _tri_matmul_f32(x, tri_incl)


def _block_grads(
    rows, live, gscratch, slot, bs, be, trans, a_dot,
    px, py, ox, oy, basis, g_rgb, g_trans, out_trans, gdot_out,
    cfg: RenderConfig,
):
    """Gradient math for one (16, SCAN_BLOCK) block: recompute the forward
    alpha/transmittance, emit per-row gradients into gscratch[slot, :, bs:be],
    and return the chained (trans, a_dot) carries.

    rows: (16, S) attribute block; live: (1, S); trans/a_dot: (P, 1).
    """
    b = binning
    mode = int(cfg.mode)
    cx = rows[b.COL_CX : b.COL_CX + 1, :] - ox  # tile-local frame
    cy = rows[b.COL_CY : b.COL_CY + 1, :] - oy
    ca = rows[b.COL_A : b.COL_A + 1, :]
    cb = rows[b.COL_B : b.COL_B + 1, :]
    cc = rows[b.COL_C : b.COL_C + 1, :]
    op = rows[b.COL_OPACITY : b.COL_OPACITY + 1, :]
    rx = rows[b.COL_RX : b.COL_RX + 1, :]
    ry = rows[b.COL_RY : b.COL_RY + 1, :]
    colors = rows[b.COL_R : b.COL_BCH + 1, :]  # (3, S)

    dx = px - cx  # (P, S)
    dy = py - cy
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    in_rect = (jnp.abs(dx) <= rx) & (jnp.abs(dy) <= ry) & live

    if mode == RenderMode.BILLBOARD:
        alpha = jnp.where(in_rect, 1.0, 0.0)
        gauss = jnp.ones_like(alpha)
        unclamped = jnp.zeros_like(in_rect)
    else:
        gauss = jnp.exp(power)
        raw = op * gauss
        alpha = jnp.minimum(cfg.alpha_clamp, raw)
        keep = in_rect & (power <= 0.0) & (alpha >= cfg.alpha_min)
        alpha = jnp.where(keep, alpha, 0.0)
        if mode in (RenderMode.FLAT_BALL, RenderMode.GAUSSIAN_BALL):
            alpha = jnp.where(
                keep & (alpha > cfg.ball_threshold), 1.0, 0.0
            )
            unclamped = jnp.zeros_like(keep)
        else:
            unclamped = keep & (raw < cfg.alpha_clamp)

    one_m = 1.0 - alpha
    prefix = _exclusive_cumprod_lanes(one_m)
    t_i = prefix * trans  # (P, S)
    w = alpha * t_i

    # g . c_i : (P, 3) x (3, S) on the MXU
    g_dot_c = jax.lax.dot_general(
        g_rgb,
        colors,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    u = w * g_dot_c
    a_dot_inc = a_dot + _inclusive_cumsum_lanes(u)  # (P, S)

    one_m_safe = jnp.maximum(one_m, 1.0 - cfg.alpha_clamp)
    dl_da = (
        t_i * g_dot_c
        - (gdot_out - a_dot_inc) / one_m_safe
        - g_trans * out_trans / one_m_safe
    )
    dl_da = jnp.where(alpha > 0.0, dl_da, 0.0)

    zeros_blk = jnp.zeros((TABLE_WIDTH, SCAN_BLOCK), jnp.float32)
    if mode in (
        RenderMode.BILLBOARD,
        RenderMode.FLAT_BALL,
        RenderMode.GAUSSIAN_BALL,
    ):
        w_c = w * gauss if mode == RenderMode.GAUSSIAN_BALL else w
        g_col = jax.lax.dot_general(
            w_c,
            g_rgb,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, 3)
        gscratch[slot, :, bs:be] = zeros_blk
        gscratch[slot, b.COL_R : b.COL_BCH + 1, bs:be] = jnp.transpose(
            g_col, (1, 0)
        )
    else:
        d_power = jnp.where(unclamped, dl_da * op * gauss, 0.0)
        # All six pixel-reductions (opacity, conic x3, center x2) are
        # moments of d_power against the constant polynomial basis:
        # ONE (8, P) x (P, S) MXU matmul replaces ~12 full-block VPU
        # multiply+reduce passes.  dx = px - cx, so e.g.
        #   sum_p d_power dx^2 = Mxx - 2 cx Mx + cx^2 M0
        # with M* = sum_p d_power * basis_*; tile-local coords keep
        # these recombinations far from f32 cancellation.
        m = jax.lax.dot_general(
            basis,
            d_power,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (8, S)
        m0 = m[0:1]
        sx = m[1:2] - cx * m0  # sum d_power * dx
        sy = m[2:3] - cy * m0
        sxx = m[3:4] - cx * (2.0 * m[1:2] - cx * m0)
        sxy = m[4:5] - cx * m[2:3] - cy * m[1:2] + cx * cy * m0
        syy = m[5:6] - cy * (2.0 * m[2:3] - cy * m0)
        # d_power = unclamped * dl_da * op * gauss and op is constant
        # along pixels, so g_op = sum(unclamped * dl_da * gauss) = M0/op
        g_op = jnp.where(op > 0.0, m0 / jnp.maximum(op, 1e-20), 0.0)
        g_ca = -0.5 * sxx
        g_cb = -sxy
        g_cc = -0.5 * syy
        g_cx = ca * sx + cb * sy
        g_cy = cc * sy + cb * sx
        # (S, P) x (P, 3) -> per-splat color grads, on the MXU
        g_col = jax.lax.dot_general(
            w,
            g_rgb,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, 3)

        gscratch[slot, :, bs:be] = zeros_blk
        gscratch[slot, b.COL_CX : b.COL_CX + 1, bs:be] = g_cx
        gscratch[slot, b.COL_CY : b.COL_CY + 1, bs:be] = g_cy
        gscratch[slot, b.COL_A : b.COL_A + 1, bs:be] = g_ca
        gscratch[slot, b.COL_B : b.COL_B + 1, bs:be] = g_cb
        gscratch[slot, b.COL_C : b.COL_C + 1, bs:be] = g_cc
        gscratch[slot, b.COL_OPACITY : b.COL_OPACITY + 1, bs:be] = g_op
        gscratch[slot, b.COL_R : b.COL_BCH + 1, bs:be] = jnp.transpose(
            g_col, (1, 0)
        )

    trans = trans * prefix[:, -1:] * one_m[:, -1:]
    a_dot = a_dot_inc[:, -1:]
    return trans, a_dot


def _bwd_kernel(
    starts_ref,  # scalar prefetch (T+1,)
    counts_ref,  # scalar prefetch (T,)
    rowoff_ref,  # scalar prefetch (1,) tile-row offset of this shard
    g_ref,  # VMEM block (1, P, 4): [g_rgb | g_trans]
    out_res_ref,  # VMEM block (1, P, 4): forward [rgb | trans]
    table_ref,  # ANY (16, Dpad)
    gtable_init_ref,  # ANY (16, Dpad) zeros, aliased to output
    gtable_ref,  # ANY (16, Dpad) output
    scratch,  # VMEM (N_BUF, 16, CHUNK)
    gscratch,  # VMEM (N_BUF, 16, CHUNK): double-buffered gradient staging
    gprev_scratch,  # VMEM (16, CHUNK): boundary-block RMW accumulator
    sems,  # DMA (N_BUF,)
    out_sems,  # DMA (N_BUF,)
    prev_sem,  # DMA ()
    *,
    cfg: RenderConfig,
    row_stride: int = 1,
):
    del gtable_init_ref
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    p = cfg.tile_size * cfg.tile_size
    start = starts_ref[t]
    end = start + counts_ref[t]
    base = (start // SEGMENT_ALIGN) * SEGMENT_ALIGN  # aligned window start
    num_chunks = jnp.where(end > start, pl.cdiv(end - base, CHUNK), 0)
    mode = int(cfg.mode)
    b = binning

    ts = cfg.tile_size
    tx = (t % cfg.tiles_x).astype(jnp.float32)
    ty = ((t // cfg.tiles_x) * row_stride + rowoff_ref[0]).astype(
        jnp.float32
    )
    # TILE-LOCAL pixel coordinates: the gradient reductions below are
    # computed from moment sums against a per-tile-constant polynomial
    # basis, and local coords keep the moment magnitudes small enough that
    # the recombination (e.g. Sxx = Mxx - 2 cx Mx + cx^2 M0) is f32-safe.
    # All fragment math is translation-invariant, so splat centers are
    # simply shifted into the same frame.
    local = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = jax.lax.rem(local, ts).astype(jnp.float32) + 0.5  # (P, 1) local
    py = jax.lax.div(local, ts).astype(jnp.float32) + 0.5
    ox = tx * ts  # tile origin in global pixels
    oy = ty * ts
    # constant (8, P) moment basis [1, x, y, x^2, xy, y^2, 0, 0]
    lp = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    pxr = jax.lax.rem(lp, ts).astype(jnp.float32) + 0.5  # (1, P)
    pyr = jax.lax.div(lp, ts).astype(jnp.float32) + 0.5
    ones_r = jnp.ones((1, p), jnp.float32)
    zeros_r = jnp.zeros((1, p), jnp.float32)
    basis = jnp.concatenate(
        [ones_r, pxr, pyr, pxr * pxr, pxr * pyr, pyr * pyr, zeros_r, zeros_r],
        axis=0,
    )  # (8, P)

    g_rgb = g_ref[0, :, 0:3]  # (P, 3)
    g_trans = g_ref[0, :, 3:4]  # (P, 1)
    out_rgb = out_res_ref[0, :, 0:3]
    out_trans = out_res_ref[0, :, 3:4]
    gdot_out = jnp.sum(g_rgb * out_rgb, axis=1, keepdims=True)  # (P, 1)

    def get_dma(slot, chunk_idx, tile_base=None):
        offset = pl.multiple_of(
            (base if tile_base is None else tile_base) + chunk_idx * CHUNK,
            SEGMENT_ALIGN,
        )
        return pltpu.make_async_copy(
            table_ref.at[:, pl.ds(offset, CHUNK)],
            scratch.at[slot],
            sems.at[slot],
        )

    def get_gprev_dma(chunk_idx):
        # adjacent tiles share boundary blocks of the compact layout, so
        # gradient writes are read-modify-write (the grid is sequential on
        # a single TensorCore, so the neighbor's write has completed)
        offset = pl.multiple_of(base + chunk_idx * CHUNK, SEGMENT_ALIGN)
        return pltpu.make_async_copy(
            gtable_ref.at[:, pl.ds(offset, CHUNK)],
            gprev_scratch,
            prev_sem,
        )

    def put_dma(chunk_idx):
        # double-buffered: the put for chunk ci streams from gscratch slot
        # ci % N_BUF while chunk ci+1 computes into the other slot; the
        # synchronous put.wait() here used to stall the loop on every HBM
        # write-back
        offset = pl.multiple_of(base + chunk_idx * CHUNK, SEGMENT_ALIGN)
        slot = jax.lax.rem(chunk_idx, N_BUF)
        return pltpu.make_async_copy(
            gscratch.at[slot],
            gtable_ref.at[:, pl.ds(offset, CHUNK)],
            out_sems.at[slot],
        )

    # cross-tile prefetch (mirrors tile_raster_fwd): the previous grid step
    # started this tile's chunk 0 into slot 0; only tile 0 starts cold
    @pl.when((t == 0) & (num_chunks > 0))
    def _():
        get_dma(0, 0).start()

    def cond(state):
        ci, trans, a_dot = state
        return (ci < num_chunks) & (
            jnp.max(trans) > cfg.early_stop_transmittance
        )

    def body(state):
        ci, trans, a_dot = state
        slot = jax.lax.rem(ci, N_BUF)
        next_slot = jax.lax.rem(ci + 1, N_BUF)

        @pl.when(ci + 1 < num_chunks)
        def _():
            get_dma(next_slot, ci + 1).start()

        get_dma(slot, ci).wait()
        # reclaim this gscratch slot: its previous put (chunk ci - N_BUF)
        # must have drained before we overwrite the staging buffer
        @pl.when(ci >= N_BUF)
        def _():
            put_dma(ci - N_BUF).wait()

        # only the first/last chunk of a tile can share its 128-block with
        # a neighboring tile; interior chunks are exclusively owned, so the
        # read-modify-write accumulate is confined to the boundaries
        boundary = ((ci == 0) & (start > base)) | (
            (ci == num_chunks - 1) & (end < base + num_chunks * CHUNK)
        )

        @pl.when(boundary)
        def _():
            get_gprev_dma(ci).start()

        rows_chunk = scratch[slot]  # (16, CHUNK)
        # each chunk is CHUNK // SCAN_BLOCK sequential 128-lane gradient
        # blocks (prefix matmuls are O(S^2), see tile_raster_fwd); trans
        # and a_dot chain across blocks exactly as across chunks
        for bi in range(CHUNK // SCAN_BLOCK):
            bs = bi * SCAN_BLOCK
            be = bs + SCAN_BLOCK
            rows = rows_chunk[:, bs:be]  # (16, S)
            col = base + ci * CHUNK + bs + jax.lax.broadcasted_iota(
                jnp.int32, (1, SCAN_BLOCK), 1
            )
            live = (col >= start) & (col < end)
            trans, a_dot = _block_grads(
                rows, live, gscratch, slot, bs, be, trans, a_dot,
                px, py, ox, oy, basis, g_rgb, g_trans, out_trans,
                gdot_out, cfg,
            )
        @pl.when(boundary)
        def _():
            get_gprev_dma(ci).wait()
            gscratch[slot, :, :] = gscratch[slot, :, :] + gprev_scratch[:, :]

        put_dma(ci).start()
        return ci + 1, trans, a_dot

    init = (0, jnp.ones((p, 1), jnp.float32), jnp.zeros((p, 1), jnp.float32))
    ci, _, _ = jax.lax.while_loop(cond, body, init)

    @pl.when(ci < num_chunks)
    def _():
        get_dma(jax.lax.rem(ci, N_BUF), ci).wait()

    # start the next tile's first chunk; all this tile's gets have drained
    @pl.when(t + 1 < nt)
    def _():
        nstart = starts_ref[t + 1]
        nend = nstart + counts_ref[t + 1]

        @pl.when(nend > nstart)
        def _():
            get_dma(
                0, 0,
                tile_base=(nstart // SEGMENT_ALIGN) * SEGMENT_ALIGN,
            ).start()

    # drain the (up to N_BUF) outstanding gradient puts before the next
    # grid step: its boundary RMW may read blocks this tile just wrote
    for k in range(N_BUF):
        @pl.when(ci >= k + 1)
        def _(k=k):
            put_dma(ci - 1 - k).wait()


@functools.partial(
    jax.jit, static_argnames=("cfg", "local_rows", "row_stride")
)
def blend_bwd_pallas(
    table, starts, counts, row_offset, g_rgb, g_trans, out_rgb, out_trans,
    cfg: RenderConfig, local_rows: int | None = None, row_stride: int = 1,
):
    """table (Dpad, 16) row-major; returns g_table (Dpad, 16)."""
    return blend_bwd_pallas_soa(
        table.T, starts, counts, row_offset, g_rgb, g_trans, out_rgb,
        out_trans, cfg, local_rows, row_stride,
    ).T


@functools.partial(
    jax.jit, static_argnames=("cfg", "local_rows", "row_stride")
)
def blend_bwd_pallas_soa(
    table_soa, starts, counts, row_offset, g_rgb, g_trans, out_rgb,
    out_trans, cfg: RenderConfig, local_rows: int | None = None,
    row_stride: int = 1,
):
    """Attribute-major variant: table_soa (16, Dpad) in, g (16, Dpad) out
    (the kernel's native layouts; no transposes)."""
    p = cfg.tile_size * cfg.tile_size
    if local_rows is None:
        local_rows = cfg.tiles_y
    num_tiles = local_rows * cfg.tiles_x
    dpad = table_soa.shape[1]

    g_packed = jnp.concatenate([g_rgb, g_trans[..., None]], axis=-1)
    out_packed = jnp.concatenate([out_rgb, out_trans[..., None]], axis=-1)
    gtable_zero = jnp.zeros((TABLE_WIDTH, dpad), jnp.float32)

    rowoff = jnp.asarray(row_offset, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, p, 4), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, p, 4), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, TABLE_WIDTH, CHUNK), jnp.float32),
            pltpu.VMEM((N_BUF, TABLE_WIDTH, CHUNK), jnp.float32),
            pltpu.VMEM((TABLE_WIDTH, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
            pltpu.SemaphoreType.DMA((N_BUF,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, row_stride=row_stride),
        out_shape=jax.ShapeDtypeStruct((TABLE_WIDTH, dpad), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={6: 0},  # zeros input -> output buffer
        interpret=(jax.default_backend() == "cpu"),
    )(starts, counts, rowoff, g_packed, out_packed, table_soa, gtable_zero)
