"""Pallas TPU kernel: fused tile-blend backward pass.

Implements the gradient semantics documented in ops/blend.py (the
diff-gaussian-rasterization backward the reference links but never runs,
renderer_cuda.py:214) as a BACK-TO-FRONT re-traversal: no per-splat
residuals are stored — each tile streams its splat rows in reverse chunk
order, recomputes alpha, and emits per-row gradients for (center, conic,
opacity, color).

Back-to-front (vs the earlier front-to-back formulation) is the CUDA
reference's own traversal order, and it exists for a numerical reason:
dL/da_i needs the STRICT SUFFIX sum S_i = sum_{j>i} w_j (g.c_j).  Computed
front-to-back that is gdot_out - prefix_i — a subtraction of two
near-equal accumulations whose ABSOLUTE error (~1e-5 |gdot_out|) does not
shrink for late splats even though S_i -> 0, and whose noise was the
dominant term in the xyz gradient deviation (PARITY.md: 4.3e-3 relative,
amplified ~30x by the moment recombination).  Traversed back-to-front the
suffix accumulates FROM ZERO, so its error stays relative to S_i itself.

Reverse traversal needs each block's entering transmittance without
running the forward chain — the forward kernel (tile_raster_fwd.py, train
variant) stores exactly that: a per-128-block checkpoint of the entering
transmittance (bit-identical to the forward's own carry) plus a per-tile
processed-chunk count, so fwd and bwd agree exactly on t_i AND on which
chunks the early-stop skipped.  Within a block the per-lane prefix product
is recomputed with the same 2-pass log-domain triangular matmul as the
forward (bit-identical results).

Layout mirrors the forward kernel: pixels on sublanes, splats on lanes,
attribute-major (16, Dpad) table, lane-aligned chunk DMAs.  Each table row
belongs to exactly one tile, so gradient rows are pure writes — no
atomics, no collisions.  The output buffer is zero-initialized through
input/output aliasing so rows of chunks skipped by the transmittance
early-stop (which contributed nothing in the forward) keep exactly zero
gradient.
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
BLOCKS = CHUNK // SCAN_BLOCK


def _suffix_sum_strict(x: jnp.ndarray, exact: bool = False) -> jnp.ndarray:
    """Strict suffix sum along axis 1 as ONE triangular matmul on the MXU:
    out[:, i] = sum_{j > i} x[:, j].  2-pass f32 split: per-term error
    <= 2^-18 |x_j|, so the suffix error is <= 2^-18 * sum_j |u_j| — an
    order below the front-to-back cancellation noise the r3 back-to-front
    rework eliminated (~1e-5 |gdot|), and hardware-verified within the
    PARITY_TPU budgets (r4: xyz rel_p99 unchanged at ~1.3e-4 vs the
    3-pass split).  exact=True (interpret/CPU) uses one plain f32 pass."""
    s = x.shape[1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    tri_suf = (ri > ci).astype(jnp.float32)  # [j, i] = 1 iff j > i
    return _tri_matmul_f32(x, tri_suf, passes=1 if exact else 2)


def _block_grads(
    rows, live, gscratch, slot, bs, be, t_block, suffix,
    px, py, ox, oy, basis, g_rgb, gto,
    cfg: RenderConfig, exact_scan: bool, carry_id: bool = False,
):
    """Gradient math for one (16, SCAN_BLOCK) block: recompute the forward
    alpha, emit per-row gradients into gscratch[slot, :, bs:be], and return
    the updated suffix carry.

    rows: (16, S) attribute block; live: (1, S); t_block: (P, 1) the
    block's ENTERING transmittance (forward checkpoint); suffix: (P, 1)
    sum of w_j (g.c_j) over all splats AFTER this block; gto: (P, 1) the
    tile-constant g_trans * out_trans (folded into the suffix division so
    dl_da costs ONE (P, S) divide instead of two).
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
    # t_block is the forward's exact carry and the prefix uses the same
    # 2-pass log-domain matmul, so t_i matches the forward up to ONE
    # rounding of the coordinate-frame shift: the forward computes
    # dx = px - cx in the global frame while this recompute uses the
    # tile-local (px-ox) - (cx-ox); the ulp-level difference can flip a
    # fragment sitting exactly on the alpha_min / in_rect cutoffs (a
    # discrete, alpha_min-bounded event — see scripts/tpu_gradcheck.py)
    prefix = _exclusive_cumprod_lanes(one_m, exact=exact_scan)
    t_i = prefix * t_block  # (P, S)
    w = alpha * t_i

    # g . c_i as exact-f32 VPU broadcasts (k=3; a DEFAULT dot_general is
    # one bf16 MXU pass — 0.4% error straight into dl_da)
    g_dot_c = (
        g_rgb[:, 0:1] * colors[0:1, :]
        + g_rgb[:, 1:2] * colors[1:2, :]
        + g_rgb[:, 2:3] * colors[2:3, :]
    )  # (P, S)
    u = w * g_dot_c
    # S_i accumulated FROM ZERO back-to-front: strict in-block suffix +
    # the carry from all later blocks.  No gdot_out subtraction.
    suf_in = _suffix_sum_strict(u, exact=exact_scan)
    s_i = suf_in + suffix  # (P, S)

    one_m_safe = jnp.maximum(one_m, 1.0 - cfg.alpha_clamp)
    # dL/da_i = t_i (g.c_i) - (S_i + g_T T_fin) / (1 - a_i): the g_T term
    # rides inside the suffix division (gto is tile-constant), one (P, S)
    # divide total
    dl_da = t_i * g_dot_c - (s_i + gto) / one_m_safe
    dl_da = jnp.where(alpha > 0.0, dl_da, 0.0)

    zeros_blk = jnp.zeros((TABLE_WIDTH, SCAN_BLOCK), jnp.float32)
    def color_grad(weights):
        # per-channel sublane reductions (exact f32; measured r4: the
        # (3,P)@(P,S) HIGHEST matmul variant was a net loss)
        return jnp.concatenate(
            [
                jnp.sum(weights * g_rgb[:, c : c + 1], axis=0,
                        keepdims=True)
                for c in range(3)
            ],
            axis=0,
        )  # (3, S)

    if mode in (
        RenderMode.BILLBOARD,
        RenderMode.FLAT_BALL,
        RenderMode.GAUSSIAN_BALL,
    ):
        w_c = w * gauss if mode == RenderMode.GAUSSIAN_BALL else w
        g_col = color_grad(w_c)
        gscratch[slot, :, bs:be] = zeros_blk
        gscratch[slot, b.COL_R : b.COL_BCH + 1, bs:be] = g_col
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
        g_col = color_grad(w)

        gscratch[slot, :, bs:be] = zeros_blk
        gscratch[slot, b.COL_CX : b.COL_CX + 1, bs:be] = g_cx
        gscratch[slot, b.COL_CY : b.COL_CY + 1, bs:be] = g_cy
        gscratch[slot, b.COL_A : b.COL_A + 1, bs:be] = g_ca
        gscratch[slot, b.COL_B : b.COL_B + 1, bs:be] = g_cb
        gscratch[slot, b.COL_C : b.COL_C + 1, bs:be] = g_cc
        gscratch[slot, b.COL_OPACITY : b.COL_OPACITY + 1, bs:be] = g_op
        gscratch[slot, b.COL_R : b.COL_BCH + 1, bs:be] = g_col

    if carry_id:
        # fused path: the owning splat id rides in the table's COL_COUNT
        # row (set by ops/fused.py before the gather); copying it beside
        # the gradients lets the fold group rows by splat with no
        # position bookkeeping.  Dead lanes carry a neighbor's id with
        # zero gradient — harmless in the fold.
        gscratch[slot, b.COL_COUNT : b.COL_COUNT + 1, bs:be] = rows[
            b.COL_COUNT : b.COL_COUNT + 1, :
        ]

    # full-block total of u rides out as the next (earlier) block's carry:
    # suf_in[:, 0] + u[:, 0] is the INCLUSIVE block suffix at lane 0
    return suffix + suf_in[:, 0:1] + u[:, 0:1]


def _bwd_kernel(
    starts_ref,  # scalar prefetch (T+1,)
    counts_ref,  # scalar prefetch (T,)
    nproc_ref,  # scalar prefetch (T,): forward's processed-chunk counts
    *rest,
    cfg: RenderConfig,
    row_stride: int = 1,
    exact_scan: bool = False,
    fused: bool = False,
):
    """Classic layout (fused=False), remaining refs:
      rowoff_ref (1,) prefetch; g_ref (1,P,4) VMEM [g_rgb | g_trans];
      out_res_ref (1,P,1) VMEM forward transmittance; table_ref ANY
      (16,Dpad); ckpt_ref ANY (2,Dpad) entering-transmittance
      checkpoints; gtable_init_ref ANY zeros aliased to gtable_ref ANY
      (16,Dpad) output; scratch (N_BUF,16,CHUNK); ckscratch
      (N_BUF,2,CHUNK); gscratch (N_BUF,16,CHUNK); gprev_scratch
      (16,CHUNK) boundary RMW accumulator; sems/cksems/out_sems/prev_sem.

    Fused layout (fused=True, the super-op's compact path): adds
      goff_ref (T,) prefetch — per-tile CHUNK-aligned offsets into the
      compact row-major gradient buffer (exclusive cumsum of
      nproc*CHUNK; tiles are write-EXCLUSIVE so the boundary RMW
      machinery is deleted); aux_ref (1,P,2) VMEM — [:, 0] the backward
      suffix carry entering this tile from later blend passes (pass 1
      receives g . rgb_residual), [:, 1] the tile's entering
      transmittance (1.0 for pass 1, the pass-1 exit for the residual
      pass); gtable stays ATTRIBUTE-major but compact, (16, G) — the id
      fold transposes it once in XLA (measured free, ~0.4 ms per 64M
      elements) before gathering rows; narrow-minor (CHUNK, 16) VMEM
      staging does not lower in Mosaic (lane tiling is 128).
      gprev/prev_sem dropped (tiles are write-exclusive).
    """
    if fused:
        (goff_ref, rowoff_ref, g_ref, out_res_ref, aux_ref, table_ref,
         ckpt_ref, gtable_init_ref, gtable_ref, scratch, ckscratch,
         gscratch, sems, cksems, out_sems) = rest
    else:
        (rowoff_ref, g_ref, out_res_ref, table_ref, ckpt_ref,
         gtable_init_ref, gtable_ref, scratch, ckscratch, gscratch,
         gprev_scratch, sems, cksems, out_sems, prev_sem) = rest
    del gtable_init_ref
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    p = cfg.tile_size * cfg.tile_size
    start = starts_ref[t]
    end = start + counts_ref[t]
    base = (start // SEGMENT_ALIGN) * SEGMENT_ALIGN  # aligned window start
    num_chunks = jnp.where(end > start, pl.cdiv(end - base, CHUNK), 0)
    nproc = jnp.minimum(nproc_ref[t], num_chunks)
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
    out_trans = out_res_ref[0, :, 0:1]  # (P, 1)
    gto = g_trans * out_trans  # tile-constant, see _block_grads

    # reverse iteration: step k processes chunk ci = nproc - 1 - k;
    # DMA slots are indexed by k so consecutive steps alternate buffers
    def chunk_of(k):
        return nproc - 1 - k

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

    def get_ck(slot, chunk_idx, tile_base=None):
        # entering transmittance of the chunk's blocks lives at the
        # chunk's own column window of the (2, Dpad) checkpoint buffer
        # (tile_raster_fwd.ckpt_put)
        offset = pl.multiple_of(
            (base if tile_base is None else tile_base) + chunk_idx * CHUNK,
            SEGMENT_ALIGN,
        )
        return pltpu.make_async_copy(
            ckpt_ref.at[:, pl.ds(offset, CHUNK)],
            ckscratch.at[slot],
            cksems.at[slot],
        )

    if not fused:

        def get_gprev_dma(chunk_idx):
            # adjacent tiles share boundary blocks of the compact layout,
            # so gradient writes are read-modify-write (the grid is
            # sequential on a single TensorCore; the already-completed
            # neighbor's write — or the zero initialization — is what
            # gets accumulated)
            offset = pl.multiple_of(base + chunk_idx * CHUNK, SEGMENT_ALIGN)
            return pltpu.make_async_copy(
                gtable_ref.at[:, pl.ds(offset, CHUNK)],
                gprev_scratch,
                prev_sem,
            )

    def put_dma(k_step):
        # double-buffered: the put for step k streams from the slot
        # k % N_BUF staging buffer while step k+1 computes into the other
        slot = jax.lax.rem(k_step, N_BUF)
        if fused:
            # write-exclusive compact region [goff[t], goff[t] +
            # nproc*CHUNK) along the column axis; chunk ci lands at
            # goff[t] + ci*CHUNK (goff entries are CHUNK multiples)
            offset = pl.multiple_of(
                goff_ref[t] + chunk_of(k_step) * CHUNK, CHUNK
            )
            return pltpu.make_async_copy(
                gscratch.at[slot],
                gtable_ref.at[:, pl.ds(offset, CHUNK)],
                out_sems.at[slot],
            )
        offset = pl.multiple_of(
            base + chunk_of(k_step) * CHUNK, SEGMENT_ALIGN
        )
        return pltpu.make_async_copy(
            gscratch.at[slot],
            gtable_ref.at[:, pl.ds(offset, CHUNK)],
            out_sems.at[slot],
        )

    # cross-tile prefetch (mirrors tile_raster_fwd): the previous grid step
    # started this tile's LAST processed chunk into slot 0; only tile 0
    # starts cold
    @pl.when((t == 0) & (nproc > 0))
    def _():
        get_dma(0, chunk_of(0)).start()
        get_ck(0, chunk_of(0)).start()

    def cond(state):
        k, suffix = state
        return k < nproc

    def body(state):
        k, suffix = state
        ci = chunk_of(k)
        slot = jax.lax.rem(k, N_BUF)
        next_slot = jax.lax.rem(k + 1, N_BUF)

        @pl.when(k + 1 < nproc)
        def _():
            get_dma(next_slot, ci - 1).start()
            get_ck(next_slot, ci - 1).start()

        get_dma(slot, ci).wait()
        get_ck(slot, ci).wait()
        # reclaim this gscratch slot: its previous put (step k - N_BUF)
        # must have drained before we overwrite the staging buffer
        @pl.when(k >= N_BUF)
        def _():
            put_dma(k - N_BUF).wait()

        if not fused:
            # only the first/last chunk of a tile can share its 128-block
            # with a neighboring tile; interior chunks are exclusively
            # owned, so the read-modify-write accumulate is confined to
            # the boundaries
            boundary = ((ci == 0) & (start > base)) | (
                (ci == num_chunks - 1) & (end < base + num_chunks * CHUNK)
            )

            @pl.when(boundary)
            def _():
                get_gprev_dma(ci).start()

        rows_chunk = scratch[slot]  # (16, CHUNK)
        # blocks processed in REVERSE within the chunk; each block's
        # entering transmittance comes from its forward checkpoint (no
        # within-chunk chaining), only the suffix carries backward
        for bi in reversed(range(BLOCKS)):
            bs = bi * SCAN_BLOCK
            be = bs + SCAN_BLOCK
            rows = rows_chunk[:, bs:be]  # (16, S)
            col = base + ci * CHUNK + bs + jax.lax.broadcasted_iota(
                jnp.int32, (1, SCAN_BLOCK), 1
            )
            live = (col >= start) & (col < end)
            # the tile's very first block has entering transmittance 1.0
            # and no stored checkpoint (tile_raster_fwd.ckpt_put)
            # (2, 128) checkpoint window -> (P, 1) pixel column; Mosaic
            # lowers the (1,128)->(128,1) transposes but not the direct
            # (2,128)->(256,1) reshape
            ck = ckscratch[slot, :, bs:be].reshape(
                p // SCAN_BLOCK, SCAN_BLOCK
            )
            t_block = jnp.concatenate(
                [ck[j : j + 1, :].T for j in range(p // SCAN_BLOCK)],
                axis=0,
            )
            if bi == 0:
                # the tile's very first block has no stored checkpoint:
                # its entering transmittance is 1.0 (or the seeded value
                # of the fused residual pass)
                t_block = jnp.where(ci == 0, t_entry, t_block)
            suffix = _block_grads(
                rows, live, gscratch, slot, bs, be, t_block, suffix,
                px, py, ox, oy, basis, g_rgb, gto, cfg, exact_scan,
                carry_id=fused,
            )
        if not fused:
            @pl.when(boundary)
            def _():
                get_gprev_dma(ci).wait()
                gscratch[slot, :, :] = (
                    gscratch[slot, :, :] + gprev_scratch[:, :]
                )

        put_dma(k).start()
        return k + 1, suffix

    if fused:
        suffix0 = aux_ref[0, :, 0:1]
        t_entry = aux_ref[0, :, 1:2]
    else:
        suffix0 = jnp.zeros((p, 1), jnp.float32)
        t_entry = jnp.float32(1.0)
    init = (0, suffix0)
    k_fin, _ = jax.lax.while_loop(cond, body, init)

    # start the next tile's last processed chunk; all this tile's gets
    # have drained (each step waits its own)
    @pl.when(t + 1 < nt)
    def _():
        nstart = starts_ref[t + 1]
        nend = nstart + counts_ref[t + 1]
        nbase = (nstart // SEGMENT_ALIGN) * SEGMENT_ALIGN
        n_nc = jnp.where(nend > nstart, pl.cdiv(nend - nbase, CHUNK), 0)
        n_np = jnp.minimum(nproc_ref[t + 1], n_nc)

        @pl.when(n_np > 0)
        def _():
            get_dma(0, n_np - 1, tile_base=nbase).start()
            get_ck(0, n_np - 1, tile_base=nbase).start()

    # drain the (up to N_BUF) outstanding gradient puts before the next
    # grid step: its boundary RMW may read blocks this tile just wrote
    for k in range(N_BUF):
        @pl.when(k_fin >= k + 1)
        def _(k=k):
            put_dma(k_fin - 1 - k).wait()


@functools.partial(
    jax.jit, static_argnames=("cfg", "local_rows", "row_stride")
)
def blend_bwd_pallas(
    table, starts, counts, nproc, ckpt, row_offset, g_rgb, g_trans,
    out_trans, cfg: RenderConfig, local_rows: int | None = None,
    row_stride: int = 1,
):
    """table (Dpad, 16) row-major; returns g_table (Dpad, 16).  nproc and
    ckpt are the forward train variant's residuals
    (tile_raster_fwd.rasterize_binned_pallas_train)."""
    return blend_bwd_pallas_soa(
        table.T, starts, counts, nproc, ckpt, row_offset, g_rgb, g_trans,
        out_trans, cfg, local_rows, row_stride,
    ).T


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "local_rows", "row_stride", "grad_rows"),
)
def blend_bwd_fused(
    table_soa, starts, counts, nproc, goff, ckpt, row_offset, g_rgb,
    g_trans, out_trans, suffix_init, t_entry, grad_rows: int,
    cfg: RenderConfig, local_rows: int | None = None, row_stride: int = 1,
):
    """Fused compact backward: gradients land at CHUNK-aligned compacted
    COLUMN offsets ``goff`` (T,) — write-exclusive per tile — in a
    (16, grad_rows) attribute-major buffer whose COL_COUNT row carries
    the owning splat id (for ops/fold.fold_rows_by_id).  suffix_init
    (T, P) seeds the backward suffix carry (pass 1 receives
    g . rgb_residual); t_entry (T, P) the tile's entering transmittance
    (ones for pass 1).

    The caller must pre-clamp nproc to 0 for tiles whose region exceeds
    ``grad_rows`` (they lose their gradients for the step — count them in
    the grad_overflow diagnostic and retune)."""
    p = cfg.tile_size * cfg.tile_size
    if local_rows is None:
        local_rows = cfg.tiles_y
    num_tiles = local_rows * cfg.tiles_x
    interpret = jax.default_backend() == "cpu"
    assert grad_rows % CHUNK == 0

    g_packed = jnp.concatenate([g_rgb, g_trans[..., None]], axis=-1)
    out_packed = out_trans[..., None]
    aux = jnp.stack([suffix_init, t_entry], axis=-1)  # (T, P, 2)
    gtable_zero = jnp.zeros((TABLE_WIDTH, grad_rows), jnp.float32)

    rowoff = jnp.asarray(row_offset, jnp.int32).reshape(1)
    nproc = nproc.astype(jnp.int32).reshape(-1)
    goff = goff.astype(jnp.int32).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, p, 4), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, p, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, p, 2), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, TABLE_WIDTH, CHUNK), jnp.float32),
            pltpu.VMEM((N_BUF, p // SCAN_BLOCK, CHUNK), jnp.float32),
            pltpu.VMEM((N_BUF, TABLE_WIDTH, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
            pltpu.SemaphoreType.DMA((N_BUF,)),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
    )

    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, cfg=cfg, row_stride=row_stride,
            exact_scan=interpret, fused=True,
        ),
        out_shape=jax.ShapeDtypeStruct((TABLE_WIDTH, grad_rows), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={10: 0},  # zeros input -> output buffer
        interpret=interpret,
    )(
        starts, counts, nproc, goff, rowoff, g_packed, out_packed, aux,
        table_soa, ckpt, gtable_zero,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "local_rows", "row_stride")
)
def blend_bwd_pallas_soa(
    table_soa, starts, counts, nproc, ckpt, row_offset, g_rgb, g_trans,
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
    interpret = jax.default_backend() == "cpu"

    g_packed = jnp.concatenate([g_rgb, g_trans[..., None]], axis=-1)
    out_packed = out_trans[..., None]
    gtable_zero = jnp.zeros((TABLE_WIDTH, dpad), jnp.float32)

    rowoff = jnp.asarray(row_offset, jnp.int32).reshape(1)
    nproc = nproc.astype(jnp.int32).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, p, 4), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, p, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, TABLE_WIDTH, CHUNK), jnp.float32),
            pltpu.VMEM((N_BUF, p // SCAN_BLOCK, CHUNK), jnp.float32),
            pltpu.VMEM((N_BUF, TABLE_WIDTH, CHUNK), jnp.float32),
            pltpu.VMEM((TABLE_WIDTH, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
            pltpu.SemaphoreType.DMA((N_BUF,)),
            pltpu.SemaphoreType.DMA((N_BUF,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, cfg=cfg, row_stride=row_stride,
            exact_scan=interpret,
        ),
        out_shape=jax.ShapeDtypeStruct((TABLE_WIDTH, dpad), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={8: 0},  # zeros input -> output buffer
        interpret=interpret,
    )(
        starts, counts, nproc, rowoff, g_packed, out_packed, table_soa,
        ckpt, gtable_zero,
    )
