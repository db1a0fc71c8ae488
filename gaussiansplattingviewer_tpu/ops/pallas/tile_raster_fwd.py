"""Pallas TPU kernel: per-tile front-to-back alpha-blend forward pass.

The TPU-native replacement for the reference's per-fragment GL blend
(shaders/gau_frag.glsl + fixed-function SRC_ALPHA blending,
renderer_ogl.py:128-130) and for the CUDA library's one-thread-block-per-tile
rasterization loop (SURVEY.md §3.4).

Data layout is chosen for Mosaic's tiling rules (pallas_guide.md):
  * the splat table is streamed ATTRIBUTE-MAJOR — shape (16, Dpad) — and
    binning pads every tile segment to SEGMENT_ALIGN=128 splats, so each
    chunk DMA is a fully lane-aligned (16, 128) block (arbitrary per-splat
    offsets cannot be sliced on TPU);
  * inside the kernel, pixels live on SUBLANES and splats on LANES: a chunk
    computes a (256 px, 128 splat) alpha block with pure broadcasts — no
    transposes anywhere in the hot loop;
  * order-dependent compositing is factorized with an exclusive prefix
    product along the splat lanes (masked Hillis-Steele scan of 7 VPU
    multiplies — cumprod has no TPU lowering);
  * the color accumulation is a (256,128) x (128,3) matmul on the MXU;
  * chunks are double-buffered (DMA chunk i+1 in flight while chunk i
    blends) and the loop exits early once the tile's max transmittance
    drops below cfg.early_stop_transmittance (the CUDA rasterizer's T<1e-4
    termination).
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

# splats per inner iteration; windows stay SEGMENT_ALIGN-aligned (the
# compact table's guarantee) and binning's TABLE_PAD keeps the last
# window in bounds.  Each chunk is processed as CHUNK // SCAN_BLOCK
# sequential 128-lane blend blocks: the prefix-product matmul cost is
# O(S^2) in the scan width, so the scans stay at 128 lanes while the
# DMA/loop granularity is wider (see binning.KERNEL_CHUNK).
CHUNK = KERNEL_CHUNK
N_BUF = 2  # double buffering

# The train variant's SHIFTED checkpoint puts (ckpt_put below) write at
# base + ci*CHUNK + SCAN_BLOCK with extent CHUNK, so the LAST put of a
# segment can extend up to CHUNK + SCAN_BLOCK - 1 columns past the
# segment end — binning's physical tail padding must cover that.
assert binning.TABLE_PAD >= KERNEL_CHUNK + SCAN_BLOCK, (
    "TABLE_PAD must cover the shifted checkpoint put "
    "(ckpt_put writes at +SCAN_BLOCK with CHUNK extent)"
)


def _tri_matmul_f32(
    x: jnp.ndarray, tri: jnp.ndarray, passes: int = 3
) -> jnp.ndarray:
    """x @ tri at near-f32 accuracy in ``passes`` MXU passes instead of
    HIGHEST's 6.

    ``tri`` is a 0/1 mask — EXACT in bf16 — so only ``x`` needs splitting:
    x = hi + mid (+ lo) with each term bf16-exact captures ~16 (~24)
    mantissa bits, and the split @ tri is ``passes`` DEFAULT-precision
    (1-pass bf16) matmuls whose f32 accumulation is exact per pass.  Mosaic
    lowers only DEFAULT and HIGHEST dot precisions, so this hand-rolled
    split is the only way to get f32-accurate triangular scans at a
    fraction of the MXU cost.

    passes=2 drops the ``lo`` term: per-element error <= 2^-18 |x_i|.  For
    SAME-SIGN rows (the log-domain transmittance scan: all logs <= 0) the
    row-sum error is therefore <= 2^-18 |row sum| (relative).  The
    gradient suffix sums (tile_raster_bwd._suffix_sum_strict) ALSO use 2
    passes: there terms can cancel, so the bound is only ABSOLUTE
    (2^-18 * sum_j |u_j|), but that is still an order below the
    front-to-back cancellation noise the back-to-front rework removed and
    was hardware-verified inside the PARITY_TPU budgets (r4: xyz rel_p99
    unchanged vs the 3-pass split).  Use 3 passes only where a tighter
    absolute bound is ever needed.

    passes=1 is plain bf16 — only for interpret/CPU where DEFAULT dot is
    exact f32."""

    def mm(a):
        return jax.lax.dot_general(
            a,
            tri,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if passes == 1:
        return mm(x)
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    rem = x - hi
    mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
    if passes == 2:
        return mm(hi) + mm(mid)
    lo = rem - mid
    return mm(hi) + mm(mid) + mm(lo)


def _exclusive_cumprod_lanes(
    x: jnp.ndarray, exact: bool = False
) -> jnp.ndarray:
    """Exclusive prefix product along axis 1 (the splat/lane axis).

    cumprod has no Pallas TPU lowering, and the roll-based Hillis-Steele
    scan (7 x roll/select/multiply on the full block) was ~60% of the
    kernel's VPU work.  Instead: go to log domain and compute the exclusive
    prefix SUM as ONE triangular matmul on the MXU —
    prefix_i = exp(sum_{j<i} log x_j).  x is a transmittance factor in
    [0, 1]; zeros (alpha == 1 in the ball/billboard modes) are clamped to
    exp(-80) so the matmul never sees -inf (0 * -inf = NaN), and exp()
    flushes the result back to exactly the right 0.

    The logs are all <= 0 (same sign), so the 2-pass split matmul bounds
    the prefix-sum error by 2^-18 of the prefix itself: for any pixel
    above the 1e-4 early-stop the |log prefix| is <= ~9.2, i.e. the
    transmittance is exact to ~7e-5 relative — far below the 5e-3
    TPU-vs-oracle parity budget (PARITY.md), at 2/3 the MXU cost of the
    3-pass split.  ``exact=True`` (interpret/CPU paths, where DEFAULT dot
    precision is already exact f32) uses one plain pass so CPU tests pin
    exact-f32 semantics."""
    s = x.shape[1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    tri_excl = (ri < ci).astype(jnp.float32)  # [j, i] = 1 iff j < i
    logs = jnp.maximum(jnp.log(jnp.maximum(x, 1e-35)), -80.0)
    return jnp.exp(
        _tri_matmul_f32(logs, tri_excl, passes=1 if exact else 2)
    )


def _chunk_blend(rows, px, py, rgb, trans, live, cfg: RenderConfig,
                 exact_scan: bool = False):
    """Blend one (16, 128) attribute chunk into the tile accumulators.

    rows: (16, 128) — attribute-major chunk (row j = attribute j of 128
      splats); px/py: (P, 1) pixel-center coords; rgb: (P, 3);
      trans: (P, 1); live: (1, 128) bool.
    Math identical to raster_jnp.splat_alpha_color (gau_frag.glsl:13-38)
    + the exclusive-prefix transmittance factorization.
    """
    b = binning
    cx = rows[b.COL_CX : b.COL_CX + 1, :]  # (1, S)
    cy = rows[b.COL_CY : b.COL_CY + 1, :]
    ca = rows[b.COL_A : b.COL_A + 1, :]
    cb = rows[b.COL_B : b.COL_B + 1, :]
    cc = rows[b.COL_C : b.COL_C + 1, :]
    opacity = rows[b.COL_OPACITY : b.COL_OPACITY + 1, :]
    rx = rows[b.COL_RX : b.COL_RX + 1, :]
    ry = rows[b.COL_RY : b.COL_RY + 1, :]
    colors = rows[b.COL_R : b.COL_BCH + 1, :]  # (3, S)

    dx = px - cx  # (P, S)
    dy = py - cy
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    in_rect = (jnp.abs(dx) <= rx) & (jnp.abs(dy) <= ry) & live

    mode = int(cfg.mode)
    if mode == RenderMode.BILLBOARD:
        alpha = jnp.where(in_rect, 1.0, 0.0)
        gauss = None
    else:
        gauss = jnp.exp(power)
        alpha = jnp.minimum(cfg.alpha_clamp, opacity * gauss)
        keep = in_rect & (power <= 0.0) & (alpha >= cfg.alpha_min)
        alpha = jnp.where(keep, alpha, 0.0)
        if mode in (RenderMode.FLAT_BALL, RenderMode.GAUSSIAN_BALL):
            alpha = jnp.where(keep & (alpha > cfg.ball_threshold), 1.0, 0.0)

    one_m = 1.0 - alpha  # (P, S)
    prefix = _exclusive_cumprod_lanes(one_m, exact=exact_scan)
    w = alpha * prefix * trans  # absolute blend weights

    # per-fragment darkening of GAUSSIAN_BALL (gau_frag.glsl:37) folds into
    # the weights; color itself is per-splat
    w_c = w * gauss if mode == RenderMode.GAUSSIAN_BALL else w
    # per-channel lane reductions on the VPU: exact f32 (a DEFAULT-precision
    # dot_general is one bf16 MXU pass — a 0.4% color error — and HIGHEST
    # costs 6 passes; measured r4: the (P,S)@(S,3) HIGHEST matmul + block
    # transposes were a NET LOSS, +6 ms/frame vs these reductions)
    rgb = rgb + jnp.concatenate(
        [
            jnp.sum(w_c * colors[c : c + 1, :], axis=1, keepdims=True)
            for c in range(3)
        ],
        axis=1,
    )
    trans = trans * prefix[:, -1:] * one_m[:, -1:]
    return rgb, trans


def _fwd_kernel(
    starts_ref,  # scalar prefetch: (T+1,) i32 (padded segment starts)
    counts_ref,  # scalar prefetch: (T,) i32 (live rows per tile)
    rowoff_ref,  # scalar prefetch: (1,) i32 tile-row offset of this shard
    table_ref,  # HBM/ANY: (16, Dpad) f32, attribute-major
    *rest,  # [tinit_ref if seeded], out_ref, [nproc_ref, ckpt_ref], scratch
    cfg: RenderConfig,
    row_stride: int = 1,
    with_ckpt: bool = False,
    exact_scan: bool = False,
    seeded: bool = False,
):
    if seeded:
        # per-tile ENTERING transmittance (the residual pass of the fused
        # prefix path, ops/fused.py: pass 2 continues each tile from
        # pass 1's exit transmittance — exact by compositional
        # associativity; rgb still accumulates from zero, the caller adds)
        tinit_ref, *rest = rest
    out_ref, *rest = rest
    if with_ckpt:
        # nproc: (T,) i32 SMEM processed-chunk counts; ckpt: (2, Dpad) f32
        # per-128-block ENTERING transmittance (stored at the block's OWN
        # column window, (P,1) carry relaid out as (2, 128)) — the backward
        # kernel reads these to traverse back-to-front without recomputing
        # the forward transmittance chain (and without the gdot_out -
        # prefix cancellation, see tile_raster_bwd.py).  Column-window
        # storage keeps every checkpoint DMA lane-aligned (Mosaic bans
        # unaligned slices along tiled dims).
        (nproc_ref, ckpt_ref, scratch, sems, ckpt_scr, ckpt_sems) = rest
    else:
        (scratch, sems) = rest
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    p = cfg.tile_size * cfg.tile_size
    start = starts_ref[t]
    end = start + counts_ref[t]
    # segments are compact: stream lane-ALIGNED windows around the segment
    # and mask rows outside [start, end)
    base = (start // SEGMENT_ALIGN) * SEGMENT_ALIGN
    num_chunks = jnp.where(end > start, pl.cdiv(end - base, CHUNK), 0)

    # pixel-center coordinates of this tile's block, pixels on sublanes
    ts = cfg.tile_size
    tx = (t % cfg.tiles_x).astype(jnp.float32)
    ty = ((t // cfg.tiles_x) * row_stride + rowoff_ref[0]).astype(
        jnp.float32
    )
    local = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = tx * ts + jax.lax.rem(local, ts).astype(jnp.float32) + 0.5
    py = ty * ts + jax.lax.div(local, ts).astype(jnp.float32) + 0.5

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

    if with_ckpt:

        def ckpt_put(slot, chunk_idx):
            # ckpt columns [128b, 128b+128) hold the transmittance ENTERING
            # flat 128-block b, but each block WRITES its EXITING
            # transmittance at block b+1's columns — the shift means a tile
            # never writes its own first block's window (entering value
            # 1.0; the backward substitutes it), which is critical:
            # adjacent tiles share boundary 128-blocks, and the unshifted
            # scheme had a later tile's first-block write CLOBBER the
            # previous tile's live interior checkpoint.  With the shift,
            # tile B's writes start at column base_B + 128 > end_A - 1 =
            # tile A's last LIVE column, so only dead overhang windows can
            # collide (read under an all-false live mask -> zero gradient
            # regardless).
            offset = pl.multiple_of(
                base + chunk_idx * CHUNK + SCAN_BLOCK, SEGMENT_ALIGN
            )
            return pltpu.make_async_copy(
                ckpt_scr.at[slot],
                ckpt_ref.at[:, pl.ds(offset, CHUNK)],
                ckpt_sems.at[slot],
            )

    # cross-tile prefetch: every grid step starts the NEXT tile's chunk 0
    # into slot 0 before exiting (scratch and semaphores persist across the
    # sequential TPU grid), so a tile's first DMA is cold only at t == 0 —
    # the wait below then matches the copy its predecessor issued.
    @pl.when((t == 0) & (num_chunks > 0))
    def _():
        get_dma(0, 0).start()

    def cond(state):
        ci, rgb, trans = state
        return (ci < num_chunks) & (
            jnp.max(trans) > cfg.early_stop_transmittance
        )

    def body(state):
        ci, rgb, trans = state
        slot = jax.lax.rem(ci, N_BUF)
        next_slot = jax.lax.rem(ci + 1, N_BUF)

        @pl.when(ci + 1 < num_chunks)
        def _():
            get_dma(next_slot, ci + 1).start()

        get_dma(slot, ci).wait()
        if with_ckpt:
            # reclaim this ckpt staging slot (its put started N_BUF ago)
            @pl.when(ci >= N_BUF)
            def _():
                ckpt_put(slot, ci - N_BUF).wait()

        rows = scratch[slot]  # (16, CHUNK)
        for bi in range(CHUNK // SCAN_BLOCK):
            col = base + ci * CHUNK + bi * SCAN_BLOCK
            col = col + jax.lax.broadcasted_iota(
                jnp.int32, (1, SCAN_BLOCK), 1
            )
            live = (col >= start) & (col < end)
            rgb, trans = _chunk_blend(
                rows[:, bi * SCAN_BLOCK : (bi + 1) * SCAN_BLOCK],
                px, py, rgb, trans, live, cfg, exact_scan,
            )
            if with_ckpt:
                # EXITING transmittance of this scan block (lands at the
                # NEXT block's ckpt columns, see ckpt_put)
                ckpt_scr[
                    slot, :, bi * SCAN_BLOCK : (bi + 1) * SCAN_BLOCK
                ] = trans.reshape(2, SCAN_BLOCK)
        if with_ckpt:
            ckpt_put(slot, ci).start()
        return ci + 1, rgb, trans

    rgb = jnp.zeros((p, 3), jnp.float32)
    if seeded:
        trans = tinit_ref[0, :, 0:1]
    else:
        trans = jnp.ones((p, 1), jnp.float32)
    ci, rgb, trans = jax.lax.while_loop(cond, body, (0, rgb, trans))

    # drain the in-flight DMA if the transmittance early-stop fired
    @pl.when(ci < num_chunks)
    def _():
        get_dma(jax.lax.rem(ci, N_BUF), ci).wait()

    if with_ckpt:
        nproc_ref[t] = ci
        # drain outstanding checkpoint puts before the grid step ends (the
        # NEXT tile reuses the staging slots; its backward may read rows
        # this tile just wrote)
        for k in range(N_BUF):

            @pl.when(ci >= k + 1)
            def _(k=k):
                ckpt_put(jax.lax.rem(ci - 1 - k, N_BUF), ci - 1 - k).wait()

    # start the next tile's first chunk (see comment above); all of this
    # tile's gets have drained, so slot 0 is free
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

    out_ref[0, :, 0:3] = rgb
    out_ref[0, :, 3:4] = trans


@functools.partial(
    jax.jit, static_argnames=("cfg", "local_rows", "row_stride")
)
def rasterize_binned_pallas(
    table, starts, counts, row_offset, cfg: RenderConfig,
    local_rows: int | None = None, row_stride: int = 1,
):
    """Run the Pallas blend over the shard's tile-row set.

    table: (Dpad, 16) row-major (transposed internally for streaming).
    Returns (rgb_tiles (T, P, 3), trans_tiles (T, P)).
    """
    assert table.shape[-1] == TABLE_WIDTH
    # attribute-major layout for lane-aligned streaming
    return rasterize_binned_pallas_soa(
        table.T, starts, counts, row_offset, cfg, local_rows, row_stride
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "local_rows", "row_stride")
)
def rasterize_binned_pallas_soa(
    table_soa, starts, counts, row_offset, cfg: RenderConfig,
    local_rows: int | None = None, row_stride: int = 1,
):
    """Same as rasterize_binned_pallas but taking the attribute-major
    (16, Dpad) table directly (no transpose)."""
    out = _rasterize_impl(
        table_soa, starts, counts, row_offset, cfg, local_rows,
        row_stride, with_ckpt=False,
    )
    return out[0][:, :, 0:3], out[0][:, :, 3]


@functools.partial(
    jax.jit, static_argnames=("cfg", "local_rows", "row_stride")
)
def rasterize_binned_pallas_train(
    table_soa, starts, counts, row_offset, cfg: RenderConfig,
    local_rows: int | None = None, row_stride: int = 1,
):
    """Training forward: like rasterize_binned_pallas_soa but ALSO emits
    the backward kernel's residuals — (rgb, trans, ckpt, nproc) where
    ckpt (NBLK, P) holds each 128-block's entering transmittance and
    nproc (T,) the per-tile processed-chunk count, letting the backward
    traverse back-to-front (see tile_raster_bwd.py)."""
    out, nproc, ckpt = _rasterize_impl(
        table_soa, starts, counts, row_offset, cfg, local_rows,
        row_stride, with_ckpt=True,
    )
    return out[:, :, 0:3], out[:, :, 3], ckpt, nproc


@functools.partial(
    jax.jit, static_argnames=("cfg", "local_rows", "row_stride", "train")
)
def rasterize_binned_pallas_seeded(
    table_soa, starts, counts, t_init, row_offset, cfg: RenderConfig,
    local_rows: int | None = None, row_stride: int = 1,
    train: bool = False,
):
    """Seeded blend for the fused prefix path's RESIDUAL pass: each tile's
    transmittance carry starts from ``t_init`` (T, P) — pass 1's exit
    transmittance — while rgb accumulates from zero (the caller adds the
    pass-1 rgb).  train=True additionally emits the backward residuals
    (ckpt, nproc) like rasterize_binned_pallas_train."""
    out = _rasterize_impl(
        table_soa, starts, counts, row_offset, cfg, local_rows,
        row_stride, with_ckpt=train, t_init=t_init,
    )
    if train:
        o, nproc, ckpt = out
        return o[:, :, 0:3], o[:, :, 3], ckpt, nproc
    return out[0][:, :, 0:3], out[0][:, :, 3]


def _rasterize_impl(
    table_soa, starts, counts, row_offset, cfg: RenderConfig,
    local_rows, row_stride, with_ckpt: bool, t_init=None,
):
    p = cfg.tile_size * cfg.tile_size
    if local_rows is None:
        local_rows = cfg.tiles_y
    num_tiles = local_rows * cfg.tiles_x
    rowoff = jnp.asarray(row_offset, jnp.int32).reshape(1)
    interpret = jax.default_backend() == "cpu"
    seeded = t_init is not None

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    inputs = [table_soa]
    if seeded:
        in_specs.append(
            pl.BlockSpec(
                (1, p, 1), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(t_init.reshape(num_tiles, p, 1))

    out_specs = [
        pl.BlockSpec(
            (1, p, 4), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    out_shapes = [jax.ShapeDtypeStruct((num_tiles, p, 4), jnp.float32)]
    scratch_shapes = [
        pltpu.VMEM((N_BUF, TABLE_WIDTH, CHUNK), jnp.float32),
        pltpu.SemaphoreType.DMA((N_BUF,)),
    ]
    if with_ckpt:
        # per-tile scalar counts live in SMEM (full-array spec: (1, 1)
        # VMEM blocks are not lowerable)
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shapes.append(jax.ShapeDtypeStruct((num_tiles,), jnp.int32))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (p // SCAN_BLOCK, table_soa.shape[1]), jnp.float32
            )
        )
        scratch_shapes += [
            pltpu.VMEM((N_BUF, p // SCAN_BLOCK, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, cfg=cfg, row_stride=row_stride,
            with_ckpt=with_ckpt, exact_scan=interpret, seeded=seeded,
        ),
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, counts, rowoff, *inputs)
