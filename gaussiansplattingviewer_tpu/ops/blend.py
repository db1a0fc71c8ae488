"""Differentiable tile blend: custom_vjp around the per-tile compositing.

This is the piece the reference outsources to the diff-gaussian-rasterization
CUDA library's forward/backward (renderer_cuda.py:211-224; backward unused
there under torch.no_grad, but it defines the gradient semantics this module
reproduces).  Everything AROUND the blend — projection, SH, binning gathers —
is plain jnp and differentiated by JAX AD; only the order-dependent
front-to-back compositing loop needs a hand-written VJP (XLA's while_loop is
not reverse-differentiable).

Gradient math (per pixel, splats i front-to-back, T_i = prod_{j<i}(1-a_j)):

  out   = sum_i c_i a_i T_i            T_fin = prod_i (1-a_i)
  dL/dc_i = g_rgb * a_i T_i
  dL/da_i = g_rgb . (c_i T_i - S_i/(1-a_i)) - g_T * T_fin/(1-a_i)
            with S_i = sum_{j>i} c_j a_j T_j = out - A_i (A_i = inclusive
            prefix of c_j a_j T_j), computed streaming as
            g.S_i = g.out - g.A_i  — no (pixel, splat, channel) tensor is
            ever materialized.
  then locally through a = min(0.99, op * exp(power)) and
  power = -0.5(A dx^2 + C dy^2) - B dx dy to the table columns
  (opacity, conic, center).  The 0.99 clamp, the 1/255 cutoff, the 3-sigma
  rect and the power>0 discard (gau_frag.glsl:21-26) gate gradients exactly
  as they gate the forward.

The backward re-traverses tiles front-to-back recomputing alpha (no
per-splat residuals are stored — only the forward's own outputs out/T_fin),
the same recomputation strategy as the CUDA reference, and honors the same
early-stop so fwd/bwd are exactly consistent.

Ball/billboard modes have piecewise-constant alpha: their table gradient is
zero almost everywhere and this module returns exactly that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode
from gaussiansplattingviewer_tpu.ops import binning

CHUNK = 16  # XLA executor chunk (Pallas uses SEGMENT_ALIGN=128)


def _tile_pixel_grid(cfg: RenderConfig, local_rows: int, row_offset,
                     row_stride: int = 1):
    """(T_local, P) pixel-center coordinates for each tile block of the
    shard's row set {row_offset + s * row_stride : s < local_rows}."""
    ts = cfg.tile_size
    num_tiles = local_rows * cfg.tiles_x
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_x = (tile_ids % cfg.tiles_x).astype(jnp.float32)
    tile_y = (tile_ids // cfg.tiles_x).astype(jnp.float32) * float(
        row_stride
    ) + jnp.asarray(row_offset, jnp.float32)
    local = jnp.arange(ts * ts, dtype=jnp.float32)
    lx = local % ts + 0.5
    ly = local // ts + 0.5
    px = tile_x[:, None] * ts + lx[None, :]
    py = tile_y[:, None] * ts + ly[None, :]
    return px, py


def _chunk_fragments(rows, px, py, cfg: RenderConfig):
    """Shared fragment math for fwd and bwd on a (S, 16) chunk vs (P,) pixels.

    Returns dict of (S, P) arrays: alpha, gauss, power, dx, dy, masks.
    """
    b = binning
    cx = rows[:, b.COL_CX, None]
    cy = rows[:, b.COL_CY, None]
    ca = rows[:, b.COL_A, None]
    cb = rows[:, b.COL_B, None]
    cc = rows[:, b.COL_C, None]
    op = rows[:, b.COL_OPACITY, None]
    rx = rows[:, b.COL_RX, None]
    ry = rows[:, b.COL_RY, None]

    dx = px[None, :] - cx
    dy = py[None, :] - cy
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    in_rect = (jnp.abs(dx) <= rx) & (jnp.abs(dy) <= ry)

    mode = int(cfg.mode)
    if mode == RenderMode.BILLBOARD:
        alpha = jnp.where(in_rect, 1.0, 0.0)
        return dict(
            alpha=alpha, gauss=None, power=power, dx=dx, dy=dy,
            unclamped=None,
        )
    gauss = jnp.exp(power)
    raw = op * gauss
    alpha = jnp.minimum(cfg.alpha_clamp, raw)
    keep = in_rect & (power <= 0.0) & (alpha >= cfg.alpha_min)
    alpha = jnp.where(keep, alpha, 0.0)
    if mode in (RenderMode.FLAT_BALL, RenderMode.GAUSSIAN_BALL):
        alpha = jnp.where(keep & (alpha > cfg.ball_threshold), 1.0, 0.0)
    # mask where d(alpha)/d(raw) == 1 (clamp inactive and fragment kept)
    unclamped = keep & (raw < cfg.alpha_clamp)
    return dict(
        alpha=alpha, gauss=gauss, power=power, dx=dx, dy=dy,
        unclamped=unclamped,
    )


def _excl_prefix_prod(one_m):
    shifted = jnp.concatenate([jnp.ones_like(one_m[:1]), one_m[:-1]], axis=0)
    return jnp.cumprod(shifted, axis=0)


def _blend_tile_fwd(table, start, count, px, py, cfg: RenderConfig):
    """Forward blend of one tile (XLA executor).  px/py: (P,);
    table is ATTRIBUTE-MAJOR (16, Dpad) — chunks transpose locally."""
    p = px.shape[0]
    end = start + count

    def cond(state):
        offset, rgb, trans = state
        return (offset < end) & (jnp.max(trans) > cfg.early_stop_transmittance)

    def body(state):
        offset, rgb, trans = state
        rows = jax.lax.dynamic_slice(
            table, (0, offset), (binning.TABLE_WIDTH, CHUNK)
        ).T
        live = (offset + jnp.arange(CHUNK)) < end
        f = _chunk_fragments(rows, px, py, cfg)
        a = jnp.where(live[:, None], f["alpha"], 0.0)
        one_m = 1.0 - a
        prefix = _excl_prefix_prod(one_m)
        w = a * prefix * trans[None, :]
        colors = rows[:, binning.COL_R : binning.COL_BCH + 1]  # (S, 3)
        if int(cfg.mode) == RenderMode.GAUSSIAN_BALL:
            w = w * f["gauss"]
        rgb = rgb + jnp.einsum(
            "sp,sc->pc", w, colors, precision=jax.lax.Precision.HIGHEST
        )
        trans = trans * prefix[-1] * one_m[-1]
        return offset + CHUNK, rgb, trans

    init = (start, jnp.zeros((p, 3), jnp.float32), jnp.ones((p,), jnp.float32))
    _, rgb, trans = jax.lax.while_loop(cond, body, init)
    return rgb, trans


def _blend_tile_bwd(
    table, start, count, px, py, g_rgb, g_trans, out_rgb, out_trans,
    cfg: RenderConfig,
):
    """Backward re-traversal of one tile.  Returns (rows_grad_chunks...)
    scattered into a (padded_len, 16) per-tile grad block via lax loops.

    g_rgb: (P, 3), g_trans: (P,), out_rgb: (P, 3), out_trans: (P,).
    Returns g_table_seg written back by the caller via dynamic_update_slice.
    """
    mode = int(cfg.mode)
    end = start + count
    gdot_out = jnp.einsum(
        "pc,pc->p", g_rgb, out_rgb, precision=jax.lax.Precision.HIGHEST
    )  # (P,)

    def cond(state):
        offset, trans, a_dot, _ = state
        return (offset < end) & (jnp.max(trans) > cfg.early_stop_transmittance)

    def body(state):
        offset, trans, a_dot, g_table = state
        rows = jax.lax.dynamic_slice(
            table, (0, offset), (binning.TABLE_WIDTH, CHUNK)
        ).T
        live = (offset + jnp.arange(CHUNK)) < end
        f = _chunk_fragments(rows, px, py, cfg)
        a = jnp.where(live[:, None], f["alpha"], 0.0)
        one_m = 1.0 - a
        prefix = _excl_prefix_prod(one_m)
        t_i = prefix * trans[None, :]  # (S, P) transmittance before splat i
        w = a * t_i

        colors = rows[:, binning.COL_R : binning.COL_BCH + 1]  # (S, 3)
        g_dot_c = jnp.einsum(
            "pc,sc->sp", g_rgb, colors,
            precision=jax.lax.Precision.HIGHEST,
        )  # (S, P)

        # u_i = w_i * (g . c_i); inclusive prefix A_dot_i
        u = w * g_dot_c
        a_dot_inc = a_dot[None, :] + jnp.cumsum(u, axis=0)

        one_m_safe = jnp.maximum(one_m, 1.0 - cfg.alpha_clamp)
        s_dot = gdot_out[None, :] - a_dot_inc  # g . S_i
        dl_da = (
            t_i * g_dot_c
            - s_dot / one_m_safe
            - g_trans[None, :] * out_trans[None, :] / one_m_safe
        )
        dl_da = jnp.where(a > 0.0, dl_da, 0.0)

        g_seg = jnp.zeros((CHUNK, binning.TABLE_WIDTH), jnp.float32)
        b = binning
        if mode == RenderMode.BILLBOARD or mode in (
            RenderMode.FLAT_BALL,
            RenderMode.GAUSSIAN_BALL,
        ):
            # piecewise-constant alpha: only color grads (and only for
            # billboard/flat; gaussian-ball folds exp(power) into w)
            w_c = w * f["gauss"] if mode == RenderMode.GAUSSIAN_BALL else w
            g_col = jnp.einsum(
                "sp,pc->sc", w_c, g_rgb,
                precision=jax.lax.Precision.HIGHEST,
            )
            g_seg = g_seg.at[:, b.COL_R : b.COL_BCH + 1].set(g_col)
        else:
            unclamped = f["unclamped"] & live[:, None]
            gauss = f["gauss"]
            op = rows[:, b.COL_OPACITY, None]
            dx, dy = f["dx"], f["dy"]
            ca = rows[:, b.COL_A, None]
            cb = rows[:, b.COL_B, None]
            cc = rows[:, b.COL_C, None]

            d_power = jnp.where(unclamped, dl_da * op * gauss, 0.0)
            g_op = jnp.sum(jnp.where(unclamped, dl_da * gauss, 0.0), axis=1)
            g_a = jnp.sum(d_power * (-0.5 * dx * dx), axis=1)
            g_b = jnp.sum(d_power * (-dx * dy), axis=1)
            g_c = jnp.sum(d_power * (-0.5 * dy * dy), axis=1)
            g_cx = jnp.sum(d_power * (ca * dx + cb * dy), axis=1)
            g_cy = jnp.sum(d_power * (cc * dy + cb * dx), axis=1)
            g_col = jnp.einsum(
                "sp,pc->sc", w, g_rgb,
                precision=jax.lax.Precision.HIGHEST,
            )

            g_seg = g_seg.at[:, b.COL_CX].set(g_cx)
            g_seg = g_seg.at[:, b.COL_CY].set(g_cy)
            g_seg = g_seg.at[:, b.COL_A].set(g_a)
            g_seg = g_seg.at[:, b.COL_B].set(g_b)
            g_seg = g_seg.at[:, b.COL_C].set(g_c)
            g_seg = g_seg.at[:, b.COL_OPACITY].set(g_op)
            g_seg = g_seg.at[:, b.COL_R : b.COL_BCH + 1].set(g_col)

        g_seg = jnp.where(live[:, None], g_seg, 0.0)
        g_table = jax.lax.dynamic_update_slice(
            g_table, g_seg.T, (0, offset)
        )

        trans = trans * prefix[-1] * one_m[-1]
        a_dot = a_dot_inc[-1]
        return offset + CHUNK, trans, a_dot, g_table

    p = px.shape[0]
    g_table0 = jnp.zeros_like(table)
    init = (start, jnp.ones((p,), jnp.float32), jnp.zeros((p,), jnp.float32), g_table0)
    _, _, _, g_table = jax.lax.while_loop(cond, body, init)
    return g_table


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def blend_tiles(
    cfg: RenderConfig, use_pallas: bool, local_rows: int, row_stride: int,
    table, starts, counts, row_offset,
):
    """Blend all tiles: ATTRIBUTE-MAJOR (16, Dpad) table -> (T, P, 3) rgb
    + (T, P) trans.

    local_rows / row_stride (static) and row_offset (traced scalar) select
    the tile-row set {row_offset + s * row_stride} this shard renders;
    single-chip callers pass (cfg.tiles_y, 1, 0).
    """
    return _blend_fwd_impl(
        cfg, use_pallas, local_rows, row_stride, table, starts, counts,
        row_offset,
    )


def _blend_fwd_impl(cfg, use_pallas, local_rows, row_stride, table, starts,
                    counts, row_offset):
    if use_pallas:
        from gaussiansplattingviewer_tpu.ops.pallas.tile_raster_fwd import (
            rasterize_binned_pallas_soa,
        )

        return rasterize_binned_pallas_soa(
            table, starts, counts, row_offset, cfg, local_rows, row_stride
        )
    px, py = _tile_pixel_grid(cfg, local_rows, row_offset, row_stride)
    rgb, trans = jax.vmap(
        lambda s, c, x, y: _blend_tile_fwd(table, s, c, x, y, cfg)
    )(starts[:-1], counts, px, py)
    return rgb, trans


def _blend_vjp_fwd(cfg, use_pallas, local_rows, row_stride, table, starts,
                   counts, row_offset):
    if use_pallas:
        # train forward: also emits the backward's residuals — per-block
        # entering-transmittance checkpoints + per-tile processed-chunk
        # counts — so the Pallas backward can traverse back-to-front
        # (tile_raster_bwd.py docstring)
        from gaussiansplattingviewer_tpu.ops.pallas.tile_raster_fwd import (
            rasterize_binned_pallas_train,
        )

        rgb, trans, ckpt, nproc = rasterize_binned_pallas_train(
            table, starts, counts, row_offset, cfg, local_rows, row_stride
        )
        return (rgb, trans), (
            table, starts, counts, row_offset, rgb, trans, ckpt, nproc,
        )
    rgb, trans = _blend_fwd_impl(
        cfg, use_pallas, local_rows, row_stride, table, starts, counts,
        row_offset,
    )
    return (rgb, trans), (
        table, starts, counts, row_offset, rgb, trans, None, None,
    )


def _blend_vjp_bwd(cfg, use_pallas, local_rows, row_stride, res, cotangents):
    table, starts, counts, row_offset, rgb, trans, ckpt, nproc = res
    g_rgb, g_trans = cotangents
    if use_pallas:
        from gaussiansplattingviewer_tpu.ops.pallas.tile_raster_bwd import (
            blend_bwd_pallas_soa,
        )

        g_table = blend_bwd_pallas_soa(
            table, starts, counts, nproc, ckpt, row_offset, g_rgb, g_trans,
            trans, cfg, local_rows, row_stride,
        )
    else:
        px, py = _tile_pixel_grid(cfg, local_rows, row_offset, row_stride)
        # vmap over tiles, summing per-tile full-table grads would be O(T*D);
        # instead run a sequential scan over tiles accumulating into one
        # buffer (tiles own disjoint rows, so this is a pure scatter).
        def tile_step(g_table, args):
            s, c, x, y, gr, gt, orr, ot = args
            g = _blend_tile_bwd(table, s, c, x, y, gr, gt, orr, ot, cfg)
            return g_table + g, None

        g_table, _ = jax.lax.scan(
            tile_step,
            jnp.zeros_like(table),
            (starts[:-1], counts, px, py, g_rgb, g_trans, rgb, trans),
        )
    return g_table, None, None, None


blend_tiles.defvjp(_blend_vjp_fwd, _blend_vjp_bwd)
