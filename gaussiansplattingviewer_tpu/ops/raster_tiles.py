"""Tile-binned rasterization: the production render path.

Semantics identical to the oracle (raster_jnp.py) and therefore to the
reference's blend pipeline; the work is reorganized the way the CUDA
reference library does internally (SURVEY.md §3.4: preprocess -> duplicate
per tile -> sort -> per-tile front-to-back blend), but with TPU-shaped
kernels: each tile is a fixed pixel block living in VMEM while splat rows
stream through it in chunks, with an order-independent within-chunk
transmittance factorization (cumprod) that keeps the VPU lanes full, and an
early exit once the whole tile is opaque.

Two interchangeable blend executors:
  * XLA (vmap + while_loop) — runs everywhere (CPU tests, TPU fallback);
  * Pallas (ops/pallas/) — hand-scheduled TPU kernel, same math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussiansplattingviewer_tpu.config import RenderConfig
from gaussiansplattingviewer_tpu.ops import binning
from gaussiansplattingviewer_tpu.ops.binning import BinnedSplats
from gaussiansplattingviewer_tpu.ops.projection import ProjectedSplats
from gaussiansplattingviewer_tpu.ops.raster_jnp import splat_alpha_color

# splat rows consumed per blend iteration; 16 sublanes x (16 x 16 px = 2
# lanes of 128) keeps the VPU busy
CHUNK = 16


def _chunk_alpha_color(rows: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray, cfg):
    """Fragment math for a (S, TABLE_WIDTH) chunk against a (P,) pixel block.

    Returns alpha (S, P) and color (S, P, 3) with all discards folded in —
    the vectorized equivalent of gau_frag.glsl:13-38.
    """
    b = binning
    dx = px[None, :] - rows[:, b.COL_CX, None]  # (S, P)
    dy = py[None, :] - rows[:, b.COL_CY, None]
    conic = rows[:, None, b.COL_A : b.COL_C + 1]
    color = rows[:, None, b.COL_R : b.COL_BCH + 1]
    opacity = rows[:, b.COL_OPACITY, None]
    radius = rows[:, None, b.COL_RX : b.COL_RY + 1]
    return splat_alpha_color(dx, dy, conic, opacity, color, radius, cfg)


def _blend_tile_xla(
    table: jnp.ndarray,
    start: jnp.ndarray,
    end: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    cfg: RenderConfig,
):
    """Front-to-back blend of one tile's splat range over its pixel block.

    px, py: (P,) pixel-center coordinates for the tile's pixels.
    Returns (rgb (P, 3), transmittance (P,)).
    """
    p = px.shape[0]

    def cond(state):
        offset, rgb, trans = state
        return (offset < end) & (jnp.max(trans) > cfg.early_stop_transmittance)

    def body(state):
        offset, rgb, trans = state
        rows = jax.lax.dynamic_slice(
            table, (offset, 0), (CHUNK, binning.TABLE_WIDTH)
        )
        live = (offset + jnp.arange(CHUNK)) < end
        a, c = _chunk_alpha_color(rows, px, py, cfg)
        a = jnp.where(live[:, None], a, 0.0)
        one_m = 1.0 - a
        shifted = jnp.concatenate([jnp.ones_like(one_m[:1]), one_m[:-1]], axis=0)
        prefix = jnp.cumprod(shifted, axis=0)  # exclusive within-chunk
        w = a * prefix  # (S, P)
        rgb = rgb + trans[:, None] * jnp.sum(w[..., None] * c, axis=0)
        trans = trans * prefix[-1] * one_m[-1]
        return offset + CHUNK, rgb, trans

    init = (
        start,
        jnp.zeros((p, 3), jnp.float32),
        jnp.ones((p,), jnp.float32),
    )
    _, rgb, trans = jax.lax.while_loop(cond, body, init)
    return rgb, trans


def rasterize_binned_xla(binned: BinnedSplats, cfg: RenderConfig):
    """Blend all tiles with vmapped while_loops (portable executor)."""
    ts = cfg.tile_size
    tx_n, ty_n = cfg.tiles_x, cfg.tiles_y

    tile_ids = jnp.arange(cfg.num_tiles, dtype=jnp.int32)
    tile_x = (tile_ids % tx_n).astype(jnp.float32)
    tile_y = (tile_ids // tx_n).astype(jnp.float32)
    local = jnp.arange(ts * ts, dtype=jnp.float32)
    lx = local % ts + 0.5
    ly = local // ts + 0.5
    px = tile_x[:, None] * ts + lx[None, :]  # (T, P)
    py = tile_y[:, None] * ts + ly[None, :]

    starts = binned.tile_starts[:-1]
    ends = binned.tile_starts[1:]

    rgb, trans = jax.vmap(
        lambda s, e, x, y: _blend_tile_xla(binned.table, s, e, x, y, cfg)
    )(starts, ends, px, py)
    return rgb, trans  # (T, P, 3), (T, P)


def _tiles_to_image(rgb_tiles, trans_tiles, cfg: RenderConfig):
    """(T, P, ...) tile blocks -> cropped (H, W, ...) image."""
    ts = cfg.tile_size
    tx_n, ty_n = cfg.tiles_x, cfg.tiles_y
    img = rgb_tiles.reshape(ty_n, tx_n, ts, ts, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(ty_n * ts, tx_n * ts, 3)
    trans = trans_tiles.reshape(ty_n, tx_n, ts, ts)
    trans = trans.transpose(0, 2, 1, 3).reshape(ty_n * ts, tx_n * ts)
    return img[: cfg.height, : cfg.width], trans[: cfg.height, : cfg.width]


def rasterize_tiles(
    splats: ProjectedSplats,
    cfg: RenderConfig,
    return_aux: bool = False,
    use_pallas: bool = True,
):
    """Tile-binned render of projected splats -> (H, W, 3) image."""
    binned = binning.bin_splats(splats, cfg, chunk_pad=CHUNK)
    if use_pallas:
        from gaussiansplattingviewer_tpu.ops.pallas.tile_raster_fwd import (
            rasterize_binned_pallas,
        )

        rgb_tiles, trans_tiles = rasterize_binned_pallas(binned, cfg)
    else:
        rgb_tiles, trans_tiles = rasterize_binned_xla(binned, cfg)
    img, trans = _tiles_to_image(rgb_tiles, trans_tiles, cfg)
    img = img + cfg.background * trans[..., None]
    if return_aux:
        return img, {
            "transmittance": trans,
            "num_duplicates": binned.num_duplicates,
            "overflow": binned.overflow,
        }
    return img
