"""Tile-binned rasterization: the production render path.

Semantics identical to the oracle (raster_jnp.py) and therefore to the
reference's blend pipeline; the work is reorganized the way the CUDA
reference library does internally (SURVEY.md §3.4: preprocess -> duplicate
per tile -> sort -> per-tile front-to-back blend), but with TPU-shaped
kernels: each tile is a fixed pixel block living in VMEM while splat rows
stream through it in chunks, with an order-independent within-chunk
transmittance factorization (cumprod) that keeps the VPU lanes full, and an
early exit once the whole tile is opaque.

Two interchangeable blend executors live behind ops/blend.blend_tiles (a
custom_vjp with analytic gradients): XLA (vmap + while_loop, runs anywhere)
and Pallas (hand-scheduled TPU kernels, same math).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussiansplattingviewer_tpu.config import RenderConfig
from gaussiansplattingviewer_tpu.ops import binning
from gaussiansplattingviewer_tpu.ops.projection import ProjectedSplats


def _tiles_to_image(rgb_tiles, trans_tiles, cfg: RenderConfig):
    """(T, P, ...) tile blocks -> cropped (H, W, ...) image."""
    ts = cfg.tile_size
    tx_n, ty_n = cfg.tiles_x, cfg.tiles_y
    img = rgb_tiles.reshape(ty_n, tx_n, ts, ts, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(ty_n * ts, tx_n * ts, 3)
    trans = trans_tiles.reshape(ty_n, tx_n, ts, ts)
    trans = trans.transpose(0, 2, 1, 3).reshape(ty_n * ts, tx_n * ts)
    return img[: cfg.height, : cfg.width], trans[: cfg.height, : cfg.width]


def debug_counters(splats: ProjectedSplats, img):
    """Sanitizer counters for cfg.debug: non-finite valid splats after
    projection and non-finite output pixels.  A NaN scene parameter (bad
    checkpoint, diverged training step) surfaces here as a scalar
    diagnostic instead of a silently black/poisoned image."""
    finite = jnp.ones_like(splats.valid)
    for field in (
        splats.mean2d, splats.conic, splats.color, splats.radius,
        splats.depth[:, None], splats.opacity[:, None],
    ):
        finite = finite & jnp.all(jnp.isfinite(field), axis=-1)
    bad_splats = jnp.sum(splats.valid & ~finite).astype(jnp.int32)
    bad_pixels = jnp.sum(~jnp.isfinite(img)).astype(jnp.int32)
    return {"nonfinite_splats": bad_splats, "nonfinite_pixels": bad_pixels}


def rasterize_tiles(
    splats: ProjectedSplats,
    cfg: RenderConfig,
    return_aux: bool = False,
    use_pallas: bool = True,
):
    """Tile-binned render of projected splats -> (H, W, 3) image.

    cfg.fused_grad routes through the fused super-op (ops/fused.py:
    budgeted prefix gather + seeded residual pass + compact id-folded
    backward) — Pallas executor only; the XLA executor keeps the classic
    path regardless (the two agree to fp tolerance, so cross-backend
    parity checks still compare independent code paths).
    """
    if cfg.fused_grad and use_pallas:
        from gaussiansplattingviewer_tpu.ops.fused import blend_fused

        pres = binning.bin_splats_presort(splats, cfg)
        rgb_tiles, trans_tiles, diag = blend_fused(
            cfg, cfg.tiles_y, 1, pres.table_src, pres.rows_sorted,
            pres.starts_full, jnp.int32(0),
        )
        num_dup = pres.num_duplicates
        overflow = pres.overflow
        truncated = (diag[0] + diag[1]).astype(jnp.int32)
        extra = {
            "grad_rows_needed": diag[2],
            "grad_rows_dropped": diag[3],
        }
    else:
        from gaussiansplattingviewer_tpu.ops.blend import blend_tiles

        binned = binning.bin_splats(splats, cfg)
        rgb_tiles, trans_tiles = blend_tiles(
            cfg,
            use_pallas,
            cfg.tiles_y,
            1,
            binned.table,
            binned.tile_starts,
            binned.tile_counts,
            jnp.int32(0),
        )
        num_dup = binned.num_duplicates
        overflow = binned.overflow
        truncated = binned.truncated
        extra = {}
    img, trans = _tiles_to_image(rgb_tiles, trans_tiles, cfg)
    img = img + cfg.background * trans[..., None]
    if return_aux:
        aux = {
            "transmittance": trans,
            "num_duplicates": num_dup,
            "overflow": overflow,
            "truncated": truncated,
            **extra,
        }
        if cfg.debug:
            aux.update(debug_counters(splats, img))
        return img, aux
    return img
