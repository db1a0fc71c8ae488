"""Oracle rasterizer: globally-sorted, per-pixel alpha blending in pure jnp.

This is the semantic ground truth every production kernel is tested against
(SURVEY.md §7 build order step 2).  It reproduces, in one differentiable
function, what the reference composes out of GL machinery:

  * global back-to-front depth sort             (renderer_ogl.py:10-19)
  * per-fragment Gaussian falloff + discards    (shaders/gau_frag.glsl:21-26)
  * fixed-function SRC_ALPHA/1-MINUS blending   (renderer_ogl.py:128-130)
  * render-mode switches (billboard/ball/depth) (gau_frag.glsl:15-38)

Implementation: front-to-back transmittance accumulation (mathematically
identical to GL's back-to-front painter blending over a black clear), as a
``lax.scan`` over splat chunks with an in-chunk cumulative product — the same
order-independent-within-chunk factorization the TPU tile kernel uses, so the
two paths are bitwise comparable.

O(N * H * W): use for tests, small scenes, and as the autodiff oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode
from gaussiansplattingviewer_tpu.ops.projection import ProjectedSplats


def splat_alpha_color(
    dx: jax.Array,
    dy: jax.Array,
    conic: jax.Array,
    opacity: jax.Array,
    color: jax.Array,
    radius: jax.Array,
    cfg: RenderConfig,
):
    """Fragment-shader semantics for a batch of (splat, pixel) pairs.

    dx, dy: pixel-center offsets from the splat center (y down), any
    broadcastable shape (...,).  conic (., 3), opacity (.,), color (., 3),
    radius (., 2) broadcast against them.

    Returns (alpha, color) with all discards folded in as alpha=0
    (gau_frag.glsl:13-38).
    """
    A, B, C = conic[..., 0], conic[..., 1], conic[..., 2]
    power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
    in_rect = (jnp.abs(dx) <= radius[..., 0]) & (jnp.abs(dy) <= radius[..., 1])

    mode = int(cfg.mode)
    if mode == RenderMode.BILLBOARD:
        # solid quad, alpha 1 (gau_frag.glsl:15-19)
        alpha = jnp.where(in_rect, 1.0, 0.0)
        return alpha, color

    gauss = jnp.exp(power)
    alpha = jnp.minimum(cfg.alpha_clamp, opacity * gauss)
    keep = in_rect & (power <= 0.0) & (alpha >= cfg.alpha_min)
    alpha = jnp.where(keep, alpha, 0.0)

    if mode in (RenderMode.FLAT_BALL, RenderMode.GAUSSIAN_BALL):
        # gau_frag.glsl:32-38: binarize alpha at the ball threshold
        alpha = jnp.where(alpha > cfg.ball_threshold, 1.0, 0.0) * jnp.where(
            keep, 1.0, 0.0
        )
        if mode == RenderMode.GAUSSIAN_BALL:
            color = color * gauss[..., None]
    return alpha, color


def rasterize_oracle(
    splats: ProjectedSplats,
    cfg: RenderConfig,
    chunk: int = 8,
    return_aux: bool = False,
):
    """Blend all splats over the full image, no tiling.

    Splats are sorted by depth on-device (nearest first) and composited
    front-to-back: out = sum_i c_i a_i T_i + bg * T_final,
    T_i = prod_{j<i} (1 - a_j) — identical to the reference's back-to-front
    GL blend over a black clear (main.py:821).
    """
    n = splats.depth.shape[0]
    pad = (-n) % chunk
    H, W = cfg.height, cfg.width

    # nearest-first ordering; invalid splats get +inf depth (sort to the end)
    depth_key = jnp.where(splats.valid, splats.depth, jnp.inf)
    order = jnp.argsort(depth_key)

    def gather(a):
        a = a[order]
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        return a

    mean2d = gather(splats.mean2d)
    conic = gather(splats.conic)
    color = gather(splats.color)
    radius = gather(splats.radius)
    opacity = jnp.where(splats.valid, splats.opacity, 0.0)
    opacity = gather(opacity)

    px = jnp.arange(W, dtype=jnp.float32) + 0.5
    py = jnp.arange(H, dtype=jnp.float32) + 0.5

    n_chunks = (n + pad) // chunk

    def body(carry, ci):
        rgb, T = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * chunk, chunk)
        m, co, cl, rd, op = (
            sl(mean2d), sl(conic), sl(color), sl(radius), sl(opacity),
        )
        dx = px[None, None, :] - m[:, 0, None, None]  # (chunk, 1, W)
        dy = py[None, :, None] - m[:, 1, None, None]  # (chunk, H, 1)
        a, c = splat_alpha_color(
            dx,
            dy,
            co[:, None, None, :],
            op[:, None, None],
            cl[:, None, None, :],
            rd[:, None, None, :],
            cfg,
        )  # a: (chunk, H, W); c: (chunk, H, W, 3)
        one_m = 1.0 - a
        # within-chunk EXCLUSIVE prefix transmittance: shift-by-one then
        # cumprod (exact even at alpha == 1, which billboard/ball modes hit)
        shifted = jnp.concatenate(
            [jnp.ones_like(one_m[:1]), one_m[:-1]], axis=0
        )
        prefix = jnp.cumprod(shifted, axis=0)
        w_i = a * prefix  # (chunk, H, W)
        rgb = rgb + T[..., None] * jnp.sum(w_i[..., None] * c, axis=0)
        T = T * jnp.prod(one_m, axis=0)
        return (rgb, T), None

    init = (
        jnp.zeros((H, W, 3), jnp.float32),
        jnp.ones((H, W), jnp.float32),
    )
    (rgb, T), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    out = rgb + cfg.background * T[..., None]
    if return_aux:
        aux = {"transmittance": T}
        if cfg.debug:
            from gaussiansplattingviewer_tpu.ops.raster_tiles import (
                debug_counters,
            )

            aux.update(debug_counters(splats, out))
        return out, aux
    return out
