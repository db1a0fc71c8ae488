"""Render configuration for the TPU splatting pipeline.

The reference scatters its configuration over ~20 module-level globals and GL
uniforms (main.py:73-99, renderer_ogl.py:148-152).  Here everything that
parameterizes a render is one hashable dataclass so it can be a static argument
to ``jax.jit`` without recompilation churn.
"""

from __future__ import annotations

import dataclasses
import enum


class RenderMode(enum.IntEnum):
    """Render modes, numerically identical to the reference's ``render_mod`` uniform.

    Reference semantics (shaders/gau_vert.glsl:53, shaders/gau_frag.glsl:8):
      ``mod >= 0``  render SH bands 0..mod (SH:0, SH:0~1, SH:0~2, SH:0~3)
      ``mod == -1`` stereo-disparity image (gau_vert.glsl:182-211)
      ``mod == -2`` billboard: solid quad, alpha=1 (gau_frag.glsl:15-19)
      ``mod == -3`` flat ball: alpha thresholded at 0.22 (gau_frag.glsl:32-33)
      ``mod == -4`` gaussian ball: thresholded + darkened by exp(power)
                    (gau_frag.glsl:34-38)
    """

    SH0 = 0
    SH1 = 1
    SH2 = 2
    SH3 = 3
    DEPTH = -1          # stereo disparity, grayscale
    BILLBOARD = -2
    FLAT_BALL = -3
    GAUSSIAN_BALL = -4


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render parameters (hashable: usable as a jit static argument).

    Attributes:
      width, height: output resolution in pixels (ref default 1160x522,
        main.py:634-635).
      mode: one of RenderMode; default SH3 = full SH degree-3 color.
      scale_modifier: global multiplier on Gaussian scales (ref
        renderer_ogl.py:148-149; slider in main.py).
      tile_size: rasterizer tile edge in pixels. The reference CUDA library
        uses 16; on TPU 16x16=256 pixels maps to two 8x128 VPU registers.
      max_tiles_per_gaussian: OPTIONAL static cap on how many tiles a
        single splat may be duplicated into.  0 (default) = UNBOUNDED, the
        reference semantics (the GL quad covers every tile it overlaps,
        gau_vert.glsl:174-178): splats beyond dup_factor tiles draw slots
        from the HUGE pool, whose per-entry slot count is the whole tile
        grid.  A positive value clamps spans to a recentered window of
        that many tiles (counted in the overflow diagnostic) and bounds
        the huge pool's per-entry slots — a memory knob for extreme
        resolutions.
      dup_factor: tile-duplicate slots per Gaussian at the FULL-pool tier
        (the key buffer's dominant term is ~dup_factor-ish * N across the
        dense level + pools).  Splats covering more than dup_factor tiles
        escalate to the huge pool.  16 covers a 4x4-tile (64 px at
        tile_size 16) footprint.
      dense_small_slots: level-1 duplicate slots every splat gets in the
        dense binning; splats covering more tiles draw extra slots from
        two bounded pools (below).
      dense_mid_slots: extra slots per MID-pool entry.  The dense binning
        is three-level: every splat owns dense_small_slots slots; splats
        covering more tiles join the mid pool (max(N/pool_mid_fraction,
        4096) entries x dense_mid_slots extras) or, above that, the full
        pool (max(N/pool_full_fraction, 4096) entries x (dup_factor -
        dense_small_slots) extras).  Measured on MipNeRF-like scenes
        ~87% of splats cover <=4 tiles and ~97% <=8, so the pools stay
        small and the sorted key volume tracks the live duplicate count
        (7M -> 5.25M at 1M splats) — every per-duplicate cost (sort,
        gathers, backward fold) scales with it.  Splats that miss both
        pools clamp to dense_small_slots tiles and count as overflow.
      dense_big_slots: extra slots per BIG-pool entry (default 128): the
        geometric tier between the full pool (dup_factor tiles) and the
        whole-grid huge pool, sized for ~100-tile footprints (large
        foreground splats at medium distance).  Without it, scenes with
        more such splats than huge-pool entries visibly truncate coverage
        at tile boundaries.
      pool_mid_fraction / pool_full_fraction / pool_big_fraction /
      pool_huge_fraction:
        N/fraction bounds the pool entry counts (raise the denominators to
        shrink the buffers, lower them for extreme close-up robustness);
        floors are 4096/4096/2048/32 entries.  The huge pool's per-entry
        slot span is the whole tile grid — it exists so per-splat tile
        coverage is unbounded like the reference's (gau_vert.glsl:174-178)
        — while the geometric ladder keeps total key volume tracking the
        live duplicate count.
      pool_ladder: OPTIONAL explicit pool tiers ((extra_slots, entries),
        ...) with strictly decreasing extra_slots, replacing the derived
        mid/full/big tiers when non-empty (the huge whole-grid tier is
        always appended on top so coverage stays unbounded).  This is the
        per-scene tuning hook: ops/autotune.py measures a scene's
        footprint histogram and emits a geometric ladder whose total slot
        capacity tracks the LIVE duplicate count instead of the worst
        case — every per-duplicate cost (sort, table gather, backward
        fold) scales with it.  Entries beyond a tier's population are
        harmlessly unused; undersized tiers demote splats (overflow
        diagnostic counts them).
      pool_huge_entries: absolute entry count for the huge tier
        (0 = derive as max(N/pool_huge_fraction, 32)).
      table_budget_rows: absolute materialized-table row budget
        (0 = derive as table_budget_factor * N).  The autotuner sets this
        just above the scene's live duplicate count so the table gather
        touches ~live rows.
      table_budget_factor: materialized splat-table rows per Gaussian.
        The dense key buffer is dup_factor*N, but only ~2-4 duplicates per
        splat are typically live; the table (and every gather over it) is
        sized table_budget_factor*N and the sorted tail beyond it is
        truncated (highest tile indices; reported in the ``truncated``
        diagnostic).  May exceed dup_factor when huge-pool coverage
        (close-ups) needs more materialized rows than dup_factor*N.
      stereo_baseline: world-space x offset used by DEPTH mode
        (ref gau_vert.glsl:184 hardcodes -0.5; gau_vert_2/3 use -0.3/-0.5).
      depth_scale_inflate: extra scale multiplier applied in DEPTH mode
        (ref gau_vert.glsl:153 multiplies by 1.2).
      background: background intensity for all three channels (ref clear
        color 0, main.py:821; CUDA bg tensor renderer_cuda.py:109).
      clamp_color: if True, clamp per-Gaussian RGB at 0 like the INRIA CUDA
        rasterizer (computeColorFromSH's max(result+0.5, 0)); if False keep
        the GL path's unclamped vertex color (gau_vert.glsl:250).
      ndc_cull_limit: |ndc| culling threshold (ref gau_vert.glsl:142 uses 1.3).
      alpha_clamp: per-fragment alpha ceiling (ref gau_frag.glsl:24 uses 0.99).
      alpha_min: minimum contributing alpha (ref gau_frag.glsl:25 uses 1/255).
      ball_threshold: alpha threshold for the ball modes (gau_frag.glsl:33).
      early_stop_transmittance: terminate a pixel once transmittance drops
        below this (the CUDA rasterizer uses 1e-4).
      grad_fold_bf16: carry the backward's per-duplicate gradient fold
        sort payloads as bf16 PAIRS packed into u32 words (10 sort
        operands -> 6; sort cost is operand-count-bound, ~30% faster
        fold measured, scripts/foldbench.py).  One bf16 rounding (~0.4%
        relative) per duplicate gradient, f32 accumulation after — far
        inside Adam/SGD noise, so it is ON by default; precision tests
        and finite-difference checks pin it off
        (tests/test_grads.py).
      fused_grad: route rendering through the fused binning+blend
        custom_vjp super-op (ops/fused.py): the splat table is gathered
        INSIDE the op and the backward folds duplicate gradients by SPLAT
        ID from a compact row-major gradient buffer sized ~processed rows
        (grad_budget_rows) instead of the slot-dense fold sized ~capacity.
        Requires the Pallas backend.  The win grows with the scene's
        early-stop dead weight (rows sorted/gathered/folded that the blend
        kernels never read): ~81% at garden scale, ~20% at the 1M bench
        (PERF.md r4) — autotune enables it per scene.
      prefix_rows: with fused_grad, per-tile PREFIX length K: only the
        first min(count, K) depth-sorted rows per tile are gathered and
        blended in pass 1; tiles that neither saturated (early-stop) nor
        fit in K get a SECOND seeded blend pass over their remaining rows
        (entering transmittance = pass-1 exit; exact by compositional
        associativity out = out_K + T_K * blend(rest)).  0 = single-pass
        fused (prefix disabled).
      prefix_budget_rows: static capacity of the pass-1 prefix table
        (~sum over tiles of min(count, K); autotuned).  Overflow drops
        trailing tiles' rows (``truncated`` diagnostic).
      residual_budget_rows: static capacity of the pass-2 residual table
        (autotuned; only unfinished tiles contribute).
      grad_budget_rows: static capacity of the compact backward gradient
        buffer (~sum of processed chunk rows; autotuned).  Tiles past the
        budget lose their table gradients for the step and are counted in
        the ``grad_overflow`` diagnostic — retune when it fires.
      grad_residual_budget_rows: same for the residual pass's gradient
        buffer (0 = the safe bound residual_budget_rows + one chunk per
        tile — correct but inflates the id fold; the autotuner sets it
        from the measured unfinished-tile count).
      tight_culling: per-tile exact ellipse/rect alpha test during binning.
        A candidate tile is dropped when max over its pixel centers of
        min(alpha_clamp, opacity * exp(power)) < alpha_min — such tiles
        contribute EXACTLY zero in every backend (the per-fragment
        alpha_min cutoff, gau_frag.glsl:25, zeroes them anyway), so this
        changes no output, only removes dead entries from the tile lists
        (~20-40% of live duplicates vs. the reference's AABB-only
        duplication).  Disabled automatically in BILLBOARD mode (alpha=1
        inside the quad).
      debug: sanitizer mode — render_with_aux additionally reports
        ``nonfinite_splats`` (valid splats whose projected mean2d / conic /
        color / opacity / depth / radius contain NaN or Inf) and
        ``nonfinite_pixels`` (non-finite output pixels), alongside the
        always-on overflow/truncated binning counters.  apps/viewer.py
        --debug prints the diagnostic per frame.  Costs one extra pass over
        the projected splats and the image; off by default.
    """

    width: int = 1160
    height: int = 522
    mode: RenderMode = RenderMode.SH3
    scale_modifier: float = 1.0
    tile_size: int = 16
    max_tiles_per_gaussian: int = 0
    dup_factor: int = 16
    dense_small_slots: int = 4
    dense_mid_slots: int = 4
    dense_big_slots: int = 128
    pool_mid_fraction: int = 8
    pool_full_fraction: int = 16
    pool_big_fraction: int = 512
    pool_huge_fraction: int = 16384
    pool_ladder: tuple = ()
    pool_huge_entries: int = 0
    table_budget_rows: int = 0
    table_budget_factor: int = 8
    stereo_baseline: float = -0.5
    depth_scale_inflate: float = 1.2
    background: float = 0.0
    clamp_color: bool = True
    ndc_cull_limit: float = 1.3
    alpha_clamp: float = 0.99
    alpha_min: float = 1.0 / 255.0
    ball_threshold: float = 0.22
    early_stop_transmittance: float = 1e-4
    fused_grad: bool = False
    prefix_rows: int = 0
    prefix_budget_rows: int = 0
    residual_budget_rows: int = 0
    grad_budget_rows: int = 0
    grad_residual_budget_rows: int = 0
    tight_culling: bool = True
    grad_fold_bf16: bool = True
    debug: bool = False

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_size)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_size)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    def with_(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
