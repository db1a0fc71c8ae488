"""Per-scene binning autotuner: size the duplicate-slot pools to the scene.

The binning capacity (ops/binning.py) is the cost driver of the whole
frame: the fused (tile|depth) sort, the table gather, and the backward's
sort-carry gradient fold all scale with TOTAL SLOT CAPACITY, not with the
live duplicate count.  The default static pools are sized for "typical"
scenes; on any concrete scene they waste capacity (e.g. a 5.8M-splat
garden-scale scene where most splats cover one tile burns 4 slots each in
the default level-1 region — 23M slots for ~9M live duplicates).

This module measures the scene's actual per-splat tile-footprint histogram
for one or more representative camera poses (one cheap jitted pass: just
projection + tile_bbox, no rasterization) and emits a RenderConfig whose

  * level-1 slot count ``k1`` (dense_small_slots),
  * geometric pool ladder (pool_ladder: doubling coverage tiers sized to
    the measured populations + safety margin), and
  * materialized-table row budget (table_budget_rows)

minimize total capacity subject to zero demotions on the measured poses.
The tuned config changes NOTHING about rendered output (pools are a
layout/capacity concept only — tests/test_autotune.py asserts bit-equal
images); it changes a per-scene one-off retrace/recompile for a frame-rate
win, the same trade every scene-static renderer makes.

The reference has no analogue (its GL path has no capacity concept; the
CUDA lib allocates exact per-frame buffers with device-side prefix sums,
impossible under XLA's static shapes — this tuner is the TPU-native
equivalent of that exactness).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from gaussiansplattingviewer_tpu.config import RenderConfig
from gaussiansplattingviewer_tpu.ops import binning
from gaussiansplattingviewer_tpu.ops.projection import project


@functools.partial(jax.jit, static_argnames=("cfg",))
def tile_counts(scene, view, proj, cam_pos, cfg: RenderConfig):
    """Per-splat clamped tile-bbox footprint (0 for culled splats)."""
    splats = project(scene, view, proj, cam_pos, cfg)
    _, _, _, _, count, _ = binning.tile_bbox(splats, cfg)
    return count


def measure_counts(scene, views, projs, cam_positions, cfg: RenderConfig):
    """Elementwise-max footprint over representative poses -> np (N,) i32."""
    counts = None
    for v, p, c in zip(views, projs, cam_positions):
        cnt = np.asarray(
            tile_counts(
                scene,
                jnp.asarray(v, jnp.float32),
                jnp.asarray(p, jnp.float32),
                jnp.asarray(c, jnp.float32),
                cfg,
            )
        )
        counts = cnt if counts is None else np.maximum(counts, cnt)
    return counts


def _round_up(x: int, q: int) -> int:
    return -(-int(x) // q) * q


def _ladder_capacity(counts_live, n, k1, span_cap, safety, round_to,
                     ratio: float = 2.0, max_tiers: int = 20):
    """Build the geometric ladder for a given k1; return (capacity, cfg
    fields).  Tier coverages grow by ``ratio`` (2.0 = doubling): finer
    ratios cut per-splat slot rounding waste (a splat in a tier of span
    ``cov`` wastes up to (1 - 1/ratio) * cov slots) at the price of more
    tiers, each of which costs a fixed keygen overhead — tuned_config
    scores the trade."""
    covs = []
    c = k1
    while True:
        c = max(int(np.ceil(c * ratio)), c + 1)
        if c >= span_cap or len(covs) >= max_tiers:
            break
        covs.append(c)
    ladder = []
    lo = k1
    for cov in covs:
        pop = int(np.count_nonzero((counts_live > lo) & (counts_live <= cov)))
        lo = cov
        if pop == 0:
            continue
        # fine granularity: a fixed 1024-entry floor would waste cov*1024
        # slots on a 5-splat tier (safety already absorbs pose drift)
        entries = _round_up(pop * safety, 8)
        ladder.append((cov - k1, entries))
    huge_pop = int(np.count_nonzero(counts_live > lo))
    huge_entries = max(_round_up(huge_pop * safety, 8), 8)
    capacity = (
        k1 * n
        + sum(kx * c for kx, c in ladder)
        + span_cap * huge_entries
    )
    # binning wants tiers hungriest-first (strictly decreasing extras)
    return capacity, tuple(reversed(ladder)), huge_entries


def tuned_config(
    cfg: RenderConfig,
    counts,
    k1: int | None = None,
    safety: float = 1.2,
    round_to: int = 1024,
) -> RenderConfig:
    """RenderConfig with scene-tuned pools from a measure_counts() result.

    safety inflates every measured population (and the table-row budget)
    to absorb pose drift; binning's overflow/truncated diagnostics report
    if a later pose exceeds the tuned capacity (output then loses the
    demoted splats' outermost tiles — re-tune with more poses).
    """
    counts = np.asarray(counts)
    n = int(counts.shape[0])
    counts_live = counts[counts > 0]
    span_cap = cfg.num_tiles
    if cfg.max_tiles_per_gaussian > 0:
        span_cap = min(span_cap, cfg.max_tiles_per_gaussian)

    best = None
    for k1c in [k1] if k1 else [1, 2, 4]:
        for ratio in (2.0, 1.5, 1.3):
            cap, ladder, huge = _ladder_capacity(
                counts_live, n, k1c, span_cap, safety, round_to,
                ratio=ratio,
            )
            # cost model: every SLOT pays keygen + sort + gradient-fold
            # (~17ns measured); every pool ENTRY additionally pays one
            # packed row gather + derived-field recompute (~8ns) — about
            # half a slot; every TIER pays a fixed keygen/mask/concat
            # overhead (~16k slot-equivalents, ~0.3 ms)
            entries = sum(c for _, c in ladder) + huge
            score = cap + 0.5 * entries + 16384 * (len(ladder) + 1)
            if best is None or score < best[0]:
                best = (score, cap, k1c, ladder, huge)
    _, cap, k1c, ladder, huge = best

    # table rows the sort can produce = total live duplicates; bbox counts
    # upper-bound the (tight-culled) live entries, so this never truncates
    # on the measured poses
    live_rows = int(np.minimum(counts_live, span_cap).sum())
    budget = min(cap, max(_round_up(live_rows * safety, 4096), 4096))
    return cfg.with_(
        dense_small_slots=k1c,
        pool_ladder=ladder,
        pool_huge_entries=huge,
        table_budget_rows=budget,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def binning_overflow(scene, view, proj, cam_pos, cfg: RenderConfig):
    """(overflow, truncated) binning diagnostics for one pose — the cheap
    guard a training/viewing loop runs to detect that the camera (or the
    evolving scene) has outgrown a tuned pool ladder.  Both are 0 in
    normal operation; nonzero means splats were demoted/dropped and the
    config should be re-tuned (see autotune_orbit's margin policy)."""
    splats = project(scene, view, proj, cam_pos, cfg)
    b = binning.bin_splats(splats, cfg)
    return b.overflow, b.truncated


def orbit_probe_poses(center, radius, width, height, n_azimuth: int = 8,
                      radii_scales=(0.7, 1.0, 1.6), fovy: float = 1.0):
    """Representative probe poses for autotuning a MOVING camera: an orbit
    ring at several radii (closer poses grow per-splat pixel footprints,
    so probing the closest expected approach bounds the pool sizes).

    Returns (views, projs, cam_positions) as numpy arrays.
    """
    from gaussiansplattingviewer_tpu.utils import transforms as tf
    from gaussiansplattingviewer_tpu.utils.camera import Camera

    cam = Camera(h=height, w=width)
    cam.fovy = fovy
    proj = np.asarray(cam.get_project_matrix(), np.float32)
    center = np.asarray(center, np.float32)
    views, projs, poss = [], [], []
    for rs in radii_scales:
        for i in range(n_azimuth):
            ang = 2 * np.pi * i / n_azimuth
            eye = center + float(radius) * rs * np.array(
                [np.sin(ang), 0.25, np.cos(ang)], np.float32
            )
            views.append(np.asarray(tf.look_at(eye, center, [0, -1, 0]),
                                    np.float32))
            projs.append(proj)
            poss.append(eye.astype(np.float32))
    return views, projs, poss


def autotune_orbit(scene, cfg: RenderConfig, center=None, radius=None,
                   n_azimuth: int = 8, radii_scales=(0.7, 1.0, 1.6),
                   fovy: float = 1.0, safety: float = 1.2,
                   **kw) -> RenderConfig:
    """Autotune for a MOVING camera: probe an orbit of poses around the
    scene (several azimuths x several radii) instead of a single pose.

    Margin policy: the tuned capacity covers the elementwise-MAX footprint
    over all probe poses, inflated by ``safety`` (default 1.2).  That
    guarantees zero demotions for any pose whose per-splat footprints stay
    within 1.2x of the probed envelope — in practice any camera on or
    outside the probed inner ring (``min(radii_scales) * radius``).
    Cameras that approach CLOSER than the probed inner ring can exceed it;
    either include the closest expected approach in ``radii_scales`` or
    monitor ``binning_overflow`` and re-tune when it fires (apps/train.py
    does exactly that for the evolving-scene case).
    """
    if center is None or radius is None:
        bbox, centroid = scene.aabb()
        lo, hi = np.asarray(bbox[0]), np.asarray(bbox[1])
        if center is None:
            center = centroid
        if radius is None:
            radius = max(float(np.linalg.norm(hi - lo)) / 2, 1e-3)
    views, projs, poss = orbit_probe_poses(
        center, radius, cfg.width, cfg.height, n_azimuth, radii_scales, fovy
    )
    return autotune(scene, views, projs, poss, cfg, safety=safety, **kw)


def _capacity_of(cfg: RenderConfig, n: int) -> int:
    """Total duplicate-slot capacity of a tuned config (the volume every
    per-slot cost — keygen, sort, classic fold — scales with)."""
    span_cap = cfg.num_tiles
    if cfg.max_tiles_per_gaussian > 0:
        span_cap = min(span_cap, cfg.max_tiles_per_gaussian)
    cap = cfg.dense_small_slots * n
    for kx, c in cfg.pool_ladder:
        cap += int(kx) * int(c)
    huge = cfg.pool_huge_entries or max(n // cfg.pool_huge_fraction, 32)
    return cap + span_cap * huge


_FUSED_K_GRID = (256, 512, 1024, 2048, 4096, 8192)


def tune_fused(scene, views, projs, cam_positions, cfg: RenderConfig,
               fused: bool | None = None, max_probe_poses: int = 4,
               margin_prefix: float = 1.15, margin_residual: float = 1.5,
               margin_grad: float = 1.15) -> RenderConfig:
    """Decide and size the fused prefix/residual/compact-grad path
    (ops/fused.py) from measured per-tile saturation.

    Runs ONE full-table train forward per probe pose (fused.probe_forward)
    to measure per-tile list lengths, actually-consumed rows (early-stop),
    and saturation; then

      * enables fused_grad iff the compact id fold beats the slot-dense
        fold: (processed rows + N) < 0.6 * slot capacity (at the 1M bench
        scene ~80% of rows are live-processed and the fused path is a
        measured wash-to-loss; at garden scale 81% is dead weight and it
        is the single biggest win — PERF.md r4);
      * picks prefix_rows K from a grid minimizing
        sum(min(count, K)) + 1.4 * residual_rows(K), falling back to
        single-pass (K = 0) when no K beats 0.9x the full gather;
      * sets the three static budgets with margins (prefix x1.15,
        residual x1.5, grad x1.3) — the overflow diagnostics
        (``truncated``, ``grad_rows_dropped``) report any later pose that
        outgrows them, same retune contract as the pool ladder.

    fused=True forces enablement, False skips entirely, None decides.
    """
    if fused is False:
        return cfg
    import jax.numpy as jnp

    from gaussiansplattingviewer_tpu.ops import binning as binning_mod
    from gaussiansplattingviewer_tpu.ops.fused import probe_forward

    chunk = binning_mod.KERNEL_CHUNK
    n = int(scene.xyz.shape[0])
    poses = list(zip(views, projs, cam_positions))[:max_probe_poses]
    counts_l, proc_l, sat_l = [], [], []
    for v, p, c in poses:
        splats = project(
            scene, jnp.asarray(v, jnp.float32), jnp.asarray(p, jnp.float32),
            jnp.asarray(c, jnp.float32), cfg,
        )
        counts, processed, sat, _ = probe_forward(splats, cfg)
        counts_l.append(np.asarray(counts))
        proc_l.append(np.asarray(processed))
        sat_l.append(np.asarray(sat))

    proc_tot = max(int(p.sum()) for p in proc_l)
    if fused is None and proc_tot + n >= 0.6 * _capacity_of(cfg, n):
        return cfg  # dead weight too small for the compact fold to win

    live = max(int(c.sum()) for c in counts_l)
    best = (0.9 * live, 0)  # single-pass fallback threshold
    for k in _FUSED_K_GRID:
        kb = rb = 0
        for counts, processed, sat in zip(counts_l, proc_l, sat_l):
            fin = (counts <= k) | (sat & (processed <= k))
            kb = max(kb, int(np.minimum(counts, k).sum()))
            rb = max(rb, int(np.where(fin, 0, counts - k).sum()))
        score = kb + 1.4 * rb
        if score < best[0]:
            best = (score, k)
    k = best[1]

    kb_m = rb_m = g1_m = unfin_m = 0
    for counts, processed, sat in zip(counts_l, proc_l, sat_l):
        if k > 0:
            fin = (counts <= k) | (sat & (processed <= k))
            kb_m = max(kb_m, int(np.minimum(counts, k).sum()))
            rb_m = max(rb_m, int(np.where(fin, 0, counts - k).sum()))
            unfin_m = max(unfin_m, int(np.count_nonzero(~fin)))
            g1_m = max(g1_m, int(np.minimum(processed, k + chunk).sum()))
        else:
            kb_m = max(kb_m, int(counts.sum()))
            g1_m = max(g1_m, int(processed.sum()))
    out = cfg.with_(
        fused_grad=True,
        prefix_rows=k,
        prefix_budget_rows=_round_up(kb_m * margin_prefix, 4096),
        residual_budget_rows=(
            _round_up(rb_m * margin_residual + 4096, 4096) if k else 0
        ),
        grad_budget_rows=_round_up(g1_m * margin_grad, chunk),
        # residual-pass gradient buffer: residual rows + up to 2 slack
        # chunks per unfinished tile (alignment + partial), with margin —
        # the derived fallback (one chunk per IMAGE tile) is mostly-empty
        # and inflates the id fold
        grad_residual_budget_rows=(
            _round_up(
                (rb_m + 2 * chunk * (unfin_m + 8)) * margin_grad, chunk
            )
            if k
            else 0
        ),
    )
    return out


def autotune(scene, views, projs, cam_positions, cfg: RenderConfig,
             probe: bool = False, probe_margin: float = 1.1,
             fused: bool | None = False,
             **kw) -> RenderConfig:
    """measure_counts + tuned_config in one call.

    probe=True additionally runs the binning once per pose under the
    tuned config and re-tightens table_budget_rows to the measured LIVE
    duplicate count (with tight_culling the live count is well below the
    bbox upper bound — on anisotropic scenes the table gather shrinks
    20-40% more).  Costs one extra trace/compile of bin_splats per scene.

    Margin policy: ``safety`` (tuned_config kwarg) inflates the HISTOGRAM
    envelope (pool sizes + the no-probe table budget); ``probe_margin``
    inflates the probe-MEASURED live duplicate count.  The probe measures
    actual liveness on every probe pose, so its default margin is tighter
    (1.1); callers without an overflow-retune loop (e.g. a free-flying
    viewer) that need headroom beyond the probed envelope should raise
    ``probe_margin``, not just ``safety`` — truncation past the budget
    drops splat rows silently unless the ``truncated`` diagnostic is
    monitored.
    """
    counts = measure_counts(scene, views, projs, cam_positions, cfg)
    tuned = tuned_config(cfg, counts, **kw)
    if probe:
        import jax.numpy as jnp

        live = 0
        for v, p, c in zip(views, projs, cam_positions):
            splats = project(
                scene, jnp.asarray(v, jnp.float32),
                jnp.asarray(p, jnp.float32), jnp.asarray(c, jnp.float32),
                tuned,
            )
            b = binning.bin_splats(splats, tuned)
            live = max(live, int(b.num_duplicates))
        # the probe measured the ACTUAL live duplicates (post tight
        # culling) on every probe pose, so a slimmer margin suffices here
        # than on the histogram bound; truncation is caught by the
        # `truncated` diagnostic and the overflow-retune loops
        # (apps/train.py) if a later pose exceeds it.  probe_margin is the
        # caller's knob (see docstring) — safety does NOT apply here.
        rows = max(_round_up(int(live * probe_margin), 4096), 4096)
        tuned = tuned.with_(
            table_budget_rows=min(rows, tuned.table_budget_rows)
        )
    if fused is not False:
        # fused prefix/compact-grad path (needs the tuned table budget in
        # place first — its probe runs a full-table train forward)
        tuned = tune_fused(
            scene, views, projs, cam_positions, tuned, fused=fused
        )
    return tuned
