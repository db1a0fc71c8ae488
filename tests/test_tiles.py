"""Tile-binned rasterizer tests: binning invariants + allclose vs oracle.

This automates the comparison the reference could only do by eye via its
backend-switch flip test (README.md:55)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode
from gaussiansplattingviewer_tpu.models import naive_gaussian, random_scene
from gaussiansplattingviewer_tpu.ops import binning
from gaussiansplattingviewer_tpu.ops.projection import project
from gaussiansplattingviewer_tpu.ops.render import render
from gaussiansplattingviewer_tpu.utils import transforms as tf
from gaussiansplattingviewer_tpu.utils.camera import Camera


def _setup(cfg, scene=None):
    if scene is None:
        scene, _, _ = naive_gaussian()
    cam = Camera(h=cfg.height, w=cfg.width)
    view = tf.look_at([0, 0, 3], [0, 0, 0], [0, -1, 0])
    proj = cam.get_project_matrix()
    cam_pos = np.array([0, 0, 3.0], np.float32)
    return scene.to_device(), view, proj, cam_pos


def test_binning_invariants():
    cfg = RenderConfig(width=160, height=96)
    scene, view, proj, cam_pos = _setup(cfg)
    sp = project(scene, view, proj, cam_pos, cfg)
    b = binning.bin_splats(sp, cfg)
    starts = np.asarray(b.tile_starts)
    counts = np.asarray(b.tile_counts)
    assert starts.shape == (cfg.num_tiles + 1,)
    assert counts.shape == (cfg.num_tiles,)
    assert np.all(np.diff(starts) >= 0)
    # compact layout: counts are exactly the segment lengths
    np.testing.assert_array_equal(counts, np.diff(starts))
    assert int(b.overflow) == 0
    assert int(b.num_duplicates) == counts.sum() == starts[-1]
    table = np.asarray(b.table).T  # attribute-major -> rows
    # kernels read a SEGMENT_ALIGN window past the live region; that tail
    # pad must exist
    assert table.shape[0] >= starts[-1] + binning.SEGMENT_ALIGN
    for t in range(cfg.num_tiles):
        seg = table[starts[t] : starts[t + 1], binning.COL_DEPTH]
        assert np.all(np.diff(seg) >= 0), f"tile {t} not depth sorted"
    # visible naive splats produce at least one duplicate each
    assert counts.sum() >= 3


def test_tile_center_membership():
    """The tile containing the image center must reference the two centered
    splats (magenta depth 3, blue depth 2), nearest first."""
    cfg = RenderConfig(width=160, height=96)
    scene, view, proj, cam_pos = _setup(cfg)
    sp = project(scene, view, proj, cam_pos, cfg)
    b = binning.bin_splats(sp, cfg)
    starts = np.asarray(b.tile_starts)
    counts = np.asarray(b.tile_counts)
    tx = (cfg.width // 2) // cfg.tile_size
    ty = (cfg.height // 2) // cfg.tile_size
    t = ty * cfg.tiles_x + tx
    seg = np.asarray(b.table).T[starts[t] : starts[t] + counts[t]]
    depths = seg[:, binning.COL_DEPTH]
    assert len(depths) >= 2
    assert np.isclose(depths[0], 2.0, atol=1e-5)  # blue first (nearest)
    assert np.any(np.isclose(depths, 3.0, atol=1e-5))


@pytest.mark.parametrize(
    "mode",
    [
        RenderMode.SH0,
        RenderMode.SH3,
        RenderMode.DEPTH,
        RenderMode.BILLBOARD,
        RenderMode.FLAT_BALL,
        RenderMode.GAUSSIAN_BALL,
    ],
)
def test_tile_matches_oracle_naive(mode):
    cfg = RenderConfig(width=160, height=96, mode=mode, background=0.1)
    scene, view, proj, cam_pos = _setup(cfg)
    img_o = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="oracle"))
    img_t = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="tile"))
    np.testing.assert_allclose(img_t, img_o, atol=1e-5)


def test_tile_matches_oracle_random_scene():
    """2000 random splats, SH deg 3, non-tile-aligned resolution.
    dup_factor is raised so no splat hits the per-splat tile cap: with a
    sufficient budget the tile path matches the (uncapped) oracle exactly."""
    cfg = RenderConfig(width=150, height=90, dup_factor=64)
    scene = random_scene(2000, sh_degree=3, seed=11, extent=2.5, mean_scale=0.05)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    img_o = np.asarray(render(scene_d, view, proj, cam_pos, cfg, backend="oracle"))
    img_t = np.asarray(render(scene_d, view, proj, cam_pos, cfg, backend="tile"))
    assert img_o.max() > 0.05  # scene is actually visible
    np.testing.assert_allclose(img_t, img_o, atol=2e-4)


def test_tile_padded_scene_matches_unpadded():
    cfg = RenderConfig(width=160, height=96)
    scene = random_scene(500, sh_degree=1, seed=3, extent=2.0, mean_scale=0.05)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    img_a = np.asarray(render(scene_d, view, proj, cam_pos, cfg, backend="tile"))
    padded = scene.pad_to_multiple(256).to_device()
    img_b = np.asarray(render(padded, view, proj, cam_pos, cfg, backend="tile"))
    np.testing.assert_allclose(img_a, img_b, atol=1e-6)


def test_dup_overflow_counted():
    """A huge splat covering everything must trip the overflow counter,
    not crash or drop the frame."""
    cfg = RenderConfig(width=160, height=96, max_tiles_per_gaussian=4)
    scene, view, proj, cam_pos = _setup(cfg)
    scene.scale = jnp.asarray(scene.scale) * 50.0
    sp = project(scene, view, proj, cam_pos, cfg)
    b = binning.bin_splats(sp, cfg)
    assert int(b.overflow) > 0
    assert int(b.num_duplicates) <= 4 * len(scene.xyz)


def test_tight_culling_output_exact():
    """Tight ellipse/rect tile culling may only drop tiles whose max alpha
    is below the 1/255 cutoff — i.e. tiles that contribute exactly zero.
    The rendered image must be identical with it on or off, while the
    duplicate count must not grow."""
    cfg_on = RenderConfig(width=160, height=96, tight_culling=True)
    cfg_off = cfg_on.with_(tight_culling=False)
    scene = random_scene(512, sh_degree=2, seed=3, extent=1.5, mean_scale=0.1)
    scene, view, proj, cam_pos = _setup(cfg_on, scene)

    img_on = np.asarray(render(scene, view, proj, cam_pos, cfg_on, backend="tile"))
    img_off = np.asarray(render(scene, view, proj, cam_pos, cfg_off, backend="tile"))
    np.testing.assert_allclose(img_on, img_off, rtol=0, atol=1e-6)

    sp = project(scene, jnp.asarray(view, jnp.float32), jnp.asarray(proj, jnp.float32), jnp.asarray(cam_pos), cfg_on)
    d_on = int(binning.bin_splats(sp, cfg_on).num_duplicates)
    d_off = int(binning.bin_splats(sp, cfg_off).num_duplicates)
    assert d_on <= d_off
    assert d_on > 0


def test_pool_demotion_and_spill_graceful():
    """Force the pools over capacity so demotion, spill, AND the mid pool
    actually run (n must exceed the 4096 pool floor for any partition to
    bind — with small n every splat fits, which is what an earlier version
    of this test silently tested).  Demoted/spilled splats must clamp
    (overflow counted) while binning invariants hold and the render stays
    finite; the c2>0 gradient fold must also execute."""
    import jax

    # n > 4096 so pool capacities (max(n//frac, 4096)) can be exceeded;
    # big splats so most need more than k1 tiles
    cfg = RenderConfig(width=160, height=96)
    scene = random_scene(12000, sh_degree=0, seed=7, extent=1.0, mean_scale=0.6)
    scene, view, proj, cam_pos = _setup(cfg, scene)
    sp = project(scene, jnp.asarray(view, jnp.float32),
                 jnp.asarray(proj, jnp.float32), jnp.asarray(cam_pos), cfg)
    b = binning.bin_splats(sp, cfg)
    starts = np.asarray(b.tile_starts)
    counts = np.asarray(b.tile_counts)
    np.testing.assert_array_equal(counts, np.diff(starts))
    assert int(b.num_duplicates) == counts.sum()

    # recompute the partition the way bin_splats does and assert the
    # exhaustion paths genuinely trigger on this workload
    n = 12000
    num_tiles = cfg.num_tiles
    k1, k2f = 4, 12
    ch = max(n // cfg.pool_huge_fraction, 32)
    c1 = max(n // cfg.pool_full_fraction, 4096)
    c2 = min(n - ch - c1, max(n // cfg.pool_mid_fraction, 4096))
    assert c2 > 0  # the mid pool partition is active
    x0, y0, w, h, count, _ = binning.tile_bbox(sp, cfg)
    count = np.asarray(count)
    n_huge = int((count > k1 + k2f).sum())
    n_needy = int((count > k1).sum())
    # more hungry splats than pool entries -> demotion/spill must occur
    assert n_huge > ch
    assert n_needy > ch + c1 + c2
    assert int(b.overflow) > 0

    img = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="tile"))
    assert np.isfinite(img).all() and img.max() > 0

    # the c2>0 / ch>0 backward fold must execute and stay finite
    def loss(sc):
        return jnp.sum(
            render(sc, jnp.asarray(view, jnp.float32),
                   jnp.asarray(proj, jnp.float32),
                   jnp.asarray(cam_pos), cfg, backend="tile") ** 2
        )

    grads = jax.grad(loss)(scene)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_unbounded_tile_coverage_close_up():
    """A close-up splat spanning far more than the old 16-tile cap must
    cover every tile it overlaps (reference quad semantics,
    gau_vert.glsl:174-178): tile backend matches the (uncapped) oracle
    exactly and the overflow diagnostic stays zero."""
    # table_budget_factor scales the materialized table in units of N; a
    # 4-splat scene where one splat covers ~240 tiles needs a much larger
    # per-splat budget than the default 8
    cfg = RenderConfig(width=320, height=192, table_budget_factor=128)
    scene, _, _ = naive_gaussian()
    # blow up the central splat so its footprint spans most of the screen
    scene.scale = np.asarray(scene.scale).copy()
    scene.scale[0] = 1.2
    scene.opacity = np.asarray(scene.opacity).copy()
    scene.opacity[0] = 0.95
    scene, view, proj, cam_pos = _setup(cfg, scene)

    sp = project(scene, jnp.asarray(view, jnp.float32),
                 jnp.asarray(proj, jnp.float32), jnp.asarray(cam_pos), cfg)
    _, _, w, h, count, _ = binning.tile_bbox(sp, cfg)
    assert int(np.asarray(count).max()) > 16  # genuinely beyond the old cap
    b = binning.bin_splats(sp, cfg)
    assert int(b.overflow) == 0
    assert int(b.truncated) == 0

    img_o = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="oracle"))
    img_t = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="tile"))
    np.testing.assert_allclose(img_t, img_o, atol=2e-5)
