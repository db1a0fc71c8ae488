"""Autotuned binning pools: identical output, smaller capacity, no demotion.

The pool ladder is a capacity/layout concept only — swapping the default
derived tiers for a scene-tuned explicit ladder (ops/autotune.py) must
change NOTHING about which (tile, depth)-ordered entries exist, hence
bit-identical rendered images (same projection, same blend math, same
stable sort order).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gaussiansplattingviewer_tpu.config import RenderConfig
from gaussiansplattingviewer_tpu.models import random_scene
from gaussiansplattingviewer_tpu.ops import autotune, binning
from gaussiansplattingviewer_tpu.ops.projection import project
from gaussiansplattingviewer_tpu.ops.render import render
from gaussiansplattingviewer_tpu.utils import transforms as tf
from gaussiansplattingviewer_tpu.utils.camera import Camera


def _setup(n=6000, w=160, h=96):
    cfg = RenderConfig(width=w, height=h)
    scene = random_scene(n, sh_degree=1, seed=3, extent=2.0, mean_scale=0.02)
    cam = Camera(h=h, w=w)
    view = tf.look_at([0, 0, 3.0], [0, 0, 0], [0, -1, 0])
    proj = cam.get_project_matrix()
    cam_pos = np.array([0, 0, 3.0], np.float32)
    return cfg, scene, view, proj, cam_pos


def _capacity(splats, cfg):
    """Total slot capacity = length of the sort key buffer."""
    binned = binning.bin_splats(splats, cfg)
    # table is cap_mat + TABLE_PAD rows; use the diagnostic-free proxy:
    return int(binned.table.shape[1] - binning.TABLE_PAD)


def test_tuned_config_shrinks_capacity_without_demotion():
    cfg, scene, view, proj, cam_pos = _setup()
    counts = autotune.measure_counts(
        scene, [view], [proj], [cam_pos], cfg
    )
    tuned = autotune.tuned_config(cfg, counts)
    assert tuned.pool_ladder, "expected an explicit ladder"
    assert tuned.table_budget_rows > 0

    splats = project(
        scene, jnp.asarray(view, jnp.float32), jnp.asarray(proj, jnp.float32),
        jnp.asarray(cam_pos, jnp.float32), cfg,
    )
    b_def = binning.bin_splats(splats, cfg)
    b_tun = binning.bin_splats(splats, tuned)
    # no demotions / spills / truncation under the tuned pools
    assert int(b_tun.overflow) == int(b_def.overflow)
    assert int(b_tun.truncated) == 0
    # same live entries, smaller materialized table
    assert int(b_tun.num_duplicates) == int(b_def.num_duplicates)
    assert b_tun.table.shape[1] <= b_def.table.shape[1]
    np.testing.assert_array_equal(
        np.asarray(b_tun.tile_counts), np.asarray(b_def.tile_counts)
    )


@pytest.mark.parametrize("k1", [1, 2, None])
def test_tuned_render_bit_identical(k1):
    cfg, scene, view, proj, cam_pos = _setup()
    tuned = autotune.autotune(scene, [view], [proj], [cam_pos], cfg, k1=k1)
    img_def = np.asarray(
        render(scene, view, proj, cam_pos, cfg, backend="tile")
    )
    img_tun = np.asarray(
        render(scene, view, proj, cam_pos, tuned, backend="tile")
    )
    np.testing.assert_array_equal(img_tun, img_def)


def test_tuned_grads_match_default():
    import jax

    cfg, scene, view, proj, cam_pos = _setup(n=3000)
    tuned = autotune.autotune(scene, [view], [proj], [cam_pos], cfg)

    def loss(sc, c):
        img = render(sc, view, proj, cam_pos, c, backend="tile")
        return jnp.sum(img * jnp.cos(img))

    g_def = jax.grad(lambda s: loss(s, cfg))(scene)
    g_tun = jax.grad(lambda s: loss(s, tuned))(scene)
    # forward images are bit-identical (test above); gradients differ only
    # by f32 reassociation in the fold (tier membership changes the order
    # a splat's duplicate gradients are summed in)
    for a, b in zip(jax.tree.leaves(g_def), jax.tree.leaves(g_tun)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=2e-4 * scale)


def test_grad_fold_bf16_close_to_f32():
    """cfg.grad_fold_bf16 halves the backward fold's sorted bytes at a
    bounded precision cost (worst observed: scale grads ~2.4% of max via
    conic-path cancellation; everything else <0.2%)."""
    import jax

    cfg, scene, view, proj, cam_pos = _setup(n=3000)
    cfgb = cfg.with_(grad_fold_bf16=True)

    def loss(sc, c):
        img = render(sc, view, proj, cam_pos, c, backend="tile")
        return jnp.sum(img * img)

    g32 = jax.grad(lambda s: loss(s, cfg))(scene)
    g16 = jax.grad(lambda s: loss(s, cfgb))(scene)
    for f in ("xyz", "opacity", "sh", "scale", "rot"):
        a = np.asarray(getattr(g32, f))
        b = np.asarray(getattr(g16, f))
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=0.05 * scale, err_msg=f)


def test_explicit_ladder_demotes_gracefully():
    """An undersized explicit ladder demotes (diagnostic counts it) but
    still renders: entries beyond a tier's capacity clamp coverage."""
    cfg, scene, view, proj, cam_pos = _setup()
    tiny = cfg.with_(
        dense_small_slots=1,
        pool_ladder=((2, 128),),  # way too small for this scene
        pool_huge_entries=8,
        table_budget_rows=0,
    )
    splats = project(
        scene, jnp.asarray(view, jnp.float32), jnp.asarray(proj, jnp.float32),
        jnp.asarray(cam_pos, jnp.float32), cfg,
    )
    b = binning.bin_splats(splats, tiny)
    assert int(b.overflow) > 0
    img = np.asarray(render(scene, view, proj, cam_pos, tiny, backend="tile"))
    assert np.isfinite(img).all()


def test_orbit_autotune_covers_camera_sweep():
    """autotune_orbit margin policy: any camera whose pose stays within
    the probed orbit envelope (azimuths BETWEEN the probes, radii inside
    the probed ring range) renders with zero overflow and truncation."""
    cfg, scene, _, _, _ = _setup()
    tuned = autotune.autotune_orbit(
        scene, cfg, n_azimuth=6, radii_scales=(0.8, 1.0, 1.5)
    )
    scene_d = scene.to_device()
    bbox, center = scene.aabb()
    radius = max(
        float(np.linalg.norm(np.asarray(bbox[1]) - np.asarray(bbox[0]))) / 2,
        1e-3,
    )
    cam = Camera(h=cfg.height, w=cfg.width)
    cam.fovy = 1.0
    proj = jnp.asarray(cam.get_project_matrix(), jnp.float32)
    for rs in (0.85, 1.2):
        for k in range(5):
            ang = 2 * np.pi * (k + 0.37) / 5
            eye = np.asarray(center, np.float32) + radius * rs * np.array(
                [np.sin(ang), 0.25, np.cos(ang)], np.float32
            )
            view = jnp.asarray(
                tf.look_at(eye, center, [0, -1, 0]), jnp.float32
            )
            ovf, trunc = autotune.binning_overflow(
                scene_d, view, proj, jnp.asarray(eye), tuned
            )
            assert int(ovf) == 0 and int(trunc) == 0, (
                f"rs={rs} k={k}: overflow={int(ovf)} truncated={int(trunc)}"
            )


def test_binning_overflow_detects_undersized_ladder():
    """The overflow diagnostic (the re-tune trigger apps/train.py polls)
    fires on a ladder too small for the scene."""
    cfg, scene, view, proj, cam_pos = _setup()
    tiny = cfg.with_(
        dense_small_slots=1,
        pool_ladder=((2, 128),),
        pool_huge_entries=8,
        table_budget_rows=0,
    )
    ovf, _ = autotune.binning_overflow(
        scene.to_device(),
        jnp.asarray(view, jnp.float32),
        jnp.asarray(proj, jnp.float32),
        jnp.asarray(cam_pos),
        tiny,
    )
    assert int(ovf) > 0
