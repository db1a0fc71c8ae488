"""Backward-pass tests: tile-backend gradients vs the autodiff oracle and
finite differences (BASELINE config 4: grads w.r.t. means/scales/rots/
opacity/SH allclose).

Tolerance budget (measured, not guessed): on the CPU backend the tile/
pallas custom-VJP path agrees with the oracle to ~1e-6 relative on every
field (both run exact f32; the only differences are summation order in the
chunked blend and the binning fold).  Tests assert 1e-5 * max|g| — 10x
measured headroom, 200x tighter than the bound a gradient-descent consumer
needs.  On REAL TPU hardware the pallas kernels add the log/exp prefix
factorization and MXU 3-pass-split scans; cross-backend agreement there is
~2.5e-4 relative (scripts/tpu_gradcheck.py, PARITY.md) — f32 reassociation
at 128-splat chunk granularity, not an implementation defect."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode
from gaussiansplattingviewer_tpu.models import naive_gaussian, random_scene
from gaussiansplattingviewer_tpu.ops.render import render
from gaussiansplattingviewer_tpu.utils import transforms as tf
from gaussiansplattingviewer_tpu.utils.camera import Camera

FIELDS = ("xyz", "rot", "scale", "opacity", "sh")


def _setup(cfg, scene=None):
    if scene is None:
        scene, _, _ = naive_gaussian()
    cam = Camera(h=cfg.height, w=cfg.width)
    view = tf.look_at([0, 0, 3], [0, 0, 0], [0, -1, 0])
    proj = cam.get_project_matrix()
    cam_pos = np.array([0, 0, 3.0], np.float32)
    return scene.to_device(), view, proj, cam_pos


def _loss_fn(view, proj, cam_pos, cfg, backend, weights):
    def loss(scene):
        img = render(scene, view, proj, cam_pos, cfg, backend=backend)
        return jnp.sum(img * weights)

    return loss


@pytest.mark.parametrize("mode", [RenderMode.SH0, RenderMode.DEPTH])
def test_tile_grads_match_oracle_naive(mode):
    cfg = RenderConfig(width=96, height=64, mode=mode, grad_fold_bf16=False)
    scene, view, proj, cam_pos = _setup(cfg)
    rng = np.random.default_rng(0)
    weights = jnp.asarray(
        rng.normal(size=(cfg.height, cfg.width, 3)).astype(np.float32)
    )
    g_o = jax.grad(_loss_fn(view, proj, cam_pos, cfg, "oracle", weights))(scene)
    g_t = jax.grad(_loss_fn(view, proj, cam_pos, cfg, "tile", weights))(scene)
    for f in FIELDS:
        a, b = np.asarray(getattr(g_o, f)), np.asarray(getattr(g_t, f))
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b, a, atol=1e-5 * scale, err_msg=f)
        if mode == RenderMode.SH0 and f in ("xyz", "opacity", "sh", "scale"):
            assert np.abs(a).max() > 0, f  # grads actually flow
        if mode == RenderMode.DEPTH and f in ("xyz", "opacity"):
            # depth mode: color is pure geometry; sh grads are rightly zero
            assert np.abs(a).max() > 0, f


def test_tile_grads_match_oracle_random():
    cfg = RenderConfig(width=80, height=48, mode=RenderMode.SH3,
                       grad_fold_bf16=False)
    scene = random_scene(300, sh_degree=3, seed=9, extent=2.0, mean_scale=0.06)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    rng = np.random.default_rng(1)
    weights = jnp.asarray(
        rng.normal(size=(cfg.height, cfg.width, 3)).astype(np.float32)
    )
    g_o = jax.grad(_loss_fn(view, proj, cam_pos, cfg, "oracle", weights))(scene_d)
    g_t = jax.grad(_loss_fn(view, proj, cam_pos, cfg, "tile", weights))(scene_d)
    for f in FIELDS:
        a, b = np.asarray(getattr(g_o, f)), np.asarray(getattr(g_t, f))
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b, a, atol=1e-5 * scale, err_msg=f)


def test_pallas_bwd_matches_oracle():
    cfg = RenderConfig(width=64, height=32, mode=RenderMode.SH0,
                       grad_fold_bf16=False)
    scene, view, proj, cam_pos = _setup(cfg)
    rng = np.random.default_rng(2)
    weights = jnp.asarray(
        rng.normal(size=(cfg.height, cfg.width, 3)).astype(np.float32)
    )
    g_o = jax.grad(_loss_fn(view, proj, cam_pos, cfg, "oracle", weights))(scene)
    g_p = jax.grad(_loss_fn(view, proj, cam_pos, cfg, "pallas", weights))(scene)
    for f in FIELDS:
        a, b = np.asarray(getattr(g_o, f)), np.asarray(getattr(g_p, f))
        scale = np.abs(a).max() + 1e-6
        # the pallas kernels' log/exp prefix factorization adds ~3e-6
        # relative per factor on top of reassociation (measured 1.1e-5
        # worst field) — 3x looser than the tile bound, still ~100x
        # tighter than any consumer needs
        np.testing.assert_allclose(b, a, atol=3e-5 * scale, err_msg=f)


def test_finite_difference_opacity_and_xyz():
    """Central finite differences on single parameters vs the tile VJP."""
    cfg = RenderConfig(width=64, height=48, mode=RenderMode.SH0)
    scene, view, proj, cam_pos = _setup(cfg)
    # random weights break the symmetry of sum-loss (whose true position
    # gradient is ~0 for a centered splat) so signal >> f32 FD noise
    rng = np.random.default_rng(5)
    weights = jnp.asarray(
        rng.normal(size=(cfg.height, cfg.width, 3)).astype(np.float32)
    )
    loss = _loss_fn(view, proj, cam_pos, cfg, "tile", weights)
    g = jax.grad(loss)(scene)

    def fd(field, idx, eps):
        import dataclasses

        def shift(sign):
            arr = np.array(getattr(scene, field))
            arr[idx] += sign * eps
            s2 = dataclasses.replace(scene, **{field: jnp.asarray(arr)})
            return float(loss(s2))

        return (shift(+1) - shift(-1)) / (2 * eps)

    for field, idx, eps in [
        ("opacity", (0, 0), 1e-2),
        ("xyz", (0, 0), 3e-3),
        ("xyz", (3, 2), 3e-3),
        # note: sh[0,1] (green DC of the magenta splat) sits exactly in the
        # color>=0 clamp (raw approx -8e-6), so its analytic grad is a true
        # zero; probe the unclamped red channel instead
        ("sh", (0, 0), 1e-2),
        ("scale", (0, 0), 2e-3),
    ]:
        analytic = float(np.asarray(getattr(g, field))[idx])
        numeric = fd(field, idx, eps)
        assert np.isclose(analytic, numeric, rtol=5e-2, atol=5e-2), (
            field,
            idx,
            analytic,
            numeric,
        )


def test_grad_zero_for_culled_splats():
    cfg = RenderConfig(width=64, height=32)
    scene, view, proj, cam_pos = _setup(cfg)
    # put one splat far outside the frustum
    xyz = np.array(scene.xyz)
    xyz[1] = [100.0, 0, 0]
    import dataclasses

    scene = dataclasses.replace(scene, xyz=jnp.asarray(xyz))
    weights = jnp.ones((cfg.height, cfg.width, 3), jnp.float32)
    g = jax.grad(_loss_fn(view, proj, cam_pos, cfg, "tile", weights))(scene)
    np.testing.assert_allclose(np.asarray(g.opacity)[1], 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(g.sh)[1], 0.0, atol=1e-8)


def test_default_cfg_grads_close_to_f32_fold():
    """The DEFAULT config folds duplicate gradients through packed-bf16
    sort payloads (config.grad_fold_bf16); its gradients must stay within
    a small relative envelope of the exact-f32 fold on every field."""
    cfg = RenderConfig(width=96, height=64)
    assert cfg.grad_fold_bf16  # the production default under test
    scene = random_scene(2000, sh_degree=1, seed=7, extent=2.0, mean_scale=0.04)
    scene, view, proj, cam_pos = _setup(cfg, scene)
    rng = np.random.default_rng(1)
    weights = jnp.asarray(
        rng.normal(size=(cfg.height, cfg.width, 3)).astype(np.float32)
    )
    g16 = jax.grad(_loss_fn(view, proj, cam_pos, cfg, "tile", weights))(scene)
    cfg32 = cfg.with_(grad_fold_bf16=False)
    g32 = jax.grad(_loss_fn(view, proj, cam_pos, cfg32, "tile", weights))(scene)
    # measured envelopes on this scene (round 4): xyz 0.18%, rot 0.66%,
    # scale 1.03%, opacity 0.15%, sh 0.29% of per-field max-abs; bounds are
    # ~2x the measurement.  NOTE these budgets are SCENE/SEED-SPECIFIC
    # (this scene, seed 7, this sort tie order): a benign numeric change
    # (different tie order, compiler update, another platform) may exceed
    # the 2x headroom on one field — if that happens, re-measure the f32
    # vs bf16 delta here and reset the budgets to ~2x the fresh
    # measurement rather than loosening them blindly.  The default is
    # additionally gated end-to-end by tests/test_train_quality.py
    # (self-distill A/B, <0.1 dB PSNR).
    budget = {"xyz": 0.005, "rot": 0.015, "scale": 0.025,
              "opacity": 0.005, "sh": 0.008}
    for f in FIELDS:
        a, b = np.asarray(getattr(g32, f)), np.asarray(getattr(g16, f))
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b, a, atol=budget[f] * scale, err_msg=f)
