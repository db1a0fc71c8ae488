"""Pallas blend kernel vs the XLA tile executor and the oracle.

On CPU the kernel runs in interpreter mode (same math, no Mosaic); the
driver's bench exercises the compiled path on real TPU hardware."""

import numpy as np
import pytest

from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode
from gaussiansplattingviewer_tpu.models import naive_gaussian, random_scene
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


@pytest.mark.parametrize(
    "mode",
    [RenderMode.SH0, RenderMode.DEPTH, RenderMode.BILLBOARD, RenderMode.GAUSSIAN_BALL],
)
def test_pallas_matches_xla_naive(mode):
    cfg = RenderConfig(width=96, height=64, mode=mode, background=0.2)
    scene, view, proj, cam_pos = _setup(cfg)
    img_x = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="tile"))
    img_p = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="pallas"))
    np.testing.assert_allclose(img_p, img_x, atol=1e-5)


def test_pallas_matches_oracle_random():
    cfg = RenderConfig(width=96, height=64)
    scene = random_scene(600, sh_degree=2, seed=21, extent=2.0, mean_scale=0.06)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    img_o = np.asarray(render(scene_d, view, proj, cam_pos, cfg, backend="oracle"))
    img_p = np.asarray(render(scene_d, view, proj, cam_pos, cfg, backend="pallas"))
    assert img_o.max() > 0.05
    np.testing.assert_allclose(img_p, img_o, atol=2e-4)


def test_pallas_empty_tiles_background():
    cfg = RenderConfig(width=96, height=64, background=0.7)
    scene, view, proj, cam_pos = _setup(cfg)
    scene.opacity = scene.opacity * 0.0
    img = np.asarray(render(scene, view, proj, cam_pos, cfg, backend="pallas"))
    np.testing.assert_allclose(img, 0.7, atol=1e-6)


# ---------------------------------------------------------------------------
# Split-precision MXU scan primitives (ADVICE r3): the passes=2/3 split
# matmuls only run compiled on TPU (interpret mode uses passes=1), so pin
# their error bounds in CI against an f64 oracle directly.
# ---------------------------------------------------------------------------


def test_tri_matmul_split_passes_error_bounds():
    import jax.numpy as jnp

    from gaussiansplattingviewer_tpu.ops.pallas.tile_raster_fwd import (
        _tri_matmul_f32,
    )

    rng = np.random.default_rng(7)
    x = rng.standard_normal((64, 128)).astype(np.float32) * np.exp(
        rng.uniform(-6, 6, (64, 128))
    ).astype(np.float32)
    ri, ci = np.indices((128, 128))
    tri = (ri > ci).astype(np.float32)
    oracle = x.astype(np.float64) @ tri.astype(np.float64)

    # passes=2: hi+mid capture ~16 mantissa bits -> 2^-18 per term (+
    # headroom); passes=3: full f32 splits, limited by the 2 f32 adds of
    # the recombination (~2 ulp)
    for passes, bound in ((2, 2.0**-17), (3, 2.0**-21)):
        got = np.asarray(
            _tri_matmul_f32(jnp.asarray(x), jnp.asarray(tri), passes=passes)
        ).astype(np.float64)
        # error relative to the magnitude sum |x| @ tri (the split's bound
        # is per-term: hi+mid captures ~16 bits, +lo ~24 bits)
        mag = np.abs(x).astype(np.float64) @ tri.astype(np.float64)
        err = np.abs(got - oracle) / np.maximum(mag, 1e-30)
        assert err.max() < bound, (passes, err.max())


def test_exclusive_cumprod_lanes_split_vs_f64():
    import jax.numpy as jnp

    from gaussiansplattingviewer_tpu.ops.pallas.tile_raster_fwd import (
        _exclusive_cumprod_lanes,
    )

    rng = np.random.default_rng(8)
    # transmittance-like factors in (0, 1], including near-0 and near-1
    x = np.clip(rng.uniform(0.0, 1.0, (32, 128)) ** 0.25, 1e-6, 1.0).astype(
        np.float32
    )
    oracle = np.ones_like(x, dtype=np.float64)
    oracle[:, 1:] = np.cumprod(x.astype(np.float64), axis=1)[:, :-1]

    got = np.asarray(_exclusive_cumprod_lanes(jnp.asarray(x), exact=False))
    # same-sign log sums: 2-pass split keeps the prefix exact to ~2^-18
    # relative, plus the log/exp round-trip (~3e-6 rel); anything above the
    # 1e-4 early-stop threshold must agree to ~1e-4 relative
    mask = oracle > 1e-6
    rel = np.abs(got.astype(np.float64) - oracle) / np.maximum(oracle, 1e-30)
    assert rel[mask].max() < 1e-4, rel[mask].max()
