"""Aux subsystem tests: profiling counters, checkpoint/resume."""

import numpy as np
import jax.numpy as jnp

from gaussiansplattingviewer_tpu.models import random_scene
from gaussiansplattingviewer_tpu.models.checkpoint import (
    latest_step,
    load_npz,
    load_train_state,
    save_npz,
    save_train_state,
)
from gaussiansplattingviewer_tpu.utils.profiling import (
    FrameTimer,
    render_stats,
)


def test_npz_roundtrip(tmp_path):
    scene = random_scene(64, sh_degree=2, seed=0)
    p = tmp_path / "scene.npz"
    save_npz(scene, p)
    back = load_npz(p)
    np.testing.assert_allclose(back.xyz, scene.xyz)
    np.testing.assert_allclose(back.sh, scene.sh)


def test_train_state_roundtrip(tmp_path):
    import optax

    scene = random_scene(32, sh_degree=0, seed=1).to_device()
    opt = optax.adam(1e-3)
    opt_state = opt.init(scene)
    save_train_state(str(tmp_path), 7, scene, opt_state)
    restored, opt_restored = load_train_state(
        str(tmp_path), 7, scene, opt_state
    )
    np.testing.assert_allclose(np.asarray(restored.xyz), np.asarray(scene.xyz))
    assert latest_step(str(tmp_path)) == 7


def test_frame_timer_counts():
    x = jnp.arange(1024.0)
    timer = FrameTimer(lambda: (x * 2).sum(), pixels=1000)
    stats = timer.run(iters=3, warmup=1)
    assert stats["ms_per_frame"] > 0 and stats["mpix_s"] > 0


def test_render_stats():
    aux = {
        "transmittance": jnp.full((4, 4), 0.5),
        "num_duplicates": jnp.int32(12),
        "overflow": jnp.int32(0),
        "truncated": jnp.int32(0),
    }
    s = render_stats(aux)
    assert s == {
        "mean_transmittance": 0.5,
        "num_duplicates": 12,
        "overflow": 0,
        "truncated": 0,
    }


def test_debug_mode_nan_splat_diagnostic():
    """cfg.debug (sanitizer mode): a NaN scene parameter must surface as a
    clean scalar diagnostic in render_with_aux, for both the production
    tile path and the oracle."""
    import dataclasses

    from gaussiansplattingviewer_tpu.config import RenderConfig
    from gaussiansplattingviewer_tpu.ops.render import render_with_aux
    from gaussiansplattingviewer_tpu.utils import transforms as tf
    from gaussiansplattingviewer_tpu.utils.camera import Camera

    cfg = RenderConfig(width=64, height=48, debug=True)
    scene = random_scene(128, sh_degree=0, seed=3, extent=1.5,
                         mean_scale=0.08)
    xyz = np.asarray(scene.xyz).copy()
    xyz[5] = np.nan  # poisoned splat
    scene = dataclasses.replace(scene, xyz=jnp.asarray(xyz))

    cam = Camera(h=cfg.height, w=cfg.width)
    view = tf.look_at([0, 0, 3], [0, 0, 0], [0, -1, 0])
    proj = cam.get_project_matrix()
    cam_pos = np.array([0, 0, 3.0], np.float32)

    for backend in ("tile", "oracle"):
        img, aux = render_with_aux(
            scene.to_device(), view, proj, cam_pos, cfg, backend=backend
        )
        assert "nonfinite_splats" in aux and "nonfinite_pixels" in aux
        # NaN xyz fails the frustum test -> splat invalid -> the image
        # stays clean and the diagnostic must not fire on masked splats
        assert int(aux["nonfinite_pixels"]) == 0
        assert np.isfinite(np.asarray(img)).all()

    # a NaN in a *valid* splat's opacity poisons alpha: valid stays True
    # (opacity>0 comparison with NaN is False.. so force via conic route);
    # poison a color channel instead — valid, finite-xyz splat
    scene2 = random_scene(128, sh_degree=0, seed=3, extent=1.5,
                          mean_scale=0.08)
    sh = np.asarray(scene2.sh).copy()
    sh[7, :3] = np.nan  # DC coeffs -> NaN color
    scene2 = dataclasses.replace(scene2, sh=jnp.asarray(sh))
    img, aux = render_with_aux(
        scene2.to_device(), view, proj, cam_pos, cfg, backend="tile"
    )
    assert int(aux["nonfinite_splats"]) >= 1
