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
