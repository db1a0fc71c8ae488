"""Multi-chip tests on the virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8 — the standard topology-without-
hardware JAX trick, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiansplattingviewer_tpu.config import RenderConfig
from gaussiansplattingviewer_tpu.models import naive_gaussian, random_scene
from gaussiansplattingviewer_tpu.ops.render import render
from gaussiansplattingviewer_tpu.parallel import (
    make_mesh,
    make_sharded_render_fn,
    make_sharded_train_step,
    replicate_scene,
)
from gaussiansplattingviewer_tpu.utils import transforms as tf
from gaussiansplattingviewer_tpu.utils.camera import Camera


def _setup(cfg, scene=None):
    if scene is None:
        scene, _, _ = naive_gaussian()
    cam = Camera(h=cfg.height, w=cfg.width)
    view = jnp.asarray(tf.look_at([0, 0, 3], [0, 0, 0], [0, -1, 0]))
    proj = jnp.asarray(cam.get_project_matrix())
    cam_pos = jnp.asarray(np.array([0, 0, 3.0], np.float32))
    return scene.to_device(), view, proj, cam_pos


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_matches_single_chip(n_dev):
    cfg = RenderConfig(width=160, height=96)
    scene = random_scene(800, sh_degree=1, seed=4, extent=2.0, mean_scale=0.06)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    img_ref = np.asarray(render(scene_d, view, proj, cam_pos, cfg, backend="tile"))

    mesh = make_mesh(n_dev)
    scene_r = replicate_scene(scene_d, mesh)
    fn = make_sharded_render_fn(mesh, cfg, use_pallas=False)
    img_sh = np.asarray(fn(scene_r, view, proj, cam_pos))
    assert img_sh.shape == img_ref.shape
    np.testing.assert_allclose(img_sh, img_ref, atol=1e-5)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_interleaved_sharding_matches_single_chip(n_dev):
    """Round-robin tile-row assignment (load-balance mode) must produce the
    exact same image as the contiguous-band default and as a single chip."""
    cfg = RenderConfig(width=160, height=96)
    scene = random_scene(800, sh_degree=1, seed=4, extent=2.0, mean_scale=0.06)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    img_ref = np.asarray(render(scene_d, view, proj, cam_pos, cfg, backend="tile"))

    mesh = make_mesh(n_dev)
    scene_r = replicate_scene(scene_d, mesh)
    fn = make_sharded_render_fn(mesh, cfg, use_pallas=False, interleaved=True)
    img_sh = np.asarray(fn(scene_r, view, proj, cam_pos))
    assert img_sh.shape == img_ref.shape
    np.testing.assert_allclose(img_sh, img_ref, atol=1e-5)


def test_interleaved_grads_match_single_chip():
    cfg = RenderConfig(width=96, height=96)
    scene = random_scene(300, sh_degree=0, seed=6, extent=2.0, mean_scale=0.06)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)

    mesh = make_mesh(4)
    fn = make_sharded_render_fn(mesh, cfg, use_pallas=False, interleaved=True)

    def loss_sh(sc):
        return jnp.sum(fn(sc, view, proj, cam_pos) ** 2)

    def loss_ref(sc):
        return jnp.sum(
            render(sc, view, proj, cam_pos, cfg, backend="tile") ** 2
        )

    g_sh = jax.grad(loss_sh)(replicate_scene(scene_d, mesh))
    g_ref = jax.grad(loss_ref)(scene_d)
    for f in ("xyz", "scale", "rot", "opacity", "sh"):
        a = np.asarray(getattr(g_ref, f))
        b = np.asarray(getattr(g_sh, f))
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b, a, atol=3e-3 * scale, err_msg=f)


def test_sharded_grads_match_single_chip():
    cfg = RenderConfig(width=96, height=96)
    scene = random_scene(300, sh_degree=0, seed=6, extent=2.0, mean_scale=0.06)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)

    mesh = make_mesh(4)
    fn = make_sharded_render_fn(mesh, cfg, use_pallas=False)

    def loss_sh(sc):
        return jnp.sum(fn(sc, view, proj, cam_pos) ** 2)

    def loss_ref(sc):
        return jnp.sum(
            render(sc, view, proj, cam_pos, cfg, backend="tile") ** 2
        )

    g_sh = jax.grad(loss_sh)(replicate_scene(scene_d, mesh))
    g_ref = jax.grad(loss_ref)(scene_d)
    for f in ("xyz", "scale", "rot", "opacity", "sh"):
        a = np.asarray(getattr(g_ref, f))
        b = np.asarray(getattr(g_sh, f))
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b, a, atol=3e-3 * scale, err_msg=f)


def test_sharded_train_step_reduces_loss():
    import optax

    cfg = RenderConfig(width=64, height=64)
    scene = random_scene(200, sh_degree=0, seed=8, extent=2.0, mean_scale=0.08)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    mesh = make_mesh(2)
    scene_r = replicate_scene(scene_d, mesh)

    optimizer = optax.adam(5e-3)
    step = make_sharded_train_step(mesh, cfg, optimizer, use_pallas=False)
    opt_state = optimizer.init(scene_r)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    losses = []
    for _ in range(5):
        scene_r, opt_state, loss = step(
            scene_r, opt_state, view, proj, cam_pos, target
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_splat_sharded_projection_matches():
    """shard_splats=True (scene sharded over splats + ICI all-gather of
    projected splats) must render identically to the replicated path."""
    from gaussiansplattingviewer_tpu.parallel import shard_scene_splats

    cfg = RenderConfig(width=96, height=96)
    scene = random_scene(512, sh_degree=1, seed=12, extent=2.0, mean_scale=0.06)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    img_ref = np.asarray(render(scene_d, view, proj, cam_pos, cfg, backend="tile"))

    mesh = make_mesh(4)
    scene_s = shard_scene_splats(scene, mesh)
    fn = make_sharded_render_fn(mesh, cfg, use_pallas=False, shard_splats=True)
    img = np.asarray(fn(scene_s, view, proj, cam_pos))
    np.testing.assert_allclose(img, img_ref, atol=1e-5)


def test_splat_sharded_grads_match():
    from gaussiansplattingviewer_tpu.parallel import shard_scene_splats

    cfg = RenderConfig(width=64, height=64)
    scene = random_scene(256, sh_degree=0, seed=13, extent=2.0, mean_scale=0.07)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    mesh = make_mesh(4)
    fn = make_sharded_render_fn(mesh, cfg, use_pallas=False, shard_splats=True)

    def loss_sh(sc):
        return jnp.sum(fn(sc, view, proj, cam_pos) ** 2)

    def loss_ref(sc):
        return jnp.sum(render(sc, view, proj, cam_pos, cfg, backend="tile") ** 2)

    g_sh = jax.grad(loss_sh)(shard_scene_splats(scene, mesh))
    g_ref = jax.grad(loss_ref)(scene_d)
    for f in ("xyz", "opacity", "sh"):
        a = np.asarray(getattr(g_ref, f))
        b = np.asarray(getattr(g_sh, f))
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b, a, atol=3e-3 * scale, err_msg=f)
