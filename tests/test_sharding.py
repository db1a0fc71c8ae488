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


def test_splat_sharded_compacted_gather_mostly_culled():
    """gather_budget_factor compacts each chip's frustum survivors before
    the all-gather: on a mostly-culled view the collective moves only
    ~budget rows (0.25*N here, vs N without compaction) and the image and
    gradients still match the single-chip render exactly (BASELINE north
    star: 'frustum-culled splat lists sharded across chips')."""
    from gaussiansplattingviewer_tpu.parallel import shard_scene_splats

    cfg = RenderConfig(width=96, height=96)
    scene = random_scene(1024, sh_degree=0, seed=5, extent=2.0,
                         mean_scale=0.05)
    # push ~85% of splats far outside the frustum
    xyz = np.asarray(scene.xyz).copy()
    xyz[:870] += np.array([100.0, 0.0, 0.0])
    scene.xyz = xyz
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    img_ref = np.asarray(
        render(scene_d, view, proj, cam_pos, cfg, backend="tile")
    )

    mesh = make_mesh(4)
    scene_s = shard_scene_splats(scene, mesh)
    fn = make_sharded_render_fn(
        mesh, cfg, use_pallas=False, shard_splats=True,
        gather_budget_factor=0.25,
    )
    img = np.asarray(fn(scene_s, view, proj, cam_pos))
    np.testing.assert_allclose(img, img_ref, atol=1e-5)

    def loss_sh(sc):
        return jnp.sum(fn(sc, view, proj, cam_pos) ** 2)

    def loss_ref(sc):
        return jnp.sum(
            render(sc, view, proj, cam_pos, cfg, backend="tile") ** 2
        )

    g_sh = jax.grad(loss_sh)(scene_s)
    g_ref = jax.grad(loss_ref)(scene_d)
    for f in ("xyz", "opacity", "sh"):
        a = np.asarray(getattr(g_ref, f))
        b = np.asarray(getattr(g_sh, f))
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b, a, atol=3e-3 * scale, err_msg=f)

    # the budget is real: at production sizes the collective operand is
    # budget rows, not N_local (the 4096-row floor hides it at test scale)
    from gaussiansplattingviewer_tpu.parallel.sharded_render import (
        _round_budget,
    )

    b = _round_budget(int(250_000 * 0.25), 250_000)
    assert b == 62 * 1024 and b < 250_000


def test_render_band_concrete_idx_matches_shard():
    """The scaling harness runs _render_band with a concrete shard index
    (scripts/scaling.py); its output must equal the corresponding rows of
    the single-chip render for both assignments."""
    from gaussiansplattingviewer_tpu.parallel.sharded_render import (
        _render_band,
        _rows_per_shard,
    )

    cfg = RenderConfig(width=160, height=96)
    scene = random_scene(800, sh_degree=1, seed=4, extent=2.0, mean_scale=0.06)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    img_ref = np.asarray(
        render(scene_d, view, proj, cam_pos, cfg, backend="tile")
    )
    n_dev = 3
    rows = _rows_per_shard(cfg, n_dev)
    ts = cfg.tile_size
    for interleaved in (False, True):
        stride = n_dev if interleaved else 1
        for idx in range(n_dev):
            band = np.asarray(
                _render_band(
                    scene_d, view, proj, cam_pos, cfg=cfg, rows=rows,
                    use_pallas=False, row_stride=stride,
                    idx=jnp.int32(idx),
                )
            )[:, : cfg.width]
            for s in range(rows):
                gr = (idx + s * n_dev) if interleaved else (idx * rows + s)
                y0 = gr * ts
                if y0 >= cfg.height:
                    continue
                h = min(ts, cfg.height - y0)
                np.testing.assert_allclose(
                    band[s * ts : s * ts + h],
                    img_ref[y0 : y0 + h],
                    atol=1e-5,
                    err_msg=f"interleaved={interleaved} idx={idx} row={s}",
                )


def test_exchange_sharded_matches_single_chip():
    """all_to_all splat exchange (each chip receives only splats touching
    its band) must render identically to the single-chip image."""
    from gaussiansplattingviewer_tpu.parallel import shard_scene_splats

    cfg = RenderConfig(width=96, height=96)
    scene = random_scene(512, sh_degree=1, seed=12, extent=2.0, mean_scale=0.06)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    img_ref = np.asarray(render(scene_d, view, proj, cam_pos, cfg, backend="tile"))

    for n_dev in (2, 4):
        for interleaved in (False, True):
            mesh = make_mesh(n_dev)
            scene_s = shard_scene_splats(scene, mesh)
            fn = make_sharded_render_fn(
                mesh, cfg, use_pallas=False, shard_splats=True,
                exchange=True, interleaved=interleaved,
            )
            img = np.asarray(fn(scene_s, view, proj, cam_pos))
            np.testing.assert_allclose(
                img, img_ref, atol=1e-5,
                err_msg=f"n_dev={n_dev} interleaved={interleaved}",
            )


def test_exchange_sharded_grads_match():
    """Gradients through the all_to_all exchange (its transpose is the
    reverse all_to_all) must match the single-chip gradients — every
    differentiable field, both row assignments."""
    from gaussiansplattingviewer_tpu.parallel import shard_scene_splats

    cfg = RenderConfig(width=64, height=64)
    scene = random_scene(256, sh_degree=0, seed=13, extent=2.0, mean_scale=0.07)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    mesh = make_mesh(4)

    def loss_ref(sc):
        return jnp.sum(render(sc, view, proj, cam_pos, cfg, backend="tile") ** 2)

    g_ref = jax.grad(loss_ref)(scene_d)
    for interleaved in (False, True):
        fn = make_sharded_render_fn(
            mesh, cfg, use_pallas=False, shard_splats=True, exchange=True,
            interleaved=interleaved,
        )

        def loss_sh(sc):
            return jnp.sum(fn(sc, view, proj, cam_pos) ** 2)

        g_sh = jax.grad(loss_sh)(shard_scene_splats(scene, mesh))
        for f in ("xyz", "opacity", "sh", "scale", "rot"):
            a = np.asarray(getattr(g_ref, f))
            b = np.asarray(getattr(g_sh, f))
            scale = np.abs(a).max() + 1e-6
            np.testing.assert_allclose(
                b, a, atol=3e-3 * scale,
                err_msg=f"{f} interleaved={interleaved}",
            )


def test_exchange_train_step_runs():
    from gaussiansplattingviewer_tpu.parallel import shard_scene_splats

    cfg = RenderConfig(width=48, height=48)
    scene = random_scene(256, sh_degree=0, seed=3, extent=2.0, mean_scale=0.07)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    # darkened target so the initial loss (and grads) are nonzero
    target = 0.7 * render(scene_d, view, proj, cam_pos, cfg, backend="tile")
    mesh = make_mesh(4)
    import optax

    step = make_sharded_train_step(
        mesh, cfg, optimizer=optax.sgd(1e-2), use_pallas=False,
        shard_splats=True, exchange=True,
    )
    scene_s = shard_scene_splats(scene, mesh)
    opt_state = optax.sgd(1e-2).init(scene_s)
    scene2, _, loss = step(scene_s, opt_state, view, proj, cam_pos, target)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(scene2.xyz), np.asarray(scene_s.xyz))


@pytest.mark.parametrize("interleaved", [False, True])
def test_precull_sharded_matches_single_chip(interleaved):
    """Cheap pre-projection band pre-cull (band_precull_mask) must be
    conservative: sharded output with precull enabled is BIT-equal to the
    non-preculled sharded render and fp-close to single chip."""
    cfg = RenderConfig(width=160, height=160)
    scene = random_scene(1500, sh_degree=1, seed=4, extent=2.0,
                         mean_scale=0.06)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    img_ref = np.asarray(
        render(scene_d, view, proj, cam_pos, cfg, backend="tile")
    )
    mesh = make_mesh(8)
    scene_r = replicate_scene(scene_d, mesh)
    base = make_sharded_render_fn(
        mesh, cfg, use_pallas=False, interleaved=interleaved
    )
    pc = make_sharded_render_fn(
        mesh, cfg, use_pallas=False, interleaved=interleaved,
        precull_budget_factor=2.5,
    )
    a = np.asarray(base(scene_r, view, proj, cam_pos))
    b = np.asarray(pc(scene_r, view, proj, cam_pos))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(b, img_ref, atol=1e-5)


def test_precull_train_step_matches():
    """Gradients flow through the pre-cull compaction (scatter-free VJP):
    one train step must produce the same loss as without precull."""
    import optax

    cfg = RenderConfig(width=160, height=160)
    scene = random_scene(1500, sh_degree=1, seed=4, extent=2.0,
                         mean_scale=0.06)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    mesh = make_mesh(8)
    scene_r = replicate_scene(scene_d, mesh)
    tgt = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    opt = optax.adam(1e-3)
    o0 = opt.init(scene_r)
    st0 = make_sharded_train_step(mesh, cfg, use_pallas=False)
    st1 = make_sharded_train_step(
        mesh, cfg, use_pallas=False, precull_budget_factor=2.5
    )
    s0, _, l0 = st0(scene_r, o0, view, proj, cam_pos, tgt)
    s1, _, l1 = st1(scene_r, o0, view, proj, cam_pos, tgt)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )
