"""One-off: bisect the projection VJP cost by output field."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gaussiansplattingviewer_tpu.config import RenderConfig
    from gaussiansplattingviewer_tpu.models import random_scene
    from gaussiansplattingviewer_tpu.ops import projection
    from gaussiansplattingviewer_tpu.ops.sh import eval_sh_color, sh_basis
    from gaussiansplattingviewer_tpu.utils import transforms as tf
    from gaussiansplattingviewer_tpu.utils.camera import Camera

    cfg = RenderConfig(width=1920, height=1080)
    scene = random_scene(
        1_000_000, sh_degree=3, seed=0, extent=4.0, mean_scale=0.015
    ).pad_to_multiple(1024).to_device()
    cam = Camera(h=cfg.height, w=cfg.width)
    cam.fovy = 1.0
    eye = np.array([0, 0, 9.0])
    view = jnp.asarray(tf.look_at(eye, np.zeros(3), [0, -1, 0]))
    proj = jnp.asarray(cam.get_project_matrix())
    cam_pos = jnp.asarray(eye.astype(np.float32))

    def hard_sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(np.asarray(leaf).reshape(-1)[:1])

    def timeit(name, fn, *a):
        out = fn(*a)
        hard_sync(out)
        out = fn(*a)
        hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(*a)
        hard_sync(out)
        ms = (time.perf_counter() - t0) / 8 * 1000
        print(f"{name:40s} {ms:8.1f} ms", flush=True)

    def proj_out(sc):
        return projection.project(sc, view, proj, cam_pos, cfg)

    def mk(loss_of_splats):
        def loss(sc):
            s = proj_out(sc)
            m = s.valid.astype(jnp.float32)
            return loss_of_splats(s, m)

        return jax.jit(jax.grad(loss))

    timeit("grad: mean2d only", mk(lambda s, m: jnp.sum(s.mean2d**2 * m[:, None])), scene)
    timeit("grad: +depth+opacity", mk(
        lambda s, m: jnp.sum(s.mean2d**2 * m[:, None]) + jnp.sum(s.depth**2 * m) + jnp.sum(s.opacity**2 * m)
    ), scene)
    timeit("grad: +conic+radius", mk(
        lambda s, m: jnp.sum(s.mean2d**2 * m[:, None]) + jnp.sum(s.depth**2 * m)
        + jnp.sum(s.opacity**2 * m) + jnp.sum(s.conic**2 * m[:, None])
        + jnp.sum(s.radius**2 * m[:, None])
    ), scene)
    timeit("grad: +color (full projection)", mk(
        lambda s, m: jnp.sum(s.mean2d**2 * m[:, None]) + jnp.sum(s.depth**2 * m)
        + jnp.sum(s.opacity**2 * m) + jnp.sum(s.conic**2 * m[:, None])
        + jnp.sum(s.radius**2 * m[:, None]) + jnp.sum(s.color**2 * m[:, None])
    ), scene)

    # SH eval alone
    def loss_sh(sc):
        dir = sc.xyz - cam_pos
        dir = dir / jnp.maximum(jnp.linalg.norm(dir, axis=-1, keepdims=True), 1e-12)
        c = eval_sh_color(sc.sh.astype(jnp.float32), dir, 3, clamp=True)
        return jnp.sum(c**2)

    timeit("grad: SH eval alone", jax.jit(jax.grad(loss_sh)), scene)

    # SH eval without the (n,16,3) reshape: einsum on (n,48) directly
    def loss_sh_flat(sc):
        dir = sc.xyz - cam_pos
        dir = dir / jnp.maximum(jnp.linalg.norm(dir, axis=-1, keepdims=True), 1e-12)
        basis = sh_basis(dir, 3)  # (n, 16)
        b48 = jnp.repeat(basis, 3, axis=-1)  # (n, 48) — k-major interleave
        sh = sc.sh.astype(jnp.float32)
        r = jnp.sum(b48[:, 0::3] * sh[:, 0::3], axis=-1)
        g = jnp.sum(b48[:, 1::3] * sh[:, 1::3], axis=-1)
        b = jnp.sum(b48[:, 2::3] * sh[:, 2::3], axis=-1)
        c = jnp.maximum(jnp.stack([r, g, b], axis=-1) + 0.5, 0.0)
        return jnp.sum(c**2)

    timeit("grad: SH via strided slices", jax.jit(jax.grad(loss_sh_flat)), scene)


if __name__ == "__main__":
    main()
