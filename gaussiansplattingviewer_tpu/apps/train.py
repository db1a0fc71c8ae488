"""Scene optimization CLI: fit Gaussian parameters to target images.

The reference is a viewer — its backward pass exists only unused inside the
CUDA library (renderer_cuda.py:214 torch.no_grad).  This app exercises the
framework's differentiable path end-to-end: given camera poses and target
images, optimize means/scales/rotations/opacities/SH with Adam through the
tile rasterizer (optionally sharded over a device mesh).

Modes:
  * --images DIR: real targets matched to COLMAP poses by index;
  * --self-distill: render targets from the loaded scene, perturb the
    parameters, and recover them — a built-in correctness/benchmark run
    needing no data.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from gaussiansplattingviewer_tpu.config import RenderConfig
from gaussiansplattingviewer_tpu.apps.viewer import load_scene
from gaussiansplattingviewer_tpu.models.checkpoint import save_npz, save_train_state
from gaussiansplattingviewer_tpu.utils import colmap
from gaussiansplattingviewer_tpu.utils.camera import Camera


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--gs-model", default=None, help="initial scene (PLY dir)")
    ap.add_argument("--colmap-poses", default=None)
    ap.add_argument("--images", default=None, help="target image dir")
    ap.add_argument("--self-distill", action="store_true")
    ap.add_argument("--perturb", type=float, default=0.2,
                    help="self-distill parameter noise scale")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--loss", choices=["l2", "l1"], default="l2")
    ap.add_argument("--backend", default=None)
    ap.add_argument("--n-devices", type=int, default=0,
                    help="mesh size (0 = single device)")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--ckpt-every", type=int, default=100)
    ap.add_argument("--out", default="trained_scene.npz")
    ap.add_argument("--log-every", type=int, default=20)
    ap.add_argument("--use-intrinsics", action="store_true",
                    help="projection from cameras.txt fx/fy/cx/cy (rescaled "
                    "to the render resolution) instead of the default lens")
    ap.add_argument("--grad-fold-bf16", choices=["on", "off"], default="on",
                    help="A/B switch for the packed-bf16 duplicate-gradient "
                    "fold (config.grad_fold_bf16; default on = production "
                    "config).  tests/test_train_quality.py gates the "
                    "default on end-to-end self-distill quality")
    ap.add_argument("--autotune", action="store_true",
                    help="tune binning pools to the scene over the training "
                    "poses (ops/autotune.py) before compiling")
    ap.add_argument("--overflow-check-every", type=int, default=0,
                    help="every K steps, check binning overflow/truncation "
                    "on the current pose and RE-TUNE the pools if the "
                    "evolving scene outgrew them (0 = log_every; negative "
                    "disables)")
    return ap


def _poses_and_targets(args, scene, bbox, center, cfg, render_fn):
    """Build (view, cam_pos, target) triples."""
    import jax.numpy as jnp

    from gaussiansplattingviewer_tpu.utils import transforms as tf
    from gaussiansplattingviewer_tpu.utils.image_io import read_image

    cam = Camera(h=cfg.height, w=cfg.width)
    proj = jnp.asarray(cam.get_project_matrix())
    triples = []
    if args.colmap_poses:
        poses, ccams = colmap.load_sparse_dir(args.colmap_poses)
        if getattr(args, "use_intrinsics", False) and ccams:
            proj = jnp.asarray(
                colmap.camera_projection(ccams[0], cfg.width, cfg.height)
            )
        for i, p in enumerate(poses):
            vl, _, cl, _ = colmap.pose_to_stereo_views(p)
            target = None
            if args.images:
                path = os.path.join(args.images, f"{i}.png")
                if os.path.exists(path):
                    target = (
                        read_image(path).astype(np.float32) / 255.0
                    )
            triples.append([jnp.asarray(vl), jnp.asarray(cl), target])
    else:
        # orbit poses around the scene
        extent = float(
            np.linalg.norm(np.asarray(bbox[1]) - np.asarray(bbox[0]))
        )
        r = max(extent, 1.0)
        for i in range(8):
            ang = 2 * np.pi * i / 8
            eye = np.asarray(center) + r * np.array(
                [np.sin(ang), 0.0, np.cos(ang)]
            )
            v = tf.look_at(eye, center, [0, -1, 0])
            triples.append(
                [jnp.asarray(v), jnp.asarray(eye.astype(np.float32)), None]
            )

    # self-distill or fill missing targets by rendering the initial scene
    for t in triples:
        if t[2] is None:
            t[2] = np.asarray(render_fn(scene, t[0], proj, t[1]))
    return proj, [(v, c, jnp.asarray(np.clip(t, 0, 1))) for v, c, t in triples]


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    backend = args.backend or (
        "pallas" if jax.default_backend() == "tpu" else "tile"
    )
    cfg = RenderConfig(
        width=args.width, height=args.height,
        grad_fold_bf16=(args.grad_fold_bf16 == "on"),
    )

    scene, bbox, center = load_scene(args.gs_model)
    scene = scene.pad_to_multiple(256).to_device()

    sharded = bool(args.n_devices and args.n_devices > 1)
    if sharded:
        from gaussiansplattingviewer_tpu.parallel import (
            make_mesh,
            make_sharded_render_fn,
            replicate_scene,
        )

        mesh = make_mesh(args.n_devices)
        scene = replicate_scene(scene, mesh)

        def make_render(c):
            return make_sharded_render_fn(
                mesh, c, use_pallas=(backend == "pallas")
            )
    else:
        from gaussiansplattingviewer_tpu.ops.render import render

        def make_render(c):
            return lambda sc, v, p, cp: render(sc, v, p, cp, c, backend=backend)

    render_fn = make_render(cfg)
    proj, triples = _poses_and_targets(args, scene, bbox, center, cfg, render_fn)
    print(f"{len(triples)} training views, backend={backend}", file=sys.stderr)

    from gaussiansplattingviewer_tpu.ops.autotune import (
        autotune,
        binning_overflow,
    )

    def tune(c, sc):
        tuned = autotune(
            sc, [v for v, _, _ in triples], [proj] * len(triples),
            [p for _, p, _ in triples], c,
        )
        print(
            f"# autotuned: k1={tuned.dense_small_slots} "
            f"ladder={tuned.pool_ladder} table_rows={tuned.table_budget_rows}",
            file=sys.stderr,
        )
        return tuned

    if args.autotune:
        cfg = tune(cfg.with_(
            pool_ladder=(), pool_huge_entries=0, table_budget_rows=0
        ), scene)
        render_fn = make_render(cfg)

    if args.self_distill:
        rng = np.random.default_rng(0)

        def perturb(a, s):
            a = np.asarray(a)
            sigma = s * (np.abs(a) + 0.05)  # elementwise, floor for zeros
            return jnp.asarray(
                (a + rng.normal(0, 1, a.shape) * sigma).astype(np.float32)
            )

        scene = dataclasses.replace(
            scene,
            xyz=perturb(scene.xyz, args.perturb * 0.05),
            sh=perturb(scene.sh, args.perturb),
        )

    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(scene)

    def build_step(rf):
        def loss_fn(sc, view, cam_pos, target):
            img = rf(sc, view, proj, cam_pos)
            err = img - target
            return (
                jnp.mean(jnp.abs(err))
                if args.loss == "l1"
                else jnp.mean(err * err)
            )

        @jax.jit
        def step(sc, opt_state, view, cam_pos, target):
            loss, grads = jax.value_and_grad(loss_fn)(
                sc, view, cam_pos, target
            )
            updates, opt_state = optimizer.update(grads, opt_state, sc)
            return optax.apply_updates(sc, updates), opt_state, loss

        eval_loss = jax.jit(
            lambda sc: sum(
                loss_fn(sc, v, c, t) for v, c, t in triples
            ) / len(triples)
        )
        return step, eval_loss

    step, eval_loss = build_step(render_fn)
    check_every = args.overflow_check_every or args.log_every
    first = float(eval_loss(scene))
    t0 = time.time()
    for i in range(args.steps):
        view, cam_pos, target = triples[i % len(triples)]
        scene, opt_state, loss = step(scene, opt_state, view, cam_pos, target)
        if i % args.log_every == 0:
            print(f"step {i:5d}  loss {float(loss):.6f}", file=sys.stderr)
        if (
            check_every > 0
            and not sharded
            and (i + 1) % check_every == 0
        ):
            # the evolving scene can outgrow a tuned pool ladder (splats
            # drift/inflate); the overflow diagnostic is the trigger to
            # re-tune (ops/autotune.py margin policy)
            ovf, trunc = binning_overflow(scene, view, proj, cam_pos, cfg)
            if int(ovf) or int(trunc):
                print(
                    f"step {i}: binning overflow={int(ovf)} "
                    f"truncated={int(trunc)} — re-tuning pools",
                    file=sys.stderr,
                )
                cfg = tune(cfg.with_(
                    pool_ladder=(), pool_huge_entries=0, table_budget_rows=0
                ), scene)
                render_fn = make_render(cfg)
                step, eval_loss = build_step(render_fn)
        if args.ckpt_dir and (i + 1) % args.ckpt_every == 0:
            save_train_state(args.ckpt_dir, i + 1, scene, opt_state)
    dt = time.time() - t0
    last = float(eval_loss(scene))
    print(
        f"done: mean loss {first:.6f} -> {last:.6f} in {args.steps} steps "
        f"({dt / args.steps * 1000:.0f} ms/step)",
        file=sys.stderr,
    )
    if args.loss == "l2":
        # machine-readable quality line for A/B gates (targets are in
        # [0,1], so mean L2 over views is an MSE and PSNR is meaningful)
        print(f"final_psnr_db {-10.0 * np.log10(max(last, 1e-12)):.3f}")
    save_npz(scene, args.out)
    print(f"saved {args.out}", file=sys.stderr)
    return 0 if last <= first else 1


if __name__ == "__main__":
    raise SystemExit(main())
