"""Real multi-process (>= 2 hosts) validation on localhost CPU.

BASELINE config 5 demands the render scale to "N >= 2 hosts"; no multi-host
TPU hardware exists in this environment, but JAX's multi-process runtime is
host-count-faithful on CPU: each process owns only its local devices, the
(hosts, chips) mesh spans both processes, and every cross-host collective
really crosses the process boundary (the same GSPMD partitioner + runtime
path a TPU pod slice uses, with TCP standing in for DCN).

Launcher mode (no args): spawns ``--nproc`` worker copies of itself on a
free localhost port, each with ``--local-devices`` virtual CPU devices,
and fails if any worker fails.

Worker mode (--worker): initialize_distributed -> (hosts, chips) mesh ->
  1. replicated-scene tile-row-sharded render; every process checks ITS
     addressable image rows bit-exactly against a locally computed
     single-device reference;
  2. splat-sharded EXCHANGE render (all_to_all crosses hosts) checked the
     same way;
  3. one full training step (gradient psum over hosts x chips); the loss
     must be finite and identical on every process.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def worker(coordinator: str, nproc: int, pid: int, local_devices: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from gaussiansplattingviewer_tpu.config import RenderConfig
    from gaussiansplattingviewer_tpu.models import random_scene
    from gaussiansplattingviewer_tpu.ops.render import render
    from gaussiansplattingviewer_tpu.parallel import (
        initialize_distributed,
        make_host_mesh,
        make_sharded_render_fn,
        make_sharded_train_step,
        put_global,
        replicate_scene,
        shard_scene_splats,
    )
    from jax.sharding import PartitionSpec as P
    from gaussiansplattingviewer_tpu.utils import transforms as tf
    from gaussiansplattingviewer_tpu.utils.camera import Camera

    initialize_distributed(coordinator, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * local_devices
    mesh = make_host_mesh()
    assert dict(mesh.shape) == {"hosts": nproc, "chips": local_devices}

    cfg = RenderConfig(width=96, height=96)
    scene = random_scene(
        512, sh_degree=1, seed=12, extent=2.0, mean_scale=0.06
    )
    cam = Camera(h=cfg.height, w=cfg.width)
    cam.fovy = 1.0
    view = np.asarray(
        tf.look_at([0, 0, 4.0], [0, 0, 0], [0, -1, 0]), np.float32
    )
    proj = np.asarray(cam.get_project_matrix(), np.float32)
    cam_pos = np.array([0, 0, 4.0], np.float32)

    # local single-device reference (every process can compute it: the
    # scene is host-replicated numpy)
    img_ref = np.asarray(
        render(
            scene.to_device(), view, proj, cam_pos, cfg, backend="tile"
        )
    )

    def check_local_rows(img, tag):
        for shard in img.addressable_shards:
            sl = shard.index[0]
            got = np.asarray(shard.data)[:, : cfg.width]
            want = img_ref[sl][:, : cfg.width]
            np.testing.assert_allclose(
                got, want, atol=1e-5,
                err_msg=f"{tag} process {pid} rows {sl}",
            )

    # 1. replicated scene, tile rows sharded over hosts x chips
    scene_rep = replicate_scene(scene.to_device(), mesh)
    fn = make_sharded_render_fn(mesh, cfg, use_pallas=False)
    img = fn(scene_rep, view, proj, cam_pos)
    check_local_rows(img, "replicated")

    # 2. splat-sharded exchange render: the all_to_all crosses hosts
    scene_x = shard_scene_splats(scene, mesh)
    fn_x = make_sharded_render_fn(
        mesh, cfg, use_pallas=False, shard_splats=True, exchange=True
    )
    img_x = fn_x(scene_x, view, proj, cam_pos)
    check_local_rows(img_x, "exchange")

    # 3. one training step: grads psum over (hosts, chips)
    import optax

    target = put_global(
        0.7 * img_ref, mesh, P(("hosts", "chips"))
    )
    opt = optax.sgd(1e-3)
    step = make_sharded_train_step(mesh, cfg, optimizer=opt, use_pallas=False)
    opt_state = opt.init(scene_rep)
    _, _, loss = step(scene_rep, opt_state, view, proj, cam_pos, target)
    loss = float(loss)
    assert np.isfinite(loss), loss
    print(f"worker {pid}: ok (loss={loss:.8f})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--local-devices", type=int, default=4)
    args = ap.parse_args()

    if args.worker:
        worker(args.coordinator, args.nproc, args.pid, args.local_devices)
        return

    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [
                sys.executable, os.path.abspath(__file__), "--worker",
                "--coordinator", coordinator,
                "--nproc", str(args.nproc), "--pid", str(i),
                "--local-devices", str(args.local_devices),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(args.nproc)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    ok = all(p.returncode == 0 for p in procs)
    for i, out in enumerate(outs):
        tail = "\n".join(out.strip().splitlines()[-8:])
        print(f"--- worker {i} (rc={procs[i].returncode}) ---\n{tail}")
    # the per-step loss must be identical across hosts (same global step)
    losses = set()
    for out in outs:
        for line in out.splitlines():
            if "loss=" in line:
                losses.add(line.split("loss=")[1].rstrip(")"))
    if ok and len(losses) != 1:
        print(f"FAIL: losses differ across hosts: {losses}")
        ok = False
    print("MULTIHOST " + ("PASS" if ok else "FAIL"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
