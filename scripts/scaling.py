"""tiles/s scaling-efficiency harness (BASELINE.json: >=80% at 1/N chips).

Multi-chip TPU hardware is not available in this environment (one chip via
a tunnel), so this measures the real sharded program on the standard
8-virtual-device CPU mesh (xla_force_host_platform_device_count) — the
same code path (shard_map over a 1-D ``tiles`` mesh, XLA collectives) that
runs on a pod slice, with XLA:CPU executing the per-device partitions on
separate host threads.  Reported efficiency is therefore a lower-bound
sanity check of the sharding's load balance and collective overhead, not a
hardware number.

Measures BOTH row assignments on a deliberately TOP-HEAVY scene (splat
density concentrated in the lower image rows, like ground-vs-sky):
  * contiguous bands (default): chips owning sky rows idle;
  * interleaved rows (round-robin): load spread evenly.

Writes SCALING.json and prints a table.
"""

import json
import os
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gaussiansplattingviewer_tpu.config import RenderConfig
    from gaussiansplattingviewer_tpu.models import random_scene
    from gaussiansplattingviewer_tpu.parallel import (
        make_mesh,
        make_sharded_render_fn,
        replicate_scene,
    )
    from gaussiansplattingviewer_tpu.utils import transforms as tf
    from gaussiansplattingviewer_tpu.utils.camera import Camera

    cfg = RenderConfig(width=512, height=256)
    n = 20_000
    scene = random_scene(n, sh_degree=1, seed=0, extent=2.0, mean_scale=0.03)
    # top-heavy: push ~85% of splats into the bottom third of the view
    # (y is down in image space; world +y maps down with the [0,-1,0] up)
    xyz = np.asarray(scene.xyz).copy()
    heavy = np.random.default_rng(1).uniform(size=n) < 0.85
    xyz[heavy, 1] = np.abs(xyz[heavy, 1]) * 0.5 + 1.0
    scene.xyz = xyz

    cam = Camera(h=cfg.height, w=cfg.width)
    cam.fovy = 1.2
    view = jnp.asarray(tf.look_at([0, 0, 4.0], [0, 0, 0], [0, -1, 0]))
    proj = jnp.asarray(cam.get_project_matrix())
    cam_pos = jnp.asarray(np.array([0, 0, 4.0], np.float32))
    scene_d = scene.to_device()

    iters = 6
    results = {"config": {"width": cfg.width, "height": cfg.height,
                          "n_splats": n, "num_tiles": cfg.num_tiles,
                          "iters": iters,
                          "note": "8-virtual-device CPU mesh; same shard_map "
                                  "program as TPU pod slice"},
               "runs": []}

    def bench(fn, scene_r):
        out = fn(scene_r, view, proj, cam_pos)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(scene_r, view, proj, cam_pos)
        out.block_until_ready()
        return (time.perf_counter() - t0) / iters

    base = {}
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_dev)
        scene_r = replicate_scene(scene_d, mesh)
        for interleaved in (False, True):
            fn = make_sharded_render_fn(
                mesh, cfg, use_pallas=False, interleaved=interleaved
            )
            dt = bench(fn, scene_r)
            tiles_s = cfg.num_tiles / dt
            key = "interleaved" if interleaved else "contiguous"
            if n_dev == 1:
                base[key] = tiles_s
            eff = tiles_s / (base[key] * n_dev)
            results["runs"].append({
                "n_dev": n_dev, "assignment": key,
                "ms_per_frame": round(dt * 1e3, 2),
                "tiles_per_s": round(tiles_s, 1),
                "efficiency": round(eff, 3),
            })
            print(f"n_dev={n_dev} {key:12s} {dt*1e3:8.2f} ms/frame  "
                  f"{tiles_s:10.1f} tiles/s  eff={eff:.3f}", flush=True)

    with open(os.path.join(os.path.dirname(__file__), "..", "SCALING.json"),
              "w") as f:
        json.dump(results, f, indent=1)
    print("wrote SCALING.json")


if __name__ == "__main__":
    main()
