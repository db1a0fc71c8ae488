"""Multi-host execution path (BASELINE config 5: N >= 2 hosts).

Two layers of validation:
  * single-process: a 2-axis (hosts, chips) mesh drives the same sharded
    render code as the 1-D tiles mesh, bit-identically;
  * multi-process: scripts/multihost_check.py spawns TWO real localhost
    processes (4 virtual CPU devices each), builds the global (2, 4) mesh
    through jax.distributed, and checks replicated + exchange renders and
    a cross-host-psum training step.  Process boundaries are real — every
    collective over the ``hosts`` axis crosses them.
"""

import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

from gaussiansplattingviewer_tpu.config import RenderConfig
from gaussiansplattingviewer_tpu.models import random_scene
from gaussiansplattingviewer_tpu.ops.render import render
from gaussiansplattingviewer_tpu.parallel import (
    make_host_mesh,
    make_sharded_render_fn,
    shard_scene_splats,
)
from gaussiansplattingviewer_tpu.utils import transforms as tf
from gaussiansplattingviewer_tpu.utils.camera import Camera

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _setup(cfg, scene):
    cam = Camera(h=cfg.height, w=cfg.width)
    cam.fovy = 1.0
    eye = np.array([0, 0, 4.0])
    view = jnp.asarray(tf.look_at(eye, np.zeros(3), [0, -1, 0]))
    proj = jnp.asarray(cam.get_project_matrix())
    cam_pos = jnp.asarray(eye.astype(np.float32))
    return scene.to_device(), view, proj, cam_pos


def test_host_mesh_matches_flat_mesh():
    """A (2 hosts, 4 chips) mesh renders bit-identically to single-chip
    through both the replicated and the exchange path."""
    cfg = RenderConfig(width=96, height=96)
    scene = random_scene(512, sh_degree=1, seed=12, extent=2.0, mean_scale=0.06)
    scene_d, view, proj, cam_pos = _setup(cfg, scene)
    img_ref = np.asarray(
        render(scene_d, view, proj, cam_pos, cfg, backend="tile")
    )

    mesh = make_host_mesh(n_hosts=2)
    assert dict(mesh.shape) == {"hosts": 2, "chips": 4}

    fn = make_sharded_render_fn(mesh, cfg, use_pallas=False)
    img = np.asarray(fn(scene_d, view, proj, cam_pos))
    np.testing.assert_allclose(img, img_ref, atol=1e-5)

    fn_x = make_sharded_render_fn(
        mesh, cfg, use_pallas=False, shard_splats=True, exchange=True,
        interleaved=True,
    )
    img_x = np.asarray(
        fn_x(shard_scene_splats(scene, mesh), view, proj, cam_pos)
    )
    np.testing.assert_allclose(img_x, img_ref, atol=1e-5)


def test_two_real_processes():
    """Spawn the 2-process localhost harness; each process must verify its
    addressable image rows and agree on the training loss."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers force their own platform/devices; drop the parent's
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_check.py")],
        env=env,
        capture_output=True,
        timeout=600,
        text=True,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST PASS" in out.stdout
