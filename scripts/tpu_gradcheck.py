"""Compare TPU-pallas grads vs CPU-tile grads for the same scene."""
import numpy as np, jax, jax.numpy as jnp
from gaussiansplattingviewer_tpu.config import RenderConfig
from gaussiansplattingviewer_tpu.models import random_scene
from gaussiansplattingviewer_tpu.ops.render import render
from gaussiansplattingviewer_tpu.utils import transforms as tf
from gaussiansplattingviewer_tpu.utils.camera import Camera

cfg = RenderConfig(width=256, height=192)
scene = random_scene(5_000, sh_degree=1, seed=1, extent=2.0, mean_scale=0.04)
cam = Camera(h=cfg.height, w=cfg.width); cam.fovy = 1.0
view = np.asarray(tf.look_at(np.array([0,0,6.0]), np.zeros(3), [0,-1,0]), np.float32)
proj = np.asarray(cam.get_project_matrix(), np.float32)
cam_pos = np.array([0,0,6.0], np.float32)

def loss_fn(s, backend):
    img = render(s, view, proj, cam_pos, cfg, backend=backend)
    return jnp.mean(img * img)

dev_scene = scene.to_device()
# TPU pallas forward + grads
img_tpu = np.asarray(render(dev_scene, view, proj, cam_pos, cfg, backend="pallas"))
g_tpu = jax.grad(lambda s: loss_fn(s, "pallas"))(dev_scene)
g_tpu = jax.tree.map(np.asarray, g_tpu)
# TPU tile (XLA, no pallas) as a second reference on the same device
img_tile = np.asarray(render(dev_scene, view, proj, cam_pos, cfg, backend="tile"))
g_tile = jax.tree.map(np.asarray, jax.grad(lambda s: loss_fn(s, "tile"))(dev_scene))

print("fwd pallas vs tile max|diff|:", np.abs(img_tpu - img_tile).max())
for name in ("xyz", "scale", "rot", "opacity", "sh"):
    a, b = getattr(g_tpu, name), getattr(g_tile, name)
    denom = np.abs(b).max() + 1e-12
    print(f"grad {name:8s}: max|pallas-tile|={np.abs(a-b).max():.3e}  rel={np.abs(a-b).max()/denom:.3e}  |tile|max={np.abs(b).max():.3e}")
