"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests follow the standard JAX trick
(SURVEY.md §4: xla_force_host_platform_device_count) so the full pjit /
shard_map topology is exercised without TPU hardware.  Must run before the
first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may have pre-imported jax and registered a
# TPU plugin that ignores JAX_PLATFORMS; force the CPU backend explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gaussiansplattingviewer_tpu.config import RenderConfig  # noqa: E402
from gaussiansplattingviewer_tpu.models import naive_gaussian, random_scene  # noqa: E402
from gaussiansplattingviewer_tpu.utils.camera import Camera  # noqa: E402


@pytest.fixture(scope="session")
def naive_scene():
    scene, bbox, center = naive_gaussian()
    return scene


@pytest.fixture(scope="session")
def small_cfg():
    # small, tile-aligned resolution to keep oracle tests fast
    return RenderConfig(width=160, height=96)


@pytest.fixture(scope="session")
def small_camera(small_cfg):
    return Camera(h=small_cfg.height, w=small_cfg.width)


@pytest.fixture(scope="session")
def default_view(small_camera):
    # the reference's default free-fly pose: camera at (-3, 0, 1.5) looking
    # down -z with up (0,-1,0) (ref util.py:25-27)
    return small_camera.get_view_matrix()


@pytest.fixture(scope="session")
def front_view():
    """Camera at +3z looking at origin, up -y — puts the naive scene's
    splats in view with known screen positions."""
    from gaussiansplattingviewer_tpu.utils import transforms as tf

    return tf.look_at(
        np.array([0.0, 0.0, 3.0]),
        np.array([0.0, 0.0, 0.0]),
        np.array([0.0, -1.0, 0.0]),
    )


@pytest.fixture(scope="session")
def medium_scene():
    return random_scene(2000, sh_degree=3, seed=1)
