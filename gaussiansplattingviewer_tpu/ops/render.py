"""Top-level render API: render(scene, view, proj, cam_pos, cfg) -> image.

The single entry point replacing the reference's two-renderer split
(GaussianRenderBase's 8-method ABC, renderer_ogl.py:75-101): one unified,
jit-able, differentiable function with selectable backends:

  * "oracle": global-sort full-image blend (raster_jnp.py) — the semantic
    ground truth; O(N*H*W).
  * "tile":   tile-binned XLA pipeline (raster_tiles.py) — static shapes,
    runs anywhere.
  * "pallas": tile-binned with the Pallas TPU blend kernels — the
    production path (ops/pallas/).

All backends share projection (ops/projection.py) and binning semantics, so
their outputs agree to float tolerance — the property the reference could
only eyeball via its backend-switch flip test (README.md:55, main.py:944-947).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

from gaussiansplattingviewer_tpu.config import RenderConfig
from gaussiansplattingviewer_tpu.models.gaussians import GaussianData
from gaussiansplattingviewer_tpu.ops.projection import project
from gaussiansplattingviewer_tpu.ops.raster_jnp import rasterize_oracle

Backend = Literal["oracle", "tile", "pallas"]


@functools.partial(
    jax.jit, static_argnames=("cfg", "backend", "return_aux")
)
def _render_impl(scene, view, proj, cam_pos, cfg, backend, return_aux):
    splats = project(scene, view, proj, cam_pos, cfg)
    if backend == "oracle":
        return rasterize_oracle(splats, cfg, return_aux=return_aux)
    elif backend == "tile":
        from gaussiansplattingviewer_tpu.ops.raster_tiles import rasterize_tiles

        return rasterize_tiles(splats, cfg, return_aux=return_aux, use_pallas=False)
    elif backend == "pallas":
        from gaussiansplattingviewer_tpu.ops.raster_tiles import rasterize_tiles

        return rasterize_tiles(splats, cfg, return_aux=return_aux, use_pallas=True)
    raise ValueError(f"unknown backend {backend!r}")


def render(
    scene: GaussianData,
    view,
    proj,
    cam_pos,
    cfg: RenderConfig,
    backend: Backend = "pallas",
) -> jax.Array:
    """Render a scene to an (H, W, 3) float32 image in [0, +inf) (clamp for
    display).  Differentiable w.r.t. every GaussianData leaf."""
    return _render_impl(
        scene,
        jnp.asarray(view, jnp.float32),
        jnp.asarray(proj, jnp.float32),
        jnp.asarray(cam_pos, jnp.float32),
        cfg,
        backend,
        False,
    )


def render_with_aux(
    scene: GaussianData,
    view,
    proj,
    cam_pos,
    cfg: RenderConfig,
    backend: Backend = "pallas",
):
    """Like render(), additionally returning {"transmittance": (H, W)}."""
    return _render_impl(
        scene,
        jnp.asarray(view, jnp.float32),
        jnp.asarray(proj, jnp.float32),
        jnp.asarray(cam_pos, jnp.float32),
        cfg,
        backend,
        True,
    )


def render_camera(
    scene: GaussianData,
    camera,
    cfg: RenderConfig,
    backend: Backend = "pallas",
    view=None,
    cam_pos=None,
):
    """Convenience wrapper taking a utils.camera.Camera (host-side): builds
    the matrices the way the reference renderers do (renderer_ogl.py:160-173)
    and calls render()."""
    if view is None:
        view = camera.get_view_matrix()
    if cam_pos is None:
        import numpy as np

        cam_pos = np.linalg.inv(np.asarray(view))[:3, 3]
    proj = camera.get_project_matrix()
    return render(scene, view, proj, cam_pos, cfg, backend=backend)
