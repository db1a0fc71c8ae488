"""Stateful renderer with the reference's 8-method interface.

The reference's heart is the ``GaussianRenderBase`` ABC that both its
backends implement (renderer_ogl.py:75-101): update_gaussian_data,
sort_and_update, set_scale_modifier, set_render_mod, update_camera_pose,
update_camera_intrin, draw, set_render_reso.  This module reproduces that
capability set on the unified TPU pipeline so code written against the
reference's renderers ports 1:1 — while the functional API
(ops.render.render) remains the idiomatic JAX entry point.

Differences by design:
  * ``sort_and_update`` is a no-op hint (the tile pipeline sorts on-device
    inside ``draw``, like the reference's CUDA backend whose
    sort_and_update is also a pass, renderer_cuda.py:139-140);
  * ``draw`` returns the image as a host numpy array instead of writing a
    GL framebuffer.
"""

from __future__ import annotations

import numpy as np

from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode
from gaussiansplattingviewer_tpu.models.gaussians import GaussianData
from gaussiansplattingviewer_tpu.utils.camera import Camera


class GaussianRenderBase:
    """Interface parity with ref renderer_ogl.py:75-101."""

    def __init__(self):
        self.gaussians = None

    def update_gaussian_data(self, gaus: GaussianData):
        raise NotImplementedError()

    def sort_and_update(self, camera: Camera, use_file=False, pose=None):
        raise NotImplementedError()

    def set_scale_modifier(self, modifier: float):
        raise NotImplementedError()

    def set_render_mod(self, mod: int):
        raise NotImplementedError()

    def update_camera_pose(self, camera: Camera, use_file=False, pose=None):
        raise NotImplementedError()

    def update_camera_intrin(self, camera: Camera):
        raise NotImplementedError()

    def draw(self):
        raise NotImplementedError()

    def set_render_reso(self, w: int, h: int):
        raise NotImplementedError()


class TPURenderer(GaussianRenderBase):
    """The unified TPU backend (replaces both OpenGLRenderer and
    CUDARenderer; selectable executor like the reference's backend combo,
    main.py:944-947)."""

    def __init__(self, w: int, h: int, backend: str | None = None):
        super().__init__()
        import jax

        if backend is None:
            backend = "pallas" if jax.default_backend() == "tpu" else "tile"
        self.backend = backend
        self.cfg = RenderConfig(width=int(w), height=int(h))
        self._view = np.eye(4, dtype=np.float32)
        self._proj = None
        self._cam_pos = np.zeros(3, np.float32)

    # -- state setters (ref renderer_ogl.py:132-173) ----------------------

    def update_gaussian_data(self, gaus: GaussianData):
        self.gaussians = gaus.pad_to_multiple(256).to_device()

    def sort_and_update(self, camera: Camera, use_file=False, pose=None):
        # on-device sorting happens inside draw(); parity with the CUDA
        # backend's no-op (renderer_cuda.py:139-140)
        return

    def set_scale_modifier(self, modifier: float):
        self.cfg = self.cfg.with_(scale_modifier=float(modifier))

    def set_render_mod(self, mod: int):
        self.cfg = self.cfg.with_(mode=RenderMode(int(mod)))

    def update_camera_pose(self, camera: Camera, use_file=False, pose=None):
        if use_file and pose is not None:
            view = camera.get_view_matrix(
                True,
                pose.get("camera_front"),
                pose.get("camera_position"),
                pose.get("camera_up"),
                pose.get("camera_view"),
            )
            if pose.get("camera_position") is not None:
                camera.position = np.asarray(
                    pose["camera_position"], np.float32
                )
        else:
            view = camera.get_view_matrix(True)
        self._view = np.asarray(view, np.float32)
        self._cam_pos = np.linalg.inv(self._view)[:3, 3].astype(np.float32)

    def update_camera_intrin(self, camera: Camera):
        self._proj = camera.get_project_matrix()

    def set_render_reso(self, w: int, h: int):
        self.cfg = self.cfg.with_(width=int(w), height=int(h))

    # -- draw -------------------------------------------------------------

    def draw(self) -> np.ndarray:
        """Render with the current state -> (H, W, 3) float numpy image."""
        from gaussiansplattingviewer_tpu.ops.render import render

        assert self.gaussians is not None, "call update_gaussian_data first"
        if self._proj is None:
            cam = Camera(h=self.cfg.height, w=self.cfg.width)
            self._proj = cam.get_project_matrix()
        img = render(
            self.gaussians,
            self._view,
            self._proj,
            self._cam_pos,
            self.cfg,
            backend=self.backend,
        )
        return np.asarray(img)
