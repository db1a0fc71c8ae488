"""gaussiansplattingviewer_tpu — a TPU-native differentiable Gaussian splatting framework.

A from-scratch re-design (JAX / XLA / Pallas / shard_map) of the capabilities of
M-Gjerde/GaussianSplattingViewer: PLY-compatible Gaussian scene loading, EWA
3D->2D covariance projection, SH-to-RGB evaluation, on-device depth sorting,
tile-binned front-to-back alpha compositing with a fused backward pass, stereo
training-data generation (left/right/disparity triplets from COLMAP poses), and
the offline metrics pipeline — all without GL or CUDA.

Layering (cf. reference layer map, SURVEY.md §1):
  models/    Gaussian scene pytree + PLY I/O             (ref util_gau.py)
  utils/     camera math, COLMAP parsing, image I/O      (ref util.py, main.py)
  ops/       projection, SH, sorting, binning, raster    (ref shaders/*.glsl,
             kernels (jnp oracle + Pallas TPU kernels)    diff-gaussian-rasterization)
  parallel/  mesh / tile sharding / grad all-reduce      (new; no ref analogue)
  apps/      viewer CLI + stereo dataset generator       (ref main.py, render_all.py)
  eval/      PSNR / SSIM / blur / outlier metrics        (ref metrics/)
"""

__version__ = "0.1.0"

from gaussiansplattingviewer_tpu.models.gaussians import GaussianData, naive_gaussian
from gaussiansplattingviewer_tpu.utils.camera import Camera
from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode

__all__ = [
    "GaussianData",
    "naive_gaussian",
    "Camera",
    "RenderConfig",
    "RenderMode",
    "__version__",
]
