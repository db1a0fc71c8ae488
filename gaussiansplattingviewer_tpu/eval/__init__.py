from gaussiansplattingviewer_tpu.eval.metrics import psnr, ssim, mse
from gaussiansplattingviewer_tpu.eval.lpips_metric import (
    lpips_available,
    lpips_distance,
)
from gaussiansplattingviewer_tpu.eval.blur import blur_effect
from gaussiansplattingviewer_tpu.eval.outliers import remove_statistical_outliers
from gaussiansplattingviewer_tpu.eval.reproject import (
    disparity_to_depth,
    disparity_to_pointcloud,
)
from gaussiansplattingviewer_tpu.eval.sharpen import sharpen_disparity

__all__ = [
    "psnr",
    "ssim",
    "mse",
    "blur_effect",
    "remove_statistical_outliers",
    "disparity_to_depth",
    "disparity_to_pointcloud",
    "sharpen_disparity",
]
