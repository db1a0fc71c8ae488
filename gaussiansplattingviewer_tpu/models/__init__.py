from gaussiansplattingviewer_tpu.models.gaussians import GaussianData, naive_gaussian
from gaussiansplattingviewer_tpu.models.ply import load_ply, save_ply
from gaussiansplattingviewer_tpu.models.random_scene import random_scene

__all__ = ["GaussianData", "naive_gaussian", "load_ply", "save_ply", "random_scene"]
