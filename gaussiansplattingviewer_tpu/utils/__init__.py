from gaussiansplattingviewer_tpu.utils.camera import Camera
from gaussiansplattingviewer_tpu.utils import transforms, colmap, image_io

__all__ = ["Camera", "transforms", "colmap", "image_io"]
