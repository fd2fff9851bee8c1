from taichi_image_tpu.models import camera_isp
from taichi_image_tpu.models.camera_isp import (
    Camera16,
    Camera32,
    CameraBF16,
    default_cc,
    moving_average,
)

# NOTE: `camera_isp` is the submodule (matching the reference's
# `from taichi_image import camera_isp` ergonomics); the class factory is
# `camera_isp.camera_isp`.
__all__ = ["camera_isp", "Camera16", "Camera32", "CameraBF16",
           "default_cc", "moving_average"]
