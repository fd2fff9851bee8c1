from taichi_image_tpu.ops import bayer, color, interpolate, kernel, packed, tonemap

__all__ = ["bayer", "color", "interpolate", "kernel", "packed", "tonemap"]
