from taichi_image_tpu.utils.bounds import (
    Bounds,
    bounds_from_np,
    bounds_to_np,
    image_bounds,
    lerp,
    union_bounds,
)
from taichi_image_tpu.utils.cache import cache
from taichi_image_tpu.utils.benchmark import Benchmark, benchmark
from taichi_image_tpu.utils.image import mse, psnr
from taichi_image_tpu.utils import profiling

__all__ = [
    "Bounds",
    "bounds_from_np",
    "bounds_to_np",
    "image_bounds",
    "lerp",
    "union_bounds",
    "cache",
    "Benchmark",
    "benchmark",
    "mse",
    "psnr",
    "profiling",
]
