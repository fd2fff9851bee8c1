from taichi_image_tpu.utils.benchmark import Benchmark, benchmark

__all__ = ["Benchmark", "benchmark"]
