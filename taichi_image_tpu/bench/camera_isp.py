"""Full 6-camera ISP throughput benchmark (reference bench/camera_isp.py:
10k iters, packed12 -> reinhard, f16)."""

from __future__ import annotations

import argparse

import jax
import numpy as np

from taichi_image_tpu import types
from taichi_image_tpu.models.camera_isp import camera_isp
from taichi_image_tpu.ops.bayer import BayerPattern
from taichi_image_tpu.ops.interpolate import ImageTransform
from taichi_image_tpu.utils.benchmark import Benchmark


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument("--size", type=int, nargs=2, default=(2160, 3840))
  parser.add_argument("--cameras", type=int, default=6)
  parser.add_argument("--iterations", type=int, default=1000)
  parser.add_argument("--warmup", type=int, default=20)
  parser.add_argument("--resize", type=int, default=0)
  parser.add_argument("--transform", default="none")
  parser.add_argument("--dtype", choices=["f16", "f32", "bf16"],
                      default="f16")
  args = parser.parse_args(argv)

  h, w = args.size
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(
      0, 256, (args.cameras, h, w * 3 // 2), dtype=np.uint8))

  dtype = {"f16": types.f16, "f32": types.f32, "bf16": types.bf16}[args.dtype]
  isp = camera_isp("Bench", dtype)(
      BayerPattern.RGGB, moving_alpha=0.1, resize_width=args.resize,
      transform=ImageTransform[args.transform])

  out = isp.process(raws, gamma=0.6)
  for _ in range(args.warmup):
    out = isp.process(raws, gamma=0.6)
  _ = np.asarray(out)  # block_until_ready can lie through the axon tunnel

  with Benchmark("camera_isp 6x4K", args.iterations) as b:
    for _ in range(args.iterations):
      out = isp.process(raws, gamma=0.6)
    # fetch real bytes: each step consumed the previous EMA metrics, so
    # materializing the last output fences the whole chain
    _ = np.asarray(out)

  fps = args.iterations * args.cameras / b.elapsed
  print(f"full ISP: {fps:.1f} frames/s "
        f"({fps * h * w / 1e9:.2f} GPix/s)")


if __name__ == "__main__":
  main()
