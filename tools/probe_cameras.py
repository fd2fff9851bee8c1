"""Probe: camera-count scaling of the fused bf16 step at 4K (the
serving-characteristics table in docs/PERFORMANCE.md).

Chained-jit methodology (distinct byte per iteration, every output
consumed); one row per rig size.
"""

import sys

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu import types
from taichi_image_tpu.models.camera_isp import fused_isp_step
from taichi_image_tpu.ops.bayer import BayerPattern
from taichi_image_tpu.ops.interpolate import ImageTransform

H, W = 2160, 3840
K = 10
REPS = 3


def main():
  cams = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 6, 8, 12]
  rng = np.random.default_rng(0)
  for n in cams:
    raws = jax.device_put(rng.integers(0, 256, size=(n, H, W * 3 // 2),
                                       dtype=np.uint8))

    @jax.jit
    def steps(raws):
      acc = jnp.float32(0)
      m = jnp.zeros(9, jnp.float32)
      t = jnp.float32(0.0)
      for i in range(K):
        m, out = fused_isp_step(
            raws ^ jnp.uint8(i + 1), m, t, 1.0, 1.0, 1.0, 0.0,
            "packed12", False, types.bf16, BayerPattern.RGGB, None,
            None, 8, ImageTransform.none, "reinhard")
        t = jnp.float32(0.9)
        acc = acc + jnp.sum(out, dtype=jnp.float32)
      return acc + jnp.sum(m)

    _ = float(np.asarray(steps(raws)))
    best = None
    for _ in range(REPS):
      t0 = time.perf_counter()
      _ = float(np.asarray(steps(raws)))
      el = time.perf_counter() - t0
      best = el if best is None else min(best, el)
    ms = best / K * 1000.0
    print(f"{n:3d} cameras  {ms:7.2f} ms/step  {n / (ms / 1000):7.1f} f/s"
          f"  {ms / n:6.2f} ms/frame", flush=True)


if __name__ == "__main__":
  main()
