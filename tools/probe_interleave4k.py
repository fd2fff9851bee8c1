"""Probe: 6-d transpose vs stack interleave in the 4K fused step's tail.

The 8K banded finish chunks measured the parameter-fed 6-d transpose at
~22 GB/s and the stack form won the set 142.8 vs 208.8 ms
(probe_large2 close). The 4K FUSED step's interleave consumes in-program
producers instead of a parameter, and a round-1 standalone 16-bit probe
had the transpose ahead (probe_interleave.py) — so the fused-tail choice
needs its own race. Runs the full bf16 fused step K-chained with the
tail interleave monkeypatched per invocation.

Usage: python tools/probe_interleave4k.py          # shipped transpose6
       python tools/probe_interleave4k.py stack    # stack form
(run both back-to-back; the jit cache forces one process per form)
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
from taichi_image_tpu.ops import bayer
from taichi_image_tpu.models import camera_isp

FORM = "stack" if "stack" in sys.argv[1:] else "transpose6"
if FORM == "stack":
  camera_isp.phases_to_planar = bayer.phases_to_planar_stack

from taichi_image_tpu.models.camera_isp import fused_isp_step
from taichi_image_tpu.ops.bayer import BayerPattern
from taichi_image_tpu.ops.interpolate import ImageTransform

N, H, W = 6, 2160, 3840
K, REPS = 10, 3


def main():
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))

  @jax.jit
  def steps(m, raws):
    acc = jnp.int32(0)
    for i in range(K):
      m, out = fused_isp_step(
          raws ^ jnp.uint8(i), m, jnp.float32(0.9), 1.0, 1.0, 1.0, 0.0,
          "packed12", False, types.bf16, BayerPattern.RGGB, None, None,
          8, ImageTransform.none, "reinhard")
      acc = acc + jnp.sum(out, dtype=jnp.int32)
    return m, acc

  m0 = jnp.zeros(9, jnp.float32)
  _ = np.asarray(steps(m0, raws)[1])
  best = None
  for _ in range(REPS):
    t0 = time.perf_counter()
    _ = np.asarray(steps(m0, raws)[1])
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  print(f"4K fused step, tail={FORM:10} {best / K * 1000:7.2f} ms/step",
        flush=True)


if __name__ == "__main__":
  main()
