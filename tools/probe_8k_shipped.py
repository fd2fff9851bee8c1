"""Probe: the SHIPPED process_banded(driver='flat') at 6x8K, A/B on the
round-5 Pallas finish kernel (TAICHI_IMAGE_TPU_FINISH_KERNEL=1 is the
opt-in lever — the _assemble branch is host-level, so toggling between
calls selects the path without retracing). Also value-checks the two
paths against each other (expected BITWISE: probe_finish8k proved the
kernel finish bitwise vs the chunked XLA finish on chip)."""

import os
import sys

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu import types
from taichi_image_tpu.models import large
from taichi_image_tpu.ops.bayer import BayerPattern

N, H, W = 6, 4320, 7680
REPS = 5


def main():
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  s_u8 = jax.jit(lambda o: jnp.sum(o, dtype=jnp.float32))

  def flat(r):
    return large.process_banded(r, np.zeros(9, np.float32), 0.0,
                                n_bands=8, work_dtype=types.bf16,
                                pattern=BayerPattern.RGGB, driver="flat")

  outs = {}

  def timed(name):
    m, out = flat(raws)
    jax.block_until_ready(out)
    outs[name] = np.asarray(out)
    best = None
    for _ in range(REPS):
      t0 = time.perf_counter()
      m, out = flat(raws)
      _ = float(np.asarray(s_u8(out)))
      el = time.perf_counter() - t0
      best = el if best is None else min(best, el)
    print(f"{name:34} {best * 1000.0:9.1f} ms/set "
          f"({N / best:.1f} f/s)", flush=True)

  os.environ.pop("TAICHI_IMAGE_TPU_FINISH_KERNEL", None)
  timed("flat shipped, chunked XLA finish")
  os.environ["TAICHI_IMAGE_TPU_FINISH_KERNEL"] = "1"
  timed("flat shipped, finish KERNEL")
  eq = np.array_equal(outs["flat shipped, chunked XLA finish"],
                      outs["flat shipped, finish KERNEL"])
  print(f"paths bitwise-equal: {eq}", flush=True)


if __name__ == "__main__":
  main()
