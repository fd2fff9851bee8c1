"""Bisect the one-jit model of the LAZY composed flow (probe_legacy's
``lazy`` graph measured 435 ms/set vs 7.7 fused — yet the real
multi-dispatch path's wall clock is ~61 ms, so that number is a
modeling artifact, not the real cost). Variants isolate which construct
(barriered per-camera inputs, concatenate, barriered output slices)
triggers the pathology inside a single jit.
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

N, H, W = 6, 2160, 3840
K = 8


def run(raws, in_bar, concat, out_slices, out_bar):
  @jax.jit
  def steps(raws):
    acc = jnp.int32(0)
    m = jnp.zeros(9, jnp.float32)
    for i in range(K):
      ri = raws ^ jnp.uint8(i)
      if concat:
        cams = [ri[c][None] for c in range(N)]
        if in_bar:
          cams = [jax.lax.optimization_barrier(c) for c in cams]
        batch = jnp.concatenate(cams)
      else:
        batch = jax.lax.optimization_barrier(ri) if in_bar else ri
      m, out = fused_isp_step(
          batch, m, jnp.float32(0.9), 0.9, 3.0, 1.0, 0.0, "packed12",
          False, types.bf16, BayerPattern.RGGB, None, None, 8,
          ImageTransform.none, "reinhard")
      if out_slices:
        for c in range(N):
          oc = out[c]
          if out_bar:
            oc = jax.lax.optimization_barrier(oc)
          acc = acc + jnp.sum(oc, dtype=jnp.int32)
      else:
        acc = acc + jnp.sum(out, dtype=jnp.int32)
    return acc

  _ = np.asarray(steps(raws))
  best = None
  for _ in range(3):
    t0 = time.perf_counter()
    _ = np.asarray(steps(raws))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / K * 1000.0


def main():
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  cfgs = [
      ("fused plain", dict(in_bar=False, concat=False,
                           out_slices=False, out_bar=False)),
      ("concat only", dict(in_bar=False, concat=True,
                           out_slices=False, out_bar=False)),
      ("concat+in_bar", dict(in_bar=True, concat=True,
                             out_slices=False, out_bar=False)),
      ("out slices (no bar)", dict(in_bar=False, concat=False,
                                   out_slices=True, out_bar=False)),
      ("out slices barriered", dict(in_bar=False, concat=False,
                                    out_slices=True, out_bar=True)),
      ("full lazy model", dict(in_bar=True, concat=True,
                               out_slices=True, out_bar=True)),
  ]
  for name, kw in cfgs:
    ms = run(raws, **kw)
    print(f"  {name:24s} {ms:8.2f} ms/set")


if __name__ == "__main__":
  main()
