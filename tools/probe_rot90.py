"""Probe: rot90 output-transform formulations at 6x4K u8 (chained-jit).

The phase-space transform (round 2) runs two movement passes over the
tonemapped u8: per-plane jnp.rot90 of the 12 phase planes, then the
phase->planar 6-d interleave transpose — honest marginal +3.58 ms over
the g=1 anchor. Both passes are pure data movement, so they compose
into ONE 6-d transpose + two axis flips:

  planar = x12.reshape(n,2,2,3,hh,wh)          # (n, pc, pr, c, ih, iw)
  rot90(planar_from_phases(x12)) ==
      x6.transpose(0,3,5,1,4,2)[..., ::-1, ::-1].reshape(n,3,2wh,2hh)

(derivation: out[c, 2*iw+pc, 2*ox+rx] = x6[pc, 1-rx, c, hh-1-ox, iw]).
This probe races the two formulations from the same tonemapped u8 and
bit-checks them against each other.
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
from taichi_image_tpu.models.camera_isp import (
    fused_isp_step, load_raw_phases, metering_update_ca,
    planar_from_phases_transformed, reinhard_gamma_ca,
    reinhard_map_max_ca)
from taichi_image_tpu.ops.bayer import (BayerPattern, demosaic_phases,
                                        phases_to_planar)
from taichi_image_tpu.ops.interpolate import ImageTransform

N, H, W = 6, 2160, 3840
WD = types.bf16
K = 10
REPS = 3


def timeit(fn, raws, k=K, reps=REPS):
  @jax.jit
  def steps(raws):
    acc = jnp.float32(0)
    for i in range(k):
      acc = acc + fn(raws ^ jnp.uint8(i))
    return acc
  _ = np.asarray(steps(raws))
  best = None
  for _ in range(reps):
    t0 = time.perf_counter()
    _ = np.asarray(steps(raws))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / k * 1000.0


def rot90_oneshot(out12):
  n, _, hh, wh = out12.shape
  x6 = out12.reshape(n, 2, 2, 3, hh, wh)
  t = x6.transpose(0, 3, 5, 1, 4, 2)[..., ::-1, ::-1]
  return t.reshape(n, 3, 2 * wh, 2 * hh)


def _u8(raws):
  ph = load_raw_phases(raws, "packed12", WD)
  x12, samp = demosaic_phases(ph, BayerPattern.RGGB,
                              out_dtype=types.canonical_dtype(WD),
                              sample_step=4)
  m = metering_update_ca(samp, jnp.zeros(9, jnp.float32),
                         jnp.float32(0.9))
  n, _, hh, wh = x12.shape
  cast, max_out = reinhard_map_max_ca(
      x12.reshape(n, 4, 3, hh, wh), m, 1.0, 1.0, 0.0, WD)
  return m, reinhard_gamma_ca(cast, max_out, 1.0)


def s_interleave_only(raws):
  m, u8 = _u8(raws)
  return jnp.sum(phases_to_planar(u8), dtype=jnp.float32) + jnp.sum(m)


def s_rot90_current(raws):
  m, u8 = _u8(raws)
  out = planar_from_phases_transformed(u8, ImageTransform.rotate_90)
  return jnp.sum(out, dtype=jnp.float32) + jnp.sum(m)


def s_rot90_oneshot(raws):
  m, u8 = _u8(raws)
  return jnp.sum(rot90_oneshot(u8), dtype=jnp.float32) + jnp.sum(m)


def main():
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  # value check (small): one-shot must equal the current path bitwise
  small = jnp.asarray(rng.integers(0, 256, size=(2, 12, 64, 96),
                                   dtype=np.uint8))
  a = np.asarray(jax.jit(lambda x: planar_from_phases_transformed(
      x, ImageTransform.rotate_90))(small))
  b = np.asarray(jax.jit(rot90_oneshot)(small))
  print(f"values: bitwise={np.array_equal(a, b)} shapes {a.shape} {b.shape}",
        flush=True)

  for name, fn in (("interleave only (anchor)", s_interleave_only),
                   ("rot90 current (2-pass phase)", s_rot90_current),
                   ("rot90 one-shot transpose", s_rot90_oneshot)):
    try:
      print(f"{name:32} {timeit(fn, raws):6.2f} ms", flush=True)
    except Exception as e:
      print(f"{name:32} FAIL {type(e).__name__}: {str(e)[:90]}",
            flush=True)


if __name__ == "__main__":
  main()
