"""Probe: I420 output-path formulations at 6x4K bf16 (chained-jit).

After the round-3 tail-regression fix the honest I420 marginal is
+3.85 ms over the g=1 RGB anchor — WORSE than round 2's composed
gamma->u8->convert (+3.2). The mid-round "barrier recompute" win was an
artifact of the regressed anchor. This probe races the formulations
same-run:

- current:   fused_isp_step color_format="yuv420" (gamma finish
             recomputed in the Y and chroma chains behind an
             optimization_barrier; no u8 RGB intermediate)
- composed:  reinhard_gamma_ca -> u8 phase RGB -> yuv420_from_phases_u8
             (u8 RGB materialized once, read by both chains — round-2
             shipped structure)
- y_only:    Y plane only from the map output (lower bound for the
             Y chain)
- rgb:       the RGB anchor (fused_isp_step color_format="rgb")
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
from taichi_image_tpu.models.camera_isp import (fused_isp_step,
                                                load_raw_phases,
                                                metering_update_ca,
                                                reinhard_gamma_ca,
                                                reinhard_map_max_ca,
                                                yuv420_from_phases_u8)
from taichi_image_tpu.ops.bayer import BayerPattern, demosaic_phases
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


def _front(raws):
  ph = load_raw_phases(raws, "packed12", WD)
  x12, samp = demosaic_phases(ph, BayerPattern.RGGB,
                              out_dtype=types.canonical_dtype(WD),
                              sample_step=4)
  m = metering_update_ca(samp, jnp.zeros(9, jnp.float32),
                         jnp.float32(0.9))
  n, _, hh, wh = x12.shape
  cast, max_out = reinhard_map_max_ca(
      x12.reshape(n, 4, 3, hh, wh), m, 1.0, 1.0, 0.0, WD)
  return m, cast, max_out


def s_rgb(raws):
  m, out = fused_isp_step(
      raws, jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0, 1.0, 1.0,
      0.0, "packed12", False, WD, BayerPattern.RGGB, None, None, 8,
      ImageTransform.none, "reinhard")
  return jnp.sum(out, dtype=jnp.float32) + jnp.sum(m)


def s_current(raws):
  m, (y, uv) = fused_isp_step(
      raws, jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0, 1.0, 1.0,
      0.0, "packed12", False, WD, BayerPattern.RGGB, None, None, 8,
      ImageTransform.none, "reinhard", color_format="yuv420")
  return (jnp.sum(y, dtype=jnp.float32) + jnp.sum(uv, dtype=jnp.float32)
          + jnp.sum(m))


def s_composed(raws):
  m, cast, max_out = _front(raws)
  u8 = reinhard_gamma_ca(cast, max_out, 1.0)
  y, uv = yuv420_from_phases_u8(u8)
  return (jnp.sum(y, dtype=jnp.float32) + jnp.sum(uv, dtype=jnp.float32)
          + jnp.sum(m))


def s_y_only(raws):
  m, cast, max_out = _front(raws)
  u8 = reinhard_gamma_ca(cast, max_out, 1.0)
  from taichi_image_tpu.ops import bayer as bayer_ops
  from taichi_image_tpu.ops.color import _YUV_M, _YUV_OFFSET
  n, _, hh, wh = u8.shape
  xy = u8.reshape(n, 4, 3, hh, wh).astype(jnp.float32) / 255.0
  b, g, r = xy[:, :, 2], xy[:, :, 1], xy[:, :, 0]
  y_ph = jnp.minimum(1.0, _YUV_M[0, 0] * b + _YUV_M[0, 1] * g
                     + _YUV_M[0, 2] * r + _YUV_OFFSET[0])
  y_u8 = bayer_ops.phases_to_plane(
      jnp.clip(y_ph * 255.0, 0, 255).astype(jnp.uint8))
  return jnp.sum(y_u8, dtype=jnp.float32) + jnp.sum(m)


def main():
  want = sys.argv[1:] if len(sys.argv) > 1 else None
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  # value check first: current vs composed must agree bitwise
  small = jax.device_put(rng.integers(0, 256, size=(2, 256, 384 * 3 // 2),
                                      dtype=np.uint8))
  def cur_small(r):
    _, (y, uv) = fused_isp_step(
        r, jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0, 1.0, 1.0,
        0.0, "packed12", False, WD, BayerPattern.RGGB, None, None, 8,
        ImageTransform.none, "reinhard", color_format="yuv420")
    return y, uv
  def comp_small(r):
    ph = load_raw_phases(r, "packed12", WD)
    x12, samp = demosaic_phases(ph, BayerPattern.RGGB,
                                out_dtype=types.canonical_dtype(WD),
                                sample_step=4)
    m = metering_update_ca(samp, jnp.zeros(9, jnp.float32),
                           jnp.float32(0.9))
    n, _, hh, wh = x12.shape
    cast, max_out = reinhard_map_max_ca(
        x12.reshape(n, 4, 3, hh, wh), m, 1.0, 1.0, 0.0, WD)
    return yuv420_from_phases_u8(reinhard_gamma_ca(cast, max_out, 1.0))
  ya, uva = jax.jit(cur_small)(small)
  yb, uvb = jax.jit(comp_small)(small)
  dy = int(np.abs(np.asarray(ya, np.int32) - np.asarray(yb, np.int32)).max())
  duv = int(np.abs(np.asarray(uva, np.int32) - np.asarray(uvb, np.int32)).max())
  print(f"values: max|dY|={dy} max|dUV|={duv}", flush=True)

  for name, fn in (("rgb anchor (g=1)", s_rgb),
                   ("I420 current (barrier recompute)", s_current),
                   ("I420 composed u8 (r2 style)", s_composed),
                   ("Y plane only", s_y_only)):
    if want and not any(w.lower() in name.lower() for w in want):
      continue
    try:
      print(f"{name:36} {timeit(fn, raws):6.2f} ms", flush=True)
    except Exception as e:
      print(f"{name:36} FAIL {type(e).__name__}: {str(e)[:90]}",
            flush=True)


if __name__ == "__main__":
  main()
