"""Stage-time table for the 6x4K fused ISP step (chained-jit methodology).

Each row times a PREFIX of the pipeline; successive deltas attribute time
to stages. All prefixes end in a full-array f32 sum so no stage is dead-
code eliminated.
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
                                                reinhard_apply_ca)
from taichi_image_tpu.ops.bayer import (BayerPattern, _demosaic_tables,
                                        demosaic_phases)
from taichi_image_tpu.ops.interpolate import ImageTransform
from taichi_image_tpu.ops.pallas import demosaic as pallas_dm

N, H, W = 6, 2160, 3840
WD = types.canonical_dtype(
    __import__("os").environ.get("TAICHI_PROBE_WD", "float16"))
K = int(__import__("os").environ.get("TAICHI_PROBE_K", "10"))
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


def s_decode(raws):
  ph = load_raw_phases(raws, "packed12", WD)
  return jnp.sum(ph.astype(jnp.float32))


def s_decode_pad(raws):
  ph = load_raw_phases(raws, "packed12", WD).astype(jnp.float32)
  tr, tw = pallas_dm.tiling_for(H // 2, W // 2)
  ni, nj = -(-(H // 2) // tr), -(-(W // 2) // tw)
  padded = jnp.pad(ph, ((0, 0), (0, 0),
                        (4, 4 + ni * tr - H // 2),
                        (128, 128 + nj * tw - W // 2)))
  return jnp.sum(padded)


def s_stencil(raws):
  ph = load_raw_phases(raws, "packed12", WD).astype(jnp.float32)
  w = _demosaic_tables(BayerPattern.RGGB, "mhc")
  tr, tw = pallas_dm.tiling_for(H // 2, W // 2)
  num = pallas_dm.demosaic_stencil(ph, w, tr, tw)
  return jnp.sum(num)


def s_x12(raws):
  ph = load_raw_phases(raws, "packed12", WD)
  x12 = demosaic_phases(ph, BayerPattern.RGGB,
                        out_dtype=types.canonical_dtype(WD))
  return jnp.sum(x12.astype(jnp.float32))


def s_metering_slice(raws):
  ph = load_raw_phases(raws, "packed12", WD)
  x12 = demosaic_phases(ph, BayerPattern.RGGB,
                        out_dtype=types.canonical_dtype(WD))
  strided = x12[:, 0:3, ::4, ::4]
  m = metering_update_ca(strided, jnp.zeros(9, jnp.float32),
                         jnp.float32(0.9))
  return jnp.sum(x12.astype(jnp.float32)) + jnp.sum(m)


def s_metering_kernel(raws):
  ph = load_raw_phases(raws, "packed12", WD)
  x12, samp = demosaic_phases(ph, BayerPattern.RGGB,
                              out_dtype=types.canonical_dtype(WD),
                              sample_step=4)
  m = metering_update_ca(samp, jnp.zeros(9, jnp.float32),
                         jnp.float32(0.9))
  return jnp.sum(x12.astype(jnp.float32)) + jnp.sum(m)


def s_full_traced(raws):
  m, out = fused_isp_step(
      raws, jnp.zeros(9, jnp.float32), jnp.float32(0.9), jnp.float32(0.6),
      jnp.float32(1.0), jnp.float32(1.0), jnp.float32(0.0),
      "packed12", False, WD, BayerPattern.RGGB, None, None, 8,
      ImageTransform.none, "reinhard")
  return jnp.sum(out, dtype=jnp.float32) + jnp.sum(m)


def s_full(raws):
  m, out = fused_isp_step(
      raws, jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0,
      1.0, 1.0, 0.0,
      "packed12", False, WD, BayerPattern.RGGB, None, None, 8,
      ImageTransform.none, "reinhard")
  return jnp.sum(out, dtype=jnp.float32) + jnp.sum(m)


def s_full_gamma09(raws):
  m, out = fused_isp_step(
      raws, jnp.zeros(9, jnp.float32), jnp.float32(0.9), 0.9,
      3.0, 1.0, 0.0,
      "packed12", False, WD, BayerPattern.RGGB, None, None, 8,
      ImageTransform.none, "reinhard")
  return jnp.sum(out, dtype=jnp.float32) + jnp.sum(m)


def s_full_gamma(raws):
  m, out = fused_isp_step(
      raws, jnp.zeros(9, jnp.float32), jnp.float32(0.9), 0.6,
      1.0, 1.0, 0.0,
      "packed12", False, WD, BayerPattern.RGGB, None, None, 8,
      ImageTransform.none, "reinhard")
  return jnp.sum(out, dtype=jnp.float32) + jnp.sum(m)


def s_full_resize(raws):
  m, out = fused_isp_step(
      raws, jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0,
      1.0, 1.0, 0.0,
      "packed12", False, WD, BayerPattern.RGGB, None,
      ((1920, 1080), 0.5), 8, ImageTransform.none, "reinhard")
  return jnp.sum(out, dtype=jnp.float32) + jnp.sum(m)


def s_full_transform(raws):
  m, out = fused_isp_step(
      raws, jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0,
      1.0, 1.0, 0.0,
      "packed12", False, WD, BayerPattern.RGGB, None, None, 8,
      ImageTransform.rotate_90, "reinhard")
  return jnp.sum(out, dtype=jnp.float32) + jnp.sum(m)


def s_full_yuv(raws):
  m, (y, uv) = fused_isp_step(
      raws, jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0,
      1.0, 1.0, 0.0,
      "packed12", False, WD, BayerPattern.RGGB, None, None, 8,
      ImageTransform.none, "reinhard", color_format="yuv420")
  return (jnp.sum(y, dtype=jnp.float32) + jnp.sum(uv, dtype=jnp.float32)
          + jnp.sum(m))


def main():
  import sys
  want = sys.argv[1:] if len(sys.argv) > 1 else None
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  rows = [("decode->f16 phases", s_decode),
          ("decode+pad->f32", s_decode_pad),
          ("decode+pad+stencil(num f32)", s_stencil),
          ("decode+demosaic->x12 f16", s_x12),
          ("+metering (x12 strided slice)", s_metering_slice),
          ("+metering (kernel samples)", s_metering_kernel),
          ("FULL traced params, gamma .6", s_full_traced),
          ("FULL static, gamma=1", s_full),
          ("FULL static, g=0.9 i=3 (CLI default)", s_full_gamma09),
          ("FULL static, gamma=0.6", s_full_gamma),
          ("FULL static g=1 + resize 0.5", s_full_resize),
          ("FULL static g=1 + rot90", s_full_transform),
          ("FULL static g=1 -> I420", s_full_yuv)]
  prev = 0.0
  for name, fn in rows:
    if want and not any(w.lower() in name.lower() for w in want):
      continue
    try:
      ms = timeit(fn, raws)
      print(f"{name:32} {ms:7.2f} ms   (+{ms - prev:6.2f})", flush=True)
      prev = ms
    except Exception as e:
      print(f"{name:32} FAILED {type(e).__name__}: {str(e)[:90]}",
            flush=True)


if __name__ == "__main__":
  main()
