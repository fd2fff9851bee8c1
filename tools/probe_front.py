"""Probe: front-fused demosaic+Reinhard vs the composed kernel chain.

Round-3 roofline work: the composed bf16 step materializes the demosaic
kernel's x12 (298 MB at 6x4K) just for the map kernel to read it back —
~600 MB of HBM traffic the fused kernel skips by applying the map
in-register on the finished x12 values. The price is a strided-conv
metering sample pre-pass (one extra read of the phase planes, ~150 MB)
because the map needs this frame's metrics before the stencil runs.

Rows (chained-jit, distinct-byte XOR, every output consumed):
- composed:   the previous shipped structure (demosaic sample emission ->
              metering -> bf16 map kernel -> gamma -> interleave)
- front:      fused_isp_step with the front-fused gate forced open
              (pre-pass -> metering -> demosaic_reinhard_stencil ->
              gamma -> interleave). VERDICT OF THIS PROBE: the route
              LOSES 2x (14.0 vs 7.3 ms) — it is OFF by default
              (TAICHI_IMAGE_TPU_FRONT_FUSED=1 opts in); see also
              probe_front2.py for the kernel-isolated race.
- prepass:    decode + sample pre-pass + metering only (the new stage's
              marginal cost)
- mapkernel:  decode + demosaic(sample emission) + metering + map kernel
              (no gamma/interleave) — the stage the fusion absorbs
"""

import os
import sys

os.environ["TAICHI_IMAGE_TPU_FRONT_FUSED"] = "1"  # this probe races it

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu import types
from taichi_image_tpu.models.camera_isp import (demosaic_reinhard_front,
                                                fused_isp_step,
                                                load_raw_phases,
                                                metering_update_ca,
                                                reinhard_gamma_ca,
                                                reinhard_map_max_ca)
from taichi_image_tpu.ops import bayer as bayer_ops
from taichi_image_tpu.ops.bayer import (BayerPattern, demosaic_phases,
                                        demosaic_samples)
from taichi_image_tpu.ops.interpolate import ImageTransform
from taichi_image_tpu.models.camera_isp import (
    planar_from_phases_transformed)

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


def s_front(raws):
  """The shipped step (front-fused route on TPU)."""
  m, out = fused_isp_step(
      raws, jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0, 1.0, 1.0,
      0.0, "packed12", False, WD, BayerPattern.RGGB, None, None, 8,
      ImageTransform.none, "reinhard")
  return jnp.sum(out, dtype=jnp.float32) + jnp.sum(m)


def s_composed(raws):
  """The previous shipped structure, built from the same pieces."""
  ph = load_raw_phases(raws, "packed12", WD)
  x12, samp = demosaic_phases(ph, BayerPattern.RGGB,
                              out_dtype=types.canonical_dtype(WD),
                              sample_step=4)
  m = metering_update_ca(samp, jnp.zeros(9, jnp.float32),
                         jnp.float32(0.9))
  n, _, hh, wh = x12.shape
  cast, max_out = reinhard_map_max_ca(
      x12.reshape(n, 4, 3, hh, wh), m, 1.0, 1.0, 0.0, WD)
  out12 = reinhard_gamma_ca(cast, max_out, 1.0)
  out = planar_from_phases_transformed(out12.reshape(n, 12, hh, wh),
                                       ImageTransform.none)
  return jnp.sum(out, dtype=jnp.float32) + jnp.sum(m)


def s_prepass(raws):
  """decode + sample pre-pass + metering (the new stage alone)."""
  ph = load_raw_phases(raws, "packed12", WD)
  samp = demosaic_samples(ph, BayerPattern.RGGB,
                          out_dtype=types.canonical_dtype(WD),
                          sample_step=4)
  m = metering_update_ca(samp, jnp.zeros(9, jnp.float32),
                         jnp.float32(0.9))
  return jnp.sum(m)


def s_prepass_shift(raws):
  """Same as s_prepass with the shift+subsample formulation (the
  fallback if the strided conv is layout-pathological on TPU)."""
  ph = load_raw_phases(raws, "packed12", WD)
  samp = demosaic_samples(ph, BayerPattern.RGGB,
                          out_dtype=types.canonical_dtype(WD),
                          sample_step=4, formulation="shift")
  m = metering_update_ca(samp, jnp.zeros(9, jnp.float32),
                         jnp.float32(0.9))
  return jnp.sum(m)


def s_mapkernel(raws):
  """decode + demosaic(sample emission) + metering + map kernel — the
  chain the fusion absorbs (no gamma/interleave tail)."""
  ph = load_raw_phases(raws, "packed12", WD)
  x12, samp = demosaic_phases(ph, BayerPattern.RGGB,
                              out_dtype=types.canonical_dtype(WD),
                              sample_step=4)
  m = metering_update_ca(samp, jnp.zeros(9, jnp.float32),
                         jnp.float32(0.9))
  n, _, hh, wh = x12.shape
  cast, max_out = reinhard_map_max_ca(
      x12.reshape(n, 4, 3, hh, wh), m, 1.0, 1.0, 0.0, WD)
  return (jnp.sum(cast.astype(jnp.float32)) + jnp.sum(max_out)
          + jnp.sum(m))


def s_frontkernel(raws):
  """decode + pre-pass + metering + fused kernel (no gamma/interleave)."""
  ph = load_raw_phases(raws, "packed12", WD)
  samp = demosaic_samples(ph, BayerPattern.RGGB,
                          out_dtype=types.canonical_dtype(WD),
                          sample_step=4)
  m = metering_update_ca(samp, jnp.zeros(9, jnp.float32),
                         jnp.float32(0.9))
  cast, max_out = demosaic_reinhard_front(ph, m, 1.0, 1.0,
                                          BayerPattern.RGGB, None)
  return (jnp.sum(cast.astype(jnp.float32)) + jnp.sum(max_out)
          + jnp.sum(m))


def main():
  want = sys.argv[1:] if len(sys.argv) > 1 else None
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))

  # value check on a small fixture: front vs composed step u8 <=1 count,
  # metrics close (pre-pass tap association differs by f32 ulps)
  small = jax.device_put(rng.integers(0, 256, size=(2, 256, 384 * 3 // 2),
                                      dtype=np.uint8))

  def step_small(r):
    return fused_isp_step(
        r, jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0, 1.0, 1.0,
        0.0, "packed12", False, WD, BayerPattern.RGGB, None, None, 8,
        ImageTransform.none, "reinhard")

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
    out12 = reinhard_gamma_ca(cast, max_out, 1.0)
    return m, planar_from_phases_transformed(
        out12.reshape(n, 12, hh, wh), ImageTransform.none)

  mf, of = jax.jit(step_small)(small)
  mc, oc = jax.jit(comp_small)(small)
  d = int(np.abs(np.asarray(of, np.int32) - np.asarray(oc, np.int32)).max())
  dm = float(np.abs(np.asarray(mf) - np.asarray(mc)).max())
  print(f"values: u8 max|d|={d} metrics max|d|={dm:.2e}", flush=True)

  for name, fn in (("composed (r2/r3 structure)", s_composed),
                   ("front-fused step (shipped)", s_front),
                   ("substage sample pre-pass", s_prepass),
                   ("substage pre-pass shift form", s_prepass_shift),
                   ("substage composed thru map", s_mapkernel),
                   ("substage front thru kernel", s_frontkernel)):
    if want and not any(w.lower() in name.lower() for w in want):
      continue
    try:
      print(f"{name:36} {timeit(fn, raws):6.2f} ms", flush=True)
    except Exception as e:
      print(f"{name:36} FAIL {type(e).__name__}: {str(e)[:90]}",
            flush=True)


if __name__ == "__main__":
  main()
