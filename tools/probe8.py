"""Probe v8: end-to-end fused ISP variants at 6x4K f16.

 V1: current library step (conv demosaic)
 V2: Pallas f32 demosaic island, rest XLA f16
 V3: XLA shift-add demosaic (no conv, no channel-minor layouts)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taichi_image_tpu import types
from taichi_image_tpu.models.camera_isp import (fused_isp_step,
                                                load_raw_phases,
                                                metering_update_ca,
                                                reinhard_apply_ca)
from taichi_image_tpu.ops.bayer import (_demosaic_tables, _edge_sums,
                                        phases_to_planar, BayerPattern)
from taichi_image_tpu.ops.interpolate import ImageTransform

N, H, W = 6, 2160, 3840
HH, WH = H // 2, W // 2
K = 8
w12 = np.asarray(_demosaic_tables(BayerPattern.RGGB, "mhc"))


def timeit(name, jitted, *args):
  v = np.asarray(jitted(*args))
  reps = 3
  t0 = time.perf_counter()
  for _ in range(reps):
    v = np.asarray(jitted(*args))
  el = (time.perf_counter() - t0) / reps / K
  print(f"{name}: {el*1e3:.2f} ms/step ({N/el:.0f} f/s) chk={v}")


def chain(step):
  @jax.jit
  def run(raws, m):
    out = None
    for i in range(K):
      m, out = step(raws ^ jnp.uint8(i & 1), m)
    return m, jnp.sum(out, dtype=jnp.int32)
  def call(raws, m):
    mm, chk = run(raws, m)
    return chk
  return call


# ---- V2: pallas demosaic
TR, TW = 120, 640
HALO_R, HALO_C = 4, 128


def dm_kernel(hbm_ref, out_ref):
  n, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
  def body(scratch, sem):
    dma = pltpu.make_async_copy(
        hbm_ref.at[n, :, pl.ds(i * TR, TR + 2 * HALO_R),
                   pl.ds(j * TW, TW + 2 * HALO_C)], scratch, sem)
    dma.start(); dma.wait()
    for oc in range(12):
      a = None
      for q in range(4):
        for u in range(3):
          for v in range(3):
            wgt = float(w12[oc, q, u, v])
            if wgt == 0.0:
              continue
            t = scratch[q, HALO_R - 1 + u:HALO_R - 1 + u + TR,
                        HALO_C - 1 + v:HALO_C - 1 + v + TW] * wgt
            a = t if a is None else a + t
      out_ref[0, oc] = a * (1.0 / 16.0)  # clamp AFTER edge renorm
  pl.run_scoped(body, scratch=pltpu.VMEM(
      (4, TR + 2 * HALO_R, TW + 2 * HALO_C), jnp.float32),
      sem=pltpu.SemaphoreType.DMA)


def dm_pallas(phases_f32):
  padded = jnp.pad(phases_f32,
                   ((0, 0), (0, 0), (HALO_R, HALO_R), (HALO_C, HALO_C)))
  return pl.pallas_call(
      dm_kernel,
      out_shape=jax.ShapeDtypeStruct((N, 12, HH, WH), jnp.float32),
      grid=(N, HH // TR, WH // TW),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=pl.BlockSpec((1, 12, TR, TW), lambda n, i, j: (n, 0, i, j),
                             memory_space=pltpu.VMEM),
  )(padded)


def fix_edges(x12):
  """x12 = num/16 UNclamped; rescale border strips to num/d (exact
  renorm). Corner entries of the column factors are 1 because the row
  factors already applied the full corner divisor."""
  full, top, bottom, left, right = _edge_sums(w12, HH, WH)
  f = lambda d: jnp.asarray(16.0 / d, jnp.float32)
  gl, gr = 16.0 / left, 16.0 / right
  gl[:, 0] = gl[:, -1] = 1.0
  gr[:, 0] = gr[:, -1] = 1.0
  x12 = x12.at[:, :, 0, :].mul(f(top)[None])
  x12 = x12.at[:, :, -1, :].mul(f(bottom)[None])
  x12 = x12.at[:, :, :, 0].mul(jnp.asarray(gl, jnp.float32)[None])
  x12 = x12.at[:, :, :, -1].mul(jnp.asarray(gr, jnp.float32)[None])
  return jnp.clip(x12, 0.0, 1.0)


def step_v2(raws, m):
  # f16 quantization for work-dtype parity, widened to f32 for pallas
  phases = load_raw_phases(raws, "packed12", types.f16).astype(jnp.float32)
  x12 = fix_edges(dm_pallas(phases))
  x12 = x12.astype(jnp.float16)
  strided = x12[:, 0:3, ::4, ::4]
  m2 = metering_update_ca(strided, m, jnp.float32(0.9))
  out12 = reinhard_apply_ca(x12.reshape(N, 4, 3, HH, WH), m2,
                            jnp.float32(0.6), jnp.float32(1.0),
                            jnp.float32(1.0), jnp.float32(0.0), types.f16)
  out = phases_to_planar(out12.reshape(N, 12, HH, WH),
                         jnp.float32).astype(jnp.uint8)
  return m2, out


# ---- V3: shift-add XLA demosaic
def dm_shift(phases):
  p = jnp.pad(phases.astype(jnp.float32),
              ((0, 0), (0, 0), (1, 1), (1, 1)))
  outs = []
  for oc in range(12):
    a = None
    for q in range(4):
      for u in range(3):
        for v in range(3):
          wgt = float(w12[oc, q, u, v])
          if wgt == 0.0:
            continue
          t = p[:, q, u:u + HH, v:v + WH] * wgt
          a = t if a is None else a + t
    outs.append(a * (1.0 / 16.0))
  return jnp.stack(outs, axis=1)


def step_v3(raws, m):
  phases = load_raw_phases(raws, "packed12", types.f16)
  x12 = fix_edges(dm_shift(phases)).astype(jnp.float16)
  strided = x12[:, 0:3, ::4, ::4]
  m2 = metering_update_ca(strided, m, jnp.float32(0.9))
  out12 = reinhard_apply_ca(x12.reshape(N, 4, 3, HH, WH), m2,
                            jnp.float32(0.6), jnp.float32(1.0),
                            jnp.float32(1.0), jnp.float32(0.0), types.f16)
  out = phases_to_planar(out12.reshape(N, 12, HH, WH),
                         jnp.float32).astype(jnp.uint8)
  return m2, out


def step_v1(raws, m):
  return fused_isp_step(raws, m, jnp.float32(0.9), jnp.float32(0.6),
                        jnp.float32(1.0), jnp.float32(1.0), jnp.float32(0.0),
                        "packed12", False, types.f16, BayerPattern.RGGB,
                        None, None, 8, ImageTransform.none, "reinhard")


def main():
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, (N, H, W * 3 // 2), np.uint8))
  m0 = jnp.zeros(9, jnp.float32)

  # correctness cross-check on real data
  m1, o1 = jax.jit(step_v1)(raws, m0)
  for name, s in [("V2", step_v2), ("V3", step_v3)]:
    try:
      m2, o2 = jax.jit(s)(raws, m0)
      dm = float(jnp.abs(m1 - m2).max())
      do = int(jnp.abs(o1.astype(jnp.int32) - o2.astype(jnp.int32)).max())
      frac = float(jnp.mean((o1 != o2).astype(jnp.float32)))
      print(f"{name}: metric diff {dm:.2e}, out maxdiff {do}, fracdiff {frac:.4f}")
    except Exception as e:
      print(f"{name} check FAIL: {str(e).splitlines()[0][:140]}")

  for name, s in [("V1 conv", step_v1), ("V2 pallas", step_v2),
                  ("V3 shiftadd", step_v3)]:
    try:
      timeit(name, chain(s), raws, m0)
    except Exception as e:
      print(f"{name} FAIL: {str(e).splitlines()[0][:140]}")


if __name__ == "__main__":
  main()
