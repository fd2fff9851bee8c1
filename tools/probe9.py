"""Probe v9: double-buffered DMA demosaic kernel vs simple DMA."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taichi_image_tpu.ops.bayer import _demosaic_tables, BayerPattern
from taichi_image_tpu.ops.pallas.demosaic import demosaic_stencil, tiling_for

N, H, W = 6, 2160, 3840
HH, WH = H // 2, W // 2
K = 8
TR, TW = 120, 640
HALO_R, HALO_C = 4, 128
NI, NJ = HH // TR, WH // TW
NT = N * NI * NJ
w12 = np.asarray(_demosaic_tables(BayerPattern.RGGB, "mhc"))
IB = (4, TR + 2 * HALO_R, TW + 2 * HALO_C)


def timeit(name, jitted, *args):
  v = np.asarray(jitted(*args))
  reps = 3
  t0 = time.perf_counter()
  for _ in range(reps):
    v = np.asarray(jitted(*args))
  el = (time.perf_counter() - t0) / reps / K
  print(f"{name}: {el*1e3:.2f} ms/iter ({N/el:.0f} f/s) chk={v:.6f}")


def chain(body):
  def run(x):
    acc = jnp.float32(0)
    for i in range(K):
      out = body(x + jnp.float32(i) * 1e-12)
      acc = acc + jnp.sum(out) * 1e-9
    return acc
  return jax.jit(run)


def kernel(hbm_ref, out_ref, scratch, sems):
  t = pl.program_id(0)

  def src(tt):
    n = tt // (NI * NJ)
    r = tt % (NI * NJ)
    i = r // NJ
    j = r % NJ
    return hbm_ref.at[n, :, pl.ds(i * TR, TR + 2 * HALO_R),
                      pl.ds(j * TW, TW + 2 * HALO_C)]

  def dma(slot, tt):
    return pltpu.make_async_copy(src(tt), scratch.at[slot], sems.at[slot])

  @pl.when(t == 0)
  def _():
    dma(0, 0).start()

  @pl.when(t + 1 < NT)
  def _():
    dma((t + 1) % 2, t + 1).start()

  dma(t % 2, t).wait()
  cur = scratch.at[t % 2]
  for oc in range(12):
    a = None
    for q in range(4):
      for u in range(3):
        for v in range(3):
          wgt = float(w12[oc, q, u, v])
          if wgt == 0.0:
            continue
          s = cur[q, HALO_R - 1 + u:HALO_R - 1 + u + TR,
                  HALO_C - 1 + v:HALO_C - 1 + v + TW] * wgt
          a = s if a is None else a + s
    out_ref[0, oc] = a * (1.0 / 16.0)


def out_map(t):
  n = t // (NI * NJ)
  r = t % (NI * NJ)
  return (n, 0, r // NJ, r % NJ)


def dm_db(phases):
  padded = jnp.pad(phases, ((0, 0), (0, 0), (HALO_R, HALO_R),
                            (HALO_C, HALO_C)))
  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((N, 12, HH, WH), jnp.float32),
      grid=(NT,),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=pl.BlockSpec((1, 12, TR, TW), out_map,
                             memory_space=pltpu.VMEM),
      scratch_shapes=[pltpu.VMEM((2,) + IB, jnp.float32),
                      pltpu.SemaphoreType.DMA((2,))],
  )(padded)


def main():
  rng = np.random.default_rng(0)
  phases = jax.device_put(rng.random((N, 4, HH, WH), np.float32))
  ref = demosaic_stencil(phases, w12, TR, TW)
  try:
    got = dm_db(phases)
    err = float(jnp.abs(got - ref).max())
    print(f"double-buffered vs simple: max err {err:.2e}")
    timeit("pallas double-buffered", chain(dm_db), phases)
  except Exception as e:
    print("FAIL:", str(e).splitlines()[0][:200])
  timeit("pallas simple DMA", chain(
      lambda p: demosaic_stencil(p, w12, TR, TW)), phases)


if __name__ == "__main__":
  main()
