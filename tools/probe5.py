"""Probe v5: f32 Pallas demosaic stencil with manual-DMA halo tiles."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taichi_image_tpu.ops.bayer import _demosaic_tables, BayerPattern

N, H, W = 6, 2160, 3840
HH, WH = H // 2, W // 2
K = 8
TR, TW = 120, 640
HALO_R, HALO_C = 4, 128
w12 = np.asarray(_demosaic_tables(BayerPattern.RGGB, "mhc"))


def timeit(name, jitted, *args):
  v = np.asarray(jitted(*args))
  reps = 3
  t0 = time.perf_counter()
  for _ in range(reps):
    v = np.asarray(jitted(*args))
  el = (time.perf_counter() - t0) / reps / K
  print(f"{name}: {el*1e3:.2f} ms/iter ({N/el:.0f} f/s) checksum={v:.6f}")


def chain(body):
  def run(x):
    acc = jnp.float32(0)
    for i in range(K):
      out = body(x + jnp.float32(i) * 1e-12)
      acc = acc + jnp.sum(out) * 1e-9
    return acc
  return jax.jit(run)


def dm_kernel(hbm_ref, out_ref):
  n = pl.program_id(0)
  i = pl.program_id(1)
  j = pl.program_id(2)

  def body(scratch, sem):
    dma = pltpu.make_async_copy(
        hbm_ref.at[n, :, pl.ds(i * TR, TR + 2 * HALO_R),
                   pl.ds(j * TW, TW + 2 * HALO_C)],
        scratch, sem)
    dma.start()
    dma.wait()
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
      out_ref[0, oc] = a * (1.0 / 16.0)

  pl.run_scoped(body,
                scratch=pltpu.VMEM((4, TR + 2 * HALO_R, TW + 2 * HALO_C),
                                   jnp.float32),
                sem=pltpu.SemaphoreType.DMA)


def dm_pallas(phases):
  padded = jnp.pad(phases,
                   ((0, 0), (0, 0), (HALO_R, HALO_R), (HALO_C, HALO_C)))
  return pl.pallas_call(
      dm_kernel,
      out_shape=jax.ShapeDtypeStruct((N, 12, HH, WH), jnp.float32),
      grid=(N, HH // TR, WH // TW),
      in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
      out_specs=pl.BlockSpec((1, 12, TR, TW),
                             lambda n, i, j: (n, 0, i, j),
                             memory_space=pltpu.VMEM),
  )(padded)


def conv_x(phases):
  return jax.lax.conv_general_dilated(
      phases, jnp.asarray(w12), (1, 1), ((1, 1), (1, 1)),
      dimension_numbers=("NCHW", "OIHW", "NCHW"),
      precision=jax.lax.Precision.HIGHEST) / 16.0


def main():
  rng = np.random.default_rng(0)
  phases = jax.device_put(rng.random((N, 4, HH, WH), np.float32))
  got = dm_pallas(phases)
  ref = conv_x(phases)
  err = float(jnp.abs(got - ref).max())
  print(f"pallas vs conv max err: {err:.2e}")
  timeit("pallas demosaic f32", chain(dm_pallas), phases)
  timeit("xla conv demosaic f32", chain(conv_x), phases)


if __name__ == "__main__":
  main()
