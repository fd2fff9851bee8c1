"""Probe v4: f32 Pallas demosaic stencil (the only dtype this Mosaic
toolchain accepts) vs the XLA conv formulation."""

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
TR = 120
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
      # tiny per-iteration perturbation defeats CSE without changing cost
      out = body(x + jnp.float32(i) * 1e-12)
      acc = acc + jnp.sum(out) * 1e-9
    return acc
  return jax.jit(run)


def dm_kernel(p_ref, out_ref):
  pf = p_ref[0]  # (4, TR+16, 2176) f32
  for oc in range(12):
    a = None
    for q in range(4):
      for u in range(3):
        for v in range(3):
          wgt = float(w12[oc, q, u, v])
          if wgt == 0.0:
            continue
          t = p_ref[0, q, 7 + u:7 + u + TR, 127 + v:127 + v + WH] * wgt
          a = t if a is None else a + t
    out_ref[0, oc] = a * (1.0 / 16.0)


def dm_pallas(phases):
  padded = jnp.pad(phases, ((0, 0), (0, 0), (8, 8), (128, 128)))
  return pl.pallas_call(
      dm_kernel,
      out_shape=jax.ShapeDtypeStruct((N, 12, HH, WH), jnp.float32),
      grid=(N, HH // TR),
      in_specs=[pl.BlockSpec((1, 4, TR + 16, WH + 256),
                             lambda n, i: (n, 0, i, 0),
                             memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec((1, 12, TR, WH),
                             lambda n, i: (n, 0, i, 0),
                             memory_space=pltpu.VMEM),
  )(phases if False else padded)


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
