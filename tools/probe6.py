"""Probe v6: auto-pipelined Pallas demosaic using three row-band input
refs (prev/cur/next) so Pallas's own double-buffering overlaps DMA with
compute; full-width tiles with in-padding for column halo."""

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
w12 = np.asarray(_demosaic_tables(BayerPattern.RGGB, "mhc"))
WPAD = WH + 256  # 128 col halo each side


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


def make_dm(tr):
  nb = HH // tr

  def kernel(prev_ref, cur_ref, next_ref, out_ref):
    x = jnp.concatenate([prev_ref[0, :, tr - 1:tr, :], cur_ref[0],
                         next_ref[0, :, 0:1, :]], axis=1)  # (4, tr+2, WPAD)
    for oc in range(12):
      a = None
      for q in range(4):
        for u in range(3):
          for v in range(3):
            wgt = float(w12[oc, q, u, v])
            if wgt == 0.0:
              continue
            t = x[q, u:u + tr, 127 + v:127 + v + WH] * wgt
            a = t if a is None else a + t
      out_ref[0, oc] = a * (1.0 / 16.0)

  def dm(phases):
    padded = jnp.pad(phases, ((0, 0), (0, 0), (tr, tr), (128, 128)))
    band = lambda off: pl.BlockSpec(
        (1, 4, tr, WPAD), lambda n, i, off=off: (n, 0, i + off, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 12, HH, WH), jnp.float32),
        grid=(N, nb),
        in_specs=[band(0), band(1), band(2)],
        out_specs=pl.BlockSpec((1, 12, tr, WH),
                               lambda n, i: (n, 0, i, 0),
                               memory_space=pltpu.VMEM),
    )(padded, padded, padded)

  return dm


def conv_x(phases):
  return jax.lax.conv_general_dilated(
      phases, jnp.asarray(w12), (1, 1), ((1, 1), (1, 1)),
      dimension_numbers=("NCHW", "OIHW", "NCHW"),
      precision=jax.lax.Precision.HIGHEST) / 16.0


def main():
  rng = np.random.default_rng(0)
  phases = jax.device_put(rng.random((N, 4, HH, WH), np.float32))
  ref = conv_x(phases)
  for tr in (24, 40, 72):
    if HH % tr:
      continue
    try:
      dm = make_dm(tr)
      got = dm(phases)
      err = float(jnp.abs(got - ref).max())
      print(f"tr={tr}: max err {err:.2e}")
      timeit(f"pallas 3band tr={tr}", chain(dm), phases)
    except Exception as e:
      print(f"tr={tr}: FAIL {str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
  main()
