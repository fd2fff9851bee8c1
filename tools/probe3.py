"""Probe v3: Pallas demosaic with aligned halos; Pallas decode attempt;
Pallas reinhard."""

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
WB = W * 3 // 2
K = 8
TR = 120  # output rows per tile (HH=1080 = 9*120)

w12 = np.asarray(_demosaic_tables(BayerPattern.RGGB, "mhc"))


def timeit(name, jitted, *args):
  v = np.asarray(jitted(*args))
  reps = 3
  t0 = time.perf_counter()
  for _ in range(reps):
    v = np.asarray(jitted(*args))
  el = (time.perf_counter() - t0) / reps / K
  print(f"{name}: {el*1e3:.2f} ms/iter ({N/el:.0f} f/s) checksum={v:.6f}")
  return el


def chain(body):
  def run(x):
    acc = jnp.float32(0)
    for i in range(K):
      xi = x ^ jnp.uint8(i & 1) if x.dtype == jnp.uint8 else x + jnp.asarray(i, x.dtype)
      out = body(xi)
      acc = acc + jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)) * 1e-9
    return acc
  return jax.jit(run)


def decode_phases(raw):
  b0 = raw[:, :, 0::3].astype(jnp.uint16)
  b1 = raw[:, :, 1::3].astype(jnp.uint16)
  b2 = raw[:, :, 2::3].astype(jnp.uint16)
  even = ((b1 & 0xF) << 8) | b0
  odd = (b2 << 4) | (b1 >> 4)
  phases = jnp.stack([even[:, 0::2], odd[:, 0::2],
                      even[:, 1::2], odd[:, 1::2]], axis=1)
  return (phases.astype(jnp.float32) * jnp.float32(1 / 4095.0)).astype(jnp.float16)


def dm_kernel(p_ref, out_ref):
  pf = p_ref[0].astype(jnp.float32)  # (4, TR+16, WH+256)
  accs = []
  for oc in range(12):
    a = None
    for q in range(4):
      for u in range(3):
        for v in range(3):
          wgt = float(w12[oc, q, u, v])
          if wgt == 0.0:
            continue
          t = pf[q, 7 + u:7 + u + TR, 127 + v:127 + v + WH] * wgt
          a = t if a is None else a + t
    accs.append(a * (1.0 / 16.0))
  out_ref[0] = jnp.stack(accs, axis=0).astype(jnp.float16)


def dm_pallas(phases):
  padded = jnp.pad(phases, ((0, 0), (0, 0), (8, 8), (128, 128)))
  return pl.pallas_call(
      dm_kernel,
      out_shape=jax.ShapeDtypeStruct((N, 12, HH, WH), jnp.float16),
      grid=(N, HH // TR),
      in_specs=[pl.BlockSpec((1, 4, TR + 16, WH + 256),
                             lambda n, i: (n, 0, i, 0),
                             memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec((1, 12, TR, WH),
                             lambda n, i: (n, 0, i, 0),
                             memory_space=pltpu.VMEM),
  )(padded)


def main():
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, (N, H, WB), np.uint8))
  phases0 = decode_phases(raws)

  # correctness: pallas vs conv on full-size (interior rows)
  W12j = jnp.asarray(w12)
  ref = jax.lax.conv_general_dilated(
      phases0[:1].astype(jnp.float32), W12j, (1, 1), ((1, 1), (1, 1)),
      dimension_numbers=("NCHW", "OIHW", "NCHW"),
      precision=jax.lax.Precision.HIGHEST) / 16.0
  got = dm_pallas(phases0)[:1]
  err = float(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)
                      )[:, :, 1:-1, 1:-1].max())
  print(f"pallas vs conv (interior) max err: {err:.2e}")

  fdm = chain(dm_pallas)
  timeit("pallas demosaic", fdm, phases0)
  fe = chain(lambda r: dm_pallas(decode_phases(r)))
  timeit("decode + pallas demosaic", fe, raws)

  # ---- Pallas decode attempt: strided slices in-kernel
  TH = townhall = 216  # H=2160 = 10*216
  def dec_kernel(r_ref, out_ref):
    raw = r_ref[0]  # (TH, WB) u8
    b0 = raw[:, 0::3].astype(jnp.uint16)
    b1 = raw[:, 1::3].astype(jnp.uint16)
    b2 = raw[:, 2::3].astype(jnp.uint16)
    even = ((b1 & 0xF) << 8) | b0
    odd = (b2 << 4) | (b1 >> 4)
    sc = jnp.float32(1 / 4095.0)
    out_ref[0, 0] = (even[0::2].astype(jnp.float32) * sc).astype(jnp.float16)
    out_ref[0, 1] = (odd[0::2].astype(jnp.float32) * sc).astype(jnp.float16)
    out_ref[0, 2] = (even[1::2].astype(jnp.float32) * sc).astype(jnp.float16)
    out_ref[0, 3] = (odd[1::2].astype(jnp.float32) * sc).astype(jnp.float16)

  def dec_pallas(raw):
    return pl.pallas_call(
        dec_kernel,
        out_shape=jax.ShapeDtypeStruct((N, 4, HH, WH), jnp.float16),
        grid=(N, H // TH),
        in_specs=[pl.BlockSpec((1, TH, WB), lambda n, i: (n, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 4, TH // 2, WH),
                               lambda n, i: (n, 0, i, 0),
                               memory_space=pltpu.VMEM),
    )(raw)

  try:
    got = dec_pallas(raws)
    err = float(jnp.abs(got.astype(jnp.float32)
                        - phases0.astype(jnp.float32)).max())
    print(f"pallas decode max err: {err:.2e}")
    fd = chain(dec_pallas)
    timeit("pallas decode", fd, raws)
    fde = chain(lambda r: dm_pallas(dec_pallas(r)))
    timeit("pallas decode + pallas demosaic", fde, raws)
  except Exception as e:
    print("pallas decode failed:", str(e)[:400])


if __name__ == "__main__":
  main()
