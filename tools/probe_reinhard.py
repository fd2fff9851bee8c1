"""Probe: Pallas Reinhard-map kernel vs the XLA map+max at 6x4K.

Compares (a) values (tolerance — in-kernel pow may differ by ulps),
(b) time for map+max, (c) time for the full tail (map+max+gamma+u8+
interleave), with x12 in an f16 container (XLA) vs an f32 container
(Pallas path).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu import types
from taichi_image_tpu.models.camera_isp import (reinhard_gamma_ca,
                                                reinhard_map_ca)
from taichi_image_tpu.ops.bayer import phases_to_planar
from taichi_image_tpu.ops.pallas.reinhard import reinhard_map_pallas

N, HH, WH = 6, 1080, 1920


def timeit(fn, x, k=10, reps=3):
  @jax.jit
  def steps(x):
    acc = jnp.float32(0)
    for i in range(k):
      acc = acc + fn(x + jnp.asarray(i, x.dtype) * 1e-7)
    return acc
  _ = np.asarray(steps(x))
  best = None
  for _ in range(reps):
    t0 = time.perf_counter()
    _ = np.asarray(steps(x))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / k * 1000.0


def main():
  rng = np.random.default_rng(0)
  x_f16 = jnp.asarray(rng.random((N, 12, HH, WH)) * 0.9 + 0.05,
                      jnp.float16)
  x_f32 = x_f16.astype(jnp.float32)
  m = jnp.asarray([0.02, 0.98, -3.0, -0.1, -1.2, 0.4, 0.4, 0.4, 0.4],
                  jnp.float32)

  # values: pallas vs xla
  def xla_map(x):
    p = reinhard_map_ca(x.reshape(N, 4, 3, HH, WH), m, 1.0, 1.0, 0.0)
    mx = jnp.max(p, axis=(1, 2, 3, 4), keepdims=True)
    return p, mx

  p_x, mx_x = jax.jit(xla_map)(x_f16)
  p_p, mx_p = jax.jit(
      lambda x: reinhard_map_pallas(x, m, 1.0, 1.0))(x_f32)
  p_p = p_p.reshape(N, 4, 3, HH, WH)
  d = np.abs(np.asarray(p_x, np.float64) - np.asarray(p_p, np.float64))
  dm = np.abs(np.asarray(mx_x, np.float64).ravel()
              - np.asarray(mx_p, np.float64).ravel())
  print(f"values: max|dp|={d.max():.3e} max|dmax|={dm.max():.3e}",
        flush=True)

  def t_xla_mapmax(x):
    p, mx = xla_map(x)
    return jnp.sum(p.astype(jnp.float16).astype(jnp.float32)) + jnp.sum(mx)

  def t_pallas_mapmax(x):
    p, mx = reinhard_map_pallas(x, m, 1.0, 1.0)
    return jnp.sum(p) + jnp.sum(mx)

  def t_xla_tail(x):
    p, mx = xla_map(x)
    p_cast = p.astype(jnp.float16)
    out = reinhard_gamma_ca(p_cast, jnp.maximum(1e-6, mx), 1.0)
    return jnp.sum(phases_to_planar(out.reshape(N, 12, HH, WH)),
                   dtype=jnp.float32)

  def t_pallas_tail(x):
    p, mx = reinhard_map_pallas(x, m, 1.0, 1.0)
    p_cast = p.reshape(N, 4, 3, HH, WH).astype(jnp.float16)
    out = reinhard_gamma_ca(p_cast, jnp.maximum(1e-6, mx), 1.0)
    return jnp.sum(phases_to_planar(out.reshape(N, 12, HH, WH)),
                   dtype=jnp.float32)

  print(f"xla map+max (f16 in):    {timeit(t_xla_mapmax, x_f16):7.2f} ms",
        flush=True)
  print(f"pallas map+max (f32 in): {timeit(t_pallas_mapmax, x_f32):7.2f} ms",
        flush=True)
  print(f"xla FULL tail:           {timeit(t_xla_tail, x_f16):7.2f} ms",
        flush=True)
  print(f"pallas FULL tail:        {timeit(t_pallas_tail, x_f32):7.2f} ms",
        flush=True)





def extra_packed():
  """Timing for the channel-pair-packed variant (run after main)."""
  from taichi_image_tpu.ops.pallas import f16pack
  from taichi_image_tpu.ops.pallas.reinhard import reinhard_map_packed
  rng = np.random.default_rng(0)
  x_f16 = jnp.asarray(rng.random((N, 12, HH, WH)) * 0.9 + 0.05,
                      jnp.float16)
  m = jnp.asarray([0.02, 0.98, -3.0, -0.1, -1.2, 0.4, 0.4, 0.4, 0.4],
                  jnp.float32)
  w = f16pack.pack_channel_pairs(x_f16)

  def t_packed_mapmax(wi):
    p, mx = reinhard_map_packed(wi, m, 1.0, 1.0)
    return (jnp.sum(p, dtype=jnp.int32).astype(jnp.float32)
            + jnp.sum(mx))

  def t_packed_tail(wi):
    p, mx = reinhard_map_packed(wi, m, 1.0, 1.0)
    p_cast = f16pack.unpack_channel_pairs(p).reshape(N, 4, 3, HH, WH)
    out = reinhard_gamma_ca(p_cast, jnp.maximum(1e-6, mx), 1.0)
    return jnp.sum(phases_to_planar(out.reshape(N, 12, HH, WH)),
                   dtype=jnp.float32)

  def t_pack_cost(x):
    return jnp.sum(f16pack.pack_channel_pairs(x), dtype=jnp.int32
                   ).astype(jnp.float32)

  def timeit_i(fn, x, k=10, reps=3):
    @jax.jit
    def steps(x):
      acc = jnp.float32(0)
      for i in range(k):
        acc = acc + fn(x ^ i)
      return acc
    _ = np.asarray(steps(x))
    best = None
    for _ in range(reps):
      t0 = time.perf_counter()
      _ = np.asarray(steps(x))
      el = time.perf_counter() - t0
      best = el if best is None else min(best, el)
    return best / k * 1000.0

  print(f"pack cost (from f16):     {timeit(t_pack_cost, x_f16):7.2f} ms",
        flush=True)
  print(f"packed kernel map+max:    {timeit_i(t_packed_mapmax, w):7.2f} ms",
        flush=True)
  print(f"packed FULL tail:         {timeit_i(t_packed_tail, w):7.2f} ms",
        flush=True)





def extra_packed_dma():
  from taichi_image_tpu.ops.pallas import f16pack
  from taichi_image_tpu.ops.pallas.reinhard import reinhard_map_packed_dma
  rng = np.random.default_rng(0)
  x_f16 = jnp.asarray(rng.random((N, 12, HH, WH)) * 0.9 + 0.05,
                      jnp.float16)
  m = jnp.asarray([0.02, 0.98, -3.0, -0.1, -1.2, 0.4, 0.4, 0.4, 0.4],
                  jnp.float32)
  w = f16pack.pack_channel_pairs(x_f16)

  # correctness vs the XLA path (tolerance: in-kernel pow reassociation)
  p_ref = reinhard_map_ca(x_f16.reshape(N, 4, 3, HH, WH), m, 1.0, 1.0,
                          0.0)
  pc_ref = np.asarray(p_ref.astype(jnp.float16))
  mx_ref = np.asarray(jnp.max(p_ref, axis=(1, 2, 3, 4), keepdims=True))
  pp, mx = jax.jit(lambda wi: reinhard_map_packed_dma(wi, m, 1.0, 1.0))(w)
  pc = np.asarray(f16pack.unpack_channel_pairs(pp)).reshape(
      N, 4, 3, HH, WH)
  d = np.abs(pc.astype(np.float64) - pc_ref.astype(np.float64))
  dm = np.abs(np.asarray(mx).ravel() - mx_ref.ravel()).max()
  print(f"packed-dma values: max|dp|={np.nanmax(d):.3e} "
        f"mismatch-frac={(pc.view(np.uint16) != pc_ref.view(np.uint16)).mean():.2e} "
        f"max|dmax|={dm:.3e}", flush=True)

  def t_mapmax(wi):
    p, mxo = reinhard_map_packed_dma(wi, m, 1.0, 1.0)
    return (jnp.sum(p, dtype=jnp.int32).astype(jnp.float32)
            + jnp.sum(mxo))

  def timeit_i(fn, x, k=10, reps=3):
    @jax.jit
    def steps(x):
      acc = jnp.float32(0)
      for i in range(k):
        acc = acc + fn(x ^ i)
      return acc
    _ = np.asarray(steps(x))
    best = None
    for _ in range(reps):
      t0 = time.perf_counter()
      _ = np.asarray(steps(x))
      el = time.perf_counter() - t0
      best = el if best is None else min(best, el)
    return best / k * 1000.0

  print(f"packed-DMA kernel map+max: {timeit_i(t_mapmax, w):7.2f} ms",
        flush=True)


if __name__ == "__main__":
  import sys
  if "--packed-dma" in sys.argv:
    extra_packed_dma()
  elif "--packed" in sys.argv:
    extra_packed()
  else:
    main()
