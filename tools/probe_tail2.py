"""Probe: tail sub-stages (map+max / gamma / interleave) of the fused
step at 6x4K, f16 vs bf16 containers, XLA vs the bf16 manual-DMA Pallas
map kernel.

Input is the x12 phase-RGB tensor (what the demosaic emits); stages are
timed as cumulative prefixes ending in f32 sums.
"""

import sys
sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu.models.camera_isp import (reinhard_gamma_ca,
                                                reinhard_map_ca)
from taichi_image_tpu.ops.bayer import phases_to_planar
from taichi_image_tpu.ops.pallas.reinhard import reinhard_map_bf16_dma

N, HH, WH = 6, 1080, 1920
M = jnp.asarray([0.02, 0.98, -3.0, -0.1, -1.2, 0.4, 0.4, 0.4, 0.4],
                jnp.float32)


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


def xla_mapmax(x):
  p = reinhard_map_ca(x.reshape(N, 4, 3, HH, WH), M, 1.0, 1.0, 0.0)
  p_cast = p.astype(x.dtype)
  mx = jnp.max(p, axis=(1, 2, 3, 4), keepdims=True)
  return p_cast, mx


def t_xla_mapmax(x):
  p_cast, mx = xla_mapmax(x)
  return jnp.sum(p_cast.astype(jnp.float32)) + jnp.sum(mx)


def t_xla_gamma(x):
  p_cast, mx = xla_mapmax(x)
  out = reinhard_gamma_ca(p_cast, jnp.maximum(1e-6, mx), 1.0)
  return jnp.sum(out, dtype=jnp.float32)


def t_xla_tail(x):
  p_cast, mx = xla_mapmax(x)
  out = reinhard_gamma_ca(p_cast, jnp.maximum(1e-6, mx), 1.0)
  return jnp.sum(phases_to_planar(out.reshape(N, 12, HH, WH)),
                 dtype=jnp.float32)


def t_pl_mapmax(x):
  p, mx = reinhard_map_bf16_dma(x, M, 1.0, 1.0)
  return jnp.sum(p.astype(jnp.float32)) + jnp.sum(mx)


def t_pl_gamma(x):
  p, mx = reinhard_map_bf16_dma(x, M, 1.0, 1.0)
  out = reinhard_gamma_ca(p, jnp.maximum(1e-6, mx), 1.0)
  return jnp.sum(out, dtype=jnp.float32)


def t_pl_tail(x):
  p, mx = reinhard_map_bf16_dma(x, M, 1.0, 1.0)
  out = reinhard_gamma_ca(p, jnp.maximum(1e-6, mx), 1.0)
  return jnp.sum(phases_to_planar(out), dtype=jnp.float32)


def main():
  rng = np.random.default_rng(0)
  base = rng.random((N, 12, HH, WH)) * 0.9 + 0.05
  x_f16 = jnp.asarray(base, jnp.float16)
  x_bf16 = jnp.asarray(base, jnp.bfloat16)

  # value check: pallas vs xla on bf16 input
  small = jnp.asarray(base[:1, :, :216, :384], jnp.bfloat16)

  def xla_small(x):
    p = reinhard_map_ca(x.reshape(1, 4, 3, 216, 384), M, 1.0, 1.0, 0.0)
    return (p.astype(jnp.bfloat16),
            jnp.max(p, axis=(1, 2, 3, 4), keepdims=True))

  p_x, mx_x = jax.jit(xla_small)(small)
  p_p, mx_p = jax.jit(
      lambda x: reinhard_map_bf16_dma(x, M, 1.0, 1.0))(small)
  d = np.abs(np.asarray(p_x, np.float64).ravel()
             - np.asarray(p_p, np.float64).reshape(-1))
  dm = np.abs(np.asarray(mx_x, np.float64).ravel()
              - np.asarray(mx_p, np.float64).ravel())
  print(f"values: max|dp|={d.max():.3e} max|dmax|={dm.max():.3e}",
        flush=True)

  for name, fn, x in [
      ("xla map+max   f16 ", t_xla_mapmax, x_f16),
      ("xla map+max   bf16", t_xla_mapmax, x_bf16),
      ("pallas map+max bf16", t_pl_mapmax, x_bf16),
      ("xla +gamma    f16 ", t_xla_gamma, x_f16),
      ("xla +gamma    bf16", t_xla_gamma, x_bf16),
      ("pallas +gamma bf16", t_pl_gamma, x_bf16),
      ("xla FULL tail f16 ", t_xla_tail, x_f16),
      ("xla FULL tail bf16", t_xla_tail, x_bf16),
      ("pallas FULL tail bf16", t_pl_tail, x_bf16),
  ]:
    print(f"{name}: {timeit(fn, x):7.2f} ms", flush=True)


if __name__ == "__main__":
  main()
