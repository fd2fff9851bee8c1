"""Dissect the reinhard tail of the fused step at 6x4K (chained-jit)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu import types
from taichi_image_tpu.models.camera_isp import (reinhard_apply_ca,
                                                reinhard_map_ca)
from taichi_image_tpu.ops.bayer import phases_to_planar

N, HH, WH = 6, 1080, 1920
K, REPS = 10, 3


def timeit(fn, x, k=K, reps=REPS):
  @jax.jit
  def steps(x):
    acc = jnp.float32(0)
    for i in range(k):
      acc = acc + fn(x + jnp.asarray(i, x.dtype))
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
  x12 = jnp.asarray(rng.random((N, 12, HH, WH), np.float32) * 0.9 + 0.05,
                    jnp.float16)
  m = jnp.asarray([0.02, 0.98, -3.0, -0.1, -1.2, 0.4, 0.4, 0.4, 0.4],
                  jnp.float32)
  u8 = (rng.integers(0, 255, size=(N, 12, HH, WH), dtype=np.uint8))
  u8 = jnp.asarray(u8)

  def t_scaled_gray(x):
    xf = x.reshape(N, 4, 3, HH, WH).astype(jnp.float32)
    scaled = (xf - m[0]) / (m[1] - m[0])
    gray = (0.299 * scaled[:, :, 0] + 0.587 * scaled[:, :, 1]
            + 0.114 * scaled[:, :, 2])
    return jnp.sum(scaled) + jnp.sum(gray)

  def t_pow_per_pixel(x):
    xf = x.reshape(N, 4, 3, HH, WH).astype(jnp.float32)
    gray = (0.299 * xf[:, :, 0] + 0.587 * xf[:, :, 1]
            + 0.114 * xf[:, :, 2])
    return jnp.sum(jnp.power(gray, jnp.float32(1.37)))

  def t_map(x):
    p = reinhard_map_ca(x.reshape(N, 4, 3, HH, WH), m, 1.0, 1.0, 0.0)
    return jnp.sum(p)

  def t_map_max(x):
    p = reinhard_map_ca(x.reshape(N, 4, 3, HH, WH), m, 1.0, 1.0, 0.0)
    p_cast = p.astype(jnp.float16)
    mx = jnp.max(p, axis=(1, 2, 3, 4), keepdims=True)
    return jnp.sum(p_cast.astype(jnp.float32)) + jnp.sum(mx)

  def t_reinhard_full(x):
    out = reinhard_apply_ca(x.reshape(N, 4, 3, HH, WH), m, 1.0, 1.0, 1.0,
                            0.0, types.f16)
    return jnp.sum(out, dtype=jnp.float32)

  def t_reinhard_interleave(x):
    out = reinhard_apply_ca(x.reshape(N, 4, 3, HH, WH), m, 1.0, 1.0, 1.0,
                            0.0, types.f16).reshape(N, 12, HH, WH)
    planar = phases_to_planar(out, jnp.float32).astype(jnp.uint8)
    return jnp.sum(planar, dtype=jnp.float32)

  def t_interleave_u8(x):
    planar = phases_to_planar(x, jnp.float32).astype(jnp.uint8)
    return jnp.sum(planar, dtype=jnp.float32)

  rows = [
      ("scaled+gray (read f16, f32 math)", t_scaled_gray, x12),
      ("49.8M pow alone", t_pow_per_pixel, x12),
      ("reinhard map (no max)", t_map, x12),
      ("map + f16 cast + max", t_map_max, x12),
      ("reinhard full (u8 out12)", t_reinhard_full, x12),
      ("reinhard + interleave planar", t_reinhard_interleave, x12),
      ("interleave alone (u8 in)", t_interleave_u8, u8),
  ]
  prev = 0.0
  for name, fn, x in rows:
    try:
      ms = timeit(fn, x)
      print(f"{name:36} {ms:7.2f} ms", flush=True)
    except Exception as e:
      print(f"{name:36} FAILED {type(e).__name__}: {str(e)[:80]}",
            flush=True)


if __name__ == "__main__":
  main()
