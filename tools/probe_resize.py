"""Probe: planar resize formulations at 6x4K -> 1080p (scale 0.5).

The fused step's resize branch costs +6.6 ms; attribute it (rows vs cols
gather) and test alternatives for the exact-decimation case (scale = 1/k
with truncation-anchored sampling => src = k*j, fraction 0).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu.ops.interpolate import _axis_samples

N, H, W = 6, 2160, 3840
OH, OW = 1080, 1920


def timeit(fn, x, k=10, reps=3):
  @jax.jit
  def steps(x):
    acc = jnp.float32(0)
    for i in range(k):
      acc = acc + jnp.sum(fn(x + jnp.asarray(i, x.dtype) * 1e-6),
                          dtype=jnp.float32)
    return acc
  _ = np.asarray(steps(x))
  best = None
  for _ in range(reps):
    t0 = time.perf_counter()
    _ = np.asarray(steps(x))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / k * 1000.0


def r_take_full(x):
  r_lo, r_hi, r_f = _axis_samples(OH, H, 0.5)
  c_lo, c_hi, c_f = _axis_samples(OW, W, 0.5)
  top = jnp.take(x, jnp.asarray(r_lo), axis=2)
  bot = jnp.take(x, jnp.asarray(r_hi), axis=2)
  rows = top + jnp.asarray(r_f)[None, None, :, None] * (bot - top)
  left = jnp.take(rows, jnp.asarray(c_lo), axis=3)
  right = jnp.take(rows, jnp.asarray(c_hi), axis=3)
  return left + jnp.asarray(c_f)[None, None, None, :] * (right - left)


def r_take_rows_only(x):
  r_lo, _, _ = _axis_samples(OH, H, 0.5)
  return jnp.take(x, jnp.asarray(r_lo), axis=2)


def r_take_cols_only(x):
  c_lo, _, _ = _axis_samples(OW, W, 0.5)
  return jnp.take(x, jnp.asarray(c_lo), axis=3)


def r_reshape_decimate(x):
  """scale=0.5 with truncation sampling picks src=2j exactly (fraction
  0); decimation via reshape-split + index."""
  n, c, h, w = x.shape
  y = x.reshape(n, c, h // 2, 2, w // 2, 2)
  return y[:, :, :, 0, :, 0]


def r_slice_decimate(x):
  return x[:, :, ::2, ::2]


def r_mean_pool(x):
  """NOT equivalent (area mean, not truncation sampling) — included only
  as the speed ceiling for a reduce-window formulation."""
  n, c, h, w = x.shape
  y = x.reshape(n, c, h // 2, 2, w // 2, 2)
  return y.mean(axis=(3, 5))


def main():
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.random((N, 3, H, W)), jnp.float32)

  # correctness: decimation variants == the take path at scale 0.5
  small = jnp.asarray(rng.random((1, 3, 16, 256)), jnp.float32)

  def take_small(x):
    r_lo, r_hi, r_f = _axis_samples(8, 16, 0.5)
    c_lo, c_hi, c_f = _axis_samples(128, 256, 0.5)
    top = jnp.take(x, jnp.asarray(r_lo), axis=2)
    bot = jnp.take(x, jnp.asarray(r_hi), axis=2)
    rows = top + jnp.asarray(r_f)[None, None, :, None] * (bot - top)
    left = jnp.take(rows, jnp.asarray(c_lo), axis=3)
    right = jnp.take(rows, jnp.asarray(c_hi), axis=3)
    return left + jnp.asarray(c_f)[None, None, None, :] * (right - left)

  want = np.asarray(jax.jit(take_small)(small))
  for name, fn in [("reshape_decimate", r_reshape_decimate),
                   ("slice_decimate", r_slice_decimate)]:
    got = np.asarray(jax.jit(fn)(small))
    print(f"{name} exact: {np.array_equal(got, want)}", flush=True)

  for name, fn in [("take full bilinear", r_take_full),
                   ("take rows only", r_take_rows_only),
                   ("take cols only", r_take_cols_only),
                   ("reshape decimate", r_reshape_decimate),
                   ("slice decimate", r_slice_decimate),
                   ("mean pool (ceiling)", r_mean_pool)]:
    print(f"{name:24} {timeit(fn, x):7.2f} ms", flush=True)


if __name__ == "__main__":
  main()
