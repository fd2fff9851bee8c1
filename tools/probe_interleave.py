"""Probe: phase-form (N, 12, hh, wh) u8 -> planar (N, 3, H, W) u8
interleave formulations. The round-1 one-hot transposed conv costs
~16 ms at 6x4K — the single most expensive stage of the whole step.

Phase order p: (row, col) parity (0,0), (1,0), (0,1), (1,1)
(ops/bayer._PHASE_PARITY); channel layout p*3 + c.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu.ops.bayer import phases_to_planar

N, HH, WH = 6, 1080, 1920
K, REPS = 10, 3


def timeit(fn, x, k=K, reps=REPS):
  @jax.jit
  def steps(x):
    acc = jnp.float32(0)
    for i in range(k):
      acc = acc + jnp.sum(fn(x ^ jnp.uint8(i)), dtype=jnp.float32)
    return acc
  _ = np.asarray(steps(x))
  best = None
  for _ in range(reps):
    t0 = time.perf_counter()
    _ = np.asarray(steps(x))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / k * 1000.0


def v_conv(x12):
  return phases_to_planar(x12, jnp.float32).astype(jnp.uint8)


def _col_interleave_u16(e, o):
  """u8 planes (..., wh) even/odd columns -> (..., 2wh) via u16 pack +
  byte bitcast (little-endian: low byte first)."""
  w16 = e.astype(jnp.uint16) | (o.astype(jnp.uint16) << 8)
  b = jax.lax.bitcast_convert_type(w16, jnp.uint8)  # (..., wh, 2)
  return b.reshape(*b.shape[:-2], b.shape[-2] * 2)


def v_bitcast(x12):
  n, _, hh, wh = x12.shape[0], 12, x12.shape[2], x12.shape[3]
  x = x12.reshape(n, 4, 3, hh, wh)
  # phase index p: (0,0)=0, (1,0)=1, (0,1)=2, (1,1)=3 in (row, col) parity
  even_rows = _col_interleave_u16(x[:, 0], x[:, 2])  # (n, 3, hh, W)
  odd_rows = _col_interleave_u16(x[:, 1], x[:, 3])
  stacked = jnp.stack([even_rows, odd_rows], axis=3)  # (n, 3, hh, 2, W)
  return stacked.reshape(n, 3, 2 * hh, 2 * wh)


def v_stack_only(x12):
  """Pure stack+reshape interleave (no u16 trick): cols then rows."""
  n, _, hh, wh = x12.shape[0], 12, x12.shape[2], x12.shape[3]
  x = x12.reshape(n, 4, 3, hh, wh)
  er = jnp.stack([x[:, 0], x[:, 2]], axis=-1).reshape(n, 3, hh, 2 * wh)
  orr = jnp.stack([x[:, 1], x[:, 3]], axis=-1).reshape(n, 3, hh, 2 * wh)
  stacked = jnp.stack([er, orr], axis=3)
  return stacked.reshape(n, 3, 2 * hh, 2 * wh)


def v_two_convs(x12):
  n = x12.shape[0]
  # rows first: (n,12,hh,wh) -> (n,6,H,wh); channels (c, col-parity)
  k1 = np.zeros((6, 12, 2, 1), np.float32)
  for c in range(3):
    for pc in range(2):
      for pr in range(2):
        p = pc * 2 + pr
        k1[c * 2 + pc, p * 3 + c, 1 - pr, 0] = 1.0
  y = jax.lax.conv_general_dilated(
      x12.astype(jnp.float32), jnp.asarray(k1), (1, 1), ((1, 0), (0, 0)),
      lhs_dilation=(2, 1), dimension_numbers=("NCHW", "OIHW", "NCHW"))
  k2 = np.zeros((3, 6, 1, 2), np.float32)
  for c in range(3):
    for pc in range(2):
      k2[c, c * 2 + pc, 0, 1 - pc] = 1.0
  z = jax.lax.conv_general_dilated(
      y, jnp.asarray(k2), (1, 1), ((0, 0), (1, 0)),
      lhs_dilation=(1, 2), dimension_numbers=("NCHW", "OIHW", "NCHW"))
  return z.astype(jnp.uint8)


def main():
  rng = np.random.default_rng(0)
  x12 = jnp.asarray(rng.integers(0, 256, size=(N, 12, HH, WH),
                                 dtype=np.uint8))
  small = jnp.asarray(rng.integers(0, 256, size=(1, 12, 8, 16),
                                   dtype=np.uint8))

  ref = None
  for name, fn in [("conv (round-1)", v_conv),
                   ("u16-bitcast cols + stack rows", v_bitcast),
                   ("stack+reshape only", v_stack_only),
                   ("two one-hot convs", v_two_convs)]:
    got = np.asarray(jax.jit(fn)(small))
    if ref is None:
      ref = got
      ok = True
    else:
      ok = np.array_equal(got, ref)
    if not ok:
      print(f"{name:32} WRONG VALUES", flush=True)
      continue
    ms = timeit(fn, x12)
    print(f"{name:32} {ms:7.2f} ms", flush=True)


if __name__ == "__main__" and "--extra" not in __import__("sys").argv:
  main()


def v_transpose6(x12):
  """Single 6-d transpose: channel dim (pc,pr,c) major-reordered, then
  pr/pc transposed into interleaving positions; the final reshape is the
  free C-order merge."""
  n, _, hh, wh = x12.shape
  x = x12.reshape(n, 2, 2, 3, hh, wh)  # (n, pc, pr, c, hh, wh)
  t = x.transpose(0, 3, 4, 2, 5, 1)    # (n, c, hh, pr, wh, pc)
  return t.reshape(n, 3, 2 * hh, 2 * wh)


def v_cols_only(x12):
  n, _, hh, wh = x12.shape
  x = x12.reshape(n, 4, 3, hh, wh)
  er = jnp.stack([x[:, 0], x[:, 2]], axis=-1).reshape(n, 3, hh, 2 * wh)
  orr = jnp.stack([x[:, 1], x[:, 3]], axis=-1).reshape(n, 3, hh, 2 * wh)
  return er + orr  # consume both, no row interleave


def v_rows_only(x12):
  n, _, hh, wh = x12.shape
  x = x12.reshape(n, 4, 3, hh, wh)
  s = jnp.stack([x[:, 0], x[:, 1]], axis=3)  # (n, 3, hh, 2, wh)
  return s.reshape(n, 3, 2 * hh, wh)


def extra():
  rng = np.random.default_rng(0)
  x12 = jnp.asarray(rng.integers(0, 256, size=(N, 12, HH, WH),
                                 dtype=np.uint8))
  small = jnp.asarray(rng.integers(0, 256, size=(1, 12, 8, 16),
                                   dtype=np.uint8))
  ref = np.asarray(jax.jit(v_conv)(small))
  got = np.asarray(jax.jit(v_transpose6)(small))
  print("transpose6 exact:", np.array_equal(got, ref), flush=True)
  for name, fn in [("transpose6", v_transpose6),
                   ("cols only (attribution)", v_cols_only),
                   ("rows only (attribution)", v_rows_only)]:
    print(f"{name:28} {timeit(fn, x12):7.2f} ms", flush=True)


if __name__ == "__main__" and "--extra" in __import__("sys").argv:
  extra()
