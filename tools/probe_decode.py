"""Probe: packed12 raw -> f32 CFA phase planes, formulation shoot-out.

Round-1 finding: the decode+pad stage costs ~4.6 ms of the 9.6 ms 6x4K
step (strided byte-plane relayouts). This probes alternative XLA
formulations of raw (N, H, Wb) u8 -> phases (N, 4, H/2, Wb/3) f32.

Methodology: K chained iterations inside one jit (inputs xor'd with the
iteration index so no two iterations CSE), ending in a fetched scalar.
All variants checked for exact equality against variant A on a small
shape first.
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def _finish(even, odd):
  """even/odd column planes (N, H, W/2) -> (N, 4, H/2, W/2) by row parity."""
  return jnp.stack([even[:, 0::2], odd[:, 0::2],
                    even[:, 1::2], odd[:, 1::2]], axis=1)


def variant_a(raws):
  """Round-1 formulation: u8 strided lane slices -> u16 bit math."""
  b0 = raws[:, :, 0::3].astype(jnp.uint16)
  b1 = raws[:, :, 1::3].astype(jnp.uint16)
  b2 = raws[:, :, 2::3].astype(jnp.uint16)
  even = ((b1 & 0xF) << 8) | b0
  odd = (b2 << 4) | (b1 >> 4)
  return _finish(even, odd).astype(jnp.float32)


def variant_b(raws):
  """u16 bitcast -> f32 convert -> stride-3 f32 lane slices -> f32 arith."""
  n, h, wb = raws.shape
  w16 = jax.lax.bitcast_convert_type(raws.reshape(n, h, wb // 2, 2),
                                     jnp.uint16)
  f = w16.astype(jnp.float32)  # (n, h, wb//2): word j = b[2j] + 256*b[2j+1]
  # period: 3 words = 6 bytes = 4 pixels; wb//2 words per row
  w0 = f[:, :, 0::3]
  w1 = f[:, :, 1::3]
  w2 = f[:, :, 2::3]
  b0 = w0 % 256.0
  b1 = jnp.floor(w0 / 256.0)
  b2 = w1 % 256.0
  b3 = jnp.floor(w1 / 256.0)
  b4 = w2 % 256.0
  b5 = jnp.floor(w2 / 256.0)
  e0 = (b1 % 16.0) * 256.0 + b0      # pixel 4j   (even col)
  o0 = b2 * 16.0 + jnp.floor(b1 / 16.0)  # pixel 4j+1 (odd col)
  e1 = (b4 % 16.0) * 256.0 + b3      # pixel 4j+2
  o1 = b5 * 16.0 + jnp.floor(b4 / 16.0)  # pixel 4j+3
  even = jnp.stack([e0, e1], axis=-1).reshape(n, h, -1)
  odd = jnp.stack([o0, o1], axis=-1).reshape(n, h, -1)
  return _finish(even, odd)


def variant_c(raws):
  """One-hot conv: u8 -> f32, (2,3)-window stride-(2,3) conv to 6 planes
  (row parity x byte), then fused elementwise bit math."""
  n, h, wb = raws.shape
  x = raws.astype(jnp.float32)[:, None]  # (n, 1, h, wb)
  k = np.zeros((6, 1, 2, 3), np.float32)
  for rp in range(2):
    for byte in range(3):
      k[rp * 3 + byte, 0, rp, byte] = 1.0
  y = jax.lax.conv_general_dilated(
      x, jnp.asarray(k), (2, 3), "VALID",
      dimension_numbers=("NCHW", "OIHW", "NCHW"))  # (n, 6, h/2, wb/3)
  def decode(b0, b1, b2):
    even = (b1 % 16.0) * 256.0 + b0
    odd = b2 * 16.0 + jnp.floor(b1 / 16.0)
    return even, odd
  e_r0, o_r0 = decode(y[:, 0], y[:, 1], y[:, 2])
  e_r1, o_r1 = decode(y[:, 3], y[:, 4], y[:, 5])
  return jnp.stack([e_r0, o_r0, e_r1, o_r1], axis=1)


def variant_d(raws):
  """Minor-dim reshape: (n, h, w/3, 3) u8 -> channel slices."""
  n, h, wb = raws.shape
  x = raws.reshape(n, h, wb // 3, 3).astype(jnp.uint16)
  b0, b1, b2 = x[..., 0], x[..., 1], x[..., 2]
  even = ((b1 & 0xF) << 8) | b0
  odd = (b2 << 4) | (b1 >> 4)
  return _finish(even, odd).astype(jnp.float32)


def variant_e(raws):
  """u16-bitcast words -> one-hot conv stride-(2,3) -> word arith -> pair
  interleave via minor reshape."""
  n, h, wb = raws.shape
  w16 = jax.lax.bitcast_convert_type(raws.reshape(n, h, wb // 2, 2),
                                     jnp.uint16)
  x = w16.astype(jnp.float32)[:, None]  # (n, 1, h, wb/2)
  k = np.zeros((6, 1, 2, 3), np.float32)
  for rp in range(2):
    for word in range(3):
      k[rp * 3 + word, 0, rp, word] = 1.0
  y = jax.lax.conv_general_dilated(
      x, jnp.asarray(k), (2, 3), "VALID",
      dimension_numbers=("NCHW", "OIHW", "NCHW"))  # (n, 6, h/2, wb/6)

  def decode(w0, w1, w2):
    b0 = w0 % 256.0
    b1 = jnp.floor(w0 / 256.0)
    b2 = w1 % 256.0
    b3 = jnp.floor(w1 / 256.0)
    b4 = w2 % 256.0
    b5 = jnp.floor(w2 / 256.0)
    e0 = (b1 % 16.0) * 256.0 + b0
    o0 = b2 * 16.0 + jnp.floor(b1 / 16.0)
    e1 = (b4 % 16.0) * 256.0 + b3
    o1 = b5 * 16.0 + jnp.floor(b4 / 16.0)
    even = jnp.stack([e0, e1], axis=-1).reshape(e0.shape[0], e0.shape[1], -1)
    odd = jnp.stack([o0, o1], axis=-1).reshape(o0.shape[0], o0.shape[1], -1)
    return even, odd

  e_r0, o_r0 = decode(y[:, 0], y[:, 1], y[:, 2])
  e_r1, o_r1 = decode(y[:, 3], y[:, 4], y[:, 5])
  return jnp.stack([e_r0, o_r0, e_r1, o_r1], axis=1)


def variant_f(raws):
  """Like A but row-split FIRST (cheap sublane stride), then lane stride-3
  on the half-height rows."""
  r0 = raws[:, 0::2]
  r1 = raws[:, 1::2]
  def cols(r):
    b0 = r[:, :, 0::3].astype(jnp.uint16)
    b1 = r[:, :, 1::3].astype(jnp.uint16)
    b2 = r[:, :, 2::3].astype(jnp.uint16)
    even = ((b1 & 0xF) << 8) | b0
    odd = (b2 << 4) | (b1 >> 4)
    return even, odd
  e0, o0 = cols(r0)
  e1, o1 = cols(r1)
  return jnp.stack([e0, o0, e1, o1], axis=1).astype(jnp.float32)


VARIANTS = {"a": variant_a, "b": variant_b, "c": variant_c,
            "d": variant_d, "e": variant_e, "f": variant_f}


def check(fn, name):
  rng = np.random.default_rng(0)
  small = jnp.asarray(rng.integers(0, 256, size=(2, 16, 48), dtype=np.uint8))
  ref = np.asarray(jax.jit(variant_a)(small))
  got = np.asarray(jax.jit(fn)(small))
  assert got.shape == ref.shape, (name, got.shape, ref.shape)
  assert np.array_equal(got, ref), f"variant {name} mismatch"


def bench(fn, raws, k=10, reps=3):
  @jax.jit
  def steps(raws):
    acc = jnp.float32(0)
    for i in range(k):
      ph = fn(raws ^ jnp.uint8(i))
      acc = acc + jnp.sum(ph, dtype=jnp.float32)
    return acc

  _ = np.asarray(steps(raws))  # compile+warm
  best = None
  for _ in range(reps):
    t0 = time.perf_counter()
    _ = np.asarray(steps(raws))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / k * 1000.0  # ms per decode


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--variants", default="a,b,c,d,e,f")
  ap.add_argument("--n", type=int, default=6)
  ap.add_argument("--height", type=int, default=2160)
  ap.add_argument("--width", type=int, default=3840)
  args = ap.parse_args()

  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(
      0, 256, size=(args.n, args.height, args.width * 3 // 2),
      dtype=np.uint8))

  for name in args.variants.split(","):
    fn = VARIANTS[name]
    try:
      check(fn, name)
      ms = bench(fn, raws)
      print(f"variant {name}: {ms:.2f} ms  ({name})", flush=True)
    except Exception as e:  # noqa
      print(f"variant {name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
  main()
