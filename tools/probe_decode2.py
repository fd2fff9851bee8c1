"""Probe 2: bandwidth calibration + MXU one-hot-matmul byte de-striding.

P1 calibrates what pure elementwise passes cost (upper bound on any
decode). P2 decodes via bf16 one-hot matmuls on the MXU (byte values
<= 255 are exact in bf16): raw -> bf16 -> 3x (.., 384) @ (384, 128)
selection matmuls -> f32 byte planes -> fused bit arith -> phases.
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, raws, k=10, reps=3):
  @jax.jit
  def steps(raws):
    acc = jnp.float32(0)
    for i in range(k):
      out = fn(raws ^ jnp.uint8(i))
      acc = acc + jnp.sum(out, dtype=jnp.float32)
    return acc
  _ = np.asarray(steps(raws))
  best = None
  for _ in range(reps):
    t0 = time.perf_counter()
    _ = np.asarray(steps(raws))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / k * 1000.0


def p1_convert(raws):
  return raws.astype(jnp.float32) * jnp.float32(1.0 / 4095.0)


def p1_convert_bf16(raws):
  return raws.astype(jnp.bfloat16)


def _sel(group, stride, offset, n_out):
  s = np.zeros((group, n_out), np.float32)
  for j in range(n_out):
    s[offset + stride * j, j] = 1.0
  return s


def p2_matmul(raws):
  n, h, wb = raws.shape
  g = 384  # lcm(3, 128)
  x = raws.reshape(n, h, wb // g, g).astype(jnp.bfloat16)
  planes = []
  for off in range(3):
    s = jnp.asarray(_sel(g, 3, off, g // 3), jnp.bfloat16)
    b = jax.lax.dot_general(x, s, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    planes.append(b.reshape(n, h, wb // 3))
  b0, b1, b2 = planes
  even = (b1 % 16.0) * 256.0 + b0
  odd = b2 * 16.0 + jnp.floor(b1 / 16.0)
  return jnp.stack([even[:, 0::2], odd[:, 0::2],
                    even[:, 1::2], odd[:, 1::2]], axis=1)


def p2_matmul_onepass(raws):
  """Single (384, 384) selection matmul emitting [b0|b1|b2] lane groups,
  then slice the groups (lane-block slices, no stride)."""
  n, h, wb = raws.shape
  g = 384
  x = raws.reshape(n, h, wb // g, g).astype(jnp.bfloat16)
  cols = []
  for off in range(3):
    cols.append(_sel(g, 3, off, g // 3))
  s = jnp.asarray(np.concatenate(cols, axis=1), jnp.bfloat16)  # (384, 384)
  y = jax.lax.dot_general(x, s, (((3,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
  b0 = y[..., 0:128].reshape(n, h, wb // 3)
  b1 = y[..., 128:256].reshape(n, h, wb // 3)
  b2 = y[..., 256:384].reshape(n, h, wb // 3)
  even = (b1 % 16.0) * 256.0 + b0
  odd = b2 * 16.0 + jnp.floor(b1 / 16.0)
  return jnp.stack([even[:, 0::2], odd[:, 0::2],
                    even[:, 1::2], odd[:, 1::2]], axis=1)


def reference(raws):
  b0 = raws[:, :, 0::3].astype(jnp.uint16)
  b1 = raws[:, :, 1::3].astype(jnp.uint16)
  b2 = raws[:, :, 2::3].astype(jnp.uint16)
  even = ((b1 & 0xF) << 8) | b0
  odd = (b2 << 4) | (b1 >> 4)
  return jnp.stack([even[:, 0::2], odd[:, 0::2],
                    even[:, 1::2], odd[:, 1::2]], axis=1).astype(jnp.float32)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--n", type=int, default=6)
  ap.add_argument("--height", type=int, default=2160)
  ap.add_argument("--width", type=int, default=3840)
  args = ap.parse_args()
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(
      0, 256, size=(args.n, args.height, args.width * 3 // 2),
      dtype=np.uint8))
  nbytes = raws.size

  # correctness of the matmul route (small shape)
  small = jnp.asarray(rng.integers(0, 256, size=(2, 16, 768),
                                   dtype=np.uint8))
  ref = np.asarray(jax.jit(reference)(small))
  for name, fn in [("p2_matmul", p2_matmul),
                   ("p2_onepass", p2_matmul_onepass)]:
    got = np.asarray(jax.jit(fn)(small))
    ok = np.array_equal(got, ref)
    print(f"{name} exact: {ok}", flush=True)

  for name, fn, rd, wr in [
      ("convert u8->f32*c", p1_convert, nbytes, nbytes * 4),
      ("convert u8->bf16", p1_convert_bf16, nbytes, nbytes * 2),
      ("p2_matmul (3x)", p2_matmul, None, None),
      ("p2_onepass", p2_matmul_onepass, None, None),
  ]:
    ms = timeit(fn, raws)
    bw = ""
    if rd is not None:
      bw = f"  -> {(rd + wr) / ms * 1e3 / 1e9:.0f} GB/s"
    print(f"{name}: {ms:.2f} ms{bw}", flush=True)


if __name__ == "__main__":
  main()
