"""Probe 4: packed12 raw -> f16 phase planes via ONE u8 transpose.

probe_interleave.py showed that a single explicit N-d transpose beats
strided lane slices / stack chains for lane-granularity repacking (the
phase->planar interleave went 16.4 -> 3.1 ms). This applies the same
trick to the decode direction: reshape the raw to expose the byte index
and row parity as dims, do ONE u8 transpose that makes byte index (and
optionally row parity) major, then everything else is elementwise bit
math + major-dim stacks.

Variants (all produce the pipeline's exact output: f16 phases
(N, 4, H/2, Wb/3) = load_raw_phases(..., "packed12", f16)):
  cur   current production formulation (strided lane slices)
  t5a   transpose (4,0,2,1,3): bytes major, rp kept as dim 2; final
        stack on axis 2 (major) + free reshape
  t5b   transpose (4,2,0,1,3): bytes AND rp major; final 4-way stack on
        axis 1 of major slices
  t3    transpose bytes only (no rp split in the transpose); rp split as
        sublane stride-2 afterwards
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

SCALE = np.float32(1.0 / 4095.0)


def _finish16(phases):
  return (phases.astype(jnp.float32) * SCALE).astype(jnp.float16)


def dec_cur(raws):
  b0 = raws[:, :, 0::3].astype(jnp.uint16)
  b1 = raws[:, :, 1::3].astype(jnp.uint16)
  b2 = raws[:, :, 2::3].astype(jnp.uint16)
  even = ((b1 & 0xF) << 8) | b0
  odd = (b2 << 4) | (b1 >> 4)
  return _finish16(jnp.stack([even[:, 0::2], odd[:, 0::2],
                              even[:, 1::2], odd[:, 1::2]], axis=1))


def dec_t5a(raws):
  n, h, wb = raws.shape
  x = raws.reshape(n, h // 2, 2, wb // 3, 3)
  t = jnp.transpose(x, (4, 0, 2, 1, 3))     # (3, n, 2, h/2, wb/3) u8
  b = t.astype(jnp.uint16)
  b0, b1, b2 = b[0], b[1], b[2]             # (n, 2, h/2, wb/3)
  even = ((b1 & 0xF) << 8) | b0
  odd = (b2 << 4) | (b1 >> 4)
  ph = jnp.stack([even, odd], axis=2)       # (n, 2rp, 2cp, h/2, wb/3)
  return _finish16(ph.reshape(n, 4, h // 2, wb // 3))


def dec_t5b(raws):
  n, h, wb = raws.shape
  x = raws.reshape(n, h // 2, 2, wb // 3, 3)
  t = jnp.transpose(x, (4, 2, 0, 1, 3))     # (3, 2, n, h/2, wb/3) u8
  b = t.astype(jnp.uint16)
  b0, b1, b2 = b[0], b[1], b[2]             # (2, n, h/2, wb/3)
  even = ((b1 & 0xF) << 8) | b0
  odd = (b2 << 4) | (b1 >> 4)
  return _finish16(jnp.stack([even[0], odd[0], even[1], odd[1]], axis=1))


def dec_t3(raws):
  n, h, wb = raws.shape
  x = raws.reshape(n, h, wb // 3, 3)
  t = jnp.transpose(x, (3, 0, 1, 2))        # (3, n, h, wb/3) u8
  b = t.astype(jnp.uint16)
  b0, b1, b2 = b[0], b[1], b[2]             # (n, h, wb/3)
  even = ((b1 & 0xF) << 8) | b0
  odd = (b2 << 4) | (b1 >> 4)
  return _finish16(jnp.stack([even[:, 0::2], odd[:, 0::2],
                              even[:, 1::2], odd[:, 1::2]], axis=1))


VARIANTS = {"cur": dec_cur, "t5a": dec_t5a, "t5b": dec_t5b, "t3": dec_t3}


def bench(fn, raws, k=10, reps=3):
  @jax.jit
  def steps(raws):
    acc = jnp.float32(0)
    for i in range(k):
      ph = fn(raws ^ jnp.uint8(i))
      acc = acc + jnp.sum(ph.astype(jnp.float32))
    return acc

  _ = np.asarray(steps(raws))
  best = None
  for _ in range(reps):
    t0 = time.perf_counter()
    _ = np.asarray(steps(raws))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / k * 1000.0


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--variants", default="cur,t5a,t5b,t3")
  ap.add_argument("--n", type=int, default=6)
  ap.add_argument("--height", type=int, default=2160)
  ap.add_argument("--width", type=int, default=3840)
  args = ap.parse_args()

  rng = np.random.default_rng(0)
  small = jnp.asarray(rng.integers(0, 256, size=(2, 16, 48), dtype=np.uint8))
  ref = np.asarray(jax.jit(dec_cur)(small))
  raws = jax.device_put(rng.integers(
      0, 256, size=(args.n, args.height, args.width * 3 // 2),
      dtype=np.uint8))

  for name in args.variants.split(","):
    fn = VARIANTS[name]
    got = np.asarray(jax.jit(fn)(small))
    ok = np.array_equal(got, ref)
    ms = bench(fn, raws)
    print(f"{name}: {ms:.2f} ms  exact={ok}", flush=True)


if __name__ == "__main__":
  main()
