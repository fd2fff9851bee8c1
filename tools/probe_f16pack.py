"""Probe: f16-in-i32 emulation inside a Mosaic kernel on real TPU.

Kernel reads channel-pair-packed f16 (i32), decodes to f32, multiplies
by 2 (f32 op), re-encodes to packed f16 bits. Compared bitwise vs XLA
doing the same in f16->f32->f16. Also times the unpack+pack overhead vs
a plain i32 passthrough at 6x4K scale.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taichi_image_tpu.ops.pallas import f16pack


def _kernel(x_ref, o_ref):
  w = x_ref[...]
  lo = f16pack.f16_bits_to_f32(w & 0xFFFF)
  hi = f16pack.f16_bits_to_f32((w >> 16) & 0xFFFF)
  lo2 = f16pack.f32_to_f16_bits(lo * 2.0)
  hi2 = f16pack.f32_to_f16_bits(hi * 2.0)
  o_ref[...] = lo2 | (hi2 << 16)


def _kernel_pass(x_ref, o_ref):
  o_ref[...] = x_ref[...] + 1


def timeit(fn, x, k=10, reps=3):
  @jax.jit
  def steps(x):
    acc = jnp.int32(0)
    for i in range(k):
      acc = acc + jnp.sum(fn(x ^ i), dtype=jnp.int32)
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
  x16 = (rng.random((2, 4, 256, 512)) * 2 - 0.5).astype(np.float16)
  w = f16pack.pack_channel_pairs(jnp.asarray(x16))

  call = pl.pallas_call(
      _kernel, out_shape=jax.ShapeDtypeStruct(w.shape, jnp.int32),
      grid=(w.shape[0],),
      in_specs=[pl.BlockSpec((1,) + w.shape[1:], lambda n: (n, 0, 0, 0),
                             memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec((1,) + w.shape[1:], lambda n: (n, 0, 0, 0),
                             memory_space=pltpu.VMEM))
  got = f16pack.unpack_channel_pairs(jax.jit(call)(w))
  want = (jnp.asarray(x16).astype(jnp.float32) * 2.0).astype(jnp.float16)
  eq = np.array_equal(np.asarray(got).view(np.uint16),
                      np.asarray(want).view(np.uint16))
  print(f"kernel roundtrip bitwise: {eq}", flush=True)
  if not eq:
    d = np.asarray(got).view(np.uint16).astype(int) - np.asarray(
        want).view(np.uint16).astype(int)
    print("  mismatches:", (d != 0).sum(), "of", d.size, flush=True)

  big = jnp.asarray(rng.integers(0, 2**31 - 1,
                                 size=(6, 6, 1080, 1920)).astype(np.int32))
  blk = (1, 6, 120, 640)
  idx = lambda n, i, j: (n, 0, i, j)
  big_call = pl.pallas_call(
      _kernel, out_shape=jax.ShapeDtypeStruct(big.shape, jnp.int32),
      grid=(6, 9, 3),
      in_specs=[pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM))
  pass_call = pl.pallas_call(
      _kernel_pass, out_shape=jax.ShapeDtypeStruct(big.shape, jnp.int32),
      grid=(6, 9, 3),
      in_specs=[pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM))
  print(f"passthrough (299MB r+w): {timeit(pass_call, big):.2f} ms",
        flush=True)
  print(f"decode+encode kernel:    {timeit(big_call, big):.2f} ms",
        flush=True)


if __name__ == "__main__":
  main()
