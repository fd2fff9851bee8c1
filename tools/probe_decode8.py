"""Probe: WHAT makes the 4K decode slow? (round 5, cont.)

Facts so far (same-day sessions): the 4K decode runs ~50 GB/s logical;
manual output DMA does not lift it (probe_decode_wdma: wdma 5.20 vs
blocked 4.35, IO-only wdma floor 4.11); dtype does not matter
(probe_decode7: i32-packed 3.54 vs bf16 3.52) — but the SAME kernel at
6x8K runs 134 GB/s. And the map kernel writes bf16 at ~144 GB/s at the
same 1920 minor width, so "bf16 blocked writes cap at 30-95 GB/s" can't
be the whole story.

Two experiments:

1. Shape A/B on the real kernel (equal total bytes, ~4x the 4K size):
     wide  (6, 2160, 11520) — 4K rows, 8K-wide byte rows
     tall  (6, 4320,  5760) — 8K rows, 4K-wide byte rows
     batch (24, 2160, 5760) — 4K geometry, 4x batch
   If wide >> tall ~ batch, the lever is ROW WIDTH (DMA burst length);
   if all ~equal to 8K's 134 GB/s, it's total size; if all ~50, the 8K
   rate is about its h (tile count per image).

2. Side isolation at the exact 4K and 8K geometries:
     read-only  — the kernel's input DMA + row-parity dot, output one
                  (8, 128) partial per tile (write traffic ~0)
     write-only — no input DMA, write the full (4, tr/2, wh) bf16 block
                  from a broadcast (read traffic ~0)
   Whichever side reproduces the 4K slowness is the wall.

Usage: python tools/probe_decode8.py [--k 8] [--reps 4]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taichi_image_tpu.ops.pallas import decode as pld


def _read_kernel(tr, ni, nt, hbm_ref, rsel_ref, out_ref, scratch, sems):
  t = pl.program_id(0)

  def src(tt):
    return hbm_ref.at[tt // ni, pl.ds((tt % ni) * tr, tr)]

  def dma(slot, tt):
    return pltpu.make_async_copy(src(tt), scratch.at[slot], sems.at[slot])

  @pl.when(t == 0)
  def _():
    dma(0, 0).start()

  @pl.when(t + 1 < nt)
  def _():
    dma((t + 1) % 2, t + 1).start()

  dma(t % 2, t).wait()
  by = scratch[t % 2].astype(jnp.int32).astype(jnp.float32)
  rows = jnp.dot(rsel_ref[0], by)  # the kernel's first real op
  out_ref[...] = jnp.sum(rows[:, :128])[None, None, None] + jnp.zeros(
      (1, 8, 128), jnp.float32)


def read_only(raws_u8, row_tile=None):
  n, h, wb = raws_u8.shape
  tr = row_tile or pld.decode_tiling(h, wb)
  ni = h // tr
  nt = n * ni
  kernel = functools.partial(_read_kernel, tr, ni, nt)
  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((nt, 8, 128), jnp.float32),
      grid=(nt,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((2, tr // 2, tr), lambda t: (0, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
      scratch_shapes=[
          pltpu.VMEM((2, tr, wb), jnp.uint8),
          pltpu.SemaphoreType.DMA((2,)),
      ],
  )(raws_u8, jnp.asarray(pld._rsel(tr)))


def _write_kernel(tr, wh, ni, seed_ref, out_ref):
  t = pl.program_id(0)
  v = seed_ref[0].astype(jnp.float32)  # seed arrives as i32 (u8 SMEM casts unsupported)
  base = jax.lax.broadcasted_iota(jnp.float32, (tr // 2, wh), 1)
  for c in range(4):
    out_ref[0, c] = ((base + v) * (1.0 / 4095.0)).astype(jnp.bfloat16)


def write_only(seed_u8, n, h, wb, row_tile=None):
  wh = wb // 3
  tr = row_tile or pld.decode_tiling(h, wb)
  ni = h // tr
  nt = n * ni
  kernel = functools.partial(_write_kernel, tr, wh, ni)
  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((n, 4, h // 2, wh), jnp.bfloat16),
      grid=(nt,),
      in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
      out_specs=pl.BlockSpec(
          (1, 4, tr // 2, wh),
          lambda t, ni=ni: (t // ni, 0, t % ni, 0),
          memory_space=pltpu.VMEM),
  )(seed_u8)


def bench(fn, arg, k, reps, consume, xor_dtype=jnp.uint8):
  @jax.jit
  def f(r):
    acc = jnp.float32(0)
    for i in range(k):
      acc = acc + consume(fn(r ^ xor_dtype(i)))
    return acc
  float(np.asarray(f(arg)))
  best = None
  for _ in range(reps):
    t0 = time.perf_counter()
    float(np.asarray(f(arg)))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / k * 1000


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--k", type=int, default=8)
  ap.add_argument("--reps", type=int, default=4)
  args = ap.parse_args()
  rng = np.random.default_rng(0)

  def mkraw(n, h, wb):
    return jax.device_put(rng.integers(0, 256, (n, h, wb), dtype=np.uint8))

  print("=== 1. shape A/B, real decode kernel ===", flush=True)
  shapes = [("4K ref ", 6, 2160, 5760), ("8K ref ", 6, 4320, 11520),
            ("wide   ", 6, 2160, 11520), ("tall   ", 6, 4320, 5760),
            ("batch  ", 24, 2160, 5760)]
  for tag, n, h, wb in shapes:
    raws = mkraw(n, h, wb)
    mb = (raws.nbytes + n * 4 * (h // 2) * (wb // 3) * 2) / 1e6
    ms = bench(pld.decode12_phases_bf16, raws, args.k, args.reps,
               lambda o: o[0, 0, 0, :8].astype(jnp.float32).sum())
    print(f"{tag} n={n:2} h={h} wb={wb:6}: {ms:7.2f} ms "
          f"({mb / ms:7.1f} GB/s logical, tr={pld.decode_tiling(h, wb)})",
          flush=True)

  print("=== 2. side isolation ===", flush=True)
  for tag, n, h, wb in [("4K", 6, 2160, 5760), ("8K", 6, 4320, 11520)]:
    raws = mkraw(n, h, wb)
    rmb = raws.nbytes / 1e6
    wmb = n * 4 * (h // 2) * (wb // 3) * 2 / 1e6
    ms_r = bench(read_only, raws, args.k, args.reps,
                 lambda o: o[0, 0, :8].sum())
    seed = jax.device_put(np.array([3], np.int32))
    ms_w = bench(lambda s: write_only(s, n, h, wb), seed, args.k,
                 args.reps, lambda o: o[0, 0, 0, :8].astype(jnp.float32).sum(),
                 xor_dtype=jnp.int32)
    print(f"{tag} read-only : {ms_r:7.2f} ms ({rmb / ms_r:7.1f} GB/s u8 in)",
          flush=True)
    print(f"{tag} write-only: {ms_w:7.2f} ms ({wmb / ms_w:7.1f} GB/s bf16 out)",
          flush=True)


if __name__ == "__main__":
  main()
