"""Probe: is the decode's ~2.9 ms "fixed per-call cost" real?

probe_decode8's shape A/B fits t(call) = 2.9 ms + bytes/250 GB/s
across 174/348/697 MB calls — identical (tr=80, wb=5760) grid steps
run 22 us/step in a 162-step call but 8.8 us/step in a 648-step call.
Two artifact hypotheses to kill before believing it:

  K-chain artifact — ms/call changes with K (it must NOT if per-call
      cost is real; all probes used one K).
  split test — decoding 6 images as two 3-image calls inside one jit
      should cost ~2 x (2.9 + half-bytes/250) = ~6.5 ms if the fixed
      cost is per CALL, vs ~3.6 + epsilon if it is per BYTE.
  grid-length test — one 6-image call with a HALVED row tile (tr=40,
      double the steps at half the bytes each): if per-STEP overhead
      dominated, this doubles the overhead; if the fixed cost is
      per-call, time stays ~3.6.

Usage: python tools/probe_decode9.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu.ops.pallas import decode as pld

N, H, WB = 6, 2160, 5760
REPS = 5


def timeit(f, arg, k):
  float(np.asarray(f(arg)))
  best = None
  for _ in range(REPS):
    t0 = time.perf_counter()
    float(np.asarray(f(arg)))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / k * 1000


def main():
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, (N, H, WB), dtype=np.uint8))

  print("--- K-dependence (one 6-image call per iteration) ---", flush=True)
  for k in (1, 2, 4, 8, 16):
    @jax.jit
    def f(r, k=k):
      acc = jnp.float32(0)
      for i in range(k):
        out = pld.decode12_phases_bf16(r ^ jnp.uint8(i))
        acc = acc + out[0, 0, 0, :8].astype(jnp.float32).sum()
      return acc
    print(f"K={k:2}: {timeit(f, raws, k):7.2f} ms/call", flush=True)

  print("--- split test (K=8) ---", flush=True)
  @jax.jit
  def split(r):
    acc = jnp.float32(0)
    for i in range(8):
      a = pld.decode12_phases_bf16(r[:3] ^ jnp.uint8(i))
      b = pld.decode12_phases_bf16(r[3:] ^ jnp.uint8(i))
      acc = acc + a[0, 0, 0, :8].astype(jnp.float32).sum()
      acc = acc + b[0, 0, 0, :8].astype(jnp.float32).sum()
    return acc
  print(f"two 3-image calls: {timeit(split, raws, 8):7.2f} ms/iter",
        flush=True)

  print("--- grid-length test (K=8, tr override) ---", flush=True)
  for tr in (40, 80, 216):
    if H % tr:
      continue
    @jax.jit
    def f(r, tr=tr):
      acc = jnp.float32(0)
      for i in range(8):
        out = pld.decode12_phases_bf16(r ^ jnp.uint8(i), row_tile=tr)
        acc = acc + out[0, 0, 0, :8].astype(jnp.float32).sum()
      return acc
    print(f"tr={tr:3} ({N * H // tr:4} steps): {timeit(f, raws, 8):7.2f} "
          "ms/call", flush=True)

  print("--- no-XOR variant (K=8): is the u8 XOR part of the 2.9? ---",
        flush=True)
  @jax.jit
  def noxor(r):
    acc = jnp.float32(0)
    for i in range(8):
      out = pld.decode12_phases_bf16(r)
      acc = acc + out[0, 0, i, :8].astype(jnp.float32).sum()
    return acc
  print(f"no-XOR: {timeit(noxor, raws, 8):7.2f} ms/call "
        "(CSE risk: identical calls may collapse — compare vs K=1)",
        flush=True)


if __name__ == "__main__":
  main()
