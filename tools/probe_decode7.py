"""Probe: is the decode write cap dtype-dependent? (round 5, cont.)

tools/probe_decode_wdma.py answered the MECHANISM question: manual
output DMA (the input side's make_async_copy pattern, double-buffered)
does NOT lift the decode kernel's write side — wdma 5.20 ms vs blocked
4.35 same-session at 6x4K, and the wdma IO-only floor is 4.11 ms
(~42 GB/s). The cap is the write path itself at this bf16 geometry,
not the blocked-spec pipeline emitter.

This probe answers the DTYPE question: decode12_phases_q16 emits the
SAME bytes as i32 words ((N, 2, hh, wh) i32 vs (N, 4, hh, wh) bf16,
two 12-bit codes per word). If i32 stores run faster than bf16 stores,
the bf16 flagship could switch to a packed-i32 decode + in-stencil
unpack (values unchanged: code * (1/4095) -> bf16 round is the same
value set).

Usage: python tools/probe_decode7.py [--k 8] [--reps 5]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu.ops.pallas import decode as pld


def chain(fn, k):
  @jax.jit
  def f(r):
    acc = jnp.float32(0)
    for i in range(k):
      out = fn(r ^ jnp.uint8(i))
      acc = acc + out[0, 0, 0, :8].astype(jnp.float32).sum()
    return acc
  return f


def race(tag, h, w, k, reps):
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, (6, h, w * 3 // 2),
                                     dtype=np.uint8))
  out_mb = 6 * 4 * (h // 2) * (w // 2) * 2 / 1e6
  mb = raws.nbytes / 1e6 + out_mb
  print(f"--- {tag}: logical {mb:.0f} MB/step "
        f"(in {raws.nbytes / 1e6:.0f} + out {out_mb:.0f})", flush=True)

  # value link: q16 words dequantize to the bf16 phases bit-exactly
  a = np.asarray(pld.decode12_phases_bf16(raws))
  wq = np.asarray(pld.decode12_phases_q16(raws))
  even = (wq & 0xFFFF).astype(np.float32)
  odd = (wq >> 16).astype(np.float32)
  deq = np.stack([even[:, 0], odd[:, 0], even[:, 1], odd[:, 1]],
                 axis=1) * np.float32(1.0 / 4095.0)
  print(f"q16 dequant bitwise vs bf16 decode: "
        f"{np.array_equal(a, deq.astype(jnp.bfloat16))}", flush=True)

  cands = {
      "bf16 (shipped)": lambda r: pld.decode12_phases_bf16(r),
      "q16 i32-packed": lambda r: pld.decode12_phases_q16(r),
  }
  for name, fn in cands.items():
    f = chain(fn, k)
    float(np.asarray(f(raws)))
    best = None
    for _ in range(reps):
      t0 = time.perf_counter()
      float(np.asarray(f(raws)))
      el = time.perf_counter() - t0
      best = el if best is None else min(best, el)
    ms = best / k * 1000
    print(f"{name:18} {ms:7.2f} ms  ({mb / 1e3 / (best / k):6.0f} GB/s)",
          flush=True)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--k", type=int, default=8)
  ap.add_argument("--reps", type=int, default=5)
  ap.add_argument("--skip8k", action="store_true")
  args = ap.parse_args()
  race("6x4K", 2160, 3840, args.k, args.reps)
  if not args.skip8k:
    race("6x8K", 4320, 7680, args.k, args.reps)


if __name__ == "__main__":
  main()
