"""Decode kernel row-tile race (round 5).

The 4K roofline table (tools/probe_roofline4k.py) shows decode as the
stage furthest from the XLA copy ceiling (3.4 ms, ~51 GB/s logical).
Prior analysis (docs/PERFORMANCE.md round-2/3): the kernel is
output-pipeline-bound — Pallas bf16 blocked writes cap at ~30-95 GB/s
on this toolchain and "per-program slab count / bytes-per-program is
the main lever". The shipped tiling prefers the largest row tile
<= 96 (probed fastest on the ROUND-2 kernel). This probe re-races the
tile size on the CURRENT kernel: larger tiles = fewer grid programs =
more write bytes per program.

Times (a) the standalone decode at each legal tr, (b) the full fused
step at the best vs shipped tr. Methodology: K-chained jit, distinct
XOR byte per iteration, all outputs consumed in a scalar checksum.

Usage: python tools/probe_decode6.py [--k 10] [--reps 5]
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

N, H, W = 6, 2160, 3840
WB = W * 3 // 2


def legal_trs(h, wb):
  out = []
  for tr in range(16, min(h, 256) + 1, 16):
    if h % tr:
      continue
    if 2 * tr * wb > 6 * 1024 * 1024:
      continue
    out.append(tr)
  return out


def chain_time(fn, raws, k, reps):
  @jax.jit
  def steps(raws):
    acc = jnp.float32(0)
    for i in range(k):
      acc = acc + jnp.sum(fn(raws ^ jnp.uint8(i)).astype(jnp.float32))
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
  ap.add_argument("--k", type=int, default=10)
  ap.add_argument("--reps", type=int, default=5)
  args = ap.parse_args()

  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, WB),
                                     dtype=np.uint8))

  print(f"shipped tr: {pld.decode_tiling(H, WB)}")
  results = {}
  for tr in legal_trs(H, WB):
    def mk(tr=tr):
      def f(r):
        return pld.decode12_phases_bf16(r, row_tile=tr)
      return f
    ms = chain_time(mk(), raws, args.k, args.reps)
    results[tr] = ms
    ngrid = N * (H // tr)
    print(f"  tr={tr:3d}  grid={ngrid:4d}  {ms:7.3f} ms/step", flush=True)

  best_tr = min(results, key=results.get)
  print(f"best: tr={best_tr} at {results[best_tr]:.3f} ms "
        f"(shipped {pld.decode_tiling(H, WB)}: "
        f"{results[pld.decode_tiling(H, WB)]:.3f} ms)")

  # value check: best tr must be bit-identical to shipped
  a = np.asarray(pld.decode12_phases_bf16(raws))
  b = np.asarray(pld.decode12_phases_bf16(raws, row_tile=best_tr))
  print("bitwise equal across tr:", np.array_equal(
      a.view(np.uint16), b.view(np.uint16)))


if __name__ == "__main__":
  main()
