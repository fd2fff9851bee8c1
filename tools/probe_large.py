"""Probe: 6x8K single-chip banded driver (ISP.process_large).

The banded driver is host-driven (one dispatch per band + staged
reductions), so the chained-jit methodology doesn't apply; this times
repeated whole-set calls wall-clock with device-resident raws (host
feeding costs ~10 s/set extra for the 298 MB upload through the axon
tunnel) and a fetched checksum per call. Also times the round-3
composition: 8K capture -> resize_width 3840 output (reference
camera_isp.py:302-315 applies the resize policy at any frame size).
"""

import sys

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import time

import numpy as np
import jax

import taichi_image_tpu as tit

N, H, W = 6, 4320, 7680
REPS = 3


def run(isp, raws, label, n_bands=8, **kwargs):
  out = isp.process_large(raws, n_bands=n_bands, **kwargs)  # warm compile
  _ = np.asarray(out[:, 0, ::997, ::997]).sum()
  best = None
  for _ in range(REPS):
    t0 = time.perf_counter()
    out = isp.process_large(raws, n_bands=n_bands, **kwargs)
    _ = np.asarray(out[:, 0, ::997, ::997]).sum()  # fetch a checksum
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  ms = best * 1000.0
  print(f"{label:44} {ms:7.1f} ms/set = {N / best:5.1f} f/s", flush=True)
  return out


def main():
  import sys
  want = sys.argv[1:] or None
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  isp = tit.CameraBF16(tit.BayerPattern.RGGB)
  outs = {}
  for label, kw in (
      ("6x8K full-res out (scan driver, auto)", {}),
      ("6x8K full-res out (loop driver forced)", {"driver": "loop"}),
  ):
    if want and not any(w in label for w in want):
      continue
    isp.metrics = None  # same EMA seeding for the value check
    outs[label] = run(isp, raws, label)
  if len(outs) == 2:
    a, b = outs.values()
    d = np.abs(np.asarray(a).astype(int) - np.asarray(b).astype(int))
    print(f"scan-vs-loop u8 max|d|={int(d.max())} "
          f"frac={float((d != 0).mean()):.2e}", flush=True)
  if not want or any("resize" in w for w in want):
    isp_rs = tit.CameraBF16(tit.BayerPattern.RGGB, resize_width=3840)
    run(isp_rs, raws, "6x8K -> resize_width 3840 (loop; no scan w/ resize)")


if __name__ == "__main__":
  main()
