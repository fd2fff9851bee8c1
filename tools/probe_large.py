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


def run(isp, raws, label, n_bands=8):
  out = isp.process_large(raws, n_bands=n_bands)  # warm compile
  _ = np.asarray(out[:, 0, ::997, ::997]).sum()
  best = None
  for _ in range(REPS):
    t0 = time.perf_counter()
    out = isp.process_large(raws, n_bands=n_bands)
    _ = np.asarray(out[:, 0, ::997, ::997]).sum()  # fetch a checksum
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  ms = best * 1000.0
  print(f"{label:44} {ms:7.1f} ms/set = {N / best:5.1f} f/s", flush=True)


def main():
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  isp = tit.CameraBF16(tit.BayerPattern.RGGB)
  run(isp, raws, "6x8K full-res out (n_bands=8)")
  isp_rs = tit.CameraBF16(tit.BayerPattern.RGGB,
                                     resize_width=3840)
  run(isp_rs, raws, "6x8K -> resize_width 3840 (n_bands=8)")


if __name__ == "__main__":
  main()
