"""Probe: mega-kernel (decode+demosaic, NO in-kernel sample) + external
reshape-select metering subsample vs the composed kernels WITH in-kernel
sample emission.

Round-3 on-chip data (probe_megakernel.py): with in-kernel sample
emission the composed chain wins (5.51 vs 6.07 ms) — the mega kernel's
512-lane-padded per-tile sample blocks are expensive. But WITHOUT the
sample the mega kernel leads 4.59 vs 5.19 ms. The x12 output is
materialized either way, so the metering samples can come from a cheap
reshape-select read of it (subsample_hw — a windowed copy, not a
gather): if (mega nosample + external subsample) beats
(composed + in-kernel sample) by >0.3 ms same-run, integrating the mega
kernel into the fused step is worth it.
"""

import sys

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import functools

import numpy as np
import jax
import jax.numpy as jnp

from probe_megakernel import mega, composed, bench, N, H, W
from taichi_image_tpu.ops.bayer import subsample_hw


def mega_ext_sample(raws, cc=None, tr=40, hh_grid=None):
  out = mega(raws, tr=tr, cc=cc, hh_grid=hh_grid)
  return out, subsample_hw(out[:, 0:3], 4, 4)


def composed_ext_sample(raws, cc=None):
  out = composed(raws, cc=cc)
  return out, subsample_hw(out[:, 0:3], 4, 4)


def main():
  rng = np.random.default_rng(0)
  cc = tuple(np.array([[1.1, -0.05, 0.0], [0.02, 0.9, 0.08],
                       [0.0, -0.1, 1.05]], np.float32).ravel())
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))

  # value check: external subsample == in-kernel emission
  o_ref, s_ref = jax.jit(functools.partial(
      composed, cc=cc, sample=True))(raws)
  o_got, s_got = jax.jit(functools.partial(
      mega_ext_sample, cc=cc))(raws)
  ds = np.abs(np.asarray(s_got, np.float32) - np.asarray(s_ref,
                                                         np.float32))
  do = np.abs(np.asarray(o_got, np.float32) - np.asarray(o_ref,
                                                         np.float32))
  print(f"value: out max|d|={float(do.max()):.2e} "
        f"sample max|d|={float(ds.max()):.2e}", flush=True)

  for name, fn in (
      ("composed + in-kernel sample", functools.partial(
          composed, cc=cc, sample=True)),
      ("composed + external subsample", functools.partial(
          composed_ext_sample, cc=cc)),
      ("mega tr=40 + external subsample", functools.partial(
          mega_ext_sample, cc=cc)),
      ("mega tr=32 grid=1088 + external subsample", functools.partial(
          mega_ext_sample, cc=cc, tr=32, hh_grid=1088)),
  ):
    try:
      print(f"{name}: {bench(fn, raws):6.2f} ms", flush=True)
    except Exception as e:
      print(f"{name}: FAIL {str(e)[:90]}", flush=True)


if __name__ == "__main__":
  main()
