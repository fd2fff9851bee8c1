"""Round-5 item 6: can the 8K flat driver's finish chunks move into the
SAME program as the front?

The shipped flat driver (models/large.py) runs the front as one jit
(decode -> stencil -> meter -> map) and the gamma+interleave finish as
separate per-chunk programs that read the full-res p as a PARAMETER —
the documented 40-90 GB/s parameter-fed walls — then concatenates the
chunk outputs (one more full u8 copy). The 4K fused step beats the sum
of its own stage standalones because everything lives in one program.
Hypothesis: at 8K the per-OP extent limit (no full-8K interleave
program compiles) does not forbid a single PROGRAM containing two
4K-class chunk interleaves, where each chunk consumes the map kernel's
in-program output instead of a parameter.

Variants raced (all value-checked against the shipped driver):
  shipped     process_banded(driver="flat") — the production path
  mega_stack  ONE jit: front + chunked finish (stack interleave) + concat
  mega_t6     same but the 6-d transpose interleave (the 4K fused tail's
              measured winner for in-program producers)
  mega_dus    mega_stack but chunks written into a preallocated output
              via dynamic_update_slice (no separate concat pass)

Usage: python tools/probe_8k_onejit.py [variant ...]
"""

import sys

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu import types
from taichi_image_tpu.models import large
from taichi_image_tpu.models.camera_isp import (metering_update_ca,
                                                reinhard_gamma_ca)
from taichi_image_tpu.ops import bayer
from taichi_image_tpu.ops.bayer import BayerPattern, demosaic_phases
from taichi_image_tpu.ops.pallas import decode as pl_decode
from taichi_image_tpu.ops.pallas.reinhard import reinhard_map_bf16_dma

N, H, W = 6, 4320, 7680
REPS = 5
SQ = 4


def _front(r):
  """The flat front body (mirrors large._flat_front_step, reinhard)."""
  phases = pl_decode.decode12_phases_bf16(r)
  x12, samp = demosaic_phases(phases, BayerPattern.RGGB,
                              out_dtype=types.bf16, backend="pallas",
                              sample_step=SQ)
  samp = jax.lax.optimization_barrier(samp)
  n_total = samp.shape[0] * samp.shape[2] * samp.shape[3]
  metrics = metering_update_ca(samp, jnp.zeros(9, jnp.float32),
                               jnp.float32(0.0), n_total=n_total)
  p, mx = reinhard_map_bf16_dma(x12, metrics, 1.0, 1.0)
  return metrics, p, mx


def _chunks(hh):
  return large.band_plan_rows(hh, -(-hh // large._FINISH_CHUNK_ROWS), 1)


def _finish_chunk(p, mx, r0, r1, form):
  out12 = reinhard_gamma_ca(p[:, :, r0:r1], mx, 1.0)
  if form == "stack":
    return bayer.phases_to_planar_stack(out12)
  return bayer.phases_to_planar(out12)


def make_mega(form):
  @jax.jit
  def mega(r):
    metrics, p, mx = _front(r)
    hh = p.shape[2]
    outs = [_finish_chunk(p, mx, r0, r1, form) for r0, r1 in _chunks(hh)]
    return metrics, jnp.concatenate(outs, axis=2)
  return mega


@jax.jit
def mega_dus(r):
  metrics, p, mx = _front(r)
  n, _, hh, wh = p.shape
  out = jnp.zeros((n, 3, 2 * hh, 2 * wh), jnp.uint8)
  for r0, r1 in _chunks(hh):
    out = jax.lax.dynamic_update_slice(
        out, _finish_chunk(p, mx, r0, r1, "stack"), (0, 0, 2 * r0, 0))
  return metrics, out


def shipped(r):
  return large.process_banded(r, np.zeros(9, np.float32), 0.0,
                              n_bands=8, work_dtype=types.bf16,
                              pattern=BayerPattern.RGGB, driver="flat")


def main():
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  s_u8 = jax.jit(lambda o: jnp.sum(o, dtype=jnp.int32))

  variants = {"shipped": shipped,
              "mega_stack": make_mega("stack"),
              "mega_t6": make_mega("t6"),
              "mega_dus": mega_dus}
  want = sys.argv[1:] or list(variants)

  ref = None
  for name in want:
    drv = variants[name]
    try:
      t0 = time.perf_counter()
      m, out = drv(raws)
      jax.block_until_ready(out)
      compile_s = time.perf_counter() - t0
    except Exception as e:
      print(f"{name:12} FAIL {type(e).__name__}: {str(e)[:120]}",
            flush=True)
      continue
    if ref is None:
      ref = np.asarray(out)
      eq = "ref"
    else:
      eq = ("bitwise" if np.array_equal(np.asarray(out), ref)
            else f"MISMATCH max|d|={np.abs(np.asarray(out).astype(int) - ref.astype(int)).max()}")
    best = None
    for _ in range(REPS):
      t0 = time.perf_counter()
      m, out = drv(raws)
      _ = int(np.asarray(s_u8(out)))
      el = time.perf_counter() - t0
      best = el if best is None else min(best, el)
    print(f"{name:12} {best * 1000.0:8.1f} ms/set  (compile {compile_s:.0f}s, "
          f"{eq})", flush=True)


if __name__ == "__main__":
  main()
