"""Probe: FLAT full-frame-kernel 8K driver vs the banded scan driver.

Round-4 attribution (tools/probe_large2.py, this chip): at 6x8K the
scan driver's in-scan decode (37.3 ms) and fused demosaic stencil
(+40.5 ms) run ~3x slower per pixel than the same kernels inside the
4K fused step, while the in-scan map kernel (+13.9 ms) is at full
rate. The Pallas kernels themselves tile arbitrary extents — the
_BAND_ROWS_MAX compiler crash is an XLA-op-extent limit, not a kernel
limit — so this probe times the front stages as STANDALONE full-frame
kernel programs:

  decode   pallas decode12 (one program, whole 6x8K raw)
  stencil  pallas fused-finish demosaic + sample emission (one program)
  meter    EMA metering on the emitted samples (tiny XLA program)
  map      pallas bf16 Reinhard map (one program, whole frame)
  finish   the shipped <=1088-row gamma+stack-interleave chunks

variants:
  flatN    each front stage its own jit program
  flat1    all front stages inside ONE jit
  scan     the shipped process_banded scan driver (reference point)
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
from taichi_image_tpu.models.camera_isp import metering_update_ca
from taichi_image_tpu.ops.bayer import BayerPattern, demosaic_phases
from taichi_image_tpu.ops.pallas import decode as pl_decode
from taichi_image_tpu.ops.pallas import demosaic as pl_dm
from taichi_image_tpu.ops.pallas.reinhard import (reinhard_bf16_available,
                                                  reinhard_map_bf16_dma)

N, H, W = 6, 4320, 7680
HH, WH = H // 2, W // 2
REPS = 3
STRIDE = 8
SQ = STRIDE // 2


def main():
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  prev = jnp.zeros(9, jnp.float32)
  wd = types.bf16

  print("decode tiling:", pl_decode.decode_tiling(H, W * 3 // 2))
  print("stencil tiling:", pl_dm.tiling_for(HH, WH, SQ, in_bf16=True,
                                            out_bf16=True))
  print("map available:", reinhard_bf16_available(12, HH, WH), flush=True)

  # --- stage programs -----------------------------------------------------
  p_decode = jax.jit(lambda r: pl_decode.decode12_phases_bf16(r))

  def _stencil(ph):
    return demosaic_phases(ph, BayerPattern.RGGB, out_dtype=wd,
                           backend="pallas", sample_step=SQ)

  p_stencil = jax.jit(_stencil)

  def _meter(samples):
    n_total = samples.shape[0] * samples.shape[2] * samples.shape[3]
    return metering_update_ca(samples, prev, jnp.float32(0.0),
                              n_total=n_total)

  p_meter = jax.jit(_meter)
  p_map = jax.jit(lambda x12, m: reinhard_map_bf16_dma(x12, m, 1.0, 1.0))

  chunks = large.band_plan_rows(HH, -(-HH // large._FINISH_CHUNK_ROWS), 1)
  print("finish chunks:", chunks, flush=True)

  def _finish(p, metrics, mx):
    outs = [large._banded_scan_finish_chunk(p, metrics, mx, "reinhard",
                                            1.0, "rgb", True, r0, r1)
            for (r0, r1) in chunks]
    return jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]

  s_u8 = jax.jit(lambda o: jnp.sum(o, dtype=jnp.float32))
  s_any = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))

  def flatN(r):
    ph = p_decode(r)
    x12, samp = p_stencil(ph)
    metrics = p_meter(samp)
    p, mx = p_map(x12, metrics)
    return metrics, _finish(p, metrics, mx)

  @jax.jit
  def front1(r):
    ph = pl_decode.decode12_phases_bf16(r)
    x12, samp = _stencil(ph)
    metrics = _meter(samp)
    p, mx = reinhard_map_bf16_dma(x12, metrics, 1.0, 1.0)
    return metrics, p, mx

  def flat1(r):
    metrics, p, mx = front1(r)
    return metrics, _finish(p, metrics, mx)

  def scan(r):
    return large.process_banded(r, np.zeros(9, np.float32), 0.0,
                                n_bands=8, work_dtype=wd,
                                pattern=BayerPattern.RGGB, driver="scan")

  def flat_shipped(r):
    """The PRODUCTION path (ADVICE r4 medium #2): process_banded with
    the flat driver exactly as auto-selection dispatches it."""
    return large.process_banded(r, np.zeros(9, np.float32), 0.0,
                                n_bands=8, work_dtype=wd,
                                pattern=BayerPattern.RGGB, driver="flat")

  def timed_driver(name, drv):
    try:
      m, out = drv(raws)
      jax.block_until_ready(out)
    except Exception as e:
      print(f"{name:22} FAIL {type(e).__name__}: {str(e)[:120]}",
            flush=True)
      return None
    best = None
    for _ in range(REPS):
      t0 = time.perf_counter()
      m, out = drv(raws)
      _ = float(np.asarray(s_u8(out)))
      el = time.perf_counter() - t0
      best = el if best is None else min(best, el)
    print(f"{name:22} {best * 1000.0:9.1f} ms/set", flush=True)
    return best

  # stage marginals (each stage standalone, consumed by a sum program)
  def timed_stage(name, fn, *a):
    try:
      r = fn(*a)
      jax.block_until_ready(r)
    except Exception as e:
      print(f"{name:22} FAIL {type(e).__name__}: {str(e)[:120]}",
            flush=True)
      return None
    first = r[0] if isinstance(r, tuple) else r
    best = None
    for _ in range(REPS):
      t0 = time.perf_counter()
      r = fn(*a)
      first = r[0] if isinstance(r, tuple) else r
      _ = float(np.asarray(s_any(first)))
      el = time.perf_counter() - t0
      best = el if best is None else min(best, el)
    print(f"{name:22} {best * 1000.0:9.1f} ms (+sum program)",
          flush=True)
    return r

  want = set(sys.argv[1:]) or {"stages", "flatN", "flat1", "flat", "scan"}
  if "stages" in want:
    ph = timed_stage("decode kernel", p_decode, raws)
    if ph is not None:
      st = timed_stage("stencil kernel", p_stencil, ph)
      if st is not None:
        x12, samp = st
        metrics = p_meter(samp)
        timed_stage("map kernel", p_map, x12, metrics)
  if "flatN" in want:
    timed_driver("flatN (4 programs)", flatN)
  if "flat1" in want:
    timed_driver("flat1 (one front jit)", flat1)
  if "flat" in want:
    timed_driver("flat driver (shipped)", flat_shipped)
  if "scan" in want:
    timed_driver("scan driver (shipped)", scan)


if __name__ == "__main__":
  main()
