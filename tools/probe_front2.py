"""Probe: isolate WHERE the front-fused route loses (probe_front showed
the shipped front route at 14.0 ms vs composed 7.3 at 6x4K).

Kernel-only rows (device-resident bf16 phases, fixed metrics — no
decode, no metering, no tail):
- composed kernels: demosaic_stencil(finish) -> x12 -> reinhard_map_bf16_dma
- fused kernel:     demosaic_reinhard_stencil (one pass)
- stencil only / map only: the two composed halves

Chained-jit methodology: XOR a distinct byte into the bf16 mantissa bits
per iteration (bitcast), consume every output in a scalar checksum.
"""

import sys

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu.ops import bayer as bayer_ops
from taichi_image_tpu.ops.bayer import BayerPattern
from taichi_image_tpu.ops.pallas import demosaic as pl_dm
from taichi_image_tpu.ops.pallas.reinhard import (reinhard_map_bf16_dma,
                                                  reinhard_scal)

N, HH, WH = 6, 1080, 1920
K = 10
REPS = 3


def timeit(fn, x, k=K, reps=REPS):
  @jax.jit
  def steps(x):
    acc = jnp.float32(0)
    xi = jax.lax.bitcast_convert_type(x, jnp.uint16)
    for i in range(k):
      xp = jax.lax.bitcast_convert_type(xi ^ jnp.uint16(i), jnp.bfloat16)
      acc = acc + fn(xp)
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
  want = sys.argv[1:] if len(sys.argv) > 1 else None
  rng = np.random.default_rng(0)
  phases = jax.device_put(
      jnp.asarray(rng.random((N, 4, HH, WH), np.float32), jnp.bfloat16))

  weights = bayer_ops._demosaic_tables(BayerPattern.RGGB, "mhc")
  fin = bayer_ops._stencil_finish_spec(weights, HH, WH, None, jnp.bfloat16)
  metrics = jnp.asarray(
      [0.01, 0.99, -5.0, -0.2, -1.5, 0.4, 0.3, 0.4, 0.3], jnp.float32)
  scal = reinhard_scal(metrics, 1.0, 1.0)
  t_plain = pl_dm.tiling_for(HH, WH, in_bf16=True, out_bf16=True)
  t_front = pl_dm.tiling_for(HH, WH, in_bf16=True, out_bf16=True,
                             extra_f32_tmp=pl_dm._TONEMAP_TMPS)
  print(f"tilings: plain={t_plain} front={t_front}", flush=True)

  def s_composed(ph):
    x12 = pl_dm.demosaic_stencil(ph, weights, *t_plain, finish=fin)
    p, mx = reinhard_map_bf16_dma(x12, metrics, 1.0, 1.0)
    return jnp.sum(p.astype(jnp.float32)) + jnp.sum(mx)

  def s_fused(ph):
    p, mx = pl_dm.demosaic_reinhard_stencil(ph, weights, *t_front, scal,
                                            fin)
    return jnp.sum(p.astype(jnp.float32)) + jnp.sum(mx)

  def s_stencil(ph):
    x12 = pl_dm.demosaic_stencil(ph, weights, *t_plain, finish=fin)
    return jnp.sum(x12.astype(jnp.float32))

  def s_map(ph):
    # map over pre-made x12-shaped data (reuse phases tiled x3)
    x12 = jnp.concatenate([ph, ph, ph], axis=1)
    p, mx = reinhard_map_bf16_dma(x12, metrics, 1.0, 1.0)
    return jnp.sum(p.astype(jnp.float32)) + jnp.sum(mx)

  def s_fused_plain_tiles(ph):
    p, mx = pl_dm.demosaic_reinhard_stencil(ph, weights, *t_plain, scal,
                                            fin)
    return jnp.sum(p.astype(jnp.float32)) + jnp.sum(mx)

  for name, fn in (("composed stencil+map kernels", s_composed),
                   ("fused front kernel", s_fused),
                   ("fused front kernel, plain tiles", s_fused_plain_tiles),
                   ("stencil alone", s_stencil),
                   ("map alone (x12-shaped)", s_map)):
    if want and not any(w.lower() in name.lower() for w in want):
      continue
    try:
      print(f"{name:34} {timeit(fn, phases):6.2f} ms", flush=True)
    except Exception as e:
      print(f"{name:34} FAIL {type(e).__name__}: {str(e)[:90]}",
            flush=True)


if __name__ == "__main__":
  main()
