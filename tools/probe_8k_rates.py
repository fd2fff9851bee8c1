"""Same-session per-kernel rate comparison: 4K vs 8K extents.

Round-5 item: the shipped flat 8K driver runs ~2.3x slower per pixel
than the 4K fused step (69.5 vs 4 x 7.25 ms). This probe times each
Pallas kernel CHAINED (distinct input per iteration; consumption via a
single-element read — a Pallas call cannot be partially eliminated, the
kernel either runs fully or not at all, so scalar consumption is safe
here and adds no full-array read pass) at both extents, plus the
front-in-one-jit and the finish chunks, to localize the extent
sensitivity.

Usage: python tools/probe_8k_rates.py [K]
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
from taichi_image_tpu.ops.pallas.reinhard import reinhard_map_bf16_dma

N = 6
K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
REPS = 3
SQ = 4


def timeit(label, build, px):
  """build() -> jitted chained fn + args; prints ms/step and GB/s of
  the stage's logical bytes (caller passes bytes via px tuple)."""
  fn, args = build()
  try:
    _ = np.asarray(fn(*args))
  except Exception as e:
    print(f"{label:28} FAIL {type(e).__name__}: {str(e)[:90]}", flush=True)
    return None
  best = None
  for _ in range(REPS):
    t0 = time.perf_counter()
    _ = np.asarray(fn(*args))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  ms = best / K * 1000.0
  gbps = px / (ms / 1000.0) / 1e9
  print(f"{label:28} {ms:8.2f} ms  {gbps:6.1f} GB/s", flush=True)
  return ms


def probe(tag, H, W):
  HH, WH = H // 2, W // 2
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  phases = jax.device_put(rng.random((N, 4, HH, WH)).astype(jnp.bfloat16))
  x12 = jax.device_put(rng.random((N, 12, HH, WH)).astype(jnp.bfloat16))
  mtr = jnp.asarray([0.02, 0.98, -3.0, -0.1, -1.2, 0.4, 0.45, 0.4, 0.35],
                    jnp.float32)
  raw_b = raws.nbytes
  ph_b = phases.nbytes
  x12_b = x12.nbytes
  u8_b = N * 3 * H * W

  def b_decode():
    @jax.jit
    def f(r):
      acc = jnp.float32(0)
      for i in range(K):
        ph = pl_decode.decode12_phases_bf16(r ^ jnp.uint8(i))
        acc = acc + ph[0, 0, 0, 0].astype(jnp.float32)
      return acc
    return f, (raws,)

  def b_stencil():
    @jax.jit
    def f(p):
      acc = jnp.float32(0)
      for i in range(K):
        pi = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(p, jnp.uint16)
            ^ jnp.uint16(i + 1), jnp.bfloat16)
        o, s = demosaic_phases(pi, BayerPattern.RGGB,
                               out_dtype=types.bf16, backend="pallas",
                               sample_step=SQ)
        acc = acc + o[0, 0, 0, 0].astype(jnp.float32) + jnp.sum(
            s.astype(jnp.float32))
      return acc
    return f, (phases,)

  def b_map():
    @jax.jit
    def f(x):
      acc = jnp.float32(0)
      for i in range(K):
        xi = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.uint16)
            ^ jnp.uint16(i + 1), jnp.bfloat16)
        p, mx = reinhard_map_bf16_dma(xi, mtr, 1.0, 1.0)
        acc = acc + p[0, 0, 0, 0].astype(jnp.float32) + jnp.sum(mx)
      return acc
    return f, (x12,)

  def b_front1():
    @jax.jit
    def f(r):
      acc = jnp.float32(0)
      for i in range(K):
        m, out = large._flat_full_step(
            r ^ jnp.uint8(i), jnp.zeros(9, jnp.float32),
            jnp.float32(0.0), False, BayerPattern.RGGB, None, 8,
            1.0, 1.0, "reinhard", 1.0, "rgb")
        acc = (acc + out[0, 0, 0, 0].astype(jnp.float32)
               + jnp.sum(m))
      return acc
    return f, (raws,)

  def b_finish():
    chunks = large.band_plan_rows(HH, -(-HH // large._FINISH_CHUNK_ROWS),
                                  1)
    mx = jnp.full((N, 1, 1, 1), 0.9, jnp.float32)

    @jax.jit
    def f(p):
      acc = jnp.int32(0)
      for i in range(K):
        pi = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(p, jnp.uint16)
            ^ jnp.uint16(i + 1), jnp.bfloat16)
        outs = [large._banded_scan_finish_chunk(pi, mtr, mx, "reinhard",
                                                0.9, "rgb", True, r0, r1)
                for (r0, r1) in chunks]
        for o in outs:
          acc = acc + jnp.sum(o, dtype=jnp.int32)
      return acc
    return f, (x12,)

  def b_copy(arr, label_bytes):
    """Same-shape XLA copy ceiling (bench.py's scan-xor chain): reads
    and writes the array once per iteration, EVERY element consumed.
    This is each stage's own measured ceiling for the roofline table
    (BASELINE.md)."""
    del label_bytes

    def build():
      if arr.dtype == jnp.uint8:
        cs = jnp.arange(1, K + 1, dtype=jnp.uint8)

        def body(carry, c):
          x, acc = carry
          y = jax.lax.optimization_barrier(x ^ c)
          return (y, acc + jnp.sum(y, dtype=jnp.int32)), None

        @jax.jit
        def run(x):
          (xf, acc), _ = jax.lax.scan(body, (x, jnp.int32(0)), cs)
          return acc + xf.reshape(-1)[-1].astype(jnp.int32)
      else:
        cs = jnp.arange(1, K + 1, dtype=jnp.uint16)

        def body(carry, c):
          x, acc = carry
          y = jax.lax.bitcast_convert_type(
              jax.lax.bitcast_convert_type(x, jnp.uint16) ^ c,
              jnp.bfloat16)
          y = jax.lax.optimization_barrier(y)
          return (y, acc + jnp.sum(y, dtype=jnp.float32)), None

        @jax.jit
        def run(x):
          (xf, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), cs)
          return acc + xf.reshape(-1)[-1].astype(jnp.float32)
      return run, (arr,)
    return build

  def b_concat():
    """The _assemble tail's chunk concat: a full extra u8 copy the
    chained finish numbers exclude."""
    a = jax.device_put(rng.integers(0, 256, size=(N, 3, H // 2, W),
                                    dtype=np.uint8))
    b = jax.device_put(rng.integers(0, 256, size=(N, 3, H // 2, W),
                                    dtype=np.uint8))

    @jax.jit
    def f(a, b):
      acc = jnp.int32(0)
      for i in range(K):
        o = jnp.concatenate([a ^ jnp.uint8(i), b ^ jnp.uint8(i)], axis=2)
        acc = acc + jnp.sum(o, dtype=jnp.int32)
      return acc
    return f, (a, b)

  print(f"--- {tag} (H={H}, W={W}) ---", flush=True)
  timeit("decode kernel", b_decode, raw_b + ph_b)
  timeit("stencil kernel", b_stencil, ph_b + x12_b)
  timeit("map kernel", b_map, 2 * x12_b)
  timeit("front1 (one jit)", b_front1, raw_b + 2 * ph_b + 3 * x12_b)
  timeit("finish chunks", b_finish, x12_b + u8_b)
  timeit("chunk concat (u8 copy)", b_concat, 2 * u8_b)
  u8out = jax.device_put(rng.integers(0, 256, size=(N, 3, H, W),
                                      dtype=np.uint8))
  timeit("ceiling copy raw u8", b_copy(raws, None), 2 * raw_b)
  timeit("ceiling copy phases bf16", b_copy(phases, None), 2 * ph_b)
  timeit("ceiling copy x12 bf16", b_copy(x12, None), 2 * x12_b)
  timeit("ceiling copy out u8", b_copy(u8out, None), 2 * u8_b)


def main():
  probe("4K", 2160, 3840)
  probe("8K", 4320, 7680)


if __name__ == "__main__":
  main()
