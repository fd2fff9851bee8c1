"""On-chip race + value check: Camera16 strict XLA f16 path vs the q16
fast path (ops/pallas/q16) at 6x4K.

Methodology per CLAUDE.md: K steps chained in ONE jit, a distinct XOR
byte per iteration, every output consumed into a scalar checksum.

Usage: python tools/probe_q16.py [K]
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
from taichi_image_tpu.models import camera_isp as ci
from taichi_image_tpu.ops import bayer
from taichi_image_tpu.ops.interpolate import ImageTransform

N, H, W = 6, 2160, 3840
K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
REPS = 5


def step_fn(gamma=1.0, intensity=1.0):
  """Returns a FRESH function object each call: pjit caches compiled
  executables globally per function object, so reusing one `step`
  across the strict/fast monkeypatch toggle silently reuses the first
  route's executable (caught: a 0.0 s 'compile' and a trivial diff)."""
  def step(raws, prev):
    m, out = ci.fused_isp_step(
        raws, prev, 0.2, gamma, intensity, 1.0, 0.0, "packed12", False,
        types.f16, bayer.BayerPattern.RGGB, None, None, 8,
        ImageTransform.none, "reinhard")
    return m, out
  return step


def timeit(step, raws, prev):
  @jax.jit
  def chain(raws, prev):
    acc = jnp.float32(0)
    m = prev
    for i in range(K):
      m, out = step(raws ^ jnp.uint8(i), m)
      acc = acc + jnp.sum(out.astype(jnp.float32)) + jnp.sum(m)
    return acc
  _ = np.asarray(chain(raws, prev))
  best = None
  for _ in range(REPS):
    t0 = time.perf_counter()
    _ = np.asarray(chain(raws, prev))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / K * 1000.0


def main():
  rng = np.random.default_rng(0)
  raws = jnp.asarray(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                  dtype=np.uint8))
  prev = jnp.zeros(9, jnp.float32)

  assert ci._q16_kernels_available(raws.shape, 8), "q16 kernels must tile"

  for gamma, intensity, tag in ((1.0, 1.0, "g=1"),
                                (0.9, 3.0, "g=.9 i=3 (CLI)")):
    # value check first: strict vs fast on identical inputs (distinct
    # step objects per route — see step_fn)
    orig = ci._q16_kernels_available
    try:
      ci._q16_kernels_available = lambda *a: False
      m_s, out_s = jax.jit(step_fn(gamma, intensity))(raws, prev)
      m_s, out_s = np.asarray(m_s), np.asarray(out_s)
    finally:
      ci._q16_kernels_available = orig
    m_f, out_f = jax.jit(step_fn(gamma, intensity))(raws, prev)
    diff = np.abs(np.asarray(out_f).astype(int) - out_s.astype(int))
    mdiff = np.abs(np.asarray(m_f) - m_s).max()
    print(f"[{tag}] u8 |diff| max {diff.max()}  >1-count px "
          f"{(diff > 1).sum()}/{diff.size}  metrics |d| {mdiff:.2e}",
          flush=True)

    t_fast = timeit(step_fn(gamma, intensity), raws, prev)
    try:
      ci._q16_kernels_available = lambda *a: False
      t_strict = timeit(step_fn(gamma, intensity), raws, prev)
    finally:
      ci._q16_kernels_available = orig
    print(f"[{tag}] strict {t_strict:7.2f} ms ({1000/t_strict:6.1f} f/s)"
          f"   q16 {t_fast:7.2f} ms ({1000/t_fast:6.1f} f/s)"
          f"   speedup {t_strict/t_fast:.2f}x", flush=True)


if __name__ == "__main__":
  main()
