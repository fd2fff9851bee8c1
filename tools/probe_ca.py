"""On-chip race: color_adapt > 0 through the round-5 kernel ca_mode vs
the XLA fallback those configs used before.

Two families at 6x4K:
  * Camera16 (f16): the widened q16 fast path (decode+stencil+map all
    Pallas, the map kernel's per-channel adapt chain) vs the strict
    XLA f16 route (the pre-round-5 behavior for ca > 0);
  * bf16 flagship: the bf16 DMA map kernel's ca_mode vs the XLA
    reinhard_map_ca ca > 0 branch.

Methodology per CLAUDE.md: K steps chained in ONE jit, a distinct XOR
byte per iteration, every output consumed into a scalar checksum.

Usage: python tools/probe_ca.py [K]
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
import taichi_image_tpu.ops.pallas.reinhard as pl_rh

N, H, W = 6, 2160, 3840
K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
REPS = 5
CA = 0.5


def step_fn(wd, **over):
  kw = dict(gamma=0.9, intensity=3.0, light_adapt=0.8, color_adapt=CA,
            fmt="packed12", ids_format=False, work_dtype=wd,
            pattern=bayer.BayerPattern.RGGB, cc=None, resize_plan=None,
            stride=8, transform=ImageTransform.none, tonemap="reinhard")
  kw.update(over)

  def step(raws, prev):
    return ci.fused_isp_step(raws, prev, 0.2, **kw)
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


def race(tag, wd, close):
  """close(): context manager-ish pair (saved, restore) forcing the
  XLA fallback route."""
  rng = np.random.default_rng(0)
  raws = jnp.asarray(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                  dtype=np.uint8))
  prev = jnp.zeros(9, jnp.float32)

  # value check on identical inputs
  m_k, o_k = jax.jit(step_fn(wd))(raws, prev)
  saved = close()
  try:
    m_x, o_x = jax.jit(step_fn(wd))(raws, prev)
  finally:
    saved()
  d = np.abs(np.asarray(o_k).astype(int) - np.asarray(o_x).astype(int))
  dm = float(np.abs(np.asarray(m_k) - np.asarray(m_x)).max())
  print(f"[{tag}] u8 max|diff|={int(d.max())} "
        f"frac>1={float((d > 1).mean()):.1e} metrics max|diff|={dm:.1e}",
        flush=True)

  ms_k = timeit(step_fn(wd), raws, prev)
  saved = close()
  try:
    ms_x = timeit(step_fn(wd), raws, prev)
  finally:
    saved()
  print(f"[{tag}] xla {ms_x:.2f} ms/step ({N / ms_x * 1000:.1f} f/s)"
        f"  kernel {ms_k:.2f} ms/step ({N / ms_k * 1000:.1f} f/s)"
        f"  speedup x{ms_x / ms_k:.2f}", flush=True)


def close_q16():
  orig = ci._q16_kernels_available
  ci._q16_kernels_available = lambda *a: False
  return lambda: setattr(ci, "_q16_kernels_available", orig)


def close_bf16():
  orig = pl_rh.reinhard_bf16_available
  pl_rh.reinhard_bf16_available = lambda *a: False
  return lambda: setattr(pl_rh, "reinhard_bf16_available", orig)


def main():
  race("f16 Camera16 ca=0.5 (q16 route vs strict)", types.f16, close_q16)
  race("bf16 flagship ca=0.5 (map kernel vs XLA)", types.bf16, close_bf16)


if __name__ == "__main__":
  main()
