"""On-chip race: Camera16 strict XLA f16 path vs the q16 FRONT route
(round-5) on the configuration families the full q16 fast path cannot
serve — the reference ISP's resize policy and linear tonemap.

Methodology per CLAUDE.md: K steps chained in ONE jit, a distinct XOR
byte per iteration, every output consumed into a scalar checksum.

Usage: python tools/probe_q16_front.py [K]
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

CONFIGS = (
    ("resize->1920", dict(resize_plan=((1920, 1080), None))),
    ("linear g=.9", dict(tonemap="linear", gamma=0.9)),
    ("coloradapt=.5", dict(color_adapt=0.5)),
)


def step_fn(**over):
  """Fresh function object per route (pjit caches per function object —
  see tools/probe_q16.py)."""
  kw = dict(gamma=1.0, intensity=1.0, light_adapt=1.0, color_adapt=0.0,
            fmt="packed12", ids_format=False, work_dtype=types.f16,
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


def main():
  rng = np.random.default_rng(0)
  raws = jnp.asarray(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                  dtype=np.uint8))
  prev = jnp.zeros(9, jnp.float32)
  assert ci._q16_front_available(raws.shape, 4), "front kernels must tile"

  for tag, over in CONFIGS:
    # value check: identical inputs through both routes
    orig = ci._q16_front_available
    try:
      ci._q16_front_available = lambda *a: False
      m_s, o_s = jax.jit(step_fn(**over))(raws, prev)
      m_s = np.asarray(m_s)
      o_s = np.asarray(o_s)
    finally:
      ci._q16_front_available = orig
    m_f, o_f = jax.jit(step_fn(**over))(raws, prev)
    d = np.abs(np.asarray(o_f).astype(int) - o_s.astype(int))
    dm = float(np.abs(np.asarray(m_f) - m_s).max())
    print(f"[{tag}] u8 max|diff|={int(d.max())} "
          f"frac>1={float((d > 1).mean()):.1e} metrics max|diff|={dm:.1e}",
          flush=True)

    try:
      ci._q16_front_available = lambda *a: False
      ms_s = timeit(step_fn(**over), raws, prev)
    finally:
      ci._q16_front_available = orig
    ms_f = timeit(step_fn(**over), raws, prev)
    print(f"[{tag}] strict {ms_s:.2f} ms/step ({N / ms_s * 1000:.1f} f/s)"
          f"  front {ms_f:.2f} ms/step ({N / ms_f * 1000:.1f} f/s)"
          f"  speedup x{ms_s / ms_f:.2f}", flush=True)


if __name__ == "__main__":
  main()
