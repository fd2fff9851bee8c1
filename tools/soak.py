"""Sustained-serving soak: N steps of the 6x4K bf16 fused step with the
EMA metering state carried across steps (the production rig pattern).

Methodology: groups of G steps chained inside ONE jit (EMA carry
threaded through; a DISTINCT byte XOR'd into the raws each step; every
step's u8 output consumed in a scalar checksum) — per-step time is
group time / G, so the ~9 ms/dispatch axon-tunnel latency amortizes the
way a pipelined serving host would. Prints median / p95 / max per-step
time, first-vs-last-group drift, and asserts the metering state stays
finite for the whole run.

Usage: python tools/soak.py [steps=500] [group=10]
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
from taichi_image_tpu.models.camera_isp import fused_isp_step
from taichi_image_tpu.ops.bayer import BayerPattern
from taichi_image_tpu.ops.interpolate import ImageTransform

N, H, W = 6, 2160, 3840


def main():
  steps = int(sys.argv[1]) if len(sys.argv) > 1 else 500
  group = int(sys.argv[2]) if len(sys.argv) > 2 else 10
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))

  @jax.jit
  def run_group(raws, metrics, t, base):
    acc = jnp.float32(0)
    for g in range(group):
      metrics, out = fused_isp_step(
          raws ^ ((base + g) % 251).astype(jnp.uint8), metrics, t,
          1.0, 1.0, 1.0, 0.0, "packed12", False, types.bf16,
          BayerPattern.RGGB, None, None, 8, ImageTransform.none,
          "reinhard")
      t = jnp.float32(0.9)  # EMA blend after the seeding step
      acc = acc + jnp.sum(out, dtype=jnp.float32)
    return metrics, t, acc

  metrics = jnp.zeros(9, jnp.float32)
  t = jnp.float32(0.0)
  # warm compile
  m_w, t_w, acc = run_group(raws, metrics, t, jnp.int32(0))
  _ = float(acc)

  times = []
  n_groups = steps // group
  for gi in range(n_groups):
    t0 = time.perf_counter()
    metrics, t, acc = run_group(raws, metrics, t, jnp.int32(gi * group))
    _ = float(acc)  # fetch = sync
    times.append((time.perf_counter() - t0) / group * 1000.0)
    m_np = np.asarray(metrics)
    if not np.isfinite(m_np).all():
      print(f"FAIL non-finite metering at group {gi}: {m_np}")
      sys.exit(1)

  times = np.array(times)
  k = max(1, len(times) // 10)
  print(f"soak {steps} steps (6x4K bf16, EMA carried): "
        f"median {np.median(times):.2f} ms/step, "
        f"p95 {np.percentile(times, 95):.2f}, max {times.max():.2f}; "
        f"first-{k}-group mean {times[:k].mean():.2f} vs "
        f"last-{k} {times[-k:].mean():.2f}; metering finite", flush=True)


if __name__ == "__main__":
  main()
