"""Headline benchmark: 6-camera 4K RGGB full ISP throughput per chip.

Pipeline per frame set (mirrors reference bench/camera_isp.py:31-35):
packed12 decode -> MHC demosaic -> EMA metering -> Reinhard tonemap -> u8,
6 cameras x 4K (3840x2160), f16 working dtype, fused into one jitted step.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the recorded single-thread CPU (JAX-CPU
backend) throughput of this same fused pipeline on the dev machine —
a stand-in for the reference's CPU-Taichi arch, which cannot run here
(taichi is not installed; BASELINE.md notes the reference publishes no
numbers). Target from BASELINE.json: >10x the CPU baseline.
"""

import json
import time

import numpy as np

# measured on this machine (2026-08-16): fused 6x4K f16 ISP step on the
# JAX CPU backend — 0.78 frames/s (see BASELINE.md "build baselines")
CPU_BASELINE_FPS = 0.78

N_CAMERAS = 6
H, W = 2160, 3840
WARMUP = 5
ITERS = 30


def main():
  import jax
  import jax.numpy as jnp
  from taichi_image_tpu import types
  from taichi_image_tpu.models.camera_isp import _jit_fused_step
  from taichi_image_tpu.ops.bayer import BayerPattern
  from taichi_image_tpu.ops.interpolate import ImageTransform

  rng = np.random.default_rng(0)
  raws = jnp.asarray(rng.integers(0, 256,
                                  size=(N_CAMERAS, H, W * 3 // 2),
                                  dtype=np.uint8))
  metrics = jnp.zeros(9, jnp.float32)

  def step(metrics, t):
    return _jit_fused_step(
        raws, metrics, t, jnp.float32(0.6), jnp.float32(1.0),
        jnp.float32(1.0), jnp.float32(0.0),
        "packed12", False, types.f16, BayerPattern.RGGB, None, None, 8,
        ImageTransform.none, "reinhard")

  t0, t1 = jnp.float32(0.0), jnp.float32(0.9)
  metrics, out = step(metrics, t0)
  for _ in range(WARMUP):
    metrics, out = step(metrics, t1)
  jax.block_until_ready((metrics, out))

  start = time.perf_counter()
  for _ in range(ITERS):
    metrics, out = step(metrics, t1)
  jax.block_until_ready((metrics, out))
  elapsed = time.perf_counter() - start

  fps = ITERS * N_CAMERAS / elapsed
  print(json.dumps({
      "metric": "4K RGGB frames/sec/chip, full ISP (unpack->demosaic->tonemap)",
      "value": round(fps, 2),
      "unit": "frames/s",
      "vs_baseline": round(fps / CPU_BASELINE_FPS, 2),
  }))


if __name__ == "__main__":
  main()
