"""Headline benchmark: 6-camera 4K RGGB full ISP throughput per chip.

Pipeline per frame set (mirrors reference bench/camera_isp.py:31-35):
packed12 decode -> MHC demosaic -> EMA metering -> Reinhard tonemap -> u8,
6 cameras x 4K (3840x2160), bf16 working dtype (the TPU-native 16-bit
analog of the reference's f16 Camera16 — Mosaic kernels cannot touch
f16, so bf16 unlocks the manual-DMA Pallas Reinhard map; the f16 parity
pipeline is benchmarked in docs/PERFORMANCE.md), fused planar pipeline.

Timing methodology: K steps chained (metrics feed forward) inside ONE jit,
finishing in a scalar checksum fetched to host — async dispatch and the
axon tunnel cannot hide device time behind an unreliable
block_until_ready.

ROUND-1 FLAW, FIXED HERE: the round-1 harness perturbed inputs with
``raws ^ (i & 1)`` (two distinct values) and summed only the LAST
iteration's output. XLA CSE'd decode+demosaic across same-input
iterations and dead-code-eliminated the tonemap for all but the last, so
BENCH_r01's 634.76 f/s measured only ~2 decodes + K metering updates +
ONE tonemap (true per-step cost then: ~44 ms ≈ 136 f/s, see
docs/PERFORMANCE.md "honest stage table"). This harness XORs a DISTINCT
byte into every iteration's input and accumulates every iteration's
output into the checksum, so nothing can be CSE'd or eliminated.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the recorded JAX-CPU throughput of the same
fused pipeline on the dev machine (single CPU core) — a stand-in for the
reference's CPU-Taichi arch, which cannot run here (taichi not installed;
the reference publishes no numbers, BASELINE.md).
"""

import json
import time
from functools import partial

import numpy as np

# measured on this machine (2026-08-16, FIXED harness — distinct inputs
# per iteration, every output consumed): fused 6x4K bf16 planar ISP step
# on the JAX CPU backend, 1 core (see BASELINE.md "build baselines";
# the f16 pipeline measures 0.697 f/s there)
CPU_BASELINE_FPS = 0.749

N_CAMERAS = 6
H, W = 2160, 3840
K = 10        # chained steps per jit call
REPS = 5      # timed calls (headline = MEDIAN; best reported as extra)


def main():
  import jax
  import jax.numpy as jnp
  from taichi_image_tpu import types
  from taichi_image_tpu.utils.platform import ensure_backend_for_timing
  ensure_backend_for_timing()
  from taichi_image_tpu.models.camera_isp import fused_isp_step
  from taichi_image_tpu.ops.bayer import BayerPattern
  from taichi_image_tpu.ops.interpolate import ImageTransform

  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256,
                                     size=(N_CAMERAS, H, W * 3 // 2),
                                     dtype=np.uint8))

  @jax.jit
  def steps(m, raws):
    acc = jnp.int32(0)
    for i in range(K):
      # distinct input per iteration (no CSE); every output consumed (no DCE)
      m, out = fused_isp_step(
          raws ^ jnp.uint8(i), m, jnp.float32(0.9), 1.0,
          1.0, 1.0, 0.0,
          "packed12", False, types.bf16, BayerPattern.RGGB, None, None, 8,
          ImageTransform.none, "reinhard")
      acc = acc + jnp.sum(out, dtype=jnp.int32)
    return m, acc

  m0 = jnp.zeros(9, jnp.float32)

  # The axon tunnel is occasionally flaky (transient FAILED_PRECONDITION);
  # retry the warmup a few times before giving up.
  last_err = None
  for attempt in range(3):
    try:
      m, chk = steps(m0, raws)
      _ = np.asarray(chk)  # warm compile + execute
      last_err = None
      break
    except Exception as e:  # pragma: no cover - hardware flake path
      last_err = e
      time.sleep(5)
  if last_err is not None:
    raise last_err

  # Headline is the MEDIAN of REPS timed calls — the axon tunnel has
  # ±5-8% run-to-run variance and quoting the best run overstates what a
  # user sees (round-2 VERDICT "what's weak" #1). Best is kept as a
  # secondary field.
  times = []
  for _ in range(REPS):
    t0 = time.perf_counter()
    m, chk = steps(m0, raws)
    _ = np.asarray(chk)
    times.append(time.perf_counter() - t0)
  median = sorted(times)[len(times) // 2]
  best = min(times)

  fps = K * N_CAMERAS / median
  print(json.dumps({
      "metric": "4K RGGB frames/sec/chip, full ISP (unpack->demosaic->tonemap, bf16)",
      "value": round(fps, 2),
      "unit": "frames/s",
      "vs_baseline": round(fps / CPU_BASELINE_FPS, 2),
      "best": round(K * N_CAMERAS / best, 2),
      "reps": REPS,
  }))


if __name__ == "__main__":
  main()
