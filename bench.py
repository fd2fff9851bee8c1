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

  # -- roofline fields (round-3 VERDICT #4) --------------------------------
  # Achieved HBM GB/s from the step's LOGICAL traffic (what a perfect
  # implementation of this stage structure must move; docs/PERFORMANCE.md
  # and BASELINE.md carry the per-stage table):
  #   decode   R raw u8      + W phases bf16 (N,4,hh,wh)
  #   stencil  R phases      + W x12 bf16 (N,12,hh,wh)   [samples ~1%]
  #   map      R x12         + W p bf16 + max
  #   finish   R p           + W u8 out (N,3,H,W)
  hh, wh = H // 2, W // 2
  raw_b = N_CAMERAS * H * (W * 3 // 2)
  ph_b = N_CAMERAS * 4 * hh * wh * 2
  x12_b = N_CAMERAS * 12 * hh * wh * 2
  u8_b = N_CAMERAS * 3 * H * W
  step_bytes = raw_b + ph_b + ph_b + x12_b + x12_b + x12_b + x12_b + u8_b
  hbm_gbps = step_bytes / (median / K) / 1e9

  # Same-session XLA copy ceiling at the step's dominant array shape:
  # K-chained whole-array xor inside one jit (distinct value per
  # iteration), EVERY element consumed per iteration (a single-element
  # consumption lets XLA slice the loop to a scalar chain), rate from
  # the (k_hi - k_lo)-iteration delta so dispatch+fetch overhead nets
  # out. The fused step can exceed 100% of this: its Pallas kernels'
  # manual-DMA streams measure ~2x XLA's elementwise copy rate
  # (docs/PERFORMANCE.md "practical roofline").
  xs = jax.device_put(rng.standard_normal(
      (N_CAMERAS, 12, hh, wh)).astype(jnp.bfloat16))

  def _copy_chain(k):
    cs = jnp.arange(1, k + 1, dtype=jnp.uint16)

    @jax.jit
    def run(x):
      def body(carry, c):
        x, acc = carry
        y = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.uint16) ^ c,
            jnp.bfloat16)
        y = jax.lax.optimization_barrier(y)
        return (y, acc + jnp.sum(y, dtype=jnp.float32)), None

      (xf, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), cs)
      return acc + xf.reshape(-1)[-1].astype(jnp.float32)

    return run

  # The spread must be WIDE: at ~400 GB/s this 119 MB array moves in
  # ~0.6 ms/iter, so an 8-iter delta (~5 ms) drowns in the tunnel's
  # multi-ms fetch jitter and can come out NEGATIVE (observed in a
  # round-5 session). 40 iters of delta with best-of-5 keeps the
  # signal above the noise (same fix as tools/probe_roofline4k.py).
  # Estimator: min(t_hi) - min(t_lo), NOT min of per-rep deltas — mins
  # are stable estimators of each chain's noise floor, while a per-rep
  # delta goes negative whenever its t_lo draw lands on a jitter spike
  # (observed -162 GB/s in a round-5 session).
  k_lo, k_hi = 5, 45
  f_lo, f_hi = _copy_chain(k_lo), _copy_chain(k_hi)
  _ = np.asarray(f_lo(xs)), np.asarray(f_hi(xs))
  t_los, t_his = [], []
  for _ in range(5):
    t0 = time.perf_counter()
    _ = np.asarray(f_lo(xs))
    t_los.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    _ = np.asarray(f_hi(xs))
    t_his.append(time.perf_counter() - t0)
  per_iter = (min(t_his) - min(t_los)) / (k_hi - k_lo)
  copy_gbps = 2 * xs.nbytes / per_iter / 1e9

  print(json.dumps({
      "metric": "4K RGGB frames/sec/chip, full ISP (unpack->demosaic->tonemap, bf16)",
      "value": round(fps, 2),
      "unit": "frames/s",
      "vs_baseline": round(fps / CPU_BASELINE_FPS, 2),
      "best": round(K * N_CAMERAS / best, 2),
      "reps": REPS,
      "hbm_gbps": round(hbm_gbps, 1),
      "copy_gbps": round(copy_gbps, 1),
      "pct_copy_peak": round(100 * hbm_gbps / copy_gbps, 1),
  }))


if __name__ == "__main__":
  main()
