"""4K flagship per-stage roofline table (round-4 VERDICT next #3).

For each stage of the 6x4K bf16 fused ISP step (decode / stencil+demosaic
/ metering+map / gamma+quantize+interleave tail) this probe measures,
in ONE session:
  * stage ms — prefix-chain deltas (each prefix K-chained in one jit with
    a distinct input byte per iteration and every output consumed, the
    bench.py methodology), PLUS the full fused step for the residual;
  * the stage's LOGICAL bytes — what any implementation of this stage
    structure must move through HBM (reads of materialized producers +
    writes of materialized results; fused elementwise traffic not
    counted);
  * achieved GB/s = bytes / stage-time;
  * the stage's own measured ceiling: a same-session K-chained
    whole-array XOR copy chain at the stage's array shapes/dtypes
    (2*nbytes per iteration), combined as t_floor = sum(bytes_i /
    rate(dtype_i, shape_i)); pct = t_floor / t_stage.

Caveats carried into BASELINE.md with the table:
  * prefix deltas attribute OVERLAPPED work to the later stage; Pallas
    manual-DMA streams can exceed the XLA copy-chain ceiling (~2x,
    docs/PERFORMANCE.md "practical roofline"), so >100% is possible and
    means "faster than XLA elementwise moves the same bytes", not error.
  * the tail's logical bytes assume the interleave fuses with its
    quantize producer (one bf16 read + one u8 write).

Usage: python tools/probe_roofline4k.py [--k 10] [--reps 3] [--json OUT]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu import types
from taichi_image_tpu.models.camera_isp import (fused_isp_step,
                                                load_raw_phases,
                                                metering_update_ca,
                                                reinhard_map_max_ca)
from taichi_image_tpu.ops.bayer import BayerPattern, demosaic_phases
from taichi_image_tpu.ops.interpolate import ImageTransform

N, H, W = 6, 2160, 3840
HH, WH = H // 2, W // 2
WD = types.bf16
PAT = BayerPattern.RGGB


def chain_time(fn, raws, k, reps):
  """Best per-step ms for a K-chained prefix (bench.py methodology)."""
  @jax.jit
  def steps(raws):
    acc = jnp.float32(0)
    for i in range(k):
      acc = acc + fn(raws ^ jnp.uint8(i))
    return acc
  _ = np.asarray(steps(raws))
  best = None
  for _ in range(reps):
    t0 = time.perf_counter()
    _ = np.asarray(steps(raws))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / k * 1000.0


def copy_rate(arr, reps, k_lo=5, k_hi=None):
  """Same-session XOR copy-chain ceiling (GB/s, R+W) for arr's
  shape/dtype; (k_hi-k_lo)-delta nets out dispatch+fetch (bench.py).

  Two stability rules, both learned from failed runs of this probe
  (negative and physically-impossible rates on the sub-150 MB shapes):
  (1) the spread must be WIDE — k_hi is scaled so the extra iterations
  move >= ~25 GB (~60 ms at ~400 GB/s), far above the tunnel's
  multi-ms (occasionally multi-10-ms) scalar-fetch jitter; (2) the
  estimator is min(t_hi over reps) - min(t_lo over reps), NOT the min
  of per-rep deltas — mins are stable estimators of each chain's
  noise floor, while a per-rep delta goes negative whenever its t_lo
  draw lands on a jitter spike."""
  if k_hi is None:
    k_hi = k_lo + max(40, int(25e9 / (2 * arr.nbytes)) + 1)
  if arr.dtype == jnp.uint8:
    def mk(k):
      cs = jnp.arange(1, k + 1, dtype=jnp.uint8)

      @jax.jit
      def run(x):
        def body(carry, c):
          x, acc = carry
          y = jax.lax.optimization_barrier(x ^ c)
          return (y, acc + jnp.sum(y, dtype=jnp.int32)), None
        (xf, acc), _ = jax.lax.scan(body, (x, jnp.int32(0)), cs)
        return acc + xf.reshape(-1)[-1].astype(jnp.int32)
      return run
  else:
    def mk(k):
      cs = jnp.arange(1, k + 1, dtype=jnp.uint16)

      @jax.jit
      def run(x):
        def body(carry, c):
          x, acc = carry
          y = jax.lax.bitcast_convert_type(
              jax.lax.bitcast_convert_type(x, jnp.uint16) ^ c, arr.dtype)
          y = jax.lax.optimization_barrier(y)
          return (y, acc + jnp.sum(y, dtype=jnp.float32)), None
        (xf, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), cs)
        return acc + xf.reshape(-1)[-1].astype(jnp.float32)
      return run
  f_lo, f_hi = mk(k_lo), mk(k_hi)
  _ = np.asarray(f_lo(arr)), np.asarray(f_hi(arr))
  t_los, t_his = [], []
  for _ in range(reps):
    t0 = time.perf_counter()
    _ = np.asarray(f_lo(arr))
    t_los.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    _ = np.asarray(f_hi(arr))
    t_his.append(time.perf_counter() - t0)
  per_iter = (min(t_his) - min(t_los)) / (k_hi - k_lo)
  return 2 * arr.nbytes / per_iter / 1e9


# ---- prefixes of the bench.py flagship config (bf16, gamma=1, no
# resize/transform, reinhard, stride 8) --------------------------------

def p_decode(raws):
  ph = load_raw_phases(raws, "packed12", WD, False)
  return jnp.sum(ph.astype(jnp.float32))


def p_demosaic(raws):
  ph = load_raw_phases(raws, "packed12", WD, False)
  x12, samp = demosaic_phases(ph, PAT, out_dtype=WD, sample_step=4)
  return (jnp.sum(x12.astype(jnp.float32))
          + jnp.sum(samp.astype(jnp.float32)))


def p_map(raws):
  ph = load_raw_phases(raws, "packed12", WD, False)
  x12, samp = demosaic_phases(ph, PAT, out_dtype=WD, sample_step=4)
  m = metering_update_ca(samp, jnp.zeros(9, jnp.float32), jnp.float32(0.9))
  cast, mx = reinhard_map_max_ca(x12.reshape(N, 4, 3, HH, WH), m,
                                 1.0, 1.0, 0.0, WD)
  return (jnp.sum(cast.astype(jnp.float32)) + jnp.sum(mx) + jnp.sum(m))


def p_full(raws):
  m, out = fused_isp_step(
      raws, jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0, 1.0, 1.0,
      0.0, "packed12", False, WD, PAT, None, None, 8,
      ImageTransform.none, "reinhard")
  return jnp.sum(out, dtype=jnp.float32) + jnp.sum(m)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--k", type=int, default=10)
  ap.add_argument("--reps", type=int, default=5)
  ap.add_argument("--json", default=None)
  args = ap.parse_args()

  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))

  # per-shape copy ceilings
  print("copy-chain ceilings (R+W GB/s):", flush=True)
  raw_u8 = raws
  ph_bf = jax.device_put(rng.standard_normal(
      (N, 4, HH, WH)).astype(jnp.bfloat16))
  x12_bf = jax.device_put(rng.standard_normal(
      (N, 12, HH, WH)).astype(jnp.bfloat16))
  out_u8 = jax.device_put(rng.integers(0, 256, size=(N, 3, H, W),
                                       dtype=np.uint8))
  rates = {}
  for name, arr in [("raw_u8", raw_u8), ("phases_bf16", ph_bf),
                    ("x12_bf16", x12_bf), ("out_u8", out_u8)]:
    rates[name] = copy_rate(arr, args.reps)
    print(f"  {name:12} {rates[name]:7.1f} GB/s "
          f"({arr.nbytes / 1e6:.1f} MB)", flush=True)

  # prefix times
  print("prefix chains:", flush=True)
  t = {}
  for name, fn in [("decode", p_decode), ("demosaic", p_demosaic),
                   ("map", p_map), ("full", p_full)]:
    t[name] = chain_time(fn, raws, args.k, args.reps)
    print(f"  {name:10} {t[name]:7.3f} ms/step", flush=True)

  raw_b = raws.nbytes
  ph_b = ph_bf.nbytes
  x12_b = x12_bf.nbytes
  u8_b = out_u8.nbytes

  # stage rows: (label, delta ms, [(bytes, ceiling-rate-key), ...])
  stages = [
      ("decode (raw u8 -> phases bf16)", t["decode"],
       [(raw_b, "raw_u8"), (ph_b, "phases_bf16")]),
      ("demosaic stencil (phases -> x12)", t["demosaic"] - t["decode"],
       [(ph_b, "phases_bf16"), (x12_b, "x12_bf16")]),
      ("metering + reinhard map (x12 -> p)", t["map"] - t["demosaic"],
       [(x12_b, "x12_bf16"), (x12_b, "x12_bf16")]),
      ("tail: gamma+quantize+interleave (p -> u8)", t["full"] - t["map"],
       [(x12_b, "x12_bf16"), (u8_b, "out_u8")]),
      ("FULL fused step", t["full"],
       [(raw_b, "raw_u8"), (2 * ph_b, "phases_bf16"),
        (4 * x12_b, "x12_bf16"), (u8_b, "out_u8")]),
  ]
  rows = []
  hdr = (f"{'stage':44} {'ms':>7} {'MB':>7} {'GB/s':>7} "
         f"{'floor ms':>9} {'% ceil':>7}")
  print(hdr)
  for label, ms, traffic in stages:
    byts = sum(b for b, _ in traffic)
    floor_ms = sum(b / (rates[k] * 1e9) for b, k in traffic) * 1e3
    gbps = byts / (ms / 1e3) / 1e9 if ms > 0 else float("inf")
    pct = 100.0 * floor_ms / ms if ms > 0 else float("inf")
    rows.append({"stage": label, "ms": round(ms, 3),
                 "mb": round(byts / 1e6, 1), "gbps": round(gbps, 1),
                 "floor_ms": round(floor_ms, 3), "pct_ceiling": round(pct, 1)})
    print(f"{label:44} {ms:7.3f} {byts / 1e6:7.1f} {gbps:7.1f} "
          f"{floor_ms:9.3f} {pct:6.1f}%")
  print("note: sum(stage deltas) == full by construction; pct > 100 means"
        " the stage beats XLA's elementwise copy rate (Pallas manual DMA"
        " streams ~2x it).")
  if args.json:
    with open(args.json, "w") as f:
      json.dump({"rates_gbps": {k: round(v, 1) for k, v in rates.items()},
                 "rows": rows}, f, indent=1)
    print("wrote", args.json)


if __name__ == "__main__":
  main()
