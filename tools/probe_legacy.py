"""TPU benchmark: legacy per-image API (load_* + tonemap_reinhard) vs
the fused whole-rig step at 6x4K bf16 (round-2 VERDICT missing #5: the
composed API was never benchmarked on TPU; target within 2x of fused).

Methodology note: the composed flow is multi-dispatch (host python
between stages), so the single-jit chained-checksum harness cannot wrap
it. Instead each iteration's outputs fold into a device-side running
checksum whose final fetch forces EVERY dispatched program to complete
(async dispatch pipelines the calls; nothing can be skipped because the
checksum depends on all of it). Iterations feed distinct inputs (host
XOR) and the EMA metrics chain serializes them. The fused step is timed
the same way here for apples-to-apples (its chained-jit number is the
headline bench).
"""

import sys
sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu.models.camera_isp import CameraBF16
from taichi_image_tpu.ops.bayer import BayerPattern

N, H, W = 6, 2160, 3840
ITERS = 6


@jax.jit
def _fold(acc, out):
  return acc + jnp.sum(out, dtype=jnp.int32)


@jax.jit
def _xor(raws, i):
  return raws ^ i


def bench_legacy(raws):
  isp = CameraBF16(BayerPattern.RGGB)
  # warmup / compile every program in the flow
  imgs = [isp.load_packed12(raws[c]) for c in range(N)]
  outs = isp.tonemap_reinhard(imgs, gamma=0.9, intensity=3.0)
  # the lazy fused fast path must have fired: loader handles stayed
  # lazy and the outputs share one batch array
  assert all(im._lazy is not None for im in imgs), "lazy path not taken"
  assert outs[0]._batch is not None, "fused fast path not taken"
  acc = jnp.int32(0)
  t0 = time.perf_counter()
  for i in range(ITERS):
    ri = _xor(raws, jnp.uint8(i))
    imgs = [isp.load_packed12(ri[c]) for c in range(N)]
    outs = isp.tonemap_reinhard(imgs, gamma=0.9, intensity=3.0)
    for o in outs:
      acc = _fold(acc, o.planar)
  _ = np.asarray(acc)
  return (time.perf_counter() - t0) / ITERS * 1000.0


def bench_fused(raws):
  isp = CameraBF16(BayerPattern.RGGB)
  _ = isp.process(raws, gamma=0.9, intensity=3.0)
  acc = jnp.int32(0)
  t0 = time.perf_counter()
  for i in range(ITERS):
    out = isp.process(_xor(raws, jnp.uint8(i)), gamma=0.9, intensity=3.0)
    acc = _fold(acc, out)
  _ = np.asarray(acc)
  return (time.perf_counter() - t0) / ITERS * 1000.0


def bench_graph(raws, mode: str):
  """Chained-jit (tunnel-honest) measurement of the DEVICE work of the
  flows. ``staged`` models the eager composed flow (pre-lazy): stage
  boundaries are modeled with optimization_barriers between the
  per-camera load outputs and the batched tonemap (each barrier forces
  the planar image to materialize in HBM exactly as a separate dispatch
  would); without them XLA would fuse the stages back into the fused
  step and measure nothing. ``lazy`` models what the composed API
  executes since loaders went lazy: per-camera raws (separate arrays,
  barriered) concatenated into one batch + the SAME fused step + the
  six per-image output slices handles hand out."""
  composed = mode == "staged"
  import time as _t
  from taichi_image_tpu import types
  from taichi_image_tpu.models.camera_isp import (
      fused_isp_step, metering_update_ca, reinhard_apply_ca,
      load_raw_phases)
  from taichi_image_tpu.ops.bayer import subsample_hw
  from taichi_image_tpu.ops import bayer as bayer_ops
  from taichi_image_tpu.ops.interpolate import ImageTransform

  K = 8

  @jax.jit
  def steps(raws):
    acc = jnp.int32(0)
    m = jnp.zeros(9, jnp.float32)
    for i in range(K):
      ri = raws ^ jnp.uint8(i)
      if composed:
        # the round-3 legacy flow: loaders hand out PHASE-form handles
        # (no per-frame interleave — the barriered planar variant of
        # this probe measured 133 ms/set, ~107 ms of which was 6x
        # per-camera bf16 interleave), tonemap consumes phase form
        imgs = []
        for c in range(N):  # per-camera load programs
          ph = load_raw_phases(ri[c][None], "packed12", types.bf16)
          x12 = bayer_ops.demosaic_phases(ph, BayerPattern.RGGB,
                                          out_dtype=jnp.bfloat16)
          imgs.append(jax.lax.optimization_barrier(x12[0]))
        batch = jnp.stack(imgs)
        m = metering_update_ca(subsample_hw(batch[:, 0:3], 4, 4), m,
                               jnp.float32(0.9))
        n, _, hh, wh = batch.shape
        out12 = reinhard_apply_ca(batch.reshape(n, 4, 3, hh, wh), m,
                                  0.9, 3.0, 1.0, 0.0, types.bf16)
        out = bayer_ops.phases_to_planar(
            out12.reshape(n, 12, hh, wh))
      elif mode == "lazy":
        # model: separately-arriving per-camera raws (barriered) are
        # concatenated into one batch feeding the SAME fused step. The
        # per-image output slices the handles hand out are NOT modeled
        # in-jit: multiple slice consumers of the fused output inside
        # ONE jit make XLA recompute the producing interleave fusion
        # per consumer (105-435 ms/set artifact — tools/
        # probe_lazy_graph.py bisection); in the real flow each slice
        # is its own ~25 MB copy program (<0.1 ms each), amortized in
        # the wall-clock number below.
        cams = [jax.lax.optimization_barrier(ri[c][None])
                for c in range(N)]
        batch = jnp.concatenate(cams)
        m, out = fused_isp_step(
            batch, m, jnp.float32(0.9), 0.9, 3.0, 1.0, 0.0, "packed12",
            False, types.bf16, BayerPattern.RGGB, None, None, 8,
            ImageTransform.none, "reinhard")
      else:
        m, out = fused_isp_step(
            ri, m, jnp.float32(0.9), 0.9, 3.0, 1.0, 0.0, "packed12",
            False, types.bf16, BayerPattern.RGGB, None, None, 8,
            ImageTransform.none, "reinhard")
      acc = acc + jnp.sum(out, dtype=jnp.int32)
    return acc
  _ = np.asarray(steps(raws))
  best = None
  for _ in range(3):
    t0 = _t.perf_counter()
    _ = np.asarray(steps(raws))
    el = _t.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / K * 1000.0


def main():
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  fused_g = bench_graph(raws, mode="fused")
  lazy_g = bench_graph(raws, mode="lazy")
  legacy_g = bench_graph(raws, mode="staged")
  print(f"device work, chained-jit harness (the honest compute cost):")
  print(f"  fused step graph:               {fused_g:7.2f} ms/set")
  print(f"  lazy composed graph (current):  {lazy_g:7.2f} ms/set "
        f"({lazy_g / fused_g:.2f}x fused)")
  print(f"  staged graph (pre-lazy, barriered): {legacy_g:7.2f} ms/set "
        f"({legacy_g / fused_g:.2f}x fused)")
  fused = min(bench_fused(raws) for _ in range(3))
  legacy = min(bench_legacy(raws) for _ in range(3))
  print(f"wall clock incl. per-dispatch tunnel latency (~9 ms/call on "
        f"axon; ~0.1 ms on a directly-attached TPU host):")
  print(f"  fused  process():                 {fused:7.2f} ms/set")
  print(f"  legacy load_* + tonemap_reinhard: {legacy:7.2f} ms/set "
        f"({legacy / fused:.2f}x fused)")


if __name__ == "__main__":
  main()
