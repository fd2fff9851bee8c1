"""Probe: per-stage attribution of the 8K banded scan driver.

The scan and loop drivers measure EQUAL at 6x8K (~220 ms/set) and the
banded fused finish bought ~nothing — so the naive traffic model is
wrong. This times cumulative prefixes of the scan-driver structure on
the chip (all consumption via in-body partial sums accumulated in the
scan carry — reductions OVER a scan ys stack are a measured
pathology — and a scalar fetch):

  decode    pad + per-band dynamic-slice + load_raw_phases
  A         + fused-finish demosaic stencil (3-kind switch) + sample
  A+meter   + EMA metering on the merged samples
  A+C       + bf16 Reinhard map kernel per band (+ global max)
  full      + merge + chunked gamma+interleave finish (device-side sum)
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
from taichi_image_tpu.models.camera_isp import (load_raw_phases,
                                                metering_update_ca)
from taichi_image_tpu.ops.bayer import (BayerPattern, _demosaic_tables,
                                        _stencil_finish_spec,
                                        subsample_hw)
from taichi_image_tpu.ops.pallas import demosaic as pallas_dm
from taichi_image_tpu.ops.pallas.reinhard import reinhard_map_bf16_dma

N, H, W = 6, 4320, 7680
HH, WH = H // 2, W // 2
B = 240
NB = HH // B
REPS = 3


def timed(name, fn, *a):
  f = jax.jit(fn)
  r = f(*a)
  jax.block_until_ready(r)
  best = None
  for _ in range(REPS):
    t0 = time.perf_counter()
    _ = float(np.asarray(f(*a)))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  print(f"{name:26} {best * 1000.0:9.1f} ms/set", flush=True)


def main():
  want = sys.argv[1:] or None
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  weights = _demosaic_tables(BayerPattern.RGGB, "mhc")
  wd = types.bf16
  prev = jnp.zeros(9, jnp.float32)

  def bands_a(raws, upto):
    """Scan over bands running the pipeline prefix ``upto``; consumes
    everything via in-body partial sums in the carry."""
    raws_p = jnp.pad(raws, ((0, 0), (2, 2), (0, 0)))
    tiles = pallas_dm.tiling_for(B + 2, WH, in_bf16=True, out_bf16=True)

    def _kind(top_row, bot_row):
      fin = _stencil_finish_spec(weights, B + 2, WH, None, wd,
                                 top_row=top_row, bot_row=bot_row)
      return lambda ph: pallas_dm.demosaic_stencil(ph, weights, *tiles,
                                                   finish=fin)

    def body(acc, i):
      raw_band = jax.lax.dynamic_slice_in_dim(raws_p, 2 * B * i,
                                              2 * B + 4, axis=1)
      phases = load_raw_phases(raw_band, "packed12", wd)
      if upto == "decode":
        return acc + jnp.sum(phases.astype(jnp.float32)), jnp.float32(0)
      idx = jnp.where(i == 0, 0, jnp.where(i == NB - 1, 2, 1))
      x12 = jax.lax.switch(idx, [_kind(1, -1), _kind(-1, -1),
                                 _kind(-1, B)], phases)[:, :, 1:B + 1]
      samp = subsample_hw(x12[:, 0:3], 4, 4)
      if upto == "a":
        return (acc + jnp.sum(x12.astype(jnp.float32))
                + jnp.sum(samp.astype(jnp.float32))), jnp.float32(0)
      return acc, (x12, samp)

    if upto in ("decode", "a"):
      acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(NB))
      return acc
    _, (x12_b, samp_b) = jax.lax.scan(body, jnp.float32(0),
                                      jnp.arange(NB))
    samples = jnp.moveaxis(samp_b, 0, 2)
    samples = samples.reshape(N, 3, -1, samples.shape[-1])
    n_total = samples.shape[0] * samples.shape[2] * samples.shape[3]
    metrics = metering_update_ca(samples, prev, jnp.float32(0.0),
                                 n_total=n_total)
    if upto == "meter":
      return jnp.sum(metrics) + jnp.sum(x12_b[0, 0, 0, 0]
                                        .astype(jnp.float32))

    def body_map(acc, x):
      p, mx = reinhard_map_bf16_dma(x, metrics, 1.0, 1.0)
      return acc + jnp.sum(mx), p

    acc, p_b = jax.lax.scan(body_map, jnp.float32(0), x12_b)
    if upto == "c":
      return acc + jnp.sum(p_b[0, 0, 0, 0].astype(jnp.float32))
    raise ValueError(upto)

  for name, fn in (
      ("decode only", lambda r: bands_a(r, "decode")),
      ("A (fused demosaic)", lambda r: bands_a(r, "a")),
      ("A + metering", lambda r: bands_a(r, "meter")),
      ("A + C (map kernel)", lambda r: bands_a(r, "c")),
  ):
    if want and not any(w.lower() in name.lower() for w in want):
      continue
    try:
      timed(name, fn, raws)
    except Exception as e:
      print(f"{name:26} FAIL {type(e).__name__}: {str(e)[:90]}",
            flush=True)

  if not want or any("full" in w for w in want):
    # full driver + device-side consumption (sum as its own program)
    isp_like = lambda r: large.process_banded(
        r, np.zeros(9, np.float32), 0.0, n_bands=8, work_dtype=wd,
        pattern=BayerPattern.RGGB, driver="scan")
    m, out = isp_like(raws)
    jax.block_until_ready(out)
    s = jax.jit(lambda o: jnp.sum(o, dtype=jnp.float32))
    best = None
    for _ in range(REPS):
      t0 = time.perf_counter()
      m, out = isp_like(raws)
      _ = float(np.asarray(s(out)))
      el = time.perf_counter() - t0
      best = el if best is None else min(best, el)
    print(f"{'full scan driver':26} {best * 1000.0:9.1f} ms/set",
          flush=True)


if __name__ == "__main__":
  main()


# --- finish-variant race (run as: python tools/probe_large2.py variants)
def run_variants():
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  weights = _demosaic_tables(BayerPattern.RGGB, "mhc")
  wd = types.bf16
  prev = jnp.zeros(9, jnp.float32)
  from taichi_image_tpu.models.camera_isp import (reinhard_gamma_ca,
                                                  reinhard_map_ca)
  from taichi_image_tpu.ops.bayer import phases_to_planar
  tiles = pallas_dm.tiling_for(B + 2, WH, in_bf16=True, out_bf16=True)

  def _kind(top_row, bot_row):
    fin = _stencil_finish_spec(weights, B + 2, WH, None, wd,
                               top_row=top_row, bot_row=bot_row)
    return lambda ph: pallas_dm.demosaic_stencil(ph, weights, *tiles,
                                                 finish=fin)

  def scan_a_meter(raws):
    raws_p = jnp.pad(raws, ((0, 0), (2, 2), (0, 0)))

    def body(_, i):
      raw_band = jax.lax.dynamic_slice_in_dim(raws_p, 2 * B * i,
                                              2 * B + 4, axis=1)
      phases = load_raw_phases(raw_band, "packed12", wd)
      idx = jnp.where(i == 0, 0, jnp.where(i == NB - 1, 2, 1))
      x12 = jax.lax.switch(idx, [_kind(1, -1), _kind(-1, -1),
                                 _kind(-1, B)], phases)[:, :, 1:B + 1]
      return 0, (x12, subsample_hw(x12[:, 0:3], 4, 4))

    _, (x12_b, samp_b) = jax.lax.scan(body, 0, jnp.arange(NB))
    samples = jnp.moveaxis(samp_b, 0, 2)
    samples = samples.reshape(N, 3, -1, samples.shape[-1])
    n_total = samples.shape[0] * samples.shape[2] * samples.shape[3]
    metrics = metering_update_ca(samples, prev, jnp.float32(0.0),
                                 n_total=n_total)
    return x12_b, metrics

  def scan_map(x12_b, metrics):
    def body(_, x):
      return 0, reinhard_map_bf16_dma(x, metrics, 1.0, 1.0)
    _, (p_b, mx_b) = jax.lax.scan(body, 0, x12_b)
    return p_b, jnp.max(mx_b, axis=0)

  # shipped: one program (A..C + in-program merge), p-fed chunk finishers
  @jax.jit
  def prog_shipped(raws):
    x12_b, metrics = scan_a_meter(raws)
    p_b, max_out = scan_map(x12_b, metrics)
    merged = jnp.moveaxis(p_b, 0, 2).reshape(N, 12, HH, WH)
    return merged, metrics, max_out

  from functools import partial as _partial

  @_partial(jax.jit, static_argnames=("r0", "r1"))
  def chunk_shipped(merged, max_out, r0, r1):
    out12 = reinhard_gamma_ca(merged[:, :, r0:r1], max_out, 1.0)
    return phases_to_planar(out12.reshape(N, 12, r1 - r0, WH))

  # V-A: stacked p_b out; merge folded into each chunk program
  @jax.jit
  def prog_va(raws):
    x12_b, metrics = scan_a_meter(raws)
    p_b, max_out = scan_map(x12_b, metrics)
    return p_b, metrics, max_out

  @_partial(jax.jit, static_argnames=("k0", "k1"))
  def chunk_va(p_b, max_out, k0, k1):
    merged = jnp.moveaxis(p_b[k0:k1], 0, 2).reshape(N, 12,
                                                    (k1 - k0) * B, WH)
    out12 = reinhard_gamma_ca(merged, max_out, 1.0)
    return phases_to_planar(out12.reshape(N, 12, (k1 - k0) * B, WH))

  # V-C: no p at all — XLA map for the max (in-scan), chunks redo the
  # map fused with gamma+interleave from stacked x12
  @jax.jit
  def prog_vc(raws):
    x12_b, metrics = scan_a_meter(raws)

    def body_max(_, x):
      p = reinhard_map_ca(x.reshape(N, 4, 3, B, WH), metrics, 1.0, 1.0,
                          0.0)
      return 0, jnp.max(p, axis=tuple(range(1, p.ndim)))

    _, mxs = jax.lax.scan(body_max, 0, x12_b)
    return x12_b, metrics, jnp.max(mxs, axis=0).reshape(N, 1, 1, 1)

  @_partial(jax.jit, static_argnames=("k0", "k1"))
  def chunk_vc(x12_b, metrics, max_out, k0, k1):
    merged = jnp.moveaxis(x12_b[k0:k1], 0, 2).reshape(
        N, 4, 3, (k1 - k0) * B, WH)
    p = reinhard_map_ca(merged, metrics, 1.0, 1.0, 0.0)
    p = p.astype(wd).reshape(N, 12, (k1 - k0) * B, WH)
    out12 = reinhard_gamma_ca(p, max_out, 1.0)
    return phases_to_planar(out12.reshape(N, 12, (k1 - k0) * B, WH))

  ssum = jax.jit(lambda o: jnp.sum(o, dtype=jnp.float32))
  half = NB // 2 + (NB % 2)

  def full_shipped(raws):
    merged, metrics, max_out = prog_shipped(raws)
    outs = [chunk_shipped(merged, max_out, 0, 1080),
            chunk_shipped(merged, max_out, 1080, HH)]
    return float(np.asarray(ssum(jnp.concatenate(outs, axis=2))))

  def full_va(raws):
    p_b, metrics, max_out = prog_va(raws)
    outs = [chunk_va(p_b, max_out, 0, half),
            chunk_va(p_b, max_out, half, NB)]
    return float(np.asarray(ssum(jnp.concatenate(outs, axis=2))))

  def full_vc(raws):
    x12_b, metrics, max_out = prog_vc(raws)
    outs = [chunk_vc(x12_b, metrics, max_out, 0, half),
            chunk_vc(x12_b, metrics, max_out, half, NB)]
    return float(np.asarray(ssum(jnp.concatenate(outs, axis=2))))

  for name, fn in (("shipped (merge + p chunks)", full_shipped),
                   ("V-A (p chunks, fold merge)", full_va),
                   ("V-C (no p, map in chunks)", full_vc)):
    try:
      _ = fn(raws)  # warm
      best = None
      for _ in range(REPS):
        t0 = time.perf_counter()
        _ = fn(raws)
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
      print(f"{name:30} {best * 1000.0:9.1f} ms/set", flush=True)
    except Exception as e:
      print(f"{name:30} FAIL {type(e).__name__}: {str(e)[:90]}",
            flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "variants":
  run_variants()
