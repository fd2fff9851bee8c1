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
  return best


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

  times = {}
  for key, name, fn in (
      ("decode", "decode only", lambda r: bands_a(r, "decode")),
      ("a", "A (fused demosaic)", lambda r: bands_a(r, "a")),
      ("meter", "A + metering", lambda r: bands_a(r, "meter")),
      ("c", "A + C (map kernel)", lambda r: bands_a(r, "c")),
  ):
    if want and not any(w.lower() in name.lower() for w in want):
      continue
    try:
      times[key] = timed(name, fn, raws)
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
    times["full"] = best
  return times


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


# --- roofline (run as: python tools/probe_large2.py roofline)
#
# Round-4 VERDICT #1: the "practical floor" claim for the 6x8K finish
# must be proven against a MEASURED same-session, same-shape copy
# ceiling, not remembered rates. This measures
#   (1) chained-op ceilings: bf16 HBM copy, the merge 6-d transpose,
#       and the quantize+interleave op family, at the finish's own
#       shapes (K-chained inside one jit, optimization_barrier between
#       chained ops so transpose pairs cannot cancel, distinct xor byte
#       per iteration, scalar-checksum consumption; rate from the
#       (K_hi - K_lo)-iteration time delta so dispatch+fetch overhead
#       nets out);
#   (2) the shipped finish split into merge vs chunk marginals via
#       cross-program pairs (program boundaries force materialization,
#       standalone sum-consumption costs measured and subtracted);
# and prints the stage | bytes | GB/s | %copy-ceiling table.

def _chained_rate(name, x0, op, bytes_per_iter, k_lo=2, k_hi=10):
  from jax import lax

  def make(k):
    cs = jnp.arange(1, k + 1, dtype=jnp.uint16)

    @jax.jit
    def run(x):
      def body(carry, c):
        x, acc = carry
        y = op(x, c)
        y = lax.optimization_barrier(y)
        # consume EVERY element per iteration: a single-element
        # consumption lets XLA slice the whole loop down to a scalar
        # chain (measured: "negative" copy time) — the sum fuses into
        # the producing pass so it adds no extra traffic
        acc = acc + jnp.sum(y, dtype=jnp.float32)
        return (y, acc), None

      (xf, acc), _ = lax.scan(body, (x, jnp.float32(0)), cs)
      return acc + xf.reshape(-1)[-1].astype(jnp.float32)

    return run

  f_lo, f_hi = make(k_lo), make(k_hi)
  for f in (f_lo, f_hi):
    jax.block_until_ready(f(x0))
  best = None
  for _ in range(REPS):
    t0 = time.perf_counter()
    _ = float(np.asarray(f_lo(x0)))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(np.asarray(f_hi(x0)))
    t_hi = time.perf_counter() - t0
    d = (t_hi - t_lo) / (k_hi - k_lo)
    best = d if best is None else min(best, d)
  gbps = bytes_per_iter / best / 1e9
  print(f"{name:36} {best * 1000:8.2f} ms/iter {gbps:7.1f} GB/s",
        flush=True)
  return gbps


def _xorb(x, c):
  from jax import lax
  return lax.bitcast_convert_type(
      lax.bitcast_convert_type(x, jnp.uint16) ^ c, jnp.bfloat16)


def _planar_to_phases_fast(d):
  """(N, 3, H, W) -> (N, 12, hh, wh), reshape-based (the library inverse
  uses full-res strided slices — the measured gather pathology — which
  would wreck a rate measurement)."""
  n, _, h, w = d.shape
  r = d.reshape(n, 3, h // 2, 2, w // 2, 2)
  t = r.transpose(0, 5, 3, 1, 2, 4)
  return t.reshape(n, 12, h // 2, w // 2)


def run_roofline():
  from jax import lax
  from taichi_image_tpu.ops.bayer import phases_to_planar
  from taichi_image_tpu.models.camera_isp import reinhard_gamma_ca

  rng = np.random.default_rng(0)
  GB = 1e9

  print("== chained-op ceilings (same shapes as the 8K finish) ==",
        flush=True)
  # 1. bf16 elementwise copy ceiling at the merged-p shape (1.19 GB)
  xm = jax.device_put(
      rng.standard_normal((N, 12, HH, WH)).astype(jnp.bfloat16))
  copy_gbps = _chained_rate("bf16 xor copy (6,12,2160,3840)", xm,
                            _xorb, 2 * xm.nbytes)

  # 2. the merge 6-d transpose (stacked scan ys -> contiguous rows),
  # forward+inverse per iteration with a barrier between (else they
  # cancel); bytes = 2 transposes x (R+W)
  xs = jax.device_put(rng.standard_normal(
      (NB, N, 12, B, WH)).astype(jnp.bfloat16))

  def t_op(x, c):
    y = jnp.moveaxis(_xorb(x, c), 0, 2).reshape(N, 12, HH, WH)
    y = lax.optimization_barrier(y)
    return jnp.moveaxis(y.reshape(N, 12, NB, B, WH), 2, 0)

  tr_gbps = _chained_rate("merge transpose fwd+inv", xs, t_op,
                          4 * xs.nbytes)

  # 3. the chunk op family: quantize+interleave down, dequant+deinterleave
  # up (barrier between), at the shipped chunk extent (1080 phase rows)
  xc = jax.device_put(rng.standard_normal(
      (N, 12, 1080, WH)).astype(jnp.bfloat16))

  def i_op(x, c):
    q = jnp.clip(_xorb(x, c).astype(jnp.float32) * 255.0, 0,
                 255).astype(jnp.uint8)
    d = phases_to_planar(q)
    d = lax.optimization_barrier(d)
    return (_planar_to_phases_fast(d).astype(jnp.float32) *
            jnp.float32(1 / 255)).astype(jnp.bfloat16)

  il_bytes = 2 * (xc.nbytes + xc.nbytes // 2)  # down R+W, up R+W
  il_gbps = _chained_rate("quantize+interleave roundtrip", xc, i_op,
                          il_bytes)

  print("== shipped finish split (cross-program marginals) ==",
        flush=True)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  weights = _demosaic_tables(BayerPattern.RGGB, "mhc")
  wd = types.bf16
  prev = jnp.zeros(9, jnp.float32)
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

  @jax.jit
  def prog_pb(raws):
    x12_b, metrics = scan_a_meter(raws)
    p_b, max_out = scan_map(x12_b, metrics)
    return p_b, metrics, max_out

  @jax.jit
  def prog_merged(raws):
    x12_b, metrics = scan_a_meter(raws)
    p_b, max_out = scan_map(x12_b, metrics)
    merged = jnp.moveaxis(p_b, 0, 2).reshape(N, 12, HH, WH)
    return merged, metrics, max_out

  from functools import partial as _partial

  @_partial(jax.jit, static_argnames=("r0", "r1"))
  def chunk_shipped(merged, max_out, r0, r1):
    from taichi_image_tpu.ops.bayer import phases_to_planar as p2p
    out12 = reinhard_gamma_ca(merged[:, :, r0:r1], max_out, 1.0)
    return p2p(out12.reshape(N, 12, r1 - r0, WH))

  ssum = jax.jit(lambda o: jnp.sum(o, dtype=jnp.float32))

  def t_best(fn):
    fn()  # warm
    best = None
    for _ in range(REPS):
      t0 = time.perf_counter()
      fn()
      el = time.perf_counter() - t0
      best = el if best is None else min(best, el)
    return best

  # standalone sum-consumption costs (to subtract from the pairs)
  big_u8 = jax.device_put(rng.integers(0, 256, size=(N, 3, H, WH),
                                       dtype=np.uint8))  # 298 MB chunk out
  s_bf16 = t_best(lambda: float(np.asarray(ssum(xm))))
  s_u8 = t_best(lambda: float(np.asarray(ssum(big_u8))))
  print(f"{'ssum bf16 1.19GB':36} {s_bf16 * 1000:8.2f} ms", flush=True)
  print(f"{'ssum u8 298MB':36} {s_u8 * 1000:8.2f} ms", flush=True)

  def pair_pb():
    p_b, m, mx = prog_pb(raws)
    return float(np.asarray(ssum(p_b)))

  def pair_merged():
    merged, m, mx = prog_merged(raws)
    return float(np.asarray(ssum(merged)))

  def pair_full():
    merged, m, mx = prog_merged(raws)
    o0 = chunk_shipped(merged, mx, 0, 1080)
    o1 = chunk_shipped(merged, mx, 1080, HH)
    return float(np.asarray(ssum(o0))) + float(np.asarray(ssum(o1)))

  t_pb = t_best(pair_pb)
  t_merged = t_best(pair_merged)
  t_full = t_best(pair_full)
  print(f"{'prog(p_b) + ssum':36} {t_pb * 1000:8.2f} ms", flush=True)
  print(f"{'prog(merged) + ssum':36} {t_merged * 1000:8.2f} ms",
        flush=True)
  print(f"{'prog(merged) + chunks + ssums':36} {t_full * 1000:8.2f} ms",
        flush=True)

  merge_ms = (t_merged - t_pb) * 1000
  chunk_ms = (t_full - t_merged + s_bf16 - 2 * s_u8) * 1000
  pb_bytes = float(xs.nbytes)
  merge_gb = 2 * pb_bytes / GB          # transpose R bf16 + W bf16
  chunk_gb = 1.5 * pb_bytes / GB        # chunks R bf16 + W u8 (half)

  print("== roofline table (6x8K finish) ==", flush=True)
  print(f"{'stage':28} {'ms':>8} {'GB':>7} {'GB/s':>8} {'%copy':>7}",
        flush=True)
  for nm, ms, gb in (
      ("merge transpose", merge_ms, merge_gb),
      ("gamma+quantize+interleave", chunk_ms, chunk_gb),
  ):
    rate = gb / (ms / 1000) if ms > 0 else float("inf")
    print(f"{nm:28} {ms:8.1f} {gb:7.2f} {rate:8.1f} "
          f"{100 * rate / copy_gbps:6.1f}%", flush=True)
  print(f"ceilings: copy {copy_gbps:.1f}  transpose {tr_gbps:.1f}  "
        f"interleave {il_gbps:.1f} GB/s", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "roofline":
  run_roofline()


# --- finish-closing race (run as: python tools/probe_large2.py close)
#
# Roofline finding: the finish's 91.8 ms marginal is ~all in the chunk
# programs' gamma+quantize+INTERLEAVE, which moves ~22 GB/s — and a
# standalone chained quantize+interleave roundtrip confirms ~20 GB/s is
# the 6-d-transpose op family's rate on this toolchain (the merge
# transpose inside one program is nearly free, ~4 ms). Candidates here
# reformulate the interleave as minor-dim-2 STACKS (lane interleave via
# stack(..., axis=-1).reshape, sublane via axis=-2) — the same
# windowed-copy pattern subsample_hw exploits in reverse — and vary the
# chunk count.

def _phases_to_planar_stack(x12):
  n, _, hh, wh = x12.shape
  x = x12.reshape(n, 2, 2, 3, hh, wh)  # (n, pc, pr, c, hh, wh)

  def cols(pr):
    return jnp.stack([x[:, 0, pr], x[:, 1, pr]], axis=-1).reshape(
        n, 3, hh, 2 * wh)

  return jnp.stack([cols(0), cols(1)], axis=-2).reshape(
      n, 3, 2 * hh, 2 * wh)


def run_close():
  from jax import lax
  from functools import partial as _partial
  from taichi_image_tpu.ops.bayer import phases_to_planar
  from taichi_image_tpu.models.camera_isp import reinhard_gamma_ca

  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  weights = _demosaic_tables(BayerPattern.RGGB, "mhc")
  wd = types.bf16
  prev = jnp.zeros(9, jnp.float32)
  tiles = pallas_dm.tiling_for(B + 2, WH, in_bf16=True, out_bf16=True)

  # value check first (CPU-verified too, but cheap to pin here): the
  # stack interleave must equal the shipped 6-d transpose bitwise
  probe = jnp.asarray(
      rng.integers(0, 256, size=(1, 12, 8, 256), dtype=np.uint8))
  a = np.asarray(jax.jit(phases_to_planar)(probe))
  b = np.asarray(jax.jit(_phases_to_planar_stack)(probe))
  assert (a == b).all(), "stack interleave mismatch"
  print("stack interleave == 6-d transpose (bitwise)", flush=True)

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

  @jax.jit
  def prog_merged(raws):
    x12_b, metrics = scan_a_meter(raws)

    def body(_, x):
      return 0, reinhard_map_bf16_dma(x, metrics, 1.0, 1.0)

    _, (p_b, mx_b) = jax.lax.scan(body, 0, x12_b)
    merged = jnp.moveaxis(p_b, 0, 2).reshape(N, 12, HH, WH)
    return merged, metrics, jnp.max(mx_b, axis=0)

  @_partial(jax.jit, static_argnames=("r0", "r1", "form"))
  def chunk(merged, max_out, r0, r1, form):
    out12 = reinhard_gamma_ca(merged[:, :, r0:r1], max_out, 1.0)
    out12 = out12.reshape(N, 12, r1 - r0, WH)
    if form == "transpose6":
      return phases_to_planar(out12)
    return _phases_to_planar_stack(out12)

  ssum = jax.jit(lambda o: jnp.sum(o, dtype=jnp.float32))

  def t_best(fn):
    fn()
    best = None
    for _ in range(REPS):
      t0 = time.perf_counter()
      fn()
      el = time.perf_counter() - t0
      best = el if best is None else min(best, el)
    return best

  def full(form, n_chunks):
    rows = HH // n_chunks

    def go():
      merged, m, mx = prog_merged(raws)
      acc = 0.0
      outs = [chunk(merged, mx, i * rows, (i + 1) * rows, form)
              for i in range(n_chunks)]
      for o in outs:
        acc += float(np.asarray(ssum(o)))
      return acc

    return go

  for name, fn in (
      ("shipped: transpose6 x2 chunks", full("transpose6", 2)),
      ("stack x2 chunks", full("stack", 2)),
      ("stack x4 chunks", full("stack", 4)),
      ("stack x8 chunks", full("stack", 8)),
      ("transpose6 x8 chunks", full("transpose6", 8)),
  ):
    try:
      t = t_best(fn)
      print(f"{name:32} {t * 1000:9.1f} ms/set", flush=True)
    except Exception as e:
      print(f"{name:32} FAIL {type(e).__name__}: {str(e)[:90]}",
            flush=True)

  # op-family ceiling for the stack form (chained roundtrip, chunk extent)
  xc = jax.device_put(rng.standard_normal(
      (N, 12, 1080, WH)).astype(jnp.bfloat16))

  def i_op(x, c):
    q = jnp.clip(_xorb(x, c).astype(jnp.float32) * 255.0, 0,
                 255).astype(jnp.uint8)
    d = _phases_to_planar_stack(q)
    d = lax.optimization_barrier(d)
    r = d.reshape(N, 3, 1080, 2, WH, 2)
    back = jnp.concatenate(
        [r[:, :, :, pr, :, pc] for pc in (0, 1) for pr in (0, 1)],
        axis=1)
    return (back.astype(jnp.float32) * jnp.float32(1 / 255)
            ).astype(jnp.bfloat16)

  _chained_rate("stack quant+interleave roundtrip", xc, i_op,
                2 * (xc.nbytes + xc.nbytes // 2))


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "close":
  run_close()
