"""Pallas TPU demosaic stencil.

The XLA conv formulation of the demosaic (ops/bayer.py) triggers XLA's
channel-minor convolution layouts, which pad the 12-channel output tiles
10-16x on TPU (measured on v5e) — the conv is correct but bandwidth- and
memory-bloated. This kernel computes the identical stencil as explicit
shift-multiply-accumulate over VMEM tiles with manually DMA'd halo reads,
keeping every buffer in its natural planar layout. Measured: whole-ISP
step 18.3 -> 12.7 ms at 6x4K f16 on one v5e chip, byte-identical output.

Constraints of the axon Mosaic toolchain (probed): f32 compute/IO only
(no f16/bf16/int kernels), no strided lane slices, block dims divisible
by (8, 128). The wrapper falls back to the XLA conv path off-TPU or for
untileable shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taichi_image_tpu.ops.pallas import q16

_HALO_R, _HALO_C = 4, 128
_VMEM_BUDGET = 12 * 1024 * 1024  # leaves headroom under the 16M VMEM


def _pick_tile(n: int, quantum: int, lo: int, hi: int):
  """Best tile (multiple of quantum in [lo, hi]) for covering n: prefer
  exact divisors (no waste), else the size minimizing padding waste."""
  best, best_waste = None, None
  for t in range(quantum, hi + 1, quantum):
    if t < lo:
      continue
    tiles = -(-n // t)
    waste = tiles * t - n
    if waste == 0:
      best, best_waste = t, 0
    elif best_waste != 0 and (best is None or waste <= best_waste):
      best, best_waste = t, waste  # ties -> larger tile, fewer DMAs
  return best


def tiling_for(hh: int, wh: int, sample_step: int = 0,
               in_bf16: bool = False, out_bf16: bool = False,
               extra_f32_tmp: int = 0):
  """(TR, TW) tile sizes, or None for shapes too small to tile.

  Arbitrary hh/wh are supported: the wrapper pads up to the tile grid
  and trims the output; tiles prefer exact divisors to minimize waste.

  ``sample_step`` > 0 constrains tiles so the kernel's subsampled second
  output still has Mosaic-legal (8, 128)-aligned blocks: TR a multiple of
  8*step and TW a multiple of 128*step.

  ``extra_f32_tmp``: budget for N additional (TR, TW) f32 temporaries the
  kernel body keeps live (the fused-tonemap variant's map arithmetic).
  """
  qr = 8 * max(sample_step, 1)
  qc = 128 * max(sample_step, 1)
  if hh < qr or wh < qc:
    return None
  tw = _pick_tile(wh, qc, qc, 768)
  if tw is None:
    return None
  tr = None
  in_bytes = 2 if in_bf16 else 4
  out_bytes = 2 if out_bf16 else 4
  for cand in range(qr, min(((hh + qr - 1) // qr) * qr, 256) + 1, qr):
    halo = 4 * (cand + 2 * _HALO_R) * (tw + 2 * _HALO_C)
    vmem = in_bytes * 2 * halo + out_bytes * 2 * (12 * cand * tw)
    if in_bf16:
      vmem += 4 * halo  # f32 conversion temporary
    vmem += extra_f32_tmp * 4 * cand * tw
    if vmem <= _VMEM_BUDGET and (tr is None or
                                 _waste(hh, cand) <= _waste(hh, tr)):
      tr = cand
  return (tr, tw) if tr else None


def _waste(n: int, t: int) -> int:
  return -(-n // t) * t - n


def _stencil_kernel(w12, inv_full, tr, tw, ni, nj, nt, sample_step,
                    finish, tonemap, q16_io, *refs):
  """Double-buffered halo stencil: while tile t computes, tile t+1's halo
  block is already in flight (DMA overlap measured +12%).

  When ``sample_step`` is set, the kernel additionally emits the
  stride-``sample_step`` subsample of output channels 0..2 (the metering
  sample grid), compacted via one-hot MXU dots — strided reads of the
  main output in XLA cost ~13 ms at 6x4K (minor-dim gather); this emits
  the same values for free alongside the stencil.

  When ``finish`` is set (a dict, see demosaic_stencil), the kernel also
  applies the exact drop-tap border renormalization (iota masks + the
  same factor arithmetic as ops/bayer.edge_renorm_factor), the optional
  fused 3x3 CCM, the [0, 1] clip, and the output-dtype cast — emitting
  the FINAL x12 instead of interior-normalized f32 numerators, which
  skips a ~1.2 GB/step XLA round trip at 6x4K.

  When ``tonemap`` is set (requires ``finish`` and no sample output),
  the kernel additionally quantizes the finished x12 to the output
  dtype IN-REGISTER (replicating the composed path's bf16
  materialization — the reference casts to the working dtype before the
  map, camera_isp.py:211-218) and applies the color_adapt == 0 Reinhard
  map (the same exp2/log2 math as ops/pallas/reinhard._bf16_kernel_dma)
  with per-tile max partials — emitting the pre-gamma ``p`` instead of
  x12, which skips the map kernel's full-res x12 read + write
  (~600 MB/step at 6x4K). Scalars arrive via SMEM: [m0, range, map_key,
  mean, exp(-intensity), light_adapt].
  """
  if tonemap:
    assert finish is not None and not sample_step
    hbm_ref, s_ref, out_ref, mx_ref, scratch, sems = refs
  elif sample_step:
    hbm_ref, rsel_ref, csel_ref, out_ref, samp_ref, scratch, sems = refs
  else:
    hbm_ref, out_ref, scratch, sems = refs
  t = pl.program_id(0)

  def src(tt):
    n = tt // (ni * nj)
    r = tt % (ni * nj)
    i = r // nj
    j = r % nj
    return hbm_ref.at[n, :, pl.ds(i * tr, tr + 2 * _HALO_R),
                      pl.ds(j * tw, tw + 2 * _HALO_C)]

  def dma(slot, tt):
    return pltpu.make_async_copy(src(tt), scratch.at[slot], sems.at[slot])

  @pl.when(t == 0)
  def _():
    dma(0, 0).start()

  @pl.when(t + 1 < nt)
  def _():
    dma((t + 1) % 2, t + 1).start()

  dma(t % 2, t).wait()
  if q16_io:
    # Camera16 fast path (ops/pallas/q16): the halo block is q12-packed
    # i32 words (phase 2c | phase 2c+1 << 16) — same DMA bytes as bf16.
    # Unpack to the 4 phase channels as f32 of the RAW 12-bit codes
    # (exact); the 1/4095 dequantization is folded into inv_full by the
    # wrapper (taps are linear in the input).
    w = scratch[t % 2]
    cur = jnp.stack([q16.unpack_lo(w[0]).astype(jnp.float32),
                     q16.unpack_hi(w[0]).astype(jnp.float32),
                     q16.unpack_lo(w[1]).astype(jnp.float32),
                     q16.unpack_hi(w[1]).astype(jnp.float32)])
  elif scratch.dtype == jnp.bfloat16:
    # bf16 input halves the halo-DMA traffic; compute stays f32
    # (bf16 -> f32 convert is exact, so values are bit-identical to the
    # f32-input path)
    cur = scratch[t % 2].astype(jnp.float32)
  else:
    cur = scratch.at[t % 2]

  if finish is not None:
    # global position iotas for the border-renorm masks
    r_blk = t % (ni * nj) // nj
    c_blk = t % (ni * nj) % nj
    rg = r_blk * tr + jax.lax.broadcasted_iota(jnp.int32, (tr, tw), 0)
    cg = c_blk * tw + jax.lax.broadcasted_iota(jnp.int32, (tr, tw), 1)
    hh_img, wh_img = finish["hh"], finish["wh"]
    topf, botf, leftf, rightf = (finish["topf"], finish["botf"],
                                 finish["leftf"], finish["rightf"])
    cvals = finish["cvals"]  # (4, 12): tl, tr, bl, br corrections
    ccm = finish["cc"]       # None or 3x3 numpy
    # top/bottom strips fire at the spec's kernel-frame rows (whole
    # image: 0 / hh-1; row bands: the band-local image-edge position or
    # -1 = never — see ops/bayer._stencil_finish_spec)
    on_top = rg == finish["top_row"]
    on_bot = rg == finish["bot_row"]
    on_left, on_right = cg == 0, cg == wh_img - 1
    masks = (on_top & on_left, on_top & on_right,
             on_bot & on_left, on_bot & on_right)

  def taps(oc):
    a = None
    for q in range(4):
      for u in range(3):
        for v in range(3):
          wgt = float(w12[oc, q, u, v])
          if wgt == 0.0:
            continue
          s = cur[q, _HALO_R - 1 + u:_HALO_R - 1 + u + tr,
                  _HALO_C - 1 + v:_HALO_C - 1 + v + tw] * wgt
          a = s if a is None else a + s
    return a * inv_full[oc]

  def emit_sample(oc, val):
    if sample_step and oc < 3:
      # HIGHEST precision: Mosaic's default f32 dot is bf16-reduced on
      # the MXU, which rounds the sampled values (caught on-chip by
      # tools/verify_tpu.py); bf16x3+ decomposition restores exactness.
      cols = jnp.dot(val, csel_ref[...],
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
      samp_ref[0, oc] = jnp.dot(rsel_ref[...], cols,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)

  def emit(oc, val):
    if finish is not None:
      out_ref[0, oc] = val.astype(out_ref.dtype)
    else:
      out_ref[0, oc] = val
    emit_sample(oc, val)

  if finish is None:
    for oc in range(12):
      emit(oc, taps(oc))
    return

  if tonemap:
    # grid-overhang mask: padded tiles must not pollute the max partial.
    # Masked positions contribute 0.0, which is EXACTLY equivalent to
    # excluding them: the gamma stage clamps max_out to >= 1e-6, so a
    # 0.0 only wins when every valid p is below 1e-6 — where the clamp
    # makes both paths produce the same max_out.
    valid = (rg < hh_img) & (cg < wh_img)
    m0, rng_s, mk = s_ref[0], s_ref[1], s_ref[2]
    mean_s, eni, la = s_ref[3], s_ref[4], s_ref[5]
    mx = None

  pend_code = None  # q16 output pairing: at most one channel buffered
  for p in range(4):
    vals = []
    for c in range(3):
      oc = 3 * p + c
      val = taps(oc)
      # same factor arithmetic & multiply order as edge_renorm_factor
      rvf = (jnp.where(on_top, jnp.float32(topf[oc]), 1.0)
             * jnp.where(on_bot, jnp.float32(botf[oc]), 1.0))
      cvv = (jnp.where(on_left, jnp.float32(leftf[oc]), 1.0)
             * jnp.where(on_right, jnp.float32(rightf[oc]), 1.0))
      f = rvf * cvv
      for k in range(4):
        f = jnp.where(masks[k], f * jnp.float32(cvals[k, oc]), f)
      vals.append(val * f)
    if ccm is not None:
      vals = [vals[0] * float(ccm[d, 0]) + vals[1] * float(ccm[d, 1])
              + vals[2] * float(ccm[d, 2]) for d in range(3)]
    if not tonemap:
      if q16_io:
        # Camera16 fast path: encode the finished channels as u16 codes
        # on the post-clip [0, 1] domain and write channel-pair words
        # (word w = ch 2w | ch 2w+1 << 16). Metering samples are taken
        # from the DEQUANTIZED codes so metering sees exactly the
        # values the map kernel will read (ops/pallas/q16 module note).
        codes = [q16.encode_x12(jnp.clip(v, 0.0, 1.0)) for v in vals]
        for c in range(3):
          emit_sample(3 * p + c, q16.decode_x12(codes[c]))
        if p % 2 == 0:
          out_ref[0, 3 * p // 2] = q16.pack_pair(codes[0], codes[1])
          pend_code = codes[2]
        else:
          out_ref[0, (3 * p - 1) // 2] = q16.pack_pair(pend_code,
                                                       codes[0])
          out_ref[0, (3 * p + 1) // 2] = q16.pack_pair(codes[1],
                                                       codes[2])
      else:
        for c in range(3):
          emit(3 * p + c, jnp.clip(vals[c], 0.0, 1.0))
      continue
    # quantize-then-map: the composed path materializes x12 in the
    # working dtype before the map kernel reads it — replicate that
    # rounding in-register so values stay bitwise-comparable
    q = [jnp.clip(v, 0.0, 1.0).astype(finish["out_dtype"])
         .astype(jnp.float32) for v in vals]
    rs = (q[0] - m0) / rng_s
    gs = (q[1] - m0) / rng_s
    bs = (q[2] - m0) / rng_s
    gray = 0.299 * rs + 0.587 * gs + 0.114 * bs
    adapt_mean = mean_s + la * (gray - mean_s)
    # exp2(k*log2(b)) pow lowering: same trade as the standalone map
    # kernel (ops/pallas/reinhard._bf16_kernel_dma) — <=1 bf16 ulp of
    # jnp.power, identical edge semantics (b<0 -> NaN -> zeroed)
    adapt = jnp.exp2(mk * jnp.log2(eni * adapt_mean))
    for c, scaled in ((0, rs), (1, gs), (2, bs)):
      pv = scaled * (1.0 / (adapt + scaled))
      pv = jnp.where(jnp.isnan(pv), 0.0, pv)
      tmax = jnp.max(jnp.where(valid, pv, 0.0))
      mx = tmax if mx is None else jnp.maximum(mx, tmax)
      out_ref[0, 3 * p + c] = pv.astype(out_ref.dtype)
  if tonemap:
    mx_ref[...] = jnp.broadcast_to(mx, (1, 8, 128))


def demosaic_stencil(phases_f32, weights: np.ndarray, tr: int, tw: int,
                     interpret: bool = False, sample_step: int = 0,
                     finish=None):
  """(N, 4, hh, wh) f32 OR bf16 phases -> (N, 12, hh, wh) f32 num/full
  (unclamped, interior-normalized). ``weights`` is the (12, 4, 3, 3)
  table. bf16 input is DMA'd as bf16 and converted in-kernel (exact;
  halves the input traffic vs pre-casting to f32).

  ``sample_step`` > 0 additionally returns the stride-``sample_step``
  row/col subsample of channels 0..2 (num/full values on the metering
  grid): ``(out, sample (N, 3, ceil(hh/s), ceil(wh/s)))``. Requires
  tr % sample_step == 0 and tw % sample_step == 0.

  ``finish``: optional dict {hh, wh, topf, botf, leftf, rightf, cvals,
  cc, out_dtype} — fuse border renorm + optional CCM + clip + cast
  in-kernel and emit the FINAL x12 (and final f32 samples) instead of
  numerators. Only valid for whole images (static borders).

  i32 input = the Camera16 fast path (ops/pallas/q16): ``phases_f32``
  is (N, 2, hh, wh) q12-packed raw codes; requires ``finish`` and
  returns (N, 6, hh, wh) q16-packed x12 codes (samples stay exact f32
  of the dequantized codes).
  """
  n, _, hh, wh = phases_f32.shape
  q16_io = phases_f32.dtype == jnp.int32
  assert not q16_io or finish is not None, "q16 input requires finish"
  ni, nj = -(-hh // tr), -(-wh // tw)
  nt = n * ni * nj
  # pad up to the tile grid plus halos; zero padding keeps the dropped-tap
  # renorm semantics, and the wrapper trims the grid overhang afterwards
  # (packed zero words decode to zero phases, so q16 padding is identical)
  padded = jnp.pad(phases_f32,
                   ((0, 0), (0, 0),
                    (_HALO_R, _HALO_R + ni * tr - hh),
                    (_HALO_C, _HALO_C + nj * tw - wh)))
  full = weights.sum(axis=(1, 2, 3))
  # q16: taps run on the RAW 12-bit codes; fold the 1/4095 dequantization
  # into the normalization (taps are linear in the input)
  inv_full = tuple(float(1.0 / s) * (q16.PH_INV if q16_io else 1.0)
                   for s in full)
  kernel = functools.partial(_stencil_kernel, weights, inv_full, tr, tw,
                             ni, nj, nt, sample_step, finish, False,
                             q16_io)

  def out_map(t):
    nn = t // (ni * nj)
    r = t % (ni * nj)
    return (nn, 0, r // nj, r % nj)

  out_dtype = finish["out_dtype"] if finish is not None else jnp.float32
  out_ch = 6 if q16_io else 12
  if q16_io:
    out_dtype = jnp.int32
  out_shapes = [jax.ShapeDtypeStruct((n, out_ch, ni * tr, nj * tw),
                                     out_dtype)]
  out_specs = [pl.BlockSpec((1, out_ch, tr, tw), out_map,
                            memory_space=pltpu.VMEM)]
  in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
  operands = [padded]
  if sample_step:
    s = sample_step
    # Mosaic block legality for the sample output: (tr/s, tw/s) must be
    # (8, 128)-aligned — guaranteed by tiling_for(hh, wh, sample_step)
    assert (tr // s) % 8 == 0 and (tw // s) % 128 == 0, (tr, tw, s)
    rsel = np.zeros((tr // s, tr), np.float32)
    rsel[np.arange(tr // s), np.arange(0, tr, s)] = 1.0
    csel = np.zeros((tw, tw // s), np.float32)
    csel[np.arange(0, tw, s), np.arange(tw // s)] = 1.0
    operands += [jnp.asarray(rsel), jnp.asarray(csel)]
    in_specs += [pl.BlockSpec((tr // s, tr), lambda t: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((tw, tw // s), lambda t: (0, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes.append(jax.ShapeDtypeStruct(
        (n, 3, ni * tr // s, nj * tw // s), jnp.float32))
    out_specs.append(pl.BlockSpec((1, 3, tr // s, tw // s), out_map,
                                  memory_space=pltpu.VMEM))

  res = pl.pallas_call(
      kernel,
      out_shape=out_shapes,
      grid=(nt,),
      in_specs=in_specs,
      out_specs=out_specs,
      scratch_shapes=[
          pltpu.VMEM((2, padded.shape[1], tr + 2 * _HALO_R,
                      tw + 2 * _HALO_C), phases_f32.dtype),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(*operands)
  out = res[0]
  if (ni * tr, nj * tw) != (hh, wh):
    out = out[:, :, :hh, :wh]
  if not sample_step:
    return out
  samp = res[1]
  hs, ws = -(-hh // sample_step), -(-wh // sample_step)
  if samp.shape[-2:] != (hs, ws):
    samp = samp[:, :, :hs, :ws]
  return out, samp


def pallas_available(hh: int, wh: int) -> bool:
  """True if the Pallas demosaic can run: TPU backend, tileable shape,
  not disabled via TAICHI_IMAGE_TPU_NO_PALLAS."""
  from taichi_image_tpu.ops.pallas import backend_enabled
  return backend_enabled() and tiling_for(hh, wh) is not None


def q16_tiling(hh: int, wh: int, sample_step: int = 0):
  """Tiling for the q16-packed stencil: halo bytes match bf16 (2 i32
  words carry 4 channels), output bytes match bf16 x12 (6 i32 words);
  the unpacked f32 halo temporary is budgeted like the bf16 convert."""
  return tiling_for(hh, wh, sample_step, in_bf16=True, out_bf16=True,
                    extra_f32_tmp=4)


def q16_available(hh: int, wh: int, sample_step: int = 0) -> bool:
  """True when the q16 stencil fast path can run (Camera16)."""
  from taichi_image_tpu.ops.pallas import backend_enabled
  return backend_enabled() and q16_tiling(hh, wh, sample_step) is not None


# Map-stage f32 temporaries the fused-tonemap kernel keeps live per tile
# (3 quantized channels + 3 scaled + gray + adapt), for VMEM budgeting.
_TONEMAP_TMPS = 8


def demosaic_reinhard_stencil(phases, weights: np.ndarray, tr: int,
                              tw: int, scal, finish,
                              interpret: bool = False):
  """Front-fused demosaic + Reinhard map: (N, 4, hh, wh) bf16/f32
  phases -> (pre-gamma ``p`` (N, 12, hh, wh) bf16, per-image f32 max
  (N, 1, 1, 1)).

  One kernel pass instead of demosaic-stencil -> x12 -> map-kernel: the
  map runs in-register on the finished (quantized) x12 values, skipping
  the x12 HBM round trip (~600 MB/step at 6x4K). Requires metrics to be
  known BEFORE the demosaic — callers feed the metering from the strided
  sample pre-pass (ops/bayer.demosaic_samples) instead of the kernel's
  sample emission. ``scal`` is the (6,) f32 SMEM vector
  [m0, range, map_key, mean, exp(-intensity), light_adapt]
  (build with ops/pallas/reinhard.reinhard_scal); ``finish`` is the
  _stencil_finish_spec dict (out_dtype = the quantization dtype the
  composed path would have materialized x12 in — bf16)."""
  n, _, hh, wh = phases.shape
  ni, nj = -(-hh // tr), -(-wh // tw)
  nt = n * ni * nj
  padded = jnp.pad(phases,
                   ((0, 0), (0, 0),
                    (_HALO_R, _HALO_R + ni * tr - hh),
                    (_HALO_C, _HALO_C + nj * tw - wh)))
  inv_full = tuple(float(1.0 / s) for s in weights.sum(axis=(1, 2, 3)))
  kernel = functools.partial(_stencil_kernel, weights, inv_full, tr, tw,
                             ni, nj, nt, 0, finish, True, False)

  def out_map(t):
    nn = t // (ni * nj)
    r = t % (ni * nj)
    return (nn, 0, r // nj, r % nj)

  def mx_map(t):
    nn = t // (ni * nj)
    r = t % (ni * nj)
    return (nn, r // nj, r % nj)

  p, mx = pl.pallas_call(
      kernel,
      out_shape=[
          jax.ShapeDtypeStruct((n, 12, ni * tr, nj * tw), jnp.bfloat16),
          jax.ShapeDtypeStruct((n, ni * 8, nj * 128), jnp.float32),
      ],
      grid=(nt,),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM)],
      out_specs=[
          pl.BlockSpec((1, 12, tr, tw), out_map,
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 8, 128), mx_map, memory_space=pltpu.VMEM),
      ],
      scratch_shapes=[
          pltpu.VMEM((2, 4, tr + 2 * _HALO_R, tw + 2 * _HALO_C),
                     phases.dtype),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(padded, scal)
  if (ni * tr, nj * tw) != (hh, wh):
    p = p[:, :, :hh, :wh]
  max_out = jnp.max(mx, axis=(1, 2))[:, None, None, None]
  return p, max_out


def front_fused_available(hh: int, wh: int, in_bf16: bool) -> bool:
  """True when the fused demosaic+Reinhard kernel can run AND the
  opt-in is set: TPU backend, ``TAICHI_IMAGE_TPU_FRONT_FUSED=1``, and a
  tiling that fits the map temporaries.

  OFF BY DEFAULT — probed on chip and REJECTED for the shipped step
  (tools/probe_front.py, tools/probe_front2.py, 6x4K bf16 same-run):
  the full front route measures 14.0 ms vs 7.3 composed, and even
  kernel-to-kernel the fusion is a wash (5.85 vs 5.59 ms) — the p
  output write dominates both formulations, the map kernel's x12 read
  was already hidden by DMA double-buffering, and the route pays ~2 ms
  extra for the strided-conv metering sample pre-pass (the in-kernel
  sample emission is circular when the map needs this frame's metrics
  before the stencil runs). Values are bitwise-equal to the composed
  kernels (front_fused_kernel_bitwise_onchip), so the kernel stays as
  a verified alternative behind the env opt-in."""
  import os
  from taichi_image_tpu.ops.pallas import backend_enabled
  return (os.environ.get("TAICHI_IMAGE_TPU_FRONT_FUSED", "") == "1"
          and backend_enabled()
          and tiling_for(hh, wh, in_bf16=in_bf16, out_bf16=True,
                         extra_f32_tmp=_TONEMAP_TMPS) is not None)
