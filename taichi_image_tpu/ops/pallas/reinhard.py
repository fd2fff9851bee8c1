"""Pallas TPU Reinhard-map kernel.

Computes the pre-gamma Reinhard map p = scaled / (adapt + scaled) with
the color_adapt == 0 per-pixel adapt specialization (see
models/camera_isp.reinhard_map_ca) plus per-tile max partials, reading
x12 in an f32 container (f16-quantized values — Mosaic cannot read f16).
XLA's elementwise passes move ~60-180 GB/s on this machine while Pallas
DMA moves ~327 GB/s (docs/PERFORMANCE.md), so the bandwidth-bound map
stage benefits from running in-kernel.

Scalars arrive via SMEM, precomputed in XLA so their arithmetic (incl.
map_key's pow and exp(-intensity)) matches the XLA path exactly; the
in-kernel pow may differ from XLA's lowering by ulps (documented — the
fused-vs-composed parity tests allow <=1 u8 count on this path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_VMEM_BUDGET = 12 * 1024 * 1024


def reinhard_tiling(hh: int, wh: int):
  """(TR, TW) for the (1, 12, TR, TW) blocks, or None. Exact divisors
  only (padding would corrupt the max partials)."""
  if hh < 8 or wh < 128:
    return None
  tw = None
  for cand in range(128, min(wh, 1024) + 1, 128):
    if wh % cand == 0:
      tw = cand
  if tw is None:
    return None
  tr = None
  for cand in range(8, min(hh, 256) + 1, 8):
    if hh % cand != 0:
      continue
    vmem = 4 * 12 * cand * tw * 2 * 2  # in+out blocks, double-buffered
    if vmem <= _VMEM_BUDGET:
      tr = cand
  return (tr, tw) if tr else None


def reinhard_scal(metrics, intensity, light_adapt):
  """The (6,) f32 SMEM scalar vector every Reinhard map kernel takes:
  [m0, range, map_key, mean, exp(-intensity), light_adapt]. Computed in
  XLA so map_key's pow and exp(-intensity) match the XLA path exactly."""
  m = metrics
  key = (m[3] - m[4]) / (m[3] - m[2])
  map_key = 0.3 + 0.7 * jnp.power(key, 1.4)
  return jnp.stack([m[0], m[1] - m[0], map_key, m[5],
                    jnp.exp(-jnp.float32(intensity)),
                    jnp.float32(light_adapt)])


def reinhard_scal_ca(metrics, intensity, light_adapt, color_adapt):
  """The (10,) SMEM vector for the color_adapt > 0 kernel mode:
  reinhard_scal's six plus [color_adapt, cmeanR, cmeanG, cmeanB] where
  cmean_c = lerp(color_adapt, mean, channel_mean_c) — the per-channel
  half of the reference's adapt chain that depends only on metering
  (models/camera_isp.reinhard_map_ca ca>0 branch; reference
  tonemap.py's color/light lerp tree). Precomputed in XLA so the lerp
  arithmetic matches the XLA path exactly."""
  m = metrics
  base = reinhard_scal(metrics, intensity, light_adapt)
  ca = jnp.float32(color_adapt)
  cmean = m[5] + ca * (m[6:9] - m[5])
  return jnp.concatenate([base, ca[None], cmean])


def _kernel(x_ref, s_ref, p_ref, mx_ref):
  """x_ref (1, 12, tr, tw) f32; s_ref SMEM (6,):
  [m0, range, map_key, mean(m5), exp(-intensity), light_adapt]."""
  m0, rng, mk, mean, eni, la = (s_ref[0], s_ref[1], s_ref[2], s_ref[3],
                                s_ref[4], s_ref[5])
  mx = None
  for k in range(4):
    r = (x_ref[0, 3 * k + 0] - m0) / rng
    g = (x_ref[0, 3 * k + 1] - m0) / rng
    b = (x_ref[0, 3 * k + 2] - m0) / rng
    gray = 0.299 * r + 0.587 * g + 0.114 * b
    # lerp(la, mean, gray) with the same expression as utils.bounds.lerp
    adapt_mean = mean + la * (gray - mean)
    adapt = jnp.power(eni * adapt_mean, mk)
    for c, scaled in ((0, r), (1, g), (2, b)):
      p = scaled * (1.0 / (adapt + scaled))
      p = jnp.where(jnp.isnan(p), 0.0, p)
      p_ref[0, 3 * k + c] = p
      t = jnp.max(p)
      mx = t if mx is None else jnp.maximum(mx, t)
  mx_ref[...] = jnp.broadcast_to(mx, (1, 8, 128))


def reinhard_map_pallas(x12_f32, metrics, intensity, light_adapt,
                        interpret: bool = False):
  """(N, 12, hh, wh) f32 (f16-quantized values) -> (p f32 same shape,
  per-image max (N, 1, 1, 1, 1) ready for reinhard_gamma_ca on the
  (N, 4, 3, hh, wh) view).

  Only the color_adapt == 0.0 specialization is implemented (the
  reference default; other values use the XLA path).
  """
  n, _, hh, wh = x12_f32.shape
  tiles = reinhard_tiling(hh, wh)
  assert tiles is not None, (hh, wh)
  tr, tw = tiles
  ni, nj = hh // tr, wh // tw

  m = metrics
  key = (m[3] - m[4]) / (m[3] - m[2])
  map_key = 0.3 + 0.7 * jnp.power(key, 1.4)
  scal = jnp.stack([m[0], m[1] - m[0], map_key, m[5],
                    jnp.exp(-jnp.float32(intensity)),
                    jnp.float32(light_adapt)])

  p, mx = pl.pallas_call(
      _kernel,
      out_shape=[
          jax.ShapeDtypeStruct((n, 12, hh, wh), jnp.float32),
          jax.ShapeDtypeStruct((n, ni * 8, nj * 128), jnp.float32),
      ],
      grid=(n, ni, nj),
      in_specs=[
          pl.BlockSpec((1, 12, tr, tw), lambda a, i, j: (a, 0, i, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pltpu.SMEM),
      ],
      out_specs=[
          pl.BlockSpec((1, 12, tr, tw), lambda a, i, j: (a, 0, i, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 8, 128), lambda a, i, j: (a, i, j),
                       memory_space=pltpu.VMEM),
      ],
      interpret=interpret,
  )(x12_f32, scal)
  max_out = jnp.max(mx, axis=(1, 2))[:, None, None, None, None]
  return p, max_out


def bf16_tiling(hh: int, wh: int, nc: int = 12):
  """(TR, TW) for (1, nc, TR, TW) bf16 blocks of the bf16 DMA kernel.
  Exact divisors only (padding would corrupt the max partials); prefers
  full-width tiles (contiguous per-plane DMA)."""
  if hh < 8 or wh < 128:
    return None
  budget = 8 * 1024 * 1024
  # tile widths must be 128-lane multiples: Mosaic rejects DMA slices
  # whose lane extent is not tiling-aligned, even full-dim ones
  for tw in sorted({w for w in range(128, min(wh, 1920) + 1, 128)
                    if wh % w == 0}, reverse=True):
    best_tr = None
    for tr in range(8, min(hh, 512) + 1, 8):
      if hh % tr:
        continue
      # bf16 scratch (2 slots) + bf16 out block (double-buffered)
      vmem = 2 * nc * tr * tw * 2 * 2
      if vmem <= budget:
        best_tr = tr
    if best_tr:
      return (best_tr, tw)
  return None


def _bf16_kernel_dma(tr, tw, ni, nj, nt, ng, ca_mode, hbm_ref, s_ref,
                     p_ref, mx_ref, scratch, sems):
  """Manual double-buffered DMA Reinhard map on bf16 I/O: reads (1, 12,
  tr, tw) bf16 tiles of x12, converts to f32 in-VMEM, writes the bf16
  p (pre-gamma map) plus per-tile f32 max partials. Same math as
  :func:`_kernel`; bf16 halves HBM traffic vs the f32 container and
  skips the f16-bit emulation the packed variant needs.

  Gamma stays OUT of this kernel deliberately: the kernel is VPU-bound
  (one exp2+log2 per pixel already), so an in-kernel q = p^(1/gamma)
  (3 more transcendentals per pixel) measured the same or slower than
  the XLA finish once that finish uses exp2(log2(x)*c) instead of
  jnp.power — 4.27 vs 4.23 ms tail at 6x4K (probed round 3; the
  jnp.power finish was the +1.35 ms outlier at 5.50)."""
  t = pl.program_id(0)

  def src(tt):
    a = tt // (ni * nj)
    r = tt % (ni * nj)
    return hbm_ref.at[a, :, pl.ds((r // nj) * tr, tr),
                      pl.ds((r % nj) * tw, tw)]

  def dma(slot, tt):
    return pltpu.make_async_copy(src(tt), scratch.at[slot], sems.at[slot])

  @pl.when(t == 0)
  def _():
    dma(0, 0).start()

  @pl.when(t + 1 < nt)
  def _():
    dma((t + 1) % 2, t + 1).start()

  dma(t % 2, t).wait()
  cur = scratch.at[t % 2]

  m0, rng, mk, mean, eni, la = (s_ref[0], s_ref[1], s_ref[2], s_ref[3],
                                s_ref[4], s_ref[5])
  mx = None
  for k in range(ng):
    r = (cur[3 * k + 0].astype(jnp.float32) - m0) / rng
    g = (cur[3 * k + 1].astype(jnp.float32) - m0) / rng
    b = (cur[3 * k + 2].astype(jnp.float32) - m0) / rng
    gray = 0.299 * r + 0.587 * g + 0.114 * b
    if not ca_mode:
      adapt_mean = mean + la * (gray - mean)
      # exp2(k*log2(b)) instead of pow: ~9% faster on the VPU (4.66 ->
      # 4.25 ms standalone at 6x4K) with identical edge semantics
      # (b<0 -> NaN -> zeroed; b=0 -> 0) and <=1 bf16 ulp of pow — inside
      # the documented <=1 u8 count contract vs the XLA path.
      adapt = jnp.exp2(mk * jnp.log2(eni * adapt_mean))
    else:
      ca = s_ref[6]
    for c, scaled in ((0, r), (1, g), (2, b)):
      if ca_mode:
        # per-channel adapt (reference ca > 0 branch,
        # models/camera_isp.reinhard_map_ca): lerp(ca, gray, scaled)
        # then lerp(la, cmean_c, .) with cmean_c precomputed in SMEM —
        # 3 transcendental chains per pixel instead of 1.
        adapt_color = gray + ca * (scaled - gray)
        adapt_mean = s_ref[7 + c] + la * (adapt_color - s_ref[7 + c])
        adapt = jnp.exp2(mk * jnp.log2(eni * adapt_mean))
      p = scaled * (1.0 / (adapt + scaled))
      p = jnp.where(jnp.isnan(p), 0.0, p)
      tmax = jnp.max(p)
      mx = tmax if mx is None else jnp.maximum(mx, tmax)
      p_ref[0, 3 * k + c] = p.astype(jnp.bfloat16)
  mx_ref[...] = jnp.broadcast_to(mx, (1, 8, 128))


def reinhard_map_bf16_dma(x_bf16, metrics, intensity, light_adapt,
                          color_adapt: float = 0.0,
                          interpret: bool = False):
  """(N, C, hh, wh) bf16 (C % 3 == 0: phase-RGB x12 or planar RGB) ->
  (p bf16 same shape, per-image f32 max (N, 1, 1, 1)). The max is taken
  over the f32 p BEFORE the bf16 cast (reference max-before-cast
  semantics, camera_isp.py:177-218). ``color_adapt`` must be a static
  Python float; 0.0 (the reference default) runs the one-adapt-per-
  pixel specialization, > 0 the per-channel chain (round 5)."""
  n, nc, hh, wh = x_bf16.shape
  assert nc % 3 == 0, nc
  ng = nc // 3
  ca_mode = float(color_adapt) != 0.0
  tiles = bf16_tiling(hh, wh, nc)
  assert tiles is not None, (hh, wh)
  tr, tw = tiles
  ni, nj = hh // tr, wh // tw
  nt = n * ni * nj

  scal = (reinhard_scal_ca(metrics, intensity, light_adapt, color_adapt)
          if ca_mode else reinhard_scal(metrics, intensity, light_adapt))

  def out_map(t):
    a = t // (ni * nj)
    r = t % (ni * nj)
    return (a, 0, r // nj, r % nj)

  def mx_map(t):
    a = t // (ni * nj)
    r = t % (ni * nj)
    return (a, r // nj, r % nj)

  p, mx = pl.pallas_call(
      functools.partial(_bf16_kernel_dma, tr, tw, ni, nj, nt, ng,
                        ca_mode),
      out_shape=[
          jax.ShapeDtypeStruct((n, nc, hh, wh), jnp.bfloat16),
          jax.ShapeDtypeStruct((n, ni * 8, nj * 128), jnp.float32),
      ],
      grid=(nt,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec(memory_space=pltpu.SMEM),
      ],
      out_specs=[
          pl.BlockSpec((1, nc, tr, tw), out_map, memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 8, 128), mx_map, memory_space=pltpu.VMEM),
      ],
      scratch_shapes=[
          pltpu.VMEM((2, nc, tr, tw), jnp.bfloat16),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(x_bf16, scal)
  max_out = jnp.max(mx, axis=(1, 2))[:, None, None, None]
  return p, max_out


def reinhard_bf16_available(nc: int, hh: int, wh: int) -> bool:
  """True when the bf16 manual-DMA map kernel can run: TPU backend, the
  off-switch unset, C a multiple of 3, and an exact-divisor tiling."""
  from taichi_image_tpu.ops.pallas import backend_enabled
  return (backend_enabled() and nc % 3 == 0
          and bf16_tiling(hh, wh, nc) is not None)


def packed_tiling(hh: int, wh: int):
  """(TR, TW) for (1, 6, TR, TW) i32 blocks of the packed kernel. Exact
  divisors only; sized so the ~12 unpacked f32 plane temporaries fit
  scoped VMEM."""
  if hh < 8 or wh < 128:
    return None
  best = None
  for tw in range(128, min(wh, 768) + 1, 128):
    if wh % tw:
      continue
    for tr in range(8, min(hh, 160) + 1, 8):
      if hh % tr:
        continue
      # in+out i32 blocks double-buffered + ~14 f32 plane temporaries
      vmem = 6 * tr * tw * 4 * 4 + 14 * tr * tw * 4
      if vmem <= 8 * 1024 * 1024:
        best = (tr, tw)
  return best


def _packed_kernel(x_ref, s_ref, p_ref, mx_ref):
  """x_ref (1, 6, tr, tw) i32 = channel-pair-packed f16 x12; outputs the
  same packing of the f16-cast p, plus the per-tile max of the UNCAST
  f32 p (reference semantics: max over p before the working-dtype cast,
  camera_isp.py:211-218)."""
  from taichi_image_tpu.ops.pallas import f16pack
  m0, rng, mk, mean, eni, la = (s_ref[0], s_ref[1], s_ref[2], s_ref[3],
                                s_ref[4], s_ref[5])
  mx = None
  bits_all = [None] * 12
  for k in range(4):  # phases; channels 3k..3k+2 packed across words
    ch = []
    for c in range(3):
      idx = 3 * k + c
      w = x_ref[0, idx // 2]
      bits = (w >> 16) & 0xFFFF if idx % 2 else w & 0xFFFF
      ch.append(f16pack.f16_bits_to_f32(bits))
    scaled = [(v - m0) / rng for v in ch]
    gray = 0.299 * scaled[0] + 0.587 * scaled[1] + 0.114 * scaled[2]
    adapt_mean = mean + la * (gray - mean)
    adapt = jnp.power(eni * adapt_mean, mk)
    for c in range(3):
      p = scaled[c] * (1.0 / (adapt + scaled[c]))
      p = jnp.where(jnp.isnan(p), 0.0, p)
      t = jnp.max(p)
      mx = t if mx is None else jnp.maximum(mx, t)
      bits_all[3 * k + c] = f16pack.f32_to_f16_bits(p)
  for word in range(6):
    p_ref[0, word] = bits_all[2 * word] | (bits_all[2 * word + 1] << 16)
  mx_ref[...] = jnp.broadcast_to(mx, (1, 8, 128))


def _packed_kernel_dma(tr, tw, ni, nj, nt, hbm_ref, s_ref, p_ref, mx_ref,
                       scratch, sems):
  """Manual double-buffered DMA variant of :func:`_packed_kernel` —
  Blocked-spec input pipelining moves only ~128 GB/s on this machine
  while manual DMA reaches ~346 GB/s (docs/PERFORMANCE.md)."""
  from taichi_image_tpu.ops.pallas import f16pack
  t = pl.program_id(0)

  def src(tt):
    a = tt // (ni * nj)
    r = tt % (ni * nj)
    return hbm_ref.at[a, :, pl.ds((r // nj) * tr, tr),
                      pl.ds((r % nj) * tw, tw)]

  def dma(slot, tt):
    return pltpu.make_async_copy(src(tt), scratch.at[slot], sems.at[slot])

  @pl.when(t == 0)
  def _():
    dma(0, 0).start()

  @pl.when(t + 1 < nt)
  def _():
    dma((t + 1) % 2, t + 1).start()

  dma(t % 2, t).wait()
  cur = scratch.at[t % 2]

  m0, rng, mk, mean, eni, la = (s_ref[0], s_ref[1], s_ref[2], s_ref[3],
                                s_ref[4], s_ref[5])
  mx = None
  bits_all = [None] * 12
  for k in range(4):
    ch = []
    for c in range(3):
      idx = 3 * k + c
      w = cur[idx // 2]
      bits = (w >> 16) & 0xFFFF if idx % 2 else w & 0xFFFF
      ch.append(f16pack.f16_bits_to_f32(bits))
    scaled = [(v - m0) / rng for v in ch]
    gray = 0.299 * scaled[0] + 0.587 * scaled[1] + 0.114 * scaled[2]
    adapt_mean = mean + la * (gray - mean)
    adapt = jnp.power(eni * adapt_mean, mk)
    for c in range(3):
      p = scaled[c] * (1.0 / (adapt + scaled[c]))
      p = jnp.where(jnp.isnan(p), 0.0, p)
      tmax = jnp.max(p)
      mx = tmax if mx is None else jnp.maximum(mx, tmax)
      bits_all[3 * k + c] = f16pack.f32_to_f16_bits(p)
  for word in range(6):
    p_ref[0, word] = bits_all[2 * word] | (bits_all[2 * word + 1] << 16)
  mx_ref[...] = jnp.broadcast_to(mx, (1, 8, 128))


def reinhard_map_packed_dma(w_i32, metrics, intensity, light_adapt):
  """Manual-DMA-input variant of :func:`reinhard_map_packed` (same
  outputs; ~2.5x faster input streaming)."""
  n, _, hh, wh = w_i32.shape
  tiles = packed_tiling(hh, wh)
  assert tiles is not None, (hh, wh)
  tr, tw = tiles
  ni, nj = hh // tr, wh // tw
  nt = n * ni * nj

  m = metrics
  key = (m[3] - m[4]) / (m[3] - m[2])
  map_key = 0.3 + 0.7 * jnp.power(key, 1.4)
  scal = jnp.stack([m[0], m[1] - m[0], map_key, m[5],
                    jnp.exp(-jnp.float32(intensity)),
                    jnp.float32(light_adapt)])

  def out_map(t):
    a = t // (ni * nj)
    r = t % (ni * nj)
    return (a, 0, r // nj, r % nj)

  def mx_map(t):
    a = t // (ni * nj)
    r = t % (ni * nj)
    return (a, r // nj, r % nj)

  p, mx = pl.pallas_call(
      functools.partial(_packed_kernel_dma, tr, tw, ni, nj, nt),
      out_shape=[
          jax.ShapeDtypeStruct((n, 6, hh, wh), jnp.int32),
          jax.ShapeDtypeStruct((n, ni * 8, nj * 128), jnp.float32),
      ],
      grid=(nt,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec(memory_space=pltpu.SMEM),
      ],
      out_specs=[
          pl.BlockSpec((1, 6, tr, tw), out_map, memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 8, 128), mx_map, memory_space=pltpu.VMEM),
      ],
      scratch_shapes=[
          pltpu.VMEM((2, 6, tr, tw), jnp.int32),
          pltpu.SemaphoreType.DMA((2,)),
      ],
  )(w_i32, scal)
  max_out = jnp.max(mx, axis=(1, 2))[:, None, None, None, None]
  return p, max_out


def reinhard_map_packed(w_i32, metrics, intensity, light_adapt,
                        interpret: bool = False):
  """(N, 6, hh, wh) i32 channel-pair-packed f16 x12 -> (p packed i32
  same shape, per-image max (N, 1, 1, 1, 1) of the f32 p)."""
  n, _, hh, wh = w_i32.shape
  tiles = packed_tiling(hh, wh)
  assert tiles is not None, (hh, wh)
  tr, tw = tiles
  ni, nj = hh // tr, wh // tw

  m = metrics
  key = (m[3] - m[4]) / (m[3] - m[2])
  map_key = 0.3 + 0.7 * jnp.power(key, 1.4)
  scal = jnp.stack([m[0], m[1] - m[0], map_key, m[5],
                    jnp.exp(-jnp.float32(intensity)),
                    jnp.float32(light_adapt)])

  p, mx = pl.pallas_call(
      _packed_kernel,
      out_shape=[
          jax.ShapeDtypeStruct((n, 6, hh, wh), jnp.int32),
          jax.ShapeDtypeStruct((n, ni * 8, nj * 128), jnp.float32),
      ],
      grid=(n, ni, nj),
      in_specs=[
          pl.BlockSpec((1, 6, tr, tw), lambda a, i, j: (a, 0, i, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pltpu.SMEM),
      ],
      out_specs=[
          pl.BlockSpec((1, 6, tr, tw), lambda a, i, j: (a, 0, i, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 8, 128), lambda a, i, j: (a, i, j),
                       memory_space=pltpu.VMEM),
      ],
      interpret=interpret,
  )(w_i32, scal)
  max_out = jnp.max(mx, axis=(1, 2))[:, None, None, None, None]
  return p, max_out


def reinhard_pallas_available(hh: int, wh: int) -> bool:
  from taichi_image_tpu.ops.pallas import backend_enabled
  return backend_enabled() and reinhard_tiling(hh, wh) is not None


def _q16_kernel_dma(tr, tw, ni, nj, nt, ca_mode, hbm_ref, s_ref,
                    p_ref, mx_ref, scratch, sems):
  """Camera16 fast-path Reinhard map on q16-packed I/O (ops/pallas/q16):
  reads (1, 6, tr, tw) i32 tiles of channel-pair-packed x12 codes,
  decodes to f32 (exact), runs the same exp2-pow map math as
  :func:`_bf16_kernel_dma`, takes the per-tile max over the EXACT f32 p
  (reference max-before-cast semantics, camera_isp.py:211-218), and
  writes p re-encoded as packed q16 codes. Unlike the f16 bit emulation
  (ops/pallas/f16pack, measured +4.3 ms/step of VPU work at 6x4K), the
  fixed-point encode/decode is ~4 integer ops per value."""
  from taichi_image_tpu.ops.pallas import q16
  t = pl.program_id(0)

  def src(tt):
    a = tt // (ni * nj)
    r = tt % (ni * nj)
    return hbm_ref.at[a, :, pl.ds((r // nj) * tr, tr),
                      pl.ds((r % nj) * tw, tw)]

  def dma(slot, tt):
    return pltpu.make_async_copy(src(tt), scratch.at[slot], sems.at[slot])

  @pl.when(t == 0)
  def _():
    dma(0, 0).start()

  @pl.when(t + 1 < nt)
  def _():
    dma((t + 1) % 2, t + 1).start()

  dma(t % 2, t).wait()
  cur = scratch.at[t % 2]

  m0, rng, mk, mean, eni, la = (s_ref[0], s_ref[1], s_ref[2], s_ref[3],
                                s_ref[4], s_ref[5])

  def chan(idx):
    w = cur[idx // 2]
    code = q16.unpack_hi(w) if idx % 2 else q16.unpack_lo(w)
    return q16.decode_x12(code)

  mx = None
  pend = None  # word pairing straddles phases: buffer at most 1 code
  for k in range(4):
    r = (chan(3 * k + 0) - m0) / rng
    g = (chan(3 * k + 1) - m0) / rng
    b = (chan(3 * k + 2) - m0) / rng
    gray = 0.299 * r + 0.587 * g + 0.114 * b
    if not ca_mode:
      adapt_mean = mean + la * (gray - mean)
      # exp2(k*log2(b)) pow lowering — same trade as _bf16_kernel_dma
      adapt = jnp.exp2(mk * jnp.log2(eni * adapt_mean))
    else:
      ca = s_ref[6]
    codes = []
    for c, scaled in ((0, r), (1, g), (2, b)):
      if ca_mode:
        # per-channel adapt (reference ca > 0 branch) — see
        # _bf16_kernel_dma's ca_mode comment
        adapt_color = gray + ca * (scaled - gray)
        adapt_mean = s_ref[7 + c] + la * (adapt_color - s_ref[7 + c])
        adapt = jnp.exp2(mk * jnp.log2(eni * adapt_mean))
      denom = adapt + scaled
      p = scaled * (1.0 / denom)
      p = jnp.where(jnp.isnan(p), 0.0, p)
      tmax = jnp.max(p)
      mx = tmax if mx is None else jnp.maximum(mx, tmax)
      # rational code r = p/(1+p) = scaled/(adapt + 2*scaled) — the
      # same algebraic form as p itself (q16 module note); p <= 0 and
      # NaN encode to code 0 (u8-identical downstream)
      rc = scaled * (1.0 / (denom + scaled))
      codes.append(q16.encode_r(jnp.where(p > 0.0, rc, 0.0)))
    # write words as pairs complete (buffering all 12 code tiles
    # overflowed scoped VMEM at full-width 4K tiles)
    if k % 2 == 0:
      p_ref[0, 3 * k // 2] = q16.pack_pair(codes[0], codes[1])
      pend = codes[2]
    else:
      p_ref[0, (3 * k - 1) // 2] = q16.pack_pair(pend, codes[0])
      p_ref[0, (3 * k + 1) // 2] = q16.pack_pair(codes[1], codes[2])
  mx_ref[...] = jnp.broadcast_to(mx, (1, 8, 128))


def reinhard_map_q16_dma(w_i32, metrics, intensity, light_adapt,
                         color_adapt: float = 0.0,
                         interpret: bool = False):
  """(N, 6, hh, wh) i32 q16-packed x12 -> (p q16-packed i32 same shape,
  per-image f32 max (N, 1, 1, 1)). The max is over the exact f32 p
  BEFORE the q16 encode (reference max-before-cast semantics).
  ``color_adapt`` must be a static Python float; 0.0 (the reference
  default) runs the one-adapt-per-pixel specialization, > 0 the
  per-channel chain (round 5)."""
  n, nc, hh, wh = w_i32.shape
  assert nc == 6, nc
  ca_mode = float(color_adapt) != 0.0
  tiles = _q16_map_tiling(hh, wh)
  assert tiles is not None, (hh, wh)
  tr, tw = tiles
  ni, nj = hh // tr, wh // tw
  nt = n * ni * nj

  scal = (reinhard_scal_ca(metrics, intensity, light_adapt, color_adapt)
          if ca_mode else reinhard_scal(metrics, intensity, light_adapt))

  def out_map(t):
    a = t // (ni * nj)
    r = t % (ni * nj)
    return (a, 0, r // nj, r % nj)

  def mx_map(t):
    a = t // (ni * nj)
    r = t % (ni * nj)
    return (a, r // nj, r % nj)

  p, mx = pl.pallas_call(
      functools.partial(_q16_kernel_dma, tr, tw, ni, nj, nt, ca_mode),
      out_shape=[
          jax.ShapeDtypeStruct((n, 6, hh, wh), jnp.int32),
          jax.ShapeDtypeStruct((n, ni * 8, nj * 128), jnp.float32),
      ],
      grid=(nt,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec(memory_space=pltpu.SMEM),
      ],
      out_specs=[
          pl.BlockSpec((1, 6, tr, tw), out_map, memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 8, 128), mx_map, memory_space=pltpu.VMEM),
      ],
      scratch_shapes=[
          pltpu.VMEM((2, 6, tr, tw), jnp.int32),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(w_i32, scal)
  max_out = jnp.max(mx, axis=(1, 2))[:, None, None, None]
  return p, max_out


def _q16_map_tiling(hh: int, wh: int):
  """(TR, TW) for the q16 map kernel's (1, 6, TR, TW) i32 blocks (same
  bytes as bf16 x 12ch). Two measured constraints (6x4K probes):
  the kernel's f32 intermediates keep ~2.4x the block bytes live, so a
  5M in+out budget stays under Mosaic's 16M scoped limit (the bf16
  kernel's 8M sizing OOM'd at 17.58M); and full-width i32 tiles
  trigger a pathological Mosaic compile (24x1920: ~230 s vs ~1 s at
  <=768 wide) at EQUAL runtime (4.8 ms/step either way), so widths cap
  at 768 like packed_tiling."""
  if hh < 8 or wh < 128:
    return None
  tw = None
  for cand in range(128, min(wh, 768) + 1, 128):
    if wh % cand == 0:
      tw = cand
  if tw is None:
    return None
  tr = None
  for cand in range(8, min(hh, 512) + 1, 8):
    if hh % cand:
      continue
    if 2 * 6 * cand * tw * 4 * 2 <= 5 * 1024 * 1024:
      tr = cand
  return (tr, tw) if tr else None


def reinhard_q16_available(hh: int, wh: int) -> bool:
  """True when the q16 manual-DMA map kernel can run: TPU backend, the
  off-switch unset, and an exact-divisor tiling."""
  from taichi_image_tpu.ops.pallas import backend_enabled
  return backend_enabled() and _q16_map_tiling(hh, wh) is not None
