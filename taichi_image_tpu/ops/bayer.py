"""Bayer mosaic / demosaic (Malvar-He-Cutler and bilinear).

Reference: ``taichi_image/bayer.py``. The reference demosaics with four
13-tap 5x5 diamond stencils (one per 2x2 Bayer phase, each producing a vec3
pixel, bayer.py:30-55,137-155), renormalizing dropped out-of-bounds taps at
image borders per channel (bayer.py:145-151), with an optional fused 3x3
color-correction matrix (bayer.py:127-130,152-153).

TPU-native formulation
----------------------
Instead of a scalar gather loop per pixel, the CFA is split into its four
half-resolution phase planes; every full-resolution 5x5 diamond tap then
lands on one phase plane at an offset in {-1,0,1}, so the whole demosaic is
a single dense 3x3 convolution with 4 input channels (phases) and 12 output
channels (4 output phases x RGB), which XLA maps onto one fused
convolution pass. Border renormalization is exact: interior tap-weight sums
are the constant 16 per channel, and the four one-pixel border strips of
the half-res grid divide by precomputed edge sums (equivalent to the
reference's drop-and-renormalize, since zero padding drops exactly the
out-of-image taps).
"""

from __future__ import annotations

import enum
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from taichi_image_tpu import types
from taichi_image_tpu.ops.kernel import symmetrical, zip_tuple
from taichi_image_tpu.utils.cache import cache

__all__ = [
    "BayerPattern", "pixel_orders", "kernel_patterns",
    "diamond_kernel", "make_bayer_kernels", "make_bilinear_kernels",
    "scale_kernel", "bayer_kernels", "bilinear_kernels",
    "rgb_to_bayer", "bayer_to_rgb", "bayer_to_rgb_batch",
]


def diamond_kernel(weights):
  """13 diamond-shaped (offset, weight) taps over a 5x5 support
  (reference bayer.py:15-27). Offsets are (row, col)."""
  diamond = [
      (0, 1),
      (-1, 2),
      (-2, 3),
      (-1, 2),
      (0, 1),
  ]
  offsets = [(i - 2, x) for i, r in enumerate(diamond) for x in range(*r)]
  assert len(offsets) == len(weights), (
      f"incorrect weight length {len(offsets)} != {len(weights)}")
  return tuple(zip(offsets, weights))


def make_bayer_kernels():
  """Four per-phase vec3 Malvar-He-Cutler weight tables, integer weights
  summing to 16 per channel (reference bayer.py:30-55)."""
  g_rb, r_g1, r_g2, rb_br, ident = [
      symmetrical(w) for w in [
          [(-2,), (0, 4), (-2, 4, 8)],   # G at R,B locations
          [(-2,), (-2, 8), (1, 0, 10)],  # R at G1 and B at G2
          [(1,), (-2, 0), (-2, 8, 10)],  # B at G1 and R at G2
          [(-3,), (4, 0), (-3, 0, 12)],  # R at B and B at R
          [(0,), (0, 0), (0, 0, 16)],    # Identity
      ]
  ]
  b_g1 = r_g2
  b_g2 = r_g1
  vec_weights = [
      zip_tuple(ident, g_rb, rb_br),  # R phase
      zip_tuple(r_g1, ident, b_g1),   # G1 phase
      zip_tuple(r_g2, ident, b_g2),   # G2 phase
      zip_tuple(rb_br, g_rb, ident),  # B phase
  ]
  return tuple(diamond_kernel(w) for w in vec_weights)


def make_bilinear_kernels():
  """Four per-phase vec3 bilinear weight tables on the same 13-tap diamond
  support (cheap demosaic mode; no reference in-repo counterpart — the
  reference compares against an external bilinear implementation,
  test/compare_bayer.py:34)."""
  ident = symmetrical([(0,), (0, 0), (0, 0, 4)])
  cross = symmetrical([(0,), (0, 1), (0, 1, 0)])          # 4-neighbor cross
  vert = symmetrical([(0,), (0, 2), (0, 0, 0)])           # up/down pair
  horiz = symmetrical([(0,), (0, 0), (0, 2, 0)])          # left/right pair
  diag = symmetrical([(0,), (1, 0), (0, 0, 0)])           # 4 diagonals
  vec_weights = [
      zip_tuple(ident, cross, diag),  # R phase
      zip_tuple(vert, ident, horiz),  # phase with R above/below
      zip_tuple(horiz, ident, vert),  # phase with R left/right
      zip_tuple(diag, cross, ident),  # B phase
  ]
  return tuple(diamond_kernel(w) for w in vec_weights)


def scale_kernel(kernel, scale):
  """Scale a kernel's vec3 weights, preserving offsets
  (reference bayer.py:57-68)."""
  return tuple(
      (offset, tuple(w * s for w, s in zip(weight, scale)))
      for offset, weight in kernel)


bayer_kernels = make_bayer_kernels()
bilinear_kernels = make_bilinear_kernels()


class BayerPattern(enum.Enum):
  """CFA layout of the top-left 2x2 quad (reference bayer.py:75-83)."""
  RGGB = 0
  GRBG = 1
  GBRG = 2
  BGGR = 3

  @property
  def pixel_order(self):
    return pixel_orders[self]


# pattern -> which RGB channel each 2x2 position samples, in the order
# (even,even), (even,odd), (odd,even), (odd,odd) of (row, col)
# (reference bayer.py:85-90; the reference's mosaic loop assigns p1..p4 in
# this order, bayer.py:106-112).
pixel_orders = {
    BayerPattern.RGGB: (0, 1, 1, 2),
    BayerPattern.GRBG: (1, 0, 2, 1),
    BayerPattern.GBRG: (1, 2, 0, 1),
    BayerPattern.BGGR: (2, 1, 1, 0),
}

# pattern -> permutation of the 4 phase kernels, in the order
# (even,even), (odd,even), (even,odd), (odd,odd) of (row, col)
# (the reference's demosaic loop applies kernels[0..3] at those positions,
# bayer.py:162-175; reference table bayer.py:92-97).
kernel_patterns = {
    BayerPattern.RGGB: (0, 1, 2, 3),
    BayerPattern.GBRG: (1, 0, 3, 2),
    BayerPattern.GRBG: (2, 3, 0, 1),
    BayerPattern.BGGR: (3, 2, 1, 0),
}

# Order in which output phases are laid out in the 12-channel conv output:
# index p -> (row parity, col parity); matches the kernel application order
# above.
_PHASE_PARITY = ((0, 0), (1, 0), (0, 1), (1, 1))


def _phase_conv_weights(kernels) -> np.ndarray:
  """Decompose four full-res 13-tap diamond vec3 kernels into a dense
  (12, 4, 3, 3) phase-plane convolution weight tensor.

  Out channel = out_phase * 3 + rgb. In channel = input phase index with
  parity order (0,0), (0,1), (1,0), (1,1) (row-major parities).
  """
  w = np.zeros((12, 4, 3, 3), np.float32)
  for p, (dy, dx) in enumerate(_PHASE_PARITY):
    for (oy, ox), weight in kernels[p]:
      sy, sx = dy + oy, dx + ox
      in_phase = (sy % 2) * 2 + (sx % 2)
      u, v = sy // 2, sx // 2  # floor division: in {-1, 0, 1}
      for c in range(3):
        w[p * 3 + c, in_phase, u + 1, v + 1] += weight[c]
  return w


def _edge_sums(w: np.ndarray, hh: int, wh: int):
  """Per-channel surviving-weight sums for the four border strips of the
  half-res grid (exact equivalent of reference bayer.py:145-151).

  Returns (interior (12,), top (12, wh), bottom (12, wh), left (12, hh),
  right (12, hh)) float32 arrays. Assumes hh >= 2 and wh >= 2.
  """
  ws = w.sum(axis=1)  # (12, 3, 3): total weight per (out_ch, u+1, v+1)

  def rsum(rows, cols):
    return ws[:, rows, :][:, :, cols].sum(axis=(1, 2))  # (12,)

  full = rsum([0, 1, 2], [0, 1, 2])
  t_mid = rsum([1, 2], [0, 1, 2])    # top row: u=-1 dropped
  b_mid = rsum([0, 1], [0, 1, 2])
  l_mid = rsum([0, 1, 2], [1, 2])
  r_mid = rsum([0, 1, 2], [0, 1])
  tl = rsum([1, 2], [1, 2])
  tr = rsum([1, 2], [0, 1])
  bl = rsum([0, 1], [1, 2])
  br = rsum([0, 1], [0, 1])

  top = np.tile(t_mid[:, None], (1, wh))
  top[:, 0], top[:, -1] = tl, tr
  bottom = np.tile(b_mid[:, None], (1, wh))
  bottom[:, 0], bottom[:, -1] = bl, br
  left = np.tile(l_mid[:, None], (1, hh))
  left[:, 0], left[:, -1] = tl, bl
  right = np.tile(r_mid[:, None], (1, hh))
  right[:, 0], right[:, -1] = tr, br
  return full, top, bottom, left, right


@cache
def _demosaic_tables(pattern: BayerPattern, method: str):
  base = bayer_kernels if method == "mhc" else bilinear_kernels
  kernels = tuple(base[i] for i in kernel_patterns[pattern])
  return _phase_conv_weights(kernels)


@cache
def _interleave_table():
  """One-hot (3, 12, 2, 2) kernel assembling full-res planar RGB from the
  12-channel phase output via a stride-2 transposed convolution."""
  k = np.zeros((3, 12, 2, 2), np.float32)
  for p, (dy, dx) in enumerate(_PHASE_PARITY):
    for c in range(3):
      k[c, p * 3 + c, 1 - dy, 1 - dx] = 1.0
  return k


# ---------------------------------------------------------------------------
# Planar phase-plane pipeline (the TPU-fast path).
#
# TPU layouts tile the two minor dimensions (sublanes x 128 lanes); any
# array with a tiny minor dimension (RGB channels = 3, camera batch = 6)
# pads catastrophically (measured 21x memory/bandwidth expansion on v5e).
# The fast path therefore keeps images PLANAR end to end:
#   CFA phase planes (N, 4, H/2, W/2) -> demosaic -> (N, 12, H/2, W/2)
#   (4 output phases x RGB) -> tonemap in phase form -> planar u8.
# Interleaved HWC exists only at API boundaries.
# ---------------------------------------------------------------------------


def subsample_hw(x, sr: int, sc: int):
  """``x[..., ::sr, ::sc]`` with identical values, via free minor-dim
  reshapes when the dims divide: XLA lowers strided slices on the two
  minor (tiled) dims as pathological gathers on TPU (~13-158 ms at 4K
  scales, see docs/PERFORMANCE.md); the reshape-select form compiles to
  a cheap windowed copy."""
  h, w = x.shape[-2], x.shape[-1]
  if sr <= 0 or sc <= 0 or h % sr or w % sc:
    return x[..., ::sr, ::sc]
  r = x.reshape(*x.shape[:-2], h // sr, sr, w // sc, sc)
  return r[..., 0, :, 0]


def cfa_phases(cfa):
  """(N, H, W) CFA -> (N, 4, H/2, W/2) phase planes, in-phase order
  (row%2)*2 + col%2.

  Column parity splits via a free minor-dim-2 reshape instead of
  lane-stride-2 slices: XLA lowers stride-2 lane slices of a full-res
  array as a pathological gather (~158 ms for one 6x4K f32 frame set,
  measured on v5e — 18x slower than this formulation, ~8.9 ms), and the
  cost is the same for u16/f32 alike. Row parity stays a sublane-stride
  slice (cheap)."""
  n, h, w = cfa.shape
  b = cfa.reshape(n, h, w // 2, 2)
  even, odd = b[..., 0], b[..., 1]
  return jnp.stack([even[:, 0::2], odd[:, 0::2],
                    even[:, 1::2], odd[:, 1::2]], axis=1)


def edge_renorm_factor(weights, hh, wh, is_top=True, is_bot=True):
  """Elementwise border-renormalization factor (1, 12, hh, wh-broadcast).

  An outer product of per-row and per-column factor vectors with the four
  corner pixels corrected via iota masks — the drop-tap divisor strips
  are separable everywhere except the corners, where the correction makes
  the combined factor EXACTLY full/corner regardless of the row/column
  vector values (so narrow images, wh == 2, stay exact). One fusable
  multiply instead of `.at[...]` dynamic-update-slices, which materialize
  full-buffer copies on TPU.

  ``is_top``/``is_bot`` may be Python bools or traced scalars (spatial
  sharding passes axis_index-derived gates so row strips fire only at the
  GLOBAL image edges).
  """
  full, top, bottom, left, right = _edge_sums(weights, hh, wh)
  t_mid, b_mid = top[:, 1], bottom[:, 1]
  l_mid, r_mid = left[:, 1], right[:, 1]
  tl, tr_ = top[:, 0], top[:, -1]
  bl, br = bottom[:, 0], bottom[:, -1]

  r_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hh, wh), 2)
  c_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hh, wh), 3)
  on_top = is_top & (r_i == 0)
  on_bot = is_bot & (r_i == hh - 1)

  ch = lambda v: jnp.asarray(v, jnp.float32)[None, :, None, None]
  rvf = (jnp.where(on_top, ch(full / t_mid), 1.0)
         * jnp.where(on_bot, ch(full / b_mid), 1.0))
  cv = np.ones((12, wh), np.float32)
  cv[:, 0] = full / l_mid
  cv[:, -1] = full / r_mid
  f = rvf * jnp.asarray(cv, jnp.float32)[None, :, None, :]

  # corner corrections: combined factor becomes exactly full/corner
  for corner, rvec, rmask, cpos in (
      (tl, full / t_mid, on_top, 0), (tr_, full / t_mid, on_top, wh - 1),
      (bl, full / b_mid, on_bot, 0), (br, full / b_mid, on_bot, wh - 1)):
    cval = (full / corner) / (rvec * cv[:, cpos])
    f = jnp.where(rmask & (c_i == cpos), f * ch(cval), f)
  return f


def _stencil_finish_spec(weights, hh, wh, cc, out_dtype, top_row=0,
                         bot_row=None):
  """Static constants for the Pallas stencil's fused finish stage: the
  same per-channel border factors edge_renorm_factor builds (full/strip
  sums, corner corrections) plus the optional CCM, as numpy/floats.

  ``top_row``/``bot_row``: kernel-frame row indices where the top/bottom
  drop-tap strips fire (defaults: rows 0 and hh-1 — a whole image).
  Row-band callers pass the band-local position of the TRUE image edge
  (or -1 so the strip never fires): a halo'd interior band has no image
  edge at all, the first band's image top sits at kernel row 1 (below
  its zero halo row), etc. Column factors always fire (wh is the full
  image width in every band)."""
  if bot_row is None:
    bot_row = hh - 1
  full, top, bottom, left, right = _edge_sums(weights, hh, wh)
  t_mid, b_mid = top[:, 1], bottom[:, 1]
  l_mid, r_mid = left[:, 1], right[:, 1]
  tl, tr_ = top[:, 0], top[:, -1]
  bl, br = bottom[:, 0], bottom[:, -1]
  topf, botf = full / t_mid, full / b_mid
  leftf, rightf = full / l_mid, full / r_mid
  cvals = np.stack([
      (full / tl) / (topf * leftf),
      (full / tr_) / (topf * rightf),
      (full / bl) / (botf * leftf),
      (full / br) / (botf * rightf),
  ]).astype(np.float32)
  ccm = None if cc is None else np.array(cc, np.float32).reshape(3, 3)
  return dict(hh=hh, wh=wh, top_row=int(top_row), bot_row=int(bot_row),
              topf=topf.astype(np.float32),
              botf=botf.astype(np.float32),
              leftf=leftf.astype(np.float32),
              rightf=rightf.astype(np.float32), cvals=cvals, cc=ccm,
              out_dtype=jnp.dtype(out_dtype))


def _edge_renorm(x, weights, hh, wh):
  """Apply exact drop-tap border renormalization to interior-normalized
  (num/full) phase output."""
  return x * edge_renorm_factor(weights, hh, wh)


def edge_renorm_factor_sampled(weights, hh, wh, step):
  """:func:`edge_renorm_factor` evaluated on the (::step, ::step) sample
  grid, replicating its exact f32 arithmetic (same divisions, same
  multiply chains) so that ``x12[..., ::step, ::step]`` equals the
  sampled path bitwise. Built in numpy (static edges), returned as a
  (1, 12, hs, ws) jnp constant-expression."""
  full, top, bottom, left, right = _edge_sums(weights, hh, wh)
  t_mid, b_mid = top[:, 1], bottom[:, 1]
  l_mid, r_mid = left[:, 1], right[:, 1]
  tl, tr_ = top[:, 0], top[:, -1]
  bl, br = bottom[:, 0], bottom[:, -1]

  hs, ws = -(-hh // step), -(-wh // step)
  rows = np.arange(hs) * step
  cols = np.arange(ws) * step
  on_top = rows == 0
  on_bot = rows == hh - 1
  one = np.float32(1.0)
  rvf = (np.where(on_top[None, :], (full / t_mid)[:, None], one)
         * np.where(on_bot[None, :], (full / b_mid)[:, None], one))
  cv_full = np.ones((12, wh), np.float32)
  cv_full[:, 0] = full / l_mid
  cv_full[:, -1] = full / r_mid
  cv = cv_full[:, cols]
  f = rvf[:, :, None] * cv[:, None, :]
  for corner, rvec, rmask, cpos in (
      (tl, full / t_mid, on_top, 0), (tr_, full / t_mid, on_top, wh - 1),
      (bl, full / b_mid, on_bot, 0), (br, full / b_mid, on_bot, wh - 1)):
    cval = (full / corner) / (rvec * cv_full[:, cpos])
    mask = rmask[:, None] & (cols == cpos)[None, :]
    f = np.where(mask[None, :, :], f * cval[:, None, None], f)
  return jnp.asarray(f[None].astype(np.float32))


def demosaic_phases(phases, pattern: BayerPattern, cc=None, method="mhc",
                    out_dtype=jnp.float32, backend="auto",
                    sample_step: int = 0):
  """Demosaic normalized phase planes (N, 4, hh, wh) float -> clamped
  (N, 12, hh, wh) phase-RGB in [0, 1].

  Same math as the reference stencil (bayer.py:137-155) with exact border
  renormalization; the 12-channel layout is out_phase*3 + rgb with phases
  ordered (0,0), (1,0), (0,1), (1,1) in (row, col) parity.

  ``backend``: 'auto' uses the Pallas TPU stencil kernel when available
  (ops/pallas/demosaic.py — avoids XLA's pathologically padded conv
  layouts), else the XLA conv; 'xla' / 'pallas' force a path.

  ``sample_step`` > 0: additionally return
  ``out[:, 0:3, ::step, ::step]`` (the metering sample grid) as
  ``(out, sample)``. On the Pallas path the sample is emitted by the
  kernel via MXU one-hot dots — a strided read of the finished x12 costs
  ~13 ms at 6x4K (minor-dim gather on TPU), the in-kernel emission is
  free. Values are bitwise-identical either way.
  """
  if backend not in ("auto", "pallas", "xla"):
    raise ValueError(f"unknown demosaic backend {backend!r} "
                     "(expected 'auto', 'pallas', or 'xla')")
  n, _, hh, wh = phases.shape
  weights = _demosaic_tables(pattern, method)

  from taichi_image_tpu.ops.pallas import demosaic as pallas_dm
  use_pallas = backend == "pallas" or (
      backend == "auto" and pallas_dm.pallas_available(hh, wh))

  def finish(o):
    """Shared cc+clip+cast tail; ``o`` has 3*k channels."""
    if cc is not None:
      ccm = jnp.asarray(np.array(cc, np.float32).reshape(3, 3))
      k = o.shape[1] // 3
      x = o.reshape(o.shape[0], k, 3, o.shape[2], o.shape[3])
      x = jnp.einsum("npchw,dc->npdhw", x, ccm,
                     precision=jax.lax.Precision.HIGHEST)
      o = x.reshape(o.shape[0], k * 3, o.shape[2], o.shape[3])
    return jnp.clip(o, 0.0, 1.0).astype(out_dtype)

  samp = None
  if use_pallas:
    # bf16 phases go to the kernel unconverted (in-kernel bf16->f32 is
    # exact and halves the halo-DMA traffic); everything else pre-casts
    in_bf16 = phases.dtype == jnp.bfloat16
    ph_in = phases if in_bf16 else phases.astype(jnp.float32)
    # bf16/f32 output fuses renorm+CCM+clip+cast IN-KERNEL (emitting
    # final x12 directly skips the f32-numerator round trip, ~1.2 GB at
    # 6x4K); f16 keeps the XLA finish (Mosaic cannot emit f16)
    fuse = jnp.dtype(out_dtype) in (jnp.dtype(jnp.bfloat16),
                                    jnp.dtype(jnp.float32))
    fin = (_stencil_finish_spec(weights, hh, wh, cc, out_dtype)
           if fuse else None)
    # out_bf16 sizes the OUTPUT double-buffers: true only for an actual
    # bf16 out dtype (a fused f32 finish still writes 4-byte blocks)
    out_bf16 = fuse and jnp.dtype(out_dtype) == jnp.dtype(jnp.bfloat16)
    tiles_s = (pallas_dm.tiling_for(hh, wh, sample_step, in_bf16=in_bf16,
                                    out_bf16=out_bf16)
               if sample_step else None)
    if tiles_s is not None:
      num16, snum = pallas_dm.demosaic_stencil(
          ph_in, weights, *tiles_s, sample_step=sample_step, finish=fin)
      if fuse:
        samp = snum.astype(out_dtype)  # kernel emits FINAL f32 samples
      else:
        samp = finish(snum * edge_renorm_factor_sampled(
            weights, hh, wh, sample_step)[:, 0:3])
    else:
      tiles = pallas_dm.tiling_for(hh, wh, in_bf16=in_bf16,
                                   out_bf16=out_bf16)
      assert tiles is not None, f"no pallas tiling for {(hh, wh)}"
      num16 = pallas_dm.demosaic_stencil(ph_in, weights, *tiles,
                                         finish=fin)
    out = num16 if fuse else finish(_edge_renorm(num16, weights, hh, wh))
  elif hh >= 2 and wh >= 2:
    num = jax.lax.conv_general_dilated(
        phases.astype(jnp.float32), jnp.asarray(weights), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    full = weights.sum(axis=(1, 2, 3))
    num16 = num * jnp.asarray(1.0 / full, jnp.float32)[None, :, None, None]
    out = finish(_edge_renorm(num16, weights, hh, wh))
  else:
    num = jax.lax.conv_general_dilated(
        phases.astype(jnp.float32), jnp.asarray(weights), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    ones = jnp.ones((1, 4, hh, wh), jnp.float32)
    denom = jax.lax.conv_general_dilated(
        ones, jnp.asarray(weights), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    out = finish(num / denom)
  if not sample_step:
    return out
  if samp is None:
    samp = subsample_hw(out[:, 0:3], sample_step, sample_step)
  return out, samp


def demosaic_phases_q16(packed, pattern: BayerPattern, cc=None,
                        method="mhc", sample_step: int = 0,
                        interpret: bool = False):
  """Camera16 fast-path demosaic on q16 containers (ops/pallas/q16):
  (N, 2, hh, wh) i32 q12-packed raw phase codes -> (N, 6, hh, wh) i32
  q16-packed final x12 codes, with border renorm + optional CCM + clip
  fused in-kernel (same math as :func:`demosaic_phases` with a bf16/f32
  working dtype — reference bayer.py:137-155 stencil + camera_isp.py
  CCM fold). ``sample_step`` > 0 additionally returns the metering
  sample grid as exact f32 of the DEQUANTIZED output codes.

  TPU-only (the caller gates on ops.pallas.demosaic.q16_available);
  ``interpret=True`` runs the kernel in interpreter mode for CPU tests.
  """
  n, _, hh, wh = packed.shape
  weights = _demosaic_tables(pattern, method)
  from taichi_image_tpu.ops.pallas import demosaic as pallas_dm
  tiles = pallas_dm.q16_tiling(hh, wh, sample_step)
  assert tiles is not None, f"no q16 tiling for {(hh, wh, sample_step)}"
  fin = _stencil_finish_spec(weights, hh, wh, cc, jnp.float32)
  return pallas_dm.demosaic_stencil(packed, weights, *tiles,
                                    interpret=interpret,
                                    sample_step=sample_step, finish=fin)


def _samples_shift(phases, weights, s, hh, wh):
  """Sample-grid demosaic numerators via per-tap offset slices +
  reshape-select subsample (no convolution op): each tap reads the
  zero-padded phase planes at its (u, v) offset, subsamples FIRST
  (small), converts, and accumulates in f32. Offset slices are
  contiguous (not the strided-lane gather pathology); the subsample is
  the minor-dim reshape trick (subsample_hw)."""
  padded = jnp.pad(phases, ((0, 0), (0, 0), (1, 1), (1, 1)))
  out = []
  for oc in range(3):
    acc = None
    for q in range(4):
      for u in range(3):
        for v in range(3):
          wgt = float(weights[oc, q, u, v])
          if wgt == 0.0:
            continue
          tap = subsample_hw(padded[:, q, u:u + hh, v:v + wh], s, s)
          tap = tap.astype(jnp.float32) * wgt
          acc = tap if acc is None else acc + tap
    out.append(acc)
  return jnp.stack(out, axis=1)


def demosaic_samples(phases, pattern: BayerPattern, cc=None, method="mhc",
                     out_dtype=jnp.float32, sample_step: int = 4,
                     formulation: str = "conv"):
  """Metering-sample pre-pass: the demosaic evaluated ONLY at the
  ``(::step, ::step)`` grid of output channels 0..2, via a strided
  convolution (the stride makes XLA compute just the sampled positions —
  ~1/step² of the taps, one read of the phase planes).

  Same per-sample arithmetic as ``demosaic_phases(..., sample_step)``'s
  second return (renorm via edge_renorm_factor_sampled, CCM, clip, cast)
  — the tap accumulation may associate differently from the stencil
  kernel's sequential order (f32 ulps; metering stats agree to ~1e-7
  relative). Exists so the front-fused demosaic+Reinhard kernel
  (ops/pallas/demosaic.demosaic_reinhard_stencil) can have its metrics
  BEFORE the main stencil runs — the kernel's own sample emission would
  be circular there.

  ``formulation``: 'conv' (strided lax.conv, default) or 'shift'
  (per-tap offset slices + reshape-select subsample, summed explicitly
  — the fallback if the conv hits XLA's pathological channel-minor
  convolution layouts on TPU; same values up to f32 sum association).
  """
  n, _, hh, wh = phases.shape
  s = sample_step
  weights = _demosaic_tables(pattern, method)
  if formulation == "shift":
    num = _samples_shift(phases, weights, s, hh, wh)
  elif phases.dtype == jnp.bfloat16:
    # bf16 operands are EXACT here: the phase values ARE bf16 data and
    # the MHC/bilinear weights are dyadic rationals n/16 (<= 4 mantissa
    # bits); products are exact in the MXU's f32 accumulation. Avoids
    # materializing a full f32 copy of the phase planes for the convert.
    num = jax.lax.conv_general_dilated(
        phases, jnp.asarray(weights[:3], jnp.bfloat16), (s, s),
        ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
  else:
    num = jax.lax.conv_general_dilated(
        phases.astype(jnp.float32), jnp.asarray(weights[:3]), (s, s),
        ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
  full3 = weights[:3].sum(axis=(1, 2, 3))
  num16 = num * jnp.asarray(1.0 / full3, jnp.float32)[None, :, None, None]
  samp = num16 * edge_renorm_factor_sampled(weights, hh, wh, s)[:, 0:3]
  if cc is not None:
    ccm = jnp.asarray(np.array(cc, np.float32).reshape(3, 3))
    samp = jnp.einsum("nchw,dc->ndhw", samp, ccm,
                      precision=jax.lax.Precision.HIGHEST)
  return jnp.clip(samp, 0.0, 1.0).astype(out_dtype)


@cache
def _interleave_table_1ch():
  """One-hot (1, 4, 2, 2) kernel assembling a full-res plane from four
  phase planes (single-channel variant of :func:`_interleave_table`)."""
  k = np.zeros((1, 4, 2, 2), np.float32)
  for p, (dy, dx) in enumerate(_PHASE_PARITY):
    k[0, p, 1 - dy, 1 - dx] = 1.0
  return k


def phases_to_plane(x4, dtype=None):
  """(N, 4, hh, wh) single-channel phases -> full-res (N, H, W) plane.

  One 6-d transpose moving the (row, col) parity dims into interleaving
  positions; the final reshape is a free C-order merge. Exact (pure data
  movement, no dtype roundtrip). Measured at 6x4K for the 12-channel
  variant: 3.1 ms vs 5.6 ms for stack+reshape interleaves and 16.2 ms
  for the round-1 one-hot stride-2 transposed conv
  (tools/probe_interleave.py)."""
  n, _, hh, wh = x4.shape
  x = x4.reshape(n, 2, 2, hh, wh)        # (n, pc, pr, hh, wh)
  t = x.transpose(0, 3, 2, 4, 1)         # (n, hh, pr, wh, pc)
  return t.reshape(n, 2 * hh, 2 * wh).astype(dtype or x4.dtype)


def phases_to_planar(x12, dtype=None):
  """(N, 12, hh, wh) phase-RGB -> full-res planar (N, 3, H, W) via a
  single 6-d transpose (exact; see :func:`phases_to_plane` for the perf
  note)."""
  n, _, hh, wh = x12.shape
  x = x12.reshape(n, 2, 2, 3, hh, wh)    # (n, pc, pr, c, hh, wh)
  t = x.transpose(0, 3, 4, 2, 5, 1)      # (n, c, hh, pr, wh, pc)
  return t.reshape(n, 3, 2 * hh, 2 * wh).astype(dtype or x12.dtype)


def phases_to_planar_stack(x12, dtype=None):
  """(N, 12, hh, wh) phase-RGB -> full-res planar (N, 3, H, W) via two
  minor-dim-2 STACK interleaves (lane interleave as
  ``stack(..., axis=-1).reshape``, sublane as ``axis=-2`` — the
  windowed-copy pattern :func:`subsample_hw` exploits in reverse).

  Bitwise-equal to :func:`phases_to_planar`; which form is faster is
  CONTEXT-dependent on this toolchain: inside the 8K banded finish
  programs (u8, fused with the quantize producer) the stack form moves
  the set at 142.8 ms vs the 6-d transpose's 208.8 (round 4,
  tools/probe_large2.py close — the transpose family measured ~22 GB/s
  there), while the 4K FUSED step's tail (in-program producers) keeps
  the transpose: 7.29 vs 9.68 ms/step (tools/probe_interleave4k.py),
  consistent with the round-1 standalone probe (3.1 vs 5.6 ms,
  tools/probe_interleave.py). Each call site carries its measured
  choice."""
  n, _, hh, wh = x12.shape
  x = x12.reshape(n, 2, 2, 3, hh, wh)    # (n, pc, pr, c, hh, wh)

  def cols(pr):
    return jnp.stack([x[:, 0, pr], x[:, 1, pr]], axis=-1).reshape(
        n, 3, hh, 2 * wh)

  out = jnp.stack([cols(0), cols(1)], axis=-2).reshape(
      n, 3, 2 * hh, 2 * wh)
  return out.astype(dtype or x12.dtype)


def planar_to_phases(planar):
  """(N, 3, H, W) planar -> (N, 12, hh, wh) phase-RGB (inverse of
  :func:`phases_to_planar`)."""
  n, _, h, w = planar.shape
  parts = []
  for dy, dx in _PHASE_PARITY:
    parts.append(planar[:, :, dy::2, dx::2])
  return jnp.concatenate(parts, axis=1)


@partial(jax.jit, static_argnames=(
    "pattern", "correct_colors", "in_dtype", "out_dtype", "method"))
def _bayer_to_rgb(cfa, pattern, correct_colors, in_dtype, out_dtype, method):
  """Demosaic a batch of CFA images (N, H, W) -> (N, H, W, 3) via the
  planar phase-plane core (demosaic_phases), assembling interleaved HWC
  only at the end."""
  n, h, w = cfa.shape
  in_scale = types.scale_of(in_dtype)
  phases = cfa_phases(cfa).astype(jnp.float32)
  if in_scale != 1.0:
    phases = phases / jnp.float32(in_scale)
  x12 = demosaic_phases(phases, pattern, cc=correct_colors, method=method,
                        out_dtype=jnp.float32)
  planar = phases_to_planar(x12, jnp.float32)
  rgb = planar.transpose(0, 2, 3, 1)
  return types.from_float(rgb, out_dtype)


def bayer_to_rgb(bayer,
                 pattern: BayerPattern = BayerPattern.RGGB,
                 correct_colors: Optional[np.ndarray] = None,
                 dtype=None,
                 method: str = "mhc"):
  """Demosaic a 2-D CFA image to (H, W, 3) RGB.

  Matches reference ``bayer_to_rgb`` (bayer.py:202-219): Malvar-He-Cutler
  13-tap stencils, border renormalization, optional fused 3x3 color
  correction (row-major 3x3 applied as ``cc @ rgb``), clamp to [0,1] and
  rescale/cast to ``dtype`` (defaults to the input dtype). ``method`` may
  be "mhc" (reference parity) or "bilinear" (cheap mode).
  """
  if bayer.ndim != 2:
    raise ValueError(f"image must be mono bayer, got shape {bayer.shape}")
  if bayer.shape[0] % 2 or bayer.shape[1] % 2:
    raise ValueError(f"image must be even size, got {bayer.shape}")
  in_dtype = types.dtype_of(bayer)
  out_dtype = in_dtype if dtype is None else types.canonical_dtype(dtype)
  cc = None
  if correct_colors is not None:
    cc = tuple(np.asarray(correct_colors, np.float32).flatten().tolist())
  out = _bayer_to_rgb(jnp.asarray(bayer)[None], pattern, cc, in_dtype,
                      out_dtype, method)
  return out[0]


def bayer_to_rgb_batch(bayer,
                       pattern: BayerPattern = BayerPattern.RGGB,
                       correct_colors=None,
                       dtype=None,
                       method: str = "mhc"):
  """Batched demosaic: (N, H, W) -> (N, H, W, 3). TPU-native extension used
  by the fused multi-camera ISP step."""
  if bayer.ndim != 3:
    raise ValueError(
        f"expected batch of mono bayer images, got shape {bayer.shape}")
  in_dtype = types.dtype_of(bayer)
  out_dtype = in_dtype if dtype is None else types.canonical_dtype(dtype)
  cc = None
  if correct_colors is not None:
    cc = tuple(np.asarray(correct_colors, np.float32).flatten().tolist())
  return _bayer_to_rgb(jnp.asarray(bayer), pattern, cc, in_dtype,
                       out_dtype, method)


@partial(jax.jit, static_argnames=("pixel_order",))
def _rgb_to_bayer(image, pixel_order):
  h, w = image.shape[:2]
  hh, wh = h // 2, w // 2
  p1, p2, p3, p4 = pixel_order
  x = image.reshape(hh, 2, wh, 2, 3)
  quad = jnp.stack([
      jnp.stack([x[:, 0, :, 0, p1], x[:, 0, :, 1, p2]], axis=-1),
      jnp.stack([x[:, 1, :, 0, p3], x[:, 1, :, 1, p4]], axis=-1),
  ], axis=1)  # (hh, 2, wh, 2)
  return quad.reshape(h, w)


def rgb_to_bayer(image, pattern: BayerPattern = BayerPattern.RGGB):
  """Mosaic an RGB image to a single-channel CFA by 2x2 phase sampling
  (reference bayer.py:101-112,193-198)."""
  image = jnp.asarray(image)
  if image.ndim != 3 or image.shape[2] != 3:
    raise ValueError(f"image must be RGB (H, W, 3), got {image.shape}")
  return _rgb_to_bayer(jnp.asarray(image), pattern.pixel_order)
