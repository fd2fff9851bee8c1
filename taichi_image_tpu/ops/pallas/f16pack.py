"""f16-in-i32 packed I/O for Mosaic kernels.

The axon Mosaic toolchain cannot read or write f16 (docs/PERFORMANCE.md
capability matrix), so kernels over f16 data either pay an XLA f16->f32
materialization (slow: XLA elementwise passes run ~60-180 GB/s vs ~327
GB/s for Pallas DMA) or read doubled f32 bytes. This module packs f16
values PAIRWISE ALONG THE CHANNEL AXIS into i32 words — channel-major
packing is a free elementwise op in XLA (no lane relayout) — and
emulates the f16<->f32 conversions inside the kernel with integer ops
(i32 shifts/masks/selects and i32->f32 converts all work in Mosaic).

The emulations are BITWISE-equal to XLA's converts, including
subnormals, +-0, +-inf and NaN (canonicalized like XLA: quiet bit set)
and round-to-nearest-even on encode; tests/test_f16pack.py checks the
decode exhaustively over all 65536 patterns and the encode against
jnp.astype on dense samples and every boundary neighborhood.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def f16_bits_to_f32(u):
  """i32 array of f16 bit patterns (0..65535) -> f32 values (exact)."""
  u = u.astype(jnp.int32) & 0xFFFF
  sign = (u >> 15) & 0x1
  exp = (u >> 10) & 0x1F
  mant = u & 0x3FF

  # normal: f32 = (sign<<31) | ((exp-15+127)<<23) | (mant<<13)
  normal_bits = (sign << 31) | ((exp + 112) << 23) | (mant << 13)
  normal = jax.lax.bitcast_convert_type(normal_bits, jnp.float32)

  # subnormal (exp == 0): value = mant * 2^-24, exact in f32; i32->f32
  # convert is exact for |mant| <= 2^10
  sub_mag = mant.astype(jnp.float32) * jnp.float32(2.0 ** -24)
  sub = jnp.where(sign == 1, -sub_mag, sub_mag)

  # inf/nan (exp == 31): f32 exp 255, payload shifted; XLA's convert
  # QUIETS signaling NaNs (sets f32 bit 22), replicate that
  quiet = jnp.where(mant != 0, 0x400000, 0)
  special_bits = (sign << 31) | (0xFF << 23) | (mant << 13) | quiet
  special = jax.lax.bitcast_convert_type(special_bits, jnp.float32)

  out = jnp.where(exp == 0, sub, jnp.where(exp == 31, special, normal))
  return out


def f32_to_f16_bits(x):
  """f32 array -> i32 f16 bit patterns, round-to-nearest-even; bitwise
  equal to ``x.astype(jnp.float16)`` (XLA semantics: overflow -> inf,
  NaN -> quiet NaN with payload truncated)."""
  bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
  sign16 = (bits >> 16) & 0x8000
  absbits = bits & 0x7FFFFFFF
  exp = (absbits >> 23) & 0xFF
  mant = absbits & 0x7FFFFF

  # --- normal/overflow path (f32 exponent >= 113, i.e. f16 exp >= 1) ---
  # f16 exp field = exp - 112; round mantissa 23 -> 10 bits (RNE). Use
  # the classic trick: add the rounding increment to the COMBINED
  # exp|mant field so mantissa carry bumps the exponent automatically.
  comb = ((exp - 112) << 10) | (mant >> 13)
  tail = mant & 0x1FFF  # 13 dropped bits
  incr = jnp.where(
      tail > 0x1000, 1,
      jnp.where(tail < 0x1000, 0, comb & 1))  # ties-to-even
  rounded = comb + incr
  normal16 = jnp.where(rounded >= 0x7C00, 0x7C00, rounded)  # overflow->inf

  # --- subnormal path (f16 exp <= 0): value rounds to mant16/2^24 ------
  # shift = number of mantissa bits dropped: 13 + (113 - exp), clamped to
  # 31 (anything that small has round bit 0 and rounds to +-0, including
  # f32 subnormals where the implicit-1 OR below is harmless).
  shift = jnp.clip(126 - exp, 1, 31)
  full = mant | 0x800000  # implicit leading 1
  kept = full >> shift
  sm1 = shift - 1
  round_bit = (full >> sm1) & 1
  sticky = (full & (jnp.left_shift(1, sm1) - 1)) != 0
  incr_s = jnp.where(
      round_bit == 0, 0,
      jnp.where(sticky, 1, kept & 1))
  sub16 = kept + incr_s  # may carry into exp field = 1: correct (RNE)

  # --- special path (f32 exp == 255): inf or NaN ----------------------
  nan16 = 0x7E00 | (mant >> 13)  # quiet + truncated payload
  special16 = jnp.where(mant == 0, 0x7C00, nan16)

  use_sub = exp <= 112
  mag = jnp.where(exp == 255, special16,
                  jnp.where(use_sub, sub16, normal16))
  # exp==0 with mant==0 is +-0: sub path yields 0 naturally
  return sign16 | mag


def pack_channel_pairs(x_f16):
  """(N, 2k, H, W) f16 -> (N, k, H, W) i32: word = bits(ch 2i) |
  bits(ch 2i+1) << 16. Channel-major — no lane relayout."""
  u = jax.lax.bitcast_convert_type(x_f16, jnp.uint16).astype(jnp.int32)
  return u[:, 0::2] | (u[:, 1::2] << 16)


def unpack_channel_pairs(w_i32):
  """Inverse of :func:`pack_channel_pairs` -> (N, 2k, H, W) f16."""
  lo = (w_i32 & 0xFFFF).astype(jnp.uint16)
  hi = ((w_i32 >> 16) & 0xFFFF).astype(jnp.uint16)
  n, k, h, ww = w_i32.shape
  both = jnp.stack([lo, hi], axis=2).reshape(n, 2 * k, h, ww)
  return jax.lax.bitcast_convert_type(both, jnp.float16)
