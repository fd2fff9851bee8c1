"""f16-in-i32 packed kernel I/O: bitwise-exactness of the integer
f16<->f32 conversion emulations (ops/pallas/f16pack.py) vs XLA's
converts, plus the channel-pair packing roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taichi_image_tpu.ops.pallas import f16pack


def test_decode_exhaustive_all_65536():
  """Every f16 bit pattern decodes to the bit-identical f32 that XLA's
  f16->f32 convert produces (incl. subnormals, +-0, +-inf, NaNs)."""
  u = jnp.arange(65536, dtype=jnp.int32)
  got = np.asarray(f16pack.f16_bits_to_f32(u))
  want = np.asarray(
      jax.lax.bitcast_convert_type(u.astype(jnp.uint16), jnp.float16)
      .astype(jnp.float32))
  np.testing.assert_array_equal(got.view(np.uint32), want.view(np.uint32))


def _encode_check(x_f32):
  got = np.asarray(f16pack.f32_to_f16_bits(jnp.asarray(x_f32)),
                   np.int32).astype(np.uint16)
  want = np.asarray(jnp.asarray(x_f32).astype(jnp.float16)).view(np.uint16)
  bad = got != want
  assert not bad.any(), (
      f"{bad.sum()} mismatches; first at x={x_f32[np.argmax(bad)]!r}: "
      f"got {got[np.argmax(bad)]:#06x} want {want[np.argmax(bad)]:#06x}")


def test_encode_roundtrip_all_f16_values():
  """Encoding every exactly-representable f16 value returns its own bits
  (identity roundtrip through f32)."""
  u = np.arange(65536, dtype=np.uint16)
  f = u.view(np.float16).astype(np.float32)
  finite = np.isfinite(u.view(np.float16))
  got = np.asarray(f16pack.f32_to_f16_bits(jnp.asarray(f)),
                   np.int32).astype(np.uint16)
  np.testing.assert_array_equal(got[finite], u[finite])
  # infinities too
  infs = np.isinf(u.view(np.float16))
  np.testing.assert_array_equal(got[infs], u[infs])


def test_encode_rounding_boundaries():
  """Half-ulp boundaries around every finite f16 value (the RNE cases),
  plus overflow and subnormal-threshold neighborhoods."""
  u = np.arange(65536, dtype=np.uint16)
  f16 = u.view(np.float16)
  finite = np.isfinite(f16) & (f16 == f16)
  vals = f16[finite].astype(np.float64)
  vals = np.unique(vals)
  mids = (vals[:-1] + vals[1:]) / 2.0  # exact ties in f64
  probes = np.concatenate([
      mids, np.nextafter(mids, -np.inf), np.nextafter(mids, np.inf),
      [65504.0, 65519.999, 65520.0, 65520.001, 1e30, -1e30,
       2.0 ** -24, 2.0 ** -25, np.nextafter(2.0 ** -25, 1),
       2.0 ** -26, -2.0 ** -25, 5.96e-8, 0.0, -0.0],
  ]).astype(np.float32)
  _encode_check(probes)


def test_encode_random_dense(rng):
  x = (rng.random(2_000_000, dtype=np.float32) * 4 - 1).astype(np.float32)
  _encode_check(x)
  # tiny magnitudes exercising the subnormal path
  t = (rng.random(500_000, dtype=np.float32) * 2e-4).astype(np.float32)
  _encode_check(t)
  _encode_check(-t)


def test_encode_nan_is_quiet_nan():
  got = np.asarray(f16pack.f32_to_f16_bits(
      jnp.asarray([np.nan, -np.nan], np.float32)), np.int32)
  for g in got.astype(np.uint16):
    assert (g & 0x7C00) == 0x7C00 and (g & 0x03FF) != 0  # a NaN
    assert (g & 0x0200) != 0  # quiet bit


def test_pack_unpack_roundtrip(rng):
  x = rng.random((2, 12, 16, 128)).astype(np.float16)
  w = f16pack.pack_channel_pairs(jnp.asarray(x))
  assert w.shape == (2, 6, 16, 128) and w.dtype == jnp.int32
  back = np.asarray(f16pack.unpack_channel_pairs(w))
  np.testing.assert_array_equal(back.view(np.uint16), x.view(np.uint16))


def test_pack_then_kernel_style_decode(rng):
  """unpack-in-integer (as a kernel would) == unpack via bitcast."""
  x = rng.random((1, 4, 8, 128)).astype(np.float16)
  w = f16pack.pack_channel_pairs(jnp.asarray(x))
  lo = f16pack.f16_bits_to_f32(w & 0xFFFF)
  hi = f16pack.f16_bits_to_f32((w >> 16) & 0xFFFF)
  want = np.asarray(jnp.asarray(x).astype(jnp.float32))
  np.testing.assert_array_equal(np.asarray(lo), want[:, 0::2])
  np.testing.assert_array_equal(np.asarray(hi), want[:, 1::2])
