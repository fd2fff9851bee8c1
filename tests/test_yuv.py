"""YUV420 parity tests (V/U plane swap + min(1,x) clamp quirks)."""

import numpy as np
import pytest

from taichi_image_tpu.ops import color
from conftest import make_test_rgb, psnr
from oracle import rgb_yuv420_oracle, yuv420_rgb_oracle


def test_rgb_yuv420_vs_oracle_f32():
  src = make_test_rgb(32, 48)
  got = np.asarray(color.rgb_yuv420_image(src))
  want = rgb_yuv420_oracle(src)
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_rgb_yuv420_u8_vs_oracle():
  src = (make_test_rgb(32, 48) * 255).astype(np.uint8)
  got = np.asarray(color.rgb_yuv420_image(src))
  want = rgb_yuv420_oracle(src)
  assert got.dtype == np.uint8
  assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_yuv420_rgb_vs_oracle():
  src = make_test_rgb(32, 48)
  yuv = rgb_yuv420_oracle(src)
  got = np.asarray(color.yuv420_rgb_image(yuv))
  want = yuv420_rgb_oracle(yuv)
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_roundtrip_psnr():
  src = make_test_rgb(64, 96)
  yuv = color.rgb_yuv420_image(src)
  rgb = np.asarray(color.yuv420_rgb_image(yuv))
  # chroma is 2x2 subsampled; luma is exact — roundtrip should be close
  assert psnr(rgb, src) > 30


def test_roundtrip_u8():
  src = (make_test_rgb(64, 64) * 255).astype(np.uint8)
  yuv = color.rgb_yuv420_image(src)
  assert np.asarray(yuv).dtype == np.uint8
  rgb = np.asarray(color.yuv420_rgb_image(yuv))
  assert psnr(rgb.astype(np.float32) / 255,
              src.astype(np.float32) / 255) > 28


def test_split_shapes():
  yuv = np.zeros((48, 32), np.uint8)  # H=32
  y, uv, (w, h) = color.split_yuv_420(yuv)
  assert y.shape == (32, 32) and uv.shape == (2, 16, 16)
  assert (w, h) == (32, 32)


def test_gray():
  rgb = np.array([[[1.0, 0.0, 0.0]]], np.float32)
  np.testing.assert_allclose(color.rgb_gray(rgb), [[0.299]], atol=1e-6)
  np.testing.assert_allclose(color.bgr_gray(rgb), [[0.114]], atol=1e-6)


def test_ciexyz_white():
  white = np.ones((1, 1, 3), np.float32)
  xyz = np.asarray(color.rgb_ciexyz(white))
  np.testing.assert_allclose(xyz[0, 0], [0.9505, 1.0, 1.089], atol=1e-3)


def test_point_conversions_roundtrip(rng):
  """rgb_YCrCb/YCrCb_rgb and bgr variants (reference yuv_420.py:20-34):
  matrix applied to the channel-reversed vector, +0.5 chroma offset,
  roundtrip to f32 tolerance."""
  import jax.numpy as jnp
  from taichi_image_tpu.ops import color
  rgb = jnp.asarray(rng.random((5, 7, 3)), jnp.float32)
  y = np.asarray(color.rgb_YCrCb(rgb))
  # Y channel equals the luma of the REVERSED vector fed to row 0:
  # row0 . bgr = .299 B + .587 G + .114 R (the reference quirk)
  want_y = (0.299 * np.asarray(rgb)[..., 2] + 0.587 * np.asarray(rgb)[..., 1]
            + 0.114 * np.asarray(rgb)[..., 0])
  np.testing.assert_allclose(y[..., 0], want_y, rtol=1e-5, atol=1e-6)
  assert y[..., 1:].min() >= -0.1 and y[..., 1:].max() <= 1.1
  back = np.asarray(color.YCrCb_rgb(jnp.asarray(y)))
  np.testing.assert_allclose(back, np.asarray(rgb), rtol=1e-4, atol=1e-5)
  bgr = rgb[..., ::-1]
  np.testing.assert_allclose(np.asarray(color.bgr_YCrCb(bgr)), y,
                             rtol=1e-6, atol=1e-7)
  np.testing.assert_allclose(np.asarray(color.YCrCb_bgr(jnp.asarray(y))),
                             np.asarray(bgr), rtol=1e-4, atol=1e-5)
