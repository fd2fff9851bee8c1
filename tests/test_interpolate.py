"""Resize & transform parity tests."""

import numpy as np
import pytest

from taichi_image_tpu.ops import interpolate as interp
from conftest import make_test_rgb
from oracle import resize_bilinear_oracle

T = interp.ImageTransform


def _ref_transform(src, t):
  """Independent numpy mirror of the reference gather semantics
  (interpolate.py:36-54): dst[i,j] = src[transformed(dst.shape, (i,j))]."""
  h, w = src.shape[:2]
  if t == T.none:
    return src
  if t == T.rotate_90:  # clockwise
    out = np.zeros((w, h) + src.shape[2:], src.dtype)
    for i in range(w):
      for j in range(h):
        out[i, j] = src[h - j - 1, i]
    return out
  if t == T.rotate_180:
    return src[::-1, ::-1]
  if t == T.rotate_270:
    out = np.zeros((w, h) + src.shape[2:], src.dtype)
    for i in range(w):
      for j in range(h):
        out[i, j] = src[j, w - i - 1]
    return out
  if t == T.transpose:
    return np.swapaxes(src, 0, 1)
  if t == T.flip_horiz:
    return src[:, ::-1]
  if t == T.flip_vert:
    return src[::-1]
  if t == T.transverse:
    return np.swapaxes(src, 0, 1)[::-1, ::-1]
  raise ValueError(t)


@pytest.mark.parametrize("t", list(T))
def test_transforms_vs_reference_semantics(t):
  src = (make_test_rgb(12, 20) * 255).astype(np.uint8)
  got = np.asarray(interp.transform(src, t))
  want = _ref_transform(src, t)
  assert got.shape == want.shape
  assert np.array_equal(got, want)


@pytest.mark.parametrize("t", list(T))
def test_transformed_size(t):
  src = make_test_rgb(10, 16)
  out = interp.transform(src, t)
  w, h = interp.transformed_size((16, 10), t)  # (w, h) convention
  assert out.shape[:2] == (h, w)


def test_rotations_compose():
  src = (make_test_rgb(8, 12) * 255).astype(np.uint8)
  r90 = interp.transform(src, T.rotate_90)
  r180 = interp.transform(r90, T.rotate_90)
  assert np.array_equal(np.asarray(r180),
                        np.asarray(interp.transform(src, T.rotate_180)))
  r270 = interp.transform(r180, T.rotate_90)
  assert np.array_equal(np.asarray(r270),
                        np.asarray(interp.transform(src, T.rotate_270)))


@pytest.mark.parametrize("scale", [0.5, 2.0, 0.3125])
def test_resize_scalar_scale_vs_oracle(scale):
  src = make_test_rgb(16, 24)
  h, w = src.shape[:2]
  size = (round(w * scale), round(h * scale))
  got = np.asarray(interp.resize_bilinear(src, size, scale))
  want = resize_bilinear_oracle(src, size, scale)
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_u8_truncating_cast():
  src = (make_test_rgb(16, 16) * 255).astype(np.uint8)
  got = np.asarray(interp.resize_bilinear(src, (24, 24), 1.5))
  want = resize_bilinear_oracle(src, (24, 24), 1.5).astype(np.uint8)
  assert got.dtype == np.uint8
  assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_resize_width_aspect():
  src = make_test_rgb(30, 60)
  out = interp.resize_width(src, 20)
  assert out.shape == (10, 20, 3)


def test_scale_bilinear():
  src = make_test_rgb(16, 32)
  out = interp.scale_bilinear(src, 0.5)
  assert out.shape == (8, 16, 3)


def test_resize_identity():
  src = make_test_rgb(16, 16)
  out = np.asarray(interp.resize_bilinear(src, (16, 16), 1.0))
  np.testing.assert_allclose(out, src, atol=1e-6)


def test_resize_nearest():
  src = make_test_rgb(8, 8)
  out = np.asarray(interp.resize_nearest(src, (16, 16), 2.0))
  assert out.shape == (16, 16, 3)
  np.testing.assert_allclose(out[::2, ::2], src, atol=0)
  # dtype intensity rescale
  out8 = np.asarray(interp.resize_nearest(src, (4, 4), 0.5,
                                          dtype=np.uint8))
  assert out8.dtype == np.uint8
