"""Color conversions: grayscale, sRGB helpers, and planar YUV420 (I420).

Reference: ``taichi_image/color/__init__.py`` and
``taichi_image/color/yuv_420.py``.

Parity traps replicated exactly (SURVEY.md §2.8):
  * the conversion matrix is applied to the CHANNEL-REVERSED vector
    (``rgb_YCrCb(rgb) = M @ rgb.bgr``, yuv_420.py:20-26), and inverted on
    the way back, so the roundtrip is self-consistent;
  * the UV planes are written V-then-U relative to plane index
    (``uv_image[1] = out_uv.x; uv_image[0] = out_uv.y``, yuv_420.py:62-64);
  * clamps are ``tm.clamp(0, 1, x)`` — with clamp(v, lo, hi) semantics that
    is ``min(1, x)``: an upper clamp only (yuv_420.py:59,62,90).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from taichi_image_tpu import types

__all__ = [
    "rgb_gray", "bgr_gray", "rgb_linear", "rgb_ciexyz",
    "rgb_yuv420", "yuv420_rgb", "split_yuv_420",
    "rgb_yuv420_image", "yuv420_rgb_image",
    "bgr_YCrCb", "rgb_YCrCb", "YCrCb_bgr", "YCrCb_rgb",
]

_GRAY = np.array([0.299, 0.587, 0.114], np.float32)

# Full-range BT.601 matrix (reference yuv_420.py:12-16); applied to the
# channel-reversed input vector.
_YUV_M = np.array([
    [0.299, 0.587, 0.114],
    [-0.168736, -0.331264, 0.5],
    [0.5, -0.418688, -0.081312],
], np.float32)
_YUV_M_INV = np.linalg.inv(_YUV_M.astype(np.float64)).astype(np.float32)
_YUV_OFFSET = np.array([0.0, 0.5, 0.5], np.float32)


def bgr_YCrCb(bgr):
  """(..., 3) BGR [0,1] -> full-range YCrCb with the +0.5 chroma offset
  (reference yuv_420.py:20-22)."""
  y = jnp.einsum("...c,dc->...d", jnp.asarray(bgr, jnp.float32),
                 jnp.asarray(_YUV_M), precision=jax.lax.Precision.HIGHEST)
  return y + jnp.asarray(_YUV_OFFSET)


def rgb_YCrCb(rgb):
  """(..., 3) RGB -> YCrCb: the matrix applies to the channel-REVERSED
  vector (reference yuv_420.py:25-26)."""
  return bgr_YCrCb(jnp.asarray(rgb)[..., ::-1])


def YCrCb_bgr(ycrcb):
  """Inverse of :func:`bgr_YCrCb` (reference yuv_420.py:29-30; the
  inverse matrix is computed at import like ``bgr_T_YCrCb``)."""
  return jnp.einsum("...c,dc->...d",
                    jnp.asarray(ycrcb, jnp.float32)
                    - jnp.asarray(_YUV_OFFSET),
                    jnp.asarray(_YUV_M_INV),
                    precision=jax.lax.Precision.HIGHEST)


def YCrCb_rgb(ycrcb):
  """(reference yuv_420.py:33-34)."""
  return YCrCb_bgr(ycrcb)[..., ::-1]


def rgb_gray(rgb):
  """Rec.601 luma: 0.299 R + 0.587 G + 0.114 B (reference color/__init__.py:7-10)."""
  return (rgb[..., 0] * _GRAY[0] + rgb[..., 1] * _GRAY[1]
          + rgb[..., 2] * _GRAY[2])


def bgr_gray(bgr):
  """Reference color/__init__.py:12-15."""
  return (bgr[..., 0] * _GRAY[2] + bgr[..., 1] * _GRAY[1]
          + bgr[..., 2] * _GRAY[0])


def rgb_linear(rgb):
  """sRGB EOTF linearization (reference color/__init__.py:17-20)."""
  return jnp.where(rgb <= 0.04045, rgb / 12.92,
                   jnp.power((rgb + 0.055) / 1.055, 2.4))


_XYZ_M = np.array([
    [0.4124564, 0.3575761, 0.1804375],
    [0.2126729, 0.7151522, 0.0721750],
    [0.0193339, 0.1191920, 0.9503041],
], np.float32)


def rgb_ciexyz(rgb):
  """sRGB -> CIEXYZ (reference color/__init__.py:22-30)."""
  linear = rgb_linear(rgb)
  return jnp.einsum("...c,dc->...d", linear, jnp.asarray(_XYZ_M),
                    precision=jax.lax.Precision.HIGHEST)


def _upper_clamp(x):
  """tm.clamp(0, 1, x) quirk == min(1, x) (reference yuv_420.py:59)."""
  return jnp.minimum(1.0, x)


@partial(jax.jit, static_argnames=("in_dtype", "out_dtype"))
def _rgb_yuv420(src, in_dtype, out_dtype):
  h, w = src.shape[:2]
  in_scale = types.scale_of(in_dtype)
  out_scale = types.scale_of(out_dtype)
  x = src.astype(jnp.float32) / in_scale
  bgr = x[..., ::-1]
  yuv = jnp.einsum("...c,dc->...d", bgr, jnp.asarray(_YUV_M),
                  precision=jax.lax.Precision.HIGHEST) + _YUV_OFFSET
  y = _upper_clamp(yuv[..., 0])
  uv = yuv[..., 1:].reshape(h // 2, 2, w // 2, 2, 2).sum(axis=(1, 3)) / 4.0
  uv = _upper_clamp(uv)
  out_dt = types.canonical_dtype(out_dtype)

  def cast(v):
    v = v * out_scale
    if out_dt.kind in "ui":
      v = jnp.clip(v, 0, out_scale)
    return v.astype(out_dt)

  y_img = cast(y)
  # V-then-U plane order quirk (yuv_420.py:62-64)
  uv_img = jnp.stack([cast(uv[..., 1]), cast(uv[..., 0])], axis=0)
  return y_img, uv_img


@partial(jax.jit, static_argnames=("in_dtype", "out_dtype"))
def _yuv420_rgb(y_img, uv_img, in_dtype, out_dtype):
  in_scale = types.scale_of(in_dtype)
  out_scale = types.scale_of(out_dtype)
  y = y_img.astype(jnp.float32)
  u = jnp.repeat(jnp.repeat(uv_img[1].astype(jnp.float32), 2, 0), 2, 1)
  v = jnp.repeat(jnp.repeat(uv_img[0].astype(jnp.float32), 2, 0), 2, 1)
  yuv = jnp.stack([y, u, v], axis=-1) / in_scale
  bgr = jnp.einsum("...c,dc->...d", yuv - _YUV_OFFSET,
                   jnp.asarray(_YUV_M_INV),
                   precision=jax.lax.Precision.HIGHEST)
  rgb = bgr[..., ::-1]
  rgb = _upper_clamp(rgb)
  out_dt = types.canonical_dtype(out_dtype)
  v = rgb * out_scale
  if out_dt.kind in "ui":
    v = jnp.clip(v, 0, out_scale)
  return v.astype(out_dt)


def rgb_yuv420(src, dtype=None):
  """RGB -> (Y plane, (2, H/2, W/2) chroma planes).

  Reference kernel yuv_420.py:38-66: per 2x2 block, 4 Y samples and the
  mean of the 4 chroma samples, with the V/U plane-order quirk.
  """
  in_dtype = types.dtype_of(src)
  out_dtype = in_dtype if dtype is None else types.canonical_dtype(dtype)
  return _rgb_yuv420(jnp.asarray(src), in_dtype, out_dtype)


def yuv420_rgb(y_img, uv_img, dtype=None):
  """(Y, UV planes) -> RGB (reference yuv_420.py:68-92)."""
  in_dtype = types.dtype_of(y_img)
  out_dtype = in_dtype if dtype is None else types.canonical_dtype(dtype)
  return _yuv420_rgb(jnp.asarray(y_img), jnp.asarray(uv_img), in_dtype,
                     out_dtype)


def split_yuv_420(yuv):
  """Slice a single (3H/2, W) I420 buffer into Y and (2, H/2, W/2) UV
  (reference yuv_420.py:95-102)."""
  height = yuv.shape[0] * 2 // 3
  width = yuv.shape[1]
  y = yuv[:height]
  uv = yuv[height:].reshape(2, height // 2, width // 2)
  return y, uv, (width, height)


def rgb_yuv420_image(src, dtype=None):
  """RGB -> single (3H/2, W) planar I420 buffer (reference
  yuv_420.py:105-119)."""
  in_dtype = types.dtype_of(src)
  out_dtype = in_dtype if dtype is None else types.canonical_dtype(dtype)
  y, uv = _rgb_yuv420(jnp.asarray(src), in_dtype, out_dtype)
  h, w = src.shape[:2]
  return jnp.concatenate([y, uv.reshape(h // 2, w)], axis=0)


def yuv420_rgb_image(yuv, dtype=None):
  """(3H/2, W) planar I420 buffer -> RGB (reference yuv_420.py:121-131)."""
  in_dtype = types.dtype_of(yuv)
  out_dtype = in_dtype if dtype is None else types.canonical_dtype(dtype)
  y, uv, (w, h) = split_yuv_420(jnp.asarray(yuv))
  return _yuv420_rgb(y, uv, in_dtype, out_dtype)
