"""Image quality metrics.

The reference checks demosaic quality as PSNR against independent
implementations (test/bayer.py:18-23, test/compare_bayer.py:31-44); this
module provides the metric itself so users and CI can do the same.
"""

from __future__ import annotations

import numpy as np

from taichi_image_tpu import types


def psnr(a, b, peak: float = None) -> float:
  """Peak signal-to-noise ratio in dB. ``peak`` defaults to the
  full-scale value of ``a``'s dtype (normalized convention)."""
  a = np.asarray(a)
  b = np.asarray(b)
  if peak is None:
    peak = types.scale_of(a.dtype)
  x = a.astype(np.float64)
  y = b.astype(np.float64)
  mse = np.mean((x - y) ** 2)
  if mse == 0:
    return float("inf")
  return float(10.0 * np.log10(peak * peak / mse))


def mse(a, b) -> float:
  a = np.asarray(a, dtype=np.float64)
  b = np.asarray(b, dtype=np.float64)
  return float(np.mean((a - b) ** 2))
