"""Tonemap parity tests vs the numpy oracle (incl. the negated log-max
quirk of the standalone Reinhard path, reference tonemap.py:102)."""

import numpy as np
import pytest

from taichi_image_tpu.ops import tonemap
from conftest import make_test_rgb

psnr_src = make_test_rgb(48, 64)

from oracle import tonemap_linear_oracle, tonemap_reinhard_oracle


@pytest.mark.parametrize("gamma", [1.0, 0.6, 2.2])
def test_linear_vs_oracle_f32(gamma):
  src = psnr_src * 3.0 + 0.25  # non-trivial bounds
  got = np.asarray(tonemap.tonemap_linear(src, gamma=gamma,
                                          dtype=np.float32))
  want = tonemap_linear_oracle(src, gamma=gamma, dtype=np.float32)
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_linear_u8(rng):
  src = (psnr_src * 60000).astype(np.uint16)
  got = np.asarray(tonemap.tonemap_linear(src, gamma=0.8))
  want = tonemap_linear_oracle(src, gamma=0.8)
  assert got.dtype == np.uint8
  assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


@pytest.mark.parametrize("params", [
    dict(),
    dict(gamma=0.6, intensity=3.0),
    dict(light_adapt=0.8, color_adapt=0.5),
    dict(gamma=0.9, intensity=1.0, light_adapt=0.9, color_adapt=0.0),
])
def test_reinhard_vs_oracle(params):
  src = psnr_src * 2.0
  got = np.asarray(tonemap.tonemap_reinhard(src, dtype=np.float32,
                                            **params))
  want = tonemap_reinhard_oracle(src, dtype=np.float32, **params)
  np.testing.assert_allclose(got, want, atol=2e-4)


def test_reinhard_u8_default():
  src = psnr_src.astype(np.float32)
  got = np.asarray(tonemap.tonemap_reinhard(src))
  want = tonemap_reinhard_oracle(src)
  assert got.dtype == np.uint8
  assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
  assert (got != want).mean() < 0.02


def test_reinhard_negated_logmax_quirk():
  # the standalone metering's vec7 has a NEGATED log-max (tonemap.py:102)
  src = make_test_rgb(16, 16)
  stats = np.asarray(tonemap.metering(src))
  gray = src @ np.array([0.299, 0.587, 0.114], np.float32)
  log_gray = np.log(np.maximum(gray, 1e-4))
  np.testing.assert_allclose(stats[0], log_gray.min(), atol=1e-5)
  np.testing.assert_allclose(stats[1], -log_gray.max(), atol=1e-5)


def test_metering_roundtrip_np():
  m = tonemap.metering_from_np(np.arange(7, dtype=np.float32))
  v = tonemap.metering_to_np(m)
  np.testing.assert_allclose(v, np.arange(7), atol=0)
