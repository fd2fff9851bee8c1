"""Interpret-mode tests for the Pallas tonemap-finish kernel
(ops/pallas/finish): bitwise equality against the XLA finish chain
``reinhard_gamma_ca``/``linear_apply_ca`` + ``phases_to_planar_stack``
(reference camera_isp.py:211-218 math, planar u8 output contract).

Like all Pallas tests these run the kernel LOGIC in interpret mode on
CPU; the on-chip lowering is asserted separately by tools/verify_tpu.py
(finish_kernel_* checks) — the i32 additive byte pack and the one-hot
MXU dots are exactly the op families with known chip-only hazards.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from taichi_image_tpu.models.camera_isp import (linear_apply_ca,
                                                reinhard_gamma_ca)
from taichi_image_tpu.ops.bayer import phases_to_planar_stack
from taichi_image_tpu.ops.pallas import finish as pl_fin


def _x12(n=2, hh=16, wh=256, seed=0):
  rng = np.random.default_rng(seed)
  # values spanning [0, ~1.2] like a pre-gamma Reinhard map output
  x = rng.random((n, 12, hh, wh), np.float32) * 1.2
  return jnp.asarray(x, jnp.bfloat16)


def _xla_reinhard(x12, max_out, gamma):
  u8_12 = reinhard_gamma_ca(x12, max_out, gamma)
  return phases_to_planar_stack(u8_12.reshape(x12.shape[0], 12,
                                              *x12.shape[2:]))


def _xla_linear(x12, metrics, gamma):
  n, _, hh, wh = x12.shape
  u8_12 = linear_apply_ca(x12.reshape(n, 4, 3, hh, wh), metrics,
                          gamma).reshape(n, 12, hh, wh)
  return phases_to_planar_stack(u8_12)


@pytest.mark.parametrize("gamma", [1.0, 2.2])
def test_reinhard_finish_bitwise(gamma):
  x12 = _x12()
  max_out = jnp.asarray([[[[1.13]]], [[[0.97]]]], jnp.float32)
  want = np.asarray(_xla_reinhard(x12, max_out, gamma))
  got = np.asarray(pl_fin.finish_planar_u8(x12, max_out, "reinhard",
                                           gamma, interpret=True))
  assert got.shape == want.shape == (2, 3, 32, 512)
  np.testing.assert_array_equal(got, want)


def test_reinhard_finish_max_clamp_and_saturation():
  # max_out below the 1e-6 clamp and p values far above max: the clip
  # path and the 1e-6 clamp must match the XLA finish exactly
  x12 = _x12(seed=3)
  max_out = jnp.asarray([[[[0.0]]], [[[0.4]]]], jnp.float32)
  want = np.asarray(_xla_reinhard(x12, max_out, 1.0))
  got = np.asarray(pl_fin.finish_planar_u8(x12, max_out, "reinhard",
                                           1.0, interpret=True))
  np.testing.assert_array_equal(got, want)
  assert got.max() == 255  # saturation actually exercised


@pytest.mark.parametrize("gamma", [1.0, 1.8])
def test_linear_finish_bitwise(gamma):
  x12 = _x12(seed=5)
  metrics = jnp.asarray([0.05, 0.9, -3.0, 0.0, -1.0, 0.4, 0.4, 0.4,
                         0.4], jnp.float32)
  want = np.asarray(_xla_linear(x12, metrics, gamma))
  got = np.asarray(pl_fin.finish_planar_u8(x12, metrics, "linear",
                                           gamma, interpret=True))
  np.testing.assert_array_equal(got, want)


def test_interleave_is_exact_movement():
  # a phase-channel ramp makes any interleave mistake visible: every
  # planar 2x2 block must hold its four phase channels in (pc, pr) order
  n, hh, wh = 1, 8, 256
  x = np.zeros((n, 12, hh, wh), np.float32)
  for ch in range(12):
    x[:, ch] = ch / 255.0
  x12 = jnp.asarray(x, jnp.bfloat16)
  max_out = jnp.ones((n, 1, 1, 1), jnp.float32)
  out = np.asarray(pl_fin.finish_planar_u8(x12, max_out, "reinhard",
                                           1.0, interpret=True))
  for pc in range(2):
    for pr in range(2):
      for c in range(3):
        ch = pc * 6 + pr * 3 + c
        want = int(np.floor(np.clip(
            np.float32(ch) / 255.0 * 255.0, 0, 255)))
        block = out[:, c, pr::2, pc::2]
        assert (block == want).all(), (pc, pr, c)


def test_tiling_gate():
  assert pl_fin.finish_tiling(2160, 3840) is not None  # 8K half-res
  assert pl_fin.finish_tiling(1080, 1920) is None      # 4K: 1920 % 256
  assert pl_fin.finish_tiling(16, 128) is None         # wh < 256
