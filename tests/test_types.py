"""Dtype convention and kernel-table tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from taichi_image_tpu import types
from taichi_image_tpu.ops import kernel


def test_scale_factors():
  assert types.scale_of(np.uint8) == 255
  assert types.scale_of(np.uint16) == 65535
  assert types.scale_of(np.int16) == 32767
  assert types.scale_of(np.float16) == 1.0
  assert types.scale_of(jnp.bfloat16) == 1.0
  assert types.scale_of(np.float32) == 1.0


def test_canonical_rejects_unknown():
  with pytest.raises(ValueError):
    types.canonical_dtype(np.float64)
  with pytest.raises(ValueError):
    types.canonical_dtype(np.int32)


def test_to_from_float_roundtrip():
  x = jnp.asarray(np.array([0, 128, 255], np.uint8))
  f = types.to_float(x)
  np.testing.assert_allclose(np.asarray(f), [0, 128 / 255, 1.0], atol=1e-6)
  back = types.from_float(f, np.uint8)
  assert np.array_equal(np.asarray(back), [0, 128, 255])


def test_from_float_truncates():
  f = jnp.asarray([0.999, 1.0], jnp.float32)
  out = np.asarray(types.from_float(f, np.uint8))
  assert out[0] == 254  # 0.999*255 = 254.745 -> truncation
  assert out[1] == 255


def test_mirror_symmetrical():
  assert kernel.mirror([1, 2, 3]) == [1, 2, 3, 2, 1]
  # rows mirrored within and across: [(1,), (2,3)] -> [1],[2,3,2],[1]
  assert kernel.symmetrical([(1,), (2, 3)]) == [1, 2, 3, 2, 1]


def test_kernel_square():
  taps = kernel.kernel_square(list(range(9)), n=3)
  assert len(taps) == 9
  assert taps[0] == ((-1, -1), 0)
  assert taps[4] == ((0, 0), 4)


def test_conv_identity():
  img = np.random.default_rng(0).integers(
      0, 255, (8, 10, 3)).astype(np.uint8)
  taps = (((0, 0), 1),)
  out = np.asarray(kernel.conv(img, taps))
  assert np.array_equal(out, img)


def test_conv_box_blur_constant():
  img = np.full((8, 8, 3), 100, np.uint8)
  taps = kernel.kernel_square([1] * 9, n=3)
  out = np.asarray(kernel.conv(img, taps))
  # clamped borders keep a constant image constant
  assert np.array_equal(out, img)


def test_conv_clamps_output():
  img = np.full((4, 4, 3), 255, np.uint8)
  taps = (((0, 0), 1),)
  out = np.asarray(kernel.conv(img, taps))
  assert out.max() == 255


def test_packed_mono12_random_access(rng):
  from taichi_image_tpu.ops.packed import PackedMono12, encode12
  img = rng.integers(0, 2 ** 12, size=(8, 12)).astype(np.uint16)
  packed = np.asarray(encode12(img))
  view = PackedMono12(packed)
  assert view.shape == (8, 12)
  rows = np.repeat(np.arange(8), 12)
  cols = np.tile(np.arange(12), 8)
  got = np.asarray(view[rows, cols]).reshape(8, 12)
  assert np.array_equal(got, img)
  # full decode matches
  assert np.array_equal(np.asarray(view.decode()), img)


def test_psnr_util():
  from taichi_image_tpu.utils.image import mse, psnr
  a = np.zeros((4, 4), np.uint8)
  b = np.full((4, 4), 16, np.uint8)
  assert abs(psnr(a, b) - 10 * np.log10(255 ** 2 / 256)) < 1e-6
  assert psnr(a, a) == float("inf")
  assert mse(a, b) == 256.0


def test_stage_timer():
  from taichi_image_tpu.utils.profiling import stage_timer
  stats = {}
  with stage_timer(stats, "x"):
    pass
  assert "x" in stats and stats["x"] >= 0


def test_dlpack_torch_roundtrip():
  """torch tensor -> jax (zero-copy CPU) -> ops -> back to torch
  (restores the reference's torch-tensor ergonomics, types.py:29-49)."""
  import torch
  from taichi_image_tpu import types

  t = torch.arange(48, dtype=torch.float32).reshape(6, 8) / 48.0
  x = types.from_torch(t)
  assert np.allclose(np.asarray(x), t.numpy())

  back = types.to_torch(x * 2.0)
  assert isinstance(back, torch.Tensor)
  assert torch.allclose(back, t * 2.0)


def test_dlpack_torch_u8_and_u16():
  import torch
  from taichi_image_tpu import types

  u8 = torch.randint(0, 255, (4, 6), dtype=torch.uint8)
  x = types.from_torch(u8)
  assert x.dtype == np.uint8
  assert np.array_equal(np.asarray(x), u8.numpy())


def test_dlpack_into_isp_pipeline():
  """A torch-held packed12 buffer feeds the ISP without host numpy."""
  import torch
  from taichi_image_tpu.models.camera_isp import Camera32
  from taichi_image_tpu.ops.bayer import BayerPattern
  from taichi_image_tpu import types

  raw_np = np.random.default_rng(0).integers(
      0, 256, size=(2, 16, 36), dtype=np.uint8)
  raw_torch = torch.from_numpy(raw_np.copy())
  isp = Camera32(BayerPattern.RGGB)
  out_t = isp.process(types.from_torch(raw_torch))
  out_n = isp.process(raw_np)
  # same pipeline, same bytes (metrics EMA differs after first call, so
  # compare fresh instances)
  isp2 = Camera32(BayerPattern.RGGB)
  out_n = isp2.process(raw_np)
  assert np.array_equal(np.asarray(out_t), np.asarray(out_n))
