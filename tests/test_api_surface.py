"""Direct tests for public API names that were previously only exercised
transitively (or not at all): dtype helpers, pair-level packed codecs,
kernel-table builders, sRGB linearization, tonemap building blocks, the
dispatch NullExecutor, and the make_sharded_isp_step builder."""

import numpy as np
import pytest

import taichi_image_tpu as tit
from taichi_image_tpu import types
from taichi_image_tpu.ops import bayer, color, packed, tonemap


def test_dtype_helpers():
  assert types.dtype_of(np.zeros(3, np.uint16)) == types.u16
  assert types.is_float_dtype("float16")
  assert types.is_float_dtype(types.bf16)
  assert not types.is_float_dtype(np.uint8)
  with pytest.raises(ValueError, match="Unsupported"):
    types.canonical_dtype(np.int64)


def test_dlpack_generic_roundtrip():
  """from_dlpack/to_dlpack with a numpy producer/consumer."""
  x = np.arange(12, dtype=np.float32).reshape(3, 4)
  j = types.from_dlpack(x)
  assert np.array_equal(np.asarray(j), x)
  back = np.from_dlpack(types.to_dlpack(j * 2))
  assert np.array_equal(back, x * 2)


@pytest.mark.parametrize("ids", [False, True])
def test_packed_pair_level_api(rng, ids):
  """encode12_pairs/decode12_pairs match the flat-array codecs."""
  p0 = rng.integers(0, 4096, size=64).astype(np.uint16)
  p1 = rng.integers(0, 4096, size=64).astype(np.uint16)
  b0, b1, b2 = packed.encode12_pairs(p0, p1, ids_format=ids)
  flat = np.empty(128, np.uint16)
  flat[0::2], flat[1::2] = p0, p1
  want = np.asarray(packed.encode12(flat, ids_format=ids)).reshape(-1, 3)
  np.testing.assert_array_equal(np.asarray(b0), want[:, 0])
  np.testing.assert_array_equal(np.asarray(b1), want[:, 1])
  np.testing.assert_array_equal(np.asarray(b2), want[:, 2])
  q0, q1 = packed.decode12_pairs(b0, b1, b2, ids_format=ids)
  dec = np.asarray(packed.decode12(want.reshape(-1), ids_format=ids))
  np.testing.assert_array_equal(np.asarray(q0), dec[0::2])
  np.testing.assert_array_equal(np.asarray(q1), dec[1::2])


def test_kernel_table_builders():
  """Reference weight-table constructors (bayer.py:15-68)."""
  ks = bayer.make_bayer_kernels()
  assert len(ks) == 4
  for k in ks:
    assert len(k) == 13  # diamond taps
    for c in range(3):  # every channel's weights sum to 16
      assert sum(w[c] for _, w in k) == 16
  # diamond_kernel offsets are the 13-point diamond
  offs = [o for o, _ in bayer.diamond_kernel([0] * 13)]
  assert (0, 0) in offs and (-2, 0) in offs and (2, 0) in offs
  assert (-2, -1) not in offs
  # scale_kernel scales weights, preserves offsets
  scaled = bayer.scale_kernel(ks[0], (2.0, 1.0, 0.5))
  assert [o for o, _ in scaled] == [o for o, _ in ks[0]]
  assert scaled[0][1][0] == ks[0][0][1][0] * 2.0
  # pattern tables match the reference literals (bayer.py:85-97)
  assert bayer.pixel_orders[bayer.BayerPattern.RGGB] == (0, 1, 1, 2)
  assert bayer.kernel_patterns[bayer.BayerPattern.BGGR] == (3, 2, 1, 0)
  assert len(bayer.bilinear_kernels) == 4


def test_rgb_linear_srgb_eotf():
  """sRGB EOTF (reference color/__init__.py:17-20): linear below the
  knee, power curve above."""
  import jax.numpy as jnp
  x = jnp.asarray([0.0, 0.04, 0.5, 1.0], jnp.float32)
  y = np.asarray(color.rgb_linear(x))
  np.testing.assert_allclose(y[0], 0.0, atol=1e-7)
  np.testing.assert_allclose(y[1], 0.04 / 12.92, rtol=1e-5)
  np.testing.assert_allclose(y[2], ((0.5 + 0.055) / 1.055) ** 2.4,
                             rtol=1e-5)
  np.testing.assert_allclose(y[3], 1.0, rtol=1e-6)


def test_metering_dataclass_roundtrip():
  m = tonemap.Metering(tit.Bounds(-3.0, 0.5), -1.0, 0.4,
                       np.array([0.3, 0.4, 0.5], np.float32))
  v = tonemap.metering_to_np(m)
  assert v.shape == (7,)
  back = tonemap.metering_from_np(v)
  assert back.log_bounds.min == -3.0 and back.rgb_mean[2] == 0.5


def test_linear_and_reinhard_map_blocks(rng):
  """The standalone map building blocks behave like the fused tonemaps'
  stages."""
  import jax.numpy as jnp
  img = jnp.asarray(rng.random((8, 12, 3), np.float32))
  out = np.asarray(tonemap.linear_map(img, 0.0, 1.0, 1.0, np.uint8))
  np.testing.assert_array_equal(
      out, np.asarray(jnp.clip(img * 255, 0, 255)).astype(np.uint8))
  stats = tonemap.metering(img)
  mapped = np.asarray(tonemap.reinhard_map(img, stats, 1.0, 1.0, 0.0))
  assert mapped.shape == img.shape and np.isfinite(mapped).all()


def test_null_executor():
  """Inline executor parity (reference taichi_queue.py:9-20)."""
  from taichi_image_tpu.parallel import NullExecutor
  ran = []
  ex = NullExecutor(initializer=lambda: ran.append("init"))
  fut = ex.submit(lambda a, b: a + b, 2, 3)
  assert fut.result() == 5
  assert ran == ["init"]


def test_make_sharded_isp_step_builder(rng):
  """The explicit builder (not just the ISP-derived convenience) runs on
  the virtual mesh and matches the single-device step."""
  import jax
  import jax.numpy as jnp
  from taichi_image_tpu.models.camera_isp import fused_isp_step
  from taichi_image_tpu.ops.interpolate import ImageTransform
  from taichi_image_tpu.parallel import (make_camera_mesh,
                                         make_sharded_isp_step, replicate,
                                         shard_cameras)

  n, h, w = 2, 32, 48
  raws = jnp.asarray(rng.integers(0, 256, size=(n, h, w * 3 // 2),
                                  dtype=np.uint8))
  mesh = make_camera_mesh(2)
  step = make_sharded_isp_step(
      mesh, work_dtype=types.f32, pattern=bayer.BayerPattern.RGGB,
      transform=ImageTransform.none, n_cameras=n, image_hw=(h, w))
  m, out = step(shard_cameras(raws, mesh),
                replicate(jnp.zeros(9, jnp.float32), mesh),
                jnp.float32(0.0), jnp.float32(1.0), jnp.float32(1.0),
                jnp.float32(1.0), jnp.float32(0.0))

  m1, out1 = jax.jit(lambda r: fused_isp_step(
      r, jnp.zeros(9, jnp.float32), jnp.float32(0.0), 1.0, 1.0, 1.0, 0.0,
      "packed12", False, types.f32, bayer.BayerPattern.RGGB, None, None,
      8, ImageTransform.none, "reinhard"))(raws)
  assert np.abs(np.asarray(out).astype(int)
                - np.asarray(out1).astype(int)).max() <= 1
  np.testing.assert_allclose(np.asarray(m), np.asarray(m1), atol=1e-6)
