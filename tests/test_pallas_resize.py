"""bf16 banded-matmul resize kernel tests (interpret mode on CPU).

The kernel (ops/pallas/resize.resize_x12_bf16) replaces the XLA gather
formulation of the per-frame resize stage (reference semantics:
/root/reference/taichi_image/interpolate.py:25-33,59-86) on the bf16
TPU pipeline. Contract: bitwise equal to `_resize_from_phases` when the
bilinear taps are exactly representable (x0.5 and friends: frac == 0),
otherwise within the bf16 weight-quantization bound (~2^-9 relative,
<=1 u8 count through the tonemap).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taichi_image_tpu import types
from taichi_image_tpu.models.camera_isp import (_plan_scales,
                                                _resize_from_phases)
from taichi_image_tpu.ops.pallas import resize as plrs


def _compare(H, W, size, rng, n=2):
  hh, wh = H // 2, W // 2
  x12 = jnp.asarray(rng.random((n, 12, hh, wh)), jnp.bfloat16)
  sy, sx = _plan_scales(H, W, size, None)
  want = np.asarray(_resize_from_phases(x12, size, (sy, sx), types.bf16),
                    np.float32)
  got = np.asarray(plrs.resize_x12_bf16(x12, size, (sy, sx),
                                        interpret=True), np.float32)
  assert got.shape == want.shape == (n, 3, size[1], size[0])
  return got, want


def test_exact_taps_bitwise(rng):
  """x0.5 downscale: frac == 0 everywhere, kernel output is BITWISE
  equal to the XLA path (the flagship resize config)."""
  got, want = _compare(64, 256, (128, 32), rng)
  np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("size", [(96, 48), (384, 96), (200, 50)])
def test_inexact_taps_close(size, rng):
  """General scales: bf16 weight + intermediate rounding only."""
  got, want = _compare(64, 256, size, rng)
  err = np.abs(got - want) / (np.abs(want) + 1e-3)
  assert err.max() < 2.5e-2, err.max()  # a few bf16 ulps
  assert err.mean() < 4e-3, err.mean()


def test_resize_width_config(rng):
  """The reference `resize_width` policy shape (arbitrary aspect)."""
  H, W = 128, 384
  w_out = 192
  scale = w_out / W
  size = (w_out, round(H * scale))
  got, want = _compare(H, W, size, rng)
  err = np.abs(got - want) / (np.abs(want) + 1e-3)
  assert err.max() < 2.5e-2


def test_plan_contract():
  # 4K -> 1080p must plan (the production config)
  p = plrs._plan(1080, 1920, 1080, 1920, 0.5, 0.5)
  assert p is not None
  assert p["bw"] % 128 == 0 and p["bh"] % 8 == 0
  assert (p["rstarts"] % 8 == 0).all()
  assert (p["cstarts"] % 128 == 0).all()
  # window rows/cols stay within the padded input
  assert p["hh_need"] >= p["rstarts"].max() + p["bh"]
  assert p["wh_need"] >= p["cstarts"].max() + p["bw"]
  # weight rows sum to 1 for every real output position (partition of
  # unity of the bilinear taps)
  for i in range(p["ni"]):
    s = np.asarray(p["w0"][i], np.float32).sum(1) + \
        np.asarray(p["w1"][i], np.float32).sum(1)
    np.testing.assert_allclose(s, 1.0, atol=1e-2)
  assert not plrs.resize_pallas_available(16, 64, 8, 32, 0.5, 0.5)


def test_not_available_on_cpu():
  assert not plrs.resize_pallas_available(1080, 1920, 1080, 1920,
                                          0.5, 0.5)


def test_fused_step_resize_kernel_route(monkeypatch, rng):
  """fused_isp_step with the resize kernel gate forced open (interpret)
  vs the gates-closed XLA step at the exact x0.5 config: metering and
  output must be equal (kernel is bitwise there)."""
  import functools
  from taichi_image_tpu.models.camera_isp import fused_isp_step
  from taichi_image_tpu.ops.bayer import BayerPattern
  from taichi_image_tpu.ops.interpolate import ImageTransform

  raws = jnp.asarray(rng.integers(0, 256, size=(2, 64, 384),
                                  dtype=np.uint8))
  args = (jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0, 1.0, 1.0,
          0.0, "packed12", False, types.bf16, BayerPattern.RGGB, None,
          ((128, 32), 0.5), 8, ImageTransform.none, "reinhard")
  m_ref, o_ref = jax.jit(lambda r: fused_isp_step(r, *args))(raws)

  monkeypatch.setattr(plrs, "resize_pallas_available",
                      lambda *a: True)
  monkeypatch.setattr(plrs, "resize_x12_bf16",
                      functools.partial(plrs.resize_x12_bf16,
                                        interpret=True))
  m_pl, o_pl = jax.jit(lambda r: fused_isp_step(r, *args))(raws)

  np.testing.assert_allclose(np.asarray(m_pl), np.asarray(m_ref),
                             rtol=1e-6, atol=1e-6)
  np.testing.assert_array_equal(np.asarray(o_pl), np.asarray(o_ref))
