"""bf16 manual-DMA Reinhard map kernel tests (interpret mode on CPU).

The kernel (ops/pallas/reinhard.reinhard_map_bf16_dma) is the integrated
map+max stage of the bf16 TPU pipeline (models/camera_isp.py
reinhard_apply_ca fast path); reference semantics:
/root/reference/taichi_image/camera_isp.py:177-218 (map, NaN-ignoring
max over the pre-cast f32 p, then gamma normalization).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taichi_image_tpu import types
from taichi_image_tpu.models import camera_isp as ci
from taichi_image_tpu.ops.pallas import reinhard as plrh

M = jnp.asarray([0.02, 0.98, -3.0, -0.1, -1.2, 0.4, 0.45, 0.4, 0.35],
                jnp.float32)


def _xla_map(x, intensity=1.0, light_adapt=1.0):
  n, c = x.shape[:2]
  xg = x.reshape(n, c // 3, 3, *x.shape[2:])
  p = ci.reinhard_map_ca(xg, M, intensity, light_adapt, 0.0)
  mx = jnp.max(p, axis=tuple(range(1, p.ndim)), keepdims=False)
  return (p.astype(jnp.bfloat16).reshape(x.shape),
          mx.reshape(n, 1, 1, 1))


@pytest.mark.parametrize("shape", [(2, 12, 16, 128), (3, 3, 24, 256)])
def test_bf16_kernel_matches_xla(shape, rng):
  x = jnp.asarray(rng.random(shape) * 0.9 + 0.05, jnp.bfloat16)
  p_ref, mx_ref = jax.jit(_xla_map)(x)
  p, mx = jax.jit(lambda x: plrh.reinhard_map_bf16_dma(
      x, M, 1.0, 1.0, interpret=True))(x)
  assert p.dtype == jnp.bfloat16 and p.shape == x.shape
  # same math, same rounding point; pow lowering may differ by ulps
  np.testing.assert_allclose(np.asarray(p, np.float32),
                             np.asarray(p_ref, np.float32),
                             rtol=1e-2, atol=1e-3)
  np.testing.assert_allclose(np.asarray(mx).ravel(),
                             np.asarray(mx_ref).ravel(),
                             rtol=1e-5)


def test_bf16_kernel_nan_zeroed(rng):
  x = np.asarray(rng.random((1, 3, 16, 128)) * 0.9 + 0.05, np.float32)
  x[0, :, 3, 17] = np.nan  # NaN pixel: p must be zeroed (atomicMax
  x = jnp.asarray(x, jnp.bfloat16)  # ignore-NaN, camera_isp.py:213)
  p, mx = jax.jit(lambda x: plrh.reinhard_map_bf16_dma(
      x, M, 1.0, 1.0, interpret=True))(x)
  p = np.asarray(p, np.float32)
  assert np.isfinite(p).all()
  assert (p[0, :, 3, 17] == 0.0).all()
  assert np.isfinite(np.asarray(mx)).all()


def test_bf16_kernel_traced_scalars(rng):
  """intensity/light_adapt arrive via SMEM — traced values must work."""
  x = jnp.asarray(rng.random((1, 12, 16, 128)) * 0.9, jnp.bfloat16)
  p_ref, mx_ref = jax.jit(_xla_map)(x, 0.7, 0.6)
  p, mx = jax.jit(lambda x, i, la: plrh.reinhard_map_bf16_dma(
      x, M, i, la, interpret=True))(x, jnp.float32(0.7), jnp.float32(0.6))
  np.testing.assert_allclose(np.asarray(p, np.float32),
                             np.asarray(p_ref, np.float32),
                             rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("gamma", [0.9, 0.6, 2.2])
def test_gamma_pow_matches_numpy_pow(gamma, rng):
  """The exp2(log2(x)*c) gamma lowering (camera_isp._gamma_pow — the
  generic jnp.power cost +1.35 ms/step at 6x4K on TPU, the pair +0.10)
  agrees with numpy's pow to <=1 u8 count after quantization, including
  the x == 0 edge (-inf*c -> exp2 -> 0 == pow(0, c))."""
  x = np.concatenate([[0.0, 1.0, 1e-6], rng.random(4093)]).astype(
      np.float32)
  want = np.clip(255.0 * np.power(x, 1.0 / gamma), 0, 255).astype(
      np.uint8)
  got_f = np.asarray(ci._gamma_pow(jnp.asarray(x), 1.0 / gamma))
  got = np.clip(255.0 * got_f, 0, 255).astype(np.uint8)
  assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
  assert got_f[0] == 0.0  # pow(0, c>0) == 0


def test_gamma_pow_negative_and_nan():
  """Negative inputs (dark pixels below the EMA bounds after the p/max
  normalization) and NaN behave like pow: NaN either way, which the
  caller's clip+u8 cast then zeroes identically on both lowerings."""
  x = jnp.asarray([-0.5, np.nan], jnp.float32)
  got = np.asarray(ci._gamma_pow(x, 1.0 / 0.9))
  with np.errstate(invalid="ignore"):  # the NaN is the point
    want = np.power(np.asarray([-0.5, np.nan], np.float32),
                    np.float32(1 / 0.9))
  assert np.isnan(got).all() and np.isnan(want).all()


def test_bf16_tiling_contract():
  assert plrh.bf16_tiling(1080, 1920, 12) is not None
  assert plrh.bf16_tiling(1080, 1920, 3) is not None
  tr, tw = plrh.bf16_tiling(1080, 1920, 12)
  assert 1080 % tr == 0 and 1920 % tw == 0
  assert plrh.bf16_tiling(7, 64, 12) is None  # too small
  # VMEM: scratch + out double-buffers stay under the probed 8 MB limit
  assert 2 * 12 * tr * tw * 2 * 2 <= 8 * 1024 * 1024


def test_bf16_route_not_taken_on_cpu():
  assert not plrh.reinhard_bf16_available(12, 1080, 1920)


def test_apply_ca_bf16_route_integrated(monkeypatch, rng):
  """Force the bf16 kernel route (interpret mode) through
  reinhard_apply_ca and compare against the XLA path end-to-end (u8)."""
  import functools
  x = jnp.asarray(rng.random((2, 4, 3, 24, 256)) * 0.9 + 0.05,
                  jnp.bfloat16)
  out_xla = np.asarray(jax.jit(lambda x: ci.reinhard_apply_ca(
      x, M, 1.0, 1.0, 1.0, 0.0, types.bf16))(x))

  monkeypatch.setattr(plrh, "reinhard_bf16_available",
                      lambda nc, hh, wh: True)
  monkeypatch.setattr(plrh, "reinhard_map_bf16_dma",
                      functools.partial(plrh.reinhard_map_bf16_dma,
                                        interpret=True))
  out_pl = np.asarray(jax.jit(lambda x: ci.reinhard_apply_ca(
      x, M, 1.0, 1.0, 1.0, 0.0, types.bf16))(x))
  # same math and rounding points; pow ulps may flip a count
  diff = np.abs(out_xla.astype(np.int16) - out_pl.astype(np.int16))
  assert diff.max() <= 1, diff.max()


def test_apply_ca_bf16_route_integrated_gamma(monkeypatch, rng):
  """reinhard_apply_ca with static gamma != 1 through the kernel route
  (exp2/log2 finish on the kernel p) matches the XLA path. The kernel's
  p can differ from XLA's by one bf16 ulp (jit fusion/FMA noise) and
  1/gamma amplifies it, so the bound is 2 counts for gamma < 0.75."""
  import functools
  x = jnp.asarray(rng.random((2, 4, 3, 24, 256)) * 0.9 + 0.05,
                  jnp.bfloat16)
  monkeypatch.setattr(plrh, "reinhard_bf16_available",
                      lambda nc, hh, wh: True)
  monkeypatch.setattr(plrh, "reinhard_map_bf16_dma",
                      functools.partial(plrh.reinhard_map_bf16_dma,
                                        interpret=True))
  for gamma, bound in ((0.9, 1), (0.6, 2)):
    out_pl = np.asarray(jax.jit(lambda x, g=gamma: ci.reinhard_apply_ca(
        x, M, g, 1.0, 1.0, 0.0, types.bf16))(x))
    with monkeypatch.context() as mp:
      mp.setattr(plrh, "reinhard_bf16_available",
                 lambda nc, hh, wh: False)
      out_xla = np.asarray(jax.jit(
          lambda x, g=gamma: ci.reinhard_apply_ca(
              x, M, g, 1.0, 1.0, 0.0, types.bf16))(x))
    diff = np.abs(out_xla.astype(np.int16) - out_pl.astype(np.int16))
    assert diff.max() <= bound, (gamma, diff.max())


def test_fused_step_bf16_kernel_route_integrated(monkeypatch, rng):
  """Full fused_isp_step with ALL bf16 Pallas kernel gates forced open
  (interpret mode) vs the gates-closed XLA step: <=1 u8 count. Guards
  the kernel WIRING (load_raw_phases -> decode kernel, demosaic_phases
  -> fused-finish stencil, reinhard_apply_ca -> bf16 map kernel), which
  unit tests cover only in isolation."""
  import functools
  import jax.numpy as jnp
  from taichi_image_tpu.models.camera_isp import fused_isp_step
  from taichi_image_tpu.ops.bayer import BayerPattern
  from taichi_image_tpu.ops.interpolate import ImageTransform
  from taichi_image_tpu.ops.pallas import decode as pld
  from taichi_image_tpu.ops.pallas import demosaic as pldm
  from taichi_image_tpu.ops.pallas import reinhard as plrh

  raws = jnp.asarray(rng.integers(0, 256, size=(2, 64, 1152),
                                  dtype=np.uint8))
  args = (jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0, 1.0, 1.0,
          0.0, "packed12", False, types.bf16, BayerPattern.RGGB, None,
          None, 8, ImageTransform.none, "reinhard")
  m_ref, o_ref = jax.jit(lambda r: fused_isp_step(r, *args))(raws)

  monkeypatch.setattr(pld, "decode_pallas_available", lambda h, wb: True)
  monkeypatch.setattr(pld, "decode12_phases_bf16",
                      functools.partial(pld.decode12_phases_bf16,
                                        interpret=True))
  monkeypatch.setattr(pldm, "pallas_available", lambda hh, wh: True)
  monkeypatch.setattr(pldm, "demosaic_stencil",
                      functools.partial(pldm.demosaic_stencil,
                                        interpret=True))
  monkeypatch.setattr(plrh, "reinhard_bf16_available",
                      lambda nc, hh, wh: True)
  monkeypatch.setattr(plrh, "reinhard_map_bf16_dma",
                      functools.partial(plrh.reinhard_map_bf16_dma,
                                        interpret=True))
  m_pl, o_pl = jax.jit(lambda r: fused_isp_step(r, *args))(raws)

  np.testing.assert_allclose(np.asarray(m_pl), np.asarray(m_ref),
                             rtol=1e-6, atol=1e-6)
  d = np.abs(np.asarray(o_pl).astype(int) - np.asarray(o_ref).astype(int))
  assert d.max() <= 1, d.max()
  assert (d != 0).mean() < 0.02
