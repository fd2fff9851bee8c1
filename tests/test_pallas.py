"""Pallas demosaic kernel logic tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from taichi_image_tpu.ops import bayer
from taichi_image_tpu.ops.pallas import demosaic as pallas_dm


@pytest.mark.parametrize("method", ["mhc", "bilinear"])
@pytest.mark.parametrize("pattern", [bayer.BayerPattern.RGGB,
                                     bayer.BayerPattern.BGGR])
def test_stencil_matches_conv(pattern, method, rng):
  hh, wh = 16, 128
  phases = jnp.asarray(rng.random((2, 4, hh, wh), np.float32))
  weights = bayer._demosaic_tables(pattern, method)

  tiles = pallas_dm.tiling_for(hh, wh)
  assert tiles is not None
  num = pallas_dm.demosaic_stencil(phases, weights, *tiles, interpret=True)
  got = np.asarray(jnp.clip(
      bayer._edge_renorm(num, weights, hh, wh), 0, 1))

  want = np.asarray(bayer.demosaic_phases(phases, pattern, method=method,
                                          backend="xla"))
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_tiling_for():
  assert pallas_dm.tiling_for(1080, 1920) == (120, 640)
  assert pallas_dm.tiling_for(16, 128) is not None
  # non-divisible shapes are covered via pad-to-grid + trim
  assert pallas_dm.tiling_for(1080, 960) is not None    # 1080p half-res
  assert pallas_dm.tiling_for(15, 128) is not None
  assert pallas_dm.tiling_for(7, 128) is None    # too small
  assert pallas_dm.tiling_for(16, 100) is None   # too narrow


@pytest.mark.parametrize("shape", [(16, 192), (24, 130), (15, 129)])
def test_stencil_nondivisible_shapes(shape, rng):
  hh, wh = shape
  phases = jnp.asarray(rng.random((1, 4, hh, wh), np.float32))
  weights = bayer._demosaic_tables(bayer.BayerPattern.RGGB, "mhc")
  tiles = pallas_dm.tiling_for(hh, wh)
  if tiles is None:
    pytest.skip("untileable")
  num = pallas_dm.demosaic_stencil(phases, weights, *tiles, interpret=True)
  got = np.asarray(jnp.clip(
      bayer._edge_renorm(num, weights, hh, wh), 0, 1))
  want = np.asarray(bayer.demosaic_phases(phases, bayer.BayerPattern.RGGB,
                                          backend="xla"))
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_not_used_on_cpu():
  # tests run on the CPU backend; auto must select the XLA path
  assert not pallas_dm.pallas_available(1080, 1920)


def test_backend_param_equivalence(rng):
  phases = jnp.asarray(rng.random((1, 4, 16, 128), np.float32))
  a = np.asarray(bayer.demosaic_phases(phases, bayer.BayerPattern.RGGB,
                                       backend="xla"))
  b = np.asarray(bayer.demosaic_phases(phases, bayer.BayerPattern.RGGB,
                                       backend="auto"))
  np.testing.assert_array_equal(a, b)


def test_unknown_backend_raises(rng):
  # an unrecognized backend string must raise, not silently route to
  # the XLA path (a "bayer_pl" typo shipped the flat 8K driver on the
  # wrong route in round 4 — ADVICE.md high #1)
  phases = jnp.asarray(rng.random((1, 4, 16, 128), np.float32))
  with pytest.raises(ValueError, match="backend"):
    bayer.demosaic_phases(phases, bayer.BayerPattern.RGGB,
                          backend="bayer_pl")


@pytest.mark.parametrize("step", [4, 2])
def test_stencil_sample_emission(step, rng):
  """The kernel's MXU-dot sample output equals a strided slice of the
  finished x12, bitwise (one-hot dots are exact)."""
  hh, wh = 64, 512
  phases = jnp.asarray(rng.random((2, 4, hh, wh), np.float32))
  weights = bayer._demosaic_tables(bayer.BayerPattern.RGGB, "mhc")
  tiles = pallas_dm.tiling_for(hh, wh, step)
  assert tiles is not None
  num, snum = pallas_dm.demosaic_stencil(phases, weights, *tiles,
                                         interpret=True, sample_step=step)
  np.testing.assert_array_equal(np.asarray(snum),
                                np.asarray(num)[:, 0:3, ::step, ::step])
  # and through the full demosaic wrapper incl. edge renorm + cc + cast
  cc = tuple(np.asarray([[1.2, -0.1, 0.0], [0.0, 1.0, 0.0],
                         [-0.2, 0.1, 1.1]], np.float32).flatten().tolist())
  # wrap demosaic_stencil so the wrapper's pallas path runs interpreted
  import taichi_image_tpu.ops.pallas.demosaic as dm
  orig_stencil, orig_avail = dm.demosaic_stencil, dm.pallas_available
  dm.pallas_available = lambda *a: True
  import functools
  dm.demosaic_stencil = functools.partial(orig_stencil, interpret=True)
  try:
    x12, samp = bayer.demosaic_phases(phases, bayer.BayerPattern.RGGB,
                                      cc=cc, out_dtype=jnp.float16,
                                      backend="pallas", sample_step=step)
  finally:
    dm.demosaic_stencil, dm.pallas_available = orig_stencil, orig_avail
  np.testing.assert_array_equal(
      np.asarray(samp), np.asarray(x12)[:, 0:3, ::step, ::step])


def test_stencil_bf16_input_bit_identical(rng):
  """bf16 phases DMA'd raw into the kernel (in-kernel convert) must
  match pre-casting the same bf16 values to f32 — exact conversion."""
  phases_bf16 = jnp.asarray(rng.random((1, 4, 24, 256)), jnp.bfloat16)
  weights = bayer._demosaic_tables(bayer.BayerPattern.RGGB, "mhc")
  tiles = pallas_dm.tiling_for(24, 256, in_bf16=True)
  assert tiles is not None
  a = pallas_dm.demosaic_stencil(phases_bf16, weights, *tiles,
                                 interpret=True)
  b = pallas_dm.demosaic_stencil(phases_bf16.astype(jnp.float32),
                                 weights, *tiles, interpret=True)
  np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("odt", [jnp.bfloat16, jnp.float32])
@pytest.mark.parametrize("cc", [None, "ccm"])
def test_stencil_fused_finish_matches_xla(cc, odt, rng):
  """finish-in-kernel (renorm+CCM+clip+bf16) must match the XLA finish
  path bitwise: same f32 arithmetic, same rounding point."""
  cc = None if cc is None else tuple(
      np.array([[1.1, -0.05, 0.0], [0.02, 0.9, 0.08],
                [0.0, -0.1, 1.05]], np.float32).ravel())
  phases = jnp.asarray(rng.random((2, 4, 24, 256)), jnp.bfloat16)
  ref = bayer.demosaic_phases(phases, bayer.BayerPattern.RGGB, cc=cc,
                              out_dtype=odt, backend="xla",
                              sample_step=4)
  got = None
  import functools
  orig_stencil = pallas_dm.demosaic_stencil
  try:
    pallas_dm.demosaic_stencil = functools.partial(orig_stencil,
                                                   interpret=True)
    got = bayer.demosaic_phases(phases, bayer.BayerPattern.RGGB, cc=cc,
                                out_dtype=odt, backend="pallas",
                                sample_step=4)
  finally:
    pallas_dm.demosaic_stencil = orig_stencil
  for a, b, name in ((ref[0], got[0], "x12"), (ref[1], got[1], "sample")):
    av, bv = np.asarray(a, np.float32), np.asarray(b, np.float32)
    if odt == jnp.float32:
      # the XLA reference here is the CONV formulation, whose tap
      # summation associates differently from the stencil (documented
      # 1-f16-ulp-class difference); f32 output exposes those ulps
      np.testing.assert_allclose(bv, av, rtol=5e-5, atol=1e-7)
      continue
    np.testing.assert_allclose(bv, av, rtol=2e-2, atol=1e-3)
    if cc is None:
      # bitwise without CCM: identical value set after bf16 rounding
      assert np.array_equal(av, bv), name
    else:
      # the in-kernel 3-term CCM reduce may associate differently from
      # XLA's einsum: <=1 bf16 ulp on <0.1% of pixels (contract: <=1 u8
      # count end to end)
      ai = np.asarray(a).view(np.uint16).astype(np.int64)
      bi = np.asarray(b).view(np.uint16).astype(np.int64)
      d = np.abs(ai - bi)
      assert d.max() <= 1 and (d != 0).mean() < 1e-3, (name, d.max())

# ---------------------------------------------------------------------------
# Front-fused demosaic + Reinhard map (round 3): one kernel pass from
# phase planes to the pre-gamma p, with metering fed by the strided-conv
# sample pre-pass (ops/bayer.demosaic_samples).
# ---------------------------------------------------------------------------


def _front_metrics(phases, cc=None):
  import jax.numpy as jnp
  from taichi_image_tpu.models.camera_isp import metering_update_ca
  samp = bayer.demosaic_samples(phases, bayer.BayerPattern.RGGB, cc=cc,
                                out_dtype=jnp.bfloat16, sample_step=4)
  return metering_update_ca(samp.astype(jnp.float32),
                            jnp.zeros(9, jnp.float32), jnp.float32(0.0))


@pytest.mark.parametrize("formulation", ["conv", "shift"])
@pytest.mark.parametrize("cc", [None, "ccm"])
def test_demosaic_samples_matches_sample_emission(cc, formulation, rng):
  """The sample pre-pass (both formulations) matches demosaic_phases'
  sample output — same renorm factors, same CCM/clip/cast order; tap
  accumulation may differ by f32 ulps (one bf16 count after cast)."""
  ccv = (None if cc is None else
         tuple(np.array([[1.2, -0.1, 0.0], [-0.05, 1.1, -0.05],
                         [0.0, -0.1, 1.3]], np.float32).ravel()))
  phases = jnp.asarray(rng.random((2, 4, 64, 256), np.float32),
                       jnp.bfloat16)
  _, want = bayer.demosaic_phases(phases, bayer.BayerPattern.RGGB, cc=ccv,
                                  out_dtype=jnp.bfloat16, sample_step=4)
  got = bayer.demosaic_samples(phases, bayer.BayerPattern.RGGB, cc=ccv,
                               out_dtype=jnp.bfloat16, sample_step=4,
                               formulation=formulation)
  assert got.shape == want.shape == (2, 3, 16, 64)
  g = np.asarray(got, np.float32)
  w = np.asarray(want, np.float32)
  if formulation == "conv":
    np.testing.assert_array_equal(g, w)
  else:
    np.testing.assert_allclose(g, w, atol=4e-3)  # one bf16 ulp at ~0.5


def test_front_fused_matches_composed_kernels(rng):
  """demosaic_reinhard_stencil == demosaic_stencil(fused finish) -> bf16
  x12 -> reinhard_map_bf16_dma, BITWISE (same arithmetic, same
  quantization point, same exp2/log2 pow), including per-image max."""
  from taichi_image_tpu.ops.pallas.reinhard import (reinhard_map_bf16_dma,
                                                    reinhard_scal)
  hh, wh = 64, 256
  ccv = tuple(np.array([[1.2, -0.1, 0.0], [-0.05, 1.1, -0.05],
                        [0.0, -0.1, 1.3]], np.float32).ravel())
  phases = jnp.asarray(rng.random((2, 4, hh, wh), np.float32),
                       jnp.bfloat16)
  weights = bayer._demosaic_tables(bayer.BayerPattern.RGGB, "mhc")
  fin = bayer._stencil_finish_spec(weights, hh, wh, ccv, jnp.bfloat16)
  metrics = _front_metrics(phases, ccv)
  scal = reinhard_scal(metrics, 1.0, 1.0)

  tiles = pallas_dm.tiling_for(hh, wh, in_bf16=True, out_bf16=True,
                               extra_f32_tmp=pallas_dm._TONEMAP_TMPS)
  p_f, mx_f = pallas_dm.demosaic_reinhard_stencil(
      phases, weights, *tiles, scal, fin, interpret=True)
  assert p_f.shape == (2, 12, hh, wh) and p_f.dtype == jnp.bfloat16

  x12 = pallas_dm.demosaic_stencil(
      phases, weights, *pallas_dm.tiling_for(hh, wh, in_bf16=True,
                                             out_bf16=True),
      finish=fin, interpret=True)
  p_c, mx_c = reinhard_map_bf16_dma(x12, metrics, 1.0, 1.0,
                                    interpret=True)
  np.testing.assert_array_equal(np.asarray(p_f, np.float32),
                                np.asarray(p_c, np.float32))
  np.testing.assert_allclose(np.asarray(mx_f).ravel(),
                             np.asarray(mx_c).ravel(), rtol=0, atol=0)


@pytest.mark.parametrize("shape", [(64, 256), (68, 384)])
def test_front_fused_vs_xla_map(shape, rng):
  """Against the XLA jnp.power map on the quantized x12: <=1 bf16 ulp
  (the exp2/log2 pow contract), NaN pixels zeroed. The 68-row shape
  pads the tile grid by 4 rows — the in-kernel mask must keep padded
  pixels out of the per-image max."""
  from taichi_image_tpu.models.camera_isp import reinhard_map_ca
  from taichi_image_tpu.ops.pallas.reinhard import reinhard_scal
  hh, wh = shape
  phases = jnp.asarray(rng.random((1, 4, hh, wh), np.float32),
                       jnp.bfloat16)
  weights = bayer._demosaic_tables(bayer.BayerPattern.RGGB, "mhc")
  fin = bayer._stencil_finish_spec(weights, hh, wh, None, jnp.bfloat16)
  metrics = _front_metrics(phases)
  tiles = pallas_dm.tiling_for(hh, wh, in_bf16=True, out_bf16=True,
                               extra_f32_tmp=pallas_dm._TONEMAP_TMPS)
  p_f, mx_f = pallas_dm.demosaic_reinhard_stencil(
      phases, weights, *tiles, reinhard_scal(metrics, 1.0, 1.0), fin,
      interpret=True)
  x12 = pallas_dm.demosaic_stencil(
      phases, weights, *pallas_dm.tiling_for(hh, wh, in_bf16=True,
                                             out_bf16=True),
      finish=fin, interpret=True)
  p_x = reinhard_map_ca(x12.reshape(1, 4, 3, hh, wh), metrics, 1.0, 1.0,
                        0.0).reshape(1, 12, hh, wh)
  d = np.abs(np.asarray(p_f, np.float32) - np.asarray(p_x, np.float32))
  assert d.max() <= 2e-3, d.max()  # one bf16 ulp at p ~ [0.5, 1)
  assert float(mx_f.max()) == pytest.approx(float(np.asarray(p_x).max()),
                                            abs=2e-3)


def test_front_fused_not_used_on_cpu():
  assert not pallas_dm.front_fused_available(1080, 1920, in_bf16=True)


@pytest.mark.parametrize("ca", [0.3, 1.0])
def test_bf16_map_color_adapt_vs_xla(ca, rng):
  """The bf16 DMA map kernel's ca_mode (round 5: per-channel adapt via
  SMEM cmean scalars + 3 transcendental chains/pixel) vs the XLA
  reinhard_map_ca ca > 0 branch: <=1 bf16 ulp on p (the exp2/log2 pow
  contract) and matching per-image max."""
  from taichi_image_tpu.models.camera_isp import reinhard_map_ca
  from taichi_image_tpu.ops.pallas.reinhard import reinhard_map_bf16_dma
  hh, wh = 64, 256
  phases = jnp.asarray(rng.random((2, 4, hh, wh), np.float32),
                       jnp.bfloat16)
  weights = bayer._demosaic_tables(bayer.BayerPattern.RGGB, "mhc")
  fin = bayer._stencil_finish_spec(weights, hh, wh, None, jnp.bfloat16)
  metrics = _front_metrics(phases)
  x12 = pallas_dm.demosaic_stencil(
      phases, weights, *pallas_dm.tiling_for(hh, wh, in_bf16=True,
                                             out_bf16=True),
      finish=fin, interpret=True)
  p_k, mx_k = reinhard_map_bf16_dma(x12, metrics, 1.3, 0.8,
                                    color_adapt=ca, interpret=True)
  p_x = reinhard_map_ca(x12.reshape(2, 4, 3, hh, wh), metrics, 1.3, 0.8,
                        ca).reshape(2, 12, hh, wh)
  d = np.abs(np.asarray(p_k, np.float32) - np.asarray(p_x, np.float32))
  assert d.max() <= 2e-3, d.max()
  np.testing.assert_allclose(
      np.asarray(mx_k).ravel(),
      np.asarray(p_x).reshape(2, -1).max(axis=1), atol=2e-3)


def test_bf16_map_ca_zero_unchanged(rng):
  """color_adapt=0.0 must take the original one-adapt-per-pixel code
  path BITWISE (the ca_mode extension may not perturb the existing
  contract)."""
  from taichi_image_tpu.ops.pallas.reinhard import reinhard_map_bf16_dma
  hh, wh = 64, 256
  x12 = jnp.asarray(rng.random((1, 12, hh, wh), np.float32),
                    jnp.bfloat16)
  phases = jnp.asarray(rng.random((1, 4, hh, wh), np.float32),
                       jnp.bfloat16)
  metrics = _front_metrics(phases)
  p_a, mx_a = reinhard_map_bf16_dma(x12, metrics, 1.0, 1.0,
                                    interpret=True)
  p_b, mx_b = reinhard_map_bf16_dma(x12, metrics, 1.0, 1.0,
                                    color_adapt=0.0, interpret=True)
  np.testing.assert_array_equal(np.asarray(p_a, np.float32),
                                np.asarray(p_b, np.float32))
  np.testing.assert_array_equal(np.asarray(mx_a), np.asarray(mx_b))


def test_fused_step_front_fused_route_integrated(monkeypatch, rng):
  """Full fused_isp_step with the front-fused gate forced open
  (interpret mode) vs the gates-closed XLA step: metrics to 1e-5 (the
  sample pre-pass associates taps differently) and <=1 u8 count."""
  import functools
  from taichi_image_tpu import types
  from taichi_image_tpu.models.camera_isp import fused_isp_step
  from taichi_image_tpu.ops.interpolate import ImageTransform

  raws = jnp.asarray(rng.integers(0, 256, size=(2, 64, 1152),
                                  dtype=np.uint8))
  args = (jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0, 1.0, 1.0,
          0.0, "packed12", False, types.bf16, bayer.BayerPattern.RGGB,
          None, None, 8, ImageTransform.none, "reinhard")
  import jax
  m_ref, o_ref = jax.jit(lambda r: fused_isp_step(r, *args))(raws)

  monkeypatch.setattr(pallas_dm, "front_fused_available",
                      lambda hh, wh, in_bf16: True)
  monkeypatch.setattr(pallas_dm, "demosaic_reinhard_stencil",
                      functools.partial(pallas_dm.demosaic_reinhard_stencil,
                                        interpret=True))
  m_pl, o_pl = jax.jit(lambda r: fused_isp_step(r, *args))(raws)

  np.testing.assert_allclose(np.asarray(m_pl), np.asarray(m_ref),
                             rtol=1e-5, atol=1e-5)
  d = np.abs(np.asarray(o_pl).astype(int) - np.asarray(o_ref).astype(int))
  assert d.max() <= 1, d.max()
  assert (d != 0).mean() < 0.02


def test_fused_step_front_fused_yuv420_and_gamma(monkeypatch, rng):
  """Front-fused route composes with gamma != 1 and I420 output."""
  import functools
  from taichi_image_tpu import types
  from taichi_image_tpu.models.camera_isp import fused_isp_step
  from taichi_image_tpu.ops.interpolate import ImageTransform
  import jax

  raws = jnp.asarray(rng.integers(0, 256, size=(2, 64, 1152),
                                  dtype=np.uint8))
  args = (jnp.zeros(9, jnp.float32), jnp.float32(0.9), 0.9, 1.0, 1.0,
          0.0, "packed12", False, types.bf16, bayer.BayerPattern.RGGB,
          None, None, 8, ImageTransform.none, "reinhard")
  m_ref, (y_ref, uv_ref) = jax.jit(lambda r: fused_isp_step(
      r, *args, color_format="yuv420"))(raws)

  monkeypatch.setattr(pallas_dm, "front_fused_available",
                      lambda hh, wh, in_bf16: True)
  monkeypatch.setattr(pallas_dm, "demosaic_reinhard_stencil",
                      functools.partial(pallas_dm.demosaic_reinhard_stencil,
                                        interpret=True))
  m_pl, (y_pl, uv_pl) = jax.jit(lambda r: fused_isp_step(
      r, *args, color_format="yuv420"))(raws)

  np.testing.assert_allclose(np.asarray(m_pl), np.asarray(m_ref),
                             rtol=1e-5, atol=1e-5)
  for got, want in ((y_pl, y_ref), (uv_pl, uv_ref)):
    d = np.abs(np.asarray(got).astype(int) - np.asarray(want).astype(int))
    assert d.max() <= 1, d.max()


# ---------------------------------------------------------------------------
# Row-band fused finish (round 3, late): the banded drivers run the
# stencil's fused finish with band-local edge-strip rows (top_row /
# bot_row in _stencil_finish_spec). Bands assembled from halo'd band
# kernels must reproduce the whole-image demosaic.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cc", [None, "ccm"])
def test_banded_fused_finish_matches_unbanded(cc, rng):
  hh, wh, b = 16, 256, 8  # two bands of 8 phase rows
  ccv = (None if cc is None else
         tuple(np.array([[1.2, -0.1, 0.0], [-0.05, 1.1, -0.05],
                         [0.0, -0.1, 1.3]], np.float32).ravel()))
  phases = jnp.asarray(rng.random((1, 4, hh, wh), np.float32),
                       jnp.bfloat16)
  want = bayer.demosaic_phases(phases, bayer.BayerPattern.RGGB, cc=ccv,
                               out_dtype=jnp.bfloat16, backend="xla")

  weights = bayer._demosaic_tables(bayer.BayerPattern.RGGB, "mhc")
  padded = jnp.pad(phases, ((0, 0), (0, 0), (1, 1), (0, 0)))
  outs = []
  for i, r0 in enumerate(range(0, hh, b)):
    band = padded[:, :, r0:r0 + b + 2]  # 1 halo phase row each side
    is_top, is_bot = i == 0, r0 + b == hh
    fin = bayer._stencil_finish_spec(weights, b + 2, wh, ccv,
                                     jnp.bfloat16,
                                     top_row=1 if is_top else -1,
                                     bot_row=b if is_bot else -1)
    tiles = pallas_dm.tiling_for(b + 2, wh, in_bf16=True, out_bf16=True)
    x12 = pallas_dm.demosaic_stencil(band, weights, *tiles, finish=fin,
                                     interpret=True)[:, :, 1:b + 1]
    outs.append(x12)
  got = jnp.concatenate(outs, axis=2)
  g = np.asarray(got, np.float32)
  w = np.asarray(want, np.float32)
  if cc is None:
    np.testing.assert_array_equal(g, w)  # bitwise: same taps, same order
  else:
    np.testing.assert_allclose(g, w, atol=6e-3)  # CCM assoc, 1 bf16 ulp
