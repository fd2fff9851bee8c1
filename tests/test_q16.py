"""Camera16 q16 fast-path tests (interpret mode on CPU).

The q16 containers (ops/pallas/q16) carry the Camera16 pipeline's
stage boundaries as 16-bit fixed-point codes packed 2-per-i32 —
>= f16 precision everywhere the strict XLA f16 path materializes f16
(reference camera_isp.py:422 Camera16 default; 177-218 map semantics).
Contract proven here end to end: final u8 within <=1 count of the
strict path; tools/verify_tpu.py asserts the same on chip with the
real (non-interpret) kernels.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taichi_image_tpu import types
from taichi_image_tpu.models import camera_isp as ci
from taichi_image_tpu.ops import bayer, packed
from taichi_image_tpu.ops.interpolate import ImageTransform
from taichi_image_tpu.ops.pallas import decode as pld
from taichi_image_tpu.ops.pallas import demosaic as pldm
from taichi_image_tpu.ops.pallas import q16
from taichi_image_tpu.ops.pallas import reinhard as plrh
from conftest import make_test_rgb
from oracle import rgb_to_bayer_oracle

# smallest shape every q16 kernel tiles: wb = 1536 (384-mult), wh = 512
# (lane quantum for the stride-8 sample grid), hh = 32
H, W = 64, 1024
M = jnp.asarray([0.02, 0.98, -3.0, -0.1, -1.2, 0.4, 0.45, 0.4, 0.35],
                jnp.float32)


def _raws(n=2, h=H, w=W, seed=0):
  img = make_test_rgb(h, w, seed)
  cfa = rgb_to_bayer_oracle(np.clip(img, 0, 1), "RGGB")
  raw = np.asarray(packed.encode12(cfa, scaled=True))
  return np.stack([np.roll(raw, i, axis=0) for i in range(n)])


# ---------------------------------------------------------------- codec

def test_x12_codec_roundtrip(rng):
  v = jnp.asarray(rng.random(4096), jnp.float32)
  got = q16.decode_x12(q16.encode_x12(v))
  assert np.abs(np.asarray(got) - np.asarray(v)).max() <= 0.5 / 65535.0
  # exact code points round-trip bitwise
  codes = jnp.arange(65536, dtype=jnp.int32)
  assert np.array_equal(np.asarray(q16.encode_x12(q16.decode_x12(codes))),
                        np.asarray(codes))


def test_p_codec_roundtrip(rng):
  # the rational code r = p/(1+p) covers all p >= 0 with error
  # (1+p)^2 * half-code — check the bound across four decades
  p = jnp.asarray(np.concatenate([rng.random(2048) * 0.99,
                                  rng.random(1024) * 9.0,
                                  rng.random(1024) * 0.01]), jnp.float32)
  got = np.asarray(q16.decode_p(q16.encode_p(p)))
  pnp = np.asarray(p)
  bound = (1.0 + pnp) ** 2 * (0.52 / 65535.0)
  assert (np.abs(got - pnp) <= bound).all()
  # p <= 0 and NaN encode to code 0 (u8-identical: both clip to 0)
  z = np.asarray(q16.decode_p(q16.encode_p(
      jnp.asarray([-5.0, -1e-8, 0.0, np.nan], jnp.float32))))
  assert (z == 0.0).all()


def test_pack_unpack_channels(rng):
  codes = jnp.asarray(rng.integers(0, 65536, size=(2, 12, 8, 16)),
                      jnp.int32)
  w = q16.pack_pair(codes[:, 0::2], codes[:, 1::2])
  assert w.shape == (2, 6, 8, 16)
  assert np.array_equal(np.asarray(q16.unpack_channels(w)),
                        np.asarray(codes))


# --------------------------------------------------------------- decode

def _decode_codes_oracle(raws, ids=False):
  """Numpy packed12 -> raw phase codes (reference packed.py:12-55)."""
  b0 = raws[:, :, 0::3].astype(np.uint16)
  b1 = raws[:, :, 1::3].astype(np.uint16)
  b2 = raws[:, :, 2::3].astype(np.uint16)
  if not ids:
    even = ((b1 & 0xF) << 8) | b0
    odd = (b2 << 4) | (b1 >> 4)
  else:
    even = (b0 << 4) | (b2 & 0xF)
    odd = (b1 << 4) | (b2 >> 4)
  return np.stack([even[:, 0::2], odd[:, 0::2],
                   even[:, 1::2], odd[:, 1::2]], axis=1).astype(np.int32)


@pytest.mark.parametrize("ids", [False, True])
def test_decode_q16_bit_exact(ids, rng):
  raws = rng.integers(0, 256, size=(2, 32, 1152), dtype=np.uint8)
  packed_w = jax.jit(lambda r: pld.decode12_phases_q16(
      r, ids_format=ids, interpret=True))(jnp.asarray(raws))
  got = np.asarray(q16.unpack_channels(packed_w))
  assert np.array_equal(got, _decode_codes_oracle(raws, ids))


# ------------------------------------------------------------- demosaic

def _pack_phase_codes(ph):
  """(N, 4, hh, wh) int codes -> (N, 2, hh, wh) q12-packed words."""
  ph = jnp.asarray(ph, jnp.int32)
  return q16.pack_pair(ph[:, 0::2], ph[:, 1::2])


@pytest.mark.parametrize("cc", [None, "ccm"])
def test_demosaic_q16_matches_f32(cc, rng):
  ccm = (np.asarray([[0.9, 0.08, 0.02], [0.05, 0.9, 0.05],
                     [0.01, 0.04, 0.95]], np.float32)
         if cc else None)
  ph = rng.integers(0, 4096, size=(2, 4, 32, 512))
  want = np.asarray(bayer.demosaic_phases(
      jnp.asarray(ph / 4095.0, jnp.float32), bayer.BayerPattern.RGGB,
      cc=ccm, out_dtype=jnp.float32))
  outw, samp = bayer.demosaic_phases_q16(
      _pack_phase_codes(ph), bayer.BayerPattern.RGGB, cc=ccm,
      sample_step=4, interpret=True)
  assert outw.dtype == jnp.int32 and outw.shape == (2, 6, 32, 512)
  got = np.asarray(q16.decode_x12(q16.unpack_channels(outw)))
  assert np.abs(got - want).max() <= 2e-5  # 0.5 code + f32 op-order ulps
  # the sample grid is EXACTLY the dequantized codes' subsample
  assert np.array_equal(np.asarray(samp), got[:, 0:3, ::4, ::4])


# ------------------------------------------------------------------ map

def test_map_q16_matches_xla(rng):
  codes = rng.integers(0, 65536, size=(2, 12, 16, 128))
  x = jnp.asarray(codes / 65535.0, jnp.float32)
  p_ref = ci.reinhard_map_ca(x.reshape(2, 4, 3, 16, 128), M, 1.0, 1.0,
                             0.0)
  mx_ref = jnp.max(p_ref, axis=(1, 2, 3, 4))
  w = q16.pack_pair(jnp.asarray(codes[:, 0::2], jnp.int32),
                    jnp.asarray(codes[:, 1::2], jnp.int32))
  pw, mx = jax.jit(lambda w: plrh.reinhard_map_q16_dma(
      w, M, 1.0, 1.0, interpret=True))(w)
  assert pw.dtype == jnp.int32 and pw.shape == w.shape
  got = np.asarray(q16.decode_p(q16.unpack_channels(pw)))
  # negative p (scaled below the metering min) encodes to code 0 —
  # u8-identical (clips to 0 downstream); positive p round-trips with
  # the rational code's (1+p)^2-scaled half-code error
  want = np.asarray(p_ref).reshape(2, 12, 16, 128)
  want = np.where(want > 0.0, want, 0.0)
  bound = (1.0 + want) ** 2 * (0.6 / 65535.0)  # half-code + pow ulps
  assert (np.abs(got - want) <= bound).all()
  # max is over the exact f32 p BEFORE quantization (including any
  # p the code zeroes: the reference takes it on the uncast f32 p)
  np.testing.assert_allclose(np.asarray(mx).ravel(),
                             np.asarray(mx_ref).ravel(), rtol=1e-5)


@pytest.mark.parametrize("ca", [0.4, 1.0])
def test_map_q16_color_adapt_matches_xla(ca, rng):
  """The q16 map kernel's ca_mode (round 5) vs the XLA ca > 0 branch —
  same rational-code bound as the ca == 0 test; the per-image max stays
  on the exact f32 p."""
  codes = rng.integers(0, 65536, size=(2, 12, 16, 128))
  x = jnp.asarray(codes / 65535.0, jnp.float32)
  p_ref = ci.reinhard_map_ca(x.reshape(2, 4, 3, 16, 128), M, 1.3, 0.8,
                             ca)
  mx_ref = jnp.max(p_ref, axis=(1, 2, 3, 4))
  w = q16.pack_pair(jnp.asarray(codes[:, 0::2], jnp.int32),
                    jnp.asarray(codes[:, 1::2], jnp.int32))
  pw, mx = jax.jit(lambda w: plrh.reinhard_map_q16_dma(
      w, M, 1.3, 0.8, color_adapt=ca, interpret=True))(w)
  got = np.asarray(q16.decode_p(q16.unpack_channels(pw)))
  want = np.asarray(p_ref).reshape(2, 12, 16, 128)
  want = np.where(want > 0.0, want, 0.0)
  bound = (1.0 + want) ** 2 * (0.6 / 65535.0)
  assert (np.abs(got - want) <= bound).all()
  np.testing.assert_allclose(np.asarray(mx).ravel(),
                             np.asarray(mx_ref).ravel(), rtol=1e-5)


def test_map_q16_ca_zero_unchanged(rng):
  """color_adapt=0.0 must take the original one-adapt-per-pixel code
  path BITWISE (the ca_mode extension may not perturb the existing
  contract)."""
  codes = rng.integers(0, 65536, size=(1, 12, 16, 128))
  w = q16.pack_pair(jnp.asarray(codes[:, 0::2], jnp.int32),
                    jnp.asarray(codes[:, 1::2], jnp.int32))
  pa, ma = plrh.reinhard_map_q16_dma(w, M, 1.0, 1.0, interpret=True)
  pb, mb = plrh.reinhard_map_q16_dma(w, M, 1.0, 1.0, color_adapt=0.0,
                                     interpret=True)
  np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
  np.testing.assert_array_equal(np.asarray(ma), np.asarray(mb))


# ---------------------------------------------------------- end to end

def _q16_step(raws, prev, t, gamma, intensity, light_adapt, cc, stride,
              color_adapt=0.0):
  """The Camera16 fast route, composed exactly as fused_isp_step wires
  it (interpret-mode kernels for CPU)."""
  packed_w = pld.decode12_phases_q16(jnp.asarray(raws), interpret=True)
  x12q, samp = bayer.demosaic_phases_q16(
      packed_w, bayer.BayerPattern.RGGB, cc=cc,
      sample_step=max(stride // 2, 1), interpret=True)
  metrics = ci.metering_update_ca(samp, prev, t)
  cast, mx = plrh.reinhard_map_q16_dma(x12q, metrics, intensity,
                                       light_adapt,
                                       color_adapt=color_adapt,
                                       interpret=True)
  out12 = ci.reinhard_gamma_ca(cast, mx, gamma)
  return metrics, ci.planar_from_phases_transformed(
      out12, ImageTransform.none)


@pytest.mark.parametrize("gamma,intensity", [(1.0, 1.0), (0.9, 3.0),
                                             (0.6, 1.0)])
def test_q16_full_step_within_one_count(gamma, intensity):
  """End-to-end: the q16 fast route's u8 output stays within <=1 count
  of the strict XLA f16 path on a seeded (realistic) metering state."""
  raws = _raws(2)
  prev = jnp.zeros(9, jnp.float32)

  def strict(raws, prev, t):
    return ci.fused_isp_step(
        jnp.asarray(raws), prev, t, gamma, intensity, 1.0, 0.0,
        "packed12", False, types.f16, bayer.BayerPattern.RGGB, None,
        None, 8, ImageTransform.none, "reinhard")

  # frame 1 seeds the EMA (t=0 -> pure current-frame bounds)
  m_ref, out_ref = strict(raws, prev, 0.0)
  m_q16, out_q16 = _q16_step(raws, prev, 0.0, gamma, intensity, 1.0,
                             None, 8)
  np.testing.assert_allclose(np.asarray(m_q16), np.asarray(m_ref),
                             atol=5e-3)
  diff = np.abs(np.asarray(out_q16).astype(int)
                - np.asarray(out_ref).astype(int))
  assert diff.max() <= 1, f"u8 diff {diff.max()}"

  # frame 2 exercises the EMA path with each route's own metrics
  m_ref2, out_ref2 = strict(raws, m_ref, 0.2)
  m_q2, out_q2 = _q16_step(raws, m_q16, 0.2, gamma, intensity, 1.0,
                           None, 8)
  diff2 = np.abs(np.asarray(out_q2).astype(int)
                 - np.asarray(out_ref2).astype(int))
  assert diff2.max() <= 1, f"u8 diff {diff2.max()}"


def test_q16_full_step_color_adapt_within_one_count():
  """End-to-end with color_adapt > 0 (round 5: the map kernel's
  ca_mode makes this config part of the FULL q16 fast path — it was
  the strict XLA route before): u8 within <=1 count of strict."""
  raws = _raws(2)
  prev = jnp.zeros(9, jnp.float32)
  ca = 0.3

  def strict(raws, prev, t):
    return ci.fused_isp_step(
        jnp.asarray(raws), prev, t, 0.9, 3.0, 1.0, ca,
        "packed12", False, types.f16, bayer.BayerPattern.RGGB, None,
        None, 8, ImageTransform.none, "reinhard")

  m_ref, out_ref = strict(raws, prev, 0.0)
  m_q16, out_q16 = _q16_step(raws, prev, 0.0, 0.9, 3.0, 1.0, None, 8,
                             color_adapt=ca)
  np.testing.assert_allclose(np.asarray(m_q16), np.asarray(m_ref),
                             atol=5e-3)
  diff = np.abs(np.asarray(out_q16).astype(int)
                - np.asarray(out_ref).astype(int))
  assert diff.max() <= 1, f"u8 diff {diff.max()}"


def test_q16_route_gate_closed_off_tpu():
  """On CPU the gate is closed: fused_isp_step with the f16 working
  dtype takes the strict XLA path (this pins the gating so CPU runs
  never trip on the TPU-only kernels)."""
  assert not ci._q16_kernels_available((2, H, W * 3 // 2), 8)
  assert not ci._q16_front_available((2, H, W * 3 // 2), 4)


# ------------------------------------------------------- q16 FRONT route

def _patch_front(monkeypatch):
  """Open the q16 FRONT gate on CPU and route its kernels through
  interpret mode — exercises the real fused_isp_step wiring. The XLA
  demosaic is patched to raise, proving the front actually engaged.
  The route is REJECTED-BY-DATA as a default (loses to strict on every
  config family on chip, tools/probe_q16_front.py), so the opt-in env
  var must be set too."""
  import functools
  monkeypatch.setenv("TAICHI_IMAGE_TPU_Q16_FRONT", "1")
  monkeypatch.setattr(ci, "_q16_front_available", lambda shape, s: True)
  monkeypatch.setattr(pld, "decode12_phases_q16",
                      functools.partial(pld.decode12_phases_q16,
                                        interpret=True))
  monkeypatch.setattr(bayer, "demosaic_phases_q16",
                      functools.partial(bayer.demosaic_phases_q16,
                                        interpret=True))

  def _boom(*a, **k):
    raise AssertionError("XLA demosaic called — q16 front not taken")

  monkeypatch.setattr(ci, "demosaic_phases", _boom)


def _f16_step(raws, prev, t, **kw):
  args = dict(gamma=1.0, intensity=1.0, light_adapt=1.0, color_adapt=0.0,
              fmt="packed12", ids_format=False, work_dtype=types.f16,
              pattern=bayer.BayerPattern.RGGB, cc=None, resize_plan=None,
              stride=8, transform=ImageTransform.none, tonemap="reinhard")
  args.update(kw)
  return ci.fused_isp_step(jnp.asarray(raws), prev, t, **args)


# each config is OUTSIDE the full fast-path gate: the resize policy
# (reference camera_isp.py:302-315), linear tonemap, nonzero
# color_adapt, odd stride (round-4 VERDICT next #4). gamma > 1.5 is
# deliberately ABSENT: it is gated to the strict route
# (test_q16_front_gamma_gate_strict below).
@pytest.mark.parametrize("kw", [
    {"resize_plan": ((512, 32), None)},
    {"resize_plan": ((512, 32), None), "tonemap": "linear", "gamma": 0.9},
    {"tonemap": "linear", "gamma": 0.9},
    {"color_adapt": 0.3},
    {"stride": 5},  # odd stride: planar-assembly branch
], ids=["resize", "resize-linear", "linear", "coloradapt",
        "oddstride"])
def test_q16_front_within_one_count(kw, monkeypatch):
  """fused_isp_step's q16 FRONT route (Pallas decode+demosaic, lazily
  dequantized XLA tail) stays within <=1 u8 count of the strict XLA
  f16 path on every configuration family the full q16 route rejects."""
  raws = _raws(2)
  prev = jnp.zeros(9, jnp.float32)
  m_ref, out_ref = _f16_step(raws, prev, 0.0, **kw)

  _patch_front(monkeypatch)
  m_q, out_q = _f16_step(raws, prev, 0.0, **kw)
  np.testing.assert_allclose(np.asarray(m_q), np.asarray(m_ref),
                             atol=5e-3)
  for a, b in zip(jax.tree_util.tree_leaves(out_q),
                  jax.tree_util.tree_leaves(out_ref)):
    diff = np.abs(np.asarray(a).astype(int) - np.asarray(b).astype(int))
    assert diff.max() <= 1, f"u8 diff {diff.max()} for {kw}"


def test_q16_front_default_off(monkeypatch):
  """The q16 FRONT route is rejected-by-data (slower than strict on
  every config family it covers — two clean on-chip sessions,
  tools/probe_q16_front.py) and must stay OFF without the
  TAICHI_IMAGE_TPU_Q16_FRONT=1 opt-in, even when its kernels are
  available."""
  monkeypatch.delenv("TAICHI_IMAGE_TPU_Q16_FRONT", raising=False)
  monkeypatch.setattr(ci, "_q16_front_available", lambda shape, s: True)
  called = {}
  orig = ci.demosaic_phases

  def spy(*a, **k):
    called["xla"] = True
    return orig(*a, **k)

  monkeypatch.setattr(ci, "demosaic_phases", spy)
  raws = _raws(1)
  prev = jnp.zeros(9, jnp.float32)
  _f16_step(raws, prev, 0.0, tonemap="linear", gamma=0.9)
  assert called.get("xla"), "strict XLA demosaic must run by default"


def test_q16_front_gamma_gate_strict(monkeypatch):
  """gamma > 1.5 must NOT take the q16 front: the root exponent's
  unbounded slope at black amplifies the x12 grid's 2^-17 absolute
  quantization to 5 u8 counts on chip (measured, rejected-by-data —
  see the q16_front gate comment in fused_isp_step). With the front
  gate forced open, the strict XLA demosaic must still be the one
  called."""
  raws = _raws(1)
  prev = jnp.zeros(9, jnp.float32)
  _patch_front(monkeypatch)
  with pytest.raises(AssertionError, match="XLA demosaic called"):
    _f16_step(raws, prev, 0.0, gamma=2.0)
