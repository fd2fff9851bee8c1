"""Probe: I420 output-path formulations at 6x4K bf16 (chained-jit).

After the round-3 tail-regression fix the honest I420 marginal is
+3.85 ms over the g=1 RGB anchor — WORSE than round 2's composed
gamma->u8->convert (+3.2). The mid-round "barrier recompute" win was an
artifact of the regressed anchor. This probe races the formulations
same-run:

- current:   fused_isp_step color_format="yuv420" (gamma finish
             recomputed in the Y and chroma chains behind an
             optimization_barrier; no u8 RGB intermediate)
- composed:  reinhard_gamma_ca -> u8 phase RGB -> yuv420_from_phases_u8
             (u8 RGB materialized once, read by both chains — round-2
             shipped structure)
- y_only:    Y plane only from the map output (lower bound for the
             Y chain)
- rgb:       the RGB anchor (fused_isp_step color_format="rgb")
"""

import sys

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu import types
from taichi_image_tpu.models.camera_isp import (fused_isp_step,
                                                load_raw_phases,
                                                metering_update_ca,
                                                reinhard_gamma_ca,
                                                reinhard_map_max_ca,
                                                yuv420_from_phases_u8)
from taichi_image_tpu.ops.bayer import BayerPattern, demosaic_phases
from taichi_image_tpu.ops.interpolate import ImageTransform

N, H, W = 6, 2160, 3840
WD = types.bf16
K = 10
REPS = 3


def timeit(fn, raws, k=K, reps=REPS):
  @jax.jit
  def steps(raws):
    acc = jnp.float32(0)
    for i in range(k):
      acc = acc + fn(raws ^ jnp.uint8(i))
    return acc
  _ = np.asarray(steps(raws))
  best = None
  for _ in range(reps):
    t0 = time.perf_counter()
    _ = np.asarray(steps(raws))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / k * 1000.0


def _front(raws):
  ph = load_raw_phases(raws, "packed12", WD)
  x12, samp = demosaic_phases(ph, BayerPattern.RGGB,
                              out_dtype=types.canonical_dtype(WD),
                              sample_step=4)
  m = metering_update_ca(samp, jnp.zeros(9, jnp.float32),
                         jnp.float32(0.9))
  n, _, hh, wh = x12.shape
  cast, max_out = reinhard_map_max_ca(
      x12.reshape(n, 4, 3, hh, wh), m, 1.0, 1.0, 0.0, WD)
  return m, cast, max_out


def s_rgb(raws):
  m, out = fused_isp_step(
      raws, jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0, 1.0, 1.0,
      0.0, "packed12", False, WD, BayerPattern.RGGB, None, None, 8,
      ImageTransform.none, "reinhard")
  return jnp.sum(out, dtype=jnp.float32) + jnp.sum(m)


def s_current(raws):
  m, (y, uv) = fused_isp_step(
      raws, jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0, 1.0, 1.0,
      0.0, "packed12", False, WD, BayerPattern.RGGB, None, None, 8,
      ImageTransform.none, "reinhard", color_format="yuv420")
  return (jnp.sum(y, dtype=jnp.float32) + jnp.sum(uv, dtype=jnp.float32)
          + jnp.sum(m))


def s_composed(raws):
  m, cast, max_out = _front(raws)
  u8 = reinhard_gamma_ca(cast, max_out, 1.0)
  y, uv = yuv420_from_phases_u8(u8)
  return (jnp.sum(y, dtype=jnp.float32) + jnp.sum(uv, dtype=jnp.float32)
          + jnp.sum(m))


def _yuv_single(cast, max_out, gamma, concat_root):
  """Single-fusion I420 from the FLAT map output: gamma finish + u8
  quantization emulated in-register (clip -> u8 -> f32 round-trip:
  bitwise the composed path's values) + both yuv chains, with no
  materialized u8 RGB. ``concat_root=True`` roots everything at ONE
  (n, 6, hh, wh) u8 concat so XLA must form a single fusion reading
  the kernel output once."""
  from taichi_image_tpu.ops import bayer as bayer_ops
  from taichi_image_tpu.ops.color import _YUV_M, _YUV_OFFSET
  m, off = _YUV_M, _YUV_OFFSET
  mx = jnp.maximum(1e-6, max_out)
  out = cast.astype(jnp.float32) / mx           # flat (n, 12, hh, wh)
  if not (isinstance(gamma, float) and gamma == 1.0):
    from taichi_image_tpu.models.camera_isp import _gamma_pow
    out = _gamma_pow(out, 1.0 / gamma)
  u8f = jnp.clip(255.0 * out, 0, 255).astype(jnp.uint8).astype(
      jnp.float32)
  x = u8f / 255.0
  # channel slices on the MAJOR axis (stride there is not the lane trap)
  r, g, b = x[:, 0::3], x[:, 1::3], x[:, 2::3]  # each (n, 4, hh, wh)
  y_ph = jnp.minimum(1.0, m[0, 0] * b + m[0, 1] * g + m[0, 2] * r
                     + off[0])
  y12_u8 = jnp.clip(y_ph * 255.0, 0, 255).astype(jnp.uint8)
  mb, mg, mr = (jnp.mean(b, axis=1), jnp.mean(g, axis=1),
                jnp.mean(r, axis=1))
  u = m[1, 0] * mb + m[1, 1] * mg + m[1, 2] * mr + off[1]
  v = m[2, 0] * mb + m[2, 1] * mg + m[2, 2] * mr + off[2]
  uv = jnp.minimum(1.0, jnp.stack([v, u], axis=1))
  uv_u8 = jnp.clip(uv * 255.0, 0, 255).astype(jnp.uint8)
  if concat_root:
    big = jnp.concatenate([y12_u8, uv_u8], axis=1)  # (n, 6, hh, wh)
    return bayer_ops.phases_to_plane(big[:, :4]), big[:, 4:6]
  return bayer_ops.phases_to_plane(y12_u8), uv_u8


def s_single_cat(raws):
  m, cast, max_out = _front(raws)
  y, uv = _yuv_single(cast, max_out, 1.0, True)
  return (jnp.sum(y, dtype=jnp.float32) + jnp.sum(uv, dtype=jnp.float32)
          + jnp.sum(m))


def s_single_nocat(raws):
  m, cast, max_out = _front(raws)
  y, uv = _yuv_single(cast, max_out, 1.0, False)
  return (jnp.sum(y, dtype=jnp.float32) + jnp.sum(uv, dtype=jnp.float32)
          + jnp.sum(m))


def _yuv_from_u8_cat(u8_12):
  """Composed-u8 structure, but both yuv chains rooted at ONE
  (n, 6, hh, wh) u8 concat so the materialized u8 RGB is read once."""
  from taichi_image_tpu.ops import bayer as bayer_ops
  from taichi_image_tpu.ops.color import _YUV_M, _YUV_OFFSET
  m, off = _YUV_M, _YUV_OFFSET
  n, _, hh, wh = u8_12.shape
  x = u8_12.astype(jnp.float32) / 255.0
  r, g, b = x[:, 0::3], x[:, 1::3], x[:, 2::3]
  y_ph = jnp.minimum(1.0, m[0, 0] * b + m[0, 1] * g + m[0, 2] * r
                     + off[0])
  y12_u8 = jnp.clip(y_ph * 255.0, 0, 255).astype(jnp.uint8)
  mb, mg, mr = (jnp.mean(b, axis=1), jnp.mean(g, axis=1),
                jnp.mean(r, axis=1))
  u = m[1, 0] * mb + m[1, 1] * mg + m[1, 2] * mr + off[1]
  v = m[2, 0] * mb + m[2, 1] * mg + m[2, 2] * mr + off[2]
  uv = jnp.minimum(1.0, jnp.stack([v, u], axis=1))
  uv_u8 = jnp.clip(uv * 255.0, 0, 255).astype(jnp.uint8)
  big = jnp.concatenate([y12_u8, uv_u8], axis=1)
  return bayer_ops.phases_to_plane(big[:, :4]), big[:, 4:6]


def s_composed_cat(raws):
  m, cast, max_out = _front(raws)
  u8 = reinhard_gamma_ca(cast, max_out, 1.0)
  y, uv = _yuv_from_u8_cat(u8)
  return (jnp.sum(y, dtype=jnp.float32) + jnp.sum(uv, dtype=jnp.float32)
          + jnp.sum(m))


def s_y_only(raws):
  m, cast, max_out = _front(raws)
  u8 = reinhard_gamma_ca(cast, max_out, 1.0)
  from taichi_image_tpu.ops import bayer as bayer_ops
  from taichi_image_tpu.ops.color import _YUV_M, _YUV_OFFSET
  n, _, hh, wh = u8.shape
  xy = u8.reshape(n, 4, 3, hh, wh).astype(jnp.float32) / 255.0
  b, g, r = xy[:, :, 2], xy[:, :, 1], xy[:, :, 0]
  y_ph = jnp.minimum(1.0, _YUV_M[0, 0] * b + _YUV_M[0, 1] * g
                     + _YUV_M[0, 2] * r + _YUV_OFFSET[0])
  y_u8 = bayer_ops.phases_to_plane(
      jnp.clip(y_ph * 255.0, 0, 255).astype(jnp.uint8))
  return jnp.sum(y_u8, dtype=jnp.float32) + jnp.sum(m)


def s_gamma_only(raws):
  """u8 12-phase materialization alone (no interleave, no yuv) — the
  shared prefix of the composed I420 path."""
  m, cast, max_out = _front(raws)
  u8 = reinhard_gamma_ca(cast, max_out, 1.0)
  return jnp.sum(u8, dtype=jnp.float32) + jnp.sum(m)


def s_y_nointerleave(raws):
  """Y chain minus the phase interleave: per-phase Y u8 summed in phase
  form — separates matrix+quantize cost from the u8 interleave."""
  m, cast, max_out = _front(raws)
  u8 = reinhard_gamma_ca(cast, max_out, 1.0)
  from taichi_image_tpu.ops.color import _YUV_M, _YUV_OFFSET
  n, _, hh, wh = u8.shape
  xy = u8.reshape(n, 4, 3, hh, wh).astype(jnp.float32) / 255.0
  b, g, r = xy[:, :, 2], xy[:, :, 1], xy[:, :, 0]
  y_ph = jnp.minimum(1.0, _YUV_M[0, 0] * b + _YUV_M[0, 1] * g
                     + _YUV_M[0, 2] * r + _YUV_OFFSET[0])
  y12 = jnp.clip(y_ph * 255.0, 0, 255).astype(jnp.uint8)
  return jnp.sum(y12, dtype=jnp.float32) + jnp.sum(m)


def s_y_int(raws):
  """Y chain with INTEGER arithmetic: u8 -> i32 MACs -> shift -> u8
  (no f32 anywhere); probes whether the f32 converts/multiplies are the
  Y-chain cost. Values approximate (rounding) — speed probe only."""
  m, cast, max_out = _front(raws)
  u8 = reinhard_gamma_ca(cast, max_out, 1.0)
  from taichi_image_tpu.ops import bayer as bayer_ops
  from taichi_image_tpu.ops.color import _YUV_M, _YUV_OFFSET
  n, _, hh, wh = u8.shape
  xi = u8.reshape(n, 4, 3, hh, wh).astype(jnp.int32)
  b, g, r = xi[:, :, 2], xi[:, :, 1], xi[:, :, 0]
  SH = 15
  cb = int(round(float(_YUV_M[0, 0]) * (1 << SH)))
  cg = int(round(float(_YUV_M[0, 1]) * (1 << SH)))
  cr = int(round(float(_YUV_M[0, 2]) * (1 << SH)))
  co = int(round(float(_YUV_OFFSET[0]) * 255.0 * (1 << SH)))
  y255 = (cb * b + cg * g + cr * r + co + (1 << (SH - 1))) >> SH
  y12 = jnp.clip(y255, 0, 255).astype(jnp.uint8)
  y_u8 = bayer_ops.phases_to_plane(y12)
  return jnp.sum(y_u8, dtype=jnp.float32) + jnp.sum(m)


def s_uv_only(raws):
  """Chroma chain alone (phase means + matrix, quarter-res output)."""
  m, cast, max_out = _front(raws)
  u8 = reinhard_gamma_ca(cast, max_out, 1.0)
  from taichi_image_tpu.ops.color import _YUV_M, _YUV_OFFSET
  mm, off = _YUV_M, _YUV_OFFSET
  n, _, hh, wh = u8.shape
  xc = u8.reshape(n, 4, 3, hh, wh).astype(jnp.float32) / 255.0
  bc, gc, rc = xc[:, :, 2], xc[:, :, 1], xc[:, :, 0]
  mb, mg, mr = (jnp.mean(bc, axis=1), jnp.mean(gc, axis=1),
                jnp.mean(rc, axis=1))
  u = mm[1, 0] * mb + mm[1, 1] * mg + mm[1, 2] * mr + off[1]
  v = mm[2, 0] * mb + mm[2, 1] * mg + mm[2, 2] * mr + off[2]
  uv = jnp.minimum(1.0, jnp.stack([v, u], axis=1))
  uv_u8 = jnp.clip(uv * 255.0, 0, 255).astype(jnp.uint8)
  return jnp.sum(uv_u8, dtype=jnp.float32) + jnp.sum(m)


def _yuv_w6():
  """(6, 12) channel-contraction matrix: rows 0-3 = Y of phase p (M row
  0 on that phase's BGR channels), rows 4-5 = V, U of the phase mean
  (M rows 2, 1 with each channel coefficient /4). Y and UV become ONE
  dot over the channel axis — the u8 RGB is read exactly once, and the
  fusion is rooted at a matmul (not a concat)."""
  from taichi_image_tpu.ops.color import _YUV_M
  import numpy as _np
  w = _np.zeros((6, 12), _np.float32)
  for p in range(4):
    # channel layout: 12 = 4 phases x 3 (r, g, b); matrix is applied to
    # the channel-REVERSED (b, g, r) vector
    w[p, 3 * p + 2] = float(_YUV_M[0, 0])   # b
    w[p, 3 * p + 1] = float(_YUV_M[0, 1])   # g
    w[p, 3 * p + 0] = float(_YUV_M[0, 2])   # r
  for row, mrow in ((4, 2), (5, 1)):        # V then U plane order
    for p in range(4):
      w[row, 3 * p + 2] = float(_YUV_M[mrow, 0]) / 4.0
      w[row, 3 * p + 1] = float(_YUV_M[mrow, 1]) / 4.0
      w[row, 3 * p + 0] = float(_YUV_M[mrow, 2]) / 4.0
  return w


def _yuv_from_u8_dot(u8_12):
  from taichi_image_tpu.ops import bayer as bayer_ops
  from taichi_image_tpu.ops.color import _YUV_OFFSET
  n, _, hh, wh = u8_12.shape
  w = jnp.asarray(_yuv_w6())
  x = u8_12.astype(jnp.float32) / 255.0
  yuv6 = jnp.einsum("nchw,dc->ndhw", x, w,
                    precision=jax.lax.Precision.HIGHEST)
  off = jnp.asarray([float(_YUV_OFFSET[0])] * 4
                    + [float(_YUV_OFFSET[2]), float(_YUV_OFFSET[1])],
                    jnp.float32)
  yuv6 = jnp.minimum(1.0, yuv6 + off[None, :, None, None])
  u8_6 = jnp.clip(yuv6 * 255.0, 0, 255).astype(jnp.uint8)
  return bayer_ops.phases_to_plane(u8_6[:, :4]), u8_6[:, 4:6]


def s_dot_root(raws):
  m, cast, max_out = _front(raws)
  u8 = reinhard_gamma_ca(cast, max_out, 1.0)
  y, uv = _yuv_from_u8_dot(u8)
  return (jnp.sum(y, dtype=jnp.float32) + jnp.sum(uv, dtype=jnp.float32)
          + jnp.sum(m))


def _yuv_from_u8_dot_bf16(u8_12):
  """Dot-root with bf16 operands: u8 -> bf16 is exact for ints <= 255
  and halves the converted operand bytes; W in bf16 rounds the
  coefficients (~4e-4) -> result error <= ~0.3 of a count before
  quantization, so Y/UV can differ by 1 count at truncation
  boundaries. f32 accumulation via preferred_element_type."""
  from taichi_image_tpu.ops import bayer as bayer_ops
  from taichi_image_tpu.ops.color import _YUV_OFFSET
  n, _, hh, wh = u8_12.shape
  w = jnp.asarray(_yuv_w6(), jnp.bfloat16)
  x = u8_12.astype(jnp.bfloat16)  # 0..255 ints, exact in bf16
  yuv6 = jnp.einsum("nchw,dc->ndhw", x, w,
                    preferred_element_type=jnp.float32) / 255.0
  off = jnp.asarray([float(_YUV_OFFSET[0])] * 4
                    + [float(_YUV_OFFSET[2]), float(_YUV_OFFSET[1])],
                    jnp.float32)
  yuv6 = jnp.minimum(1.0, yuv6 + off[None, :, None, None])
  u8_6 = jnp.clip(yuv6 * 255.0, 0, 255).astype(jnp.uint8)
  return bayer_ops.phases_to_plane(u8_6[:, :4]), u8_6[:, 4:6]


def s_dot_bf16(raws):
  m, cast, max_out = _front(raws)
  u8 = reinhard_gamma_ca(cast, max_out, 1.0)
  y, uv = _yuv_from_u8_dot_bf16(u8)
  return (jnp.sum(y, dtype=jnp.float32) + jnp.sum(uv, dtype=jnp.float32)
          + jnp.sum(m))


def main():
  want = sys.argv[1:] if len(sys.argv) > 1 else None
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  # value check first: current vs composed must agree bitwise
  small = jax.device_put(rng.integers(0, 256, size=(2, 256, 384 * 3 // 2),
                                      dtype=np.uint8))
  def cur_small(r):
    _, (y, uv) = fused_isp_step(
        r, jnp.zeros(9, jnp.float32), jnp.float32(0.9), 1.0, 1.0, 1.0,
        0.0, "packed12", False, WD, BayerPattern.RGGB, None, None, 8,
        ImageTransform.none, "reinhard", color_format="yuv420")
    return y, uv
  def comp_small(r):
    ph = load_raw_phases(r, "packed12", WD)
    x12, samp = demosaic_phases(ph, BayerPattern.RGGB,
                                out_dtype=types.canonical_dtype(WD),
                                sample_step=4)
    m = metering_update_ca(samp, jnp.zeros(9, jnp.float32),
                           jnp.float32(0.9))
    n, _, hh, wh = x12.shape
    cast, max_out = reinhard_map_max_ca(
        x12.reshape(n, 4, 3, hh, wh), m, 1.0, 1.0, 0.0, WD)
    return yuv420_from_phases_u8(reinhard_gamma_ca(cast, max_out, 1.0))
  ya, uva = jax.jit(cur_small)(small)
  yb, uvb = jax.jit(comp_small)(small)
  dy = int(np.abs(np.asarray(ya, np.int32) - np.asarray(yb, np.int32)).max())
  duv = int(np.abs(np.asarray(uva, np.int32) - np.asarray(uvb, np.int32)).max())
  print(f"values: max|dY|={dy} max|dUV|={duv}", flush=True)

  # value check: single-fusion variants must match composed bitwise
  cb_y, cb_uv = jax.jit(comp_small)(small)
  def single_small(r):
    ph = load_raw_phases(r, "packed12", WD)
    x12, samp = demosaic_phases(ph, BayerPattern.RGGB,
                                out_dtype=types.canonical_dtype(WD),
                                sample_step=4)
    mm = metering_update_ca(samp, jnp.zeros(9, jnp.float32),
                            jnp.float32(0.9))
    n, _, hh, wh = x12.shape
    cast, max_out = reinhard_map_max_ca(
        x12.reshape(n, 4, 3, hh, wh), mm, 1.0, 1.0, 0.0, WD)
    return _yuv_single(cast, max_out, 1.0, True)
  sb_y, sb_uv = jax.jit(single_small)(small)
  dsy = int(np.abs(np.asarray(cb_y, np.int32)
                   - np.asarray(sb_y, np.int32)).max())
  dsuv = int(np.abs(np.asarray(cb_uv, np.int32)
                    - np.asarray(sb_uv, np.int32)).max())
  print(f"single vs composed: max|dY|={dsy} max|dUV|={dsuv}", flush=True)

  def cat_small(r):
    ph = load_raw_phases(r, "packed12", WD)
    x12, samp = demosaic_phases(ph, BayerPattern.RGGB,
                                out_dtype=types.canonical_dtype(WD),
                                sample_step=4)
    mm = metering_update_ca(samp, jnp.zeros(9, jnp.float32),
                            jnp.float32(0.9))
    n, _, hh, wh = x12.shape
    cast, max_out = reinhard_map_max_ca(
        x12.reshape(n, 4, 3, hh, wh), mm, 1.0, 1.0, 0.0, WD)
    return _yuv_from_u8_cat(reinhard_gamma_ca(cast, max_out, 1.0))
  ct_y, ct_uv = jax.jit(cat_small)(small)
  dcy = int(np.abs(np.asarray(cb_y, np.int32)
                   - np.asarray(ct_y, np.int32)).max())
  dcuv = int(np.abs(np.asarray(cb_uv, np.int32)
                    - np.asarray(ct_uv, np.int32)).max())
  print(f"concat-root vs composed: max|dY|={dcy} max|dUV|={dcuv}",
        flush=True)

  def dot_small(r):
    ph = load_raw_phases(r, "packed12", WD)
    x12, samp = demosaic_phases(ph, BayerPattern.RGGB,
                                out_dtype=types.canonical_dtype(WD),
                                sample_step=4)
    mm = metering_update_ca(samp, jnp.zeros(9, jnp.float32),
                            jnp.float32(0.9))
    n, _, hh, wh = x12.shape
    cast, max_out = reinhard_map_max_ca(
        x12.reshape(n, 4, 3, hh, wh), mm, 1.0, 1.0, 0.0, WD)
    return _yuv_from_u8_dot(reinhard_gamma_ca(cast, max_out, 1.0))
  dt_y, dt_uv = jax.jit(dot_small)(small)
  ddy = int(np.abs(np.asarray(cb_y, np.int32)
                   - np.asarray(dt_y, np.int32)).max())
  dduv = int(np.abs(np.asarray(cb_uv, np.int32)
                    - np.asarray(dt_uv, np.int32)).max())
  print(f"dot-root vs composed: max|dY|={ddy} max|dUV|={dduv}",
        flush=True)

  for name, fn in (("rgb anchor (g=1)", s_rgb),
                   ("I420 current (shipped)", s_current),
                   ("I420 composed u8 (r2 style)", s_composed),
                   ("I420 composed u8 concat-root", s_composed_cat),
                   ("I420 single-fusion concat", s_single_cat),
                   ("I420 single-fusion 2-output", s_single_nocat),
                   ("Y plane only", s_y_only),
                   ("substage gamma-u8 only", s_gamma_only),
                   ("substage Y no-interleave", s_y_nointerleave),
                   ("substage Y integer", s_y_int),
                   ("substage UV only", s_uv_only),
                   ("I420 dot-root (6x12 matmul)", s_dot_root),
                   ("I420 dot-root bf16 operands", s_dot_bf16)):
    if want and not any(w.lower() in name.lower() for w in want):
      continue
    try:
      print(f"{name:36} {timeit(fn, raws):6.2f} ms", flush=True)
    except Exception as e:
      print(f"{name:36} FAIL {type(e).__name__}: {str(e)[:90]}",
            flush=True)


if __name__ == "__main__":
  main()
