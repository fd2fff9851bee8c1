"""Pallas TPU bilinear resize from 12-channel Bayer phase form.

The XLA formulation (`models/camera_isp._resize_from_phases`) costs
~+10 ms/step at 6x4K->1080p: the row/column taps become minor-dim
gathers, which TPUs execute as scalarized loads. This kernel removes
every gather by expressing the separable bilinear interpolation as
banded weight-matrix products on the MXU (reference sampling semantics:
/root/reference/taichi_image/interpolate.py:25-33,59-86, the
truncation-anchored taps of `_axis_samples`):

  rows_cp = W_0 @ band[rp=0, cp] + W_1 @ band[rp=1, cp]     (row interp)
  out     = rows_0 @ V_0 + rows_1 @ V_1                     (col interp)

where W_rp (TR x BH) carries (1-f)/f at the half-resolution source row
of each tap with row parity rp, and V_cp (BW x TW) carries (1-g)/g at
the half-resolution source column of each tap with column parity cp —
the Bayer phase parity merge that `_resize_from_phases` does with
reshapes happens inside the weight matrices, so the kernel reads the
demosaic kernel's (N, 12, hh, wh) output directly with no repacking.

Each (row-tile, col-tile) output block needs only a contiguous
(BH x BW) window of each of its color's 4 phase planes: windows are
fetched with double-buffered manual DMA at dynamic offsets (rows
8-aligned, lanes 128-aligned — the alignments this Mosaic toolchain's
divisibility prover accepts, docs/PERFORMANCE.md). Keeping both matmul
operands window-sized is what makes the MXU cost ~the tap count rather
than ~the full image width (a dense (wh x TW) column product would do
~500x the needed MACs at 6x4K).

Precision: operands are bf16 with f32 MXU accumulation. Inputs are
already bf16 (exact); the only quantization vs the XLA f32 path is the
bf16 rounding of the (1-f)/f weights and of the row-stage intermediate
— zero when the taps are exactly representable (e.g. the x0.5 flagship
config: frac = 0, kernel output is BITWISE equal), otherwise ~2^-9
relative, holding <=1 u8 count after tonemapping
(tests/test_pallas_resize.py, tools/verify_tpu.py). bf16-only: the
f16/f32 pipelines keep the XLA path (bf16 matmuls would *lose*
precision for true f32 data).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taichi_image_tpu.ops.interpolate import _axis_samples
from taichi_image_tpu.utils.cache import cache

_VMEM_BUDGET = 10 * 1024 * 1024


def _row_bands(r_lo, r_hi, h_out, tr, ni):
  """Per-row-tile half-res band starts (8-aligned) + common height."""
  starts, spans = [], []
  for i in range(ni):
    o0 = min(i * tr, h_out - 1)
    o1 = min((i + 1) * tr - 1, h_out - 1)
    s = (int(r_lo[o0]) // 2 // 8) * 8
    starts.append(s)
    spans.append(int(r_hi[o1]) // 2 - s + 1)
  bh = -(-max(spans) // 8) * 8
  return np.asarray(starts, np.int32), bh


def _col_bands(c_lo, c_hi, w_out, tw, nj):
  """Per-col-tile half-res window starts (128-aligned) + common width."""
  starts, spans = [], []
  for j in range(nj):
    o0 = min(j * tw, w_out - 1)
    o1 = min((j + 1) * tw - 1, w_out - 1)
    s = (int(c_lo[o0]) // 2 // 128) * 128
    starts.append(s)
    spans.append(int(c_hi[o1]) // 2 - s + 1)
  bw = -(-max(spans) // 128) * 128
  return np.asarray(starts, np.int32), bw


@cache
def _plan(hh: int, wh: int, h_out: int, w_out: int, sy: float, sx: float):
  """Static resize plan: tile/window geometry and the four bf16 weight
  matrices (numpy). None when the shape cannot be tiled within VMEM."""
  r_lo, r_hi, r_f = _axis_samples(h_out, 2 * hh, sy)
  c_lo, c_hi, c_f = _axis_samples(w_out, 2 * wh, sx)

  chosen = None
  for tw in (512, 256, 128):
    for tr in (128, 64, 32, 16, 8):
      ni = -(-h_out // tr)
      nj = -(-w_out // tw)
      rstarts, bh = _row_bands(r_lo, r_hi, h_out, tr, ni)
      cstarts, bw = _col_bands(c_lo, c_hi, w_out, tw, nj)
      vmem = (2 * 4 * bh * bw * 2        # band windows, double-buffered
              + 2 * 2 * tr * bh * 2     # W blocks, double-buffered
              + 2 * 2 * bw * tw * 2     # V blocks, double-buffered
              + 2 * 2 * tr * bw * 4     # rows temporaries (f32)
              + 2 * tr * tw * 2)        # out block, double-buffered
      if vmem <= _VMEM_BUDGET:
        chosen = (tr, tw, ni, nj, rstarts, bh, cstarts, bw)
        break
    if chosen:
      break
  if chosen is None:
    return None
  tr, tw, ni, nj, rstarts, bh, cstarts, bw = chosen

  # row weights: W_rp[i, o_local, k] accumulates (1-f) at r_lo and f at
  # r_hi for taps whose full-res row 2*(k + rstart_i) + rp matches
  w0 = np.zeros((ni, tr, bh), np.float32)
  w1 = np.zeros((ni, tr, bh), np.float32)
  for i in range(ni):
    for ol in range(tr):
      o = min(i * tr + ol, h_out - 1)
      for r, wgt in ((int(r_lo[o]), 1.0 - float(r_f[o])),
                     (int(r_hi[o]), float(r_f[o]))):
        (w0 if r % 2 == 0 else w1)[i, ol, r // 2 - int(rstarts[i])] += wgt

  # column weights: V_cp[j, k, o_local] likewise on full-res column
  # 2*(k + cstart_j) + cp
  v0 = np.zeros((nj, bw, tw), np.float32)
  v1 = np.zeros((nj, bw, tw), np.float32)
  for j in range(nj):
    for ol in range(tw):
      o = min(j * tw + ol, w_out - 1)
      for cidx, wgt in ((int(c_lo[o]), 1.0 - float(c_f[o])),
                        (int(c_hi[o]), float(c_f[o]))):
        (v0 if cidx % 2 == 0 else
         v1)[j, cidx // 2 - int(cstarts[j]), ol] += wgt

  return dict(tr=tr, tw=tw, ni=ni, nj=nj, bh=bh, bw=bw,
              rstarts=rstarts, cstarts=cstarts,
              hh_need=int(rstarts.max()) + bh,
              wh_need=int(cstarts.max()) + bw,
              w0=w0.astype(jnp.bfloat16), w1=w1.astype(jnp.bfloat16),
              v0=v0.astype(jnp.bfloat16), v1=v1.astype(jnp.bfloat16))


def _kernel(bh, bw, ni, nj, nt,
            hbm_ref, rs_ref, cs_ref, w0_ref, w1_ref, v0_ref, v1_ref,
            out_ref, band, sems):
  t = pl.program_id(0)

  def copies(slot, tt):
    # channel layout (cp*2 + rp)*3 + c: one DMA per phase plane of this
    # tile's color; scratch plane p = cp*2 + rp. Offsets are 8*k rows /
    # 128*k lanes so the divisibility prover accepts them.
    a = tt // (3 * ni * nj)
    c = (tt // (ni * nj)) % 3
    rs = rs_ref[(tt // nj) % ni]
    cs = cs_ref[tt % nj]
    return [pltpu.make_async_copy(
        hbm_ref.at[a, p * 3 + c, pl.ds(8 * rs, bh), pl.ds(128 * cs, bw)],
        band.at[slot, p], sems.at[slot, p]) for p in range(4)]

  @pl.when(t == 0)
  def _():
    for cp in copies(0, 0):
      cp.start()

  @pl.when(t + 1 < nt)
  def _():
    for cp in copies((t + 1) % 2, t + 1):
      cp.start()

  for cp in copies(t % 2, t):
    cp.wait()
  cur = band.at[t % 2]

  acc = None
  for cp in range(2):
    rows = jnp.dot(w0_ref[0], cur[cp * 2 + 0],
                   preferred_element_type=jnp.float32)
    rows = rows + jnp.dot(w1_ref[0], cur[cp * 2 + 1],
                          preferred_element_type=jnp.float32)
    part = jnp.dot(rows.astype(jnp.bfloat16),
                   (v0_ref if cp == 0 else v1_ref)[0],
                   preferred_element_type=jnp.float32)
    acc = part if acc is None else acc + part
  out_ref[0, 0] = acc.astype(out_ref.dtype)


def resize_x12_bf16(x12, size, scale, interpret: bool = False):
  """(N, 12, hh, wh) bf16 phase-RGB -> (N, 3, h_out, w_out) bf16 planar,
  matching `_resize_from_phases` within the bf16 weight-quantization
  contract (module docstring; bitwise for exactly-representable taps).
  ``size`` = (w_out, h_out); ``scale`` = (scale_y, scale_x) after
  `_plan_scales` normalization (or a scalar)."""
  n, _, hh, wh = x12.shape
  w_out, h_out = size
  sy, sx = (scale, scale) if np.ndim(scale) == 0 else tuple(scale)
  plan = _plan(hh, wh, h_out, w_out, float(sy), float(sx))
  assert plan is not None, (hh, wh, h_out, w_out)
  tr, tw, ni, nj = plan["tr"], plan["tw"], plan["ni"], plan["nj"]
  bh, bw = plan["bh"], plan["bw"]
  nt = n * 3 * ni * nj

  pad_h = max(0, plan["hh_need"] - hh)
  pad_w = max(0, plan["wh_need"] - wh)
  src = jnp.pad(x12, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)))

  out = pl.pallas_call(
      functools.partial(_kernel, bh, bw, ni, nj, nt),
      out_shape=jax.ShapeDtypeStruct((n, 3, ni * tr, nj * tw),
                                     jnp.bfloat16),
      grid=(nt,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec(memory_space=pltpu.SMEM),
          pl.BlockSpec(memory_space=pltpu.SMEM),
          pl.BlockSpec((1, tr, bh), lambda t: ((t // nj) % ni, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, tr, bh), lambda t: ((t // nj) % ni, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, bw, tw), lambda t: (t % nj, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, bw, tw), lambda t: (t % nj, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec(
          (1, 1, tr, tw),
          lambda t: (t // (3 * ni * nj), (t // (ni * nj)) % 3,
                     (t // nj) % ni, t % nj),
          memory_space=pltpu.VMEM),
      scratch_shapes=[
          pltpu.VMEM((2, 4, bh, bw), jnp.bfloat16),
          pltpu.SemaphoreType.DMA((2, 4)),
      ],
      interpret=interpret,
  )(src, jnp.asarray(plan["rstarts"] // 8),
    jnp.asarray(plan["cstarts"] // 128),
    jnp.asarray(plan["w0"]), jnp.asarray(plan["w1"]),
    jnp.asarray(plan["v0"]), jnp.asarray(plan["v1"]))
  if (ni * tr, nj * tw) != (h_out, w_out):
    out = out[:, :, :h_out, :w_out]
  return out


def resize_pallas_available(hh: int, wh: int, h_out: int, w_out: int,
                            sy: float, sx: float) -> bool:
  """True when the bf16 resize kernel can run this shape: TPU backend,
  off-switch unset, and a VMEM-feasible plan."""
  from taichi_image_tpu.ops.pallas import backend_enabled
  if not backend_enabled():
    return False
  if min(h_out, w_out) < 8 or hh < 8 or wh < 128:
    return False
  return _plan(hh, wh, h_out, w_out, float(sy), float(sx)) is not None
