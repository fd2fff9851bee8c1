"""Pallas TPU packed12 decode kernel (raw bytes -> bf16 CFA phase planes).

The XLA formulation of the packed12 decode (models/camera_isp.py
load_raw_phases; reference bit layouts /root/reference/taichi_image/
packed.py:12-55) costs ~4.0 ms at 6x4K: the stride-3 byte relayout is a
lane gather. This kernel DMAs raw u8 row-tiles and does the de-stride on
the MXU with one-hot dots (probed in tools/probe_decode5.py; 3.1 ms):

  u8 rows (tr, wb) --DMA--> VMEM --u8->i32->f32--> byte lanes (exact)
  row parity:  R_q (tr/2, tr) @ bytes          [one-hot, exact: byte
  lane stride: bytes[:, 384g:384g+384] @ S      values <= 255 are exact
               (384, 384) -> [b0 | b1 | b2]     in bf16-reduced MXU dots]
  12-bit math in f32 (exact), * scale/4095, quantize to bf16.

Output is BIT-IDENTICAL to the XLA path (asserted in
tests/test_pallas_decode.py and on-chip by tools/verify_tpu.py): the
f32 value set and the final bf16 rounding point are the same.

Only bf16 phases are produced — Mosaic cannot emit f16, so the f16
parity pipeline keeps the XLA decode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sel384() -> np.ndarray:
  """S (384, 384): byte b of a 384-byte group feeds column 128*p + c
  where b == 3c + p (three byte planes side by side)."""
  s = np.zeros((384, 384), np.float32)
  for c in range(128):
    for p in range(3):
      s[3 * c + p, 128 * p + c] = 1.0
  return s


def _rsel(tr: int) -> np.ndarray:
  """R (2, tr/2, tr): one-hot row-parity selectors."""
  r = np.zeros((2, tr // 2, tr), np.float32)
  for q in range(2):
    r[q, np.arange(tr // 2), 2 * np.arange(tr // 2) + q] = 1.0
  return r


def decode_tiling(h: int, wb: int) -> int | None:
  """Row-tile size, or None if the shape can't run in this kernel.
  Requires: wb a multiple of 384 (so W/2 is lane-aligned), h divisible
  by a multiple-of-16 tile (row pairs x sublane quantum), and the
  double-buffered u8 scratch within VMEM budget."""
  if wb % 384 or wb < 384 or h < 16:
    return None
  best = None
  for tr in range(16, min(h, 256) + 1, 16):
    if h % tr:
      continue
    if 2 * tr * wb > 6 * 1024 * 1024:  # u8 scratch budget
      continue
    # prefer the largest tile <= 96 rows (probed fastest at 6x4K),
    # else the smallest viable
    if tr <= 96 or best is None:
      best = tr
  return best


def _decode_kernel(tr, wh, ni, nt, scale, ids, q12, hbm_ref, sel_ref,
                   rsel_ref, out_ref, scratch, sems):
  t = pl.program_id(0)

  def src(tt):
    return hbm_ref.at[tt // ni, pl.ds((tt % ni) * tr, tr)]

  def dma(slot, tt):
    return pltpu.make_async_copy(src(tt), scratch.at[slot], sems.at[slot])

  @pl.when(t == 0)
  def _():
    dma(0, 0).start()

  @pl.when(t + 1 < nt)
  def _():
    dma((t + 1) % 2, t + 1).start()

  dma(t % 2, t).wait()
  by = scratch[t % 2].astype(jnp.int32).astype(jnp.float32)  # (tr, wb)

  ng = wh // 128
  for q in range(2):
    rows = jnp.dot(rsel_ref[q], by)                    # (tr/2, wb)
    for g in range(ng):
      grp = jnp.dot(rows[:, 384 * g:384 * (g + 1)], sel_ref[...])
      b0 = grp[:, 0:128]
      b1 = grp[:, 128:256]
      b2 = grp[:, 256:384]
      if not ids:
        # standard: even = (b1 & 0xF) << 8 | b0; odd = b2 << 4 | b1 >> 4
        b1hi = jnp.floor(b1 * (1.0 / 16.0))
        even = (b1 - b1hi * 16.0) * 256.0 + b0
        odd = b2 * 16.0 + b1hi
      else:
        # IDS: even = b0 << 4 | (b2 & 0xF); odd = b1 << 4 | b2 >> 4
        b2hi = jnp.floor(b2 * (1.0 / 16.0))
        even = b0 * 16.0 + (b2 - b2hi * 16.0)
        odd = b1 * 16.0 + b2hi
      if q12:
        # Camera16 fast path: pack the raw 12-bit codes (exact f32
        # integers) as even | odd << 16 — BIT-EXACT, no f16 rounding
        # (ops/pallas/q16 module note)
        out_ref[0, q, :, 128 * g:128 * (g + 1)] = (
            even.astype(jnp.int32) | (odd.astype(jnp.int32) << 16))
      else:
        out_ref[0, 2 * q + 0, :, 128 * g:128 * (g + 1)] = (
            even * scale).astype(jnp.bfloat16)
        out_ref[0, 2 * q + 1, :, 128 * g:128 * (g + 1)] = (
            odd * scale).astype(jnp.bfloat16)


def decode12_phases_bf16(raws_u8, ids_format: bool = False,
                         interpret: bool = False,
                         row_tile: int | None = None):
  """(N, H, W*3/2) u8 packed12 -> (N, 4, H/2, W/2) bf16 phase planes,
  bit-identical to load_raw_phases(..., 'packed12', bf16).

  ``row_tile`` overrides the tiling heuristic (tools/probe_decode6.py
  races tile sizes; values are bitwise-equal across tiles)."""
  n, h, wb = raws_u8.shape
  wh = wb // 3
  tr = row_tile if row_tile is not None else decode_tiling(h, wb)
  assert tr is not None and h % tr == 0, (h, wb, tr)
  ni = h // tr
  nt = n * ni

  def out_map(t):
    return (t // ni, 0, t % ni, 0)

  kernel = functools.partial(_decode_kernel, tr, wh, ni, nt,
                             float(1.0 / 4095.0), bool(ids_format),
                             False)
  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((n, 4, h // 2, wh), jnp.bfloat16),
      grid=(nt,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((384, 384), lambda t: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((2, tr // 2, tr), lambda t: (0, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, 4, tr // 2, wh), out_map,
                             memory_space=pltpu.VMEM),
      scratch_shapes=[
          pltpu.VMEM((2, tr, wb), jnp.uint8),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(raws_u8, jnp.asarray(_sel384()), jnp.asarray(_rsel(tr)))


def decode12_phases_q16(raws_u8, ids_format: bool = False,
                        interpret: bool = False):
  """(N, H, W*3/2) u8 packed12 -> (N, 2, H/2, W/2) i32 q12-packed phase
  codes (word c = raw code of phase 2c | phase 2c+1 << 16) — the
  Camera16 fast-path loader (ops/pallas/q16 module note). BIT-EXACT:
  the packed words carry the raw 12-bit sensor codes; dequantize with
  ``code * (1/4095)``."""
  n, h, wb = raws_u8.shape
  wh = wb // 3
  tr = decode_tiling(h, wb)
  assert tr is not None, (h, wb)
  ni = h // tr
  nt = n * ni

  def out_map(t):
    return (t // ni, 0, t % ni, 0)

  kernel = functools.partial(_decode_kernel, tr, wh, ni, nt,
                             1.0, bool(ids_format), True)
  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((n, 2, h // 2, wh), jnp.int32),
      grid=(nt,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((384, 384), lambda t: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((2, tr // 2, tr), lambda t: (0, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, 2, tr // 2, wh), out_map,
                             memory_space=pltpu.VMEM),
      scratch_shapes=[
          pltpu.VMEM((2, tr, wb), jnp.uint8),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(raws_u8, jnp.asarray(_sel384()), jnp.asarray(_rsel(tr)))


def decode_pallas_available(h: int, wb: int) -> bool:
  """True when the Pallas packed12 decode can run: TPU backend, the
  off-switch unset, and a legal tiling."""
  from taichi_image_tpu.ops.pallas import backend_enabled
  return backend_enabled() and decode_tiling(h, wb) is not None
