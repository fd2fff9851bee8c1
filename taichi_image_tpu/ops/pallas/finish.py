"""Pallas TPU tonemap-finish kernel: gamma + u8 quantize + phase->planar
interleave, emitted as 4-byte-packed i32 words.

The 8K banded drivers' finish (gamma + quantize + 2x2 phase interleave,
reference camera_isp.py:211-218 for the math and the full-res planar u8
output contract) cannot compile as one XLA program at 8K extents and
runs as <=1088-row chunk programs whose stack-interleave moves ~70 GB/s
(docs/PERFORMANCE.md round-4 "8K finish"). This kernel does the whole
finish in ONE Pallas program at manual-DMA rates:

  p tiles (1, 12, tr, tw) bf16 --DMA--> VMEM -> f32
  gamma:      o = p / max_out (per-image SMEM scalar), optional
              exp2(log2(o)/gamma), v = floor(clip(255 o, 0, 255))
              [floor == XLA's truncating f32->u8 convert for o >= 0]
  row pairs:  vi_pc = P0 @ v(pr=0) + P1 @ v(pr=1)  [one-hot, exact]
  lane pairs: e_pc = vi_pc @ E, o_pc = vi_pc @ O   [one-hot, exact]
  i32 word:   e0 + e1*256 + o0*65536 + o1*16777216 (additive pack in
              exact i32; the halfword | mis-lowers under register
              pressure -- ops/pallas/q16 module note -- and the top
              multiply's two's-complement wrap is the proven q16
              pack_pair pattern)

Every MXU dot keeps its data operand at byte values (<= 255): this
toolchain's dots are bf16-reduced, exact only for ints <= 256 — a
first cut that dotted the 16-bit combine u = v0 + 256*v1 was EXACT in
interpret mode and WRONG on chip (27.8%% of bytes equal,
tools/probe_finish8k.py round 5; the same ints-<=256 rule the decode
kernel's byte-plane dots were designed around).

The i32 word at planar (y, 4j..4j+3) is bytes [b0, b1, b2, b3] with
b0 the least-significant byte, so a little-endian bitcast to u8 (the
wrapper's ``lax.bitcast_convert_type`` + minor-dim reshape) yields the
planar (N, 3, H, W) u8 BIT-IDENTICAL to
``reinhard_gamma_ca`` / ``linear_apply_ca`` + ``phases_to_planar_stack``
(asserted in tests/test_pallas_finish.py and on-chip by
tools/verify_tpu.py).

Like every kernel here the one-hot dots are exact: v are integers
<= 255, u integers <= 65535 (bf16-reduced MXU dots are exact for the
one-hot selections; the 256x combine and the dot accumulation stay
within f32's 24-bit exact-integer range).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rowsel(tr: int) -> np.ndarray:
  """P (2, 2*tr, tr): one-hot row-interleave selectors — P[s, 2i+s, i]=1
  (the reverse of decode's row-parity SPLIT selectors)."""
  p = np.zeros((2, 2 * tr, tr), np.float32)
  for s in range(2):
    p[s, 2 * np.arange(tr) + s, np.arange(tr)] = 1.0
  return p


def _lanesel(tw: int) -> np.ndarray:
  """E/O (2, tw, tw/2): one-hot even/odd lane-pair selectors —
  E[0, 2j, j] = 1 (even u halfword of word j), E[1, 2j+1, j] = 1."""
  e = np.zeros((2, tw, tw // 2), np.float32)
  for s in range(2):
    e[s, 2 * np.arange(tw // 2) + s, np.arange(tw // 2)] = 1.0
  return e


_VMEM_BUDGET = 6 * 1024 * 1024


def finish_tiling(hh: int, wh: int):
  """(TR, TW) for the (1, 12, TR, TW) bf16 input tiles. TW must be a
  multiple of 256 dividing wh (so the packed-i32 output tile's lane
  extent TW/2 is a 128-multiple — Mosaic DMA alignment) and TR a
  multiple of 8 dividing hh. MXU cost per input element is
  2*TR (row-interleave dots, O(TR^2) per tile) + TW/2 (lane-pair
  dots), so TW stays at the 256 minimum and TR caps at 40 — beyond
  that the dense one-hot row dot dominates the kernel."""
  if hh < 8 or wh < 256 or wh % 256:
    return None
  tw = 256
  tr = None
  for cand in range(8, min(hh, 40) + 1, 8):
    if hh % cand:
      continue
    if 2 * 12 * cand * tw * 2 <= _VMEM_BUDGET:
      tr = cand
  return (tr, tw) if tr else None


def _finish_kernel(tr, tw, ni, nj, nt, mode, gamma, hbm_ref, s_ref,
                   psel_ref, esel_ref, out_ref, scratch, sems):
  t = pl.program_id(0)

  def src(tt):
    a = tt // (ni * nj)
    r = tt % (ni * nj)
    return hbm_ref.at[a, :, pl.ds((r // nj) * tr, tr),
                      pl.ds((r % nj) * tw, tw)]

  def dma(slot, tt):
    return pltpu.make_async_copy(src(tt), scratch.at[slot], sems.at[slot])

  @pl.when(t == 0)
  def _():
    dma(0, 0).start()

  @pl.when(t + 1 < nt)
  def _():
    dma((t + 1) % 2, t + 1).start()

  dma(t % 2, t).wait()
  cur = scratch.at[t % 2]

  a = t // (ni * nj)
  if mode == "reinhard":
    mx = jnp.maximum(jnp.float32(1e-6), s_ref[a])
  else:  # linear: global [m0, inv_range]
    m0, inv_range = s_ref[0], s_ref[1]

  inv_gamma = None
  if not (isinstance(gamma, float) and gamma == 1.0):
    inv_gamma = jnp.float32(1.0 / gamma)

  for c in range(3):
    vi = []
    for pc in range(2):
      vs = []
      for pr in range(2):
        x = cur[pc * 6 + pr * 3 + c].astype(jnp.float32)
        if mode == "reinhard":
          o = x / mx
          if inv_gamma is not None:
            o = jnp.exp2(jnp.log2(o) * inv_gamma)
          v = jnp.clip(255.0 * o, 0.0, 255.0)
        else:
          y = jnp.maximum((x - m0) * inv_range, 0.0)
          if inv_gamma is not None:
            y = jnp.exp2(jnp.log2(y) * inv_gamma)
          v = jnp.clip(jnp.clip(y, 0.0, 1.0) * 255.0, 0.0, 255.0)
        # floor == XLA's truncating f32->u8 convert; bf16 is exact for
        # the byte ints and runs the MXU at full rate (an f32-dot first
        # cut was dot-bound: 55 vs the chunks' 48 ms at 6x8K)
        vs.append(jnp.floor(v).astype(jnp.bfloat16))
      vi.append(jnp.dot(psel_ref[0], vs[0],
                        preferred_element_type=jnp.float32)
                + jnp.dot(psel_ref[1], vs[1],
                          preferred_element_type=jnp.float32))
      # (2tr, tw) rows 2r+pr; values are exact byte ints
    # lane-pair selections on BYTE values (dots exact only for ints
    # <= 256 — module docstring), then the additive byte pack in i32
    def sel(m, s):
      return jnp.dot(m.astype(jnp.bfloat16), esel_ref[s],
                     preferred_element_type=jnp.float32)

    e0 = sel(vi[0], 0).astype(jnp.int32)
    e1 = sel(vi[1], 0).astype(jnp.int32)
    o0 = sel(vi[0], 1).astype(jnp.int32)
    o1 = sel(vi[1], 1).astype(jnp.int32)
    # o1 * 2**24 wraps into the sign bit for o1 >= 128 —
    # two's-complement wraparound, the BITS are the pack
    out_ref[0, c] = e0 + e1 * 256 + o0 * 65536 + o1 * 16777216


def finish_planar_u8(x12, scal, mode: str, gamma: float,
                     interpret: bool = False):
  """(N, 12, hh, wh) working-dtype phase-RGB -> (N, 3, 2*hh, 2*wh) u8
  planar, bit-identical to
  ``phases_to_planar_stack(reinhard_gamma_ca(x12, max_out, gamma))``
  (mode='reinhard', ``scal`` = the (N, 1, 1, 1) per-image pre-gamma max)
  or ``phases_to_planar_stack(linear_apply_ca(x12_grouped, metrics,
  gamma))`` (mode='linear', ``scal`` = the (9,) metrics vector)."""
  assert mode in ("reinhard", "linear"), mode
  n, nc, hh, wh = x12.shape
  assert nc == 12, nc
  tiles = finish_tiling(hh, wh)
  assert tiles is not None, (hh, wh)
  tr, tw = tiles
  ni, nj = hh // tr, wh // tw
  nt = n * ni * nj

  if mode == "reinhard":
    s = jnp.reshape(scal, (n,)).astype(jnp.float32)
  else:
    m = scal
    s = jnp.stack([m[0], 1.0 / (m[1] - m[0])]).astype(jnp.float32)

  def out_map(t):
    a = t // (ni * nj)
    r = t % (ni * nj)
    return (a, 0, r // nj, r % nj)

  wq = wh // 2  # packed i32 words per planar row (4 bytes each)
  out = pl.pallas_call(
      functools.partial(_finish_kernel, tr, tw, ni, nj, nt, mode,
                        float(gamma)),
      out_shape=jax.ShapeDtypeStruct((n, 3, 2 * hh, wq), jnp.int32),
      grid=(nt,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec(memory_space=pltpu.SMEM),
          pl.BlockSpec((2, 2 * tr, tr), lambda t: (0, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((2, tw, tw // 2), lambda t: (0, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, 3, 2 * tr, wq // nj), out_map,
                             memory_space=pltpu.VMEM),
      scratch_shapes=[
          pltpu.VMEM((2, 12, tr, tw), x12.dtype),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(x12, s, jnp.asarray(_rowsel(tr), jnp.bfloat16),
    jnp.asarray(_lanesel(tw), jnp.bfloat16))
  # little-endian byte split: u8 element k of each word is bits
  # [8k, 8k+8) — exactly the additive pack's b_k
  u8 = jax.lax.bitcast_convert_type(out, jnp.uint8)
  return u8.reshape(n, 3, 2 * hh, 2 * wh)


def finish_available(hh: int, wh: int) -> bool:
  """True when the finish kernel can run: TPU backend, the OPT-IN
  switch TAICHI_IMAGE_TPU_FINISH_KERNEL=1 set, and a legal tiling.

  OPT-IN (round 5, rejected-by-data as the default): the kernel is
  BITWISE-equal to the chunked XLA finish on chip at every tested gamma
  (tools/probe_finish8k.py) but LOSES on time — 58 vs the chunks' 50 ms
  standalone at 6x8K — because its packed-i32 contract still pays a
  ~24 ms XLA i32->u8 bitcast+reshape relayout (TPU u8 arrays live in
  (32, 128) tiles; the bitcast is a physical relayout in the slow
  u8-layout family, tools/probe_finish_iso.py: kernel 30.6 / +bitcast
  37.6 / +reshape 54.9)."""
  import os
  from taichi_image_tpu.ops.pallas import backend_enabled
  if not os.environ.get("TAICHI_IMAGE_TPU_FINISH_KERNEL"):
    return False
  return backend_enabled() and finish_tiling(hh, wh) is not None
