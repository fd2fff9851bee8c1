"""16-bit fixed-point containers packed 2-per-i32 for Mosaic kernels.

Camera16's TPU fast path. The reference's default ISP class works in
f16 (reference camera_isp.py:422), materializing f16 arrays at three
stage boundaries: the decoded CFA phases, the demosaiced x12, and the
pre-gamma Reinhard map p (reference camera_isp.py:177-218). This
Mosaic toolchain cannot read or write f16, and emulating f16's RNE
rounding in integer ops costs ~30 VPU ops per value (measured +4.3
ms/step on the map at 6x4K — docs/PERFORMANCE.md round-2 "f16-in-i32
packed kernel I/O", kept in ops/pallas/f16pack.py). Instead the fast
path stores each boundary in a 16-bit fixed-point code matched to that
stage's value domain, packed channel-pairwise into i32 words (free
channel-major packing, i32 DMA rates):

- phases: the raw 12-bit sensor codes themselves — BIT-EXACT, strictly
  more precise than f16 (which rounds codes above 2048 to even).
- x12: u16 on the post-clip [0, 1] domain — absolute error <= 2^-17,
  vs f16's 2^-12-relative at full scale.
- p: the RATIONAL code r = p / (1 + p) = scaled / (adapt + 2*scaled)
  (the Reinhard curve's own form) as u16 on [0, 1) — bijective and
  monotone over the whole p >= 0 range, so no ceiling exists (p above
  1 happens on real frames: a dark pixel below the sampled metering
  min with a tiny adapt level reaches p ~ 2.6 at intensity 3, and it
  is the frame max the reference renders white — a fixed-range code
  would clamp it). p <= 0 and NaN encode to code 0, which is
  u8-identical (the gamma stage clips both to 0). The per-image max is
  taken over the exact f32 p BEFORE quantization (the reference's
  max-before-cast semantics, camera_isp.py:211-218). Error in the
  decoded p is (1 + p)^2 * 2^-17; through the gamma normalization the
  u8 error is <= 255 * (1 + max)^2 * 2^-17 / max <= 0.2 counts for any
  pre-gamma max >= 0.01 (max below that needs a metering range ~100x
  wider than the frame content — unreachable from a seeded EMA).

Every boundary therefore carries enough precision that the final u8
stays within <=1 count of the strict XLA f16 pipeline
(tests/test_q16.py proves it end to end; tools/verify_tpu.py asserts
it on chip). gamma > ~1.5 would amplify quantization near p = 0 past
1 count, so the fast path is gated to gamma <= 1.5 (the reference's
own tools use 0.6..1.0).

Encode/decode are plain jnp integer/float ops, valid both inside Mosaic
kernels and in XLA (where they fuse into neighboring elementwise work).
"""

from __future__ import annotations

import jax.numpy as jnp

# x12 code: q = round(clip(v, 0, 1) * 65535); v' = q / 65535
X12_SCALE = 65535.0
X12_INV = float(1.0 / 65535.0)

# p code: r = p/(1+p); q = round(clip(r, 0, 1) * 65535); p' = r'/(1-r')
R_SCALE = 65535.0
R_INV = float(1.0 / 65535.0)

# phase code: the raw 12-bit integer; v = q / 4095
PH_INV = float(1.0 / 4095.0)


def encode_x12(v_f32):
  """f32 in [0, 1] (already clipped) -> i32 code 0..65535, round-half-up.
  Inputs must be clipped by the caller (the stencil finish clips)."""
  return (v_f32 * X12_SCALE + 0.5).astype(jnp.int32)


def decode_x12(q_i32):
  """i32 code -> f32 value (exact: 16-bit ints are exact in f32)."""
  return q_i32.astype(jnp.float32) * X12_INV


def encode_r(r_f32):
  """f32 rational code r = p/(1+p) -> i32 code 0..65535, round-half-up.
  Callers zero r for p <= 0 / NaN before encoding (module note)."""
  return (jnp.clip(r_f32, 0.0, 1.0) * R_SCALE + 0.5).astype(jnp.int32)


def encode_p(p_f32):
  """f32 pre-gamma map value -> i32 code (test/XLA-side convenience;
  kernels compute r directly as scaled/(adapt + 2*scaled))."""
  r = p_f32 / (1.0 + p_f32)
  r = jnp.where(p_f32 > 0.0, r, 0.0)  # p <= 0 and NaN -> code 0
  return encode_r(r)


def decode_p(q_i32):
  """i32 code -> f32 p value: r/(1-r). Code 65535 would be r = 1 (p
  infinite) — unreachable: it needs p >= 1.3e5 while p is bounded by
  the frame max (~a few)."""
  r = q_i32.astype(jnp.float32) * R_INV
  return r / (1.0 - r)


def pack_pair(lo_i32, hi_i32):
  """Two 16-bit codes -> one i32 word (lo | hi << 16).

  Written as lo + hi * 2^16 — identical for 16-bit codes (i32 wraps,
  both in XLA and Mosaic), but the shift/or form makes Mosaic mis-lower
  one halfword under the demosaic stencil's register pressure (caught
  on chip: ~5% of channel-5 codes came back as f32 NaN bit patterns at
  (128, 512) tiles; the same shift/or is exact in a standalone kernel).
  """
  return lo_i32 + hi_i32 * jnp.int32(65536)


def unpack_lo(w_i32):
  return w_i32 & 0xFFFF


def unpack_hi(w_i32):
  return (w_i32 >> 16) & 0xFFFF


def unpack_channels(w_i32, axis: int = 1):
  """(N, k, ...) packed words -> (N, 2k, ...) i32 codes along ``axis``:
  word c holds channels (2c, 2c+1). The stack+reshape merges adjacent
  channel dims (a free layout view on channel-major arrays; it is NOT a
  lane-space relayout — see CLAUDE.md lane-stride landmine)."""
  lo = unpack_lo(w_i32)
  hi = unpack_hi(w_i32)
  both = jnp.stack([lo, hi], axis=axis + 1)
  shape = list(w_i32.shape)
  shape[axis] *= 2
  return both.reshape(shape)
