"""Packed RAW bit-packing codecs (12-bit and 16-bit).

Reference: ``taichi_image/packed.py``. Bit layouts (the exact parity
contract, reference packed.py:12-55):

standard 12-bit (2 values p0,p1 -> 3 bytes):
    b0 = p0[7:0]
    b1 = p1[3:0] << 4 | p0[11:8]
    b2 = p1[11:4]
IDS-camera layout:
    b0 = p0[11:4]
    b1 = p1[11:4]
    b2 = p0[3:0] << 4 | p1[3:0]
16-bit: little-endian u16 (packed.py:149-157).

The reference runs a Taichi kernel over flattened 1-D views
(packed.py:78-89); here the codec is a handful of vectorized u16 shift/mask
ops over a (..., n/2, 2) <-> (..., n/3, 3) reshape, which XLA fuses into a
single bandwidth-bound pass on the VPU. ``scaled`` maps 12-bit code values
to/from the [0,1]-normalized range of the array dtype (packed.py:66-69,
98-100): encode rounds half-away-from-zero (``ti.round``), decode casts with
C-style truncation.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from taichi_image_tpu import types

__all__ = [
    "encode12", "decode12", "decode16", "encode16",
    "encode12_pairs", "decode12_pairs", "PackedMono12",
]


def encode12_pairs(p0: jnp.ndarray, p1: jnp.ndarray,
                   ids_format: bool = False):
  """Two u16 arrays of 12-bit values -> three u8 byte planes."""
  p0 = p0.astype(jnp.uint16)
  p1 = p1.astype(jnp.uint16)
  if not ids_format:
    b0 = (p0 & 0xFF).astype(jnp.uint8)
    b1 = (((p1 & 0xF) << 4) | (p0 >> 8)).astype(jnp.uint8)
    b2 = (p1 >> 4).astype(jnp.uint8)
  else:
    b0 = (p0 >> 4).astype(jnp.uint8)
    b1 = (p1 >> 4).astype(jnp.uint8)
    b2 = (((p0 & 0xF) << 4) | (p1 & 0xF)).astype(jnp.uint8)
  return b0, b1, b2


def decode12_pairs(b0: jnp.ndarray, b1: jnp.ndarray, b2: jnp.ndarray,
                   ids_format: bool = False):
  """Three u8 byte planes -> two u16 arrays of 12-bit values."""
  b0 = b0.astype(jnp.uint16)
  b1 = b1.astype(jnp.uint16)
  b2 = b2.astype(jnp.uint16)
  if not ids_format:
    p0 = ((b1 & 0xF) << 8) | b0
    p1 = (b2 << 4) | (b1 >> 4)
  else:
    p0 = (b0 << 4) | (b2 & 0xF)
    p1 = (b1 << 4) | (b2 >> 4)
  return p0, p1


@partial(jax.jit, static_argnames=("scaled", "ids_format", "in_dtype"))
def _encode12(values, scaled: bool, ids_format: bool, in_dtype):
  flat = values.reshape(-1)
  if scaled:
    scale = types.scale_of(in_dtype)
    x = flat.astype(jnp.float32) * (4095.0 / scale)
    # ti.round rounds half away from zero; values are non-negative here.
    flat = jnp.floor(x + 0.5).astype(jnp.uint16)
  else:
    flat = flat.astype(jnp.uint16)
  pairs = flat.reshape(-1, 2)
  b0, b1, b2 = encode12_pairs(pairs[:, 0], pairs[:, 1], ids_format)
  return jnp.stack([b0, b1, b2], axis=-1).reshape(-1)


@partial(jax.jit, static_argnames=("scaled", "ids_format", "out_dtype"))
def _decode12(values, scaled: bool, ids_format: bool, out_dtype):
  triples = values.reshape(-1, 3)
  p0, p1 = decode12_pairs(triples[:, 0], triples[:, 1], triples[:, 2],
                          ids_format)
  out = jnp.stack([p0, p1], axis=-1).reshape(-1)
  if scaled:
    # single multiply by (scale/4095), matching reference packed.py:98-100
    scale = types.scale_of(out_dtype)
    x = out.astype(jnp.float32) * jnp.float32(scale / 4095.0)
    return x.astype(types.canonical_dtype(out_dtype))
  return out.astype(types.canonical_dtype(out_dtype))


@partial(jax.jit, static_argnames=("scaled", "out_dtype"))
def _decode16(values, scaled: bool, out_dtype):
  pairs = values.reshape(-1, 2).astype(jnp.uint16)
  out = (pairs[:, 1] << 8) | pairs[:, 0]
  if scaled:
    # single multiply by (scale/65535), matching reference packed.py:139-141
    scale = types.scale_of(out_dtype)
    x = out.astype(jnp.float32) * jnp.float32(scale / 65535.0)
    return x.astype(types.canonical_dtype(out_dtype))
  return out.astype(types.canonical_dtype(out_dtype))


def encode12(values, scaled: bool = False, ids_format: bool = False):
  """Pack 12-bit values (stored in u16, or normalized floats/ints if
  ``scaled``) into bytes; (..., W) -> (..., W*3/2).

  Reference packed.py:176-185.
  """
  shape = values.shape
  if shape[-1] % 2:
    raise ValueError(
        f"last dimension must be even for 12-bit encoding got: {shape}")
  in_dtype = types.canonical_dtype(values.dtype)
  encoded = _encode12(jnp.asarray(values), scaled, ids_format, in_dtype)
  return encoded.reshape(shape[:-1] + (shape[-1] * 3 // 2,))


def decode12(values, dtype=types.u16, scaled: bool = False,
             ids_format: bool = False):
  """Unpack 12-bit packed bytes; (..., W) -> (..., W*2/3).

  Reference packed.py:188-198.
  """
  shape = values.shape
  if types.canonical_dtype(values.dtype) != types.u8:
    raise ValueError(f"packed buffer must be u8, got {values.dtype}")
  if shape[-1] % 3:
    raise ValueError(
        f"last dimension must be a factor of 3 for 12-bit decoding got: {shape}")
  out_dtype = types.canonical_dtype(dtype)
  decoded = _decode12(jnp.asarray(values), scaled, ids_format, out_dtype)
  return decoded.reshape(shape[:-1] + (shape[-1] * 2 // 3,))


def decode16(values, dtype=types.u16, scaled: bool = False,
             ids_format: bool = False):
  """Unpack little-endian u16 bytes; (..., W) -> (..., W/2).

  Reference packed.py:200-210 (``ids_format`` accepted and ignored, as in
  the reference signature).
  """
  del ids_format
  shape = values.shape
  if types.canonical_dtype(values.dtype) != types.u8:
    raise ValueError(f"packed buffer must be u8, got {values.dtype}")
  if shape[-1] % 2:
    raise ValueError(
        f"last dimension must be a factor of 2 for 16-bit decoding got: {shape}")
  out_dtype = types.canonical_dtype(dtype)
  decoded = _decode16(jnp.asarray(values), scaled, out_dtype)
  return decoded.reshape(shape[:-1] + (shape[-1] // 2,))


class PackedMono12:
  """Random-access view over a packed 12-bit mono buffer.

  Reference packed.py:213-227 (``PackedMono12`` ti.field wrapper with a
  per-pixel ``__getitem__`` decode). Here indexing accepts scalars or
  numpy-style index arrays and decodes only the touched byte triples —
  vectorized gather instead of a per-pixel device function.
  """

  def __init__(self, packed, width: Optional[int] = None):
    packed = jnp.asarray(packed)
    if types.canonical_dtype(packed.dtype) != types.u8:
      raise ValueError(f"packed buffer must be u8, got {packed.dtype}")
    if packed.ndim == 1:
      if width is None:
        raise ValueError("width required for flat buffers")
      packed = packed.reshape(-1, width * 3 // 2)
    if packed.ndim != 2 or packed.shape[1] % 3:
      raise ValueError(
          f"expected (rows, 3k-byte) packed buffer, got {packed.shape}")
    self.packed = packed
    self.shape = (packed.shape[0], packed.shape[1] * 2 // 3)

  def __getitem__(self, idx):
    """value(s) at (row, col); ``row``/``col`` may be arrays."""
    row, col = idx
    row = jnp.asarray(row)
    col = jnp.asarray(col)
    base = (col // 2) * 3
    b0 = self.packed[row, base]
    b1 = self.packed[row, base + 1]
    b2 = self.packed[row, base + 2]
    p0, p1 = decode12_pairs(b0, b1, b2)
    return jnp.where(col % 2 == 0, p0, p1)

  def decode(self, dtype=types.u16, scaled: bool = False,
             ids_format: bool = False):
    """Full-frame decode to (H, W)."""
    return decode12(self.packed, dtype=dtype, scaled=scaled,
                    ids_format=ids_format)


def encode16(values, scaled: bool = False):
  """Pack u16 values into little-endian bytes; (..., W) -> (..., W*2).

  Extension (no reference counterpart): inverse of :func:`decode16`.
  """
  shape = values.shape
  flat = jnp.asarray(values).reshape(-1)
  if scaled:
    scale = types.scale_of(values.dtype)
    x = flat.astype(jnp.float32) * (65535.0 / scale)
    flat = jnp.floor(x + 0.5).astype(jnp.uint16)
  else:
    flat = flat.astype(jnp.uint16)
  lo = (flat & 0xFF).astype(jnp.uint8)
  hi = (flat >> 8).astype(jnp.uint8)
  return jnp.stack([lo, hi], axis=-1).reshape(shape[:-1] + (shape[-1] * 2,))
