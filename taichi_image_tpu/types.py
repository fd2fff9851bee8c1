"""Dtype conventions and array interop for the TPU ISP framework.

Mirrors the role of the reference's ``taichi_image/types.py`` (reference
``types.py:12-91``): a *normalized intensity convention* where every kernel
works internally in float32 in [0, 1] and integer dtypes are related to the
normalized range by a per-dtype full-scale factor.

TPU-first differences from the reference:
  * dtypes are plain numpy/jax dtypes (no Taichi types); ``bfloat16`` is a
    first-class working dtype (preferred on TPU over float16).
  * arrays in and out are numpy or jax arrays; there is no torch path. The
    reference's np/torch polymorphic ``empty_like`` (types.py:59-91) is
    unnecessary because ops are pure functions returning new arrays.
"""

from __future__ import annotations

from typing import Any, Union

import jax.numpy as jnp
import numpy as np

__all__ = [
    "scale_factor",
    "canonical_dtype",
    "dtype_of",
    "is_float_dtype",
    "scale_of",
    "u8",
    "u16",
    "i16",
    "f16",
    "bf16",
    "f32",
]

# Short aliases, mirroring ti.u8 / ti.u16 / ti.i16 / ti.f16 / ti.f32
# (reference types.py:36-42), plus bfloat16 for TPU.
u8 = np.dtype(np.uint8)
u16 = np.dtype(np.uint16)
i16 = np.dtype(np.int16)
f16 = np.dtype(np.float16)
bf16 = np.dtype(jnp.bfloat16)
f32 = np.dtype(np.float32)

DTypeLike = Union[str, type, np.dtype, Any]

# Full-scale value per dtype: the normalization contract every op follows
# (reference types.py:12-18). Values are converted to f32 in [0, 1] by
# dividing by the scale, and rescaled/cast on output.
scale_factor = {
    u8: 255.0,
    u16: 65535.0,
    i16: 32767.0,
    f16: 1.0,
    bf16: 1.0,
    f32: 1.0,
}

_names = {
    "uint8": u8,
    "uint16": u16,
    "int16": i16,
    "float16": f16,
    "bfloat16": bf16,
    "float32": f32,
}


def canonical_dtype(dtype: DTypeLike) -> np.dtype:
  """Normalize a dtype token (string / np / jnp dtype) to a np.dtype.

  Raises for dtypes outside the supported set {u8, u16, i16, f16, bf16, f32}
  (reference type_to_ti, types.py:36-42).
  """
  dt = np.dtype(dtype)
  name = dt.name
  if name not in _names:
    raise ValueError(
        f"Unsupported dtype {name}; supported: {sorted(_names)}")
  return _names[name]


def dtype_of(arr) -> np.dtype:
  """Infer the canonical dtype of a numpy or jax array.

  Mirrors ``ti_type`` (reference types.py:51-57) without the torch branch.
  """
  return canonical_dtype(arr.dtype)


def is_float_dtype(dtype: DTypeLike) -> bool:
  return canonical_dtype(dtype) in (f16, bf16, f32)


def scale_of(dtype: DTypeLike) -> float:
  """Full-scale value for a dtype (reference scale_factor, types.py:12-18)."""
  return scale_factor[canonical_dtype(dtype)]


def to_float(x: jnp.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
  """Convert an array to normalized float in [0, 1] per the scale convention."""
  s = scale_of(dtype_of(x))
  x = x.astype(compute_dtype)
  if s != 1.0:
    x = x / jnp.asarray(s, compute_dtype)
  return x


def from_float(x: jnp.ndarray, dtype: DTypeLike, clip: bool = True) -> jnp.ndarray:
  """Rescale a normalized float array to ``dtype``.

  Integer casts truncate toward zero, matching Taichi's C-style float->int
  cast used throughout the reference (e.g. bayer.py:134). ``clip`` guards
  against out-of-range wraparound which the reference leaves as UB.
  """
  dt = canonical_dtype(dtype)
  s = scale_of(dt)
  if s != 1.0:
    x = x * jnp.asarray(s, x.dtype)
  if clip and not is_float_dtype(dt):
    x = jnp.clip(x, 0, s)
  return x.astype(dt)


def empty_like(in_arr, shape=None, dtype=None):
  """Allocate an uninitialized numpy array like ``in_arr``
  (reference types.py:70-78; numpy-only — ops are pure functions that
  allocate their own outputs, this exists for API compatibility)."""
  shape = in_arr.shape if shape is None else shape
  dt = dtype_of(in_arr) if dtype is None else canonical_dtype(dtype)
  return np.empty(shape, dt)


def zeros_like(in_arr, shape=None, dtype=None):
  """Reference types.py:81-91 (numpy-only)."""
  shape = in_arr.shape if shape is None else shape
  dt = dtype_of(in_arr) if dtype is None else canonical_dtype(dtype)
  return np.zeros(shape, dt)
