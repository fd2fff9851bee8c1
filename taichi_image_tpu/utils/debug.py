"""Debug / validation mode.

Reference analogue: ``--debug`` -> ``ti.init(debug=True)`` turns on
Taichi's bounds checking and validation (reference test/arguments.py:7,27).
XLA cannot index out of bounds (static shapes), so the equivalent failure
modes here are (a) mis-shaped raw buffers silently reshaped into garbage
and (b) NaN/inf escaping a kernel. This module provides:

* always-on, host-side **raw buffer validation** with informative errors
  (`validate_raw`), called at every loader / CLI entry;
* an opt-in **checkify mode** (``TAICHI_IMAGE_TPU_DEBUG=1``) that runs
  the fused ISP step with explicit ``checkify.check`` invariants compiled
  in (decoded values in range, finite metering stats), raising on the
  first failure — the functional counterpart of Taichi's debug
  validation. Explicit invariants rather than blanket float checks
  because the reference's Reinhard deliberately produces-and-ignores NaN
  for below-bounds pixels (camera_isp.py:213); blanket NaN detection
  would flag correct behavior.
"""

from __future__ import annotations

import os

__all__ = ["debug_enabled", "validate_raw", "checked_jit"]

_ENV = "TAICHI_IMAGE_TPU_DEBUG"


def debug_enabled() -> bool:
  """True when TAICHI_IMAGE_TPU_DEBUG is set to a non-empty, non-'0'
  value. Read per call so tests / long-lived processes can toggle it."""
  v = os.environ.get(_ENV, "")
  return v not in ("", "0", "false", "False")


def validate_raw(raws, fmt: str, batch: bool = True) -> None:
  """Validate a raw frame (batch) against its claimed format BEFORE any
  reshape, so a wrong --width/height yields a clear error instead of
  garbage output or an opaque reshape failure.

  ``raws``: (N, H, W_bytes) if batch else (H, W_bytes); ``fmt`` as in
  :func:`taichi_image_tpu.models.camera_isp.load_raw_phases`.
  """
  ndim = 3 if batch else 2
  if raws.ndim != ndim:
    raise ValueError(
        f"{fmt} raw batch must be {ndim}-D (N, H, W_bytes), got shape "
        f"{tuple(raws.shape)}")
  h, wb = raws.shape[-2], raws.shape[-1]
  import numpy as np
  dt = np.dtype(raws.dtype)
  if fmt in ("packed12", "packed16") and dt != np.uint8:
    raise ValueError(f"{fmt} raw must be uint8 bytes, got {dt}")
  if fmt == "packed12":
    if wb % 3 != 0:
      raise ValueError(
          f"packed12 row stride must be a multiple of 3 bytes (2 pixels "
          f"per 3 bytes), got {wb}")
    w = wb * 2 // 3
  elif fmt == "packed16":
    if wb % 2 != 0:
      raise ValueError(
          f"packed16 row stride must be a multiple of 2 bytes, got {wb}")
    w = wb // 2
  elif fmt in ("u16", "f16", "f32"):
    w = wb
  else:
    raise ValueError(f"unknown raw format {fmt!r}")
  if h % 2 != 0 or w % 2 != 0:
    raise ValueError(
        f"CFA dimensions must be even for a 2x2 Bayer pattern, got "
        f"{h}x{w} (from {h}x{wb} raw bytes as {fmt}). Check --width / "
        f"frame dimensions against the file size.")


def validate_raw_file(nbytes: int, width: int, fmt: str = "packed12") -> int:
  """Validate a raw FILE size against a claimed width; returns the implied
  height. Catches wrong --width at CLI entry (a wrong width otherwise
  produces scrambled frames)."""
  row_bytes = {"packed12": width * 3 // 2, "packed16": width * 2}.get(fmt)
  if row_bytes is None:
    raise ValueError(f"unknown raw format {fmt!r}")
  if fmt == "packed12" and width % 2 != 0:
    raise ValueError(f"packed12 width must be even, got {width}")
  if nbytes % row_bytes != 0:
    raise ValueError(
        f"raw file of {nbytes} bytes is not a whole number of {width}-px "
        f"{fmt} rows ({row_bytes} bytes/row) — wrong --width?")
  h = nbytes // row_bytes
  if h % 2 != 0:
    raise ValueError(
        f"raw file of {nbytes} bytes implies an odd height {h} at width "
        f"{width} — wrong --width?")
  return h


def checked_jit(fn, static_argnames=()):
  """jit ``fn`` under checkify user checks; calling the result raises
  ``checkify.JaxRuntimeError`` if any ``checkify.check`` inside ``fn``
  fails. Used for the debug variant of the fused step (checkify threads
  an error value through, so this variant does not donate buffers)."""
  import jax
  from jax.experimental import checkify

  # checkify-of-jit: jit resolves static args from fn's signature, then
  # checkify functionalizes the checks around the compiled call.
  checked = checkify.checkify(jax.jit(fn, static_argnames=static_argnames),
                              errors=checkify.user_checks)

  def wrapper(*args, **kwargs):
    err, out = checked(*args, **kwargs)
    checkify.check_error(err)
    return out

  return wrapper
