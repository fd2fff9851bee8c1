"""Standalone tonemappers: linear (bounds-normalize + gamma) and global
Reinhard with log-luminance metering.

Reference: ``taichi_image/tonemap.py``. The reference fuses the whole
Reinhard pipeline (bounds -> normalize -> metering -> map -> re-bounds ->
gamma) into one Taichi kernel with sequential grid loops and atomic
reductions (tonemap.py:134-155); here each stage is a pure jnp computation
inside a single jitted function, so XLA fuses the elementwise stages and
lowers the reductions to tree reductions — no atomics (SURVEY.md §2.2).

⚠ Reference quirk preserved (tonemap.py:102): the standalone metering
returns ``Bounds(log_min, -log_max)`` — the log-max is NEGATED. The ISP
variant (models/camera_isp.py) does NOT have this negation; the two paths
are distinct golden outputs (SURVEY.md §2.6).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from taichi_image_tpu import types
from taichi_image_tpu.ops.color import rgb_gray
from taichi_image_tpu.utils.bounds import Bounds, lerp

__all__ = [
    "Metering", "metering_to_np", "metering_from_np",
    "tonemap_linear", "tonemap_reinhard", "tonemap_gamma",
    "linear_map", "metering", "reinhard_map",
]


@dataclasses.dataclass
class Metering:
  """Host-side metering stats (reference tonemap.py:53-72): log-luminance
  bounds, log-mean, gray mean and RGB mean, packable to a vec7."""
  log_bounds: Bounds
  log_mean: float
  gray_mean: float
  rgb_mean: np.ndarray

  def to_vec(self):
    return np.array([self.log_bounds.min, self.log_bounds.max,
                     self.log_mean, self.gray_mean, *self.rgb_mean],
                    np.float32)


def metering_to_np(x: Metering):
  return x.to_vec()


def metering_from_np(x) -> Metering:
  return Metering(Bounds(float(x[0]), float(x[1])), float(x[2]),
                  float(x[3]), np.asarray(x[4:7], np.float32))


def linear_map(image, bounds_min, bounds_max, gamma, out_dtype):
  """Normalize by bounds, apply 1/gamma power, clamp, rescale, cast
  (reference tonemap.py:11-17)."""
  inv_range = 1.0 / (bounds_max - bounds_min)
  x = jnp.power((image - bounds_min) * inv_range, 1.0 / gamma)
  return types.from_float(jnp.clip(x, 0.0, 1.0), out_dtype)


def metering(image: jnp.ndarray):
  """Log-luminance statistics of a normalized f32 RGB image over
  Bounds(0, 1) (reference tonemap.py:77-103). Returns a vec7 with the
  reference's negated log-max quirk."""
  gray = rgb_gray(image)
  log_gray = jnp.log(jnp.maximum(gray, 1e-4))
  n = image.shape[0] * image.shape[1]
  return jnp.stack([
      jnp.min(log_gray),
      -jnp.max(log_gray),  # quirk: negated (tonemap.py:102)
      jnp.sum(log_gray) / n,
      jnp.sum(gray) / n,
      *[jnp.sum(image[..., c]) / n for c in range(3)],
  ])


def reinhard_map(image, stats, intensity, light_adapt, color_adapt):
  """Global Reinhard operator (reference tonemap.py:107-131).

  ``image`` is normalized f32 RGB; ``stats`` a vec7 as from :func:`metering`.
  """
  log_min, log_max = stats[0], stats[1]
  log_mean, gray_mean = stats[2], stats[3]
  rgb_mean = stats[4:7]

  key = (log_max - log_mean) / (log_max - log_min)
  map_key = 0.3 + 0.7 * jnp.power(key, 1.4)

  mean = lerp(color_adapt, gray_mean, rgb_mean)
  gray = rgb_gray(image)[..., None]
  adapt_color = lerp(color_adapt, gray, image)
  adapt_mean = lerp(light_adapt, mean, adapt_color)
  adapt = jnp.power(jnp.exp(-intensity) * adapt_mean, map_key)
  return image * (1.0 / (adapt + image))


@partial(jax.jit, static_argnames=("in_dtype", "out_dtype"))
def _tonemap_linear(src, gamma, in_dtype, out_dtype):
  x = src.astype(jnp.float32)
  lo, hi = jnp.min(x), jnp.max(x)
  return linear_map(x, lo, hi, gamma, out_dtype)


def tonemap_linear(src, gamma=1.0, dtype=types.u8):
  """Fused bounds-reduction + linear map (reference tonemap.py:41-46)."""
  in_dtype = types.dtype_of(src)
  out_dtype = types.canonical_dtype(dtype)
  return _tonemap_linear(jnp.asarray(src), jnp.float32(gamma), in_dtype,
                         out_dtype)


@partial(jax.jit, static_argnames=("in_dtype", "out_dtype"))
def _tonemap_reinhard(src, gamma, intensity, light_adapt, color_adapt,
                      in_dtype, out_dtype):
  x = src.astype(jnp.float32)
  lo, hi = jnp.min(x), jnp.max(x)
  # stage 1: bounds-normalize to [0,1] f32 temp (gamma=1, scale=1)
  temp = jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)
  # stage 2: metering over Bounds(0,1)
  stats = metering(temp)
  # stage 3: Reinhard in f32
  mapped = reinhard_map(temp, stats, intensity, light_adapt, color_adapt)
  # stage 4+5: re-bounds + gamma + cast
  lo2, hi2 = jnp.min(mapped), jnp.max(mapped)
  return linear_map(mapped, lo2, hi2, gamma, out_dtype)


def tonemap_reinhard(src, gamma=1.0, intensity=1.0, light_adapt=1.0,
                     color_adapt=0.0, dtype=types.u8):
  """Five-stage fused Reinhard tonemap (reference tonemap.py:160-168)."""
  in_dtype = types.dtype_of(src)
  out_dtype = types.canonical_dtype(dtype)
  return _tonemap_reinhard(jnp.asarray(src), jnp.float32(gamma),
                           jnp.float32(intensity), jnp.float32(light_adapt),
                           jnp.float32(color_adapt), in_dtype, out_dtype)


@partial(jax.jit, static_argnames=("out_dtype",))
def _tonemap_gamma(src, gamma, out_dtype):
  x = jnp.power(src.astype(jnp.float32), 1.0 / gamma)
  return types.from_float(jnp.clip(x, 0.0, 1.0), out_dtype)


def tonemap_gamma(src, gamma=1.0, dtype=types.u8):
  """Gamma-only map (reference ``gamma_func``, tonemap.py:20-24 — unused
  by the reference pipeline but part of its op surface)."""
  return _tonemap_gamma(jnp.asarray(src), jnp.float32(gamma),
                        types.canonical_dtype(dtype))
