"""Symmetric weight-table construction + demo clamped convolution.

Reference: ``taichi_image/kernel.py:3-47``. Tables are built at trace time
in Python and baked into jitted computations as constants — the same
compile-time-constant-weights shape the reference gets from ``ti.static``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def mirror(w):
  """[a, b, c] -> [a, b, c, b, a]  (reference kernel.py:3-4)."""
  return list(w) + list(w)[:-1][::-1]


def symmetrical(w):
  """Quarter-spec rows -> flattened symmetric 2-D table (kernel.py:7-9)."""
  rows = mirror([mirror(row) for row in w])
  return flatten(rows)


def flatten(w):
  return [x for row in w for x in row]


def kernel_square(weights, n=5):
  """(offset, weight) pairs over an n x n square (reference kernel.py:16-22)."""
  offsets = [(i, j) for i in range(-(n // 2), n // 2 + 1)
             for j in range(-(n // 2), n // 2 + 1)]
  assert len(offsets) == len(weights), (
      f"need {len(offsets)} weights for a {n}x{n} square, "
      f"got {len(weights)}")
  return tuple(zip(offsets, weights))


def zip_tuple(*args):
  return tuple(zip(*args))


def taps_to_dense(taps, radius: int) -> np.ndarray:
  """(offset, weight) pairs -> dense (2r+1, 2r+1) float32 array."""
  k = np.zeros((2 * radius + 1, 2 * radius + 1), np.float32)
  for (dy, dx), w in taps:
    k[dy + radius, dx + radius] += w
  return k


@partial(jax.jit, static_argnames=("taps",))
def conv(image: jnp.ndarray, taps) -> jnp.ndarray:
  """Clamped-border u8 2-D convolution demo (reference kernel.py:35-47).

  ``taps`` is a tuple of ((dy, dx), weight); borders are edge-clamped and the
  result divided by the total weight, clamped to [0, 255] and cast to u8.
  """
  total = float(sum(w for _, w in taps))
  radius = max(max(abs(dy), abs(dx)) for (dy, dx), _ in taps)
  x = image.astype(jnp.float32)
  padded = jnp.pad(x, ((radius, radius), (radius, radius), (0, 0)),
                   mode="edge")
  h, w = image.shape[:2]
  acc = jnp.zeros_like(x)
  for (dy, dx), weight in taps:
    acc = acc + weight * jax.lax.dynamic_slice(
        padded, (dy + radius, dx + radius, 0), (h, w, x.shape[2]))
  return jnp.clip(acc / total, 0, 255).astype(jnp.uint8)
