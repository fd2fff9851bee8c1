"""Probe: bilinear resize directly from phase form (no interleave).

The fused step's resize path (interleave -> planar gathers) hits an XLA
pathology at 6x4K: the gather-of-transpose fuses into a ~44 ms monster
(or fails to compile when chained). Formulation here:

  x12 (N, 12, hh, wh) --static channel perm to (c, cp, rp)-->
  view (N, 3, 2, 2*hh, wh)   [rp adjacent to rows: FREE view]
  --row take+lerp (indices pa*hh+ia in rp-major row space)-->
  (N, 3, 2, h_out, wh) --swap cp past h_out (one copy)-->
  view (N, 3, h_out, 2*wh)   [cp adjacent to cols]
  --col take+lerp--> (N, 3, h_out, w_out) planar. DONE — no transpose6.

Values are bitwise-equal to resize(interleave) (same source values,
same f32 lerp arithmetic).
"""

import sys
sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu import types
from taichi_image_tpu.models.camera_isp import _resize_planar
from taichi_image_tpu.ops.bayer import phases_to_planar
from taichi_image_tpu.ops.interpolate import _axis_samples

N = 6


def resize_from_phases(x12, size, scale, work_dtype):
  n, _, hh, wh = x12.shape
  h_in, w_in = 2 * hh, 2 * wh
  w_out, h_out = size
  r_lo, r_hi, r_f = _axis_samples(h_out, h_in, scale)
  c_lo, c_hi, c_f = _axis_samples(w_out, w_in, scale)

  # channel perm: new ch (c, cp, rp) <- old ch (cp*2+rp)*3 + c
  # (phase index is col-parity-major, row-parity-minor — validated by the
  # transform-permutation brute force, tests/test_isp.py)
  perm = [(cp * 2 + rp) * 3 + c
          for c in range(3) for cp in range(2) for rp in range(2)]
  z = x12[:, jnp.asarray(perm)]
  z = z.reshape(n, 3, 2, 2 * hh, wh)   # (c, cp, rp*hh rows, wh) view
  # full-res row r lives at rp-major index (r % 2) * hh + r // 2
  ri_lo = (r_lo % 2) * hh + r_lo // 2
  ri_hi = (r_hi % 2) * hh + r_hi // 2
  top = jnp.take(z, jnp.asarray(ri_lo), axis=3).astype(jnp.float32)
  bot = jnp.take(z, jnp.asarray(ri_hi), axis=3).astype(jnp.float32)
  rows = top + jnp.asarray(r_f)[None, None, None, :, None] * (bot - top)
  # move cp next to cols (one copy), then the col space is cp-major
  rows = jnp.swapaxes(rows, 2, 3).reshape(n, 3, h_out, 2 * wh)
  ci_lo = (c_lo % 2) * wh + c_lo // 2
  ci_hi = (c_hi % 2) * wh + c_hi // 2
  left = jnp.take(rows, jnp.asarray(ci_lo), axis=3)
  right = jnp.take(rows, jnp.asarray(ci_hi), axis=3)
  out = left + jnp.asarray(c_f)[None, None, None, :] * (right - left)
  return out.astype(types.canonical_dtype(work_dtype))


def via_interleave(x12, size, scale, work_dtype):
  return _resize_planar(phases_to_planar(x12), size, scale, work_dtype)


def bench(fn, x, k=6, reps=3):
  @jax.jit
  def steps(x):
    acc = jnp.float32(0)
    for i in range(k):
      acc = acc + jnp.sum(fn(x + jnp.asarray(i, x.dtype) * 1e-6)
                          .astype(jnp.float32))
    return acc
  _ = np.asarray(steps(x))
  best = None
  for _ in range(reps):
    t0 = time.perf_counter()
    _ = np.asarray(steps(x))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / k * 1000.0


def main():
  rng = np.random.default_rng(0)
  small = jnp.asarray(rng.random((2, 12, 16, 24)), jnp.bfloat16)
  for size, scale in (((24, 14), None), ((48, 32), None), (None, 0.5),
                      (None, 0.75)):
    sz = size if size else (int(48 * scale), int(32 * scale))
    ref = np.asarray(jax.jit(functools.partial(
        via_interleave, size=sz, scale=scale,
        work_dtype=types.bf16))(small))
    got = np.asarray(jax.jit(functools.partial(
        resize_from_phases, size=sz, scale=scale,
        work_dtype=types.bf16))(small))
    print(f"size={sz} scale={scale}: exact="
          f"{np.array_equal(ref.view(np.uint16), got.view(np.uint16))}",
          flush=True)

  x12 = jnp.asarray(rng.random((N, 12, 1080, 1920)), jnp.bfloat16)
  for name, fn in (
      ("phase-gather resize", functools.partial(
          resize_from_phases, size=(1920, 1080), scale=0.5,
          work_dtype=types.bf16)),
      ("interleave+resize", functools.partial(
          via_interleave, size=(1920, 1080), scale=0.5,
          work_dtype=types.bf16)),
  ):
    try:
      print(f"{name}: {bench(fn, x12):6.2f} ms", flush=True)
    except Exception as e:
      print(f"{name}: FAIL {str(e)[:70]}", flush=True)


if __name__ == "__main__":
  main()
