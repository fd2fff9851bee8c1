"""Cross-implementation benchmark races (reference analogue:
bench/interpolate.py:49-55 races taichi vs torch.compile).

Three races, each printing it/s per implementation:

  demosaic   Pallas stencil vs XLA conv (same inputs, same outputs up to
             the documented 1-ulp contract) — the on-device shoot-out
             that used to live only in docs/PERFORMANCE.md prose.
  resize     our jitted bilinear+rot90 vs torch.compile
             F.interpolate+rot90 (torch runs on ITS available device —
             CPU in this environment; the reference raced CUDA taichi vs
             CUDA torch, so cross-device numbers are labelled as such).
  decode12   Pallas decode kernel vs XLA formulation (bf16).

Timing: K chained iterations inside one jit ending in a fetched scalar
(distinct inputs per iteration; every output consumed) — the
methodology bench.py documents; torch is wall-clocked around
``torch.compile`` calls.
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu import types
from taichi_image_tpu.ops import bayer
from taichi_image_tpu.ops.bayer import BayerPattern


def _perturb(x, i):
  """Bitwise-distinct input for iteration ``i``: integer inputs XOR the
  iteration index; float inputs XOR it into the low mantissa bits via a
  same-width bitcast. An additive ``i * 1e-6`` is NOT enough — for f16
  values >= 1/16 it is below half an ulp, rounds away entirely, and lets
  XLA CSE every iteration (round-2 ADVICE.md). XOR of i < 16 touches only
  mantissa LSBs: never sign/exponent, so no NaN/inf, and each iteration's
  input differs bitwise."""
  if jnp.issubdtype(x.dtype, jnp.integer):
    return x ^ jnp.asarray(i, x.dtype)
  ibits = jnp.dtype(f"uint{x.dtype.itemsize * 8}")
  bits = jax.lax.bitcast_convert_type(x, ibits)
  return jax.lax.bitcast_convert_type(bits ^ jnp.asarray(i, ibits),
                                      x.dtype)


def _chain(fn, x, k, reps, cast=jnp.float32):
  @jax.jit
  def steps(x):
    acc = jnp.float32(0)
    for i in range(k):
      acc = acc + jnp.sum(fn(_perturb(x, i)).astype(cast))
    return acc
  _ = np.asarray(steps(x))
  best = None
  for _ in range(reps):
    t0 = time.perf_counter()
    _ = np.asarray(steps(x))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return k / best  # it/s


def race_demosaic(h, w, k, reps):
  rng = np.random.default_rng(0)
  phases = jax.device_put(
      rng.random((1, 4, h // 2, w // 2)).astype(np.float32))
  from taichi_image_tpu.ops.pallas import demosaic as pallas_dm
  out = {}
  backends = ["xla"]
  if pallas_dm.pallas_available(h // 2, w // 2):
    backends.insert(0, "pallas")
  else:
    print("demosaic[pallas]: not available on this backend/shape",
          flush=True)
  for backend in backends:
    its = _chain(lambda p, b=backend: bayer.demosaic_phases(
        p, BayerPattern.RGGB, backend=b, out_dtype=jnp.float16),
        phases, k, reps)
    out[backend] = its
    print(f"demosaic[{backend}]: {its:8.1f} it/s", flush=True)
  if len(out) == 2:
    print(f"demosaic: pallas/xla speedup x{out['pallas'] / out['xla']:.2f}",
          flush=True)


def race_decode(h, w, k, reps):
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, size=(1, h, w * 3 // 2),
                                     dtype=np.uint8))
  from taichi_image_tpu.models.camera_isp import load_raw_phases
  from taichi_image_tpu.ops.pallas import decode as pld
  from taichi_image_tpu.ops.pallas import no_pallas
  out = {}
  with no_pallas():
    its = _chain(lambda r: load_raw_phases(r, "packed12", types.bf16),
                 raws, k, reps)
  out["xla"] = its
  print(f"decode12[xla]:    {its:8.1f} it/s", flush=True)
  if pld.decode_pallas_available(h, w * 3 // 2):
    its = _chain(lambda r: pld.decode12_phases_bf16(r), raws, k, reps)
    out["pallas"] = its
    print(f"decode12[pallas]: {its:8.1f} it/s", flush=True)
    print(f"decode12: pallas/xla speedup x{out['pallas'] / out['xla']:.2f}",
          flush=True)
  else:
    print("decode12[pallas]: not available for this shape/backend",
          flush=True)


def race_resize_torch(h, w, k, reps):
  # both sides run float32 (round-2 ADVICE.md: the old f16-vs-f32 race
  # was doubly non-comparable); the device difference is still labelled
  from taichi_image_tpu.ops import interpolate
  rng = np.random.default_rng(0)
  img = jax.device_put(rng.random((h, w, 3)).astype(np.float32))

  def ours(x):
    y = interpolate._resize_bilinear(
        x, (int(w * 0.8), int(h * 0.8)), (0.8, 0.8),
        np.dtype(np.float32), np.dtype(np.float32))
    return interpolate.transform(y, interpolate.ImageTransform.rotate_90)

  its = _chain(ours, img, k, reps)
  dev = jax.devices()[0].platform
  print(f"resize+rot90[jax/{dev}]: {its:8.1f} it/s", flush=True)

  try:
    import torch
    import torch.nn.functional as F
  except Exception:
    print("resize+rot90[torch]: torch not available", flush=True)
    return
  t = torch.from_numpy(rng.random((1, 3, h, w)).astype(np.float32))

  def tfn(x):
    y = F.interpolate(x, scale_factor=0.8, mode="bilinear",
                      align_corners=False)
    return torch.rot90(y, k=-1, dims=(2, 3))

  try:
    tc = torch.compile(tfn)
    _ = tc(t)
  except Exception:
    tc = tfn  # compile unavailable: eager
  for _ in range(3):
    _ = tc(t)
  best = None
  for _ in range(reps):
    t0 = time.perf_counter()
    for _ in range(k):
      _ = tc(t)
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  print(f"resize+rot90[torch/{t.device.type}]: {k / best:8.1f} it/s "
        "(same dtype f32, DIFFERENT device — cross-impl sanity, "
        "not apples-to-apples)",
        flush=True)


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument("--size", type=int, nargs=2, default=(2160, 3840))
  parser.add_argument("--k", type=int, default=10)
  parser.add_argument("--reps", type=int, default=3)
  parser.add_argument("--races", default="demosaic,decode12,resize")
  args = parser.parse_args(argv)
  h, w = args.size
  races = args.races.split(",")
  if "demosaic" in races:
    race_demosaic(h, w, args.k, args.reps)
  if "decode12" in races:
    race_decode(h, w, args.k, args.reps)
  if "resize" in races:
    race_resize_torch(h, w, args.k, args.reps)


if __name__ == "__main__":
  main()
