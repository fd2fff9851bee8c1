"""Probe: can MANUAL output DMA lift the decode kernel's write side?

The 4K per-stage roofline (BASELINE.md round 5) puts decode at 49 GB/s
— 11% of the copy ceiling — and the round-2/3 probes measured Pallas
bf16 blocked-out_spec HBM writes capping at ~30-95 GB/s "regardless of
geometry". One mechanism was never tried: out_specs in ANY memory
space with the kernel double-buffering its OWN output tiles through
VMEM scratch and issuing explicit ``make_async_copy`` writes (the same
pattern the input side already uses). If the cap lives in the pipeline
emitter's write scheduling, this lifts decode 3.6 -> ~2 ms at 6x4K and
more at 8K; if the cap is the DMA engine itself, this measures the
same and the roofline's "decode is at ITS OWN ceiling" claim gets the
missing direct evidence.

Variants raced (all bitwise-checked against the shipped kernel):
  blocked   — the shipped decode12_phases_bf16 (blocked out_specs)
  wdma      — manual-write variant: compute into VMEM scratch, explicit
              async copy to an ANY-space output, double-buffered with
              the write of tile t-1 overlapping compute of tile t
  wdma-io   — same DMA skeleton, compute replaced by a cast (write-rate
              ceiling of the wdma geometry)
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taichi_image_tpu.ops.pallas import decode as pl_dec

K = 6
REPS = 5


def _wdma_kernel(tr, wh, ni, nt, scale, ids, io_only, hbm_ref, sel_ref,
                 rsel_ref, out_ref, scratch, oscratch, sems, osems):
  t = pl.program_id(0)

  def src(tt):
    return hbm_ref.at[tt // ni, pl.ds((tt % ni) * tr, tr)]

  def dma(slot, tt):
    return pltpu.make_async_copy(src(tt), scratch.at[slot], sems.at[slot])

  def odst(tt):
    # row offset spelled 8*k for Mosaic's divisibility prover
    return out_ref.at[tt // ni, :,
                      pl.ds(8 * ((tt % ni) * (tr // 16)), tr // 2)]

  def odma(slot, tt):
    return pltpu.make_async_copy(oscratch.at[slot], odst(tt),
                                 osems.at[slot])

  @pl.when(t == 0)
  def _():
    dma(0, 0).start()

  @pl.when(t + 1 < nt)
  def _():
    dma((t + 1) % 2, t + 1).start()

  dma(t % 2, t).wait()
  # the write of tile t-2 must have drained before reusing its slot
  @pl.when(t >= 2)
  def _():
    odma(t % 2, t - 2).wait()

  by = scratch[t % 2].astype(jnp.int32).astype(jnp.float32)

  ng = wh // 128
  if io_only:
    # write-ceiling variant: same bytes, no de-stride math
    for q in range(2):
      half = by[:, : 2 * wh][::1]
      rows = jnp.dot(rsel_ref[q], half)  # (tr/2, 2*wh)
      oscratch[t % 2, 2 * q + 0] = (
          rows[:, :wh] * scale).astype(jnp.bfloat16)
      oscratch[t % 2, 2 * q + 1] = (
          rows[:, wh:] * scale).astype(jnp.bfloat16)
  else:
    for q in range(2):
      rows = jnp.dot(rsel_ref[q], by)
      for g in range(ng):
        grp = jnp.dot(rows[:, 384 * g:384 * (g + 1)], sel_ref[...])
        b0 = grp[:, 0:128]
        b1 = grp[:, 128:256]
        b2 = grp[:, 256:384]
        if not ids:
          b1hi = jnp.floor(b1 * (1.0 / 16.0))
          even = (b1 - b1hi * 16.0) * 256.0 + b0
          odd = b2 * 16.0 + b1hi
        else:
          b2hi = jnp.floor(b2 * (1.0 / 16.0))
          even = b0 * 16.0 + (b2 - b2hi * 16.0)
          odd = b1 * 16.0 + b2hi
        oscratch[t % 2, 2 * q + 0, :, 128 * g:128 * (g + 1)] = (
            even * scale).astype(jnp.bfloat16)
        oscratch[t % 2, 2 * q + 1, :, 128 * g:128 * (g + 1)] = (
            odd * scale).astype(jnp.bfloat16)

  odma(t % 2, t).start()

  @pl.when(t + 1 == nt)
  def _():
    odma(t % 2, t).wait()

  if nt >= 2:
    @pl.when(t + 1 == nt)
    def _():
      odma((t + 1) % 2, t - 1).wait()


def decode_wdma(raws_u8, io_only=False, row_tile=None):
  n, h, wb = raws_u8.shape
  wh = wb // 3
  tr = row_tile if row_tile is not None else pl_dec.decode_tiling(h, wb)
  assert tr is not None and h % tr == 0, (h, wb, tr)
  ni = h // tr
  nt = n * ni
  kernel = functools.partial(_wdma_kernel, tr, wh, ni, nt,
                             float(1.0 / 4095.0), False, io_only)
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
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      scratch_shapes=[
          pltpu.VMEM((2, tr, wb), jnp.uint8),
          pltpu.VMEM((2, 4, tr // 2, wh), jnp.bfloat16),
          pltpu.SemaphoreType.DMA((2,)),
          pltpu.SemaphoreType.DMA((2,)),
      ],
  )(raws_u8, jnp.asarray(pl_dec._sel384()),
    jnp.asarray(pl_dec._rsel(tr)))


def chain(fn, raws):
  @jax.jit
  def f(r):
    acc = jnp.float32(0)
    for i in range(K):
      out = fn(r ^ jnp.uint8(i))
      acc = acc + out[0, 0, 0, :8].astype(jnp.float32).sum()
    return acc
  return f


def race(tag, H, W, tiles=(None,)):
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, (6, H, W * 3 // 2),
                                     dtype=np.uint8))
  mb = (raws.nbytes + 6 * 4 * (H // 2) * (W // 2) * 2) / 1e6
  print(f"--- {tag}: logical {mb:.0f} MB/step", flush=True)

  a = np.asarray(pl_dec.decode12_phases_bf16(raws))
  b = np.asarray(decode_wdma(raws))
  print(f"wdma bitwise vs shipped: {np.array_equal(a, b)}", flush=True)

  cands = {"blocked (shipped)":
           lambda r: pl_dec.decode12_phases_bf16(r)}
  for tl in tiles:
    nm = f"wdma tr={tl or 'auto'}"
    cands[nm] = functools.partial(decode_wdma, row_tile=tl)
    cands[nm + " IO-only"] = functools.partial(decode_wdma, io_only=True,
                                               row_tile=tl)
  for name, fn in cands.items():
    f = chain(fn, raws)
    float(np.asarray(f(raws)))
    best = min(
        (lambda t0: (float(np.asarray(f(raws))), time.perf_counter() - t0)[1]
         )(time.perf_counter()) for _ in range(REPS))
    ms = best / K * 1000
    print(f"{name:26} {ms:7.2f} ms  ({mb / 1e3 / (best / K):6.0f} GB/s)",
          flush=True)


if __name__ == "__main__":
  race("6x4K", 2160, 3840, tiles=(None, 48, 240))
  race("6x8K", 4320, 7680, tiles=(None,))
