"""Probe 5: packed12 decode as a Pallas kernel (i32 DMA + one-hot MXU
de-stride).

The XLA decode floor is ~4.0 ms at 6x4K (probe_decode/3/4): the stride-3
byte relayout is a lane gather XLA does at ~40 GB/s. This kernel moves
the de-stride onto the MXU *inside* a manual-DMA Pallas kernel, where the
one-hot matmul trick (6.7 ms when XLA lowers it, probe_decode2) runs at
MXU speed without XLA's layout padding:

  raw u8 -> (XLA bitcast) i32 words -> DMA tile (tr, 3*tw/4)
  -> 4 byte lanes B_k = (w >> 8k) & 255, exact in f32
  -> lane de-stride: per 128-col group, b_p = sum_k B_k[:, 96g:96g+96]
     @ S_kp (96, 128) one-hot   [bytes <= 255 are EXACT in bf16-reduced
     default-precision MXU dots]
  -> row-parity split: one-hot R_q (tr/2, tr) @ b_p
  -> 12-bit math in f32 (exact): even = (b1 % 16)*256 + b0,
     odd = b2*16 + floor(b1/16)   [reference packed.py:16-20]
  -> * scale/4095 -> bf16 phase planes (1, 4, tr/2, tw)

Output is checked for BIT-EQUALITY with load_raw_phases(..., bf16).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, H, W = 6, 2160, 3840
WH = W // 2  # phase-plane width


def _sel_tables():
  """S[k*3+p] (96, 128): byte b = 3c+p of a 384-byte group comes from
  word m = b//4, byte-in-word k = b%4."""
  s = np.zeros((12, 96, 128), np.float32)
  for p in range(3):
    for c in range(128):
      b = 3 * c + p
      s[(b % 4) * 3 + p, b // 4, c] = 1.0
  return s


def _rsel(tr):
  r = np.zeros((2, tr // 2, tr), np.float32)
  for q in range(2):
    r[q, np.arange(tr // 2), 2 * np.arange(tr // 2) + q] = 1.0
  return r


def _decode_kernel(tr, tw, ni, nt, scale, ids, nw_pad, hbm_ref, sel_ref,
                   rsel_ref, out_ref, bscr, scratch, sems):
  """Full-row tiles: tile t = (camera, row-block). Raw words are DMA'd
  with NO lane slicing (nw_pad = the hbm array's full last dim), so the
  Mosaic 128-alignment rule for memref slices never triggers."""
  t = pl.program_id(0)

  def src(tt):
    nn = tt // ni
    i = tt % ni
    return hbm_ref.at[nn, pl.ds(i * tr, tr)]

  def dma(slot, tt):
    return pltpu.make_async_copy(src(tt), scratch.at[slot], sems.at[slot])

  @pl.when(t == 0)
  def _():
    dma(0, 0).start()

  @pl.when(t + 1 < nt)
  def _():
    dma((t + 1) % 2, t + 1).start()

  dma(t % 2, t).wait()
  w = scratch[t % 2]  # (tr, nw_pad) i32
  bk = [((w >> (8 * k)) & 255).astype(jnp.float32) for k in range(4)]

  ng = tw // 128
  for p in range(3):
    for g in range(ng):
      acc = None
      for k in range(4):
        d = jnp.dot(bk[k][:, 96 * g:96 * (g + 1)], sel_ref[k * 3 + p])
        acc = d if acc is None else acc + d
      bscr[p, :, 128 * g:128 * (g + 1)] = acc

  for q in range(2):
    b0 = jnp.dot(rsel_ref[q], bscr[0])
    b1 = jnp.dot(rsel_ref[q], bscr[1])
    b2 = jnp.dot(rsel_ref[q], bscr[2])
    if not ids:
      b1lo = b1 - jnp.floor(b1 * (1.0 / 16.0)) * 16.0
      b1hi = jnp.floor(b1 * (1.0 / 16.0))
      even = b1lo * 256.0 + b0
      odd = b2 * 16.0 + b1hi
    else:
      b2lo = b2 - jnp.floor(b2 * (1.0 / 16.0)) * 16.0
      b2hi = jnp.floor(b2 * (1.0 / 16.0))
      even = b0 * 16.0 + b2lo
      odd = b1 * 16.0 + b2hi
    out_ref[0, 2 * q + 0] = (even * scale).astype(jnp.bfloat16)
    out_ref[0, 2 * q + 1] = (odd * scale).astype(jnp.bfloat16)


def decode12_pallas(raws_u8, tr, ids=False, interpret=False,
                    pad_words=False):
  """(N, H, W*3/2) u8 -> (N, 4, H/2, W/2) bf16 phases. Full-row tiles:
  tw = W/2 (must be a multiple of 128); tr divides H, multiple of 16."""
  n, h, wb = raws_u8.shape
  wh = wb // 3
  tw = wh
  words = jax.lax.bitcast_convert_type(
      raws_u8.reshape(n, h, wb // 4, 4), jnp.int32)
  nw = wb // 4
  if pad_words:
    nw_pad = -(-nw // 128) * 128
    words = jnp.pad(words, ((0, 0), (0, 0), (0, nw_pad - nw)))
  else:
    nw_pad = nw
  ni = h // tr
  nt = n * ni

  def out_map(t):
    return (t // ni, 0, t % ni, 0)

  kernel = functools.partial(_decode_kernel, tr, tw, ni, nt,
                             float(1.0 / 4095.0), ids, nw_pad)
  out = pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((n, 4, h // 2, wh), jnp.bfloat16),
      grid=(nt,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((12, 96, 128), lambda t: (0, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((2, tr // 2, tr), lambda t: (0, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, 4, tr // 2, tw), out_map,
                             memory_space=pltpu.VMEM),
      scratch_shapes=[
          pltpu.VMEM((3, tr, tw), jnp.float32),
          pltpu.VMEM((2, tr, nw_pad), jnp.int32),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(words, jnp.asarray(_sel_tables()), jnp.asarray(_rsel(tr)))
  return out


def xla_decode(raws):
  from taichi_image_tpu.models.camera_isp import load_raw_phases
  from taichi_image_tpu import types
  return load_raw_phases(raws, "packed12", types.bf16)


def bench(fn, raws, k=10, reps=3):
  @jax.jit
  def steps(raws):
    acc = jnp.float32(0)
    for i in range(k):
      ph = fn(raws ^ jnp.uint8(i))
      acc = acc + jnp.sum(ph.astype(jnp.float32))
    return acc
  _ = np.asarray(steps(raws))
  best = None
  for _ in range(reps):
    t0 = time.perf_counter()
    _ = np.asarray(steps(raws))
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
  return best / k * 1000.0


def main():
  import argparse
  ap = argparse.ArgumentParser()
  ap.add_argument("--tr", type=int, default=48)
  ap.add_argument("--pad_words", action="store_true")
  ap.add_argument("--interpret", action="store_true")
  args = ap.parse_args()

  rng = np.random.default_rng(0)
  small = jnp.asarray(rng.integers(0, 256, size=(2, 32, 768), dtype=np.uint8))
  ref = np.asarray(jax.jit(xla_decode)(small))
  got = np.asarray(jax.jit(functools.partial(
      decode12_pallas, tr=16, interpret=args.interpret,
      pad_words=args.pad_words))(small))
  exact = np.array_equal(ref.view(np.uint16), got.view(np.uint16))
  print(f"small exact={exact}", flush=True)
  if not exact:
    bad = np.argwhere(ref != got)
    print("first mismatches:", bad[:5], ref[tuple(bad[0])], got[tuple(bad[0])])
    return

  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  # full-size exactness too
  ref_f = np.asarray(jax.jit(xla_decode)(raws)).view(np.uint16)
  got_f = np.asarray(jax.jit(functools.partial(
      decode12_pallas, tr=args.tr,
      pad_words=args.pad_words))(raws)).view(np.uint16)
  print("full exact:", np.array_equal(ref_f, got_f), flush=True)

  ms_x = bench(xla_decode, raws)
  ms_p = bench(functools.partial(decode12_pallas, tr=args.tr,
                                 pad_words=args.pad_words), raws)
  print(f"xla decode:    {ms_x:6.2f} ms", flush=True)
  print(f"pallas decode: {ms_p:6.2f} ms  (tr={args.tr} "
        f"pad_words={args.pad_words})", flush=True)


if __name__ == "__main__":
  main()


# --- v2: u8 input (no XLA bitcast), rows-first one-hot dots ---------------

def _sel384():
  """S (384, 384): byte b of a 384-byte group -> col 128*p + c where
  b == 3c + p."""
  s = np.zeros((384, 384), np.float32)
  for c in range(128):
    for p in range(3):
      s[3 * c + p, 128 * p + c] = 1.0
  return s


def _decode_kernel2(tr, wh, ni, nt, scale, ids, hbm_ref, sel_ref,
                    rsel_ref, out_ref, scratch, sems):
  t = pl.program_id(0)

  def src(tt):
    return hbm_ref.at[tt // ni, pl.ds((tt % ni) * tr, tr)]

  def dma(slot, tt):
    return pltpu.make_async_copy(src(tt), scratch.at[slot], sems.at[slot])

  @pl.when(t == 0)
  def _():
    dma(0, 0).start()

  @pl.when(t + 1 < nt)
  def _():
    dma((t + 1) % 2, t + 1).start()

  dma(t % 2, t).wait()
  by = scratch[t % 2].astype(jnp.int32).astype(jnp.float32)  # (tr, wb)

  ng = wh // 128
  for q in range(2):
    rows = jnp.dot(rsel_ref[q], by)           # (tr/2, wb)
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
      out_ref[0, 2 * q + 0, :, 128 * g:128 * (g + 1)] = (
          even * scale).astype(jnp.bfloat16)
      out_ref[0, 2 * q + 1, :, 128 * g:128 * (g + 1)] = (
          odd * scale).astype(jnp.bfloat16)


def decode12_pallas_u8(raws_u8, tr, ids=False, interpret=False):
  """(N, H, W*3/2) u8 -> (N, 4, H/2, W/2) bf16 phases; u8 DMA'd raw."""
  n, h, wb = raws_u8.shape
  wh = wb // 3
  ni = h // tr
  nt = n * ni

  def out_map(t):
    return (t // ni, 0, t % ni, 0)

  kernel = functools.partial(_decode_kernel2, tr, wh, ni, nt,
                             float(1.0 / 4095.0), ids)
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
      out_specs=pl.BlockSpec((1, 4, tr // 2, wh), out_map,
                             memory_space=pltpu.VMEM),
      scratch_shapes=[
          pltpu.VMEM((2, tr, wb), jnp.uint8),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(raws_u8, jnp.asarray(_sel384()), jnp.asarray(_rsel(tr)))


def main2():
  import argparse
  ap = argparse.ArgumentParser()
  ap.add_argument("--tr", type=int, default=48)
  args, _ = ap.parse_known_args()

  rng = np.random.default_rng(0)
  small = jnp.asarray(rng.integers(0, 256, size=(2, 32, 768), dtype=np.uint8))
  ref = np.asarray(jax.jit(xla_decode)(small))
  got = np.asarray(jax.jit(functools.partial(
      decode12_pallas_u8, tr=16))(small))
  print("v2 small exact:",
        np.array_equal(ref.view(np.uint16), got.view(np.uint16)),
        flush=True)

  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  ref_f = np.asarray(jax.jit(xla_decode)(raws)).view(np.uint16)
  got_f = np.asarray(jax.jit(functools.partial(
      decode12_pallas_u8, tr=args.tr))(raws)).view(np.uint16)
  print("v2 full exact:", np.array_equal(ref_f, got_f), flush=True)

  print(f"xla decode:       {bench(xla_decode, raws):6.2f} ms", flush=True)
  for tr in (48, 80, 144):
    ms = bench(functools.partial(decode12_pallas_u8, tr=tr), raws)
    print(f"pallas-u8 tr={tr:3d}: {ms:6.2f} ms", flush=True)


# --- v3: free (N, H/2, 2*wb) reshape makes row parity a static lane range --

def _decode_kernel3(tr2, wh, wb, ni, nt, scale, ids, hbm_ref, sel_ref,
                    out_ref, scratch, sems):
  t = pl.program_id(0)

  def src(tt):
    return hbm_ref.at[tt // ni, pl.ds((tt % ni) * tr2, tr2)]

  def dma(slot, tt):
    return pltpu.make_async_copy(src(tt), scratch.at[slot], sems.at[slot])

  @pl.when(t == 0)
  def _():
    dma(0, 0).start()

  @pl.when(t + 1 < nt)
  def _():
    dma((t + 1) % 2, t + 1).start()

  dma(t % 2, t).wait()
  by = scratch[t % 2].astype(jnp.int32).astype(jnp.float32)  # (tr2, 2*wb)

  ng = wh // 128
  for q in range(2):
    for g in range(ng):
      off = q * wb + 384 * g
      grp = jnp.dot(by[:, off:off + 384], sel_ref[...])
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
      out_ref[0, 2 * q + 0, :, 128 * g:128 * (g + 1)] = (
          even * scale).astype(jnp.bfloat16)
      out_ref[0, 2 * q + 1, :, 128 * g:128 * (g + 1)] = (
          odd * scale).astype(jnp.bfloat16)


def decode12_pallas_u8v3(raws_u8, tr2, ids=False, interpret=False):
  n, h, wb = raws_u8.shape
  wh = wb // 3
  paired = raws_u8.reshape(n, h // 2, 2 * wb)  # free C-order view
  ni = (h // 2) // tr2
  nt = n * ni

  def out_map(t):
    return (t // ni, 0, t % ni, 0)

  kernel = functools.partial(_decode_kernel3, tr2, wh, wb, ni, nt,
                             float(1.0 / 4095.0), ids)
  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((n, 4, h // 2, wh), jnp.bfloat16),
      grid=(nt,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((384, 384), lambda t: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, 4, tr2, wh), out_map,
                             memory_space=pltpu.VMEM),
      scratch_shapes=[
          pltpu.VMEM((2, tr2, 2 * wb), jnp.uint8),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(paired, jnp.asarray(_sel384()))


def main3():
  rng = np.random.default_rng(0)
  small = jnp.asarray(rng.integers(0, 256, size=(2, 32, 768), dtype=np.uint8))
  ref = np.asarray(jax.jit(xla_decode)(small))
  got = np.asarray(jax.jit(functools.partial(
      decode12_pallas_u8v3, tr2=8))(small))
  print("v3 small exact:",
        np.array_equal(ref.view(np.uint16), got.view(np.uint16)),
        flush=True)

  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  ref_f = np.asarray(jax.jit(xla_decode)(raws)).view(np.uint16)
  got_f = np.asarray(jax.jit(functools.partial(
      decode12_pallas_u8v3, tr2=40))(raws)).view(np.uint16)
  print("v3 full exact:", np.array_equal(ref_f, got_f), flush=True)

  for tr2 in (24, 40, 72, 120):
    ms = bench(functools.partial(decode12_pallas_u8v3, tr2=tr2), raws)
    print(f"pallas-u8v3 tr2={tr2:3d}: {ms:6.2f} ms", flush=True)


# --- v4: 2-d tiling (column-tiled u8 DMA, 1536-byte = 512-phase-col tiles) --

def _decode_kernel4(tr, twp, ni, nj, nt, scale, ids, hbm_ref, sel_ref,
                    rsel_ref, out_ref, scratch, sems):
  twb = 3 * twp  # bytes per tile
  t = pl.program_id(0)

  def src(tt):
    nn = tt // (ni * nj)
    r = tt % (ni * nj)
    return hbm_ref.at[nn, pl.ds((r // nj) * tr, tr),
                      pl.ds((r % nj) * twb, twb)]

  def dma(slot, tt):
    return pltpu.make_async_copy(src(tt), scratch.at[slot], sems.at[slot])

  @pl.when(t == 0)
  def _():
    dma(0, 0).start()

  @pl.when(t + 1 < nt)
  def _():
    dma((t + 1) % 2, t + 1).start()

  dma(t % 2, t).wait()
  by = scratch[t % 2].astype(jnp.int32).astype(jnp.float32)  # (tr, twb)

  ng = twp // 128
  for q in range(2):
    rows = jnp.dot(rsel_ref[q], by)           # (tr/2, twb)
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
      out_ref[0, 2 * q + 0, :, 128 * g:128 * (g + 1)] = (
          even * scale).astype(jnp.bfloat16)
      out_ref[0, 2 * q + 1, :, 128 * g:128 * (g + 1)] = (
          odd * scale).astype(jnp.bfloat16)


def decode12_pallas_u8v4(raws_u8, tr, twp, ids=False, interpret=False):
  n, h, wb = raws_u8.shape
  wh = wb // 3
  ni, nj = h // tr, wh // twp
  nt = n * ni * nj

  def out_map(t):
    nn = t // (ni * nj)
    r = t % (ni * nj)
    return (nn, 0, r // nj, r % nj)

  kernel = functools.partial(_decode_kernel4, tr, twp, ni, nj, nt,
                             float(1.0 / 4095.0), ids)
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
      out_specs=pl.BlockSpec((1, 4, tr // 2, twp), out_map,
                             memory_space=pltpu.VMEM),
      scratch_shapes=[
          pltpu.VMEM((2, tr, 3 * twp), jnp.uint8),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(raws_u8, jnp.asarray(_sel384()), jnp.asarray(_rsel(tr)))


def main4():
  rng = np.random.default_rng(0)
  small = jnp.asarray(rng.integers(0, 256, size=(2, 32, 768*3), dtype=np.uint8))
  ref = np.asarray(jax.jit(xla_decode)(small))
  got = np.asarray(jax.jit(functools.partial(
      decode12_pallas_u8v4, tr=16, twp=256))(small))
  print("v4 small exact:",
        np.array_equal(ref.view(np.uint16), got.view(np.uint16)),
        flush=True)

  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  for tr, twp in ((80, 640), (160, 640), (240, 640), (80, 384), (432, 640)):
    try:
      ms = bench(functools.partial(decode12_pallas_u8v4, tr=tr, twp=twp),
                 raws)
      print(f"v4 tr={tr:3d} twp={twp}: {ms:6.2f} ms", flush=True)
    except Exception as e:
      print(f"v4 tr={tr:3d} twp={twp}: FAIL {str(e)[:60]}", flush=True)
