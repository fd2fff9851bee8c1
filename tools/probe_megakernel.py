"""Probe: fused decode+demosaic+finish mega-kernel.

raw u8 rows --DMA--> bytes --R_q one-hot row dots (shift+zero encoded
per top/mid/bottom tile via an index-map-selected operand)--> parity
rows --group sel dots--> byte planes --12-bit math + scale + bf16
quantize--> phase temp (VMEM, col-padded) --13-tap stencil + fused
renorm/CCM/clip--> final bf16 x12 tile.

Eliminates the HBM phases round trip (decode write 100 MB + pad +
stencil halo read ~220 MB at 6x4K) and one kernel's program overheads.

Compared for bit-equality against the composed pipeline
(decode12_phases_bf16 -> demosaic_phases fused-finish path).
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

from taichi_image_tpu.ops.pallas.decode import _sel384
from taichi_image_tpu.ops.bayer import (_demosaic_tables,
                                        _stencil_finish_spec,
                                        BayerPattern)

N, H, W = 6, 2160, 3840
SCALE = float(1.0 / 4095.0)


def _rsel3(tr, hh_img, h_raw):
  """(3, 2, tr+8, RW) one-hot row selectors for top/mid/bottom tiles.

  Phase-halo row k of a tile at phase-row offset i*tr covers image phase
  row i*tr - 4 + k; its raw row pair sits at scratch rows delta + 2k + q
  with delta = -8 (top, clamped) / 0 (mid) / delta_bot (bottom, clamped
  to the raw extent — may exceed 8 when the output grid is row-padded);
  rows outside the image stay all-zero (zero-pad stencil semantics)."""
  rw = 2 * tr + 16
  ni = -(-hh_img // tr) if hh_img % tr else hh_img // tr
  delta_bot = (2 * (ni - 1) * tr - 8) - (h_raw - rw)
  r = np.zeros((3, 2, tr + 8, rw), np.float32)
  bot_limit = hh_img - (ni - 1) * tr + 4  # first invalid k in bottom tile
  for b, delta in ((0, -8), (1, 0), (2, delta_bot)):
    for k in range(tr + 8):
      s = delta + 2 * k
      if b == 0 and k < 4:            # above the image
        continue
      if b == 2 and k >= bot_limit:   # below the image
        continue
      if 0 <= s < rw:
        for q in range(2):
          r[b, q, k, s + q] = 1.0
  return r


def mega_kernel(w12, inv_full, tr, wh, ni, nt, h_raw, fin, sample,
                *refs):
  if sample:
    (hbm_ref, sel_ref, rsel_ref, rs_ref, cs_ref, out_ref, samp_ref,
     temp, scratch, sems) = refs
  else:
    hbm_ref, sel_ref, rsel_ref, out_ref, temp, scratch, sems = refs
  rw = 2 * tr + 16
  t = pl.program_id(0)
  i = t % ni

  def src(tt):
    nn = tt // ni
    ii = tt % ni
    # expressed as 8*k so Mosaic can prove sublane-tiling divisibility;
    # clamp against the RAW extent (the output grid may be row-padded)
    o8 = jnp.clip((2 * ii * tr - 8) // 8, 0, (h_raw - rw) // 8)
    return hbm_ref.at[nn, pl.ds(o8 * 8, rw)]

  def dma(slot, tt):
    return pltpu.make_async_copy(src(tt), scratch.at[slot], sems.at[slot])

  @pl.when(t == 0)
  def _():
    dma(0, 0).start()

  @pl.when(t + 1 < nt)
  def _():
    dma((t + 1) % 2, t + 1).start()

  dma(t % 2, t).wait()
  by = scratch[t % 2].astype(jnp.int32).astype(jnp.float32)  # (rw, wb)

  # decode into the col-padded phase temp (4, tr+8, 128 + wh + 128)
  ng = wh // 128
  temp[:, :, 0:128] = jnp.zeros((4, tr + 8, 128), jnp.bfloat16)
  temp[:, :, 128 + wh:] = jnp.zeros((4, tr + 8, 128), jnp.bfloat16)
  for q in range(2):
    rows = jnp.dot(rsel_ref[0, q], by)          # (tr+8, wb)
    for g in range(ng):
      grp = jnp.dot(rows[:, 384 * g:384 * (g + 1)], sel_ref[...])
      b0 = grp[:, 0:128]
      b1 = grp[:, 128:256]
      b2 = grp[:, 256:384]
      b1hi = jnp.floor(b1 * (1.0 / 16.0))
      even = (b1 - b1hi * 16.0) * 256.0 + b0
      odd = b2 * 16.0 + b1hi
      temp[2 * q + 0, :, 128 * (g + 1):128 * (g + 2)] = (
          even * SCALE).astype(jnp.bfloat16)
      temp[2 * q + 1, :, 128 * (g + 1):128 * (g + 2)] = (
          odd * SCALE).astype(jnp.bfloat16)

  # stencil + fused finish (mirrors ops/pallas/demosaic._stencil_kernel)
  rg = i * tr + jax.lax.broadcasted_iota(jnp.int32, (tr, wh), 0)
  cg = jax.lax.broadcasted_iota(jnp.int32, (tr, wh), 1)
  hh_img, wh_img = fin["hh"], fin["wh"]
  on_top, on_bot = rg == 0, rg == hh_img - 1
  on_left, on_right = cg == 0, cg == wh_img - 1
  masks = (on_top & on_left, on_top & on_right,
           on_bot & on_left, on_bot & on_right)
  ccm = fin["cc"]

  def taps(oc):
    a = None
    for q in range(4):
      for u in range(3):
        for v in range(3):
          wgt = float(w12[oc, q, u, v])
          if wgt == 0.0:
            continue
          s = temp[q, 3 + u:3 + u + tr,
                   127 + v:127 + v + wh].astype(jnp.float32) * wgt
          a = s if a is None else a + s
    return a * inv_full[oc]

  valid = rg < hh_img  # row-padded grids: rows beyond the image emit 0
  for p in range(4):
    vals = []
    for c in range(3):
      oc = 3 * p + c
      val = jnp.where(valid, taps(oc), 0.0)
      rvf = (jnp.where(on_top, jnp.float32(fin["topf"][oc]), 1.0)
             * jnp.where(on_bot, jnp.float32(fin["botf"][oc]), 1.0))
      cvv = (jnp.where(on_left, jnp.float32(fin["leftf"][oc]), 1.0)
             * jnp.where(on_right, jnp.float32(fin["rightf"][oc]), 1.0))
      f = rvf * cvv
      for k in range(4):
        f = jnp.where(masks[k], f * jnp.float32(fin["cvals"][k, oc]), f)
      vals.append(val * f)
    if ccm is not None:
      vals = [vals[0] * float(ccm[d, 0]) + vals[1] * float(ccm[d, 1])
              + vals[2] * float(ccm[d, 2]) for d in range(3)]
    for c in range(3):
      v = jnp.clip(vals[c], 0.0, 1.0)
      out_ref[0, 3 * p + c] = v.astype(jnp.bfloat16)
      if sample and p == 0:
        # metering sample grid (channels 0..2 at stride 4) via one-hot
        # MXU dots on the FINISHED f32 value, exactly like the composed
        # demosaic kernel's emission (HIGHEST: default f32 dots are
        # bf16-reduced and round the samples)
        cols = jnp.dot(v, cs_ref[...],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        samp_ref[0, c] = jnp.dot(rs_ref[...], cols,
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)


def mega(raws, tr, cc=None, interpret=False, hh_grid=None,
         sample=False):
  """hh_grid: output grid rows (>= hh). Rows beyond H/2 emit zeros —
  pass 1088 for a (16,128)-tile-aligned bf16 output at 4K.

  ``sample``: additionally emit the stride-4 metering sample grid of
  channels 0..2 (round-3 re-probe, VERDICT #3) — requires tr % 32 == 0;
  the sample column block pads to 512 lanes (wh/4 = 480 is not
  128-aligned) and trims after."""
  n, h, wb = raws.shape
  wh = wb // 3
  hh = h // 2
  if hh_grid is None:
    hh_grid = hh
  ni = hh_grid // tr
  nt = n * ni
  w12 = _demosaic_tables(BayerPattern.RGGB, "mhc")
  inv_full = tuple(float(1.0 / s) for s in w12.sum(axis=(1, 2, 3)))
  fin = _stencil_finish_spec(w12, hh, wh, cc, jnp.bfloat16)

  def out_map(t):
    return (t // ni, 0, t % ni, 0)

  operands = [raws, jnp.asarray(_sel384()),
              jnp.asarray(_rsel3(tr, hh, h))]
  in_specs = [
      pl.BlockSpec(memory_space=pl.ANY),
      pl.BlockSpec((384, 384), lambda t: (0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, 2, tr + 8, 2 * tr + 16),
                   lambda t: (jnp.where(
                       t % ni == 0, 0,
                       jnp.where(t % ni == ni - 1, 2, 1)), 0, 0, 0),
                   memory_space=pltpu.VMEM),
  ]
  out_shapes = [jax.ShapeDtypeStruct((n, 12, hh_grid, wh), jnp.bfloat16)]
  out_specs = [pl.BlockSpec((1, 12, tr, wh), out_map,
                            memory_space=pltpu.VMEM)]
  if sample:
    assert tr % 32 == 0, tr  # sample rows per tile must be 8-aligned
    sr = tr // 4
    sw_pad = -(-(wh // 4) // 128) * 128
    rs = np.zeros((sr, tr), np.float32)
    rs[np.arange(sr), np.arange(0, tr, 4)] = 1.0
    cs = np.zeros((wh, sw_pad), np.float32)
    cs[np.arange(0, wh, 4), np.arange(wh // 4)] = 1.0
    operands += [jnp.asarray(rs), jnp.asarray(cs)]
    in_specs += [pl.BlockSpec((sr, tr), lambda t: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((wh, sw_pad), lambda t: (0, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes.append(jax.ShapeDtypeStruct((n, 3, ni * sr, sw_pad),
                                           jnp.float32))
    out_specs.append(pl.BlockSpec((1, 3, sr, sw_pad), out_map,
                                  memory_space=pltpu.VMEM))

  res = pl.pallas_call(
      functools.partial(mega_kernel, w12, inv_full, tr, wh, ni, nt, h,
                        fin, sample),
      out_shape=out_shapes,
      grid=(nt,),
      in_specs=in_specs,
      out_specs=out_specs,
      scratch_shapes=[
          pltpu.VMEM((4, tr + 8, 256 + wh), jnp.bfloat16),
          pltpu.VMEM((2, 2 * tr + 16, wb), jnp.uint8),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(*operands)
  if not sample:
    return res[0] if isinstance(res, (list, tuple)) else res
  out, samp = res
  hs, ws = -(-hh // 4), wh // 4
  return out, samp[:, :, :hs, :ws].astype(jnp.bfloat16)


def composed(raws, cc=None, sample=False):
  from taichi_image_tpu.ops.pallas.decode import decode12_phases_bf16
  from taichi_image_tpu.ops import bayer
  ph = decode12_phases_bf16(raws)
  return bayer.demosaic_phases(ph, BayerPattern.RGGB, cc=cc,
                               out_dtype=jnp.bfloat16, backend="pallas",
                               sample_step=4 if sample else 0)


def composed_interp(raws, cc=None):
  from taichi_image_tpu.models.camera_isp import load_raw_phases
  from taichi_image_tpu.ops import bayer
  from taichi_image_tpu import types
  ph = load_raw_phases(raws, "packed12", types.bf16)
  return bayer.demosaic_phases(ph, BayerPattern.RGGB, cc=cc,
                               out_dtype=jnp.bfloat16, backend="xla")


def composed_interp_sample(raws, cc=None):
  from taichi_image_tpu.models.camera_isp import load_raw_phases
  from taichi_image_tpu.ops import bayer
  from taichi_image_tpu import types
  ph = load_raw_phases(raws, "packed12", types.bf16)
  out, samp = bayer.demosaic_phases(ph, BayerPattern.RGGB, cc=cc,
                                    out_dtype=jnp.bfloat16,
                                    backend="xla", sample_step=4)
  return out, samp


def bench(fn, raws, k=10, reps=3):
  @jax.jit
  def steps(raws):
    acc = jnp.float32(0)
    for i in range(k):
      r = fn(raws ^ jnp.uint8(i))
      for x in (r if isinstance(r, (tuple, list)) else (r,)):
        acc = acc + jnp.sum(x.astype(jnp.float32))
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
  ap.add_argument("--tr", type=int, default=40)
  ap.add_argument("--interpret", action="store_true")
  args = ap.parse_args()

  rng = np.random.default_rng(0)
  cc = tuple(np.array([[1.1, -0.05, 0.0], [0.02, 0.9, 0.08],
                       [0.0, -0.1, 1.05]], np.float32).ravel())
  small = jnp.asarray(rng.integers(0, 256, size=(2, 64, 1152),
                                   dtype=np.uint8))
  for ccase in (None, cc):
    ref = np.asarray(jax.jit(functools.partial(
        composed_interp, cc=ccase))(small))
    got = np.asarray(jax.jit(functools.partial(
        mega, tr=16, cc=ccase, interpret=args.interpret))(small))
    ri = ref.view(np.uint16).astype(np.int32)
    gi = got.view(np.uint16).astype(np.int32)
    d = np.abs(ri - gi)
    tag = "cc" if ccase is not None else "nocc"
    print(f"small {tag}: max ulp diff={d.max()} "
          f"frac={float((d != 0).mean()):.2e}", flush=True)
  # sample-emission value check (interpret-compatible): mega sample ==
  # composed kernel's sample on the same raws (tr=32 needs >= 80 raw
  # rows for the halo'd band DMA)
  small2 = jnp.asarray(rng.integers(0, 256, size=(2, 128, 1152),
                                    dtype=np.uint8))
  ref_o, ref_s = jax.jit(functools.partial(
      composed_interp_sample, cc=cc))(small2)
  got_o, got_s = jax.jit(functools.partial(
      mega, tr=32, cc=cc, sample=True,
      interpret=args.interpret))(small2)
  ds = np.abs(np.asarray(got_s, np.float32) - np.asarray(ref_s,
                                                         np.float32))
  print(f"small sample: max|diff|={float(ds.max()):.2e} "
        f"shape={np.asarray(got_s).shape}", flush=True)

  if args.interpret:
    return

  raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                     dtype=np.uint8))
  ref_f = np.asarray(jax.jit(functools.partial(composed, cc=cc))(raws))
  got_f = np.asarray(jax.jit(functools.partial(
      mega, tr=args.tr, cc=cc))(raws))
  d = np.abs(ref_f.view(np.uint16).astype(np.int32)
             - got_f.view(np.uint16).astype(np.int32))
  print(f"full vs composed-pallas: max ulp diff={d.max()} "
        f"frac={float((d != 0).mean()):.2e}", flush=True)

  # aligned-output variant: 1088-row grid, tile-aligned bf16 writes
  got_p = np.asarray(jax.jit(functools.partial(
      mega, tr=32, cc=cc, hh_grid=1088))(raws))
  d = np.abs(ref_f.view(np.uint16).astype(np.int32)
             - got_p[:, :, :1080].view(np.uint16).astype(np.int32))
  z = np.asarray(got_p[:, :, 1080:], np.float32)
  print(f"full padded-grid: max ulp diff={d.max()} "
        f"frac={float((d != 0).mean()):.2e} pad-rows-zero={bool((z == 0).all())}",
        flush=True)

  # round-3 re-probe (VERDICT #3): WITH in-kernel sample emission on
  # both sides — the composed path's former advantage
  got_s, samp_s = jax.jit(functools.partial(
      mega, tr=32, cc=cc, hh_grid=1088, sample=True))(raws)
  ref_s, rsamp_s = jax.jit(functools.partial(
      composed, cc=cc, sample=True))(raws)
  ds = np.abs(np.asarray(samp_s, np.float32)
              - np.asarray(rsamp_s, np.float32))
  print(f"sample emission vs composed: max|diff|={float(ds.max()):.2e}",
        flush=True)

  print(f"composed:          "
        f"{bench(functools.partial(composed, cc=cc), raws):6.2f} ms",
        flush=True)
  print(f"composed+sample:   "
        f"{bench(functools.partial(composed, cc=cc, sample=True), raws):6.2f} ms",
        flush=True)
  for tr, hg, smp in ((32, 1088, True), (32, 1088, False), (40, None,
                                                            False)):
    try:
      ms = bench(functools.partial(mega, tr=tr, cc=cc, hh_grid=hg,
                                   sample=smp), raws)
      print(f"mega tr={tr} grid={hg} sample={smp}: {ms:6.2f} ms",
            flush=True)
    except Exception as e:
      print(f"mega tr={tr} grid={hg} sample={smp}: FAIL {str(e)[:80]}",
            flush=True)


if __name__ == "__main__":
  main()
