"""TPU layout/formulation probe for the demosaic + ISP pipeline.

Times candidate formulations with reliable methodology: k repetitions
chained inside ONE jit (input perturbed per iteration so XLA cannot CSE),
finishing in a scalar that is fetched to host. Run on the real chip:

    python tools/layout_probe.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from taichi_image_tpu.ops.bayer import (_demosaic_tables, _PHASE_PARITY,
                                        BayerPattern)

N, H, W = 6, 2160, 3840
HH, WH = H // 2, W // 2
K = 8  # chained reps inside one jit


def timeit(name, jitted, *args):
  out = jitted(*args)
  jax.block_until_ready(out)
  v = np.asarray(out)
  reps = 3
  t0 = time.perf_counter()
  for _ in range(reps):
    v = np.asarray(jitted(*args))
  el = (time.perf_counter() - t0) / reps / K
  print(f"{name}: {el*1e3:.2f} ms/iter ({N/el:.0f} frames/s)  checksum={v}")
  return el


def chain(body):
  """Run body K times with a perturbed input, reduce to one scalar."""
  def run(cfa):
    acc = jnp.float32(0)
    for i in range(K):
      out = body(cfa + jnp.asarray(i, cfa.dtype))
      acc = acc + jnp.sum(out.astype(jnp.float32)) * 1e-9
    return acc
  return jax.jit(run)


def phases_of(cfa):
  x = cfa.reshape(N, HH, 2, WH, 2).transpose(0, 2, 4, 1, 3)
  return x.reshape(N, 4, HH, WH)


W12 = jnp.asarray(_demosaic_tables(BayerPattern.RGGB, "mhc"))  # (12,4,3,3)


def conv12(p):
  return jax.lax.conv_general_dilated(
      p.astype(jnp.float32), W12, (1, 1), ((1, 1), (1, 1)),
      dimension_numbers=("NCHW", "OIHW", "NCHW"),
      precision=jax.lax.Precision.HIGHEST)


# interleave kernel: (3, 12, 2, 2) one-hot
def interleave_kernel():
  k = np.zeros((3, 12, 2, 2), np.float32)
  for p, (dy, dx) in enumerate(_PHASE_PARITY):
    for c in range(3):
      k[c, p * 3 + c, 1 - dy, 1 - dx] = 1.0
  return jnp.asarray(k)


KI = interleave_kernel()


def interleave(x12):
  return jax.lax.conv_general_dilated(
      x12, KI, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
      dimension_numbers=("NCHW", "OIHW", "NCHW"))


# fused 6x6 dilated kernel: (3, 4, 6, 6)
def fused_kernel():
  w = np.asarray(W12)  # (12,4,3,3): out=p*3+c, in q, u+1, v+1
  k = np.zeros((3, 4, 6, 6), np.float32)
  for p, (dy, dx) in enumerate(_PHASE_PARITY):
    for c in range(3):
      for q in range(4):
        for u in (-1, 0, 1):
          for v in (-1, 0, 1):
            ky = 3 + 2 * u - dy
            kx = 3 + 2 * v - dx
            k[c, q, ky, kx] += w[p * 3 + c, q, u + 1, v + 1]
  return jnp.asarray(k)


KF = fused_kernel()


def fused_conv(p):
  return jax.lax.conv_general_dilated(
      p.astype(jnp.float32), KF, (1, 1), ((3, 3), (3, 3)),
      lhs_dilation=(2, 2),
      dimension_numbers=("NCHW", "OIHW", "NCHW"))


def check_equivalence():
  rng = np.random.default_rng(0)
  cfa = jnp.asarray(rng.random((1, 64, 96), np.float32))
  hh, wh = 32, 48
  p = cfa.reshape(1, hh, 2, wh, 2).transpose(0, 2, 4, 1, 3).reshape(1, 4, hh, wh)
  x12 = jax.lax.conv_general_dilated(
      p, W12, (1, 1), ((1, 1), (1, 1)),
      dimension_numbers=("NCHW", "OIHW", "NCHW"))
  # reference interleave (transpose path)
  o = x12.reshape(1, 4, 3, hh, wh)
  o = o[:, jnp.array([0, 2, 1, 3])]
  o = o.reshape(1, 2, 2, 3, hh, wh).transpose(0, 4, 1, 5, 2, 3)
  ref = o.reshape(1, 64, 96, 3)
  # candidate: one-hot interleave conv
  il = interleave(x12)  # (1,3,64,96)
  err1 = float(jnp.abs(il.transpose(0, 2, 3, 1) - ref).max())
  # candidate: fused 6x6 dilated conv
  fc = fused_conv(p)
  err2 = float(jnp.abs(fc.transpose(0, 2, 3, 1) - ref).max())
  print(f"interleave-conv max err: {err1:.2e}; fused-conv max err: {err2:.2e}")


def main():
  check_equivalence()
  rng = np.random.default_rng(0)
  cfa = jax.device_put(rng.random((N, H, W), np.float32).astype(jnp.float16))

  # D1: current path — phase conv + 6d transpose to NHWC
  def d1(c):
    x12 = conv12(phases_of(c))
    o = x12.reshape(N, 4, 3, HH, WH)[:, jnp.array([0, 2, 1, 3])]
    o = o.reshape(N, 2, 2, 3, HH, WH).transpose(0, 4, 1, 5, 2, 3)
    return o.reshape(N, H, W, 3).astype(jnp.float16)

  # D2: phase conv + one-hot dilated interleave -> planar NCHW
  def d2(c):
    return interleave(conv12(phases_of(c))).astype(jnp.float16)

  # D3: single fused 6x6 dilated conv -> planar
  def d3(c):
    return fused_conv(phases_of(c)).astype(jnp.float16)

  # D2p: like D2 but stays in phase-planar form (no interleave at all)
  def d2p(c):
    return conv12(phases_of(c)).astype(jnp.float16)

  for name, body in [("D2p phase-form (no interleave)", d2p),
                     ("D2 conv+interleave planar", d2),
                     ("D3 fused dilated conv planar", d3),
                     ("D1 current NHWC transpose", d1)]:
    try:
      f = chain(body)
      comp = f.lower(cfa).compile()
      ma = comp.memory_analysis()
      print(f"  [{name}] temp={ma.temp_size_in_bytes/1e9:.2f} GB")
      timeit(name, f, cfa)
    except Exception as e:
      print(f"  [{name}] FAILED: {str(e)[:200]}")


if __name__ == "__main__":
  main()


def probe_stages():
  """Probe decode12, shift-add demosaic, reinhard in phase-planar form."""
  import numpy as np
  from taichi_image_tpu.ops.packed import decode12_pairs
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, (N, H, W * 3 // 2), np.uint8))
  cfa16 = jax.device_put(rng.random((N, H, W), np.float32).astype(jnp.float16))

  def decode_body(r):
    t = r.reshape(N, -1, 3)
    p0, p1 = decode12_pairs(t[..., 0], t[..., 1], t[..., 2], False)
    out = jnp.stack([p0, p1], axis=-1).reshape(N, H, W)
    return (out.astype(jnp.float32) * jnp.float32(1.0 / 4095.0)).astype(jnp.float16)

  def chain_u8(body):
    def run(x):
      acc = jnp.float32(0)
      for i in range(K):
        out = body(x ^ jnp.uint8(i & 1))
        acc = acc + jnp.sum(out.astype(jnp.float32)) * 1e-9
      return acc
    return jax.jit(run)

  f = chain_u8(decode_body)
  ma = f.lower(raws).compile().memory_analysis()
  print(f"  [decode12] temp={ma.temp_size_in_bytes/1e9:.2f} GB")
  timeit("decode12 -> f16 CFA", f, raws)

  # D5: shift-add stencil demosaic from phase planes (sparse taps)
  w12 = np.asarray(_demosaic_tables(BayerPattern.RGGB, "mhc"))  # (12,4,3,3)

  def d5(c):
    p = phases_of(c).astype(jnp.float32)  # (N,4,hh,wh)
    pad = jnp.pad(p, ((0, 0), (0, 0), (1, 1), (1, 1)))
    outs = []
    for oc in range(12):
      acc = None
      for q in range(4):
        for u in range(3):
          for v in range(3):
            wgt = float(w12[oc, q, u, v])
            if wgt == 0.0:
              continue
            sl = pad[:, q, u:u + HH, v:v + WH]
            term = sl * wgt
            acc = term if acc is None else acc + term
      outs.append(acc)
    return jnp.stack(outs, axis=1).astype(jnp.float16)

  f5 = chain(d5)
  ma = f5.lower(cfa16).compile().memory_analysis()
  print(f"  [D5 shift-add] temp={ma.temp_size_in_bytes/1e9:.2f} GB")
  timeit("D5 shift-add stencil", f5, cfa16)

  # reinhard in phase-planar form (N,12,hh,wh): gray per phase group
  m = jnp.asarray(np.array([0.1, 0.9, -3.0, -0.01, -1.0, 0.5, 0.5, 0.5, 0.5],
                           np.float32))
  x12c = jax.device_put(rng.random((N, 12, HH, WH), np.float32).astype(jnp.float16))

  def reinhard_phase(x):
    xf = x.astype(jnp.float32).reshape(N, 4, 3, HH, WH)
    scaled = (xf - m[0]) / (m[1] - m[0])
    gray = (0.299 * scaled[:, :, 0] + 0.587 * scaled[:, :, 1]
            + 0.114 * scaled[:, :, 2])[:, :, None]
    key = (m[3] - m[4]) / (m[3] - m[2])
    map_key = 0.3 + 0.7 * jnp.power(key, 1.4)
    mean = m[5]
    adapt_mean = mean + 1.0 * (gray + 0.0 * (scaled - gray) - mean)
    adapt = jnp.power(jnp.exp(-1.0) * adapt_mean, map_key)
    p = scaled / (adapt + scaled)
    p = jnp.where(jnp.isnan(p), 0.0, p)
    mo = jnp.maximum(1e-6, jnp.max(p, axis=(1, 2, 3, 4), keepdims=True))
    out = jnp.power(p.astype(jnp.float16).astype(jnp.float32) / mo, 1.0 / 0.6)
    return jnp.clip(255.0 * out, 0, 255).astype(jnp.uint8).reshape(N, 12, HH, WH)

  fr = chain(reinhard_phase)
  ma = fr.lower(x12c).compile().memory_analysis()
  print(f"  [reinhard-phase] temp={ma.temp_size_in_bytes/1e9:.2f} GB")
  timeit("reinhard phase-planar", fr, x12c)


if __name__ == "__main__" and "--stages" in sys.argv:
  probe_stages()
