"""Probe v2: planar phase-plane decode + Pallas demosaic candidates."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from taichi_image_tpu.ops.bayer import _demosaic_tables, BayerPattern

N, H, W = 6, 2160, 3840
HH, WH = H // 2, W // 2
WB = W * 3 // 2
K = 8


def timeit(name, jitted, *args):
  out = jitted(*args)
  v = np.asarray(out)
  reps = 3
  t0 = time.perf_counter()
  for _ in range(reps):
    v = np.asarray(jitted(*args))
  el = (time.perf_counter() - t0) / reps / K
  print(f"{name}: {el*1e3:.2f} ms/iter ({N/el:.0f} f/s) checksum={v:.6f}")
  return el


def chain(body, cast=None):
  def run(x):
    acc = jnp.float32(0)
    for i in range(K):
      if x.dtype == jnp.uint8:
        xi = x ^ jnp.uint8(i & 1)
      else:
        xi = x + jnp.asarray(i, x.dtype)
      out = body(xi)
      leaf = jax.tree.leaves(out)[0]
      acc = acc + jnp.sum(leaf.astype(jnp.float32)) * 1e-9
    return acc
  return jax.jit(run)


def decode_phases(raw):
  """raw (N,H,WB) u8 -> 4 phase planes (N,4,HH,WH) f16, planar ops only."""
  b0 = raw[:, :, 0::3].astype(jnp.uint16)
  b1 = raw[:, :, 1::3].astype(jnp.uint16)
  b2 = raw[:, :, 2::3].astype(jnp.uint16)
  even = ((b1 & 0xF) << 8) | b0          # CFA cols 0,2,4,... (N,H,WH)
  odd = (b2 << 4) | (b1 >> 4)            # CFA cols 1,3,5,...
  scale = jnp.float32(1.0 / 4095.0)
  p00 = even[:, 0::2]
  p10 = even[:, 1::2]
  p01 = odd[:, 0::2]
  p11 = odd[:, 1::2]
  phases = jnp.stack([p00, p01, p10, p11], axis=1)  # in-phase order (sy%2)*2+(sx%2)
  return (phases.astype(jnp.float32) * scale).astype(jnp.float16)


def main():
  rng = np.random.default_rng(0)
  raws = jax.device_put(rng.integers(0, 256, (N, H, WB), np.uint8))

  f = chain(decode_phases)
  ma = f.lower(raws).compile().memory_analysis()
  print(f"  [decode->phases] temp={ma.temp_size_in_bytes/1e9:.2f} GB")
  timeit("decode -> phase planes", f, raws)

  # Pallas demosaic from phase planes
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  w12 = np.asarray(_demosaic_tables(BayerPattern.RGGB, "mhc"))  # (12,4,3,3)
  TR = 64  # output rows per tile (half-res)

  def dm_kernel(p_ref, out_ref):
    # p_ref: (1, 4, TR+2, WH+2) f16 padded; out (1, 12, TR, WH) f16
    acc = [None] * 12
    pf = p_ref[0].astype(jnp.float32)
    for oc in range(12):
      a = None
      for q in range(4):
        for u in range(3):
          for v in range(3):
            wgt = float(w12[oc, q, u, v])
            if wgt == 0.0:
              continue
            sl = pf[q, u:u + TR, v:v + WH]
            t = sl * wgt
            a = t if a is None else a + t
      acc[oc] = a * (1.0 / 16.0)
    out_ref[0] = jnp.stack(acc, axis=0).astype(jnp.float16)

  def dm_pallas(phases):
    # phases (N,4,HH,WH) f16; pad rows and cols by 1
    padded = jnp.pad(phases, ((0, 0), (0, 0), (1, 1), (1, 1)))
    grid = (N, HH // TR)
    return pl.pallas_call(
        dm_kernel,
        out_shape=jax.ShapeDtypeStruct((N, 12, HH, WH), jnp.float16),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 4, TR + 2, WH + 2),
                               lambda n, i: (n, 0, i * TR, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 12, TR, WH),
                               lambda n, i: (n, 0, i * TR, 0),
                               memory_space=pltpu.VMEM),
    )(padded)

  phases0 = decode_phases(raws)

  # correctness vs conv reference (interior)
  W12j = jnp.asarray(w12)
  def conv_ref(p):
    return jax.lax.conv_general_dilated(
        p.astype(jnp.float32), W12j, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST) / 16.0
  small = phases0[:1, :, :64, :128].astype(jnp.float16)
  got = dm_pallas_small = None
  try:
    ref = conv_ref(small).astype(jnp.float16)
    # run pallas on the small input via same code with TR=64, WH matching:
    pad = jnp.pad(small, ((0,0),(0,0),(1,1),(1,1)))
    def k2(p_ref, out_ref):
      pf = p_ref[0].astype(jnp.float32)
      accs = []
      for oc in range(12):
        a = None
        for q in range(4):
          for u in range(3):
            for v in range(3):
              wgt = float(w12[oc, q, u, v])
              if wgt == 0.0: continue
              t = pf[q, u:u+64, v:v+128] * wgt
              a = t if a is None else a + t
        accs.append(a * (1.0/16.0))
      out_ref[0] = jnp.stack(accs, axis=0).astype(jnp.float16)
    got = pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((1,12,64,128), jnp.float16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(pad)
    err = float(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max())
    print(f"pallas demosaic vs conv max err: {err:.2e}")
  except Exception as e:
    print("pallas small check failed:", str(e)[:300])

  try:
    fdm = chain(dm_pallas)
    ma = fdm.lower(phases0).compile().memory_analysis()
    print(f"  [pallas demosaic] temp={ma.temp_size_in_bytes/1e9:.2f} GB")
    timeit("pallas demosaic", fdm, phases0)
  except Exception as e:
    print("pallas demosaic failed:", str(e)[:500])

  # fused: decode + pallas demosaic end to end
  def e2e(r):
    return dm_pallas(decode_phases(r))
  try:
    fe = chain(e2e)
    timeit("decode + pallas demosaic", fe, raws)
  except Exception as e:
    print("e2e failed:", str(e)[:300])


if __name__ == "__main__":
  main()
