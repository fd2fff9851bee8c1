"""Probe v7: demosaic kernel variants — shared slices, tile-size scan."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taichi_image_tpu.ops.bayer import _demosaic_tables, BayerPattern

N, H, W = 6, 2160, 3840
HH, WH = H // 2, W // 2
K = 8
w12 = np.asarray(_demosaic_tables(BayerPattern.RGGB, "mhc"))


def timeit(name, jitted, *args):
  v = np.asarray(jitted(*args))
  reps = 3
  t0 = time.perf_counter()
  for _ in range(reps):
    v = np.asarray(jitted(*args))
  el = (time.perf_counter() - t0) / reps / K
  print(f"{name}: {el*1e3:.2f} ms/iter ({N/el:.0f} f/s) checksum={v:.6f}")
  return el


def chain(body):
  def run(x):
    acc = jnp.float32(0)
    for i in range(K):
      out = body(x + jnp.float32(i) * 1e-12)
      acc = acc + jnp.sum(out) * 1e-9
    return acc
  return jax.jit(run)


def make_dm(tr, tw, shared=True):
  """Manual-DMA halo kernel, shared-slice accumulation."""
  HALO_R = 4
  HALO_C = 128
  nb, nc = HH // tr, WH // tw

  def kernel(hbm_ref, out_ref):
    n, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    def body(scratch, sem):
      dma = pltpu.make_async_copy(
          hbm_ref.at[n, :, pl.ds(i * tr, tr + 2 * HALO_R),
                     pl.ds(j * tw, tw + 2 * HALO_C)],
          scratch, sem)
      dma.start()
      dma.wait()
      accs = [None] * 12
      if shared:
        for q in range(4):
          for u in range(3):
            for v in range(3):
              ocs = [oc for oc in range(12) if w12[oc, q, u, v] != 0.0]
              if not ocs:
                continue
              s = scratch[q, HALO_R - 1 + u:HALO_R - 1 + u + tr,
                          HALO_C - 1 + v:HALO_C - 1 + v + tw]
              for oc in ocs:
                t = s * float(w12[oc, q, u, v])
                accs[oc] = t if accs[oc] is None else accs[oc] + t
      else:
        for oc in range(12):
          for q in range(4):
            for u in range(3):
              for v in range(3):
                wgt = float(w12[oc, q, u, v])
                if wgt == 0.0:
                  continue
                t = scratch[q, HALO_R - 1 + u:HALO_R - 1 + u + tr,
                            HALO_C - 1 + v:HALO_C - 1 + v + tw] * wgt
                accs[oc] = t if accs[oc] is None else accs[oc] + t
      for oc in range(12):
        out_ref[0, oc] = accs[oc] * (1.0 / 16.0)

    pl.run_scoped(body,
                  scratch=pltpu.VMEM((4, tr + 2 * HALO_R, tw + 2 * HALO_C),
                                     jnp.float32),
                  sem=pltpu.SemaphoreType.DMA)

  def dm(phases):
    padded = jnp.pad(phases,
                     ((0, 0), (0, 0), (HALO_R, HALO_R), (HALO_C, HALO_C)))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 12, HH, WH), jnp.float32),
        grid=(N, nb, nc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 12, tr, tw),
                               lambda n, i, j: (n, 0, i, j),
                               memory_space=pltpu.VMEM),
    )(padded)

  return dm


def conv_x(phases):
  return jax.lax.conv_general_dilated(
      phases, jnp.asarray(w12), (1, 1), ((1, 1), (1, 1)),
      dimension_numbers=("NCHW", "OIHW", "NCHW"),
      precision=jax.lax.Precision.HIGHEST) / 16.0


def main():
  rng = np.random.default_rng(0)
  phases = jax.device_put(rng.random((N, 4, HH, WH), np.float32))
  ref = conv_x(phases)
  for tr, tw, shared in [(120, 640, True), (120, 384, True), (216, 384, True),
                         (54, 1920, True), (120, 640, False)]:
    if HH % tr or WH % tw:
      print(f"skip {tr}x{tw}")
      continue
    try:
      dm = make_dm(tr, tw, shared)
      got = dm(phases)
      err = float(jnp.abs(got - ref).max())
      tag = "shared" if shared else "naive"
      assert err < 1e-5, err
      timeit(f"pallas {tag} {tr}x{tw}", chain(dm), phases)
    except Exception as e:
      print(f"{tr}x{tw}: FAIL {str(e).splitlines()[0][:140]}")


if __name__ == "__main__":
  main()
