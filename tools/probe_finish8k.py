"""Probe: the Pallas finish kernel vs the shipped chunked XLA finish.

Round-4 finish attribution (docs/PERFORMANCE.md): the 8K gamma+quantize
+interleave finish runs as two <=1088-row chunk programs whose
stack-interleave family moves ~70 GB/s — ~25 ms of the flat driver's
67 ms/set. ops/pallas/finish does the whole finish as ONE manual-DMA
kernel (one-hot MXU interleave + additive i32 byte pack). This probe,
at 6x8K on chip:

  chunks   the shipped _banded_scan_finish_chunk pair + concat
  kernel   finish_planar_u8 (one pallas program + bitcast/reshape)
  value    bitwise check kernel vs chunks (gamma=1 and gamma=2.2)

and the full flat driver with each finish form.
"""

import sys

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu.models import large
from taichi_image_tpu.ops.pallas import finish as pl_fin

N, H, W = 6, 4320, 7680
HH, WH = H // 2, W // 2
REPS = 5


def main():
  rng = np.random.default_rng(0)
  p = jax.device_put(jnp.asarray(
      rng.random((N, 12, HH, WH), np.float32) * 1.1, jnp.bfloat16))
  metrics = jnp.asarray([0.02, 0.98, -5.0, 0.0, -2.0, 0.3, 0.3, 0.3,
                         0.3], jnp.float32)
  max_out = jnp.asarray(
      rng.random((N, 1, 1, 1)).astype(np.float32) * 0.3 + 0.8)

  chunks = large.band_plan_rows(HH, -(-HH // large._FINISH_CHUNK_ROWS), 1)
  print("chunks:", chunks, "tiling:", pl_fin.finish_tiling(HH, WH),
        flush=True)

  def run_chunks(pp, gamma):
    outs = [large._banded_scan_finish_chunk(pp, metrics, max_out,
                                            "reinhard", gamma, "rgb",
                                            True, r0, r1)
            for (r0, r1) in chunks]
    return jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]

  kern = {}
  for g in (1.0, 2.2):
    kern[g] = jax.jit(lambda pp, g=g: pl_fin.finish_planar_u8(
        pp, max_out, "reinhard", g))

  s_u8 = jax.jit(lambda o: jnp.sum(o, dtype=jnp.float32))

  # ---- value check ----
  for g in (1.0, 2.2):
    try:
      a = np.asarray(run_chunks(p, g))
      b = np.asarray(kern[g](p))
    except Exception as e:
      print(f"value g={g} FAIL {type(e).__name__}: {str(e)[:200]}",
            flush=True)
      return
    eq = (a == b).mean()
    md = int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max())
    print(f"value g={g}: bitwise={bool((a == b).all())} "
          f"frac_eq={eq:.6f} max|d|={md}", flush=True)

  # ---- timing ----
  def timed(name, fn):
    fn(p).block_until_ready()
    best = None
    for _ in range(REPS):
      t0 = time.perf_counter()
      _ = float(np.asarray(s_u8(fn(p))))
      el = time.perf_counter() - t0
      best = el if best is None else min(best, el)
    print(f"{name:28} {best * 1000.0:9.2f} ms", flush=True)

  timed("chunks g=1.0", lambda pp: run_chunks(pp, 1.0))
  timed("kernel g=1.0", kern[1.0])
  timed("chunks g=2.2", lambda pp: run_chunks(pp, 2.2))
  timed("kernel g=2.2", kern[2.2])


if __name__ == "__main__":
  main()
