"""Probe: can the 8K finish run as ONE full-extent stack-interleave
chunk? The 6-d transpose never compiled at 8K extent
(models/large._FINISH_CHUNK_ROWS); the stack form might — race x1 vs
the shipped x2 on the REAL banded driver (process_banded patched chunk
rows), values checked equal.
"""

import sys

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu import types
from taichi_image_tpu.models import large
from taichi_image_tpu.ops.bayer import BayerPattern

N, H, W = 6, 4320, 7680
REPS = 3


def run(label, chunk_rows):
  old = large._FINISH_CHUNK_ROWS
  large._FINISH_CHUNK_ROWS = chunk_rows
  try:
    rng = np.random.default_rng(0)
    raws = jax.device_put(rng.integers(0, 256, size=(N, H, W * 3 // 2),
                                       dtype=np.uint8))
    prev = np.zeros(9, np.float32)

    def go():
      m, out = large.process_banded(raws, prev, 0.0, n_bands=8,
                                    work_dtype=types.bf16,
                                    pattern=BayerPattern.RGGB,
                                    driver="scan")
      s = jax.jit(lambda o: jnp.sum(o, dtype=jnp.float32))
      return float(np.asarray(s(out))), out

    chk, out = go()  # warm
    best = None
    for _ in range(REPS):
      t0 = time.perf_counter()
      chk, out = go()
      el = time.perf_counter() - t0
      best = el if best is None else min(best, el)
    print(f"{label:28} {best * 1000:8.1f} ms/set  chk={chk:.6g}",
          flush=True)
    return out
  except Exception as e:
    print(f"{label:28} FAIL {type(e).__name__}: {str(e)[:100]}",
          flush=True)
    return None
  finally:
    large._FINISH_CHUNK_ROWS = old


def main():
  a = run("shipped x2 (1088 rows)", 1088)
  b = run("x1 (full 2160-row chunk)", 2160)
  if a is not None and b is not None:
    d = int(np.abs(np.asarray(a).astype(int) -
                   np.asarray(b).astype(int)).max())
    print(f"x1-vs-x2 u8 max|d|={d}", flush=True)


if __name__ == "__main__":
  main()
