"""Probe: Mosaic transcendental + SMEM capabilities (for a Pallas
Reinhard kernel). Same isolated-subprocess harness as probe_mosaic_caps.
"""

import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ONLY = None
H, W = 256, 512


def run(name, fn):
  if ONLY is not None:
    if name != ONLY:
      return
    try:
      out = fn()
      _ = np.asarray(out)
      print(f"PASS {name}", flush=True)
    except Exception as e:
      msg = str(e).split("\n")[0][:140]
      print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
    return
  try:
    r = subprocess.run([sys.executable, __file__, "--only", name],
                       capture_output=True, text=True, timeout=240)
    for line in (r.stdout + r.stderr).splitlines():
      if line.startswith(("PASS", "FAIL")):
        print(line, flush=True)
        return
    print(f"FAIL {name}: no-result rc={r.returncode}", flush=True)
  except subprocess.TimeoutExpired:
    print(f"HANG {name}: compile helper timeout (240s)", flush=True)


def simple(kernel, *xs, out_shape=None):
  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct(out_shape or xs[0].shape,
                                     jnp.float32))(*xs)


def main():
  global ONLY
  if "--only" in sys.argv:
    ONLY = sys.argv[sys.argv.index("--only") + 1]
  xf = (jnp.arange(H * W, dtype=jnp.float32).reshape(H, W) % 251.0
        + 1.0) / 64.0

  def k_exp(x_ref, o_ref):
    o_ref[...] = jnp.exp(x_ref[...])
  run("exp", lambda: simple(k_exp, xf))

  def k_log(x_ref, o_ref):
    o_ref[...] = jnp.log(x_ref[...])
  run("log", lambda: simple(k_log, xf))

  def k_pow(x_ref, o_ref):
    o_ref[...] = jnp.power(x_ref[...], jnp.float32(1.37))
  run("pow_scalar_exponent", lambda: simple(k_pow, xf))

  def k_pow_arr(x_ref, o_ref):
    o_ref[...] = jnp.power(x_ref[...], x_ref[...] * 0.1)
  run("pow_array_exponent", lambda: simple(k_pow_arr, xf))

  def k_div(x_ref, o_ref):
    o_ref[...] = x_ref[...] / (x_ref[...] + 1.0)
  run("divide", lambda: simple(k_div, xf))

  def k_isnan(x_ref, o_ref):
    v = x_ref[...]
    o_ref[...] = jnp.where(jnp.isnan(v / (v - v)), 0.0, v)
  run("isnan_where", lambda: simple(k_isnan, xf))

  # SMEM scalar-vector input
  def k_smem(x_ref, s_ref, o_ref):
    o_ref[...] = x_ref[...] * s_ref[0] + s_ref[1]
  run("smem_scalar_params", lambda: pl.pallas_call(
      k_smem,
      out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)],
  )(xf, jnp.asarray([2.0, 0.5], jnp.float32)))

  # per-image max written to a (1, 128) output block
  def k_maxout(x_ref, o_ref):
    o_ref[...] = jnp.broadcast_to(jnp.max(x_ref[...]), (8, 128))
  run("max_to_8x128_block", lambda: pl.pallas_call(
      k_maxout,
      out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(xf))


if __name__ == "__main__":
  main()
