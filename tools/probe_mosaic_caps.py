"""Probe: axon Mosaic toolchain capability matrix.

Round-1 findings (docs/PERFORMANCE.md): f32-only kernels, no strided lane
slices, no f16/int ops. Re-verify each capability in isolation — the
fused-decode architecture depends on exactly which of these hold.

Unsupported-dtype compiles can HANG the axon compile helper (not just
500), so when run without --only, each capability executes in a
subprocess with a timeout.
"""

import functools
import subprocess
import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ONLY = None


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
  # parent mode: isolate in a subprocess with a timeout
  try:
    r = subprocess.run([sys.executable, __file__, "--only", name],
                       capture_output=True, text=True, timeout=240)
    out = (r.stdout + r.stderr)
    for line in out.splitlines():
      if line.startswith(("PASS", "FAIL")):
        print(line, flush=True)
        return
    print(f"FAIL {name}: no-result rc={r.returncode}", flush=True)
  except subprocess.TimeoutExpired:
    print(f"HANG {name}: compile helper timeout (240s)", flush=True)


H, W = 256, 512


def simple_call(kernel, x, out_dtype=jnp.float32, out_shape=None):
  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct(out_shape or x.shape, out_dtype),
  )(x)


def main():
  global ONLY
  if "--only" in sys.argv:
    ONLY = sys.argv[sys.argv.index("--only") + 1]
  xf = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W) % 251.0
  xu8 = (jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) % 251).astype(
      jnp.uint8)
  xu16 = (jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) % 4096).astype(
      jnp.uint16)
  xi32 = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) % 4096

  # 0. sanity: plain f32 copy (must pass or the harness itself is broken)
  def k_copy(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0
  run("f32_sanity_copy", lambda: simple_call(k_copy, xf))

  # 1. u8 input -> f32 out (convert in kernel)
  def k_u8(x_ref, o_ref):
    o_ref[...] = x_ref[...].astype(jnp.float32)
  run("u8_in_convert_f32", lambda: simple_call(k_u8, xu8))

  # 2. u16 input -> f32 out
  run("u16_in_convert_f32", lambda: simple_call(k_u8, xu16))

  # 3. i32 input + integer ops -> f32
  def k_i32(x_ref, o_ref):
    v = x_ref[...]
    o_ref[...] = ((v >> 4) | (v & 0xF)).astype(jnp.float32)
  run("i32_in_shift_ops", lambda: simple_call(k_i32, xi32))

  # 4. f32 -> u8 output cast
  def k_to_u8(x_ref, o_ref):
    o_ref[...] = x_ref[...].astype(jnp.uint8)
  run("f32_to_u8_out", lambda: simple_call(k_to_u8, xf, jnp.uint8))

  # 5. f32 -> f16 out
  def k_to_f16(x_ref, o_ref):
    o_ref[...] = x_ref[...].astype(jnp.float16)
  run("f32_to_f16_out", lambda: simple_call(k_to_f16, xf, jnp.float16))

  # 6. f32 -> bf16 out
  def k_to_bf16(x_ref, o_ref):
    o_ref[...] = x_ref[...].astype(jnp.bfloat16)
  run("f32_to_bf16_out", lambda: simple_call(k_to_bf16, xf, jnp.bfloat16))

  # 7. bf16 input -> f32
  run("bf16_in_convert_f32",
      lambda: simple_call(k_u8, xf.astype(jnp.bfloat16)))

  # 8. in-kernel dot (MXU) f32
  def k_dot(x_ref, s_ref, o_ref):
    o_ref[...] = jnp.dot(x_ref[...], s_ref[...],
                         preferred_element_type=jnp.float32)
  s = jnp.eye(W, dtype=jnp.float32)
  run("f32_dot_mxu", lambda: pl.pallas_call(
      k_dot, out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32))(xf, s))

  # 9. sublane stride-2 slice
  def k_substride(x_ref, o_ref):
    o_ref[...] = x_ref[0::2, :]
  run("sublane_stride2", lambda: pl.pallas_call(
      k_substride,
      out_shape=jax.ShapeDtypeStruct((H // 2, W), jnp.float32))(xf))

  # 10. lane stride-2 slice
  def k_lanestride(x_ref, o_ref):
    o_ref[...] = x_ref[:, 0::2]
  run("lane_stride2", lambda: pl.pallas_call(
      k_lanestride,
      out_shape=jax.ShapeDtypeStruct((H, W // 2), jnp.float32))(xf))

  # 11. unaligned (non-128) static lane slice
  def k_laneoff(x_ref, o_ref):
    o_ref[...] = x_ref[:, 3:3 + 128]
  run("lane_offset_static3", lambda: pl.pallas_call(
      k_laneoff,
      out_shape=jax.ShapeDtypeStruct((H, 128), jnp.float32))(xf))

  # 12. u8 DMA: pl.ANY input, async copy into u8 VMEM scratch, convert
  def k_dma_u8(x_hbm, o_ref, scratch, sem):
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(0, H), :], scratch, sem)
    cp.start()
    cp.wait()
    o_ref[...] = scratch[...].astype(jnp.float32)
  run("u8_dma_convert", lambda: pl.pallas_call(
      k_dma_u8,
      out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      scratch_shapes=[pltpu.VMEM((H, W), jnp.uint8),
                      pltpu.SemaphoreType.DMA],
  )(xu8))

  # 13. dynamic sublane offset read (pl.ds with traced start)
  def k_dyn(x_ref, i_ref, o_ref):
    start = i_ref[0]
    o_ref[...] = x_ref[pl.ds(start, H // 2), :]
  run("dynamic_sublane_ds", lambda: pl.pallas_call(
      k_dyn,
      out_shape=jax.ShapeDtypeStruct((H // 2, W), jnp.float32),
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)],
  )(xf, jnp.array([4], jnp.int32)))

  # 14. f32 bitcast to i32 + shifts
  def k_bitcast(x_ref, o_ref):
    v = pltpu.bitcast(x_ref[...], jnp.int32)
    o_ref[...] = (v >> 8).astype(jnp.float32)
  run("f32_bitcast_i32_shift", lambda: simple_call(k_bitcast, xf))

  # 15. strided DMA (sublane stride in async copy src)
  def k_dma_strided(x_hbm, o_ref, scratch, sem):
    cp = pltpu.make_async_copy(x_hbm.at[0::2, :], scratch, sem)
    cp.start()
    cp.wait()
    o_ref[...] = scratch[...]
  run("strided_sublane_dma", lambda: pl.pallas_call(
      k_dma_strided,
      out_shape=jax.ShapeDtypeStruct((H // 2, W), jnp.float32),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      scratch_shapes=[pltpu.VMEM((H // 2, W), jnp.float32),
                      pltpu.SemaphoreType.DMA],
  )(xf))

  # 16. f16 input
  run("f16_in_convert_f32", lambda: simple_call(k_u8, xf.astype(jnp.float16)))

  # 17. iota + comparison + select (needed for parity masks)
  def k_iota(x_ref, o_ref):
    r = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    o_ref[...] = jnp.where((r % 2) == 0, x_ref[...], -x_ref[...])
  run("iota_mod_select", lambda: simple_call(k_iota, xf))

  # 18. in-kernel reduction to (1,1) output block
  def k_red(x_ref, o_ref):
    o_ref[0, 0] = jnp.max(x_ref[...])
  run("reduce_to_scalar", lambda: pl.pallas_call(
      k_red, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))(xf))


if __name__ == "__main__":
  main()
