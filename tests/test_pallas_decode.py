"""Pallas packed12 decode kernel tests (interpret mode on CPU).

The kernel (ops/pallas/decode.decode12_phases_bf16) is the integrated
bf16 decode stage of the TPU pipeline (models/camera_isp.load_raw_phases
routes to it); contract: BIT-IDENTICAL to the XLA formulation.
Reference bit layouts: /root/reference/taichi_image/packed.py:16-20
(standard) and packed.py:51-55 (IDS).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taichi_image_tpu import types
from taichi_image_tpu.models.camera_isp import load_raw_phases
from taichi_image_tpu.ops.pallas import decode as pld


def _xla(raws, ids=False):
  return load_raw_phases(raws, "packed12", types.bf16, ids_format=ids)


@pytest.mark.parametrize("ids", [False, True])
@pytest.mark.parametrize("shape", [(2, 32, 1152), (1, 48, 384),
                                   (3, 64, 2304)])
def test_decode_kernel_bit_identical(shape, ids, rng):
  raws = jnp.asarray(rng.integers(0, 256, size=shape, dtype=np.uint8))
  ref = np.asarray(jax.jit(lambda r: _xla(r, ids))(raws))
  got = np.asarray(jax.jit(lambda r: pld.decode12_phases_bf16(
      r, ids_format=ids, interpret=True))(raws))
  assert got.dtype == ref.dtype == jnp.bfloat16
  assert np.array_equal(ref.view(np.uint16), got.view(np.uint16))


def test_decode_kernel_extremes():
  """All-zero and all-one bytes hit the 0 and 4095 code points."""
  raws = jnp.concatenate([
      jnp.zeros((1, 16, 384), jnp.uint8),
      jnp.full((1, 16, 384), 255, jnp.uint8),
  ])
  got = np.asarray(jax.jit(lambda r: pld.decode12_phases_bf16(
      r, interpret=True))(raws), np.float32)
  assert (got[0] == 0.0).all()
  ref = np.asarray(jax.jit(_xla)(raws), np.float32)
  assert np.array_equal(got, ref)


def test_decode_tiling_contract():
  assert pld.decode_tiling(2160, 5760) == 80  # 6x4K flagship shape
  assert pld.decode_tiling(2160, 5760) % 16 == 0
  assert pld.decode_tiling(32, 1152) == 32
  assert pld.decode_tiling(2160, 5761) is None  # wb not 384-multiple
  assert pld.decode_tiling(8, 384) is None      # too few rows
  assert pld.decode_tiling(4320, 11520) is not None  # 8K full-frame shape
  # spatial row-shards of 4K (1080 = 8*135) have no multiple-of-16
  # divisor; the gate falls back to the XLA decode there
  assert pld.decode_tiling(1080, 11520) is None


def test_decode_route_not_taken_on_cpu(rng):
  """On CPU the gate is closed and load_raw_phases uses the XLA path
  (values identical either way; this pins the gating)."""
  assert not pld.decode_pallas_available(2160, 5760)
  raws = jnp.asarray(rng.integers(0, 256, size=(1, 32, 1152),
                                  dtype=np.uint8))
  out = load_raw_phases(raws, "packed12", types.bf16)
  assert out.shape == (1, 4, 16, 96 * 4 // 1)  # 1152/3 = 384 cols
