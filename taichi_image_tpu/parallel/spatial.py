"""Spatial (intra-frame) sharding: split each image's ROWS across chips
with halo exchange at tile borders.

This is the TPU counterpart of "sequence parallelism" for the ISP
(SURVEY.md §2.9/§5): one 4K frame fits one chip, but larger frames (or
lower latency per frame) split the height axis over the mesh. The 5x5
demosaic stencil needs a 2-pixel halo at full resolution = ONE row of each
half-res phase plane, exchanged with mesh neighbors via ``ppermute``
before the local stencil; metering and the Reinhard per-image max finish
with collectives over the same axis.

Alignment requirements (asserted): rows-per-shard divisible by 8 at full
resolution, so Bayer phase parity and the stride-8 metering grid stay
globally consistent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from taichi_image_tpu import types
from taichi_image_tpu.models.camera_isp import (linear_apply_ca,
                                                metering_update_ca,
                                                reinhard_apply_ca)
from taichi_image_tpu.ops import bayer as bayer_ops
from taichi_image_tpu.ops.bayer import (_demosaic_tables,
                                        edge_renorm_factor,
                                        phases_to_planar)
from taichi_image_tpu.ops.interpolate import ImageTransform
from taichi_image_tpu.models.camera_isp import load_raw_phases

ROW_AXIS = "rows"

__all__ = ["ROW_AXIS", "shard_rows", "make_spatial_isp_step",
           "demosaic_phases_spatial"]


def shard_rows(batch, mesh: Mesh, axis_name: str = ROW_AXIS):
  """Place a (N, H, ...) image batch with the ROW axis sharded."""
  spec = P(None, axis_name) if batch.ndim >= 2 else P(axis_name)
  return jax.device_put(batch, NamedSharding(mesh, spec))


def _exchange_row_halos(phases, axis_name):
  """1-row halo exchange on (N, 4, hh_local, wh): returns the local
  planes padded to hh_local+2 with neighbor rows (zeros at global ends)."""
  idx = jax.lax.axis_index(axis_name)
  n_shards = jax.lax.axis_size(axis_name)
  top_row = phases[:, :, :1, :]      # my first row -> previous neighbor
  bot_row = phases[:, :, -1:, :]     # my last row  -> next neighbor

  # receive from next neighbor (their first row becomes my bottom halo)
  fwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
  bottom_halo = jax.lax.ppermute(top_row, axis_name, fwd)
  # receive from previous neighbor (their last row becomes my top halo)
  bwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
  top_halo = jax.lax.ppermute(bot_row, axis_name, bwd)

  zero = jnp.zeros_like(top_row)
  top_halo = jnp.where(idx == 0, zero, top_halo)
  bottom_halo = jnp.where(idx == n_shards - 1, zero, bottom_halo)
  return jnp.concatenate([top_halo, phases, bottom_halo], axis=2)


def _demosaic_local(phases_local, pattern, cc, method, axis_name):
  """Demosaic a row shard: halo exchange + local stencil + edge renorm
  gated to the GLOBAL top/bottom shards only.

  On TPU the per-shard stencil runs through the Pallas kernel (the XLA
  conv lowering pads channel-minor outputs ~10x; docs/PERFORMANCE.md):
  the exchanged halo rows ride along as input rows 0 and hh_l+1, whose
  output rows are discarded — interior rows see identical neighborhoods
  either way (pinned by tests/test_spatial.py::test_demosaic_local_
  stencil_matches_conv in interpret mode).
  """
  n, _, hh_l, wh = phases_local.shape
  weights = _demosaic_tables(pattern, method)
  padded = _exchange_row_halos(phases_local.astype(jnp.float32), axis_name)

  assert hh_l >= 3, "row shards must have at least 3 half-res rows"
  full = weights.sum(axis=(1, 2, 3))

  from taichi_image_tpu.ops.pallas import demosaic as pallas_dm
  if pallas_dm.pallas_available(hh_l + 2, wh):
    tiles = pallas_dm.tiling_for(hh_l + 2, wh)
    num16 = pallas_dm.demosaic_stencil(padded, weights, *tiles)
    out = num16[:, :, 1:-1, :]
  else:
    num = jax.lax.conv_general_dilated(
        padded, jnp.asarray(weights), (1, 1),
        ((0, 0), (1, 1)),  # rows VALID (halos provide context), cols pad
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    out = num * jnp.asarray(1.0 / full, jnp.float32)[None, :, None, None]

  idx = jax.lax.axis_index(axis_name)
  n_shards = jax.lax.axis_size(axis_name)
  # row strips fire only at the GLOBAL image edges (gated factors)
  out = out * edge_renorm_factor(weights, hh_l, wh,
                                 is_top=(idx == 0),
                                 is_bot=(idx == n_shards - 1))

  if cc is not None:
    ccm = jnp.asarray(np.array(cc, np.float32).reshape(3, 3))
    x = out.reshape(n, 4, 3, hh_l, wh)
    x = jnp.einsum("npchw,dc->npdhw", x, ccm,
                   precision=jax.lax.Precision.HIGHEST)
    out = x.reshape(n, 12, hh_l, wh)
  return jnp.clip(out, 0.0, 1.0)


def demosaic_phases_spatial(phases, mesh: Mesh, pattern, cc=None,
                            method="mhc", axis_name: str = ROW_AXIS):
  """Demosaic (N, 4, hh, wh) phase planes with hh sharded over
  ``axis_name``: halo exchange over ICI + local stencil."""
  local = partial(_demosaic_local, pattern=pattern, cc=cc, method=method,
                  axis_name=axis_name)
  f = jax.shard_map(local, mesh=mesh,
                    in_specs=P(None, None, axis_name, None),
                    out_specs=P(None, None, axis_name, None),
                    check_vma=False)
  return jax.jit(f)(phases)


def make_spatial_isp_step(mesh: Mesh, *, fmt: str = "packed12",
                          ids_format: bool = False, work_dtype,
                          pattern, cc=None, stride: int = 8,
                          tonemap: str = "reinhard",
                          n_cameras: int, image_hw,
                          axis_name: str = ROW_AXIS):
  """Whole-rig fused step with each frame's ROWS sharded across chips.

  step(raws, prev, t, gamma, intensity, light_adapt, color_adapt)
    -> (metrics, planar u8 (N, 3, H, W) row-sharded)

  ``raws`` is (N, H, W_raw) with H sharded. Requires H/n_shards % 8 == 0
  (Bayer parity + metering-grid alignment). Resize and output transforms
  are not supported in spatial mode (reshard first).
  """
  h, w = image_hw
  n_shards = np.prod([mesh.shape[a] for a in
                      ([axis_name] if isinstance(axis_name, str)
                       else axis_name)])
  if (h // n_shards) % 8 != 0:
    raise ValueError(
        f"rows per shard must be a multiple of 8 (Bayer parity + "
        f"metering-grid alignment); got H={h} over {n_shards} shards")
  hs = -(-h // stride)
  ws = -(-w // stride)
  n_total = n_cameras * hs * ws

  def local_step(raws, prev, t, gamma, intensity, light_adapt, color_adapt):
    phases = load_raw_phases(raws, fmt, work_dtype, ids_format)
    x12 = _demosaic_local(phases.astype(jnp.float32), pattern, cc,
                          "mhc", axis_name)
    x12 = x12.astype(types.canonical_dtype(work_dtype))
    n, _, hh_l, wh = x12.shape
    strided = bayer_ops.subsample_hw(x12[:, 0:3], stride // 2, stride // 2)
    metrics = metering_update_ca(strided, prev, t, axis_name=axis_name,
                                 n_total=n_total)
    if tonemap == "reinhard":
      out12 = reinhard_apply_ca(x12.reshape(n, 4, 3, hh_l, wh), metrics,
                                gamma, intensity, light_adapt, color_adapt,
                                work_dtype, axis_name=axis_name)
    else:
      out12 = linear_apply_ca(x12.reshape(n, 4, 3, hh_l, wh), metrics,
                              gamma)
    out = phases_to_planar(out12.reshape(n, 12, hh_l, wh))
    return metrics, out

  sharded = jax.shard_map(
      local_step, mesh=mesh,
      in_specs=(P(None, axis_name), P(), P(), P(), P(), P(), P()),
      out_specs=(P(), P(None, None, axis_name, None)),
      check_vma=False)
  return jax.jit(sharded, donate_argnums=(1,))

def make_grid_isp_step(mesh: Mesh, *, fmt: str = "packed12",
                       ids_format: bool = False, work_dtype,
                       pattern, cc=None, stride: int = 8,
                       tonemap: str = "reinhard",
                       n_cameras: int, image_hw,
                       cam_axis: str = "cam",
                       row_axis: str = ROW_AXIS):
  """Whole-rig fused step over a 2-D mesh: cameras on one axis (data
  parallel) x image rows on the other (spatial parallel with halo
  exchange). The metering collectives reduce over BOTH axes; the
  Reinhard per-image max reduces over the row axis only.

  step(raws, prev, t, gamma, intensity, light_adapt, color_adapt)
    -> (metrics, planar u8 (N, 3, H, W) sharded (cam=N axis, rows=H axis))
  """
  h, w = image_hw
  n_row_shards = mesh.shape[row_axis]
  if (h // n_row_shards) % 8 != 0:
    raise ValueError(
        f"rows per shard must be a multiple of 8 (Bayer parity + "
        f"metering-grid alignment); got H={h} over {n_row_shards} shards")
  hs = -(-h // stride)
  ws = -(-w // stride)
  n_total = n_cameras * hs * ws
  both = (cam_axis, row_axis)

  def local_step(raws, prev, t, gamma, intensity, light_adapt, color_adapt):
    phases = load_raw_phases(raws, fmt, work_dtype, ids_format)
    x12 = _demosaic_local(phases.astype(jnp.float32), pattern, cc,
                          "mhc", row_axis)
    x12 = x12.astype(types.canonical_dtype(work_dtype))
    n, _, hh_l, wh = x12.shape
    strided = bayer_ops.subsample_hw(x12[:, 0:3], stride // 2, stride // 2)
    metrics = metering_update_ca(strided, prev, t, axis_name=both,
                                 n_total=n_total)
    if tonemap == "reinhard":
      out12 = reinhard_apply_ca(x12.reshape(n, 4, 3, hh_l, wh), metrics,
                                gamma, intensity, light_adapt, color_adapt,
                                work_dtype, axis_name=row_axis)
    else:
      out12 = linear_apply_ca(x12.reshape(n, 4, 3, hh_l, wh), metrics,
                              gamma)
    out = phases_to_planar(out12.reshape(n, 12, hh_l, wh))
    return metrics, out

  sharded = jax.shard_map(
      local_step, mesh=mesh,
      in_specs=(P(cam_axis, row_axis), P(), P(), P(), P(), P(), P()),
      out_specs=(P(), P(cam_axis, None, row_axis, None)),
      check_vma=False)
  return jax.jit(sharded, donate_argnums=(1,))
