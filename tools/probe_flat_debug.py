"""Debug: where do the flat and loop drivers diverge on chip?

Compares, at the verify_tpu failing shape (2, 128, 768) stride=2 cc set:
  1. decoded phases: XLA load_raw_phases vs pallas decode12 (bitwise?)
  2. x12: full-frame stencil vs per-band stencil (max diff)
  3. samples: kernel emission vs subsample of x12 (bitwise?)
  4. metrics from each
"""

import sys

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu import types
from taichi_image_tpu.models import large
from taichi_image_tpu.models.camera_isp import (load_raw_phases,
                                                metering_update_ca)
from taichi_image_tpu.ops.bayer import (BayerPattern, demosaic_phases,
                                        subsample_hw)
from taichi_image_tpu.ops.pallas import decode as pl_decode

rng = np.random.default_rng(0)
raws = jax.device_put(rng.integers(0, 256, size=(2, 128, 768),
                                   dtype=np.uint8))
cc = tuple(np.array([[1.2, -0.1, 0.0], [-0.05, 1.1, -0.05],
                     [0.0, -0.1, 1.3]], np.float32).ravel())
prev = np.zeros(9, np.float32)

ph_x = jax.jit(lambda r: load_raw_phases(r, "packed12", types.bf16))(raws)
ph_p = jax.jit(pl_decode.decode12_phases_bf16)(raws)
print("phases bitwise:", np.array_equal(np.asarray(ph_x).view(np.uint16),
                                        np.asarray(ph_p).view(np.uint16)))


@jax.jit
def full(ph):
  return demosaic_phases(ph, BayerPattern.RGGB, cc=cc,
                         out_dtype=types.bf16, backend="pallas",
                         sample_step=1)


x12_f, samp_f = full(ph_p)
x12f = np.asarray(x12_f, np.float32)
sampf = np.asarray(samp_f, np.float32)

# subsample of the full-frame x12 (sq=1 -> channels 0:3 whole)
sub = np.asarray(subsample_hw(x12_f[:, 0:3], 1, 1), np.float32)
print("kernel sample emission == subsample(x12):",
      np.array_equal(sampf, sub),
      "max|d|:", np.abs(sampf - sub).max())

# per-band stencil (the loop driver's path)
from taichi_image_tpu.models.large import _band_demosaic
raws_p = jnp.pad(raws, ((0, 0), (2, 2), (0, 0)))
bands_x, samples = [], []
for i, (r0, r1) in enumerate(large.band_plan(64, 2, 2)):
  raw_band = raws_p[:, 2 * r0:2 * r1 + 4]
  x12, sample = _band_demosaic(raw_band, "packed12", False, types.bf16,
                               BayerPattern.RGGB, cc, 2,
                               is_top=(i == 0), is_bot=(i == 1))
  bands_x.append(np.asarray(x12, np.float32))
  samples.append(np.asarray(sample, np.float32))
x12_l = np.concatenate(bands_x, axis=2)
samp_l = np.concatenate(samples, axis=2)
print("x12 flat==loop bitwise:", np.array_equal(x12f, x12_l),
      "max|d|:", np.abs(x12f - x12_l).max())
d = np.abs(x12f - x12_l)
if d.max() > 0:
  idx = np.unravel_index(np.argmax(d), d.shape)
  print("  worst at", idx, x12f[idx], x12_l[idx])
  rows = np.unique(np.nonzero(d)[2])
  print("  rows with diffs:", rows[:20], "... count", rows.size)
print("samples flat==loop bitwise:", np.array_equal(sampf, samp_l),
      "max|d|:", np.abs(sampf - samp_l).max())

m_f = metering_update_ca(jnp.asarray(sampf.astype(np.float32)), prev,
                         jnp.float32(0.0), n_total=sampf[:, 0].size)
m_l = metering_update_ca(jnp.asarray(samp_l.astype(np.float32)), prev,
                         jnp.float32(0.0), n_total=samp_l[:, 0].size)
print("metrics max|d| (same program):",
      np.abs(np.asarray(m_f) - np.asarray(m_l)).max())
