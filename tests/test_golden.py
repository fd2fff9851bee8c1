"""Golden-output regression tests.

Deterministic inputs -> stored golden outputs (tests/golden/*.npz),
guarding every future refactor against silent behavior drift
(SURVEY.md §4: golden-parity testing). Regenerate intentionally with:

    python tests/test_golden.py --regen
"""

import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _inputs():
  from conftest import make_test_rgb
  from oracle import rgb_to_bayer_oracle
  img = make_test_rgb(64, 96, seed=7)
  cfa = rgb_to_bayer_oracle(img, "RGGB")
  return img, cfa


def _compute_all():
  import jax.numpy as jnp
  from taichi_image_tpu.ops import bayer, color, interpolate, packed, tonemap
  from taichi_image_tpu.models.camera_isp import Camera32
  from taichi_image_tpu.ops.bayer import BayerPattern

  img, cfa = _inputs()
  out = {}
  out["demosaic_f32"] = np.asarray(
      bayer.bayer_to_rgb(cfa, BayerPattern.RGGB))
  out["demosaic_u8"] = np.asarray(bayer.bayer_to_rgb(
      (cfa * 255).astype(np.uint8), BayerPattern.RGGB))
  out["mosaic"] = np.asarray(bayer.rgb_to_bayer(img, BayerPattern.GRBG))
  raw12 = np.asarray(packed.encode12(cfa, scaled=True))
  out["encode12"] = raw12
  out["decode12_u16"] = np.asarray(packed.decode12(raw12))
  out["tonemap_linear"] = np.asarray(tonemap.tonemap_linear(img * 2,
                                                            gamma=0.8))
  out["tonemap_reinhard"] = np.asarray(
      tonemap.tonemap_reinhard(img * 2, gamma=0.9, intensity=2.0,
                               light_adapt=0.9, color_adapt=0.1))
  out["yuv420"] = np.asarray(color.rgb_yuv420_image(
      (img * 255).astype(np.uint8)))
  out["resize"] = np.asarray(interpolate.resize_bilinear(img, (48, 32),
                                                         0.5))
  isp = Camera32(BayerPattern.RGGB, moving_alpha=0.2)
  raws = np.stack([raw12, raw12])
  out["isp_out"] = np.asarray(isp.process(raws, gamma=0.8, intensity=2.0))
  out["isp_metrics"] = np.asarray(isp.metrics)
  out["isp_out2"] = np.asarray(isp.process(raws, gamma=0.8, intensity=2.0))
  return out


def test_golden_outputs():
  path = GOLDEN / "golden_v1.npz"
  assert path.exists(), "golden fixtures missing — run --regen"
  want = np.load(path)
  got = _compute_all()
  assert set(want.files) == set(got.keys())
  for k in want.files:
    if want[k].dtype.kind == "f":
      np.testing.assert_allclose(got[k], want[k], atol=1e-6,
                                 err_msg=f"golden mismatch: {k}")
    else:
      np.testing.assert_array_equal(got[k], want[k],
                                    err_msg=f"golden mismatch: {k}")


if __name__ == "__main__":
  import sys
  here = pathlib.Path(__file__).resolve().parent
  sys.path.insert(0, str(here))
  sys.path.insert(0, str(here.parent))  # repo root for taichi_image_tpu
  import conftest  # noqa: F401  (forces CPU backend)
  if "--regen" in sys.argv:
    GOLDEN.mkdir(exist_ok=True)
    np.savez_compressed(GOLDEN / "golden_v1.npz", **_compute_all())
    print("regenerated", GOLDEN / "golden_v1.npz")
