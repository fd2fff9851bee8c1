"""Demosaic / mosaic parity tests vs the per-pixel numpy oracle
(SURVEY.md §4: golden parity across all 4 patterns x dtypes, PSNR sanity)."""

import numpy as np
import pytest

from taichi_image_tpu.ops import bayer
from conftest import make_test_rgb, psnr
from oracle import bayer_to_rgb_oracle, rgb_to_bayer_oracle

PATTERNS = list(bayer.BayerPattern)


@pytest.mark.parametrize("pattern", PATTERNS)
def test_rgb_to_bayer_vs_oracle(pattern):
  img = (make_test_rgb(32, 48) * 255).astype(np.uint8)
  got = np.asarray(bayer.rgb_to_bayer(img, pattern))
  want = rgb_to_bayer_oracle(img, pattern.name)
  assert np.array_equal(got, want)


@pytest.mark.parametrize("pattern", PATTERNS)
def test_bayer_to_rgb_vs_oracle_u8(pattern):
  img = (make_test_rgb(32, 48) * 255).astype(np.uint8)
  cfa = rgb_to_bayer_oracle(img, pattern.name)
  got = np.asarray(bayer.bayer_to_rgb(cfa, pattern))
  want = bayer_to_rgb_oracle(cfa, pattern.name)
  # float association differences in the conv accumulation can flip a
  # truncating u8 cast by 1 count on exact-integer boundaries
  assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
  assert (got != want).mean() < 0.02


@pytest.mark.parametrize("dtype", [np.uint16, np.float32, np.float16])
def test_bayer_to_rgb_dtypes(dtype):
  img = make_test_rgb(32, 32)
  scale = {np.uint16: 65535, np.float32: 1.0, np.float16: 1.0}[dtype]
  src = (img * scale).astype(dtype)
  cfa = rgb_to_bayer_oracle(src, "RGGB")
  got = np.asarray(bayer.bayer_to_rgb(cfa, bayer.BayerPattern.RGGB))
  want = bayer_to_rgb_oracle(cfa, "RGGB")
  np.testing.assert_allclose(got.astype(np.float64) / scale,
                             want.astype(np.float64) / scale, atol=2e-3)


def test_bayer_to_rgb_f32_exact_vs_oracle():
  img = make_test_rgb(48, 64)
  cfa = rgb_to_bayer_oracle(img, "RGGB")
  got = np.asarray(bayer.bayer_to_rgb(cfa, bayer.BayerPattern.RGGB))
  want = bayer_to_rgb_oracle(cfa, "RGGB")
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_borders_renormalized():
  # constant image must demosaic to the same constant right to the edges —
  # only true if dropped taps are renormalized (reference bayer.py:145-151)
  cfa = np.full((16, 16), 0.5, np.float32)
  rgb = np.asarray(bayer.bayer_to_rgb(cfa, bayer.BayerPattern.RGGB))
  np.testing.assert_allclose(rgb, 0.5, atol=1e-6)


@pytest.mark.parametrize("pattern", PATTERNS)
def test_color_correction_fused(pattern):
  img = make_test_rgb(24, 24)
  cfa = rgb_to_bayer_oracle(img, pattern.name)
  cc = np.array([[1.5, -0.2, -0.3], [-0.1, 1.2, -0.1], [0.0, -0.4, 1.4]])
  got = np.asarray(bayer.bayer_to_rgb(cfa, pattern, correct_colors=cc))
  want = bayer_to_rgb_oracle(cfa, pattern.name, correct_colors=cc)
  np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("pattern", PATTERNS)
def test_mosaic_demosaic_psnr(pattern):
  img = make_test_rgb(96, 128)
  cfa = np.asarray(bayer.rgb_to_bayer(img, pattern))
  rgb = np.asarray(bayer.bayer_to_rgb(cfa, pattern))
  # MHC on a smooth synthetic image should reconstruct well
  assert psnr(rgb, img) > 35, f"PSNR too low for {pattern}"


def test_bilinear_method_psnr():
  img = make_test_rgb(96, 128)
  cfa = np.asarray(bayer.rgb_to_bayer(img, bayer.BayerPattern.RGGB))
  rgb = np.asarray(bayer.bayer_to_rgb(cfa, bayer.BayerPattern.RGGB,
                                      method="bilinear"))
  assert psnr(rgb, img) > 30
  # MHC should beat bilinear on the same image
  mhc = np.asarray(bayer.bayer_to_rgb(cfa, bayer.BayerPattern.RGGB))
  assert psnr(mhc, img) > psnr(rgb, img)


def test_bilinear_constant_edges():
  cfa = np.full((16, 20), 0.25, np.float32)
  rgb = np.asarray(bayer.bayer_to_rgb(cfa, bayer.BayerPattern.RGGB,
                                      method="bilinear"))
  np.testing.assert_allclose(rgb, 0.25, atol=1e-6)


def test_batch_matches_single():
  img = make_test_rgb(32, 32)
  cfa = np.stack([rgb_to_bayer_oracle(img, "RGGB"),
                  rgb_to_bayer_oracle(img[::-1].copy(), "RGGB")])
  batch = np.asarray(bayer.bayer_to_rgb_batch(cfa, bayer.BayerPattern.RGGB))
  single0 = np.asarray(bayer.bayer_to_rgb(cfa[0], bayer.BayerPattern.RGGB))
  single1 = np.asarray(bayer.bayer_to_rgb(cfa[1], bayer.BayerPattern.RGGB))
  np.testing.assert_array_equal(batch[0], single0)
  np.testing.assert_array_equal(batch[1], single1)


def test_asserts():
  with pytest.raises(ValueError):
    bayer.bayer_to_rgb(np.zeros((5, 4), np.uint8))
  with pytest.raises(ValueError):
    bayer.bayer_to_rgb(np.zeros((4, 4, 3), np.uint8))
  with pytest.raises(ValueError):
    bayer.rgb_to_bayer(np.zeros((4, 4), np.uint8))


def test_bayer_to_rgb_i16():
  img = make_test_rgb(32, 32)
  cfa = (rgb_to_bayer_oracle(img, "RGGB") * 32767).astype(np.int16)
  got = np.asarray(bayer.bayer_to_rgb(cfa, bayer.BayerPattern.RGGB,
                                      dtype=np.float32))
  want = bayer_to_rgb_oracle(cfa, "RGGB", out_dtype=np.float32)
  np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("shape", [(4, 4), (4, 8), (8, 4), (6, 6)])
def test_tiny_images_exact(shape):
  # wh == 2 exercises the corner-override path of the separable edge
  # renormalization (every border column is a corner)
  h, w = shape
  rng = np.random.default_rng(3)
  cfa = rng.random((h, w)).astype(np.float32)
  got = np.asarray(bayer.bayer_to_rgb(cfa, bayer.BayerPattern.RGGB))
  want = bayer_to_rgb_oracle(cfa, "RGGB")
  np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("shape,sr,sc", [((2, 3, 32, 64), 4, 4),
                                         ((1, 12, 24, 48), 2, 8),
                                         ((2, 3, 30, 50), 4, 4),
                                         ((5, 13), 3, 5)])
def test_subsample_hw_matches_strided_slice(shape, sr, sc, rng):
  """subsample_hw == x[..., ::sr, ::sc] exactly, including non-divisible
  shapes (which take the strided-slice fallback)."""
  import jax.numpy as jnp
  from taichi_image_tpu.ops.bayer import subsample_hw
  x = jnp.asarray(rng.random(shape), jnp.float32)
  ref = np.asarray(x)[..., ::sr, ::sc]
  got = np.asarray(subsample_hw(x, sr, sc))
  assert np.array_equal(ref, got)


@pytest.mark.parametrize("dtype", ["uint8", "float32", "bfloat16"])
def test_phases_to_planar_stack_bitwise(dtype, rng):
  """The stack-interleave form (round 4: the 8K finish's measured-fast
  formulation) is BITWISE the 6-d transpose form, and round-trips
  through planar_to_phases."""
  import jax.numpy as jnp
  from taichi_image_tpu.ops.bayer import (phases_to_planar,
                                          phases_to_planar_stack,
                                          planar_to_phases)
  x = jnp.asarray((rng.random((2, 12, 6, 10)) * 255), jnp.float32)
  x = x.astype(dtype)
  a = np.asarray(phases_to_planar(x))
  b = np.asarray(phases_to_planar_stack(x))
  assert a.dtype == b.dtype and np.array_equal(a, b)
  back = np.asarray(planar_to_phases(jnp.asarray(b)))
  assert np.array_equal(back, np.asarray(x))
