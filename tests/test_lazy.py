"""Lazy PlanarImage handles: the per-image legacy API (reference
camera_isp.py:318-403 call pattern) defers decode so batch consumers run
one program; values must be unchanged vs eager forcing, and the fused
fast path must agree with the staged path.
"""

import numpy as np

from taichi_image_tpu.models.camera_isp import Camera32, CameraBF16
from taichi_image_tpu.ops import bayer
from test_isp import load_test_image


def _maxdiff(a, b):
  return np.abs(np.asarray(a).astype(int) - np.asarray(b).astype(int)).max()


def test_lazy_handle_defers_and_matches_eager():
  raw, _ = load_test_image(64, 96)
  isp = Camera32(bayer.BayerPattern.RGGB)
  img = isp.load_packed12(raw)
  # unforced: shape/dtype/repr available without running the decode
  assert img._lazy is not None and img._phases is None
  assert img.shape == (64, 96, 3)
  assert "lazy" in repr(img)
  assert img._lazy is not None  # still unforced after metadata access
  eager = np.asarray(img)  # forces a single-image decode
  assert img._lazy is None and img._phases is not None

  # batched decode (via update_metering) must produce identical values
  isp2 = Camera32(bayer.BayerPattern.RGGB)
  imgs = [isp2.load_packed12(raw) for _ in range(3)]
  isp2.update_metering(imgs)
  assert all(im._lazy is None for im in imgs)  # decoded as one batch
  assert imgs[1]._batch is not None
  np.testing.assert_array_equal(eager, np.asarray(imgs[1]))
  assert imgs[1]._batch is None  # forcing sliced it out


def test_shared_batch_reused_across_calls():
  raw, _ = load_test_image(64, 96)
  isp = Camera32(bayer.BayerPattern.RGGB)
  imgs = [isp.load_packed12(raw) for _ in range(2)]
  isp.update_metering(imgs)
  parent = imgs[0]._batch[1]
  isp.update_metering(imgs)  # second call must reuse the batch array
  assert imgs[0]._batch is not None and imgs[0]._batch[1] is parent


def test_fused_fast_path_matches_staged():
  """tonemap_reinhard over unforced lazy handles runs the fused step;
  forcing the handles first runs the staged (metering + phase tonemap)
  path. Outputs and EMA state must agree."""
  raw, _ = load_test_image(64, 96)

  staged = Camera32(bayer.BayerPattern.RGGB, moving_alpha=0.2)
  si = [staged.load_packed12(raw) for _ in range(2)]
  for im in si:
    im._force()
  so = staged.tonemap_reinhard(si, gamma=0.8, intensity=2.0)

  fused = Camera32(bayer.BayerPattern.RGGB, moving_alpha=0.2)
  fi = [fused.load_packed12(raw) for _ in range(2)]
  assert all(im._lazy is not None for im in fi)
  fo = fused.tonemap_reinhard(fi, gamma=0.8, intensity=2.0)
  assert all(im._lazy is not None for im in fi)  # inputs stay lazy

  np.testing.assert_allclose(np.asarray(staged.metrics),
                             np.asarray(fused.metrics), atol=1e-5)
  for a, b in zip(so, fo):
    assert _maxdiff(a, b) <= 1

  # EMA round 2 through both paths
  so2 = staged.tonemap_reinhard(si, gamma=0.8, intensity=2.0)
  fo2 = fused.tonemap_reinhard(fi, gamma=0.8, intensity=2.0)
  np.testing.assert_allclose(np.asarray(staged.metrics),
                             np.asarray(fused.metrics), atol=1e-5)
  assert _maxdiff(so2[0], fo2[0]) <= 1


def test_fused_fast_path_linear_and_bf16():
  raw, _ = load_test_image(64, 96)
  for cls in (Camera32, CameraBF16):
    staged = cls(bayer.BayerPattern.RGGB)
    si = [staged.load_packed12(raw) for _ in range(2)]
    for im in si:
      im._force()
    so = staged.tonemap_linear(si, gamma=0.9)
    fused = cls(bayer.BayerPattern.RGGB)
    fi = [fused.load_packed12(raw) for _ in range(2)]
    fo = fused.tonemap_linear(fi, gamma=0.9)
    np.testing.assert_allclose(np.asarray(staged.metrics),
                               np.asarray(fused.metrics), atol=1e-5)
    assert _maxdiff(so[0], fo[0]) <= 1


def test_lazy_captures_loader_config():
  """set() between load and tonemap must not change already-loaded
  images (the reference loaders bake WB/CCM in eagerly,
  camera_isp.py:360-369) — lazy handles capture the load-time args."""
  raw, _ = load_test_image(64, 96)

  lazy = Camera32(bayer.BayerPattern.RGGB, correct_colors=True)
  li = lazy.load_packed12(raw)
  lazy.set(white_balance=[1.0, 1.0, 1.0])
  lo = np.asarray(lazy.tonemap_reinhard([li])[0])

  eager = Camera32(bayer.BayerPattern.RGGB, correct_colors=True)
  ei = eager.load_packed12(raw)
  np.asarray(ei)  # force with the original WB
  eager.set(white_balance=[1.0, 1.0, 1.0])
  eo = np.asarray(eager.tonemap_reinhard([ei])[0])

  assert _maxdiff(lo, eo) <= 1


def test_mixed_batch_falls_back_to_staged():
  raw, _ = load_test_image(64, 96)
  isp = Camera32(bayer.BayerPattern.RGGB)
  a = isp.load_packed12(raw)
  b = isp.load_packed12(raw)
  np.asarray(a)  # force one -> batch is mixed, staged path
  outs = isp.tonemap_reinhard([a, b])
  assert len(outs) == 2
  np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))


def test_lazy_resize_width_shape_and_values():
  raw, _ = load_test_image(64, 96)
  isp = Camera32(bayer.BayerPattern.RGGB, resize_width=48)
  img = isp.load_packed12(raw)
  assert img.shape == (32, 48, 3)  # plan-derived, no forcing
  assert img._lazy is not None
  out = isp.tonemap_reinhard([img])[0]
  assert np.asarray(out).shape == (32, 48, 3)

  eager = Camera32(bayer.BayerPattern.RGGB, resize_width=48)
  ei = eager.load_packed12(raw)
  np.asarray(ei)
  eo = eager.tonemap_reinhard([ei])[0]
  assert _maxdiff(out, eo) <= 1
