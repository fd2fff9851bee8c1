"""Debug/validation mode tests (SURVEY.md §5; reference analogue:
--debug -> ti.init(debug=True), test/arguments.py:7,27)."""

import numpy as np
import pytest

from taichi_image_tpu.models.camera_isp import Camera32
from taichi_image_tpu.ops.bayer import BayerPattern
from taichi_image_tpu.utils import debug as debug_util


def _raws(n=2, h=16, w=24):
  rng = np.random.default_rng(0)
  return rng.integers(0, 256, size=(n, h, w * 3 // 2), dtype=np.uint8)


# --- always-on raw validation ----------------------------------------------

def test_validate_raw_accepts_good_batch():
  debug_util.validate_raw(_raws(), "packed12")


def test_validate_raw_rejects_bad_stride():
  raws = np.zeros((2, 16, 35), np.uint8)  # 35 % 3 != 0
  with pytest.raises(ValueError, match="multiple of 3"):
    debug_util.validate_raw(raws, "packed12")


def test_validate_raw_rejects_wrong_ndim():
  with pytest.raises(ValueError, match="3-D"):
    debug_util.validate_raw(np.zeros((16, 36), np.uint8), "packed12")


def test_validate_raw_rejects_odd_cfa():
  raws = np.zeros((2, 15, 36), np.uint8)  # odd height
  with pytest.raises(ValueError, match="even"):
    debug_util.validate_raw(raws, "packed12")


def test_validate_raw_rejects_wrong_dtype():
  with pytest.raises(ValueError, match="uint8"):
    debug_util.validate_raw(np.zeros((2, 16, 36), np.uint16), "packed12")


def test_validate_raw_file_wrong_width():
  # 16 rows of 24-px packed12 = 576 bytes; width 40 (60 B/row) does not
  # divide it evenly
  with pytest.raises(ValueError, match="wrong --width"):
    debug_util.validate_raw_file(16 * 36, 40, "packed12")
  # width 32 divides (576/48 = 12 rows) but an ODD implied height fails:
  # 3 rows of 32-px = 144 bytes
  with pytest.raises(ValueError, match="odd height"):
    debug_util.validate_raw_file(3 * 48, 32, "packed12")
  assert debug_util.validate_raw_file(16 * 36, 24, "packed12") == 16


def test_process_rejects_bad_raw_shape():
  isp = Camera32(BayerPattern.RGGB)
  with pytest.raises(ValueError, match="multiple of 3"):
    isp.process(np.zeros((2, 16, 35), np.uint8))


def test_loader_rejects_bad_raw():
  isp = Camera32(BayerPattern.RGGB)
  with pytest.raises(ValueError, match="multiple of 3"):
    isp.load_packed12(np.zeros((16, 35), np.uint8))


# --- opt-in checkify mode ---------------------------------------------------

def test_debug_enabled_env(monkeypatch):
  monkeypatch.delenv("TAICHI_IMAGE_TPU_DEBUG", raising=False)
  assert not debug_util.debug_enabled()
  monkeypatch.setenv("TAICHI_IMAGE_TPU_DEBUG", "1")
  assert debug_util.debug_enabled()
  monkeypatch.setenv("TAICHI_IMAGE_TPU_DEBUG", "0")
  assert not debug_util.debug_enabled()


def test_debug_mode_passes_clean_input(monkeypatch):
  monkeypatch.setenv("TAICHI_IMAGE_TPU_DEBUG", "1")
  isp = Camera32(BayerPattern.RGGB)
  out = isp.process(_raws())
  assert np.asarray(out).dtype == np.uint8


def test_debug_mode_matches_fast_path(monkeypatch):
  raws = _raws()
  monkeypatch.setenv("TAICHI_IMAGE_TPU_DEBUG", "1")
  a = np.asarray(Camera32(BayerPattern.RGGB).process(raws))
  monkeypatch.setenv("TAICHI_IMAGE_TPU_DEBUG", "0")
  b = np.asarray(Camera32(BayerPattern.RGGB).process(raws))
  assert np.array_equal(a, b)


def test_debug_mode_catches_nonfinite_frames(monkeypatch):
  from jax.experimental import checkify
  monkeypatch.setenv("TAICHI_IMAGE_TPU_DEBUG", "1")
  isp = Camera32(BayerPattern.RGGB)
  bad = np.full((2, 16, 24), np.nan, np.float32)
  with pytest.raises(checkify.JaxRuntimeError, match="non-finite"):
    isp.process(bad, fmt="f32")
