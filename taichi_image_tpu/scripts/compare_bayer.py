"""Demosaic quality shoot-out: PSNR of MHC / bilinear / OpenCV on an image.

Reference: ``taichi_image/test/compare_bayer.py`` (PSNR vs external
implementations: OpenCV debayer + colour_demosaicing). Loads an RGB image
(PIL), mosaics it for each Bayer pattern, demosaics with this package's
two methods AND OpenCV's independent debayer (when cv2 is installed;
colour_demosaicing is not available in this environment) and prints PSNR
per pattern.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from taichi_image_tpu.ops import bayer
from taichi_image_tpu.utils.image import psnr


def load_rgb(path: Path) -> np.ndarray:
  from PIL import Image
  img = np.asarray(Image.open(str(path)).convert("RGB"))
  return (img.astype(np.float32) / 255.0)


def opencv_demosaic(cfa_u8: np.ndarray, pattern) -> np.ndarray:
  """Demosaic a u8 CFA with OpenCV's independent implementation, or None
  if cv2 is unavailable.

  OpenCV's Bayer code naming is offset by one pixel from the top-left-quad
  convention used here (cv2 names the pattern by the 2x2 quad starting at
  (1, 1)); the mapping below is the empirically-validated correspondence.
  """
  try:
    import cv2
  except Exception:
    return None
  code = {
      "RGGB": cv2.COLOR_BayerBG2RGB,
      "GRBG": cv2.COLOR_BayerGB2RGB,
      "GBRG": cv2.COLOR_BayerGR2RGB,
      "BGGR": cv2.COLOR_BayerRG2RGB,
  }[pattern.name]
  return cv2.cvtColor(cfa_u8, code)


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("image", type=Path)
  parser.add_argument("--crop", type=int, default=0,
                      help="ignore an n-pixel border in the PSNR")
  args = parser.parse_args(argv)

  img = load_rgb(args.image)
  h, w = (img.shape[0] // 2) * 2, (img.shape[1] // 2) * 2
  img = img[:h, :w]
  c = args.crop

  print(f"{'pattern':8} {'mhc':>8} {'bilinear':>8} {'opencv':>8}  (PSNR dB)")
  for pattern in bayer.BayerPattern:
    cfa = np.asarray(bayer.rgb_to_bayer(img, pattern))
    scores = []
    for method in ("mhc", "bilinear"):
      rgb = np.asarray(bayer.bayer_to_rgb(cfa, pattern, method=method))
      ref, got = (img, rgb) if c == 0 else (img[c:-c, c:-c],
                                            rgb[c:-c, c:-c])
      scores.append(psnr(got, ref, peak=1.0))
    cfa_u8 = np.clip(cfa * 255.0, 0, 255).astype(np.uint8)
    cv_rgb = opencv_demosaic(cfa_u8, pattern)
    if cv_rgb is not None:
      got = cv_rgb.astype(np.float32) / 255.0
      ref = img
      if c:
        got, ref = got[c:-c, c:-c], img[c:-c, c:-c]
      cv_score = f"{psnr(got, ref, peak=1.0):8.2f}"
    else:
      cv_score = "     n/a"
    print(f"{pattern.name:8} {scores[0]:8.2f} {scores[1]:8.2f} {cv_score}")


if __name__ == "__main__":
  main()
