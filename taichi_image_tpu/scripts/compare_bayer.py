"""Demosaic quality shoot-out: PSNR of MHC vs bilinear on an image.

Reference: ``taichi_image/test/compare_bayer.py`` (PSNR vs external
implementations). Loads an RGB image (PIL), mosaics it for each Bayer
pattern, demosaics with both methods and prints PSNR per pattern.
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

  print(f"{'pattern':8} {'mhc':>8} {'bilinear':>8}  (PSNR dB)")
  for pattern in bayer.BayerPattern:
    cfa = np.asarray(bayer.rgb_to_bayer(img, pattern))
    scores = []
    for method in ("mhc", "bilinear"):
      rgb = np.asarray(bayer.bayer_to_rgb(cfa, pattern, method=method))
      ref, got = (img, rgb) if c == 0 else (img[c:-c, c:-c],
                                            rgb[c:-c, c:-c])
      scores.append(psnr(got, ref, peak=1.0))
    print(f"{pattern.name:8} {scores[0]:8.2f} {scores[1]:8.2f}")


if __name__ == "__main__":
  main()
