"""Corpus measurement of the Camera16 q16-vs-strict-f16 max_out pole
(round-4 VERDICT next #5).

Background (docs/PERFORMANCE.md "Parity scope"): metering samples a
stride-8 grid (reference camera_isp.py:168-170), so full-res pixels can
sit below the metered min; for such a pixel scaled < 0 while adapt is a
small positive number and p = scaled/(adapt + scaled) crosses a pole.
The reference's per-frame max_out (camera_isp.py:213-215) then hands
the WHOLE frame's gamma normalization to that near-singular pixel,
whose value is chaotic under ANY least-significant-bit change of its
input — including between the strict-f16 and q16 x12 grids.

This probe measures, over a corpus of scene families (natural, low
light, HDR speculars, off-grid dark pixels, night sky, backlit,
uniform random):
  * how often the pole bites (max_out > 1 is an EXACT indicator:
    p > 1 is only reachable through the negative-denominator pole —
    for s < 0 < a, a + s < 0 implies |s| > |a + s|, hence p > 1;
    regular pixels have p = s/(a+s) < 1),
  * how far the two routes' max_out diverge when it does,
  * the resulting u8 divergence (max count + pixels beyond 1 count).

Usage: python tools/probe_q16_corpus.py [--json OUT]
"""

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import numpy as np
import jax
import jax.numpy as jnp

from taichi_image_tpu import types
from taichi_image_tpu.models import camera_isp as ci
from taichi_image_tpu.ops import bayer, packed
from taichi_image_tpu.ops.pallas import decode as pld

H, W = 2160, 3840
GAMMA, INTENSITY = 0.9, 3.0  # the CLI config (pole-prone: large e^-i)


def _base_scene(rng, h, w):
  """Natural-ish scene: smooth luminance + per-channel tint + texture."""
  yy = np.linspace(0, 1, h, dtype=np.float32)[:, None]
  xx = np.linspace(0, 1, w, dtype=np.float32)[None, :]
  lum = 0.25 + 0.5 * (0.6 * yy + 0.4 * np.sin(3.1 * xx) ** 2)
  tint = np.stack([lum * 1.05, lum, lum * 0.9], -1)
  tex = rng.normal(0, 0.03, (h, w, 3)).astype(np.float32)
  return np.clip(tint + tex, 0.0, 1.0)


def corpus(rng, h=H, w=W):
  base = _base_scene(rng, h, w)
  scenes = {"natural": base,
            "uniform": rng.random((h, w, 3), np.float32)}
  scenes["lowlight"] = np.clip(
      base * 0.03 + rng.normal(0, 0.004, base.shape), 0, 1
  ).astype(np.float32)
  spec = base * 0.15
  ys, xs = rng.integers(0, h, 60), rng.integers(0, w, 60)
  spec[ys, xs] = 0.98
  scenes["hdr_specular"] = spec.astype(np.float32)
  # isolated dark pixels placed OFF the stride-8 metering grid — the
  # known pole trigger (full-res pixels below the metered min)
  dark = base.copy()
  ys = rng.integers(0, h // 8, 40) * 8 + 3
  xs = rng.integers(0, w // 8, 40) * 8 + 5
  dark[ys, xs] = 0.0005
  scenes["darkpix_offgrid"] = dark
  sky = np.full((h, w, 3), 0.002, np.float32)
  ys, xs = rng.integers(0, h, 300), rng.integers(0, w, 300)
  sky[ys, xs] = rng.random((300, 1)).astype(np.float32) * 0.9 + 0.05
  scenes["night_sky"] = sky
  half = base.copy()
  half[:, : w // 2] *= 0.02
  scenes["backlit"] = np.clip(half, 0, 1)
  return scenes


def encode_scene(img):
  cfa = np.asarray(bayer.rgb_to_bayer(img, bayer.BayerPattern.RGGB))
  return np.asarray(packed.encode12(cfa, scaled=True))[None]


@jax.jit
def strict_tail(raws, prev):
  """Strict f16 route, max_out surfaced (internals of fused_isp_step)."""
  phases = ci.load_raw_phases(raws, "packed12", types.f16, False)
  x12, samp = bayer.demosaic_phases(phases, bayer.BayerPattern.RGGB,
                                    out_dtype=types.f16, sample_step=4)
  m = ci.metering_update_ca(samp, prev, jnp.float32(0.0))
  n, _, hh, wh = x12.shape
  cast, mx = ci.reinhard_map_max_ca(x12.reshape(n, 4, 3, hh, wh), m,
                                    INTENSITY, 1.0, 0.0, types.f16)
  out12 = ci.reinhard_gamma_ca(cast, mx, GAMMA)
  return m, mx, out12


@jax.jit
def q16_tail(raws, prev):
  """q16 fast route, max_out surfaced."""
  from taichi_image_tpu.ops.pallas.reinhard import reinhard_map_q16_dma
  w = pld.decode12_phases_q16(raws, False)
  x12q, samp = bayer.demosaic_phases_q16(w, bayer.BayerPattern.RGGB,
                                         sample_step=4)
  m = ci.metering_update_ca(samp, prev, jnp.float32(0.0))
  cast, mx = reinhard_map_q16_dma(x12q, m, INTENSITY, 1.0)
  out12 = ci.reinhard_gamma_ca(cast, mx, GAMMA)
  return m, mx, out12


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--json", default=None)
  args = ap.parse_args()

  rng = np.random.default_rng(42)
  prev = jnp.zeros(9, jnp.float32)
  rows = []
  print(f"{'scene':>16} {'max_strict':>11} {'max_q16':>11} {'pole':>5} "
        f"{'u8max':>6} {'>1ct pct':>9}")
  for name, img in corpus(rng).items():
    raws = jnp.asarray(encode_scene(img))
    _, mx_s, o_s = strict_tail(raws, prev)
    _, mx_q, o_q = q16_tail(raws, prev)
    mx_s = float(np.asarray(mx_s).ravel()[0])
    mx_q = float(np.asarray(mx_q).ravel()[0])
    d = np.abs(np.asarray(o_s).astype(np.int32)
               - np.asarray(o_q).astype(np.int32))
    pole = mx_s > 1.0 or mx_q > 1.0
    row = {"scene": name, "max_strict": mx_s, "max_q16": mx_q,
           "pole": bool(pole), "u8_maxdiff": int(d.max()),
           "pct_beyond_1": float((d > 1).mean() * 100.0)}
    rows.append(row)
    print(f"{name:>16} {mx_s:11.4f} {mx_q:11.4f} {str(pole):>5} "
          f"{d.max():6d} {row['pct_beyond_1']:8.4f}%")
  if args.json:
    with open(args.json, "w") as f:
      json.dump(rows, f, indent=1)
    print("wrote", args.json)


if __name__ == "__main__":
  main()
