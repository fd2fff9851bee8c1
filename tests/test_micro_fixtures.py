"""Hand-computed micro-fixtures: independent parity evidence.

Every other parity test in this suite compares the implementation against
tests/oracle.py — which was written from the same reading of the
reference that produced the implementation, so a shared misreading would
pass everywhere. The constants in THIS file are literal values derived
directly from the reference's published math by hand (worked examples
below), cross-checked with a third scalar implementation
(tools/gen_micro_fixtures.py) that shares no code with the package or
the oracle. They would fail if implementation and oracle shared a
misreading of the border renorm (reference bayer.py:145-151), the kernel
parity mapping (bayer.py:162-175), or the packed12 bit layouts
(packed.py:16-20,51-55).

Worked examples (RGGB, u8, impulse 255 at (0,0), all others 0):

* out[0,0] — R-phase kernel (ident, g_rb, rb_br). Surviving taps at the
  corner: {(0,0),(0,1),(0,2),(1,0),(1,1),(2,0)}.
  R: ident — t=16, tap(0,0)=16 -> 255.
  G: g_rb weights 8,4,-2,4,0,-2 -> t=12, tap=8 -> trunc(255*8/12)=170.
  B: rb_br weights 12,0,-3,0,4,-3 -> t=10, tap=12 -> 12/10 clamps to 1 -> 255.
* out[0,1] — G2-position kernel (r_g2, ident, r_g1); (0,-2) and row -1
  taps dropped. R: r_g2 t=8+10+8-2-2+0-2+1=21, tap(0,-1)=8 ->
  trunc(255*8/21)=97. G,B taps to (0,0) are 0 -> 0.
* out[1,1] — B-phase kernel (rb_br, g_rb, ident).
  R: rb_br t=4+4+0+12+0-3+4+0+4-3=22, tap(-1,-1)=4 -> trunc(255*4/22)=46.
* Impulse at (2,3): interior out[2,3] has full t=16: R=r_g2 tap 10 ->
  trunc(2550/16)=159, G=255, B=159. Border out[2,1].B: r_g1 with the
  (0,-2) tap (weight 1) dropped -> t=15, tap(0,2)=1 -> trunc(255/15)=17
  (would be 15 without border renormalization — discriminating value).

packed12 (reference packed.py:16-20,51-55), pair (0xABC, 0x123):
  standard encode -> (0xBC, 0x3A, 0x12) = (188, 58, 18); decode inverts.
  IDS encode -> (0xAB, 0x12, 0xC3) = (171, 18, 195); IDS decode of that
  gives (0xAB3, 0x12C) = (2739, 300) — the low-nibble swap quirk (encode
  stores p0's low nibble in b2's HIGH nibble, decode reads it from the
  LOW nibble).
"""

import numpy as np
import pytest

from taichi_image_tpu.ops import bayer as bayer_ops
from taichi_image_tpu.ops import packed
from taichi_image_tpu.ops.bayer import BayerPattern

import oracle


# --- packed12 literals ------------------------------------------------------

def test_packed12_standard_literals():
  pair = np.array([0xABC, 0x123], np.uint16)
  enc = np.asarray(packed.encode12(pair))
  assert enc.tolist() == [188, 58, 18]
  dec = np.asarray(packed.decode12(np.array([188, 58, 18], np.uint8)))
  assert dec.tolist() == [0xABC, 0x123]
  # second literal: (0xFFF, 0x000) -> (0xFF, 0x0F, 0x00)
  enc2 = np.asarray(packed.encode12(np.array([0xFFF, 0x000], np.uint16)))
  assert enc2.tolist() == [255, 15, 0]
  dec2 = np.asarray(packed.decode12(np.array([255, 15, 0], np.uint8)))
  assert dec2.tolist() == [0xFFF, 0x000]


def test_packed12_ids_literals():
  pair = np.array([0xABC, 0x123], np.uint16)
  enc = np.asarray(packed.encode12(pair, ids_format=True))
  assert enc.tolist() == [171, 18, 195]
  # the quirk: decoding the IDS encoding swaps the two low nibbles
  dec = np.asarray(packed.decode12(np.array([171, 18, 195], np.uint8),
                                   ids_format=True))
  assert dec.tolist() == [0xAB3, 0x12C]
  dec2 = np.asarray(packed.decode12(np.array([255, 0, 240], np.uint8),
                                    ids_format=True))
  assert dec2.tolist() == [0xFF0, 0x00F]


def test_packed12_scaled_u8_literal():
  # write_value_scaled (packed.py:98-100): u8 out = trunc(p * 255/4095)
  # 2748*255/4095 = 171.12 -> 171 ; 291*255/4095 = 18.12 -> 18
  dec = np.asarray(packed.decode12(np.array([188, 58, 18], np.uint8),
                                   dtype=np.uint8, scaled=True))
  assert dec.tolist() == [171, 18]


# --- demosaic literals ------------------------------------------------------

# fmt: off
EXPECT_IMP00_RGGB_TOPLEFT = np.array(  # rows 0..2 x cols 0..2
    [[[255, 170, 255], [97, 0, 0], [0, 0, 0]],
     [[97, 0, 0], [46, 0, 0], [0, 0, 0]],
     [[0, 0, 0], [0, 0, 0], [0, 0, 0]]], dtype=np.uint8)

EXPECT_IMP23_RGGB = np.array(
    [[[0, 0, 0], [0, 0, 0], [0, 0, 0], [13, 0, 0], [0, 0, 0], [0, 0, 0]],
     [[0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 56, 0], [0, 0, 0], [0, 0, 0]],
     [[0, 0, 0], [0, 0, 17], [0, 63, 0], [159, 255, 159], [0, 56, 0],
      [0, 0, 13]],
     [[0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 63, 0], [0, 0, 0], [0, 0, 0]],
     [[0, 0, 0], [0, 0, 0], [0, 0, 0], [17, 0, 0], [0, 0, 0], [0, 0, 0]],
     [[0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0]]],
    dtype=np.uint8)

RAMP = np.array(
    [[3, 10, 17, 24, 31, 38],
     [45, 52, 59, 66, 73, 80],
     [87, 94, 101, 108, 115, 122],
     [129, 136, 143, 150, 157, 164],
     [171, 178, 185, 192, 199, 206],
     [213, 220, 227, 234, 241, 248]], dtype=np.uint8)

EXPECT_RAMP_RGGB = np.array(
    [[[3, 3, 0], [4, 10, 11], [17, 17, 24], [19, 24, 24], [31, 32, 40],
      [37, 38, 43]],
     [[36, 45, 51], [38, 42, 52], [49, 59, 64], [52, 56, 66], [62, 73, 79],
      [61, 69, 80]],
     [[87, 87, 88], [92, 94, 94], [101, 101, 101], [108, 108, 108],
      [115, 116, 117], [122, 122, 122]],
     [[128, 129, 129], [133, 134, 136], [143, 143, 143], [150, 150, 150],
      [156, 157, 158], [162, 164, 164]],
     [[171, 181, 190], [171, 178, 188], [185, 194, 198], [186, 192, 201],
      [199, 208, 212], [199, 206, 214]],
     [[207, 213, 213], [211, 218, 220], [227, 227, 231], [226, 234, 234],
      [239, 241, 246], [255, 248, 248]]], dtype=np.uint8)

EXPECT_RAMP_BGGR = np.array(
    [[[0, 3, 3], [11, 10, 4], [24, 17, 17], [24, 24, 19], [40, 32, 31],
      [43, 38, 37]],
     [[51, 45, 36], [52, 42, 38], [64, 59, 49], [66, 56, 52], [79, 73, 62],
      [80, 69, 61]],
     [[88, 87, 87], [94, 94, 92], [101, 101, 101], [108, 108, 108],
      [117, 116, 115], [122, 122, 122]],
     [[129, 129, 128], [136, 134, 133], [143, 143, 143], [150, 150, 150],
      [158, 157, 156], [164, 164, 162]],
     [[190, 181, 171], [188, 178, 171], [198, 194, 185], [201, 192, 186],
      [212, 208, 199], [214, 206, 199]],
     [[213, 213, 207], [220, 218, 211], [231, 227, 227], [234, 234, 226],
      [246, 241, 239], [248, 248, 255]]], dtype=np.uint8)
# fmt: on


def _impulse(r, c):
  cfa = np.zeros((6, 6), np.uint8)
  cfa[r, c] = 255
  return cfa


def test_demosaic_impulse_corner_literals():
  out = np.asarray(bayer_ops.bayer_to_rgb(_impulse(0, 0),
                                          BayerPattern.RGGB))
  np.testing.assert_array_equal(out[:3, :3], EXPECT_IMP00_RGGB_TOPLEFT)
  # everything beyond the 5x5 support of the corner is exactly zero
  assert out[3:].max() == 0 and out[:, 3:].max() == 0


def test_demosaic_impulse_interior_literals():
  out = np.asarray(bayer_ops.bayer_to_rgb(_impulse(2, 3),
                                          BayerPattern.RGGB))
  np.testing.assert_array_equal(out, EXPECT_IMP23_RGGB)


@pytest.mark.parametrize("pattern,expect", [
    (BayerPattern.RGGB, EXPECT_RAMP_RGGB),
    (BayerPattern.BGGR, EXPECT_RAMP_BGGR),
])
def test_demosaic_ramp_literals(pattern, expect):
  # The conv formulation's tree summation can land 1 ulp below an exact
  # integer where the reference's scalar tap order lands on it, flipping
  # the truncating cast by 1 count (here: pixel (3,3) G, exactly 150.0
  # in the ramp). Same-association paths (the oracle) match exactly
  # below; the implementation is held to <=1 count on <=2% of pixels.
  out = np.asarray(bayer_ops.bayer_to_rgb(RAMP, pattern)).astype(int)
  diff = np.abs(out - expect.astype(int))
  assert diff.max() <= 1
  assert (diff != 0).sum() <= 2


@pytest.mark.parametrize("pattern,expect", [
    (BayerPattern.RGGB, EXPECT_RAMP_RGGB),
    (BayerPattern.BGGR, EXPECT_RAMP_BGGR),
])
def test_oracle_itself_matches_ramp_literals(pattern, expect):
  """The numpy oracle must ALSO match the hand fixtures — this is the
  test that catches an implementation+oracle shared misreading."""
  out = oracle.bayer_to_rgb_oracle(RAMP, pattern=pattern.name)
  np.testing.assert_array_equal(out, expect)


def test_oracle_itself_matches_impulse_literals():
  out = oracle.bayer_to_rgb_oracle(_impulse(2, 3), pattern="RGGB")
  np.testing.assert_array_equal(out, EXPECT_IMP23_RGGB)
  out0 = oracle.bayer_to_rgb_oracle(_impulse(0, 0), pattern="RGGB")
  np.testing.assert_array_equal(out0[:3, :3], EXPECT_IMP00_RGGB_TOPLEFT)


def test_oracle_packed12_literals():
  enc = oracle.encode12_oracle(np.array([0xABC, 0x123], np.uint16))
  assert enc.tolist() == [188, 58, 18]
  enc_ids = oracle.encode12_oracle(np.array([0xABC, 0x123], np.uint16),
                                   ids_format=True)
  assert enc_ids.tolist() == [171, 18, 195]
  dec_ids = oracle.decode12_oracle(np.array([171, 18, 195], np.uint8),
                                   ids_format=True)
  assert dec_ids.tolist() == [0xAB3, 0x12C]
