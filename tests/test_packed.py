"""12/16-bit packed codec tests.

Mirrors and extends the reference's only assert test
(test/packed.py:6-15): exact roundtrip for random sizes, plus IDS layout,
scaled paths, byte-level oracle parity and shape handling.
"""

import numpy as np
import pytest

from taichi_image_tpu.ops import packed
from oracle import decode12_oracle, decode16_oracle, encode12_oracle


def test_encode_decode_roundtrip(rng):
  for _ in range(50):
    size = int(rng.integers(1, 1000)) * 2
    x = rng.integers(0, 2 ** 12, size=size).astype(np.uint16)
    encoded = packed.encode12(x)
    decoded = packed.decode12(encoded)
    assert np.array_equal(np.asarray(decoded), x)


def test_encode_decode_ids_nibble_swap_quirk(rng):
  # Reference quirk (packed.py:36-55): the IDS encode writes p0's low
  # nibble into b2's HIGH nibble, but the IDS decode reads p0's low nibble
  # from b2's LOW nibble — so encode/decode are inverses only up to a swap
  # of the two values' low nibbles. We replicate both layouts exactly.
  x = rng.integers(0, 2 ** 12, size=2048).astype(np.uint16)
  encoded = packed.encode12(x, ids_format=True)
  decoded = np.asarray(packed.decode12(encoded, ids_format=True))
  pairs, dpairs = x.reshape(-1, 2), decoded.reshape(-1, 2)
  want0 = (pairs[:, 0] & 0xFF0) | (pairs[:, 1] & 0xF)
  want1 = (pairs[:, 1] & 0xFF0) | (pairs[:, 0] & 0xF)
  assert np.array_equal(dpairs[:, 0], want0)
  assert np.array_equal(dpairs[:, 1], want1)


@pytest.mark.parametrize("ids_format", [False, True])
def test_encode12_byte_layout_vs_oracle(rng, ids_format):
  x = rng.integers(0, 2 ** 12, size=600).astype(np.uint16)
  got = np.asarray(packed.encode12(x, ids_format=ids_format))
  want = encode12_oracle(x, ids_format=ids_format)
  assert np.array_equal(got, want)


@pytest.mark.parametrize("ids_format", [False, True])
@pytest.mark.parametrize("dtype", [np.uint16, np.float32, np.float16])
def test_decode12_vs_oracle(rng, ids_format, dtype):
  raw = rng.integers(0, 256, size=900).astype(np.uint8)
  got = np.asarray(packed.decode12(raw, dtype=dtype, scaled=True,
                                   ids_format=ids_format))
  want = decode12_oracle(raw, dtype=dtype, scaled=True,
                         ids_format=ids_format)
  np.testing.assert_allclose(got, want, rtol=1e-6, atol=0)


def test_decode12_scaled_u8_truncates(rng):
  raw = rng.integers(0, 256, size=300).astype(np.uint8)
  got = np.asarray(packed.decode12(raw, dtype=np.uint8, scaled=True))
  want = decode12_oracle(raw, dtype=np.uint8, scaled=True)
  assert np.array_equal(got, want)


def test_encode12_scaled_roundtrip_float():
  x = (np.arange(4096, dtype=np.float32) / 4095.0)[None]  # (1, 4096)
  encoded = packed.encode12(x, scaled=True)
  decoded = np.asarray(packed.decode12(encoded, dtype=np.float32,
                                       scaled=True))
  np.testing.assert_allclose(decoded[0], x[0], atol=1e-4)


def test_encode12_scaled_u8_source(rng):
  x = rng.integers(0, 256, size=512).astype(np.uint8)
  got = np.asarray(packed.encode12(x, scaled=True))
  want = encode12_oracle(x, scaled=True)
  assert np.array_equal(got, want)


def test_decode16_vs_oracle(rng):
  raw = rng.integers(0, 256, size=1024).astype(np.uint8)
  for dtype, scaled in [(np.uint16, False), (np.float32, True),
                        (np.uint8, True)]:
    got = np.asarray(packed.decode16(raw, dtype=dtype, scaled=scaled))
    want = decode16_oracle(raw, dtype=dtype, scaled=scaled)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=0)


def test_encode16_roundtrip(rng):
  x = rng.integers(0, 2 ** 16, size=512).astype(np.uint16)
  encoded = packed.encode16(x)
  decoded = np.asarray(packed.decode16(encoded))
  assert np.array_equal(decoded, x)


def test_shape_handling(rng):
  x = rng.integers(0, 2 ** 12, size=(4, 6, 8)).astype(np.uint16)
  encoded = packed.encode12(x)
  assert encoded.shape == (4, 6, 12)
  decoded = packed.decode12(encoded)
  assert decoded.shape == x.shape
  assert np.array_equal(np.asarray(decoded), x)


def test_odd_shapes_rejected(rng):
  with pytest.raises(ValueError):
    packed.encode12(np.zeros(3, np.uint16))
  with pytest.raises(ValueError):
    packed.decode12(np.zeros(4, np.uint8))
  with pytest.raises(ValueError):
    packed.decode16(np.zeros(3, np.uint8))


def test_decode12_i16(rng):
  raw = rng.integers(0, 256, size=300).astype(np.uint8)
  got = np.asarray(packed.decode12(raw, dtype=np.int16, scaled=True))
  want = decode12_oracle(raw, dtype=np.int16, scaled=True)
  assert np.array_equal(got, want)
