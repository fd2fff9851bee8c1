"""One-off generator for hand-checked micro-fixtures (tests/test_micro_fixtures.py).

THIRD, independent scalar implementation of the reference demosaic
(/root/reference/taichi_image/bayer.py:30-55,114-177) and packed12 codecs
(packed.py:12-55), written from a fresh reading for round-2's
independent-parity work — deliberately per-pixel Python loops, sharing no
code with taichi_image_tpu/ or tests/oracle.py. Its outputs were spot-
verified BY HAND (see tests/test_micro_fixtures.py docstring for the
worked examples) and pasted into the test as literal constants; this file
is committed for provenance only and is not imported by anything.
"""

import numpy as np

# --- weight tables, fresh from reference bayer.py:15-55 -------------------


def mirror(w):
  return w + w[:-1][::-1]


def symmetrical(rows):
  rows = mirror([mirror(list(r)) for r in rows])
  return [x for r in rows for x in r]


DIAMOND = [(0, 1), (-1, 2), (-2, 3), (-1, 2), (0, 1)]
OFFSETS = [(i - 2, x) for i, r in enumerate(DIAMOND) for x in range(*r)]

g_rb = symmetrical([(-2,), (0, 4), (-2, 4, 8)])
r_g1 = symmetrical([(-2,), (-2, 8), (1, 0, 10)])
r_g2 = symmetrical([(1,), (-2, 0), (-2, 8, 10)])
rb_br = symmetrical([(-3,), (4, 0), (-3, 0, 12)])
ident = symmetrical([(0,), (0, 0), (0, 0, 16)])
b_g1, b_g2 = r_g2, r_g1

# bayer_kernels[k] = list of ((dr, dc), (wr, wg, wb)) (bayer.py:48-55)
BAYER_KERNELS = [
    list(zip(OFFSETS, zip(ident, g_rb, rb_br))),   # R
    list(zip(OFFSETS, zip(r_g1, ident, b_g1))),    # G1
    list(zip(OFFSETS, zip(r_g2, ident, b_g2))),    # G2
    list(zip(OFFSETS, zip(rb_br, g_rb, ident))),   # B
]

# kernel_patterns (bayer.py:92-97); application order in the kernel loop
# (bayer.py:162-175): kernels[0]@(even r, even c), kernels[1]@(odd r,
# even c), kernels[2]@(even r, odd c), kernels[3]@(odd r, odd c).
KERNEL_PATTERNS = {
    "RGGB": (0, 1, 2, 3),
    "GBRG": (1, 0, 3, 2),
    "GRBG": (2, 3, 0, 1),
    "BGGR": (3, 2, 1, 0),
}


def demosaic_u8(cfa, pattern):
  """Reference filter_at semantics (bayer.py:137-155): f32 accumulate over
  in-bounds taps, renormalize by surviving per-channel weight sum, clamp
  to [0,1], scale by 255 and TRUNCATE to u8 (ti.cast f32->u8)."""
  h, w = cfa.shape
  kernels = [BAYER_KERNELS[i] for i in KERNEL_PATTERNS[pattern]]
  out = np.zeros((h, w, 3), np.uint8)
  for r in range(h):
    for c in range(w):
      k = kernels[(r % 2) * 1 + (c % 2) * 2]  # see order note above
      acc = np.zeros(3, np.float32)
      t = np.zeros(3, np.float32)
      for (dr, dc), wv in k:
        rr, cc = r + dr, c + dc
        if 0 <= rr < h and 0 <= cc < w:
          acc += np.float32(cfa[rr, cc]) * np.asarray(wv, np.float32)
          t += np.asarray(wv, np.float32)
      v = np.clip(acc / (np.float32(255.0) * t), np.float32(0), np.float32(1))
      out[r, c] = np.trunc(np.float32(v) * np.float32(255.0)).astype(np.uint8)
  return out


# --- packed12 codecs, fresh from reference packed.py:12-55 ----------------


def encode12(pairs, ids=False):
  out = []
  for p0, p1 in pairs:
    if not ids:
      out += [p0 & 0xFF, (p1 & 0xF) << 4 | (p0 >> 8), p1 >> 4]
    else:
      out += [p0 >> 4, p1 >> 4, (p0 & 0xF) << 4 | (p1 & 0xF)]
  return out


def decode12(triples, ids=False):
  out = []
  for b0, b1, b2 in triples:
    if not ids:
      out += [(b1 & 0xF) << 8 | b0, (b2 << 4) | (b1 >> 4)]
    else:
      out += [(b0 << 4) | (b2 & 0xF), (b1 << 4) | (b2 >> 4)]
  return out


def fmt(a):
  if a.ndim == 1:
    return "[" + ", ".join(str(int(x)) for x in a) + "]"
  return "[" + ",\n ".join(fmt(r) for r in a) + "]"


if __name__ == "__main__":
  print("# packed12 standard encode of (0xABC, 0x123):",
        encode12([(0xABC, 0x123)]))
  print("# packed12 standard decode of (188, 58, 18):",
        decode12([(188, 58, 18)]))
  print("# packed12 IDS encode of (0xABC, 0x123):",
        encode12([(0xABC, 0x123)], ids=True))
  print("# packed12 IDS decode of (171, 18, 195):",
        decode12([(171, 18, 195)], ids=True))
  print("# packed12 IDS decode of (255, 0, 240):",
        decode12([(255, 0, 240)], ids=True))

  h = w = 6
  imp00 = np.zeros((h, w), np.uint8)
  imp00[0, 0] = 255
  imp23 = np.zeros((h, w), np.uint8)
  imp23[2, 3] = 255
  ramp = ((np.arange(36).reshape(6, 6) * 7 + 3) % 256).astype(np.uint8)

  for name, cfa, pat in [("IMP00_RGGB", imp00, "RGGB"),
                         ("IMP23_RGGB", imp23, "RGGB"),
                         ("RAMP_RGGB", ramp.astype(np.uint8), "RGGB"),
                         ("RAMP_BGGR", ramp.astype(np.uint8), "BGGR")]:
    out = demosaic_u8(cfa, pat)
    print(f"\n{name} (input {'impulse' if 'IMP' in name else 'ramp'}):")
    print(f"EXPECT_{name} = np.array(\n{fmt(out)}, dtype=np.uint8)")
  print("\nRAMP input:")
  print(fmt(ramp))
