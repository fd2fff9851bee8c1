"""Probe: end-to-end production CLI throughput (tonemap_scan, on chip).

Round-3 VERDICT weak #4 / next #5: the CLI serialized
upload -> compute -> fetch -> JPEG per set (warm 0.75 sets/s at 6x1080p
with a ~4 ms device step). This measures the PIPELINED driver (device
outputs kept in flight, copy_to_host_async at dispatch, thread-pool
JPEG encoding) the same way round 3 measured the serial one: a synthetic
scan tree of 6 cameras x N_SETS frames of 1080p packed12 .raw, cold and
warm wall-clock for the whole tonemap_scan main() run.

Usage: python tools/probe_cli.py [n_sets] [--serial]
  --serial re-runs with pipelining disabled (depth 0 / inline encode)
  for a same-session comparison.
"""

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
from taichi_image_tpu.utils.platform import ensure_backend_for_timing
ensure_backend_for_timing()

import numpy as np

N_CAMS = 6
H, W = 1080, 1920


def write_scan(root: Path, n_sets: int):
  rng = np.random.default_rng(0)
  # one raw frame reused with per-set noise rows — content doesn't matter
  # for throughput, only bytes moved
  base = rng.integers(0, 256, size=(H, W * 3 // 2), dtype=np.uint8)
  for cam in range(N_CAMS):
    d = root / f"cam{cam}"
    d.mkdir(parents=True)
    for f in range(n_sets):
      raw = base.copy()
      raw[0, :] = (cam * 31 + f * 7) % 256
      (d / f"frame{f:04d}.raw").write_bytes(raw.tobytes())


def run_cli(scan: Path, out: Path, n_sets: int, extra=()):
  from taichi_image_tpu.scripts import tonemap_scan
  t0 = time.perf_counter()
  tonemap_scan.main([
      "--scan", str(scan), "--width", str(W), "--resize_width", "960",
      "--dtype", "bf16", "--rows", "2", "--write", str(out),
  ] + list(extra))
  return time.perf_counter() - t0


def main():
  n_sets = int(sys.argv[1]) if len(sys.argv) > 1 else 8
  root = Path(tempfile.mkdtemp(prefix="cli_probe_"))
  try:
    scan = root / "scan"
    write_scan(scan, n_sets)
    out = root / "out"

    cold = run_cli(scan, out, n_sets)
    jpgs = sorted(out.glob("*.jpg"))
    assert len(jpgs) == n_sets, (len(jpgs), n_sets)
    print(f"cold: {cold:6.2f} s  ({n_sets / cold:.2f} sets/s)", flush=True)

    for tag, extra in (("pipelined", ()),
                       ("serial   ", ("--pipeline_depth", "0")),
                       ("i420fetch", ("--fetch", "yuv420"))):
      shutil.rmtree(out, ignore_errors=True)
      warm = min(run_cli(scan, out, n_sets, extra) for _ in range(2))
      print(f"warm {tag}: {warm:6.2f} s  ({n_sets / warm:.2f} sets/s, "
            f"{n_sets * N_CAMS / warm:.1f} f/s)", flush=True)
  finally:
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
  main()
