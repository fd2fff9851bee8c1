"""JAX backend bootstrap for the TPU attachment's fragile platform
registration.

Root cause, isolated deterministically (2026-08-17; earlier sessions
called this an "intermittent flake"): the tunneled chip's PJRT plugin
lives in ``/root/.axon_site`` and is registered by that directory's
``sitecustomize.py`` AT INTERPRETER STARTUP — the directory is on the
default ``PYTHONPATH``. Any command that sets ``PYTHONPATH=...`` without
preserving the existing value silently drops the plugin directory, the
sitecustomize never runs, and ``jax.devices()`` raises ``RuntimeError:
Backend 'axon' is not in the list of known backends: ['cpu', 'tpu']``.
This is 100% reproducible (plugin dir absent -> always fails; present ->
always registers) — not weather.

Because registration happens in ``sitecustomize`` at startup, it cannot
be repaired in-process: the fix is to put the plugin dir back into the
environment's ``PYTHONPATH`` and re-exec the interpreter.

Two more probed facts shape the policy below:

- The ``tpu`` platform that IS in the known-backends list is a
  NON-FUNCTIONAL local libtpu registration (``TPU_WORKER_HOSTNAMES``
  errors at init): a small matmul chain hangs for minutes, and a full
  ISP step that did complete ran at ~8.9 s/step — CPU speed. Automatic
  platform selection prefers it, so falling back to auto-selection
  silently lands timing runs on garbage.
- ``axon.register`` failures are swallowed by the sitecustomize (so a
  PJRT-init error doesn't take down every interpreter); a genuinely
  transient tunnel error therefore also surfaces as the same
  RuntimeError. A bounded re-exec retries those too.

So: correctness surfaces (driver compile checks, CLIs) may degrade to
CPU after the repair attempt fails — the Pallas gates close and the XLA
paths still run. Timing surfaces (bench.py, tools/probe*.py,
tools/verify_tpu.py) must never degrade silently; they repair + re-exec
a bounded number of times, then fail loudly.
"""

from __future__ import annotations

import os
import sys
import time

# Where this machine's tunnel plugin lives (see module docstring). If
# the deployment moves it, set TAICHI_AXON_SITE.
_AXON_SITE = os.environ.get("TAICHI_AXON_SITE", "/root/.axon_site")
_REEXEC_VAR = "TAICHI_PLATFORM_REEXEC"
_FLAKE_MSG = (
    "the pinned JAX platform failed to register in this process. Usual "
    "cause: PYTHONPATH was overridden without preserving "
    f"{_AXON_SITE!r} (its sitecustomize.py registers the TPU plugin at "
    "interpreter startup). NOT auto-selecting a backend: this machine "
    "also registers a non-functional local 'tpu' platform that hangs "
    "or runs at CPU speed (docs/PERFORMANCE.md)."
)


def _plugin_dir_dropped() -> bool:
  """True when the plugin dir exists but PYTHONPATH no longer carries it
  (the deterministic breakage this module exists to repair)."""
  if not os.path.isdir(_AXON_SITE):
    return False
  entries = os.environ.get("PYTHONPATH", "").split(os.pathsep)
  site = os.path.realpath(_AXON_SITE)
  return not any(p and os.path.realpath(p) == site for p in entries)


def _repair_pythonpath() -> None:
  pp = os.environ.get("PYTHONPATH", "")
  os.environ["PYTHONPATH"] = (pp + os.pathsep if pp else "") + _AXON_SITE


def _reexec(attempt: int, max_reexec: int) -> None:
  # [python] + sys.argv only reconstructs SCRIPT (and -m, where Python
  # rewrites argv[0] to the module file) invocations: for
  # `python -c "..."` sys.argv is ['-c', ...] with the code string
  # gone, so exec'ing it would die with a cryptic '-c needs an
  # argument' error. Skip the re-exec and let the caller's fallback/
  # raise logic run with the repaired env instead.
  if sys.argv and sys.argv[0] == "-c":
    sys.stderr.write(
        "[taichi_image_tpu] platform registration failed and the "
        "`python -c` invocation cannot be re-exec'd — rerun with the "
        "plugin dir preserved (PYTHONPATH=...:$PYTHONPATH) or from a "
        "script file.\n")
    sys.stderr.flush()
    return
  os.environ[_REEXEC_VAR] = str(attempt)
  sys.stderr.write(
      f"[taichi_image_tpu] platform registration failed; re-exec "
      f"{attempt}/{max_reexec}: {sys.argv}\n")
  sys.stderr.flush()
  time.sleep(2.0)
  os.execv(sys.executable, [sys.executable] + sys.argv)


def ensure_backend(allow_cpu_fallback: bool = True):
  """Return ``jax.devices()``. If the pinned platform (e.g. ``axon``)
  failed to register: repair a clobbered PYTHONPATH and re-exec once
  (the deterministic fix); if registration still fails, either fall
  back to the CPU backend (``allow_cpu_fallback=True`` — fine for
  compile checks and CLIs; the Pallas gates close) or raise."""
  import jax

  try:
    return jax.devices()
  except RuntimeError as e:
    if _plugin_dir_dropped() and _REEXEC_VAR not in os.environ:
      _repair_pythonpath()
      _reexec(1, 1)
    if not allow_cpu_fallback:
      raise RuntimeError(_FLAKE_MSG) from e
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    return jax.devices()


def ensure_backend_for_timing(max_reexec: int = 3):
  """Return ``jax.devices()`` on the intended (pinned) backend, or
  repair PYTHONPATH and re-exec this script — never fall back to a
  different platform (a silent CPU/broken-'tpu' run poisons recorded
  benchmark numbers). Raises after ``max_reexec`` attempts."""
  import jax

  try:
    return jax.devices()
  except RuntimeError as e:
    if _plugin_dir_dropped():
      _repair_pythonpath()
    n = int(os.environ.get(_REEXEC_VAR, "0"))
    if n >= max_reexec:
      raise RuntimeError(_FLAKE_MSG + f" (gave up after {n} re-execs)"
                         ) from e
    _reexec(n + 1, max_reexec)
    # _reexec returns (instead of exec'ing) for `python -c` invocations
    # — timing entry points must still fail LOUDLY, never fall through
    # to an auto-selected broken backend
    raise RuntimeError(_FLAKE_MSG + " (python -c cannot re-exec)") from e
