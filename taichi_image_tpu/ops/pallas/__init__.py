

def backend_enabled() -> bool:
  """Shared Pallas gate: TPU backend present and the
  TAICHI_IMAGE_TPU_NO_PALLAS off-switch unset. Each kernel's
  *_available() combines this with its own shape/tiling check."""
  import os
  import jax
  if os.environ.get("TAICHI_IMAGE_TPU_NO_PALLAS"):
    return False
  try:
    backend = jax.default_backend()
  except Exception:
    return False
  return backend in ("tpu", "axon")


import contextlib


@contextlib.contextmanager
def no_pallas():
  """Temporarily force the XLA fallbacks (sets the off-switch env var
  and restores its prior value — including absence — on exit).

  TRACE-TIME ONLY: the backend choice is read when a jitted caller is
  first traced, and jit caches do not key on this env var. A function
  already traced with the Pallas route keeps it inside this context (and
  vice versa). Use it around the FIRST call of a fresh jitted function —
  e.g. a newly-created closure or a function whose static arguments
  differ from any prior call — or clear caches with
  ``jax.clear_caches()`` first."""
  import os
  prior = os.environ.get("TAICHI_IMAGE_TPU_NO_PALLAS")
  os.environ["TAICHI_IMAGE_TPU_NO_PALLAS"] = "1"
  try:
    yield
  finally:
    if prior is None:
      os.environ.pop("TAICHI_IMAGE_TPU_NO_PALLAS", None)
    else:
      os.environ["TAICHI_IMAGE_TPU_NO_PALLAS"] = prior
