

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
