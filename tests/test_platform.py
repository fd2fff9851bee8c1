"""Platform bootstrap: under a working pin both entry points return the
pinned devices untouched. The breakage they repair — PYTHONPATH
overridden without preserving the TPU plugin's sitecustomize dir, so
registration never happens at interpreter startup — is deterministic
(taichi_image_tpu/utils/platform.py docstring) and its detection/repair
helpers are tested directly; the re-exec leg replaces the process and is
exercised operationally."""

import os

import jax
import pytest

from taichi_image_tpu.utils import platform as tplatform
from taichi_image_tpu.utils.platform import (ensure_backend,
                                             ensure_backend_for_timing)


def test_ensure_backend_returns_devices():
  devs = ensure_backend()
  assert len(devs) >= 1
  assert devs == jax.devices()


def test_ensure_backend_for_timing_working_pin(monkeypatch):
  monkeypatch.setenv("JAX_PLATFORMS", "cpu")
  devs = ensure_backend_for_timing()
  assert devs == jax.devices()
  assert os.environ["JAX_PLATFORMS"] == "cpu"
  assert "TAICHI_PLATFORM_REEXEC" not in os.environ


@pytest.fixture
def fake_axon_site(tmp_path, monkeypatch):
  site = tmp_path / "axon_site"
  site.mkdir()
  (site / "sitecustomize.py").write_text("")
  monkeypatch.setattr(tplatform, "_AXON_SITE", str(site))
  return str(site)


def test_plugin_dir_dropped_detects_clobbered_pythonpath(
    fake_axon_site, monkeypatch):
  monkeypatch.setenv("PYTHONPATH", "/some/other/dir")
  assert tplatform._plugin_dir_dropped()
  # repair appends the plugin dir, preserving existing entries
  tplatform._repair_pythonpath()
  assert not tplatform._plugin_dir_dropped()
  parts = os.environ["PYTHONPATH"].split(os.pathsep)
  assert parts[0] == "/some/other/dir" and parts[-1] == fake_axon_site


def test_plugin_dir_dropped_false_when_present(fake_axon_site,
                                               monkeypatch):
  monkeypatch.setenv("PYTHONPATH", fake_axon_site)
  assert not tplatform._plugin_dir_dropped()


def test_plugin_dir_dropped_false_when_site_absent(tmp_path, monkeypatch):
  monkeypatch.setattr(tplatform, "_AXON_SITE",
                      str(tmp_path / "nonexistent"))
  monkeypatch.setenv("PYTHONPATH", "")
  assert not tplatform._plugin_dir_dropped()


def test_repair_pythonpath_from_empty(fake_axon_site, monkeypatch):
  monkeypatch.delenv("PYTHONPATH", raising=False)
  tplatform._repair_pythonpath()
  assert os.environ["PYTHONPATH"] == fake_axon_site


def test_reexec_loop_bounded_subprocess(tmp_path):
  """End-to-end re-exec loop: a pinned platform that never registers
  drives ensure_backend_for_timing through its repair + bounded
  re-exec path and a loud final failure (never a silent fallback)."""
  import subprocess
  import sys as _sys
  site = tmp_path / "axon_site"
  site.mkdir()
  (site / "sitecustomize.py").write_text("")
  script = tmp_path / "probe.py"
  script.write_text(
      "import sys\n"
      f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
      "from taichi_image_tpu.utils.platform import ensure_backend_for_timing\n"
      "ensure_backend_for_timing(max_reexec=2)\n")
  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "no_such_platform"
  env["TAICHI_AXON_SITE"] = str(site)
  env["PYTHONPATH"] = "/definitely/not/the/site"
  env.pop("TAICHI_PLATFORM_REEXEC", None)
  r = subprocess.run([_sys.executable, str(script)], env=env,
                     capture_output=True, text=True, timeout=180)
  assert r.returncode != 0
  assert r.stderr.count("registration failed; re-exec") == 2  # bounded retries
  assert "gave up after 2 re-execs" in r.stderr  # loud failure
  assert "NOT auto-selecting" in r.stderr        # no silent fallback
