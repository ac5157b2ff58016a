"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the stand-in for a TPU pod the
reference never had — see SURVEY.md section 4).

This image's sitecustomize imports jax and registers a TPU PJRT plugin at
interpreter startup, which force-selects the TPU backend regardless of
JAX_PLATFORMS; patching jax.config afterwards flips the device list but
leaves collective lowering (ppermute inside shard_map) with a broken axis
environment.  The only reliable fix is a fresh interpreter with the plugin
hook disabled — so we re-exec pytest once with the right environment, from
a hook where pytest's fd capture can be suspended (a child spawned while
capture is active would write into the capture buffer and be lost).
"""

import os
import pathlib
import subprocess
import sys

_WANT_FLAG = "--xla_force_host_platform_device_count=8"
_NEED_REEXEC = (
    os.environ.get("JAX_PLATFORMS") != "cpu"
    or _WANT_FLAG not in os.environ.get("XLA_FLAGS", "")
    or bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
)
if _NEED_REEXEC and os.environ.get("PEDONI_TEST_REEXEC") == "1":
    raise RuntimeError("test env re-exec failed to take effect")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if not _NEED_REEXEC:
    import jax

    assert jax.default_backend() == "cpu", "tests must run on the cpu backend"
    assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

    # Interpret-mode Pallas kernels compile slowly on CPU (minutes); the
    # persistent cache makes re-runs and shape-sharing tests near-instant.
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_cmdline_main(config):
    if not _NEED_REEXEC:
        return None
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + _WANT_FLAG).strip()
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disables the TPU plugin hook
    env["PEDONI_TEST_REEXEC"] = "1"

    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    args = list(config.invocation_params.args)
    ret = subprocess.run([sys.executable, "-m", "pytest"] + args, env=env).returncode
    os._exit(ret)


import pytest  # noqa: E402

REFERENCE_SCENARIOS = pathlib.Path("/root/reference/scenarios")


@pytest.fixture
def reference_scenarios() -> pathlib.Path:
    if not REFERENCE_SCENARIOS.is_dir():
        pytest.skip("reference scenarios not available")
    return REFERENCE_SCENARIOS
