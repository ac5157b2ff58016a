"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the stand-in for a TPU pod the
reference never had — see SURVEY.md section 4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import pytest  # noqa: E402


REFERENCE_SCENARIOS = pathlib.Path("/root/reference/scenarios")


@pytest.fixture
def reference_scenarios() -> pathlib.Path:
    if not REFERENCE_SCENARIOS.is_dir():
        pytest.skip("reference scenarios not available")
    return REFERENCE_SCENARIOS
