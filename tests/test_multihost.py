"""Multi-process (multi-host analog) validation of the sharded grid step.

docs/multihost.md designs the DCN deployment: one process per host, a
global mesh over all hosts' devices, the same tile2d ghost exchange with
ppermute crossing process boundaries.  No multi-host TPU exists in this
environment, but jax.distributed + gloo CPU collectives exercise the
exact code path: 2 processes x 4 virtual CPU devices = one global
8-device row-strip mesh, cross-process ppermute ghost exchange, and
metrics compared step-by-step against a single-device run (worker 0).

Slow (two interpret-mode kernel compiles in parallel on one core);
behind -m slow like the scenario sweep.
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("tile", [None, "4x2"])
def test_two_process_mesh_matches_single_device(tile):
    """Row strips (8x1) and 2D tiles (4x2): with 2 processes x 4 devices
    as 4x2 tiles, the column ghost exchange stays intra-process while the
    middle row exchange crosses the process boundary."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=4").strip()
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(ROOT) + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

    worker = str(ROOT / "tests" / "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)]
            + ([tile] if tile else []),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))

    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, (
            f"worker {pid} failed (rc={rc}):\n{out[-2000:]}\n{err[-2000:]}")
        assert "MULTIHOST OK" in out, f"worker {pid}:\n{out[-2000:]}"

    # Both processes observed the same global metrics per step.
    steps0 = [ln for ln in outs[0][1].splitlines() if ln.startswith("STEP")]
    steps1 = [ln for ln in outs[1][1].splitlines() if ln.startswith("STEP")]
    assert steps0 == steps1 and len(steps0) == 3
