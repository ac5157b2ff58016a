"""The driver contract: bench.py prints exactly one JSON line with the
agreed keys, whatever else happens."""

import json
import os
import subprocess
import sys


def test_bench_json_contract():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.getcwd()
    proc = subprocess.run(
        [sys.executable, "bench.py", "--agents", "2000", "--steps", "3",
         "--warmup", "1", "--backend", "xla"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout
    d = json.loads(lines[0])
    # the driver's required keys, plus the methodology payload (ADVICE
    # round 2: record best-of-N semantics IN the JSON so downstream
    # comparisons are apples-to-apples)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(d.keys())
    assert d["metric"] == "agent_steps_per_sec"
    assert d["value"] > 0
    assert d["vs_baseline"] == d["value"] / 1e9
    assert d["ms_per_step"] > 0
    assert "best-of" in d["method"]
