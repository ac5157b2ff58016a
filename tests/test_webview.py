"""Web live viewer: endpoints, wire format, pause control.

The browser-side camera (pan/zoom) is pure JS; these tests cover the
server contract it consumes: /scene geometry JSON, /state binary frames,
and the /control pause toggle the sim loop polls
(reference: pedoni/src/renderer/mod.rs:54-63, 121-136).
"""

from __future__ import annotations

import json
import struct
import time
import urllib.request

import numpy as np
import pytest

from pedoni_tpu.scenario import loads_scenario
from pedoni_tpu.webview import WebViewer

SCENARIO = """
[field]
size = [20, 10]
[[waypoints]]
line = [[1, 1], [1, 9]]
[[obstacles]]
line = [[10, 0], [10, 6]]
width = 2
"""


@pytest.fixture
def viewer():
    sc = loads_scenario(SCENARIO)
    n = 1000
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 10, size=(n, 2)).astype(np.float32)
    dest = (np.arange(n) % 7).astype(np.int32)

    v = WebViewer(sc, fetch=lambda: (pos, dest), port=0, max_agents=300,
                  interval=0.01).start()
    v.set_step(42)
    try:
        yield v, pos, dest
    finally:
        v.stop()


def _get(v: WebViewer, path: str) -> bytes:
    with urllib.request.urlopen(v.url.rstrip("/") + path, timeout=5) as r:
        return r.read()


def test_scene_and_page(viewer):
    v, _, _ = viewer
    page = _get(v, "/").decode()
    assert "<canvas" in page and "wheel" in page and "mousedown" in page
    scene = json.loads(_get(v, "/scene"))
    assert scene["size"] == [20, 10]
    assert scene["obstacles"][0]["width"] == 2
    assert scene["waypoints"][0]["p0"] == [1, 1]
    assert len(scene["colors"]) == 6  # renderer/mod.rs:9-16 cycle


def test_state_wire_format_and_subsampling(viewer):
    v, pos, dest = viewer
    deadline = time.time() + 5
    while time.time() < deadline:
        buf = _get(v, "/state")
        step, n, total = struct.unpack_from("<III", buf, 0)
        # wait for a frame packed AFTER set_step(42) — the stream's first
        # frame can race the fixture's set_step call
        if total and step == 42:
            break
        time.sleep(0.02)
    assert step == 42
    assert total == 1000
    assert n <= 300  # max_agents subsampling
    xs = np.frombuffer(buf, np.float32, n, 12)
    ys = np.frombuffer(buf, np.float32, n, 12 + 4 * n)
    ds = np.frombuffer(buf, np.uint8, n, 12 + 8 * n)
    stride = -(-total // 300)
    np.testing.assert_array_equal(xs, pos[::stride, 0])
    np.testing.assert_array_equal(ys, pos[::stride, 1])
    np.testing.assert_array_equal(ds, dest[::stride].astype(np.uint8))
    assert len(buf) == 12 + 9 * n


def test_pause_control(viewer):
    v, _, _ = viewer
    assert not v.paused
    req = urllib.request.Request(
        v.url.rstrip("/") + "/control",
        data=json.dumps({"toggle": True}).encode(), method="POST")
    resp = json.loads(urllib.request.urlopen(req, timeout=5).read())
    assert resp["paused"] is True and v.paused
    req = urllib.request.Request(
        v.url.rstrip("/") + "/control",
        data=json.dumps({"paused": False}).encode(), method="POST")
    resp = json.loads(urllib.request.urlopen(req, timeout=5).read())
    assert resp["paused"] is False and not v.paused
