"""Terminal renderer: camera pan/zoom math, density glyphs, key decoding,
and the async snapshot stream (renderer/mod.rs:54-168 counterpart)."""

import io
import sys
import time

import numpy as np

from pedoni_tpu.renderer import SnapshotStream, TerminalRenderer
from pedoni_tpu.scenario import loads_scenario

SCENARIO = """
[field]
size = [200, 100]
[[waypoints]]
line = [[5, 5], [5, 95]]
[[obstacles]]
line = [[100, 0], [100, 50]]
width = 2
"""


def _draw_to_string(r, pos, dest, step=1):
    old = sys.stdout
    sys.stdout = io.StringIO()
    try:
        r.draw(pos, dest, step)
        return sys.stdout.getvalue()
    finally:
        sys.stdout = old


def test_camera_pan_zoom():
    sc = loads_scenario(SCENARIO)
    r = TerminalRenderer(sc, width=60)
    pos = np.array([[150.0, 50.0]], np.float32)
    dest = np.zeros(1, np.int32)

    out_full = _draw_to_string(r, pos, dest)
    assert "●" in out_full or "•" in out_full or "·" in out_full
    assert "zoom  1.0x" in out_full

    # Zoom into the left half: the agent at x=150 leaves the view.
    assert r.handle_key("+")
    r.cx, r.cy = 25.0, 50.0
    assert r.handle_key("+")  # rebuilds static with the new center
    out_zoom = _draw_to_string(r, pos, dest)
    assert "·" not in out_zoom and "•" not in out_zoom and "●" not in out_zoom

    # Pan right repeatedly: the agent comes back into view.
    for _ in range(12):
        r.handle_key("RIGHT")
    out_pan = _draw_to_string(r, pos, dest)
    assert "·" in out_pan or "•" in out_pan or "●" in out_pan

    # Reset restores the full view.
    r.handle_key("0")
    assert r.zoom == 1.0
    # Unknown keys are not consumed.
    assert not r.handle_key("x")


def test_density_glyphs():
    sc = loads_scenario(SCENARIO)
    r = TerminalRenderer(sc, width=60)
    # 5 agents in the same character cell -> the densest glyph.
    pos = np.tile(np.array([[150.0, 50.0]], np.float32), (5, 1))
    out = _draw_to_string(r, pos, np.zeros(5, np.int32))
    assert "█" in out.replace("\x1b[90m█\x1b[0m", "")  # agent block, not wall


def test_snapshot_stream_decouples():
    frames = []
    stream = SnapshotStream(
        fetch=lambda: (np.zeros((1, 2), np.float32), np.zeros(1, np.int32)),
        on_frame=lambda pos, dest: frames.append(len(pos)),
        interval=0.01,
    ).start()
    time.sleep(0.15)
    stream.stop()
    assert len(frames) >= 3  # rendered repeatedly without the caller looping


def test_arrow_key_decode():
    from pedoni_tpu.renderer import KeyPoller

    kp = KeyPoller.__new__(KeyPoller)  # skip tty setup
    kp._enabled = False
    assert kp.poll() == []
    assert KeyPoller._decode(["\x1b", "[", "A", "q", "\x1b", "[", "D"]) == \
        ["UP", "q", "LEFT"]
    assert KeyPoller._decode(["\x1b"]) == ["\x1b"]  # lone escape passes
