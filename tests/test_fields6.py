"""Geometry of the stride-6 field layout (fields6.py): every constant in
the fused kernel's patch math is locked by reconstructing bilinear samples
from the F6 arrays in NumPy, exactly the way the kernel does."""

import numpy as np

from pedoni_tpu.field import PAD, Field, FieldMaps, bilinear_host
from pedoni_tpu.ops.pallas.fields6 import F_OFF, PATCH, ROW0, STRIDE, Fields6
from pedoni_tpu.scenario import loads_scenario

SCENARIO = """
[field]
size = [12, 9]
[[waypoints]]
line = [[2, 2], [2, 7]]
[[obstacles]]
line = [[6, 0], [6, 4]]
width = 1
"""


def _sample_like_kernel(f6: Fields6, plane: np.ndarray, pos, cell_x, cell_y):
    """Reproduce the kernel's patch accumulation for one agent."""
    px = pos[0] * 4.0 - 0.5 + PAD
    py = pos[1] * 4.0 - 0.5 + PAD
    bx, by = np.floor(px), np.floor(py)
    tx, ty = px - bx, py - by
    lane = cell_x + 1
    p0 = bx - cell_x * STRIDE - ROW0
    q0 = by - cell_y * STRIDE - ROW0  # patch-local, absolute F row = +F_OFF
    val = 0.0
    for qy in range(PATCH):
        wy = (1.0 - ty) if q0 == qy else (ty if q0 == qy - 1 else 0.0)
        if wy == 0.0:
            continue
        frow = STRIDE * cell_y + ROW0 + F_OFF + qy
        for qx in range(PATCH):
            wx = (1.0 - tx) if p0 == qx else (tx if p0 == qx - 1 else 0.0)
            if wx == 0.0:
                continue
            c = (ROW0 + qx) % STRIDE
            dlt = (ROW0 + qx) // STRIDE
            val += wy * wx * plane[frow, c, 0, lane + dlt]
    return val


def test_patch_math_matches_bilinear():
    sc = loads_scenario(SCENARIO)
    field = Field.from_scenario(sc, unit=0.25)
    maps = FieldMaps.from_field(field)
    ny = int(np.ceil(sc.size[1] / 1.5))
    nx = int(np.ceil(sc.size[0] / 1.5))
    f6 = Fields6.build(maps, nx, ny_pad=ny + (ny % 2))

    rng = np.random.default_rng(3)
    for _ in range(60):
        pos = rng.uniform(0.3, np.array(sc.size) - 0.3)
        cx = int(pos[0] // 1.5)
        cy = int(pos[1] // 1.5)
        got = _sample_like_kernel(f6, f6.wp[0], pos, cx, cy)
        want = bilinear_host(maps.pot[0], pos / 0.25 - 0.5 + PAD)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-3)
