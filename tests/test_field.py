import numpy as np
import pytest

from pedoni_tpu import field as field_mod
from pedoni_tpu.field import Field, FieldMaps, bilinear_host, fmm_python, sobel_host
from pedoni_tpu.scenario import Scenario, Segment, loads_scenario
from pedoni_tpu.utils.geometry import distance_from_segment, widen_segment


def test_bilinear_matches_reference_cases():
    # util.rs:156-163 test_bilinear
    grid = np.array([[1.0, 0.0, 4.0], [3.0, 1.0, -1.0]], dtype=np.float32)
    assert bilinear_host(grid, (0.0, 0.0)) == pytest.approx(1.0)
    assert bilinear_host(grid, (0.5, 0.0)) == pytest.approx(0.5)
    assert bilinear_host(grid, (0.0, 0.25)) == pytest.approx(1.5)
    assert bilinear_host(grid, (0.5, 0.5)) == pytest.approx(1.25)


def test_bilinear_oob_returns_large():
    grid = np.zeros((2, 2), dtype=np.float32)
    assert bilinear_host(grid, (-5.0, 0.0)) == pytest.approx(1e12)


def test_distance_from_segment():
    # util.rs:148-155 test_distance_from_line
    line = (np.array([1.0, 1.0]), np.array([4.0, 1.0]))
    d1 = np.linalg.norm(distance_from_segment(np.array([2.0, 3.0]), *line))
    d2 = np.linalg.norm(distance_from_segment(np.array([0.0, 0.25]), *line))
    assert d1 == pytest.approx(2.0)
    assert d2 == pytest.approx(1.25)


def test_widen_segment():
    corners = widen_segment((0.0, 0.0), (2.0, 0.0), 1.0)
    assert sorted(map(tuple, corners.tolist())) == [
        (0.0, -0.5),
        (0.0, 0.5),
        (2.0, -0.5),
        (2.0, 0.5),
    ]


def test_fmm_uniform_distance():
    # Distance from a single source grows like the Eikonal solution; along
    # the axes it is the cell count times the slowness.
    h = w = 21
    pot = np.full((h, w), 1e24, dtype=np.float32)
    pot[10, 10] = 0.0
    f = np.full((h, w), 1.0, dtype=np.float32)
    out = fmm_python(pot, f)
    assert out[10, 10] == 0.0
    assert out[10, 14] == pytest.approx(4.0, abs=1e-5)
    assert out[14, 10] == pytest.approx(4.0, abs=1e-5)
    # Diagonal arrival time is between the euclidean distance and the
    # manhattan distance (first-order FMM overestimates sqrt(2)).
    assert np.sqrt(32.0) <= out[14, 14] <= 8.0
    # Monotone away from the source along a row.
    row = out[10, 10:]
    assert np.all(np.diff(row) > 0)


def test_fmm_wall_blocks():
    # A solid vertical wall of huge slowness forces the potential to go
    # around; the cell right behind the wall must be much more expensive
    # than the unobstructed straight-line cost.
    h, w = 11, 11
    pot = np.full((h, w), np.float32(np.finfo(np.float32).max), dtype=np.float32)
    pot[5, 1] = 0.0
    f = np.ones((h, w), dtype=np.float32)
    f[:, 5] = 1e6  # wall across entire column
    out = fmm_python(pot, f)
    assert out[5, 4] == pytest.approx(3.0, abs=1e-4)
    assert out[5, 6] > 1e5  # must pay the wall at least once


def test_native_fmm_matches_python():
    from pedoni_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    h, w = 37, 29
    pot = np.full((h, w), np.float32(np.finfo(np.float32).max), dtype=np.float32)
    pot[3, 4] = 0.0
    pot[30, 20] = 0.0
    f = rng.uniform(0.5, 2.0, size=(h, w)).astype(np.float32)
    ref = fmm_python(pot, f)
    out = native.fmm(pot, f)
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def _tiny_scenario() -> Scenario:
    # Mirrors field.rs:287-324 test_parse_scenario: 5x5 field, two
    # horizontal half-walls, one waypoint on the left edge.
    return Scenario(
        size=(5.0, 5.0),
        obstacles=(
            Segment(line=((0.0, 1.5), (4.0, 1.5))),
            Segment(line=((1.0, 3.5), (5.0, 3.5))),
        ),
        waypoints=(Segment(line=((0.0, 0.0), (0.0, 1.0))),),
    )


def test_field_from_scenario_structure():
    field = Field.from_scenario(_tiny_scenario(), unit=0.25)
    assert field.shape == (20, 20)
    # Boundary ring is obstacle (field.rs:29-32).
    assert field.obstacle_exist[0].all()
    assert field.obstacle_exist[-1].all()
    assert field.obstacle_exist[:, 0].all()
    assert field.obstacle_exist[:, -1].all()
    # The two walls rasterized: y = 1.5 m -> row 6, x in [0,4] m.
    assert field.obstacle_exist[6, 2:14].all()
    # Distance map is 0 on obstacles, positive elsewhere.
    assert np.all(field.distance_map[field.obstacle_exist] == 0.0)
    assert np.all(field.distance_map[~field.obstacle_exist] > 0.0)
    # The potential increases with geodesic distance around the walls: a
    # point below the first wall is farther (through the gap) than a point
    # above it.
    p_near = field.get_potential(0, (0.5, 0.5))
    p_mid = field.get_potential(0, (0.5, 2.5))
    p_far = field.get_potential(0, (0.5, 4.5))
    assert p_near < p_mid < p_far


def test_straight_scenario_potential_guides_to_waypoint():
    s = loads_scenario(
        """
[field]
size = [20, 10]
[[waypoints]]
line = [[6, 4.2], [6, 5.8]]
[[waypoints]]
line = [[14, 4.2], [14, 5.8]]
[[obstacles]]
line = [[5, 4], [15, 4]]
width = 0.3
[[obstacles]]
line = [[5, 6], [15, 6]]
width = 0.3
"""
    )
    field = Field.from_scenario(s, unit=0.25)
    assert field.potential_maps.shape == (2, 40, 80)
    # Thin 0.3 m walls must still rasterize (conservative supercover).
    assert field.obstacle_exist[16, 24:56].any()
    # Inside the corridor, walking toward waypoint 1 (x = 14) lowers its
    # potential.
    p_here = field.get_potential(1, (8.0, 5.0))
    p_closer = field.get_potential(1, (12.0, 5.0))
    assert p_closer < p_here


def test_gradient_maps_match_reference_sobel():
    # bilinear(sobel_convolved, p) must equal the reference's 8-tap
    # bilinear Sobel exactly (linearity), including near boundaries where
    # out-of-bounds taps read 1e12.
    field = Field.from_scenario(_tiny_scenario(), unit=0.25)
    maps = FieldMaps.from_field(field)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.5, 19.5, size=(50, 2))
    for p in pts:
        ref = sobel_host(field.potential_maps[0], p)
        got_x = bilinear_host(maps.pot_gx[0], p + field_mod.PAD)
        got_y = bilinear_host(maps.pot_gy[0], p + field_mod.PAD)
        np.testing.assert_allclose([got_x, got_y], ref, rtol=1e-5, atol=1e-2)


def test_field_maps_shapes():
    field = Field.from_scenario(_tiny_scenario(), unit=0.25)
    maps = FieldMaps.from_field(field)
    hp, wp = 20 + 2 * field_mod.PAD, 20 + 2 * field_mod.PAD
    assert maps.pot.shape == (1, hp, wp)
    assert maps.dist.shape == (hp, wp)
    assert maps.pot.dtype == np.float32
