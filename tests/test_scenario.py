import pytest

from pedoni_tpu.scenario import load_scenario, loads_scenario

STRAIGHT = """
[field]
size = [20, 10]

[[waypoints]]
line = [[6, 4.2], [6, 5.8]]

[[waypoints]]
line = [[14, 4.2], [14, 5.8]]

[[obstacles]]
line = [[5, 4], [15, 4]]
width = 0.3

[[pedestrians]]
origin = 0
destination = 1
spawn = { kind = "periodic", frequency = 2.0 }

[[pedestrians]]
origin = 1
destination = 0
spawn = { kind = "once", count = 7 }
"""


def test_parse_basic():
    s = loads_scenario(STRAIGHT)
    assert s.size == (20.0, 10.0)
    assert len(s.waypoints) == 2
    assert s.waypoints[0].line == ((6.0, 4.2), (6.0, 5.8))
    assert s.waypoints[0].width == 1.0  # default width, scenario.rs:41-42
    assert s.obstacles[0].width == pytest.approx(0.3)
    assert s.pedestrians[0].spawn.kind == "periodic"
    assert s.pedestrians[0].spawn.frequency == 2.0
    assert s.pedestrians[1].spawn.kind == "once"
    assert s.pedestrians[1].spawn.count == 7
    assert len(s.periodic_groups) == 1
    assert len(s.once_groups) == 1


def test_unknown_keys_ignored():
    # random.toml in the reference has a stray `unit` key under [field];
    # serde drops it silently (SURVEY.md section 5), and so do we.
    s = loads_scenario(
        """
[field]
size = [5, 5]
unit = 0.25
bogus = "x"
"""
    )
    assert s.size == (5.0, 5.0)


def test_bad_spawn_kind():
    with pytest.raises(ValueError):
        loads_scenario(
            """
[field]
size = [5, 5]
[[waypoints]]
line = [[0,0],[1,1]]
[[pedestrians]]
origin = 0
destination = 0
spawn = { kind = "sometimes" }
"""
        )


def test_waypoint_index_validated():
    with pytest.raises(ValueError):
        loads_scenario(
            """
[field]
size = [5, 5]
[[waypoints]]
line = [[0,0],[1,1]]
[[pedestrians]]
origin = 0
destination = 3
spawn = { kind = "once", count = 1 }
"""
        )


def test_all_reference_scenarios_load(reference_scenarios):
    # Every scenario bundled with the reference must load unchanged
    # (SURVEY.md section 7 step 1).
    paths = sorted(reference_scenarios.glob("*.toml"))
    assert len(paths) == 14
    for path in paths:
        s = load_scenario(path)
        assert s.size[0] > 0 and s.size[1] > 0
        assert len(s.waypoints) >= 1
        for g in s.pedestrians:
            assert g.spawn.kind in ("periodic", "once")
