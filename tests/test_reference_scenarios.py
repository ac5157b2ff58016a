"""Integration: the reference's own scenario files must load AND run.

The default suite covers the structurally hardest cases to stay fast;
``pytest -m slow`` adds the full 14-file sweep including the
4000x4000-cell default10/random10 field builds.
"""

import pathlib

import pytest

from pedoni_tpu import Simulator, SimulatorOptions, load_scenario

ALL_SCENARIOS = sorted(
    p.name for p in pathlib.Path("/root/reference/scenarios").glob("*.toml")
) if pathlib.Path("/root/reference/scenarios").is_dir() else []


@pytest.mark.parametrize(
    "name, expect_agents",
    [
        ("evacuation.toml", True),   # 33 waypoints, 100 obstacles, once-spawns
        ("random.toml", True),       # 1004 obstacles, stray `unit` key
        ("narrow-gap.toml", True),   # once 50 through a gap
        ("straight.toml", False),    # periodic only: few agents in 5 steps
    ],
)
def test_reference_scenario_runs(reference_scenarios, name, expect_agents):
    sc = load_scenario(reference_scenarios / name)
    sim = Simulator(SimulatorOptions(seed=0), sc)
    rec = None
    for _ in range(5):
        rec = sim.tick()
    assert rec is not None and rec.active_ped_count >= 0
    if expect_agents:
        assert rec.active_ped_count > 0
    pos, dest = sim.list_pedestrians()
    if len(pos):
        w, h = sc.size
        assert (pos[:, 0] >= 0).all() and (pos[:, 0] <= w).all()
        assert (pos[:, 1] >= 0).all() and (pos[:, 1] <= h).all()
        assert (dest >= 0).all() and (dest < len(sc.waypoints)).all()


@pytest.mark.slow
@pytest.mark.parametrize("name", ALL_SCENARIOS)
def test_reference_scenario_sweep(reference_scenarios, name):
    """Every bundled reference TOML builds its field and runs 5 steps
    (includes the default10/random10 4000^2-cell FMM stress builds)."""
    sc = load_scenario(reference_scenarios / name)
    sim = Simulator(SimulatorOptions(seed=0), sc)
    rec = None
    for _ in range(5):
        rec = sim.tick()
    assert rec is not None and rec.active_ped_count >= 0
    pos, dest = sim.list_pedestrians()
    if len(pos):
        w, h = sc.size
        assert (pos[:, 0] >= 0).all() and (pos[:, 0] <= w).all()
        assert (pos[:, 1] >= 0).all() and (pos[:, 1] <= h).all()
