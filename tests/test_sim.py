import numpy as np
import pytest

from pedoni_tpu import Simulator, SimulatorOptions, loads_scenario

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
[[obstacles]]
line = [[5, 6], [15, 6]]
width = 0.3
[[pedestrians]]
origin = 0
destination = 1
spawn = { kind = "periodic", frequency = 2.0 }
[[pedestrians]]
origin = 1
destination = 0
spawn = { kind = "periodic", frequency = 2.0 }
"""

NARROW_GAP = """
[field]
size = [20, 20]
[[waypoints]]
line = [[3, 3], [3, 17]]
[[waypoints]]
line = [[12, 3], [12, 17]]
[[obstacles]]
line = [[10, 0], [10, 10]]
width = 2
[[obstacles]]
line = [[10, 13], [10, 20]]
width = 2
[[pedestrians]]
origin = 0
destination = 1
spawn = { kind = "once", count = 30 }
"""


def make_sim(toml: str, **opts) -> Simulator:
    return Simulator(SimulatorOptions(**opts), loads_scenario(toml))


def test_once_spawn_initial_state():
    sim = make_sim(NARROW_GAP, seed=1)
    assert sim.pedestrian_count == 30
    pos, dest = sim.list_pedestrians()
    # All spawned along waypoint 0's line: x = 3, y in [3, 17].
    np.testing.assert_allclose(pos[:, 0], 3.0, atol=1e-5)
    assert (pos[:, 1] >= 3.0).all() and (pos[:, 1] <= 17.0).all()
    assert (dest == 1).all()


def test_agents_move_toward_destination():
    sim = make_sim(NARROW_GAP, seed=1)
    pos0, _ = sim.list_pedestrians()
    for _ in range(50):
        sim.tick()
    pos1, _ = sim.list_pedestrians()
    # After 5 sim-seconds the crowd's mean x must have moved right toward
    # the gap / waypoint 1 at x = 12.
    assert pos1[:, 0].mean() > pos0[:, 0].mean() + 1.0
    # Nobody leaves the field.
    assert (pos1 >= 0.0).all()
    assert (pos1[:, 0] <= 20.0).all() and (pos1[:, 1] <= 20.0).all()


def test_evacuation_completes():
    sim = make_sim(NARROW_GAP, seed=2)
    for step in range(600):
        rec = sim.tick()
        if rec.active_ped_count == 0:
            break
    # 30 agents through a 3 m gap, ~9 m of travel: well under 60 s.
    assert rec.active_ped_count == 0
    assert 60 < step < 600


def test_periodic_spawn_reaches_steady_state():
    sim = make_sim(STRAIGHT, seed=3)
    counts = []
    for _ in range(200):
        rec = sim.tick()
        counts.append(rec.active_ped_count)
    # Poisson 2.0/s x 2 groups, ~8 m to walk at ~1.3 m/s -> roughly
    # 4 * 6 = 25 agents in flight at steady state.  Loose sanity band.
    tail = np.mean(counts[100:])
    assert 5 < tail < 80
    # Spawning actually happened.
    assert max(counts) > 0


def test_despawn_at_destination():
    # One agent placed right at its destination despawns on the first tick.
    toml = """
[field]
size = [10, 10]
[[waypoints]]
line = [[2, 2], [2, 8]]
[[waypoints]]
line = [[8, 2], [8, 8]]
[[pedestrians]]
origin = 0
destination = 0
spawn = { kind = "once", count = 5 }
"""
    sim = make_sim(toml, seed=0)
    assert sim.pedestrian_count == 5
    rec = sim.tick()
    assert rec.active_ped_count == 0


def test_no_neighbor_grid_matches_grid_roughly():
    # All-pairs fallback (sfm.rs:158-184) should give a simulation in the
    # same regime as the cell-list path on a small scenario.
    sim_a = make_sim(NARROW_GAP, seed=5)
    sim_b = make_sim(NARROW_GAP, seed=5, use_neighbor_grid=False)
    for _ in range(30):
        ra = sim_a.tick()
        rb = sim_b.tick()
    assert ra.active_ped_count == rb.active_ped_count
    pa, _ = sim_a.list_pedestrians()
    pb, _ = sim_b.list_pedestrians()
    # Same seed, same physics; cell list only restricts the candidate set
    # (2 m cutoff is what matters), so trajectories track closely.
    assert np.abs(pa.mean(axis=0) - pb.mean(axis=0)).max() < 0.5


def test_no_distance_map_mode_runs():
    sim = make_sim(NARROW_GAP, seed=6, use_distance_map=False)
    for _ in range(20):
        rec = sim.tick()
    assert rec.active_ped_count > 0
    pos, _ = sim.list_pedestrians()
    assert np.isfinite(pos).all()


def test_metrics_counts_finite():
    sim = make_sim(STRAIGHT, seed=7)
    rec = sim.tick()
    assert rec.active_ped_count >= 0
    assert rec.time_calc_state > 0.0


def test_fused_backends_run_all_pairs_mode():
    """--no-neighbor-grid on the fused backends (args.rs:27-29): the
    reference's all-pairs path keeps the 2 m cutoff (sfm.rs:158-184), so
    the Simulator grows the cell unit to cover the cutoff (and the table
    capacity by the area ratio) instead of rejecting the flag — the 3x3
    window then finds exactly the all-pairs interaction set (physics
    equivalence vs the XLA all-pairs pass:
    test_grid_backend.py::test_grid_all_pairs_unit_matches_xla_all_pairs)."""
    sim = make_sim(STRAIGHT, backend="grid", use_neighbor_grid=False, seed=4)
    assert sim.options.neighbor_grid_unit == 2.0
    assert sim.options.table_capacity == 29  # ceil(16 * (2.0/1.5)^2)
    for _ in range(3):
        rec = sim.tick()
    assert rec.active_ped_count >= 0 and rec.time_calc_state > 0.0


def test_grid_backend_runs_segment_obstacle_mode():
    """--no-distance-map DOES run on the grid backend: the kernel switches
    to statically unrolled per-segment obstacle geometry (sfm.rs:194-237;
    exactness vs the XLA segment pass is covered in test_step_kernel.py).
    Here: the Simulator wiring accepts the flag and the physics stays
    sane."""
    sim = make_sim(NARROW_GAP, seed=6, backend="grid",
                   use_distance_map=False)
    for _ in range(10):
        rec = sim.tick()
    assert rec.active_ped_count > 0
    pos, _ = sim.list_pedestrians()
    assert np.isfinite(pos).all()


def test_xla_nonfinite_velocity_contained():
    """XLA-backend fault containment: a NaN-velocity agent exerts zero
    force, flings out of the grid on integration and despawns counted —
    it must not NaN-poison its 3x3 neighborhood through the dense pass."""
    import jax.numpy as jnp

    sim = make_sim(NARROW_GAP, seed=11)  # 30 once-spawned, no inflow
    a = sim.state.agents
    vel = np.asarray(a.vel).copy()
    act = np.asarray(a.active)
    idx = int(np.flatnonzero(act)[0])
    vel[idx] = (np.nan, np.nan)
    sim.state = sim.state._replace(agents=a._replace(vel=jnp.asarray(vel)))
    n0 = int(act.sum())
    for _ in range(3):
        rec = sim.tick()
    pos, _ = sim.list_pedestrians()
    assert np.isfinite(pos).all(), "NaN escaped containment on the xla path"
    assert rec.active_ped_count == n0 - 1  # only the poisoned agent died


def test_run_throughput_mode():
    """Simulator.run advances N steps without per-step host syncs and
    returns the final step's record (bench-style throughput surface)."""
    sim = make_sim(NARROW_GAP, seed=4)
    rec = sim.run(25, sync_every=5)
    assert sim.step_count == 25
    assert rec.active_ped_count > 0
    assert rec.time_calc_state > 0
    pos, _ = sim.list_pedestrians()
    assert np.isfinite(pos).all()


def test_run_accumulates_metrics_on_device():
    """run() must report TOTALS over the whole run (device-side running
    sums), not just the final step's counters: a fresh sim ticked N times
    and an identical sim run(N) see the same spawned/dropped/overflow/
    exited totals and the same max demand (VERDICT round-3 weak #2)."""
    n = 24
    sim_t = make_sim(STRAIGHT, seed=7, backend="grid")
    per_tick = []
    last_rec = None
    for _ in range(n):
        last_rec = sim_t.tick()
        per_tick.append(sim_t.last_metrics)
    totals = {
        "n_spawned": sum(int(m.n_spawned) for m in per_tick),
        "n_dropped": sum(int(m.n_dropped) for m in per_tick),
        "n_overflow": sum(int(m.n_overflow) for m in per_tick),
        "n_exited": sum(int(m.n_exited) for m in per_tick),
        "max_demand": max(int(m.max_demand) for m in per_tick),
    }
    assert last_rec.active_ped_count > 0

    sim_r = make_sim(STRAIGHT, seed=7, backend="grid")
    rec = sim_r.run(n)
    tm = sim_r.last_run_metrics
    assert int(tm.n_spawned) == totals["n_spawned"] > 0
    assert int(tm.n_dropped) == totals["n_dropped"]
    assert int(tm.n_overflow) == totals["n_overflow"]
    assert int(tm.n_exited) == totals["n_exited"]
    assert int(tm.max_demand) == totals["max_demand"] > 0
    assert rec.active_ped_count == last_rec.active_ped_count


FAST_SPAWN = STRAIGHT.replace("frequency = 2.0", "frequency = 30.0")


def test_run_grows_flat_capacity_at_sync_points():
    """run()'s sync points monitor the flat backends' agent capacity the
    same way tick() does (grow at 80%), so long throughput runs survive
    accumulating populations without drops."""
    sim = make_sim(FAST_SPAWN, seed=4, capacity=32)
    assert sim.cfg.capacity == 32
    for _ in range(4):
        sim.run(10, sync_every=5)
    assert sim.cfg.capacity > 32     # growth actually happened mid-run
    rec = sim.tick()
    # demand 6/step against capacity 32: without growth, drops would be
    # unavoidable; with sync-point growth the population keeps rising
    assert rec.active_ped_count > 32


CONVERGE = """
[field]
size = [18, 12]
[[waypoints]]
line = [[16, 2], [16, 10]]
"""


def test_grid_table_growth_is_drop_free():
    """Forced densification on the grid backend: peak cell demand reaching
    K-1 grows table_capacity BEFORE any cell overflows (rebin demand_max
    output -> Simulator preemptive growth), so no agent is ever lost."""
    import jax
    import jax.numpy as jnp

    from pedoni_tpu.models.sfm import AgentState, SimState

    sim = make_sim(CONVERGE, backend="grid", table_capacity=4, seed=0)
    cap = sim.cfg.capacity
    pos = np.zeros((cap, 2), np.float32)
    vel = np.zeros((cap, 2), np.float32)
    # 3 agents in cell (0,1) walking right toward cell (0,2), which
    # already holds 3 = K-1 agents: the first tick reports demand K-1
    # and must grow the table BEFORE the movers arrive (~3 steps at
    # <= 0.174 m/step) and overflow K=4.
    for i, y in enumerate((0.25, 0.75, 1.25)):
        pos[i] = (2.5, y)
        pos[3 + i] = (3.8, y)
        vel[i] = vel[3 + i] = (1.0, 0.0)
    agents = AgentState(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel),
        speed=jnp.full((cap,), 1.34, jnp.float32),
        dest=jnp.zeros((cap,), jnp.int32),
        active=jnp.asarray(np.arange(cap) < 6),
    )
    sim.state = sim._from_flat_state(
        SimState(agents=agents, key=jax.random.PRNGKey(0), step=jnp.int32(0)))
    assert sim.pedestrian_count == 6
    for _ in range(12):
        rec = sim.tick()
        # far from the waypoint and inside the field: any count drop
        # would be an overflow loss
        assert rec.active_ped_count == 6
    assert sim.options.table_capacity > 4  # growth actually happened


def test_run_sync_free_growth_is_drop_free():
    """run(n, sync_every=0) must grow the grid table drop-free like
    tick() (VERDICT round-4 weak #7): the lagged in-loop guard fetches
    metrics a few dispatches old every guard_every steps, so a
    densifying sync-free throughput run grows BEFORE any cell overflows
    and loses zero agents."""
    import jax
    import jax.numpy as jnp

    from pedoni_tpu.models.sfm import AgentState, SimState

    sim = make_sim(CONVERGE, backend="grid", table_capacity=4, seed=0)
    cap = sim.cfg.capacity
    pos = np.zeros((cap, 2), np.float32)
    vel = np.zeros((cap, 2), np.float32)
    # 3 agents in cell (0,1) walking right toward cell (0,2), which
    # already holds 3 = K-1 agents.  The movers start 1.1 m from the
    # cell boundary (>= 7 steps at <= 0.174 m/step); the guard's first
    # check (step guard_every=4, metrics of step 1, demand K-1) grows
    # the table before they arrive.
    for i, y in enumerate((0.25, 0.75, 1.25)):
        pos[i] = (1.9, y)
        pos[3 + i] = (3.8, y)
        vel[i] = vel[3 + i] = (1.0, 0.0)
    agents = AgentState(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel),
        speed=jnp.full((cap,), 1.34, jnp.float32),
        dest=jnp.zeros((cap,), jnp.int32),
        active=jnp.asarray(np.arange(cap) < 6),
    )
    sim.state = sim._from_flat_state(
        SimState(agents=agents, key=jax.random.PRNGKey(0), step=jnp.int32(0)))
    assert sim.pedestrian_count == 6
    rec = sim.run(16, sync_every=0)
    assert sim.options.table_capacity > 4   # growth happened mid-run
    tm = sim.last_run_metrics
    assert int(tm.n_overflow) == 0          # ...and it was drop-free
    assert int(tm.n_dropped) == 0
    assert rec.active_ped_count == 6


def test_measure_spawn_time_slot():
    """The time_spawn diagnostic slot (reference lib.rs:68-74,
    diagnostic.rs:45): on the grid backend the isolated spawn-scatter
    fence returns a positive time; scenarios without spawn sources
    report 0.0; non-grid backends report None (slot stays 0.0)."""
    sim = make_sim(STRAIGHT, backend="grid", seed=2)
    t = sim.measure_spawn_time(n=2)
    assert t is not None and t > 0.0

    no_spawn = make_sim(CONVERGE, backend="grid", seed=2)
    assert no_spawn.measure_spawn_time(n=1) == 0.0

    xla = make_sim(STRAIGHT, seed=2)
    assert xla.measure_spawn_time() is None


def test_incremental_rebin_auto_rule():
    """incremental_rebin=None resolves by expected cell occupancy
    (round-5 density sweep: full rebin wins at lambda ~ 1.1, the
    incremental family at lambda >= 2.25; threshold 1.75).  Explicit
    settings always win over the auto rule."""
    # NARROW_GAP: 30 agents on 20x20 m -> lambda = 30/400 * 2.25 ~ 0.17
    sparse = make_sim(NARROW_GAP, backend="grid")
    assert sparse._resolve_incremental() is False
    # Dense variant: 1200 agents on 20x20 m -> lambda ~ 6.75
    dense_toml = NARROW_GAP.replace("count = 30", "count = 1200")
    dense = Simulator(SimulatorOptions(backend="grid", table_capacity=18),
                      loads_scenario(dense_toml))
    assert dense._resolve_incremental() is True
    forced = make_sim(NARROW_GAP, backend="grid", incremental_rebin=True)
    assert forced._resolve_incremental() is True
