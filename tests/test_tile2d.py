"""2D tile-sharded grid backend (parallel/tile2d.py) vs single chip.

Every kernel block of the tiled step sees exactly the window a single
chip would (ghost lanes + ghost rows, corners via exchange ordering), so
R x C results must match the single-chip grid backend to float-reduction
tolerance, including spawns near tile boundaries and migration in any of
the 8 directions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pedoni_tpu.field import Field, FieldMaps
from pedoni_tpu.models import sfm_grid, sfm_pallas
from pedoni_tpu.models.sfm import AgentState, SimState, StepConfig
from pedoni_tpu.parallel import tile2d
from pedoni_tpu.scenario import loads_scenario

SCENARIO_NOSPAWN = """
[field]
size = [18, 12]
[[waypoints]]
line = [[2, 2], [2, 10]]
[[waypoints]]
line = [[16, 2], [16, 10]]
[[obstacles]]
line = [[9, 0], [9, 5]]
width = 1
"""

SCENARIO = SCENARIO_NOSPAWN + """
[[pedestrians]]
origin = 0
destination = 1
spawn = { kind = "periodic", frequency = 6.0 }
"""


def _setup(n=140, seed=5, k=10, unit=1.5, toml=SCENARIO, n_dest=2):
    sc = loads_scenario(toml)
    field = Field.from_scenario(sc, unit=0.25)
    maps = FieldMaps.from_field(field)
    cfg = StepConfig.build(sc, capacity=512, neighbor_grid_unit=unit,
                           table_capacity=k)
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0.8, np.array(sc.size) - 0.8, (512, 2)).astype(np.float32)
    vel = rng.normal(0, 0.3, (512, 2)).astype(np.float32)
    speed = np.clip(rng.normal(1.34, 0.26, 512), 0.3, None).astype(np.float32)
    dest = rng.integers(0, n_dest, 512).astype(np.int32)
    active = np.zeros(512, bool)
    active[:n] = True
    agents = AgentState(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                        speed=jnp.asarray(speed), dest=jnp.asarray(dest),
                        active=jnp.asarray(active))
    return maps, cfg, SimState(agents=agents, key=jax.random.PRNGKey(11),
                               step=jnp.int32(0))


def _active_set(agents):
    act = np.asarray(agents.active)
    rows = np.concatenate(
        [np.asarray(agents.pos), np.asarray(agents.vel),
         np.asarray(agents.speed)[:, None],
         np.asarray(agents.dest)[:, None].astype(np.float32)], axis=1)[act]
    return rows[np.lexsort((rows[:, 1], rows[:, 0]))]


def _run_single(maps, cfg, state0, n_steps, **step_kw):
    fwp, fobs = map(jnp.asarray, sfm_pallas.pallas_device_inputs(cfg, maps))
    step = jax.jit(sfm_grid.make_step_grid(cfg, maps, **step_kw))
    sg = sfm_grid.bin_state(cfg, state0)
    for _ in range(n_steps):
        sg, m = step(sg, fwp, fobs)
        jax.block_until_ready(sg)
    return sfm_grid.unbin_state(cfg, sg), m


def _run_tiled(maps, cfg, state0, n_steps, rows, cols, **step_kw):
    tcfg = tile2d.Tile2DConfig.build(cfg, rows, cols)
    mesh = tile2d.make_mesh(tcfg)
    wp, obs = tile2d.device_inputs_on_mesh(tcfg, mesh, maps)
    gs = tile2d.make_sharded_grid_state(tcfg, mesh, state0)
    step = jax.jit(tile2d.make_sharded_step(tcfg, mesh, **step_kw))
    for _ in range(n_steps):
        gs, m = step(gs, wp, obs)
        jax.block_until_ready(gs)  # lockstep: 1-core CPU collective safety
    return tile2d.unbin_sharded(tcfg, gs), m


@pytest.mark.parametrize(
    "rows,cols",
    [
        (1, 2),
        pytest.param(2, 2, marks=pytest.mark.slow),
        # uneven division: nx=12 over 5 column tiles -> tiles own
        # 3,3,3,3,0 cells (partial ownership + one fully empty device)
        (1, 5),
        # uneven rows: ny=8 over 3 row strips of 4 -> strips own
        # 4,4,0 rows (an entirely empty trailing strip)
        pytest.param(3, 2, marks=pytest.mark.slow),
    ],
)
def test_tiled_equals_single_chip(rows, cols):
    maps, cfg, state0 = _setup()
    want, m1 = _run_single(maps, cfg, state0, n_steps=4)
    got, mn = _run_tiled(maps, cfg, state0, n_steps=4, rows=rows, cols=cols)
    assert int(mn.n_active) == int(m1.n_active)
    assert int(mn.n_spawned) == int(m1.n_spawned)
    a, b = _active_set(want.agents), _active_set(got.agents)
    assert a.shape == b.shape
    # Same FMA-contraction tolerance story as test_grid_shard.py.
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=2e-2)


def test_tiled_incremental_equals_single_chip():
    """The hybrid incremental rebin on the TILED path (kernel 1 emits
    the mover table, M rides the same double ghost exchange as G, the
    stay side is owned-lane gated): pure-incremental steps (cadence
    pushed past the horizon so only step 0 compacts) must reproduce the
    single-chip step under the SAME cadence, including agents crossing
    tile boundaries through M's ghosts."""
    maps, cfg, state0 = _setup()
    want, m1 = _run_single(maps, cfg, state0, n_steps=4,
                           compact_every=1000)
    got, mn = _run_tiled(maps, cfg, state0, n_steps=4, rows=1, cols=2,
                         compact_every=1000)
    assert int(mn.n_active) == int(m1.n_active)
    assert int(mn.n_spawned) == int(m1.n_spawned)
    a, b = _active_set(want.agents), _active_set(got.agents)
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=2e-2)


def test_migration_across_columns():
    """Agents walking +x cross a column-tile boundary and arrive in the
    lane-neighbor's bins with no loss (migration = the rebin picking
    movers out of a ghost lane)."""
    sc = loads_scenario(SCENARIO_NOSPAWN)
    field = Field.from_scenario(sc, unit=0.25)
    maps = FieldMaps.from_field(field)
    cfg = StepConfig.build(sc, capacity=64, neighbor_grid_unit=1.5,
                           table_capacity=6)
    # nx=12 columns, 2 column tiles -> boundary at x = 6 cells = 9.0 m;
    # use y rows clear of the obstacle (it spans x=9, y<5).
    pos = np.zeros((64, 2), np.float32)
    vel = np.zeros((64, 2), np.float32)
    for i, y in enumerate((6.5, 7.5, 9.5, 10.5)):
        pos[i] = (8.93, y)              # near the column boundary
        vel[i] = (1.0, 0.0)             # walking +x
    agents = AgentState(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel),
        speed=jnp.full((64,), 1.34, jnp.float32),
        dest=jnp.ones((64,), jnp.int32),
        active=jnp.asarray(np.arange(64) < 4),
    )
    state0 = SimState(agents=agents, key=jax.random.PRNGKey(0),
                      step=jnp.int32(0))
    got, m = _run_tiled(maps, cfg, state0, n_steps=2, rows=1, cols=2)
    assert int(m.n_active) == 4
    gact = np.asarray(got.agents.active)
    gpos = np.asarray(got.agents.pos)[gact]
    assert gpos.shape[0] == 4
    assert (gpos[:, 0] > 9.0).all()  # all four crossed into the right tile
    assert int(m.n_dropped) == 0
    assert int(m.n_overflow) == 0


def test_migration_across_columns_incremental():
    """Same boundary crossing, forced onto the INCREMENTAL mover path:
    step 0 compacts (cadence), so the +x walkers (started a full step
    short of the boundary) cross the column boundary on step 1 — a
    hole-preserving step — and must arrive through M's exchanged ghost
    lane with no loss."""
    sc = loads_scenario(SCENARIO_NOSPAWN)
    field = Field.from_scenario(sc, unit=0.25)
    maps = FieldMaps.from_field(field)
    cfg = StepConfig.build(sc, capacity=64, neighbor_grid_unit=1.5,
                           table_capacity=6)
    pos = np.zeros((64, 2), np.float32)
    vel = np.zeros((64, 2), np.float32)
    for i, y in enumerate((6.5, 7.5, 9.5, 10.5)):
        pos[i] = (8.80, y)              # stays left of 9.0 on step 0
        vel[i] = (1.0, 0.0)
    agents = AgentState(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel),
        speed=jnp.full((64,), 1.34, jnp.float32),
        dest=jnp.ones((64,), jnp.int32),
        active=jnp.asarray(np.arange(64) < 4),
    )
    state0 = SimState(agents=agents, key=jax.random.PRNGKey(0),
                      step=jnp.int32(0))
    got, m = _run_tiled(maps, cfg, state0, n_steps=2, rows=1, cols=2,
                        compact_every=1000)
    assert int(m.n_active) == 4
    gact = np.asarray(got.agents.active)
    gpos = np.asarray(got.agents.pos)[gact]
    assert gpos.shape[0] == 4
    assert (gpos[:, 0] > 9.0).all()
    assert int(m.n_dropped) == 0
    assert int(m.n_overflow) == 0


def test_tiled_all_pairs_unit():
    """The all-pairs debug mode's cutoff-covering cell unit (2.0 m,
    sim.py) on the tiled path: the 1-cell ghost exchange then spans the
    full 2 m interaction cutoff, so tiles must still reproduce the
    single-chip step exactly as at the default unit."""
    maps, cfg, state0 = _setup(n=100, k=18, unit=2.0)
    want, m1 = _run_single(maps, cfg, state0, n_steps=3)
    got, mn = _run_tiled(maps, cfg, state0, n_steps=3, rows=1, cols=2)
    assert int(mn.n_active) == int(m1.n_active)
    a, b = _active_set(want.agents), _active_set(got.agents)
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=2e-2)


SCENARIO_5WP = SCENARIO_NOSPAWN + """
[[waypoints]]
line = [[2, 2], [16, 2]]
[[waypoints]]
line = [[2, 10], [16, 10]]
[[waypoints]]
line = [[9, 6], [10, 6]]
"""


def test_tiled_wp_ring_serialize_equals_single_chip():
    """5 waypoint planes through a 2-slab slot ring on 2x2 tiles
    (VERDICT round-4 weak #5): agents bound for 5 different destinations
    are mixed everywhere, so kernel blocks want 3+ planes and take the
    serialize-extra-ranks wrap of the slot walk (step_kernel wp_slots)
    under BOTH row_offset and col_offset slab addressing — the result
    must match the single-chip step at the SAME slot setting."""
    maps, cfg, state0 = _setup(n=120, seed=3, toml=SCENARIO_5WP, n_dest=5)
    want, m1 = _run_single(maps, cfg, state0, n_steps=3, wp_slots=2)
    got, mn = _run_tiled(maps, cfg, state0, n_steps=3, rows=2, cols=2,
                         wp_slots=2)
    assert int(mn.n_active) == int(m1.n_active)
    assert int(mn.n_spawned) == int(m1.n_spawned)
    a, b = _active_set(want.agents), _active_set(got.agents)
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=2e-2)


def test_localized_crowd_sparse_blocks():
    """A crowd confined to the field's top-left corner: every tile is
    non-degenerate but most kernel blocks have EMPTY windows, so the
    per-block occupancy bound is 0 there and the empty-block skip
    (ops/pallas/{step_kernel,rebin}.py) carries them — the tiled result
    must still match the single-chip step exactly as in the dense case."""
    maps, cfg, state0 = _setup(n=60, seed=9)
    pos = np.asarray(state0.agents.pos)
    keep = (pos[:, 0] < 6.0) & (pos[:, 1] < 4.5)
    active = np.asarray(state0.agents.active) & keep
    assert 4 <= active.sum() < 40
    state0 = SimState(
        agents=AgentState(pos=state0.agents.pos, vel=state0.agents.vel,
                          speed=state0.agents.speed, dest=state0.agents.dest,
                          active=jnp.asarray(active)),
        key=state0.key, step=state0.step)
    want, m1 = _run_single(maps, cfg, state0, n_steps=4)
    got, mn = _run_tiled(maps, cfg, state0, n_steps=4, rows=2, cols=2)
    assert int(mn.n_active) == int(m1.n_active)
    assert int(mn.n_spawned) == int(m1.n_spawned)
    a, b = _active_set(want.agents), _active_set(got.agents)
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=2e-2)
