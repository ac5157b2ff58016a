"""Row-strip sharded grid backend (parallel/grid_shard.py) vs single chip.

Row strips are the cols=1 case of the 2D tiling (grid_shard delegates
to parallel/tile2d.py).  Every block of the sharded step sees exactly
the window a single chip would (ghost rows carry the neighbor strip's
edge), so N-device results must match the single-chip grid backend to
float-reduction tolerance, including spawns and cross-strip migration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pedoni_tpu.field import Field, FieldMaps
from pedoni_tpu.models import sfm_grid, sfm_pallas
from pedoni_tpu.models.sfm import AgentState, SimState, StepConfig
from pedoni_tpu.parallel import grid_shard
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


def _setup(n=140, seed=5, k=10):
    sc = loads_scenario(SCENARIO)
    field = Field.from_scenario(sc, unit=0.25)
    maps = FieldMaps.from_field(field)
    cfg = StepConfig.build(sc, capacity=512, neighbor_grid_unit=1.5,
                           table_capacity=k)
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0.8, np.array(sc.size) - 0.8, (512, 2)).astype(np.float32)
    vel = rng.normal(0, 0.3, (512, 2)).astype(np.float32)
    speed = np.clip(rng.normal(1.34, 0.26, 512), 0.3, None).astype(np.float32)
    dest = rng.integers(0, 2, 512).astype(np.int32)
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


def _run_single(maps, cfg, state0, n_steps):
    fwp, fobs = map(jnp.asarray, sfm_pallas.pallas_device_inputs(cfg, maps))
    step = jax.jit(sfm_grid.make_step_grid(cfg, maps))
    sg = sfm_grid.bin_state(cfg, state0)
    for _ in range(n_steps):
        sg, m = step(sg, fwp, fobs)
        jax.block_until_ready(sg)  # lockstep: 1-core CPU collective safety
    return sfm_grid.unbin_state(cfg, sg), m


def _run_sharded(maps, cfg, state0, n_steps, n_dev):
    scfg = grid_shard.GridShardConfig.build(cfg, n_dev)
    mesh = grid_shard.make_mesh(scfg)
    wp, obs = grid_shard.device_inputs_on_mesh(scfg, mesh, maps)
    gs = grid_shard.make_sharded_grid_state(scfg, mesh, state0)
    step = jax.jit(grid_shard.make_sharded_step(scfg, mesh))
    for _ in range(n_steps):
        gs, m = step(gs, wp, obs)
        jax.block_until_ready(gs)
    return grid_shard.unbin_sharded(scfg, gs), m


@pytest.mark.parametrize(
    "n_dev",
    [2, pytest.param(4, marks=pytest.mark.slow)],  # 4-dev compile is heavy
)
def test_sharded_equals_single_chip(n_dev):
    maps, cfg, state0 = _setup()
    want, m1 = _run_single(maps, cfg, state0, n_steps=4)
    got, mn = _run_sharded(maps, cfg, state0, n_steps=4, n_dev=n_dev)
    assert int(mn.n_active) == int(m1.n_active)
    assert int(mn.n_spawned) == int(m1.n_spawned)
    a, b = _active_set(want.agents), _active_set(got.agents)
    assert a.shape == b.shape
    # XLA compiles the (interpret-mode) kernels differently inside
    # shard_map, so FMA contraction can flip a hard-cutoff pair test by
    # 1 ulp; over 4 chaotic steps that amplifies to ~1e-3 on a handful of
    # agents (7/762 observed).  Same tolerance story as test_parallel.py.
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=2e-2)


def test_checkpoint_across_device_counts(tmp_path):
    """A checkpoint written by a 2-device sharded run restores onto 4- and
    1-device simulators and continues with identical physics (checkpoints
    are flat agent arrays, re-binned/re-sharded on load)."""
    from pedoni_tpu.checkpoint import restore, save
    from pedoni_tpu.scenario import loads_scenario as _loads
    from pedoni_tpu.sim import Simulator, SimulatorOptions

    sc = _loads(SCENARIO)
    sim = Simulator(SimulatorOptions(backend="grid", n_devices=2, seed=5,
                                     table_capacity=10), sc)
    for _ in range(4):
        sim.tick()
    p = tmp_path / "ck.npz"
    save(sim, p)
    n0 = sim.pedestrian_count

    runs = {}
    for n_dev in (4, 1):
        sim2 = Simulator(SimulatorOptions(backend="grid", n_devices=n_dev,
                                          seed=99, table_capacity=10), sc)
        restore(sim2, p)
        assert sim2.step_count == sim.step_count
        assert sim2.pedestrian_count == n0
        runs[n_dev] = [sim2.tick().active_ped_count for _ in range(3)]
    assert runs[4] == runs[1], (
        f"resumed runs diverged across device counts: {runs}")


def test_migration_across_strips():
    """Agents walking +y cross a strip boundary and arrive in the neighbor
    strip's bins with no loss (migration = rebin through a ghost row)."""
    sc = loads_scenario(SCENARIO_NOSPAWN)
    field = Field.from_scenario(sc, unit=0.25)
    maps = FieldMaps.from_field(field)
    cfg = StepConfig.build(sc, capacity=64, neighbor_grid_unit=1.5,
                           table_capacity=6)
    # ny=8 rows, 4 devices -> 2 rows per strip; boundary at y=3.0 m.
    pos = np.zeros((64, 2), np.float32)
    vel = np.zeros((64, 2), np.float32)
    for i, x in enumerate((3.0, 5.0, 12.0, 14.0)):  # clear of the obstacle
        pos[i] = (x, 2.93)              # near the strip-0/1 boundary
        vel[i] = (0.0, 1.0)             # walking +y
    agents = AgentState(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel),
        speed=jnp.full((64,), 1.34, jnp.float32),
        dest=jnp.ones((64,), jnp.int32),
        active=jnp.asarray(np.arange(64) < 4),
    )
    state0 = SimState(agents=agents, key=jax.random.PRNGKey(0),
                      step=jnp.int32(0))
    got, m = _run_sharded(maps, cfg, state0, n_steps=2, n_dev=4)
    assert int(m.n_active) == 4
    gact = np.asarray(got.agents.active)
    gpos = np.asarray(got.agents.pos)[gact]
    assert gpos.shape[0] == 4
    assert (gpos[:, 1] > 3.0).all()  # all four crossed into strip 1
    assert int(m.n_dropped) == 0
    assert int(m.n_overflow) == 0
