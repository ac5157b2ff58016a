"""Pair-pass slot-split branch (step_kernel jcen / occupancy_bounds):
each block runs EITHER the one-sublane-tile pair loop (center slots
[0:8] only, taken when its center-row occupancy bound is <= 8) OR the
original unsplit loop.  The contract is BIT-identity of the full step
output — slots at or above a cell's topcnt are inactive and every
outbuf channel of an inactive slot is keep-gated passthrough, so
skipping their pair accumulation cannot change any stored byte.

The state here is built to exercise BOTH paths: one cell crammed past 8
occupants (its block takes the full branch) while the rest of the grid
sits far below (one-tile branch).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pedoni_tpu.field import Field, FieldMaps
from pedoni_tpu.models import sfm_grid
from pedoni_tpu.models.sfm import AgentState, SimState, StepConfig
from pedoni_tpu.models.sfm_pallas import pallas_device_inputs
from pedoni_tpu.scenario import loads_scenario

SCENARIO = """
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

CAP = 256


def _setup():
    sc = loads_scenario(SCENARIO)
    field = Field.from_scenario(sc, unit=0.25)
    maps = FieldMaps.from_field(field)
    cfg = StepConfig.build(sc, capacity=CAP, neighbor_grid_unit=1.5,
                           table_capacity=12)
    rng = np.random.default_rng(7)
    pos = rng.uniform(0.8, np.array(sc.size) - 0.8, (CAP, 2)).astype(np.float32)
    # Cram 10 agents into one cell (cell (2, 4): x in [6, 7.5), y in
    # [3, 4.5)) so its block's center bound exceeds 8 and the hi tile
    # actually runs with nonzero trips.
    pos[:10] = rng.uniform((6.1, 3.1), (7.4, 4.4), (10, 2)).astype(np.float32)
    vel = rng.normal(0, 0.3, (CAP, 2)).astype(np.float32)
    speed = np.clip(rng.normal(1.34, 0.26, CAP), 0.3, None).astype(np.float32)
    dest = rng.integers(0, 2, CAP).astype(np.int32)
    active = np.arange(CAP) < 120
    agents = AgentState(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                        speed=jnp.asarray(speed), dest=jnp.asarray(dest),
                        active=jnp.asarray(active))
    state = SimState(agents=agents, key=jax.random.PRNGKey(1),
                     step=jnp.int32(0))
    return maps, cfg, state


def test_center_bound_le_window_bound():
    maps, cfg, state = _setup()
    d = sfm_grid.bin_state(cfg, state).d
    nb = (d.shape[0] - 2) // 2
    win, cen = sfm_grid.occupancy_bounds(d, 2, nb, cfg.table_capacity)
    w1 = sfm_grid.occupancy_bound(d, 2, nb, cfg.table_capacity)
    np.testing.assert_array_equal(np.asarray(win), np.asarray(w1))
    assert (np.asarray(cen) <= np.asarray(win)).all()
    assert int(np.asarray(cen).max()) >= 10  # the crammed cell registers
    assert (np.asarray(cen) <= 8).any()      # ...and most blocks are low


@pytest.mark.parametrize("incremental", [False, True])
def test_slot_split_step_bit_identical(incremental):
    maps, cfg, state = _setup()
    fwp, fobs = map(jnp.asarray, pallas_device_inputs(cfg, maps))
    kw = dict(incremental=incremental, compact_every=3)
    step_on = jax.jit(sfm_grid.make_step_grid(cfg, maps, slot_split=True,
                                              **kw))
    step_off = jax.jit(sfm_grid.make_step_grid(cfg, maps, slot_split=False,
                                               **kw))
    s_on = s_off = sfm_grid.bin_state(cfg, state)
    for i in range(3):
        s_on, m_on = step_on(s_on, fwp, fobs)
        s_off, m_off = step_off(s_off, fwp, fobs)
        np.testing.assert_array_equal(np.asarray(s_on.d),
                                      np.asarray(s_off.d),
                                      err_msg=f"step {i}")
        assert int(m_on.n_active) == int(m_off.n_active)
        assert int(m_on.n_overflow) == int(m_off.n_overflow)
    assert int(m_on.n_active) > 0
