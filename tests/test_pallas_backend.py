"""End-to-end pallas backend (interpret mode) vs the XLA step."""

import jax
import numpy as np
import pytest

from pedoni_tpu.field import Field, FieldMaps
from pedoni_tpu.models import sfm_pallas
from pedoni_tpu.models.sfm import (
    StepConfig, device_inputs, make_initial_state, make_step,
)
from pedoni_tpu.scenario import loads_scenario

SCENARIO = """
[field]
size = [24, 15]
[[waypoints]]
line = [[2, 2], [2, 13]]
[[waypoints]]
line = [[22, 2], [22, 13]]
[[obstacles]]
line = [[12, 0], [12, 6]]
width = 1
[[pedestrians]]
origin = 0
destination = 1
spawn = { kind = "once", count = 40 }
[[pedestrians]]
origin = 1
destination = 0
spawn = { kind = "periodic", frequency = 3.0 }
"""


@pytest.fixture(scope="module")
def setup():
    sc = loads_scenario(SCENARIO)
    field = Field.from_scenario(sc, unit=0.25)
    maps = FieldMaps.from_field(field)
    cfg = StepConfig.build(sc, capacity=256, neighbor_grid_unit=1.5,
                           table_capacity=12)
    return sc, maps, cfg


def _sorted(pos):
    return pos[np.lexsort((pos[:, 1], pos[:, 0]))]


def test_pallas_backend_matches_xla(setup, monkeypatch):
    sc, maps, cfg = setup
    assert sfm_pallas.supports(cfg)

    # Force interpret mode inside the fused kernel (CPU test host).
    import pedoni_tpu.ops.pallas.step_kernel as skmod

    orig = skmod.fused_step_kernel
    monkeypatch.setattr(
        skmod, "fused_step_kernel",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )
    monkeypatch.setattr(
        sfm_pallas, "fused_step_kernel",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )

    n_steps = 6

    step_x = jax.jit(make_step(cfg, maps))
    dfield, obstacles = device_inputs(cfg, maps)
    st_x = make_initial_state(cfg, seed=5)
    for _ in range(n_steps):
        st_x, m_x = step_x(st_x, dfield.rows, obstacles)

    step_p = jax.jit(sfm_pallas.make_step_pallas(cfg, maps))
    fwp, fobs = sfm_pallas.pallas_device_inputs(cfg, maps)
    st_p = make_initial_state(cfg, seed=5)
    for _ in range(n_steps):
        st_p, m_p = step_p(st_p, fwp, fobs)

    ax = np.asarray(st_x.agents.active)
    ap = np.asarray(st_p.agents.active)
    px = np.asarray(st_x.agents.pos)[ax]
    pp = np.asarray(st_p.agents.pos)[ap]
    # Despawn bookkeeping may lag one step in the pallas path; populations
    # must match within the per-step arrival count.
    assert abs(int(ax.sum()) - int(ap.sum())) <= 3
    n = min(len(px), len(pp))
    # Compare the shared survivors (positions as multisets).
    sx, spp = _sorted(px), _sorted(pp)
    if len(px) == len(pp):
        np.testing.assert_allclose(spp, sx, atol=2e-2)
    assert int(m_p.n_overflow) == 0
