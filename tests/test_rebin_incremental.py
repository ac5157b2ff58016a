"""Incremental (hole-preserving) rebin vs the full compacting rebin.

The round-4 fast path (VERDICT round-3 ask #1): kernel 1 classifies each
integrated agent as stayer (target cell == own cell, ~90% at bench
density) or mover, emits the compacted per-cell mover table M, and
``rebin_incremental`` keeps stayers in their slots while first-fitting
only movers into holes — the candidate walk shrinks from 9*jmax to
9*mmax one-hot MACs.  Bins may then contain holes, so all comparisons
here are SET-based (bins are sets; the reference's per-tick sort
sfm.rs:58-77 has no slot-order contract either).

Covers: (a) the raw (G, M) kernel contract vs the full rebin including
per-cell membership, demand and topcnt; (b) cell-overflow counting
parity; (c) kernel 1's emit_movers outputs (physics bit-identical, stay
mask and mover table recounted in NumPy); (d) the assembled step
function: N steps with spawns/despawns on the incremental path match the
always-compact path state-set- and metrics-exactly, across compaction
boundaries and the mover-table-overflow fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pedoni_tpu.field import Field, FieldMaps
from pedoni_tpu.models import sfm_grid, sfm_pallas
from pedoni_tpu.models.sfm import AgentState, SimState, StepConfig
from pedoni_tpu.ops.pallas.rebin import rebin_incremental, rebin_kernel
from pedoni_tpu.scenario import loads_scenario

from test_rebin import _block_reductions, _make_grid, _numpy_rebin, K, NX, NXL, UNIT


def _split_stay_movers(g0: np.ndarray, mk: int):
    """Build the (G with ch7 = stay mask, M mover table) pair kernel 1's
    emit_movers mode produces, from a plain post-step grid."""
    ny2 = g0.shape[0]
    gi = g0.copy()
    m = np.zeros((ny2, mk, 8, NXL), np.float32)
    for r in range(ny2 - 2):
        for lane in range(NXL):
            mc = 0
            for j in range(K):
                a = g0[r + 1, j, :, lane]
                if a[6] <= 0.5:
                    gi[r + 1, j, 7, lane] = 0.0
                    continue
                tl = np.floor(np.float32(a[0]) / np.float32(UNIT)) + 1
                tr = np.floor(np.float32(a[1]) / np.float32(UNIT))
                stay = (tl == lane) and (tr == r)
                gi[r + 1, j, 7, lane] = 1.0 if stay else 0.0
                if not stay:
                    if mc < mk:
                        m[r + 1, mc, :6, lane] = a[:6]
                        m[r + 1, mc, 6, lane] = 1.0
                    mc += 1
            m[r + 1, :, 7, lane] = min(mc, mk)
    return gi, m


def _active_cells(arr: np.ndarray):
    """Sorted (row, lane, channel values) of every active slot — the
    slot-order-independent per-cell membership."""
    idx = np.argwhere(arr[:, :, 6, :] > 0.5)
    return sorted((r, l, tuple(arr[r, j, :6, l])) for r, j, l in idx)


def test_incremental_matches_full_rebin():
    ny = 8
    g0 = _make_grid(ny, seed=3)
    gi, m = _split_stay_movers(g0, mk=6)
    assert m[:, 0, 7, :].max() <= 6

    want, demand = _numpy_rebin(g0, UNIT, NX, ny)
    got, ovf, dmx = (np.asarray(a) for a in rebin_incremental(
        jnp.asarray(gi), jnp.asarray(m), UNIT, NX, ny, row_block=2,
        interpret=True))
    w_ovf, w_dmx = _block_reductions(demand, 2, K)
    np.testing.assert_allclose(ovf, w_ovf, atol=1e-6)
    np.testing.assert_allclose(dmx, w_dmx, atol=1e-6)
    assert _active_cells(got) == _active_cells(want)
    # channel 7 = topcnt (max occupied slot + 1): the next step's
    # occupancy bound and the spawn scatter's append cursor
    occ = got[:, :, 6, :] > 0.5
    top = np.where(occ.any(1), K - np.argmax(occ[:, ::-1, :], 1), 0)
    np.testing.assert_allclose(got[:, 0, 7, :], top, atol=1e-6)
    assert np.all(got[0] == 0) and np.all(got[-1] == 0)  # zero ghosts


def test_incremental_emit_counts():
    """``emit_counts`` on the incremental form: per-block input/output
    active sums match NumPy recounts, base outputs bit-identical (the
    hybrid step's lax.cond needs both rebin forms to emit them)."""
    ny = 8
    rb = 2
    g0 = _make_grid(ny, seed=6)
    gi, m = _split_stay_movers(g0, mk=6)
    base = [np.asarray(a) for a in rebin_incremental(
        jnp.asarray(gi), jnp.asarray(m), UNIT, NX, ny, row_block=rb,
        interpret=True)]
    got, ovf, dmx, nin, nout = (np.asarray(a) for a in rebin_incremental(
        jnp.asarray(gi), jnp.asarray(m), UNIT, NX, ny, row_block=rb,
        interpret=True, emit_counts=True))
    np.testing.assert_array_equal(got, base[0])
    np.testing.assert_array_equal(ovf, base[1])
    np.testing.assert_array_equal(dmx, base[2])
    for i in range(ny // rb):
        rows = slice(i * rb + 1, i * rb + 1 + rb)
        assert nin[i] == (gi[rows, :, 6, :] > 0.5).sum()
        assert nout[i] == (got[rows, :, 6, :] > 0.5).sum()


def test_incremental_overflow_counts_match_full():
    """Dense grid overflowing K: the incremental path must count exactly
    the same number of cell-overflow drops as the full rebin (WHICH agent
    is dropped may differ — both are valid fixed orders)."""
    ny = 6
    g0 = _make_grid(ny, seed=5, n_per_cell=K, jitter=1.2)
    gi, m = _split_stay_movers(g0, mk=K)  # mk=K: table never overflows
    _want, demand = _numpy_rebin(g0, UNIT, NX, ny)
    got, ovf, dmx = (np.asarray(a) for a in rebin_incremental(
        jnp.asarray(gi), jnp.asarray(m), UNIT, NX, ny, row_block=2,
        interpret=True))
    w_ovf, w_dmx = _block_reductions(demand, 2, K)
    assert w_ovf.sum() > 0  # the scenario genuinely overflows
    np.testing.assert_allclose(ovf, w_ovf, atol=1e-6)
    np.testing.assert_allclose(dmx, w_dmx, atol=1e-6)
    kept = np.minimum(demand, K).sum()
    assert (got[:, :, 6, :] > 0.5).sum() == kept


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
[[pedestrians]]
origin = 0
destination = 1
spawn = { kind = "periodic", frequency = 4.0 }
"""


def _setup():
    sc = loads_scenario(SCENARIO)
    field = Field.from_scenario(sc, unit=0.25)
    maps = FieldMaps.from_field(field)
    cfg = StepConfig.build(sc, capacity=256, neighbor_grid_unit=1.5,
                           table_capacity=8)
    rng = np.random.default_rng(3)
    n = 256
    pos = rng.uniform(0.8, np.array(sc.size) - 0.8, (n, 2)).astype(np.float32)
    agents = AgentState(
        pos=jnp.asarray(pos),
        vel=jnp.asarray(rng.normal(0, 0.3, (n, 2)).astype(np.float32)),
        speed=jnp.asarray(np.clip(rng.normal(1.34, 0.26, n), 0.3,
                                  None).astype(np.float32)),
        dest=jnp.asarray(rng.integers(0, 2, n).astype(np.int32)),
        active=jnp.asarray(np.arange(n) < 150),
    )
    st0 = SimState(agents=agents, key=jax.random.PRNGKey(0),
                   step=jnp.int32(0))
    fwp, fobs = map(jnp.asarray, sfm_pallas.pallas_device_inputs(cfg, maps))
    return sc, maps, cfg, st0, fwp, fobs


def _run_steps(cfg, maps, st0, fwp, fobs, incremental, mover_k,
               compact_every, nsteps):
    gs = sfm_grid.bin_state(cfg, st0)
    step = jax.jit(sfm_grid.make_step_grid(
        cfg, maps, incremental=incremental, mover_k=mover_k,
        compact_every=compact_every))
    ms = []
    for _ in range(nsteps):
        gs, m = step(gs, fwp, fobs)
        ms.append(jax.device_get(m))
    flat = sfm_grid.unbin_state(cfg, gs)
    a = flat.agents
    act = np.asarray(a.active)
    arr = np.concatenate(
        [np.asarray(a.pos), np.asarray(a.vel),
         np.asarray(a.speed)[:, None],
         np.asarray(a.dest)[:, None].astype(np.float32)], 1)[act]
    return arr[np.lexsort((arr[:, 1], arr[:, 0]))], ms


def test_step_incremental_matches_full_with_spawns():
    """8 steps with periodic spawns, despawns and a mid-run compaction:
    identical state sets and identical per-step metrics."""
    sc, maps, cfg, st0, fwp, fobs = _setup()
    a_full, m_full = _run_steps(cfg, maps, st0, fwp, fobs,
                                incremental=False, mover_k=4,
                                compact_every=5, nsteps=8)
    a_inc, m_inc = _run_steps(cfg, maps, st0, fwp, fobs,
                              incremental=True, mover_k=4,
                              compact_every=5, nsteps=8)
    assert a_full.shape == a_inc.shape
    np.testing.assert_allclose(a_inc, a_full, atol=2e-5, rtol=1e-5)
    for i, (mf, mi) in enumerate(zip(m_full, m_inc)):
        for f in ("n_active", "n_spawned", "n_dropped", "n_overflow",
                  "n_exited", "max_demand"):
            assert int(getattr(mf, f)) == int(getattr(mi, f)), (i, f)
    assert max(int(m.max_mover_demand) for m in m_inc) >= 1


def test_step_mover_table_overflow_falls_back_losslessly():
    """mover_k=1 makes the mover table overflow constantly; the in-graph
    fallback to the full rebin must keep the run loss-free and identical
    to the always-compact path."""
    sc, maps, cfg, st0, fwp, fobs = _setup()
    a_full, m_full = _run_steps(cfg, maps, st0, fwp, fobs,
                                incremental=False, mover_k=1,
                                compact_every=1000, nsteps=6)
    a_inc, m_inc = _run_steps(cfg, maps, st0, fwp, fobs,
                              incremental=True, mover_k=1,
                              compact_every=1000, nsteps=6)
    assert max(int(m.max_mover_demand) for m in m_inc) > 1  # overflowed
    assert a_full.shape == a_inc.shape
    np.testing.assert_allclose(a_inc, a_full, atol=2e-5, rtol=1e-5)
    for mf, mi in zip(m_full, m_inc):
        assert int(mf.n_active) == int(mi.n_active)
        assert int(mi.n_overflow) == int(mf.n_overflow)
