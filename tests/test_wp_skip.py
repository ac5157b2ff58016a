"""Per-block waypoint-plane slot walk (round-4 VERDICT ask #2, slot form
round 5).

The reference samples exactly one potential map per agent (sfm.rs:107,
field.rs:235-239) — O(1) in waypoint count; the fused kernel samples
every plane per block and selects.  ``waypoint_block_planes`` + the
kernel's dynamic slot walk (a fori over each block's compacted
wanted-plane list) restore the asymptotics at block granularity with no
per-plane branches.  Gating must be a pure optimization: active slots of
the gated kernel are BIT-identical to the ungated kernel (inactive slots
may carry different channel-7 garbage — the ungated build samples planes
for garbage positions, the gated one leaves zeros — and no consumer
reads them: the rebin recomputes cells from positions and drops
inactives).
"""

import jax.numpy as jnp
import numpy as np

from pedoni_tpu.field import Field, FieldMaps
from pedoni_tpu.ops.neighbor import CellGrid
from pedoni_tpu.ops.pallas.fields6 import Fields6
from pedoni_tpu.ops.pallas.step_kernel import (fused_step_kernel,
                                               waypoint_block_mask,
                                               waypoint_block_planes)
from pedoni_tpu.physics import Physics
from pedoni_tpu.scenario import loads_scenario

SCENARIO = """
[field]
size = [18, 12]
[[waypoints]]
line = [[2, 2], [2, 10]]
[[waypoints]]
line = [[16, 2], [16, 10]]
[[waypoints]]
line = [[2, 11], [16, 11]]
[[obstacles]]
line = [[9, 0], [9, 5]]
width = 1
"""


def _numpy_mask(d, rb, n_wp):
    """Reference semantics: bit p of block b iff any active agent in d
    rows [b*rb, b*rb + rb + 2) has dest == p."""
    ny2 = d.shape[0]
    nb = (ny2 - 2) // rb
    w = (n_wp + 30) // 31
    out = np.zeros((nb, w), np.int32)
    act = d[:, :, 6, :] > 0.5
    dest = d[:, :, 5, :].astype(np.int64)
    for b in range(nb):
        win_a = act[b * rb : b * rb + rb + 2]
        win_d = dest[b * rb : b * rb + rb + 2]
        for p in np.unique(win_d[win_a]):
            out[b, p // 31] |= 1 << (p % 31)
    return out


def test_waypoint_block_mask_matches_numpy():
    rng = np.random.default_rng(7)
    ny, k, nxl, rb, n_wp = 10, 4, 128, 2, 40  # 40 planes: 2 mask words
    d = np.zeros((ny + 2, k, 8, nxl), np.float32)
    d[:, :, 5, :] = rng.integers(0, n_wp, (ny + 2, k, nxl))
    d[:, :, 6, :] = rng.random((ny + 2, k, nxl)) < 0.1
    d[0] = d[-1] = 0.0  # ghost rows
    got = np.asarray(waypoint_block_mask(jnp.asarray(d), rb, n_wp))
    np.testing.assert_array_equal(got, _numpy_mask(d, rb, n_wp))
    # single plane: statically disabled (the bench path is untouched)
    assert waypoint_block_mask(jnp.asarray(d), rb, 1) is None


def test_waypoint_block_planes_matches_numpy():
    """idx[b, :cnt[b]] = ascending wanted plane ids; zero-padded past
    cnt; force_all = every block wants every plane."""
    rng = np.random.default_rng(11)
    ny, k, nxl, rb, n_wp = 10, 4, 128, 2, 40
    d = np.zeros((ny + 2, k, 8, nxl), np.float32)
    d[:, :, 5, :] = rng.integers(0, n_wp, (ny + 2, k, nxl))
    d[:, :, 6, :] = rng.random((ny + 2, k, nxl)) < 0.1
    d[0] = d[-1] = 0.0
    idx, cnt = waypoint_block_planes(jnp.asarray(d), rb, n_wp)
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    mask = _numpy_mask(d, rb, n_wp)
    nb = mask.shape[0]
    for b in range(nb):
        want = [p for p in range(n_wp) if mask[b, p // 31] >> (p % 31) & 1]
        assert cnt[b] == len(want)
        np.testing.assert_array_equal(idx[b, : cnt[b]], want)
        np.testing.assert_array_equal(idx[b, cnt[b]:], 0)
    assert waypoint_block_planes(jnp.asarray(d), rb, 1) is None
    fidx, fcnt = waypoint_block_planes(jnp.asarray(d), rb, 5,
                                       force_all=True)
    np.testing.assert_array_equal(np.asarray(fcnt), 5)
    np.testing.assert_array_equal(np.asarray(fidx),
                                  np.tile(np.arange(5), (nb, 1)))


def _small_grid_inputs(seed=0, n=160):
    sc = loads_scenario(SCENARIO)
    field = Field.from_scenario(sc, unit=0.25)
    maps = FieldMaps.from_field(field)
    grid = CellGrid.for_size(sc.size, 1.5)
    k, rb = 8, 2
    ny_pad = -(-grid.ny // rb) * rb
    nxl = -(-(grid.nx + 3) // 128) * 128
    rng = np.random.default_rng(seed)
    d = np.zeros((ny_pad + 2, k, 8, nxl), np.float32)
    # destination-clustered placement (left third -> wp 0, right -> 1,
    # top band -> 2) so blocks genuinely want different plane subsets
    for _ in range(n):
        pos = rng.uniform(0.8, np.array(sc.size) - 0.8, 2).astype(np.float32)
        dest = 2 if pos[1] > 8.0 else (0 if pos[0] < 9.0 else 1)
        r = int(pos[1] // 1.5)
        lane = int(pos[0] // 1.5) + 1
        j = int(d[r + 1, 0, 7, lane])
        if j >= k:
            continue
        d[r + 1, j, 0:2, lane] = pos
        d[r + 1, j, 2:4, lane] = rng.normal(0, 0.4, 2)
        d[r + 1, j, 4, lane] = max(0.3, rng.normal(1.34, 0.26))
        d[r + 1, j, 5, lane] = dest
        d[r + 1, j, 6, lane] = 1.0
        d[r + 1, :, 7, lane] = j + 1
    d[:, :, 7, :] = 0.0
    f6 = Fields6.build(maps, grid.nx, ny_pad, lane_align=128)
    return sc, d, f6, rb


def test_gated_kernel_bit_identical_on_active_slots():
    sc, d, f6, rb = _small_grid_inputs()
    phys = Physics()
    dk = jnp.asarray(d)
    fwp = jnp.asarray(f6.wp)
    fobs = jnp.asarray(f6.obs)
    n_wp = fwp.shape[0]
    assert n_wp == 3
    wpp = waypoint_block_planes(dk, rb, n_wp)
    cnt = np.asarray(wpp[1])
    # destination clustering must make the skip non-trivial: some block
    # wants a strict subset of the planes
    assert any(0 < c < n_wp for c in cnt)

    base = np.asarray(fused_step_kernel(
        dk, fwp, fobs, phys, sc.size, row_block=rb, interpret=True))
    gated = np.asarray(fused_step_kernel(
        dk, fwp, fobs, phys, sc.size, row_block=rb, interpret=True,
        wp_planes=wpp))

    act = base[:, :, 6, :] > 0.5
    np.testing.assert_array_equal(gated[:, :, 6, :], base[:, :, 6, :])
    for c in range(8):  # all channels incl. sampled potential (ch 7)
        np.testing.assert_array_equal(gated[:, :, c, :][act],
                                      base[:, :, c, :][act])
    assert np.all(gated[0] == 0) and np.all(gated[-1] == 0)


def test_slab_ring_smaller_than_wanted_bit_identical():
    """wp_slots < a block's wanted count exercises the serialization
    path: wanted rank s lives in VMEM slot s % wp_slots and rank
    s + wp_slots' DMA starts only after rank s finished sampling
    (O(1)-in-waypoints VMEM like the reference's host-RAM maps,
    field.rs:235-239).  wp_slots=1 is full serialization — the
    strictest ordering case."""
    sc, d, f6, rb = _small_grid_inputs(seed=2)
    phys = Physics()
    dk = jnp.asarray(d)
    fwp = jnp.asarray(f6.wp)
    fobs = jnp.asarray(f6.obs)
    n_wp = fwp.shape[0]
    assert n_wp == 3
    wpp = waypoint_block_planes(dk, rb, n_wp)
    assert int(np.asarray(wpp[1]).max()) > 1  # some block wants > 1 plane

    base = np.asarray(fused_step_kernel(
        dk, fwp, fobs, phys, sc.size, row_block=rb, interpret=True))
    act = base[:, :, 6, :] > 0.5
    for slots in (1, 2):
        gated = np.asarray(fused_step_kernel(
            dk, fwp, fobs, phys, sc.size, row_block=rb, interpret=True,
            wp_planes=wpp, wp_slots=slots))
        np.testing.assert_array_equal(gated[:, :, 6, :], base[:, :, 6, :])
        for c in range(8):
            np.testing.assert_array_equal(gated[:, :, c, :][act],
                                          base[:, :, c, :][act])


def test_gated_kernel_emit_movers_bit_identical():
    """Gating composes with the incremental-rebin kernel mode: OUT active
    slots and the whole mover table M match the ungated build."""
    sc, d, f6, rb = _small_grid_inputs(seed=1)
    phys = Physics()
    dk = jnp.asarray(d)
    fwp = jnp.asarray(f6.wp)
    fobs = jnp.asarray(f6.obs)
    wpp = waypoint_block_planes(dk, rb, fwp.shape[0])

    b_out, b_m, b_movf, b_mdmx = fused_step_kernel(
        dk, fwp, fobs, phys, sc.size, row_block=rb, interpret=True,
        emit_movers=4)
    g_out, g_m, g_movf, g_mdmx = fused_step_kernel(
        dk, fwp, fobs, phys, sc.size, row_block=rb, interpret=True,
        emit_movers=4, wp_planes=wpp)
    act = np.asarray(b_out)[:, :, 6, :] > 0.5
    for c in range(8):  # ch 7 = stay mask in this mode: active-slot exact
        np.testing.assert_array_equal(
            np.asarray(g_out)[:, :, c, :][act],
            np.asarray(b_out)[:, :, c, :][act])
    np.testing.assert_array_equal(np.asarray(g_m), np.asarray(b_m))
    np.testing.assert_array_equal(np.asarray(g_movf), np.asarray(b_movf))
    np.testing.assert_array_equal(np.asarray(g_mdmx), np.asarray(b_mdmx))


def test_supports_unbounded_waypoints_under_slot_walk():
    """The slot walk bounds resident plane slabs at wp_slots, so
    waypoint COUNT no longer gates fused-backend acceptance — only the
    ungated kernel (wp_skip=False) still needs all planes resident
    (reference parity: field.rs:235-239 keeps any number of maps at an
    O(1) working set)."""
    from pedoni_tpu.models.sfm import StepConfig
    from pedoni_tpu.models.sfm_pallas import supports

    n_wp = 40
    lines = "".join(
        f"[[waypoints]]\nline = [[{2 + 4 * (i % 12)}, {2 + 3 * (i // 12)}], "
        f"[{3 + 4 * (i % 12)}, {2 + 3 * (i // 12)}]]\n"
        for i in range(n_wp))
    sc = loads_scenario("[field]\nsize = [1500, 90]\n" + lines)
    cfg = StepConfig.build(sc, neighbor_grid_unit=1.5, table_capacity=14)
    assert supports(cfg, 2, wp_skip=True)          # slot walk: accepted
    assert not supports(cfg, 2, wp_skip=False)     # ungated: 40 resident
    #                                                slabs blow VMEM
