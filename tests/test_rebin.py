"""Rebin kernel (ops/pallas/rebin.py) vs a direct NumPy re-binning.

The kernel's contract: given the post-step grid (agents possibly displaced
by up to one cell), produce fully compacted GHOST-CARRYING bins where each
output cell holds the agents whose floor(pos/unit) lands there, in the
kernel's fixed (slot, dy, dx) candidate order; overflow beyond K dropped
(counted in the per-block overflow output); agents landing outside the
[nx_cells, ny_cells] field vanish (neighbor_grid.rs:29).  Channel 7 is the
per-cell count clamped to K; un-clamped peak demand rides out in the
per-block demand_max output.
"""

import jax.numpy as jnp
import numpy as np

from pedoni_tpu.ops.pallas.rebin import rebin_kernel

UNIT = 1.5
K = 6
NXL = 128
NX = 20  # real field extent in cells (lanes 1..20)


def _numpy_rebin(g: np.ndarray, unit: float, nx_cells: int,
                 ny_cells: int):
    """Reference re-binning in the kernel's candidate order.

    Returns (ghost-carrying bins with clamped channel-7 counts,
    per-cell un-clamped demand [ny, nxl])."""
    ny2, kk, ch, nxl = g.shape
    ny = ny2 - 2
    out = np.zeros((ny + 2, kk, ch, nxl), np.float32)
    demand = np.zeros((ny, nxl), np.float32)
    for r in range(ny):          # output cell row r lives at g row r+1
        for lane in range(nxl):  # output cell x = lane - 1
            cnt = 0
            for j in range(kk):
                for dy in (-1, 0, 1):
                    for dxo in (-1, 0, 1):
                        src_lane = (lane + dxo) % nxl
                        cand = g[r + 1 + dy, j, :, src_lane]
                        if cand[6] <= 0.5:
                            continue
                        tgt_lane = np.floor(np.float32(cand[0]) / np.float32(unit)) + 1
                        tgt_row = np.floor(np.float32(cand[1]) / np.float32(unit))
                        if not (1 <= tgt_lane <= nx_cells and 0 <= tgt_row <= ny_cells - 1):
                            continue
                        if tgt_row == r and tgt_lane == lane:
                            if cnt < kk:
                                out[r + 1, cnt, :7, lane] = cand[:7]
                            cnt += 1
            out[r + 1, :, 7, lane] = min(cnt, kk)
            demand[r, lane] = cnt
    return out, demand


def _block_reductions(demand: np.ndarray, rb: int, k: int):
    nb = demand.shape[0] // rb
    ovf = np.array([np.maximum(demand[i * rb:(i + 1) * rb] - k, 0).sum()
                    for i in range(nb)], np.float32)
    dmx = np.array([demand[i * rb:(i + 1) * rb].max() for i in range(nb)],
                   np.float32)
    return ovf, dmx


def _make_grid(ny, seed=0, n_per_cell=3, jitter=0.9):
    """Bins with agents placed in their cells, positions displaced by up to
    ``jitter`` meters (< one cell) so some land in a neighbor cell."""
    rng = np.random.default_rng(seed)
    g = np.zeros((ny + 2, K, 8, NXL), np.float32)
    for r in range(ny):
        for x in range(NX):
            n = rng.integers(0, n_per_cell + 1)
            for j in range(n):
                base = np.array([x * UNIT, r * UNIT]) + rng.uniform(0.05, UNIT - 0.05, 2)
                p = base + rng.uniform(-jitter, jitter, 2)
                g[r + 1, j, 0:2, x + 1] = p
                g[r + 1, j, 2:4, x + 1] = rng.normal(0, 0.5, 2)
                g[r + 1, j, 4, x + 1] = rng.uniform(0.8, 1.8)
                g[r + 1, j, 5, x + 1] = rng.integers(0, 3)
                g[r + 1, j, 6, x + 1] = float(rng.uniform() > 0.15)  # some dead
    return g


def test_rebin_matches_numpy():
    ny = 8
    g = _make_grid(ny, seed=1)
    want, demand = _numpy_rebin(g, UNIT, NX, ny)
    got, ovf, dmx = (np.asarray(a) for a in rebin_kernel(
        jnp.asarray(g), UNIT, NX, ny, row_block=2, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    want_ovf, want_dmx = _block_reductions(demand, 2, K)
    np.testing.assert_allclose(ovf, want_ovf, rtol=0, atol=1e-6)
    np.testing.assert_allclose(dmx, want_dmx, rtol=0, atol=1e-6)


def test_rebin_agent_conservation():
    """Active in-field agents are conserved up to counted cell overflow."""
    ny = 6
    g = _make_grid(ny, seed=2)
    want, demand = _numpy_rebin(g, UNIT, NX, ny)
    got, ovf, _dmx = (np.asarray(a) for a in rebin_kernel(
        jnp.asarray(g), UNIT, NX, ny, row_block=2, interpret=True))
    kept = np.minimum(demand, K).sum()
    n_out = (got[:, :, 6, :] > 0.5).sum()
    assert n_out == kept
    assert ovf.sum() == np.maximum(demand - K, 0).sum()
    # multiset of kept positions is preserved slot-order-independently
    a_out = got.transpose(0, 1, 3, 2)[got[:, :, 6, :] > 0.5]
    a_want = want.transpose(0, 1, 3, 2)[want[:, :, 6, :] > 0.5]
    np.testing.assert_allclose(
        np.sort(a_out[:, 0] * 1e4 + a_out[:, 1]),
        np.sort(a_want[:, 0] * 1e4 + a_want[:, 1]), rtol=1e-6)


def test_rebin_overflow_drops_in_order():
    """More than K agents landing in one cell: first K in candidate order
    are kept, the rest dropped; the overflow/demand outputs report the
    excess while channel 7 stays clamped to K (the free-slot cursor)."""
    ny = 4
    g = np.zeros((ny + 2, K, 8, NXL), np.float32)
    # 3 source cells (row 1, x=4,5,6) each with K agents, all moving into
    # cell (1, 5): 18 candidates for 6 slots.
    tx, ty = 5 * UNIT + 0.7, 1 * UNIT + 0.7
    for x in (4, 5, 6):
        for j in range(K):
            g[2, j, 0, x + 1] = tx
            g[2, j, 1, x + 1] = ty
            g[2, j, 4, x + 1] = 100 * x + j  # tag in the speed channel
            g[2, j, 6, x + 1] = 1.0
    got, ovf, dmx = (np.asarray(a) for a in rebin_kernel(
        jnp.asarray(g), UNIT, NX, ny, row_block=2, interpret=True))
    cell = got[2, :, :, 6]  # output row 2 (ghost-carrying) = cell (1, 5)
    assert (cell[:, 6] > 0.5).all()
    assert got[2, 0, 7, 6] == K       # clamped count (free-slot cursor)
    assert dmx[0] == 18               # un-clamped demand in block 0
    assert ovf[0] == 18 - K           # dropped agents counted exactly
    # candidate order: (j, dy=0, dx=-1,0,1) -> j=0: x=4,5,6; j=1: ...
    np.testing.assert_array_equal(cell[:, 4], [400, 500, 600, 401, 501, 601])
    assert (got[:, :, 6, :] > 0.5).sum() == K


def test_rebin_emit_counts():
    """``emit_counts`` appends per-block input/output active sums (the
    n_active/n_after metric fusion consumed by sfm_grid.make_step_grid —
    no full-grid XLA act-channel reductions) and leaves the base outputs
    bit-identical."""
    ny = 8
    rb = 2
    g = _make_grid(ny, seed=4)
    base = [np.asarray(a) for a in rebin_kernel(
        jnp.asarray(g), UNIT, NX, ny, row_block=rb, interpret=True)]
    got, ovf, dmx, nin, nout = (np.asarray(a) for a in rebin_kernel(
        jnp.asarray(g), UNIT, NX, ny, row_block=rb, interpret=True,
        emit_counts=True))
    np.testing.assert_array_equal(got, base[0])
    np.testing.assert_array_equal(ovf, base[1])
    np.testing.assert_array_equal(dmx, base[2])
    for i in range(ny // rb):
        rows = slice(i * rb + 1, i * rb + 1 + rb)
        assert nin[i] == (g[rows, :, 6, :] > 0.5).sum()
        assert nout[i] == (got[rows, :, 6, :] > 0.5).sum()


def test_rebin_out_of_field_vanish():
    """Agents whose new position floors outside the field disappear
    (reference neighbor_grid.rs:29 semantics), including into the ghost
    column (x < 0) and pad rows."""
    ny = 4
    g = np.zeros((ny + 2, K, 8, NXL), np.float32)
    g[1, 0, 0:2, 1] = (-0.3, 0.5)   # x < 0 -> would land at ghost lane 0
    g[1, 0, 6, 1] = 1.0
    g[ny, 1, 0:2, 3] = (2.0, ny * UNIT + 0.2)  # past the last cell row
    g[ny, 1, 6, 3] = 1.0
    g[1, 2, 0:2, NX] = (NX * UNIT + 0.1, 0.5)  # past the last cell column
    g[1, 2, 6, NX] = 1.0
    got, ovf, _dmx = (np.asarray(a) for a in rebin_kernel(
        jnp.asarray(g), UNIT, NX, ny, row_block=2, interpret=True))
    assert (got[:, :, 6, :] > 0.5).sum() == 0
    assert ovf.sum() == 0
    # ghost rows of the output are zero (ghost-carrying contract)
    assert np.all(got[0] == 0) and np.all(got[-1] == 0)
