import jax.numpy as jnp
import numpy as np

from pedoni_tpu.ops.neighbor import (
    CellGrid,
    build_neighbor_data,
    compute_cell_ids,
    gather_candidates,
)


def test_cell_grid_shape():
    # neighbor_grid.rs:14-16: shape = ceil(size / unit), (rows, cols).
    g = CellGrid.for_size((20.0, 10.0), 1.4)
    assert (g.nx, g.ny) == (15, 8)


def test_cell_ids_and_sentinels():
    g = CellGrid.for_size((10.0, 10.0), 1.0)
    pos = jnp.array([[0.5, 0.5], [9.5, 9.5], [-1.0, 5.0], [5.0, 5.0]])
    active = jnp.array([True, True, True, False])
    cids = compute_cell_ids(pos, active, g)
    assert cids[0] == 0
    assert cids[1] == 99
    assert cids[2] == g.n_cells  # out of grid -> sentinel (dropped, neighbor_grid.rs:29)
    assert cids[3] == g.n_cells  # inactive -> sentinel


def test_csr_and_table():
    g = CellGrid(unit=1.0, nx=4, ny=1)
    # 5 agents sorted by cell: cells [0, 0, 2, 2, 2], one inactive sentinel.
    cids = jnp.array([0, 0, 2, 2, 2, 4], dtype=jnp.int32)
    nb = build_neighbor_data(cids, g, table_capacity=2)
    np.testing.assert_array_equal(np.asarray(nb.csr), [0, 2, 2, 5, 5])
    table = np.asarray(nb.table)
    assert set(table[0]) == {0, 1}
    assert table[1].tolist() == [6, 6]  # empty cell -> sentinel n
    # Cell 2 holds 3 agents but capacity 2: one overflow.
    assert set(table[2]) <= {2, 3, 4}
    assert int(nb.n_overflow) == 1


def test_gather_candidates_3x3():
    g = CellGrid(unit=1.0, nx=3, ny=3)
    # One agent per cell, ids = cell ids 0..8, sorted.
    cids = jnp.arange(9, dtype=jnp.int32)
    nb = build_neighbor_data(cids, g, table_capacity=1)
    cand = np.asarray(gather_candidates(cids, nb.table, g))
    # Center agent (cell 4) sees all 9 agents.
    assert set(cand[4]) == set(range(9))
    # Corner agent (cell 0) sees the 4 cells of its clipped window plus
    # sentinels for the 5 out-of-grid cells.
    c0 = set(cand[0])
    assert {0, 1, 3, 4} <= c0
    assert c0 - {0, 1, 3, 4} == {9}
    # No duplicates other than the sentinel: edge cells must be masked,
    # not clamped (double counting would double forces).
    non_sentinel = [x for x in cand[0] if x != 9]
    assert len(non_sentinel) == len(set(non_sentinel))
