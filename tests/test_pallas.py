"""Pallas pairwise kernel vs the XLA dense pass (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pedoni_tpu.ops import forcepass
from pedoni_tpu.ops.neighbor import CellGrid
from pedoni_tpu.ops.pallas.pairwise import pallas_pairwise
from pedoni_tpu.physics import Physics


def _random_cell_data(rng, grid: CellGrid, k: int, density: float = 0.4):
    """Random padded cell-grid data [ny+2, nx+2, K, 8] with plausible
    positions inside each cell."""
    ny, nx = grid.ny, grid.nx
    d = np.zeros((ny + 2, nx + 2, k, 8), np.float32)
    for cy in range(ny):
        for cx in range(nx):
            n_here = rng.binomial(k, density)
            for j in range(n_here):
                px = (cx + rng.random()) * grid.unit
                py = (cy + rng.random()) * grid.unit
                vel = rng.normal(0, 1, 2)
                e = rng.normal(0, 1, 2)
                e /= np.linalg.norm(e) + 1e-9
                d[cy + 1, cx + 1, j] = [px, py, vel[0], vel[1], e[0], e[1], 1.0, 0.0]
    return d


@pytest.mark.parametrize("rb", [2, 4])
def test_pallas_matches_dense(rb):
    rng = np.random.default_rng(0)
    grid = CellGrid(unit=1.4, nx=12, ny=8)
    k = 8
    phys = Physics()
    d = _random_cell_data(rng, grid, k)

    # XLA dense reference.
    acc_flat = forcepass.dense_pairwise(jnp.asarray(d), grid, k, phys,
                                        row_block=4)
    acc_ref = np.asarray(acc_flat).reshape(grid.ny + 2, grid.nx + 2, k, 2)
    acc_ref = acc_ref[1:-1, 1:-1]  # [ny, nx, K, 2]

    # Pallas kernel: x-minor layout, rows padded to a multiple of rb,
    # columns padded to a multiple of 128.
    ny_pad = -(-grid.ny // rb) * rb
    nx128 = -(-(grid.nx + 2) // 128) * 128
    dt = np.zeros((ny_pad + 2, k, 8, nx128), np.float32)
    dt[: grid.ny + 2, :, :, : grid.nx + 2] = np.transpose(d, (0, 2, 3, 1))
    acc = pallas_pairwise(jnp.asarray(dt), phys, row_block=rb, interpret=True)
    acc = np.asarray(acc)[: grid.ny, :, :, 1 : grid.nx + 1]  # [ny, K, 2, nx]
    acc = np.transpose(acc, (0, 3, 1, 2))  # -> [ny, nx, K, 2]

    np.testing.assert_allclose(acc, acc_ref, rtol=2e-5, atol=1e-5)
    # Sanity: some non-zero forces were produced.
    assert np.abs(acc).max() > 0.1
