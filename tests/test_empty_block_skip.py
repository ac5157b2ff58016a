"""Empty-block skip: blocks whose occupancy bound is zero skip their
window/field DMA and the whole compute body (ops/pallas/{step_kernel,
rebin}.py), writing all-inactive rows instead.

Contract under test: the two-kernel chain's REBINNED output is
bit-identical whether the bound is the real per-block occupancy (with
zeros on empty blocks, arming the skip) or the disabled bound (jmax=None
= K everywhere, every block computes).  The raw step-kernel output may
differ only in inactive-slot garbage, which the rebin provably masks.

The agent pattern [cell rows 0 and 7 occupied, rest empty] gives
per-block bounds [+, 0, 0, +] (RB=2: block 1's window covers padded rows
2-5, block 2's 4-7 — both empty), exercising every skip interleaving:
computed->skipped, consecutive skipped blocks, and a skipped block whose
successor computes (its prefetch must still be issued, landing in the
slot parity a skipped block never filled).
"""

import jax.numpy as jnp
import numpy as np

from pedoni_tpu.field import Field, FieldMaps
from pedoni_tpu.models.sfm_grid import occupancy_bound
from pedoni_tpu.ops.pallas.fields6 import Fields6
from pedoni_tpu.ops.pallas.rebin import rebin_kernel
from pedoni_tpu.ops.pallas.step_kernel import fused_step_kernel
from pedoni_tpu.physics import Physics
from pedoni_tpu.scenario import loads_scenario

UNIT = 1.5
K = 6
NXL = 128
NX = 10
NY = 8
RB = 2

SCENARIO = """
[field]
size = [15, 12]
[[waypoints]]
line = [[2, 2], [2, 10]]
"""


def _occupancy_jmax(d: np.ndarray, rb: int, k: int) -> np.ndarray:
    """The PRODUCTION bound (models/sfm_grid.occupancy_bound), exactly as
    the Simulator arms the skip — from the channel-7 count that
    _sparse_grid maintains like bin_state/spawn_scatter/rebin do."""
    nb = (d.shape[0] - 2) // rb
    return np.asarray(occupancy_bound(jnp.asarray(d), rb, nb, k))


def _sparse_grid(seed=0):
    """Agents only in cell rows {0, 7}: per-block bounds [+, 0, 0, +]
    (blocks 1 and 2 of four have empty windows — consecutive skips)."""
    rng = np.random.default_rng(seed)
    d = np.zeros((NY + 2, K, 8, NXL), np.float32)
    for r in (0, 7):
        for x in range(NX):
            n = int(rng.integers(1, 4))
            for j in range(n):
                p = np.array([x * UNIT, r * UNIT]) + rng.uniform(0.1, UNIT - 0.1, 2)
                d[r + 1, j, 0:2, x + 1] = p
                d[r + 1, j, 2:4, x + 1] = rng.normal(0, 0.4, 2)
                d[r + 1, j, 4, x + 1] = rng.uniform(0.8, 1.8)
                d[r + 1, j, 6, x + 1] = 1.0
            d[r + 1, 0, 7, x + 1] = float(n)  # count channel (slot 0)
    return d


def test_rebin_empty_block_skip_bit_exact():
    g = _sparse_grid(seed=3)
    jmax = _occupancy_jmax(g, RB, K)
    assert (jmax == 0).any() and (jmax > 0).any(), jmax
    base = [np.asarray(a) for a in rebin_kernel(
        jnp.asarray(g), UNIT, NX, NY, row_block=RB, interpret=True)]
    skip = [np.asarray(a) for a in rebin_kernel(
        jnp.asarray(g), UNIT, NX, NY, row_block=RB, interpret=True,
        jmax=jnp.asarray(jmax))]
    for a, b in zip(base, skip):
        np.testing.assert_array_equal(a, b)


def test_chain_empty_block_skip_bit_exact():
    phys = Physics()
    sc = loads_scenario(SCENARIO)
    maps = FieldMaps.from_field(Field.from_scenario(sc, unit=0.25))
    f6 = Fields6.build(maps, NX, NY, lane_align=128)
    d = _sparse_grid(seed=4)
    jmax = _occupancy_jmax(d, RB, K)
    assert (jmax == 0).any() and (jmax > 0).any(), jmax

    def chain(jm):
        g = fused_step_kernel(jnp.asarray(d), jnp.asarray(f6.wp),
                              jnp.asarray(f6.obs), phys, sc.size,
                              row_block=RB, interpret=True, jmax=jm)
        return rebin_kernel(g, UNIT, NX, NY, row_block=RB, interpret=True,
                            jmax=jm), g

    base, g_base = chain(None)
    skip, g_skip = chain(jnp.asarray(jmax))
    # the rebinned state and both per-block scalar outputs are bit-equal
    for a, b in zip(base, skip):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the raw kernel outputs agree wherever an agent is active; skipped
    # blocks are all-inactive in both
    act = np.asarray(g_base)[:, :, 6, :] > 0.5
    np.testing.assert_array_equal(act, np.asarray(g_skip)[:, :, 6, :] > 0.5)
    for c in range(8):
        np.testing.assert_array_equal(
            np.where(act, np.asarray(g_base)[:, :, c, :], 0.0),
            np.where(act, np.asarray(g_skip)[:, :, c, :], 0.0))
