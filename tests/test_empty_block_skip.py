"""Empty-block skip: blocks whose occupancy bound is zero skip their
window/field DMA and the whole compute body (ops/pallas/{step_kernel,
rebin}.py), writing all-inactive rows instead.

Contract under test: the two-kernel chain's REBINNED output is
bit-identical whether the bound is the real per-block occupancy (with
zeros on empty blocks, arming the skip) or the disabled bound (jmax=None
= K everywhere, every block computes).  The raw step-kernel output may
differ only in inactive-slot garbage, which the rebin provably masks.

The agent pattern [rows 0-1 and 7 occupied, rest empty] exercises every
skip interleaving: occupied->occupied prefetch, a skipped block whose
successor computes (its prefetch must still be issued), consecutive
skipped blocks, and a skipped block in the double-buffer slot parity of
a later computed block.
"""

import jax.numpy as jnp
import numpy as np

from pedoni_tpu.field import Field, FieldMaps
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
    """models/sfm_grid.occupancy_bound, from the active channel (these
    synthetic grids do not carry the channel-7 count)."""
    cnt = (d[:, :, 6, :] > 0.5).sum(axis=1)
    rowmax = cnt.max(axis=-1)
    nb = (d.shape[0] - 2) // rb
    w = np.stack([rowmax[off::rb][:nb] for off in range(rb + 2)])
    return np.minimum(w.max(axis=0), k).astype(np.int32)


def _sparse_grid(seed=0):
    """Agents only in cell rows {0, 1, 7}: blocks 1 and 2 of four have
    empty windows (block 0 sees rows 0-1, block 3 sees row 7)."""
    rng = np.random.default_rng(seed)
    d = np.zeros((NY + 2, K, 8, NXL), np.float32)
    for r in (0, 1, 7):
        for x in range(NX):
            for j in range(rng.integers(1, 4)):
                p = np.array([x * UNIT, r * UNIT]) + rng.uniform(0.1, UNIT - 0.1, 2)
                d[r + 1, j, 0:2, x + 1] = p
                d[r + 1, j, 2:4, x + 1] = rng.normal(0, 0.4, 2)
                d[r + 1, j, 4, x + 1] = rng.uniform(0.8, 1.8)
                d[r + 1, j, 6, x + 1] = 1.0
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
