"""In-kernel rebinning: compact the post-step grid into fresh cell bins.

This is the round-2 replacement for the per-step XLA pipeline
argsort -> packed permute -> layout -> slot scatter (~78 ms at 1M agents,
PLAN.md): agent state stays in the cell grid between steps and this kernel
rebuilds the bins from the *integrated* positions written by the fused step
kernel (ops/pallas/step_kernel.py) — the reference's per-tick counting sort
(sfm.rs:58-77, neighbor_grid.rs:22-36) expressed as a dense VPU pass.

Because agents move at most ``max_speed_factor * speed * dt`` (< one
1.5 m cell for any sane desired speed), every output cell's new occupants
come from its 3x3 neighborhood, which sits inside the block's DMA window.
For each center row the kernel walks the 9*jmax candidates in a fixed
(j, dy, dx) order, keeping a per-lane running count ``cnt``; a candidate
landing in this cell is written to slot ``cnt`` via a one-hot
``(k_iota == cnt)`` select-accumulate.  Output bins are fully compacted
(rank-dense, no holes), so the per-cell count doubles as the free-slot
cursor for the XLA-side spawn scatter and the next step's occupancy bound.

Input  G  [ny_pad+2, K, 8, NXL]: the step kernel's output, padded with one
                                 zero ghost row on each side (channel
                                 layout: pos, vel, speed, dest, active, -).
Output D' [ny_pad,   K, 8, NXL]: fresh bins; channels 0-6 as in G,
                                 channel 7 = per-cell active count
                                 (broadcast over slots).

Agents whose new cell is full (cnt >= K) are dropped — count them as
sum(G.active) - sum(D'.active) on the XLA side.  Agents that left the
field vanish here exactly like the reference's out-of-grid drop
(neighbor_grid.rs:29).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Circular lane shift shared with the force kernel; here wrapped lanes
# are killed by the landing mask (a wrapped candidate's target lane is
# at the far side of the grid).
from .step_kernel import _shift_lane


def _kernel(jmax_ref, roff_ref, coff_ref, g_hbm, out_ref, window, sem, *,
            rb: int, k: int, unit: float, nx_cells: int, ny_cells: int,
            nx_local: int):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(g_hbm.at[pl.ds(i * rb, rb + 2)], window, sem)
    cp.start()
    cp.wait()

    nxl = window.shape[-1]
    # Output cell at LOCAL lane l is global cell x = col_offset + l - 1;
    # center row w is GLOBAL cell row row_offset + i*rb + w (positions are
    # global coordinates even when g is a per-device slab under spatial
    # sharding).  Only owned lanes [1, nx_lim] keep agents: ghost lanes
    # belong to the lane-neighbor device (or fall off the field edge).
    coff = coff_ref[0]
    lane = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, nxl), 2)
            + coff).astype(jnp.float32)
    nx_lim = (jnp.minimum(jnp.int32(nx_local) + coff, jnp.int32(nx_cells))
              ).astype(jnp.float32)
    row_f = (jax.lax.broadcasted_iota(jnp.int32, (rb, 1, 1), 0).astype(jnp.float32)
             + (i * rb + roff_ref[0]).astype(jnp.float32))
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1).astype(jnp.float32)

    cnt = jnp.zeros((rb, 1, nxl), jnp.float32)
    # channels 0-5 accumulate via one-hot MACs; the active channel needs no
    # accumulation — bins are compacted, so slot k is occupied iff k < cnt.
    outs = tuple(jnp.zeros((rb, k, nxl), jnp.float32) for _ in range(6))
    jmax = jmax_ref[i]

    # All 9 window offsets in ONE fori body — loop-control/carry overhead
    # is paid per candidate slot, not per (dy, slot).  Compaction order is
    # (j, dy, dx); any fixed order is valid (bins are sets — the flat path
    # orders by agent index, tests compare position sets).
    # No non-finite guard needed here: the step kernel sanitizes its
    # window (see step_kernel._kernel), so every value this kernel reads
    # is finite by construction.
    def body(j, carry):
        cnt, *outs = carry
        for dy in (-1, 0, 1):
            ch = [window[1 + dy : 1 + dy + rb, pl.ds(j, 1), c, :]
                  for c in range(7)]
            act = ch[6] > 0.5
            # f32 division, matching ops/neighbor.compute_cell_ids exactly
            # (an inv-unit multiply rounds differently at cell boundaries).
            # tgt_lane is the GLOBAL lane coordinate (global cell + 1).
            tgt_lane = jnp.floor(ch[0] / unit) + 1.0
            tgt_row = jnp.floor(ch[1] / unit)
            # Off-field agents (ghost column / pad rows) vanish like the
            # reference's out-of-grid drop (neighbor_grid.rs:29); agents
            # landing past the owned lanes belong to the lane-neighbor
            # device (its rebin picks them out of its ghost lane).  The
            # mask rides as f32 — Mosaic cannot lane-rotate i1 vectors.
            lands_row = jnp.where(
                act
                & (tgt_row == row_f)
                & (tgt_row <= jnp.float32(ny_cells - 1))
                & (tgt_lane >= coff.astype(jnp.float32) + 1.0)
                & (tgt_lane <= nx_lim),
                1.0, 0.0,
            )
            for dxo in (-1, 0, 1):
                sh = [_shift_lane(c, dxo) for c in ch[:6]]
                lands = jnp.where(
                    _shift_lane(tgt_lane, dxo) == lane,
                    _shift_lane(lands_row, dxo), 0.0,
                )
                onehot = jnp.where(k_iota == cnt, lands, 0.0)
                outs = [o + onehot * s for o, s in zip(outs, sh)]
                cnt = cnt + lands
        return (cnt, *outs)

    cnt, *outs = jax.lax.fori_loop(0, jmax, body, (cnt, *outs))

    for c in range(6):
        out_ref[:, :, c, :] = outs[c]
    out_ref[:, :, 6, :] = jnp.where(k_iota < cnt, 1.0, 0.0)
    out_ref[:, :, 7, :] = jnp.broadcast_to(cnt, (rb, k, nxl))


def rebin_kernel(g: jnp.ndarray, unit: float, nx_cells: int,
                 ny_cells: int | None = None, row_block: int = 4,
                 interpret: bool = False,
                 jmax: jnp.ndarray | None = None,
                 row_offset: jnp.ndarray | None = None,
                 col_offset: jnp.ndarray | None = None,
                 nx_local: int | None = None) -> jnp.ndarray:
    """Rebin the post-step grid ``g`` into fresh compacted cell bins.

    g    [ny_pad+2, K, 8, NXL]  (NXL % 128 == 0, ny_pad % row_block == 0;
                                 rows 0 and ny_pad+1 must be empty ghosts)
    unit: neighbor-cell size in meters.
    nx_cells / ny_cells: real field extent in cells (agents landing outside
    vanish); ny_cells defaults to ny_pad.
    jmax [nb] i32: per-block occupancy bound (max occupied slots of any
    cell in the block's 3-row window); None means K.
    row_offset [1] i32: global cell row of g's first real row (row-strip
    sharding); None means 0.
    col_offset [1] i32 / nx_local: under 2D tile sharding
    (parallel/tile2d.py), lane l holds global cell column col_offset+l-1
    and only lanes [1, nx_local] are owned — agents landing elsewhere are
    the lane-neighbor's (its rebin keeps them).  Defaults: 0 / nx_cells.
    Returns D' [ny_pad, K, 8, NXL] with channel 7 = per-cell count.
    """
    ny2, k, ch, nxl = g.shape
    assert ch == 8 and nxl % 128 == 0
    ny_pad = ny2 - 2
    rb = row_block
    assert ny_pad % rb == 0
    nb = ny_pad // rb
    if ny_cells is None:
        ny_cells = ny_pad
    if jmax is None:
        jmax = jnp.full((nb,), k, jnp.int32)
    if row_offset is None:
        row_offset = jnp.zeros((1,), jnp.int32)
    if col_offset is None:
        col_offset = jnp.zeros((1,), jnp.int32)
    if nx_local is None:
        nx_local = nx_cells

    kernel = functools.partial(_kernel, rb=rb, k=k, unit=unit,
                               nx_cells=nx_cells, ny_cells=ny_cells,
                               nx_local=nx_local)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (rb, k, 8, nxl), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ny_pad, k, 8, nxl), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rb + 2, k, 8, nxl), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(jmax, row_offset, col_offset, g)
