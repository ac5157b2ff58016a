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

Input  G  [ny_pad+2, K, 8, NXL]: the step kernel's output (ghost-carrying:
                                 rows 0 and ny_pad+1 zero or neighbor
                                 slabs; channel layout: pos, vel, speed,
                                 dest, active, -).
Output D' [ny_pad+2, K, 8, NXL]: fresh bins, GHOST-CARRYING (edge blocks
                                 zero rows 0 and ny_pad+1, so D' is
                                 directly next step's input — no XLA pad
                                 copy); channels 0-6 as in G, channel 7 =
                                 per-cell active count CLAMPED to K
                                 (broadcast over slots — the free-slot
                                 cursor for the spawn scatter and the
                                 next occupancy bound).
Output overflow [nb] f32 (SMEM):  per-block sum of max(demand - K, 0) —
                                 agents dropped because their new cell
                                 was full.
Output demand_max [nb] f32 (SMEM): per-block max un-clamped demand; the
                                 Simulator grows table_capacity BEFORE
                                 cells overflow (drop-free growth) when
                                 max demand approaches K.

Agents whose new cell is full (cnt >= K) are dropped — the overflow
output counts them exactly.  Agents that left the field vanish here
exactly like the reference's out-of-grid drop (neighbor_grid.rs:29).
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


def _kernel(jmax_ref, roff_ref, coff_ref, g_hbm, out_hbm, ovf_ref, dmx_ref,
            *rest, rb: int, k: int, unit: float, nx_cells: int,
            ny_cells: int, nx_local: int, emit_counts: bool = False):
    if emit_counts:
        nin_ref, nout_ref, window2, outbuf, sems, out_sem = rest
    else:
        nin_ref = nout_ref = None
        window2, outbuf, sems, out_sem = rest
    i = pl.program_id(0)
    jmax = jmax_ref[i]
    # Double-buffered input DMA (same pattern as step_kernel): block
    # i+1's window streams in behind block i's compute.  Empty-block
    # skip (also as in step_kernel): jmax == 0 means no active agent in
    # the window, so the fresh bins are empty by construction — the
    # window DMA and the candidate walk are skipped; every start/wait is
    # gated on the TARGET block's bound so semaphores stay balanced.
    slot = jax.lax.rem(i, 2)

    def _copy(j, s):
        return pltpu.make_async_copy(g_hbm.at[pl.ds(j * rb, rb + 2)],
                                     window2.at[s], sems.at[s])

    @pl.when((i == 0) & (jmax > 0))
    def _issue_first():
        _copy(0, 0).start()

    @pl.when(jmax > 0)
    def _wait_input():
        _copy(i, slot).wait()

    # (clamped read: jmax_ref[i+1] would be out of bounds on the last
    # block — the condition masks the clamp's aliased value.)
    nxt = jnp.minimum(i + 1, pl.num_programs(0) - 1)

    @pl.when((i + 1 < pl.num_programs(0)) & (jmax_ref[nxt] > 0))
    def _prefetch_next():
        _copy(i + 1, 1 - slot).start()

    @pl.when(jmax == 0)
    def _empty_block():
        outbuf[:] = jnp.zeros_like(outbuf[:])
        ovf_ref[i] = 0.0
        dmx_ref[i] = 0.0
        if emit_counts:
            nin_ref[i] = 0.0
            nout_ref[i] = 0.0

    @pl.when(jmax > 0)
    def _compute_block():
        _compute(i, jmax, roff_ref, coff_ref, window2.at[slot], outbuf,
                 ovf_ref, dmx_ref, nin_ref, nout_ref, rb=rb, k=k, unit=unit,
                 nx_cells=nx_cells, ny_cells=ny_cells, nx_local=nx_local)

    co = pltpu.make_async_copy(
        outbuf, out_hbm.at[pl.ds(i * rb + 1, rb)], out_sem)
    co.start()
    co.wait()

    @pl.when(i == 0)
    def _write_top_ghost():
        outbuf[0:1] = jnp.zeros_like(outbuf[0:1])
        cz = pltpu.make_async_copy(
            outbuf.at[pl.ds(0, 1)], out_hbm.at[pl.ds(0, 1)], out_sem)
        cz.start()
        cz.wait()

    @pl.when(i == pl.num_programs(0) - 1)
    def _write_bottom_ghost():
        outbuf[0:1] = jnp.zeros_like(outbuf[0:1])
        nyp1 = pl.num_programs(0) * rb + 1
        cz = pltpu.make_async_copy(
            outbuf.at[pl.ds(0, 1)], out_hbm.at[pl.ds(nyp1, 1)], out_sem)
        cz.start()
        cz.wait()


def _compute(i, jmax, roff_ref, coff_ref, window, outbuf, ovf_ref, dmx_ref,
             nin_ref=None, nout_ref=None, *, rb: int, k: int, unit: float,
             nx_cells: int, ny_cells: int, nx_local: int):
    """The occupied-block body: walk the 9*jmax candidates and compact
    them into fresh bins in ``outbuf``.  (``i`` = pl.program_id(0), passed
    in: calling the primitive inside a pl.when body escapes the
    interpret-mode evaluator.)"""
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
                # Landing test in SOURCE-lane space (one shift of the
                # result mask instead of two of the operands):
                # _shift_lane(x, d)[l] == x[l + d], so the old form
                # tests tgt_lane[l + dxo] == lane[l]; at source lane
                # s = l + dxo that is tgt_lane[s] == lane[s] - dxo.
                # The circular wrap differs only on agents displaced a
                # full domain width — geometrically impossible (movement
                # < 1 cell, assert_movement_fits_rebin); both forms
                # reject them.
                lands = _shift_lane(
                    jnp.where(tgt_lane == lane - float(dxo), lands_row,
                              0.0), dxo)
                onehot = jnp.where(k_iota == cnt, lands, 0.0)
                outs = [o + onehot * s for o, s in zip(outs, sh)]
                cnt = cnt + lands
        return (cnt, *outs)

    cnt, *outs = jax.lax.fori_loop(0, jmax, body, (cnt, *outs))

    for c in range(6):
        outbuf[:, :, c, :] = outs[c]
    outbuf[:, :, 6, :] = jnp.where(k_iota < cnt, 1.0, 0.0)
    outbuf[:, :, 7, :] = jnp.broadcast_to(jnp.minimum(cnt, float(k)),
                                          (rb, k, nxl))
    # Per-block overflow / peak-demand scalars (the XLA side reduces
    # them): the un-clamped cnt never leaves the kernel otherwise.
    ovf_ref[i] = jnp.sum(jnp.maximum(cnt - float(k), 0.0))
    dmx_ref[i] = jnp.max(cnt)
    if nin_ref is not None:
        # Metric fusion (emit_counts): per-block input/output active sums
        # so the step never re-reads the 10 MB act channel on the XLA
        # side (measured glue 0.36 ms/step at 1M, scripts/ab_glue.py).
        # Input side gated to OWNED lanes — under 2D tile sharding the
        # ghost lanes hold the lane-neighbor's agents (single-chip the
        # gate is a no-op; ghost lanes are empty).  Output side needs no
        # gate: cnt only counts landers, and landing is owned-only.
        own = jnp.where(
            (lane >= coff.astype(jnp.float32) + 1.0) & (lane <= nx_lim),
            1.0, 0.0)
        nin_ref[i] = jnp.sum(window[1 : 1 + rb, :, 6, :] * own)
        nout_ref[i] = jnp.sum(jnp.minimum(cnt, float(k)))


def _kernel_inc(jmax_ref, mmax_ref, roff_ref, coff_ref, g_hbm, m_hbm,
                out_hbm, ovf_ref, dmx_ref, *rest, rb: int, k: int, mk: int,
                unit: float, nx_cells: int, ny_cells: int, nx_local: int,
                emit_counts: bool = False):
    if emit_counts:
        nin_ref, nout_ref, gwin2, mwin2, outbuf, sems, out_sem = rest
    else:
        nin_ref = nout_ref = None
        gwin2, mwin2, outbuf, sems, out_sem = rest
    """Incremental (hole-preserving) rebin: stayers keep their slots,
    only the compacted mover table M is walked and first-fit into holes.

    Same ghost-carrying output contract as _kernel; skip/DMA gating on
    the INPUT occupancy bound jmax (zero => no stayers and no movers)."""
    i = pl.program_id(0)
    jmax = jmax_ref[i]
    slot = jax.lax.rem(i, 2)

    def _copies(j, s):
        return (
            # stay side needs only the rb CENTER rows of G
            pltpu.make_async_copy(g_hbm.at[pl.ds(j * rb + 1, rb)],
                                  gwin2.at[s], sems.at[s, 0]),
            pltpu.make_async_copy(m_hbm.at[pl.ds(j * rb, rb + 2)],
                                  mwin2.at[s], sems.at[s, 1]),
        )

    @pl.when((i == 0) & (jmax > 0))
    def _issue_first():
        for c in _copies(0, 0):
            c.start()

    @pl.when(jmax > 0)
    def _wait_input():
        for c in _copies(i, slot):
            c.wait()

    nxt = jnp.minimum(i + 1, pl.num_programs(0) - 1)

    @pl.when((i + 1 < pl.num_programs(0)) & (jmax_ref[nxt] > 0))
    def _prefetch_next():
        for c in _copies(i + 1, 1 - slot):
            c.start()

    @pl.when(jmax == 0)
    def _empty_block():
        outbuf[:] = jnp.zeros_like(outbuf[:])
        ovf_ref[i] = 0.0
        dmx_ref[i] = 0.0
        if emit_counts:
            nin_ref[i] = 0.0
            nout_ref[i] = 0.0

    @pl.when(jmax > 0)
    def _compute_block():
        _compute_inc(i, mmax_ref[i], roff_ref, coff_ref, gwin2.at[slot],
                     mwin2.at[slot], outbuf, ovf_ref, dmx_ref, nin_ref,
                     nout_ref, rb=rb, k=k, mk=mk, unit=unit,
                     nx_cells=nx_cells, ny_cells=ny_cells,
                     nx_local=nx_local)

    co = pltpu.make_async_copy(
        outbuf, out_hbm.at[pl.ds(i * rb + 1, rb)], out_sem)
    co.start()
    co.wait()

    @pl.when(i == 0)
    def _write_top_ghost():
        outbuf[0:1] = jnp.zeros_like(outbuf[0:1])
        cz = pltpu.make_async_copy(
            outbuf.at[pl.ds(0, 1)], out_hbm.at[pl.ds(0, 1)], out_sem)
        cz.start()
        cz.wait()

    @pl.when(i == pl.num_programs(0) - 1)
    def _write_bottom_ghost():
        outbuf[0:1] = jnp.zeros_like(outbuf[0:1])
        nyp1 = pl.num_programs(0) * rb + 1
        cz = pltpu.make_async_copy(
            outbuf.at[pl.ds(0, 1)], out_hbm.at[pl.ds(nyp1, 1)], out_sem)
        cz.start()
        cz.wait()


def _compute_inc(i, mmax, roff_ref, coff_ref, gwin, mwin, outbuf, ovf_ref,
                 dmx_ref, nin_ref=None, nout_ref=None, *, rb: int, k: int,
                 mk: int, unit: float, nx_cells: int, ny_cells: int,
                 nx_local: int):
    """Occupied-block body of the incremental rebin.

    Stay side: channel 7 of G carries the stay mask computed by kernel 1
    (active AND target cell == own cell) — stayers are copied through in
    their existing slots (6 masked copies instead of 9*jmax one-hot MACs).
    Mover side: walk the 9*mmax candidates of the mover-table window and
    place the n-th lander at its cell's rank-n hole via the precomputed
    exclusive hole-rank hr (occupied slots poisoned to -1, so one wide
    compare per candidate finds the slot; no per-candidate cumsum)."""
    nxl = gwin.shape[-1]
    coff = coff_ref[0]
    lane = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, nxl), 2)
            + coff).astype(jnp.float32)
    nx_lim = (jnp.minimum(jnp.int32(nx_local) + coff, jnp.int32(nx_cells))
              ).astype(jnp.float32)
    row_f = (jax.lax.broadcasted_iota(jnp.int32, (rb, 1, 1), 0).astype(jnp.float32)
             + (i * rb + roff_ref[0]).astype(jnp.float32))
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1).astype(jnp.float32)

    # Stay mask, gated to OWNED lanes: under 2D tile sharding the ghost
    # lanes of G hold the lane-neighbor's owned edge (exchanged in), and
    # a neighbor's stayer must not be kept here too — the mover side is
    # already owned-only via the lands mask, the stay side needs the
    # same gate.  Single-chip this is a no-op (ghost lanes never hold
    # agents) costing two compares + a multiply per block.
    own = jnp.where(
        (lane >= coff.astype(jnp.float32) + 1.0) & (lane <= nx_lim),
        1.0, 0.0)
    st = gwin[:, :, 7, :] * own  # [rb, K, nxl] stay mask, 0/1 f32
    outs = [gwin[:, :, c, :] * st for c in range(6)]

    # Exclusive prefix count of holes along the slot axis (unrolled —
    # K narrow adds once per block), then poison occupied slots to -1:
    # free slot s with hr[s] == m is exactly the (m+1)-th hole.
    notst = 1.0 - st
    run = jnp.zeros((rb, 1, nxl), jnp.float32)
    hr_slices = []
    for s in range(k):
        hr_slices.append(run)
        run = run + notst[:, s : s + 1, :]
    free_total = run  # [rb, 1, nxl]
    hr = jnp.concatenate(hr_slices, axis=1)  # [rb, K, nxl]
    hrp = jnp.where(st > 0.5, -1.0, hr)

    # One accumulator: mdem counts LANDERS per cell.  The next lander's
    # hole rank is mdem itself, and a full cell can never match — free
    # slots carry ranks 0..free_total-1, so once mdem >= free_total the
    # one-hot is empty and every later lander drops naturally.  (The
    # explicit "placed" guard this replaces was redundant: placed and
    # landed counts coincide up to the first drop, after which the cell
    # stays full for the rest of the step.)
    mdem = jnp.zeros((rb, 1, nxl), jnp.float32)  # movers landing (demand)

    def body(j, carry):
        mdem, *outs = carry
        for dy in (-1, 0, 1):
            ch = [mwin[1 + dy : 1 + dy + rb, pl.ds(j, 1), c, :]
                  for c in range(7)]
            act = ch[6] > 0.5
            # identical classification math to kernel 1 / the full rebin
            tgt_lane = jnp.floor(ch[0] / unit) + 1.0
            tgt_row = jnp.floor(ch[1] / unit)
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
                # Source-space landing test, one shift (see _compute).
                lands = _shift_lane(
                    jnp.where(tgt_lane == lane - float(dxo), lands_row,
                              0.0), dxo)
                onehot = jnp.where(hrp == mdem, lands, 0.0)
                outs = [o + onehot * s_ for o, s_ in zip(outs, sh)]
                mdem = mdem + lands
        return (mdem, *outs)

    mdem, *outs = jax.lax.fori_loop(0, mmax, body, (mdem, *outs))

    # Filled holes are exactly the free slots with rank < placed count
    # = min(mdem, free_total); since every rank is < free_total, the
    # comparison against mdem marks the same set.
    act_out = st + jnp.where((hrp >= 0.0) & (hrp < mdem), 1.0, 0.0)
    for c in range(6):
        outbuf[:, :, c, :] = outs[c]
    outbuf[:, :, 6, :] = act_out
    # channel 7 = max occupied slot index + 1 ("topcnt"): the occupancy
    # bound for the next step's kernels and the spawn scatter's free-slot
    # cursor (spawns append ABOVE the holes; periodic compaction reclaims)
    topcnt = jnp.max((k_iota + 1.0) * act_out, axis=1, keepdims=True)
    outbuf[:, :, 7, :] = jnp.broadcast_to(topcnt, (rb, k, nxl))
    ovf_ref[i] = jnp.sum(jnp.maximum(mdem - free_total, 0.0))
    dmx_ref[i] = jnp.max((jnp.float32(k) - free_total) + mdem)
    if nin_ref is not None:
        # Metric fusion (emit_counts, see _compute): input act over the
        # rb center rows (gwin holds exactly those), owned lanes only;
        # output act_out is owned-only by construction (st is own-gated,
        # mdem only accumulates at owned target lanes).
        nin_ref[i] = jnp.sum(gwin[:, :, 6, :] * own)
        nout_ref[i] = jnp.sum(act_out)


def rebin_incremental(g: jnp.ndarray, m: jnp.ndarray, unit: float,
                      nx_cells: int, ny_cells: int | None = None,
                      row_block: int = 4, interpret: bool = False,
                      jmax: jnp.ndarray | None = None,
                      mmax: jnp.ndarray | None = None,
                      row_offset: jnp.ndarray | None = None,
                      col_offset: jnp.ndarray | None = None,
                      nx_local: int | None = None,
                      emit_counts: bool = False) -> tuple:
    """Hole-preserving rebin: G's stayers (channel 7 = kernel-1 stay mask)
    keep their slots; only the compacted mover table ``m`` is walked and
    first-fit into holes.  ~90% of agents do not change cell in a step
    (0.134 m mean motion vs 1.5 m cells), so the candidate walk shrinks
    from 9*jmax (~126 at bench density) to 9*mmax (~50) one-hot MACs —
    the reference's whole per-tick sort is sfm.rs:58-77; it should not
    cost a third of the step (VERDICT round 3 #1).

    g [ny_pad+2, K, 8, NXL]: kernel-1 output with ch 7 = stay mask.
    m [ny_pad+2, MK, 8, NXL]: kernel-1 mover table (ch 7 = per-cell mover
    count, ghost rows empty or neighbor slabs under sharding).
    jmax [nb]: INPUT occupancy bound — gates the empty-block skip.
    mmax [nb]: per-block mover bound (max mover count in the 3-row
    window), the candidate-walk trip count.
    Returns (D' ghost-carrying with ch 7 = topcnt, overflow [nb],
    demand_max [nb]) — same contract as rebin_kernel, except bins may
    contain holes (inactive slots below topcnt).  With ``emit_counts``
    two [nb] f32 outputs are appended: per-block input-active and
    output-active sums (owned lanes), so the step's n_active/n_after
    metrics need no full-grid XLA reductions (ab_glue.py measured that
    glue at 0.36 ms/step at 1M)."""
    ny2, k, ch, nxl = g.shape
    mk = m.shape[1]
    assert ch == 8 and nxl % 128 == 0 and m.shape == (ny2, mk, 8, nxl)
    ny_pad = ny2 - 2
    rb = row_block
    assert ny_pad % rb == 0
    nb = ny_pad // rb
    if ny_cells is None:
        ny_cells = ny_pad
    if jmax is None:
        jmax = jnp.full((nb,), k, jnp.int32)
    if mmax is None:
        mmax = jnp.full((nb,), mk, jnp.int32)
    if row_offset is None:
        row_offset = jnp.zeros((1,), jnp.int32)
    if col_offset is None:
        col_offset = jnp.zeros((1,), jnp.int32)
    if nx_local is None:
        nx_local = nx_cells

    kernel = functools.partial(_kernel_inc, rb=rb, k=k, mk=mk, unit=unit,
                               nx_cells=nx_cells, ny_cells=ny_cells,
                               nx_local=nx_local, emit_counts=emit_counts)
    n_extra = 2 if emit_counts else 0
    smem_out = pl.BlockSpec((nb,), lambda i: (0,), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [smem_out] * (2 + n_extra),
        out_shape=[
            jax.ShapeDtypeStruct((ny_pad + 2, k, 8, nxl), jnp.float32),
        ] + [jax.ShapeDtypeStruct((nb,), jnp.float32)] * (2 + n_extra),
        scratch_shapes=[
            pltpu.VMEM((2, rb, k, 8, nxl), jnp.float32),
            pltpu.VMEM((2, rb + 2, mk, 8, nxl), jnp.float32),
            pltpu.VMEM((rb, k, 8, nxl), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jmax, mmax, row_offset, col_offset, g, m)


def rebin_kernel(g: jnp.ndarray, unit: float, nx_cells: int,
                 ny_cells: int | None = None, row_block: int = 4,
                 interpret: bool = False,
                 jmax: jnp.ndarray | None = None,
                 row_offset: jnp.ndarray | None = None,
                 col_offset: jnp.ndarray | None = None,
                 nx_local: int | None = None,
                 emit_counts: bool = False) -> jnp.ndarray:
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
    Returns (D' [ny_pad+2, K, 8, NXL] ghost-carrying with channel 7 =
    per-cell count clamped to K, overflow [nb], demand_max [nb]).
    With ``emit_counts`` two [nb] f32 outputs are appended: per-block
    input-active and output-active sums (owned lanes) — the step's
    n_active/n_after without full-grid XLA reductions (see
    rebin_incremental).
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
                               nx_local=nx_local, emit_counts=emit_counts)
    n_extra = 2 if emit_counts else 0
    smem_out = pl.BlockSpec((nb,), lambda i: (0,), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [smem_out] * (2 + n_extra),
        out_shape=[
            jax.ShapeDtypeStruct((ny_pad + 2, k, 8, nxl), jnp.float32),
        ] + [jax.ShapeDtypeStruct((nb,), jnp.float32)] * (2 + n_extra),
        scratch_shapes=[
            pltpu.VMEM((2, rb + 2, k, 8, nxl), jnp.float32),
            pltpu.VMEM((rb, k, 8, nxl), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jmax, row_offset, col_offset, g)
