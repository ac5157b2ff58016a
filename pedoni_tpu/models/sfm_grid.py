"""Cell-resident Pallas backend: agent state lives in the cell grid.

Round-2 flagship step.  The flat-array backends (sfm.py, sfm_pallas.py)
pay ~78 ms/step at 1M agents in XLA index ops (argsort, packed permute,
slot scatter, result gather — PLAN.md round-2 measurements) just to move
agents between the flat array and the cell grid every step.  Here the grid
IS the state: ``D [ny_pad+2, K, 8, NXL]`` stays resident in HBM and each
step runs exactly two Pallas kernels —

1. ``fused_step_kernel``  (ops/pallas/step_kernel.py): sampling, despawn,
   all forces, integration; reference physics sfm.rs:91-255.
2. ``rebin_kernel``       (ops/pallas/rebin.py): re-bins integrated
   positions into fresh compacted cells; the reference's per-tick
   counting sort (sfm.rs:58-77) with out-of-grid drop
   (neighbor_grid.rs:29).

plus an XLA-side spawn scatter of at most S candidate rows (S tiny,
static) BEFORE kernel 1 so new agents receive forces the same tick the
reference spawns them (lib.rs:64-90).

Channel layout (dim 2 of D): 0 pos.x, 1 pos.y, 2 vel.x, 3 vel.y, 4 speed,
5 dest, 6 active, 7 per-cell active count (valid at slot 0; the spawn
scatter updates only slot 0, the rebin broadcasts it).

Deviations from the flat path, all reported per step:
- agents landing in a full cell are DROPPED (n_overflow), not frozen;
- spawn candidates aimed at full cells are dropped (n_dropped);
- agents leaving the field vanish at the rebin (n_exited — expected,
  not a loss), one step earlier than the flat path's next-step despawn.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FieldMaps
from ..ops import forcepass
from ..ops.neighbor import compute_cell_ids
from ..ops.pallas.rebin import rebin_incremental, rebin_kernel
from ..ops.pallas.step_kernel import fused_step_kernel, waypoint_block_planes
from .sfm import AgentState, SimState, StepConfig, StepMetrics, _spawn_candidates
from .sfm_pallas import pallas_device_inputs, supports  # noqa: F401  (same limits)


class GridState(NamedTuple):
    d: jnp.ndarray  # [ny_pad+2, K, 8, NXL] cell-resident agent state
    key: jnp.ndarray  # PRNG key
    step: jnp.ndarray  # i32


class GridDims(NamedTuple):
    ny_pad: int
    nxl: int
    k: int
    rb: int

    @classmethod
    def build(cls, cfg: StepConfig, row_block: int = 2) -> "GridDims":
        rb = row_block
        ny_pad = -(-cfg.grid.ny // rb) * rb
        nxl = -(-(cfg.grid.nx + 3) // 128) * 128
        flat = (ny_pad + 2) * cfg.table_capacity * 8 * nxl
        assert flat < 2**31, "grid too large for int32 flat indexing"
        return cls(ny_pad=ny_pad, nxl=nxl, k=cfg.table_capacity, rb=rb)


def bin_state(cfg: StepConfig, sim: SimState, row_block: int = 2) -> GridState:
    """One-time conversion: flat agent arrays -> cell-resident grid.

    Uses the flat path's sort+scatter (fine off the hot path)."""
    dims = GridDims.build(cfg, row_block)
    grid, k = cfg.grid, dims.k
    a = sim.agents
    cid = compute_cell_ids(a.pos, a.active, grid)
    order = jnp.argsort(cid, stable=True)
    packed = jnp.concatenate(
        [
            a.pos, a.vel, a.speed[:, None], a.dest.astype(jnp.float32)[:, None],
            a.active.astype(jnp.float32)[:, None],
            jnp.zeros((a.pos.shape[0], 1), jnp.float32),
        ],
        axis=1,
    )
    sp = jnp.take(packed, order, axis=0, mode="clip")
    cid_s = jnp.take(cid, order, mode="clip")
    layout = forcepass.build_layout(cid_s, sp[:, 6] > 0.5, grid, k)
    flat = jnp.zeros(((grid.ny + 2) * (grid.nx + 2) * k + 1, 8), jnp.float32)
    flat = flat.at[layout.slot].set(sp, mode="drop")
    dg = flat[:-1].reshape(grid.ny + 2, grid.nx + 2, k, 8)
    dk = jnp.transpose(dg, (0, 2, 3, 1))
    dk = jnp.pad(dk, ((0, dims.ny_pad - grid.ny), (0, 0), (0, 0),
                      (0, dims.nxl - (grid.nx + 2))))
    # per-cell count into channel 7 (slot 0)
    cnt = jnp.sum(dk[:, :, 6, :], axis=1)  # [ny_pad+2, NXL]
    dk = dk.at[:, 0, 7, :].set(cnt)
    return GridState(d=dk, key=sim.key, step=sim.step)


def unbin_state(cfg: StepConfig, gs: GridState, row_block: int = 2,
                n_out: int | None = None) -> SimState:
    """Grid -> flat agent arrays (for checkpoint / render / diagnostics).

    Active agents compact to the front.  ``n_out`` sizes the flat arrays;
    by default it is cfg.capacity grown (in power-of-two steps) to hold
    the live population — the grid has no flat-capacity limit of its own,
    so a checkpoint/render round trip must never truncate actives.  Runs
    eagerly (off the hot path); the population fetch is a device sync.
    """
    dims = GridDims.build(cfg, row_block)
    rows = jnp.transpose(gs.d, (0, 1, 3, 2)).reshape(-1, 8)  # [slots, 8]
    act = rows[:, 6] > 0.5
    if n_out is None:
        n_out = cfg.capacity
        n_live = int(jnp.sum(act))
        while n_out < n_live:
            n_out *= 2
    order = jnp.argsort(~act, stable=True)[:n_out]
    sel = jnp.take(rows, order, axis=0, mode="clip")
    agents = AgentState(
        pos=sel[:, 0:2],
        vel=sel[:, 2:4],
        speed=sel[:, 4],
        dest=sel[:, 5].astype(jnp.int32),
        active=sel[:, 6] > 0.5,
    )
    return SimState(agents=agents, key=gs.key, step=gs.step)


def make_initial_grid_state(cfg: StepConfig, seed: int = 0,
                            row_block: int = 2) -> GridState:
    from .sfm import make_initial_state

    return bin_state(cfg, make_initial_state(cfg, seed=seed), row_block)


def spawn_scatter(cfg: StepConfig, d: jnp.ndarray, key: jnp.ndarray,
                  row_lo: int | jnp.ndarray, n_rows: int,
                  col_lo: int | jnp.ndarray = 0, n_cols: int | None = None):
    """Scatter this step's spawn candidates into free grid slots.

    ``d`` is a padded slab [n_rows+2, K, 8, NXL] holding cell rows
    [row_lo, row_lo + n_rows) and cell columns [col_lo, col_lo + n_cols)
    (lane l = column col_lo + l - 1).  A candidate is WRITTEN iff its
    cell falls in the window *including the one-cell ghost ring*, but
    COUNTED (spawned/dropped) only by the owning device: every device
    runs the same candidate stream, per-cell candidate ranks are
    stream-order-stable and the ghost ring's count channel was just
    exchanged, so the ghost copy is bit-identical to the owner's own
    placement — spawned agents exert forces across tile boundaries the
    same tick, exactly like single-chip (reference lib.rs:64-90 spawns
    before update_states).  Ghost copies are transient: kernel outputs
    only center rows and the rebin keeps only owned cells.
    Slot = per-cell count (channel 7, slot 0) + rank among same-cell
    candidates; candidates beyond K are dropped and counted (by the
    owner only).
    Returns (d, n_spawned_here, n_dropped_here).
    """
    grid = cfg.grid
    k = cfg.table_capacity
    n2, kk, ch, nxl = d.shape
    assert kk == k and ch == 8 and n2 == n_rows + 2
    if n_cols is None:
        n_cols = grid.nx
    flat_len = n2 * k * 8 * nxl
    s = cfg.spawn.total
    cand = _spawn_candidates(cfg, key)
    gx = jnp.floor(cand.pos[:, 0] / grid.unit).astype(jnp.int32)
    cy = jnp.floor(cand.pos[:, 1] / grid.unit).astype(jnp.int32)
    ing = (gx >= 0) & (gx < grid.nx) & (cy >= 0) & (cy < grid.ny)
    owned = (cand.active & ing
             & (cy >= row_lo) & (cy < row_lo + n_rows)
             & (gx >= col_lo) & (gx < col_lo + n_cols))
    writable = (cand.active & ing
                & (cy >= row_lo - 1) & (cy < row_lo + n_rows + 1)
                & (gx >= col_lo - 1) & (gx < col_lo + n_cols + 1))
    n_spawned = jnp.sum(owned).astype(jnp.int32)
    ly = cy - row_lo  # local cell row, -1..n_rows inside the write window
    cx = gx - col_lo  # local cell column, -1..n_cols
    cell = jnp.where(writable, (ly + 1) * (grid.nx + 2) + (cx + 1),
                     (n_rows + 2) * (grid.nx + 2))
    order = jnp.argsort(cell, stable=True)
    cell_s = jnp.take(cell, order, mode="clip")
    idx = jnp.arange(s, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), cell_s[1:] != cell_s[:-1]]
    )
    rank = idx - jax.lax.cummax(jnp.where(is_start, idx, 0))
    take = lambda a: jnp.take(a, order, mode="clip")  # noqa: E731
    cx_s, ly_s, ok0_s, owned_s = take(cx), take(ly), take(writable), take(owned)
    cnt_flat = d[:, 0, 7, :].reshape(-1)
    base_cnt = jnp.take(
        cnt_flat, (ly_s + 1) * nxl + (cx_s + 1), mode="clip"
    ).astype(jnp.int32)
    slot_k = base_cnt + rank
    ok = ok0_s & (slot_k < k)
    n_drop = (n_spawned - jnp.sum(owned_s & ok)).astype(jnp.int32)

    base = ((ly_s + 1) * k + jnp.clip(slot_k, 0, k - 1)) * (8 * nxl) \
        + (cx_s + 1)
    # Rejected candidates aim at flat_len — OUT OF BOUNDS on purpose:
    # mode="drop" discards them, so no sentinel slot (and no full-grid
    # concatenate/slice copy — ~100 MB each at 1M agents) is needed.
    tgt = jnp.where(ok, base, flat_len)
    vals = [
        take(cand.pos[:, 0]), take(cand.pos[:, 1]),
        jnp.zeros((s,), jnp.float32), jnp.zeros((s,), jnp.float32),
        take(cand.speed), take(cand.dest).astype(jnp.float32),
        ok.astype(jnp.float32),
    ]
    df = d.reshape(-1)
    for chn, v in enumerate(vals):
        df = df.at[tgt + chn * nxl].set(v, mode="drop")
    # count update: slot-0 channel 7
    cnt_tgt = jnp.where(ok, ((ly_s + 1) * k) * (8 * nxl) + 7 * nxl
                        + (cx_s + 1), flat_len)
    df = df.at[cnt_tgt].add(1.0, mode="drop")
    return df.reshape(d.shape), n_spawned, n_drop


def occupancy_bound(d_pad: jnp.ndarray, rb: int, nb: int, k: int) -> jnp.ndarray:
    """Per-block occupancy bound from the count channel: max occupied
    slots of any cell in each block's (rb+2)-row window.  Shared by the
    single-chip step and the tiled step (parallel/tile2d.py)."""
    rowmax = jnp.max(d_pad[:, 0, 7, :], axis=-1)
    w = jnp.stack([rowmax[off::rb][:nb] for off in range(rb + 2)])
    return jnp.minimum(jnp.max(w, axis=0), float(k)).astype(jnp.int32)


def occupancy_bounds(d_pad: jnp.ndarray, rb: int, nb: int, k: int
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(window bound, CENTER-row bound) in one count-channel pass.

    The window bound feeds the candidate-trip fori (as occupancy_bound);
    the center bound — max over each block's rb CENTER rows only, a
    strictly tighter statistic — gates the pair pass's slot-split hi
    tile: center slots [8:K] can only be occupied where a center cell's
    topcnt exceeds 8 (the count channel tracks the TOP occupied slot, so
    holes on the incremental path are covered)."""
    rowmax = jnp.max(d_pad[:, 0, 7, :], axis=-1)
    w = jnp.stack([rowmax[off::rb][:nb] for off in range(rb + 2)])
    win = jnp.minimum(jnp.max(w, axis=0), float(k)).astype(jnp.int32)
    cen = jnp.minimum(jnp.max(w[1 : rb + 1], axis=0),
                      float(k)).astype(jnp.int32)
    return win, cen


def assert_movement_fits_rebin(cfg: StepConfig) -> None:
    """Movement must stay under one cell per step for the 3x3 rebin
    window (and the one-ghost-row/lane exchange of the sharded paths)."""
    phys = cfg.physics
    max_step = phys.max_speed_factor * (phys.speed_mean + 8 * phys.speed_std) \
        * phys.delta_time
    assert max_step < cfg.grid.unit, (max_step, cfg.grid.unit)


def make_kernel_chain(cfg: StepConfig, maps: FieldMaps, row_block: int = 2,
                      incremental: bool = False, mover_k: int = 8,
                      wp_skip: bool = True, wp_slots: int = 4,
                      slot_split: bool = True):
    """Kernels-only step (fused force kernel + rebin, no spawn/metrics):
    ``(d, fwp, fobs) -> d'``.  The measurement surface behind the
    diagnostic log's ``time_calc_state_kernel`` slot — the reference
    measured its OpenCL kernel time and discarded it
    (sfm_gpu.rs:229-236); here a chained timed run of this function
    isolates device kernel time from spawn/metric/host overhead.
    ``incremental`` measures the hole-preserving fast path (no
    compaction cond — the steady-state branch)."""
    from .sfm_pallas import stride_for

    if not supports(cfg, row_block, wp_skip=wp_skip, wp_slots=wp_slots):
        raise ValueError("grid backend scenario limits (sfm_pallas.supports)")
    stride = stride_for(cfg)
    dims = GridDims.build(cfg, row_block)
    k, rb, ny_pad = dims.k, dims.rb, dims.ny_pad
    nb = ny_pad // rb
    interpret = jax.default_backend() != "tpu"
    mk = min(mover_k, k)

    from .sfm_pallas import debug_segments

    segs = debug_segments(cfg)

    def chain(d: jnp.ndarray, fwp: jnp.ndarray, fobs: jnp.ndarray):
        jmax, jcen = occupancy_bounds(d, rb, nb, k)
        if not slot_split:
            jcen = None
        wpp = (waypoint_block_planes(d, rb, fwp.shape[0]) if wp_skip
               else None)
        if incremental:
            g, m, _movf, _mdmx = fused_step_kernel(
                d, fwp, fobs, cfg.physics, cfg.scenario.size,
                row_block=rb, interpret=interpret, jmax=jmax,
                stride=stride, field_unit=cfg.field_unit,
                segments=segs, emit_movers=mk, wp_planes=wpp,
                wp_slots=wp_slots, jcen=jcen)
            mmax = occupancy_bound(m, rb, nb, mk)
            d2, _ovf, _dmx = rebin_incremental(
                g, m, cfg.grid.unit, cfg.grid.nx, cfg.grid.ny,
                row_block=rb, interpret=interpret, jmax=jmax, mmax=mmax)
            return d2
        g = fused_step_kernel(d, fwp, fobs, cfg.physics, cfg.scenario.size,
                              row_block=rb, interpret=interpret, jmax=jmax,
                              stride=stride, field_unit=cfg.field_unit,
                              segments=segs, wp_planes=wpp,
                              wp_slots=wp_slots, jcen=jcen)
        d2, _ovf, _dmx = rebin_kernel(g, cfg.grid.unit, cfg.grid.nx,
                                      cfg.grid.ny, row_block=rb,
                                      interpret=interpret, jmax=jmax)
        return d2

    return chain


def make_step_grid(cfg: StepConfig, maps: FieldMaps, row_block: int = 2,
                   incremental: bool = True, mover_k: int = 8,
                   compact_every: int = 8, wp_skip: bool = True,
                   wp_slots: int = 4, slot_split: bool = True,
                   wp_force_all: bool = False):
    """Build the grid-resident step:
    (GridState, fwp, fobs) -> (GridState, StepMetrics).

    ``incremental`` selects the hole-preserving rebin: kernel 1 also
    emits a compacted per-cell mover table (at most ``mover_k`` movers
    per cell) and the rebin walks ONLY movers — ~90% of agents stay in
    their cell each step, so the candidate walk shrinks ~2.3x.  The
    cadence matters and was measured (scripts/ab_incremental_rebin,
    on-hardware alternating windows, round 4): never compacting LOSES
    0.916x — holes freeze the occupancy bound (jmax trace ~13.7 flat vs
    the compacting path's decay to ~9.7) and the pair pass is O(jmax) —
    while the hybrid WINS: periodic compaction keeps jmax decaying, the
    incremental steps skip most of the rebin's one-hot walk, and the
    mover-pass emit costs only ~0.33 ms.  The round-4 cadence sweep
    (--cadence 4 6 8, alternating windows) measured full 13.57 /
    hybrid4 12.53 / hybrid6 12.41 / hybrid8 12.37 ms/step at 1M —
    flattening past 6 as the amortized full-rebin share vanishes.
    Hence compact_every=8 default.
    Correctness guards, all in-graph (lax.cond, no host sync):
    the step falls back to the FULL compacting rebin when (a) any cell
    had more than mover_k movers this step (table overflow — no agent is
    ever lost to it), (b) every ``compact_every``-th step (bounds hole
    fragmentation and the occupancy-bound drift it causes), or (c) the
    scenario spawns and some cell's top slot is near K (spawns append
    ABOVE holes, so compaction reclaims the space before spawn drops).

    ``wp_skip`` enables the per-block waypoint-plane skip (multi-waypoint
    scenarios only; statically a no-op at one waypoint): each plane's
    slab DMA + sampling runs only in blocks whose window holds an agent
    bound for it — the reference's O(1)-maps-per-agent property
    (sfm.rs:107, field.rs:235-239) at block granularity."""
    if not supports(cfg, row_block, wp_skip=wp_skip, wp_slots=wp_slots):
        raise ValueError(
            "grid backend needs an integral neighbor/field unit ratio and "
            "resident plane slabs fitting VMEM (see sfm_pallas.supports)"
        )
    from .sfm_pallas import debug_segments, stride_for

    stride = stride_for(cfg)
    segs = debug_segments(cfg)
    phys = cfg.physics
    grid = cfg.grid
    dims = GridDims.build(cfg, row_block)
    k, rb, nxl, ny_pad = dims.k, dims.rb, dims.nxl, dims.ny_pad
    nb = ny_pad // rb
    interpret = jax.default_backend() != "tpu"
    s = cfg.spawn.total
    assert_movement_fits_rebin(cfg)
    mk = min(mover_k, k)

    def step(state: GridState, fwp: jnp.ndarray, fobs: jnp.ndarray
             ) -> tuple[GridState, StepMetrics]:
        key, k_spawn = jax.random.split(state.key)
        d = state.d
        if s > 0:
            d, n_spawned, n_spawn_drop = spawn_scatter(
                cfg, d, k_spawn, row_lo=0, n_rows=ny_pad)
        else:
            n_spawned = jnp.int32(0)
            n_spawn_drop = jnp.int32(0)

        jmax, jcen = occupancy_bounds(d, rb, nb, k)
        if not slot_split:
            jcen = None
        # wp_force_all: attribution diagnostic (scripts/ab_wp_curve.py
        # --decompose) — run the full slot-walk machinery but force every
        # block to want EVERY plane: same sampling work as skip-off, so
        # the delta vs skip-off isolates the pure gating overhead from
        # the sampling saved.
        wpp = (waypoint_block_planes(d, rb, fwp.shape[0],
                                     force_all=wp_force_all)
               if wp_skip else None)
        max_mover_demand = jnp.int32(0)
        if incremental:
            g, m, movf, mdmx = fused_step_kernel(
                d, fwp, fobs, phys, cfg.scenario.size,
                row_block=rb, interpret=interpret, jmax=jmax,
                stride=stride, field_unit=cfg.field_unit,
                segments=segs, emit_movers=mk, wp_planes=wpp,
                wp_slots=wp_slots, jcen=jcen)
            mmax = occupancy_bound(m, rb, nb, mk)
            need_full = (jnp.sum(movf) > 0.0) | (
                jax.lax.rem(state.step, jnp.int32(compact_every)) == 0)
            if s > 0:
                need_full = need_full | (
                    jnp.max(d[:, 0, 7, :]) >= float(k - 1))
            d_new, ovf, dmx, nact_in, nact_out = jax.lax.cond(
                need_full,
                lambda g_, m_: rebin_kernel(
                    g_, grid.unit, grid.nx, grid.ny, row_block=rb,
                    interpret=interpret, jmax=jmax, emit_counts=True),
                lambda g_, m_: rebin_incremental(
                    g_, m_, grid.unit, grid.nx, grid.ny, row_block=rb,
                    interpret=interpret, jmax=jmax, mmax=mmax,
                    emit_counts=True),
                g, m)
            max_mover_demand = jnp.max(mdmx).astype(jnp.int32)
        else:
            g = fused_step_kernel(d, fwp, fobs, phys, cfg.scenario.size,
                                  row_block=rb, interpret=interpret,
                                  jmax=jmax, stride=stride,
                                  field_unit=cfg.field_unit, segments=segs,
                                  wp_planes=wpp, wp_slots=wp_slots,
                                  jcen=jcen)
            # Both kernels emit ghost-carrying arrays, so the rebin
            # consumes g directly and its output IS next step's state —
            # no XLA-side pad/clamp copies; overflow/demand ride out as
            # per-block scalars.
            d_new, ovf, dmx, nact_in, nact_out = rebin_kernel(
                g, grid.unit, grid.nx, grid.ny, row_block=rb,
                interpret=interpret, jmax=jmax, emit_counts=True)
        # n_active/n_after ride the rebin's fused per-block active sums
        # (emit_counts) instead of re-reading the two 10 MB act-channel
        # planes on the XLA side — part of the 0.36 ms/step glue
        # measured by scripts/ab_glue.py.  Exact: per-block sums are
        # < 2^15, the total < 2^24, both within f32's integer range.
        n_active = jnp.sum(nact_in).astype(jnp.int32)
        n_overflow = jnp.sum(ovf).astype(jnp.int32)
        n_after = jnp.sum(nact_out).astype(jnp.int32)

        metrics = StepMetrics(
            n_active=n_active,
            n_spawned=n_spawned,
            # actionable loss only: spawn candidates dropped in full cells
            n_dropped=n_spawn_drop,
            n_overflow=n_overflow,
            max_demand=jnp.max(dmx).astype(jnp.int32),
            # expected departures: agents that walked off the field
            # (neighbor_grid.rs:29 semantics, dropped by the rebin)
            n_exited=(n_active - n_after) - n_overflow,
            max_mover_demand=max_mover_demand,
        )
        return GridState(d=d_new, key=key, step=state.step + 1), metrics

    return step
