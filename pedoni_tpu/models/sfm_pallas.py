"""Pallas-backend step: the fused kernel wired into the full pipeline.

Same step contract as models/sfm.make_step but with sampling, despawn,
all forces and integration fused into one Pallas kernel
(ops/pallas/step_kernel.py).  Requires an integral neighbor/field unit
ratio (the stride-S plane layout; production pairing 1.5 m / 0.25 m) and
that all waypoint planes fit the VMEM budget — the kernel samples every
plane and selects by destination, so evacuation.toml's 33 waypoints run
on this path at its small field size.

Remaining XLA phases: spawn candidates, the cell sort, the slot scatter and
the result gather — the index-bound ops the round-2 cell-resident design
eliminates (PLAN.md).

Deviation from the XLA path: agents in cells holding more than
``table_capacity`` agents have no slot; they freeze for that step (position
and velocity unchanged, still active) instead of receiving field forces
only.  The per-step n_overflow metric reports them.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..field import FieldMaps
from ..ops import forcepass
from ..ops.neighbor import compute_cell_ids
from ..ops.pallas.fields6 import Fields6
from ..ops.pallas.step_kernel import fused_step_kernel, waypoint_block_planes
from .sfm import AgentState, SimState, StepConfig, StepMetrics, _spawn_candidates

PALLAS_UNIT = 1.5  # production neighbor unit (stride 6 at 0.25 m fields)
VMEM_BUDGET = 60 * 1024 * 1024  # matches the kernel's vmem_limit headroom


def stride_for(cfg: StepConfig) -> int | None:
    """Field cells per neighbor cell, when integral (the layout
    precondition); None otherwise."""
    ratio = cfg.grid.unit / cfg.field_unit
    s = round(ratio)
    if abs(ratio - s) > 1e-6 or not (2 <= s <= 16):
        return None
    return s


def debug_segments(cfg: StepConfig) -> tuple | None:
    """Static obstacle geometry for the --no-distance-map kernel mode
    (reference args.rs:27-31, sfm.rs:194-237): None on the default path,
    else ((x0, y0, x1, y1, width), ...) baked into the kernel as
    compile-time constants (obstacles never move during a run)."""
    if cfg.use_distance_map:
        return None
    return tuple(
        (float(s.line[0][0]), float(s.line[0][1]),
         float(s.line[1][0]), float(s.line[1][1]), float(s.width))
        for s in cfg.scenario.obstacles
    )


def vmem_need_bytes(cfg: StepConfig, row_block: int = 2,
                    resident_planes: int | None = None) -> int:
    """Kernel VMEM footprint: field windows (DOUBLE-buffered since the
    input-DMA pipelining — the factor 2 on the field term matches the
    (2, ...) scratch shapes in step_kernel.py) + the agent window
    (2 slots) / output / scratch.  ``resident_planes`` = slab slots per
    buffer: all n_wp planes for the ungated kernel, min(n_wp, wp_slots)
    under the waypoint slot walk (the rank ring bounds residency —
    O(1) in waypoint count like the reference's host-RAM maps,
    field.rs:235-239)."""
    s = stride_for(cfg) or 6
    rb = row_block
    k = cfg.table_capacity
    nxl = -(-(cfg.grid.nx + 3) // 128) * 128
    flen = s * (rb + 2) + 2
    n_wp = max(1, len(cfg.scenario.waypoints))
    if resident_planes is not None:
        n_wp = min(n_wp, max(1, resident_planes))
    per_plane = flen * s * 4 * nxl * 4
    agents = (2 * (rb + 2) + rb) * k * 8 * nxl * 4
    return 2 * (n_wp + 1) * per_plane + agents


def supports(cfg: StepConfig, row_block: int = 2, wp_skip: bool = True,
             wp_slots: int = 4) -> bool:
    """Any scenario with an integral neighbor/field unit ratio whose
    waypoint planes fit VMEM runs on the fused kernels — including
    evacuation.toml's 33 waypoints (backend-agnostic acceptance,
    pedoni-simulator/src/lib.rs:32-35).  With the waypoint slot walk on
    (the default), only min(n_wp, wp_slots) + 1 plane slabs are ever
    resident, so waypoint COUNT no longer bounds acceptance — only the
    lane width and table capacity do."""
    n_wp = len(cfg.scenario.waypoints)
    resident = min(n_wp, wp_slots) if (wp_skip and n_wp > 1) else None
    return (
        stride_for(cfg) is not None
        and n_wp >= 1
        and vmem_need_bytes(cfg, row_block, resident) <= VMEM_BUDGET
    )


def pallas_device_inputs(cfg: StepConfig, maps: FieldMaps, row_block: int = 2):
    ny_pad = -(-cfg.grid.ny // row_block) * row_block
    f6 = Fields6.build(maps, cfg.grid.nx, ny_pad, stride=stride_for(cfg) or 6)
    return jnp.asarray(f6.wp), jnp.asarray(f6.obs)


def make_step_pallas(cfg: StepConfig, maps: FieldMaps, row_block: int = 2):
    """Build the pallas-backend step:
    (SimState, fwp, fobs) -> (SimState, StepMetrics)."""
    if not supports(cfg, row_block):
        raise ValueError(
            "pallas backend needs an integral neighbor/field unit ratio and "
            "resident plane slabs fitting VMEM (need "
            f"{vmem_need_bytes(cfg, row_block, 4)} bytes of {VMEM_BUDGET})"
        )
    stride = stride_for(cfg)
    phys = cfg.physics
    grid = cfg.grid
    k = cfg.table_capacity
    c = cfg.capacity
    rb = row_block
    interpret = jax.default_backend() != "tpu"
    ny_pad = -(-grid.ny // rb) * rb
    nxl = -(-(grid.nx + 3) // 128) * 128
    n_slots_grid = (grid.ny + 2) * (grid.nx + 2) * k

    def step(state: SimState, fwp: jnp.ndarray, fobs: jnp.ndarray
             ) -> tuple[SimState, StepMetrics]:
        key, k_spawn = jax.random.split(state.key)
        a = state.agents

        # 1. spawn candidates (replicated machinery from the XLA path).
        cand = _spawn_candidates(cfg, k_spawn)
        n_spawned = jnp.sum(cand.active).astype(jnp.int32)
        pos = jnp.concatenate([a.pos, cand.pos])
        vel = jnp.concatenate([a.vel, cand.vel])
        speed = jnp.concatenate([a.speed, cand.speed])
        dest = jnp.concatenate([a.dest, cand.dest])
        active = jnp.concatenate([a.active, cand.active])

        # 2. cell sort (despawn happens in-kernel this backend).
        cid = compute_cell_ids(pos, active, grid)
        order = jnp.argsort(cid, stable=True)
        packed = jnp.concatenate(
            [
                pos, vel, speed[:, None], dest.astype(jnp.float32)[:, None],
                active.astype(jnp.float32)[:, None],
                jnp.zeros((pos.shape[0], 1), jnp.float32),
            ],
            axis=1,
        )
        sp = jnp.take(packed, order, axis=0, mode="clip")[:c]
        cid_sorted = jnp.take(cid, order, mode="clip")[:c]
        # Out-of-grid agents carry the sentinel cell id: deactivate them
        # here (the kernel's in-grid despawn can't reach slotless agents) —
        # neighbor_grid.rs:29 drop semantics.
        act_s = cid_sorted < grid.n_cells
        n_alive_total = jnp.sum(cid < grid.n_cells).astype(jnp.int32)
        n_kept = jnp.sum(act_s).astype(jnp.int32)
        n_dropped = n_alive_total - n_kept

        # 3. scatter into the slot grid, transpose x-minor.
        layout = forcepass.build_layout(cid_sorted, act_s, grid, k)
        flat = jnp.zeros((n_slots_grid + 1, 8), jnp.float32)
        flat = flat.at[layout.slot].set(sp, mode="drop")
        d_grid = flat[:-1].reshape(grid.ny + 2, grid.nx + 2, k, 8)
        dk = jnp.transpose(d_grid, (0, 2, 3, 1))
        dk = jnp.pad(dk, ((0, ny_pad - grid.ny), (0, 0), (0, 0),
                          (0, nxl - (grid.nx + 2))))

        # 4. the fused kernel (interpret mode off-TPU so the backend
        # stays usable on CPU test hosts).  Per-block occupancy bound: max
        # active slots of any cell in each block's 3-row window (dense
        # reduce; lets the kernel's slot loop skip empty ranks).
        occ = jnp.sum(dk[:, :, 6, :] > 0.5, axis=1)  # [ny_pad+2, NXL]
        row_max = jnp.max(occ, axis=1)  # [ny_pad+2]
        nb = ny_pad // rb
        win = jnp.stack([
            jnp.max(jax.lax.dynamic_slice_in_dim(
                row_max, i * rb, rb + 2, axis=0))
            for i in range(nb)
        ]).astype(jnp.int32)
        out = fused_step_kernel(dk, fwp, fobs, phys, cfg.scenario.size,
                                row_block=rb, interpret=interpret, jmax=win,
                                stride=stride, field_unit=cfg.field_unit,
                                segments=debug_segments(cfg),
                                wp_planes=waypoint_block_planes(
                                    dk, rb, fwp.shape[0]))
        out = out[1:-1]  # drop the ghost-carrying rows (this flat path
        #                  pays XLA glue per step anyway; the grid backend
        #                  is the one that consumes ghosts in place)

        # 5. gather results back by slot.
        out_flat = jnp.transpose(out, (0, 1, 3, 2)).reshape(-1, 8)
        cidc = jnp.minimum(cid_sorted, grid.n_cells - 1)
        cy = cidc // grid.nx
        cx = cidc % grid.nx
        rank = layout.slot - ((cy + 1) * (grid.nx + 2) + (cx + 1)) * k
        oslot = (cy * k + jnp.clip(rank, 0, k - 1)) * nxl + (cx + 1)
        oslot = jnp.minimum(oslot, out_flat.shape[0] - 1)
        res = jnp.take(out_flat, oslot, axis=0, mode="clip")

        valid = layout.valid
        agents = AgentState(
            pos=jnp.where(valid[:, None], res[:, 0:2], sp[:, 0:2]),
            vel=jnp.where(valid[:, None], res[:, 2:4], sp[:, 2:4]),
            speed=sp[:, 4],
            dest=sp[:, 5].astype(jnp.int32),
            active=jnp.where(valid, res[:, 6] > 0.5, act_s),
        )

        new_state = SimState(agents=agents, key=key, step=state.step + 1)
        metrics = StepMetrics(
            n_active=jnp.sum(agents.active).astype(jnp.int32),
            n_spawned=n_spawned,
            n_dropped=n_dropped,
            n_overflow=layout.n_overflow,
        )
        return new_state, metrics

    return step
