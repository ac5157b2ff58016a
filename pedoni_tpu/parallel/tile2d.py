"""2D tile sharding of the cell-resident grid backend: rows x columns.

Row strips (parallel/grid_shard.py) scale until strips get too thin —
at R devices each strip must keep >= row_block cell rows plus halo
traffic proportional to the full field width.  For >8-chip meshes the
natural layout is a 2D (rows x cols) device grid: device (r, c) owns an
``rl x cl``-cell tile, ghost traffic per device drops from O(nx) to
O(nx/C + ny/R), and the ICI mesh topology is used along both axes.
The reference has no multi-device support at all (SURVEY.md section 2).

Layout per device: ``d [rl+2, K, 8, NXL_loc]`` GHOST-CARRYING — rows 0
and rl+1 are ghost rows and lane ``l`` holds global cell column
``c*cl + l - 1`` with lanes 0 and cl+1 as ghost lanes; ghosts are
refreshed IN PLACE from the neighbors each step (dynamic-update-slice,
no concatenation copies — the kernels emit ghost-carrying outputs too).
Lanes >= cl+2 are zero padding to the 128-lane tile.  Positions stay in
GLOBAL coordinates; the kernels take (row_offset, col_offset) scalars.

Per step, two halo exchanges of the same shape (columns first, then
rows, so the row slabs carry the just-refreshed corner lanes — the 3x3
windows of corner cells need the diagonal device's edge cell):

1. ghost columns over ``lax.ppermute`` on the "col" axis (one owned
   edge lane each way), then ghost rows on the "row" axis (one owned
   edge row each way, ghost lanes included) -> the force window;
2. the same double exchange on the integrated output so the rebin picks
   migrants out of ghost rows AND ghost lanes — cross-tile migration in
   any of the 8 directions is just the rebin keeping what lands in the
   owned tile.

Every kernel block therefore sees exactly the window a single chip
would, so R x C == single-chip bit-for-bit up to f32 reduction order
(tests/test_tile2d.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import FieldMaps
from ..models.sfm import SimState, StepConfig, StepMetrics
from ..models.sfm_grid import (  # noqa: F401 (occupancy_bound re-export)
    GridState,
    assert_movement_fits_rebin,
    bin_state,
    occupancy_bound,
    occupancy_bounds,
    spawn_scatter,
    unbin_state,
)
from ..models.sfm_pallas import debug_segments, stride_for, supports
from ..ops.pallas.fields6 import ROW0, Fields6
from ..ops.pallas.rebin import rebin_incremental, rebin_kernel
from ..ops.pallas.step_kernel import fused_step_kernel, waypoint_block_planes

ROW_AXIS = "row"
COL_AXIS = "col"


@dataclasses.dataclass(frozen=True)
class Tile2DConfig:
    """Static layout of the rows x cols tile decomposition."""

    base: StepConfig
    rows: int  # R devices along cell rows
    cols: int  # C devices along cell columns
    rows_local: int  # owned cell rows per device (multiple of row_block)
    cols_local: int  # owned cell columns per device
    row_block: int
    nxl_local: int  # lane width per device (cols_local + 3, 128-padded)

    @property
    def n_devices(self) -> int:
        return self.rows * self.cols

    @property
    def ny_total(self) -> int:
        return self.rows * self.rows_local

    @classmethod
    def build(cls, cfg: StepConfig, rows: int, cols: int,
              row_block: int = 2) -> "Tile2DConfig":
        if rows < 1 or cols < 1:
            raise ValueError(
                f"tile must have rows >= 1 and cols >= 1, got {rows}x{cols}")
        if not supports(cfg, row_block):
            raise ValueError("2D tile sharding inherits the grid backend's "
                             "scenario limits (see sfm_pallas.supports)")
        assert_movement_fits_rebin(cfg)
        rb = row_block
        rl = -(-cfg.grid.ny // (rb * rows)) * rb
        cl = -(-cfg.grid.nx // cols)
        nxl = -(-(cl + 3) // 128) * 128
        return cls(base=cfg, rows=rows, cols=cols, rows_local=rl,
                   cols_local=cl, row_block=rb, nxl_local=nxl)


def shard_device_inputs(tcfg: Tile2DConfig, maps: FieldMaps):
    """Per-device stride-S field slabs [R, C, ...], sliced in rows AND
    lanes so local block/lane arithmetic needs only the offset scalars."""
    cfg = tcfg.base
    rl, cl, rb = tcfg.rows_local, tcfg.cols_local, tcfg.row_block
    s = stride_for(cfg)
    f6 = Fields6.build(maps, cfg.grid.nx, tcfg.ny_total, stride=s)
    flen = s * (rb + 2) + 2
    r_need = s * (rl - rb) + ROW0 + flen
    lane_need = (tcfg.cols - 1) * cl + tcfg.nxl_local
    wp = f6.wp
    obs = f6.obs
    if wp.shape[-1] < lane_need:  # pad lanes for the last column of tiles
        pad = lane_need - wp.shape[-1]
        wp = np.pad(wp, [(0, 0)] * (wp.ndim - 1) + [(0, pad)])
        obs = np.pad(obs, [(0, 0)] * (obs.ndim - 1) + [(0, pad)])
    wp_t = np.stack([
        np.stack([
            wp[:, r * rl * s : r * rl * s + r_need, ...,
               c * cl : c * cl + tcfg.nxl_local]
            for c in range(tcfg.cols)
        ])
        for r in range(tcfg.rows)
    ])  # [R, C, n_wp, r_need, S, 4, NXL_loc]
    obs_t = np.stack([
        np.stack([
            obs[r * rl * s : r * rl * s + r_need, ...,
                c * cl : c * cl + tcfg.nxl_local]
            for c in range(tcfg.cols)
        ])
        for r in range(tcfg.rows)
    ])
    return wp_t, obs_t


def make_mesh(tcfg: Tile2DConfig, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    dev = np.array(devices[: tcfg.n_devices]).reshape(tcfg.rows, tcfg.cols)
    return Mesh(dev, (ROW_AXIS, COL_AXIS))


def make_sharded_grid_state(tcfg: Tile2DConfig, mesh: Mesh,
                            state: SimState) -> GridState:
    """Bin a flat state and lay the grid out as 2D tiles on the mesh.

    The global array is a BLOCK layout [R*(rl+2), K, 8, C*NXL_loc]: each
    device's slab is GHOST-CARRYING (rows 0 and rl+1, lanes 0 and cl+1)
    with its own 128-padded lane tile; ghosts start zero — the step
    refreshes them in place (dynamic-update-slice, no per-step
    concatenation) before use."""
    cfg = tcfg.base
    rl, cl, nxl = tcfg.rows_local, tcfg.cols_local, tcfg.nxl_local
    full = bin_state(cfg, state, row_block=tcfg.row_block)
    core = np.asarray(full.d[1 : 1 + cfg.grid.ny])  # [ny, K, 8, NXL_full]
    core = np.pad(core, ((0, tcfg.ny_total - cfg.grid.ny),
                         (0, 0), (0, 0), (0, 0)))
    blocks = np.zeros((tcfg.rows * (rl + 2), core.shape[1], 8,
                       tcfg.cols * nxl), np.float32)
    for r in range(tcfg.rows):
        for c in range(tcfg.cols):
            n_own = min(cl, cfg.grid.nx - c * cl)
            # owned rows/lanes only — ghosts/padding stay zero
            blocks[r * (rl + 2) + 1 : r * (rl + 2) + 1 + rl, ...,
                   c * nxl + 1 : c * nxl + 1 + n_own] = \
                core[r * rl : r * rl + rl, ...,
                     c * cl + 1 : c * cl + 1 + n_own]
    rep = NamedSharding(mesh, P())
    return GridState(
        d=jax.device_put(jnp.asarray(blocks),
                         NamedSharding(mesh, P(ROW_AXIS, None, None, COL_AXIS))),
        key=jax.device_put(state.key, rep),
        step=jax.device_put(jnp.int32(0), rep),
    )


def unbin_sharded(tcfg: Tile2DConfig, gs: GridState) -> SimState:
    """Gather the tiled grid back to flat host-side agent arrays."""
    cfg = tcfg.base
    rl, cl, nxl = tcfg.rows_local, tcfg.cols_local, tcfg.nxl_local
    blocks = np.asarray(gs.d)  # [R*(rl+2), K, 8, C*NXL_loc]
    nxl_full = -(-(cfg.grid.nx + 3) // 128) * 128
    core = np.zeros((tcfg.ny_total, blocks.shape[1], 8, nxl_full),
                    np.float32)
    for r in range(tcfg.rows):
        for c in range(tcfg.cols):
            n_own = min(cl, cfg.grid.nx - c * cl)
            core[r * rl : r * rl + rl, ...,
                 c * cl + 1 : c * cl + 1 + n_own] = \
                blocks[r * (rl + 2) + 1 : r * (rl + 2) + 1 + rl, ...,
                       c * nxl + 1 : c * nxl + 1 + n_own]
    padded = jnp.pad(jnp.asarray(core[: cfg.grid.ny]),
                     ((1, 1), (0, 0), (0, 0), (0, 0)))
    return unbin_state(cfg, GridState(d=padded, key=gs.key, step=gs.step))


def make_sharded_step(tcfg: Tile2DConfig, mesh: Mesh,
                      incremental: bool = True, mover_k: int = 8,
                      compact_every: int = 8, wp_skip: bool = True,
                      wp_slots: int = 4, slot_split: bool = True):
    """Build the tiled step:
    (GridState, wp_slabs, obs_slabs) -> (GridState, StepMetrics).

    ``incremental``/``mover_k``/``compact_every``/``wp_skip`` mirror
    make_step_grid (same measured defaults): the hybrid hole-preserving
    rebin and the per-block waypoint-plane skip run per TILE.  The mover
    table M gets the same cols-then-rows double ghost exchange as G
    (boundary-crossing movers ride M's ghost rows/lanes exactly like the
    full rebin picks them out of G's); the incremental rebin's stay side
    is owned-lane gated (ops/pallas/rebin._compute_inc) so an exchanged
    neighbor's stayers are never kept twice.  The full-rebin fallback
    cond is PER-DEVICE (local mover-table overflow or spawn pressure
    triggers it locally; the compaction cadence is step-synchronized) —
    rebin form is local bookkeeping, so tiles may legally diverge."""
    cfg = tcfg.base
    phys = cfg.physics
    grid = cfg.grid
    k = cfg.table_capacity
    rb = tcfg.row_block
    rl, cl = tcfg.rows_local, tcfg.cols_local
    nb = rl // rb
    R, C = tcfg.rows, tcfg.cols
    interpret = jax.default_backend() != "tpu"
    s = cfg.spawn.total
    mk = min(mover_k, k)

    down_perm = [(i, i + 1) for i in range(R - 1)]
    up_perm = [(i, i - 1) for i in range(1, R)]
    right_perm = [(i, i + 1) for i in range(C - 1)]
    left_perm = [(i, i - 1) for i in range(1, C)]

    def exchange_cols(x):
        """Refresh ghost lanes 0 and cl+1 from the lane neighbors' owned
        edge lanes (zeros at the field edges, matching single-chip)."""
        if C == 1:
            return x
        from_left = jax.lax.ppermute(x[..., cl : cl + 1], COL_AXIS, right_perm)
        from_right = jax.lax.ppermute(x[..., 1:2], COL_AXIS, left_perm)
        x = jax.lax.dynamic_update_slice_in_dim(x, from_left, 0, axis=3)
        x = jax.lax.dynamic_update_slice_in_dim(x, from_right, cl + 1, axis=3)
        return x

    def exchange_rows(x):
        """Refresh ghost rows 0 and rl+1 of the ghost-carrying slab
        [rl+2, ...] from the row neighbors' edge OWNED rows, in place
        (dynamic-update-slice — no per-step concatenation copy).  Edge
        devices receive ppermute's zero fill, matching the field edge;
        for R == 1 the kernels already wrote zero ghosts."""
        if R == 1:
            return x
        top = jax.lax.ppermute(x[rl : rl + 1], ROW_AXIS, down_perm)
        bot = jax.lax.ppermute(x[1:2], ROW_AXIS, up_perm)
        x = jax.lax.dynamic_update_slice_in_dim(x, top, 0, axis=0)
        x = jax.lax.dynamic_update_slice_in_dim(x, bot, rl + 1, axis=0)
        return x

    def exchange(x):
        return exchange_rows(exchange_cols(x))

    def _jmax(d_pad):
        jmax, jcen = occupancy_bounds(d_pad, rb, nb, k)
        return jmax, (jcen if slot_split else None)

    def step_local(d_loc, k_spawn, step_idx, wp_slab, obs_slab):
        # d_loc [rl+2, K, 8, NXL_loc] ghost-carrying; slabs carry leading
        # axes of (1, 1).
        wp_slab = wp_slab[0, 0]
        obs_slab = obs_slab[0, 0]
        r_idx = jax.lax.axis_index(ROW_AXIS)
        c_idx = jax.lax.axis_index(COL_AXIS)
        row_lo = (r_idx * rl).astype(jnp.int32)
        col_lo = (c_idx * cl).astype(jnp.int32)

        d_pad = exchange(d_loc)
        if s > 0:
            d_pad, n_spawned, n_spawn_drop = spawn_scatter(
                cfg, d_pad, k_spawn, row_lo=row_lo, n_rows=rl,
                col_lo=col_lo, n_cols=cl)
        else:
            n_spawned = jnp.int32(0)
            n_spawn_drop = jnp.int32(0)

        jmax, jcen = _jmax(d_pad)
        # The wanted-plane lists read the EXCHANGED slab (ghost rows
        # and lanes hold neighbor agents whose planes this tile's kernel
        # windows sample too).
        wpp = (waypoint_block_planes(d_pad, rb, wp_slab.shape[0])
               if wp_skip else None)
        max_mover_demand = jnp.int32(0)
        if incremental:
            g, m, movf, mdmx = fused_step_kernel(
                d_pad, wp_slab, obs_slab, phys, cfg.scenario.size,
                row_block=rb, interpret=interpret, jmax=jmax,
                row_offset=row_lo[None], col_offset=col_lo[None],
                stride=stride_for(cfg), field_unit=cfg.field_unit,
                segments=debug_segments(cfg), emit_movers=mk,
                wp_planes=wpp, wp_slots=wp_slots, jcen=jcen,
            )
        else:
            g = fused_step_kernel(
                d_pad, wp_slab, obs_slab, phys, cfg.scenario.size,
                row_block=rb, interpret=interpret, jmax=jmax,
                row_offset=row_lo[None], col_offset=col_lo[None],
                stride=stride_for(cfg), field_unit=cfg.field_unit,
                segments=debug_segments(cfg), wp_planes=wpp,
                wp_slots=wp_slots, jcen=jcen,
            )
        # Ghost-lane outputs are computed from incomplete windows and
        # discarded: active counts read owned lanes only, and the column
        # exchange below replaces them with the neighbor's owned values.
        n_active = jnp.sum(g[:, :, 6, 1 : cl + 1]).astype(jnp.int32)

        gp = exchange(g)
        if incremental:
            # Movers ride M's ghosts exactly like G's: same double
            # exchange, same cols-then-rows corner carry.  Ghost-lane
            # entries of M (pre-exchange garbage from incomplete
            # windows) are REPLACED by the neighbor's owned edge here;
            # movf/mdmx may count that garbage, which can only trigger
            # a conservative full-rebin fallback / mover growth, never
            # a wrong result.
            mp = exchange(m)
            mmax = occupancy_bound(mp, rb, nb, mk)
            need_full = (jnp.sum(movf) > 0.0) | (
                jax.lax.rem(step_idx, jnp.int32(compact_every)) == 0)
            if s > 0:
                need_full = need_full | (
                    jnp.max(d_pad[:, 0, 7, :]) >= float(k - 1))
            d2, ovf, dmx = jax.lax.cond(
                need_full,
                lambda g_, m_: rebin_kernel(
                    g_, grid.unit, grid.nx, grid.ny, row_block=rb,
                    interpret=interpret, jmax=jmax,
                    row_offset=row_lo[None], col_offset=col_lo[None],
                    nx_local=cl),
                lambda g_, m_: rebin_incremental(
                    g_, m_, grid.unit, grid.nx, grid.ny, row_block=rb,
                    interpret=interpret, jmax=jmax, mmax=mmax,
                    row_offset=row_lo[None], col_offset=col_lo[None],
                    nx_local=cl),
                gp, mp)
            max_mover_demand = jnp.max(mdmx).astype(jnp.int32)
        else:
            d2, ovf, dmx = rebin_kernel(
                gp, grid.unit, grid.nx, grid.ny, row_block=rb,
                interpret=interpret, jmax=jmax, row_offset=row_lo[None],
                col_offset=col_lo[None], nx_local=cl,
            )
        n_overflow = jnp.sum(ovf).astype(jnp.int32)
        n_after = jnp.sum(d2[:, :, 6, :]).astype(jnp.int32)

        def allsum(v):
            return jax.lax.psum(jax.lax.psum(v, ROW_AXIS), COL_AXIS)

        def allmax(v):
            return jax.lax.pmax(jax.lax.pmax(v, ROW_AXIS), COL_AXIS)

        metrics = StepMetrics(
            n_active=allsum(n_active),
            n_spawned=allsum(n_spawned),
            n_dropped=allsum(n_spawn_drop),
            n_overflow=allsum(n_overflow),
            max_demand=allmax(jnp.max(dmx)).astype(jnp.int32),
            n_exited=allsum((n_active - n_after) - n_overflow),
            max_mover_demand=allmax(max_mover_demand),
        )
        return d2, metrics

    sharded = jax.shard_map(
        step_local,
        mesh=mesh,
        in_specs=(P(ROW_AXIS, None, None, COL_AXIS), P(), P(),
                  P(ROW_AXIS, COL_AXIS), P(ROW_AXIS, COL_AXIS)),
        out_specs=(P(ROW_AXIS, None, None, COL_AXIS), P()),
        check_vma=False,
    )

    def step(state: GridState, wp_slabs, obs_slabs):
        key, k_spawn = jax.random.split(state.key)
        d, metrics = sharded(state.d, k_spawn, state.step, wp_slabs,
                             obs_slabs)
        return GridState(d=d, key=key, step=state.step + 1), metrics

    return step


def device_inputs_on_mesh(tcfg: Tile2DConfig, mesh: Mesh, maps: FieldMaps):
    wp, obs = shard_device_inputs(tcfg, maps)
    sh = NamedSharding(mesh, P(ROW_AXIS, COL_AXIS))
    return (jax.device_put(jnp.asarray(wp), sh),
            jax.device_put(jnp.asarray(obs), sh))


def dryrun(rows: int, cols: int) -> None:
    """Driver hook: rows x cols mesh, jit the full 2D-tiled grid step, run
    a few steps on tiny shapes, sanity-check.  Re-runs in a clean CPU
    subprocess when the TPU plugin owns the interpreter."""
    import os
    import pathlib

    n_devices = rows * cols
    devices = jax.devices()[:n_devices]
    if len(devices) < n_devices or os.environ.get("PALLAS_AXON_POOL_IPS"):
        import subprocess
        import sys

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(n_devices, 2)}"
        ).strip()
        env.pop("PALLAS_AXON_POOL_IPS", None)
        pkg_root = str(pathlib.Path(__file__).resolve().parents[2])
        env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
        # Persistent compile cache (same one the test conftest uses):
        # interpret-mode kernel compiles dominate the dryrun wall clock,
        # and repeated driver invocations should be near-instant.
        env.setdefault("JAX_COMPILATION_CACHE_DIR",
                       str(pathlib.Path(pkg_root) / ".jax_cache"))
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
        code = (
            "from pedoni_tpu.parallel.tile2d import dryrun; "
            f"dryrun({rows}, {cols})"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code], env=env,
            capture_output=True, text=True, timeout=1800,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"subprocess 2D-tile dryrun failed (rc={proc.returncode}):\n"
                f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
            )
        return

    from ..field import Field
    from ..models.sfm import make_initial_state
    from ..scenario import loads_scenario

    scenario = loads_scenario(
        """
[field]
size = [24, 24]
[[waypoints]]
line = [[2, 2], [2, 22]]
[[waypoints]]
line = [[22, 2], [22, 22]]
[[obstacles]]
line = [[12, 0], [12, 8]]
width = 1
[[pedestrians]]
origin = 0
destination = 1
spawn = { kind = "periodic", frequency = 8.0 }
[[pedestrians]]
origin = 1
destination = 0
spawn = { kind = "once", count = 40 }
"""
    )
    field = Field.from_scenario(scenario, unit=0.25)
    maps = FieldMaps.from_field(field)
    cfg = StepConfig.build(scenario, capacity=1024, neighbor_grid_unit=1.5,
                           table_capacity=8)
    tcfg = Tile2DConfig.build(cfg, rows, cols)
    mesh = make_mesh(tcfg)
    wp, obs = device_inputs_on_mesh(tcfg, mesh, maps)
    state = make_sharded_grid_state(tcfg, mesh, make_initial_state(cfg, seed=0))
    step = jax.jit(make_sharded_step(tcfg, mesh))
    for _ in range(3):
        state, metrics = step(state, wp, obs)
        # Lockstep: virtual CPU meshes on few-core hosts can starve the
        # collective rendezvous under deep dispatch queues.
        jax.block_until_ready(state)
    n = int(metrics.n_active)
    assert 0 < n <= cfg.capacity, f"implausible active count {n}"
    flat = unbin_sharded(tcfg, state)
    pos = np.asarray(flat.agents.pos)[np.asarray(flat.agents.active)]
    assert np.isfinite(pos).all(), "non-finite positions after 2D-tiled step"
