"""Multi-chip sharding of the cell-resident grid backend: row strips.

The round-1 sharded path (parallel/spatial.py) moves *agents* between
devices — variable-size packages, compaction, adoption, package-capacity
loss modes.  With cell-resident state (models/sfm_grid.py) all of that
machinery collapses: shard the grid ``D`` on its cell-ROW axis and the
entire communication pattern becomes two fixed-size one-row ghost
exchanges per step over ``lax.ppermute`` (ICI neighbor traffic):

1. exchange D edge rows     -> ghost rows for the force window (the 2 m
                               interaction cutoff spans one 1.5 m cell);
2. run the fused step kernel on the local slab (global coordinates, the
   slab's global row offset is a kernel scalar);
3. exchange G edge rows     -> the rebin window sees the *integrated*
                               positions of the neighbor's edge row, so
                               cross-strip migration is just the rebin
                               picking movers out of a ghost row — agents
                               are never packed, shipped, or re-homed, and
                               there is no package capacity to overflow;
4. run the rebin kernel on the local slab.

Per-device field slabs are pre-sliced on the host (replicating the full
stride-6 planes would cost n_devices x memory).  Spawning runs the same
candidate stream on every device (replicated PRNG key); each candidate is
claimed by exactly the device owning its cell row.

Equivalence: every block computes from exactly the same window contents a
single chip would see, so multi-chip == single-chip bit-for-bit (tested in
tests/test_grid_shard.py).  The reference has no multi-device support at
all (SURVEY.md section 2); this is the scaling axis it lacks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import FieldMaps
from ..models.sfm import SimState, StepConfig, StepMetrics
from ..models.sfm_grid import GridState, bin_state, spawn_scatter, unbin_state
from ..models.sfm_pallas import stride_for, supports
from ..ops.pallas.fields6 import ROW0, Fields6
from ..ops.pallas.rebin import rebin_kernel
from ..ops.pallas.step_kernel import fused_step_kernel

AXIS = "row"


@dataclasses.dataclass(frozen=True)
class GridShardConfig:
    """Static layout of the row-strip decomposition."""

    base: StepConfig
    n_devices: int
    rows_local: int  # owned cell rows per device (multiple of row_block)
    row_block: int
    nxl: int

    @property
    def ny_total(self) -> int:
        return self.n_devices * self.rows_local

    @classmethod
    def build(cls, cfg: StepConfig, n_devices: int,
              row_block: int = 2) -> "GridShardConfig":
        if not supports(cfg):
            raise ValueError("grid sharding inherits the grid backend's "
                             "scenario limits (see sfm_pallas.supports)")
        rb = row_block
        rows_local = -(-cfg.grid.ny // (rb * n_devices)) * rb
        nxl = -(-(cfg.grid.nx + 3) // 128) * 128
        return cls(base=cfg, n_devices=n_devices, rows_local=rows_local,
                   row_block=rb, nxl=nxl)


def shard_device_inputs(scfg: GridShardConfig, maps: FieldMaps):
    """Per-device stride-S field slabs, sharded on the device axis.

    Device d's slab starts at global plane row d*rows_local*S, so the
    kernel's local block arithmetic lands on the right taps unchanged."""
    cfg = scfg.base
    rl, rb = scfg.rows_local, scfg.row_block
    s = stride_for(cfg)
    f6 = Fields6.build(maps, cfg.grid.nx, scfg.ny_total, stride=s)
    flen = s * (rb + 2) + 2
    r_need = s * (rl - rb) + ROW0 + flen
    wp = np.stack([
        f6.wp[:, d * rl * s : d * rl * s + r_need]
        for d in range(scfg.n_devices)
    ])  # [D, n_wp, r_need, S, 4, NXL]
    obs = np.stack([
        f6.obs[d * rl * s : d * rl * s + r_need]
        for d in range(scfg.n_devices)
    ])
    return wp, obs


def make_sharded_grid_state(scfg: GridShardConfig, mesh: Mesh,
                            state: SimState) -> GridState:
    """Bin a flat state and lay the grid out as row strips on the mesh."""
    cfg = scfg.base
    full = bin_state(cfg, state, row_block=scfg.row_block)
    core = full.d[1 : 1 + cfg.grid.ny]
    core = jnp.pad(core, ((0, scfg.ny_total - cfg.grid.ny),
                          (0, 0), (0, 0), (0, 0)))
    rep = NamedSharding(mesh, P())
    return GridState(
        d=jax.device_put(core, NamedSharding(mesh, P(AXIS))),
        key=jax.device_put(state.key, rep),
        step=jax.device_put(jnp.int32(0), rep),
    )


def unbin_sharded(scfg: GridShardConfig, gs: GridState) -> SimState:
    """Gather the sharded grid back to flat host-side agent arrays."""
    core = np.asarray(gs.d)  # [ny_total, K, 8, NXL]
    padded = jnp.pad(jnp.asarray(core[: scfg.base.grid.ny]),
                     ((1, 1), (0, 0), (0, 0), (0, 0)))
    return unbin_state(scfg.base, GridState(d=padded, key=gs.key, step=gs.step))


def make_sharded_step(scfg: GridShardConfig, mesh: Mesh):
    """Build the sharded step:
    (GridState, wp_slabs, obs_slabs) -> (GridState, StepMetrics)."""
    cfg = scfg.base
    phys = cfg.physics
    grid = cfg.grid
    k = cfg.table_capacity
    rb = scfg.row_block
    rl = scfg.rows_local
    nb = rl // rb
    n_dev = scfg.n_devices
    interpret = jax.default_backend() != "tpu"
    s = cfg.spawn.total

    down_perm = [(i, i + 1) for i in range(n_dev - 1)]  # to the next strip
    up_perm = [(i, i - 1) for i in range(1, n_dev)]

    def exchange_ghosts(x):
        """[rl, ...] -> [rl+2, ...] with neighbor edge rows as ghosts
        (zeros at the outer boundaries, matching the single-chip pad)."""
        if n_dev == 1:
            return jnp.pad(x, ((1, 1),) + ((0, 0),) * (x.ndim - 1))
        top = jax.lax.ppermute(x[-1:], AXIS, down_perm)
        bot = jax.lax.ppermute(x[:1], AXIS, up_perm)
        return jnp.concatenate([top, x, bot], axis=0)

    def _jmax(d_pad):
        rowmax = jnp.max(d_pad[:, 0, 7, :], axis=-1)  # [rl+2]
        w = jnp.stack([rowmax[off::rb][:nb] for off in range(rb + 2)])
        return jnp.minimum(jnp.max(w, axis=0), float(k)).astype(jnp.int32)

    def step_local(d_loc, k_spawn, wp_slab, obs_slab):
        # d_loc [rl, K, 8, NXL]; slabs carry a leading device axis of 1.
        wp_slab = wp_slab[0]
        obs_slab = obs_slab[0]
        dev = jax.lax.axis_index(AXIS)
        row_lo = (dev * rl).astype(jnp.int32)

        d_pad = exchange_ghosts(d_loc)
        if s > 0:
            d_pad, n_spawned, n_spawn_drop = spawn_scatter(
                cfg, d_pad, k_spawn, row_lo=row_lo, n_rows=rl)
        else:
            n_spawned = jnp.int32(0)
            n_spawn_drop = jnp.int32(0)

        jmax = _jmax(d_pad)
        g = fused_step_kernel(
            d_pad, wp_slab, obs_slab, phys, cfg.scenario.size,
            row_block=rb, interpret=interpret, jmax=jmax,
            row_offset=row_lo[None],
            stride=stride_for(cfg), field_unit=cfg.field_unit,
        )
        n_active = jnp.sum(g[:, :, 6, :]).astype(jnp.int32)

        gp = exchange_ghosts(g)
        d2 = rebin_kernel(
            gp, grid.unit, grid.nx, grid.ny, row_block=rb,
            interpret=interpret, jmax=jmax, row_offset=row_lo[None],
        )
        demand = d2[:, 0, 7, :]
        n_overflow = jnp.sum(jnp.maximum(demand - k, 0.0)).astype(jnp.int32)
        n_after = jnp.sum(d2[:, :, 6, :]).astype(jnp.int32)
        d2 = d2.at[:, 0, 7, :].set(jnp.minimum(demand, float(k)))

        metrics = StepMetrics(
            n_active=jax.lax.psum(n_active, AXIS),
            n_spawned=jax.lax.psum(n_spawned, AXIS),
            n_dropped=jax.lax.psum(
                n_spawn_drop + (n_active - n_after) - n_overflow, AXIS),
            n_overflow=jax.lax.psum(n_overflow, AXIS),
        )
        return d2, metrics

    sharded = jax.shard_map(
        step_local,
        mesh=mesh,
        in_specs=(P(AXIS), P(), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P()),
        check_vma=False,
    )

    def step(state: GridState, wp_slabs, obs_slabs):
        key, k_spawn = jax.random.split(state.key)
        d, metrics = sharded(state.d, k_spawn, wp_slabs, obs_slabs)
        return GridState(d=d, key=key, step=state.step + 1), metrics

    return step


def dryrun(n_devices: int) -> None:
    """Driver hook: n-device mesh, jit the full sharded grid step, run a
    few steps on tiny shapes, sanity-check.  Re-runs in a clean CPU
    subprocess when the TPU plugin owns the interpreter (same pattern as
    parallel/spatial.dryrun)."""
    import os
    import pathlib

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
        code = (
            "from pedoni_tpu.parallel.grid_shard import dryrun; "
            f"dryrun({n_devices})"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code], env=env,
            capture_output=True, text=True, timeout=1800,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"subprocess grid dryrun failed (rc={proc.returncode}):\n"
                f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
            )
        return
    mesh = Mesh(np.array(devices), (AXIS,))

    from ..field import Field
    from ..models.sfm import make_initial_state
    from ..scenario import loads_scenario

    scenario = loads_scenario(
        """
[field]
size = [16, 32]
[[waypoints]]
line = [[2, 2], [2, 30]]
[[waypoints]]
line = [[14, 2], [14, 30]]
[[obstacles]]
line = [[8, 0], [8, 12]]
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
    scfg = GridShardConfig.build(cfg, n_devices)
    wp, obs = shard_device_inputs(scfg, maps)
    sh = NamedSharding(mesh, P(AXIS))
    wp = jax.device_put(jnp.asarray(wp), sh)
    obs = jax.device_put(jnp.asarray(obs), sh)
    state = make_sharded_grid_state(scfg, mesh, make_initial_state(cfg, seed=0))
    step = jax.jit(make_sharded_step(scfg, mesh))
    for _ in range(3):
        state, metrics = step(state, wp, obs)
        # Lockstep: virtual CPU meshes on few-core hosts can starve the
        # collective rendezvous under deep dispatch queues.
        jax.block_until_ready(state)
    n = int(metrics.n_active)
    assert 0 < n <= cfg.capacity, f"implausible active count {n}"
    flat = unbin_sharded(scfg, state)
    pos = np.asarray(flat.agents.pos)[np.asarray(flat.agents.active)]
    assert np.isfinite(pos).all(), "non-finite positions after sharded step"
