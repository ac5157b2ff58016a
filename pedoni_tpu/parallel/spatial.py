"""Multi-chip spatial sharding: strip decomposition + ICI halo exchange.

The reference is strictly single-device (SURVEY.md section 2); this module is
the TPU-native scaling axis it lacks.  The field is split into D vertical
strips along x over a 1D ``jax.sharding.Mesh``; each chip owns the agents
inside its strip as a fixed-capacity SoA shard.  Each step, inside one
``shard_map``-ed function:

1. **spawn**    — every chip samples the *same* candidate set from the same
                  PRNG key (replicated, no communication) and claims the
                  candidates that land in its strip.
2. **despawn**  — local potential / out-of-grid checks.
3. **exchange** — agents within the interaction cutoff (2 m = the halo
                  width, sfm.rs:133) of a strip boundary — plus any agents
                  that crossed it — are packed into fixed-size package
                  buffers and sent to the neighbor chip with
                  ``lax.ppermute`` (ICI neighbor traffic, the moral
                  equivalent of a NCCL halo exchange).  Received agents
                  inside my strip are adopted (migration); the rest are
                  ghosts that only exert forces.
4. **forces**   — one cell-sort over owned + ghost agents on a local cell
                  window (strip + halo margin), dense 3x3 table, the same
                  force kernel as the single-chip path.
5. **compact**  — surviving owned agents cumsum-compact back into the
                  [capacity/D] shard (cell-sorted order preserved).

Determinism: owned agents near a boundary see exactly the same neighbor
set (local + ghosts) as a single chip would, so multi-chip equals
single-chip up to float reduction order.
"""

from __future__ import annotations

import dataclasses
import math
import os
import pathlib
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import FieldMaps
from ..models.sfm import (
    AgentState,
    SimState,
    StepConfig,
    StepMetrics,
    _spawn_candidates,
    make_initial_state,
)
from ..ops import forcepass, forces as F
from ..ops.neighbor import CellGrid
from ..ops.sampling import DeviceField, sample_obstacle, sample_waypoint

AXIS = "x"


@dataclasses.dataclass(frozen=True)
class ShardedConfig:
    """Static layout of the strip decomposition."""

    base: StepConfig
    n_devices: int
    local_capacity: int  # capacity per device
    package_capacity: int  # max agents sent per direction per step
    halo: float  # halo width in meters (>= interaction cutoff)
    strip_width: float
    local_grid: CellGrid  # cell window covering strip + halo margin
    margin_cells: int

    @classmethod
    def build(cls, cfg: StepConfig, n_devices: int,
              package_capacity: int = 0) -> "ShardedConfig":
        if cfg.capacity % n_devices != 0:
            raise ValueError("capacity must divide by the device count")
        local_capacity = cfg.capacity // n_devices
        halo = cfg.physics.interaction_cutoff
        w, h = cfg.scenario.size
        strip_width = w / n_devices
        unit = cfg.grid.unit
        margin_cells = int(math.ceil(halo / unit)) + 1
        nx_local = int(math.ceil(strip_width / unit)) + 2 * margin_cells + 1
        local_grid = CellGrid(unit=unit, nx=nx_local, ny=cfg.grid.ny)
        if not package_capacity:
            package_capacity = max(32, local_capacity // 4)
        return cls(
            base=cfg,
            n_devices=n_devices,
            local_capacity=local_capacity,
            package_capacity=package_capacity,
            halo=halo,
            strip_width=strip_width,
            local_grid=local_grid,
            margin_cells=margin_cells,
        )


def _compact(mask: jnp.ndarray, capacity: int, arrays: AgentState
             ) -> tuple[AgentState, jnp.ndarray]:
    """Stable-compact rows where ``mask`` into a [capacity] buffer.

    Returns the compacted AgentState plus the number of masked rows that did
    not fit.  Order is preserved, so cell-sorted input stays cell-sorted.
    """
    dst = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dst = jnp.where(mask & (dst < capacity), dst, capacity)  # drop slot
    n_kept = jnp.minimum(jnp.sum(mask), capacity)

    def scatter(src: jnp.ndarray, fill) -> jnp.ndarray:
        out_shape = (capacity + 1,) + src.shape[1:]
        out = jnp.full(out_shape, fill, src.dtype)
        return out.at[dst].set(src, mode="drop")[:capacity]

    out = AgentState(
        pos=scatter(arrays.pos, 0.0),
        vel=scatter(arrays.vel, 0.0),
        speed=scatter(arrays.speed, 1.0),
        dest=scatter(arrays.dest, 0),
        active=scatter(arrays.active, False),
    )
    n_lost = jnp.sum(mask) - n_kept
    return out, n_lost.astype(jnp.int32)


def _concat_states(*states: AgentState) -> AgentState:
    return AgentState(*(jnp.concatenate(parts) for parts in zip(*states)))


def make_sharded_step(scfg: ShardedConfig, maps: FieldMaps, mesh: Mesh):
    """Build the sharded step: SimState (agents sharded on axis 0) ->
    (SimState, StepMetrics replicated)."""
    cfg = scfg.base
    phys = cfg.physics
    field = DeviceField.from_maps(maps)
    obstacles = tuple(map(jnp.asarray, cfg.obstacle_arrays()))
    d_count = scfg.n_devices
    cl = scfg.local_capacity
    pk = scfg.package_capacity
    unit = cfg.grid.unit
    w_field, h_field = cfg.scenario.size

    # Global grid (for the despawn out-of-grid check, identical semantics to
    # the single-chip path / neighbor_grid.rs:29).
    gx_cells, gy_cells = cfg.grid.nx, cfg.grid.ny

    def local_cell_ids(pos, ok, origin_x):
        cx = jnp.floor((pos[:, 0] - origin_x) / unit).astype(jnp.int32)
        cy = jnp.floor(pos[:, 1] / unit).astype(jnp.int32)
        g = scfg.local_grid
        in_grid = (cx >= 0) & (cx < g.nx) & (cy >= 0) & (cy < g.ny)
        return jnp.where(ok & in_grid, cy * g.nx + cx, g.n_cells).astype(jnp.int32)

    def select_package(mask: jnp.ndarray, arrays: AgentState) -> AgentState:
        pkg, _ = _compact(mask, pk, arrays)
        return pkg

    def step_local(agents: AgentState, key, step_idx):
        d = jax.lax.axis_index(AXIS)
        x_lo = d.astype(jnp.float32) * scfg.strip_width
        x_hi = x_lo + scfg.strip_width
        # Last strip claims everything to the right as well.
        claim_hi = jnp.where(d == d_count - 1, jnp.float32(1e30), x_hi)

        key, k_spawn = jax.random.split(key)

        # 1. spawn: identical candidates everywhere; claim mine.
        cand = _spawn_candidates(cfg, k_spawn)
        in_strip = (cand.pos[:, 0] >= x_lo) & (cand.pos[:, 0] < claim_hi)
        cand = cand._replace(active=cand.active & in_strip)
        n_spawned = jnp.sum(cand.active).astype(jnp.int32)

        ext = _concat_states(agents, cand)

        # 2. despawn: arrived or out of the *global* grid.
        potv, _ = sample_waypoint(field, ext.dest, ext.pos, cfg.field_unit)
        gx = jnp.floor(ext.pos[:, 0] / unit).astype(jnp.int32)
        gy = jnp.floor(ext.pos[:, 1] / unit).astype(jnp.int32)
        in_global = (gx >= 0) & (gx < gx_cells) & (gy >= 0) & (gy < gy_cells)
        alive = ext.active & (potv > phys.despawn_potential) & in_global
        ext = ext._replace(active=alive)

        # 3. exchange: halo agents + emigrants, both directions.
        x = ext.pos[:, 0]
        send_left = alive & (x < x_lo + scfg.halo)
        send_right = alive & (x >= x_hi - scfg.halo)
        pkg_l = select_package(send_left, ext)
        pkg_r = select_package(send_right, ext)

        # Note: overflowing halo agents are dropped from the package only;
        # they remain owned unless they actually emigrated.
        right_perm = [(i, i + 1) for i in range(d_count - 1)]
        left_perm = [(i, i - 1) for i in range(1, d_count)]

        def ppermute_state(state: AgentState, perm) -> AgentState:
            if not perm:
                return jax.tree.map(jnp.zeros_like, state)
            return jax.tree.map(
                lambda a: jax.lax.ppermute(a, AXIS, perm), state
            )

        recv_from_left = ppermute_state(pkg_r, right_perm)
        recv_from_right = ppermute_state(pkg_l, left_perm)

        # Emigrants were shipped; deactivate the local copy.
        stays = (x >= x_lo) & (x < claim_hi)
        ext = ext._replace(active=ext.active & stays)

        def classify(recv: AgentState) -> tuple[AgentState, jnp.ndarray]:
            rx = recv.pos[:, 0]
            mine = (rx >= x_lo) & (rx < claim_hi)
            adopted = recv._replace(active=recv.active & mine)
            ghost_mask = recv.active & ~mine
            return adopted, ghost_mask

        adopted_l, ghost_mask_l = classify(recv_from_left)
        adopted_r, ghost_mask_r = classify(recv_from_right)
        ghosts = _concat_states(
            recv_from_left._replace(active=ghost_mask_l),
            recv_from_right._replace(active=ghost_mask_r),
        )

        # 4. one combined cell-sort over owned + adopted + ghosts.
        work = _concat_states(ext, adopted_l, adopted_r, ghosts)
        owned = jnp.concatenate([
            jnp.ones((ext.pos.shape[0],), bool),
            jnp.ones((2 * pk,), bool),
            jnp.zeros((2 * pk,), bool),
        ])

        origin_x = x_lo - scfg.margin_cells * unit
        cid = local_cell_ids(work.pos, work.active, origin_x)
        order = jnp.argsort(cid, stable=True)
        work = jax.tree.map(lambda a: jnp.take(a, order, axis=0), work)
        owned = jnp.take(owned, order)
        cid_sorted = jnp.take(cid, order)

        # Force pass: same dense cell-layout primitives as the single-chip
        # path (ops/forcepass.py), over the local strip+halo window.
        _, pgrad = sample_waypoint(field, work.dest, work.pos, cfg.field_unit)
        e = F.safe_normalize(pgrad)
        acc = F.goal_force(e, work.vel, work.speed, phys)
        if cfg.use_distance_map:
            dval, dgrad = sample_obstacle(field, work.pos, cfg.field_unit)
            acc = acc + F.obstacle_force(dval, dgrad, phys)
        elif obstacles[0].shape[0] > 0:
            acc = acc + F.segment_obstacle_force(work.pos, *obstacles, phys)

        lgrid = scfg.local_grid
        layout = forcepass.build_layout(
            cid_sorted, work.active, lgrid, cfg.table_capacity
        )
        data = forcepass.scatter_cell_data(
            layout, lgrid, cfg.table_capacity, work.pos, work.vel, e
        )
        acc_flat = forcepass.dense_pairwise(
            data, lgrid, cfg.table_capacity, phys, row_block=cfg.row_block
        )
        acc = acc + forcepass.gather_pair_acc(acc_flat, layout)

        pos_new, vel_new = F.integrate(
            work.pos, work.vel, acc, work.speed, work.active, phys
        )
        work = work._replace(pos=pos_new, vel=vel_new)

        # 5. compact owned survivors back into the local shard.
        keep = owned & work.active
        agents_out, n_lost = _compact(keep, cl, work)

        n_active = jnp.sum(agents_out.active).astype(jnp.int32)
        metrics = StepMetrics(
            n_active=jax.lax.psum(n_active, AXIS),
            n_spawned=jax.lax.psum(n_spawned, AXIS),
            n_dropped=jax.lax.psum(n_lost, AXIS),
            n_overflow=jax.lax.psum(layout.n_overflow, AXIS),
        )
        return agents_out, key, step_idx + 1, metrics

    sharded = jax.shard_map(
        step_local,
        mesh=mesh,
        in_specs=(P(AXIS), P(), P()),
        out_specs=(P(AXIS), P(), P(), P()),
        check_vma=False,
    )

    def step(state: SimState):
        agents, key, step_idx, metrics = sharded(state.agents, state.key, state.step)
        return SimState(agents=agents, key=key, step=step_idx), metrics

    return step


def make_sharded_initial_state(scfg: ShardedConfig, mesh: Mesh,
                               seed: int = 0) -> SimState:
    """Initial once-spawn state, redistributed so each strip's agents live
    in that device's shard."""
    cfg = scfg.base
    state = make_initial_state(cfg, seed=seed)
    pos = np.asarray(state.agents.pos)
    active = np.asarray(state.agents.active)
    cl = scfg.local_capacity

    # Re-home each active agent to its strip's slab of the global array.
    strip = np.clip(
        (pos[:, 0] / scfg.strip_width).astype(np.int64), 0, scfg.n_devices - 1
    )
    arrays = {k: np.asarray(getattr(state.agents, k)) for k in AgentState._fields}
    out = {
        k: np.zeros((cfg.capacity,) + v.shape[1:], v.dtype)
        for k, v in arrays.items()
    }
    out["speed"][:] = 1.0
    fill = np.zeros(scfg.n_devices, np.int64)
    lost = 0
    for i in np.nonzero(active)[0]:
        d = strip[i]
        if fill[d] >= cl:
            lost += 1
            continue
        slot = d * cl + fill[d]
        for k in arrays:
            out[k][slot] = arrays[k][i]
        fill[d] += 1
    if lost:
        import logging

        logging.getLogger(__name__).warning(
            "initial placement dropped %d agents (strip shard full)", lost
        )

    sharding = NamedSharding(mesh, P(AXIS))
    agents = AgentState(**{
        k: jax.device_put(jnp.asarray(v), sharding) for k, v in out.items()
    })
    rep = NamedSharding(mesh, P())
    return SimState(
        agents=agents,
        key=jax.device_put(state.key, rep),
        step=jax.device_put(jnp.int32(0), rep),
    )


def dryrun(n_devices: int) -> None:
    """Driver hook: build an n-device mesh, jit the full sharded step, run
    one step on tiny shapes, and sanity-check the result.

    If the current process doesn't have n CPU devices (e.g. a TPU plugin
    grabbed the backend at interpreter startup, which also breaks later
    collective lowering), re-run in a clean subprocess with a CPU mesh.
    """
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
        env.pop("PALLAS_AXON_POOL_IPS", None)  # disable the TPU plugin hook
        pkg_root = str(pathlib.Path(__file__).resolve().parents[2])
        env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
        code = (
            "from pedoni_tpu.parallel.spatial import dryrun; "
            f"dryrun({n_devices})"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code], env=env,
            capture_output=True, text=True, timeout=1200,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"subprocess dryrun failed (rc={proc.returncode}):\n"
                f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
            )
        return
    mesh = Mesh(np.array(devices), (AXIS,))

    from ..field import Field, FieldMaps
    from ..scenario import loads_scenario

    scenario = loads_scenario(
        """
[field]
size = [32, 16]
[[waypoints]]
line = [[2, 2], [2, 14]]
[[waypoints]]
line = [[30, 2], [30, 14]]
[[obstacles]]
line = [[16, 0], [16, 6]]
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
    cfg = StepConfig.build(
        scenario, capacity=128 * n_devices, chunk_size=64, table_capacity=8
    )
    scfg = ShardedConfig.build(cfg, n_devices, package_capacity=32)
    step = jax.jit(make_sharded_step(scfg, maps, mesh))
    state = make_sharded_initial_state(scfg, mesh, seed=0)

    for _ in range(3):
        state, metrics = step(state)
        # Lockstep each step: virtual CPU meshes on few-core hosts can
        # starve the collective rendezvous under deep dispatch queues.
        jax.block_until_ready(state)
    n = int(metrics.n_active)
    assert 0 < n <= cfg.capacity, f"implausible active count {n}"
    pos = np.asarray(state.agents.pos)
    assert np.isfinite(pos).all(), "non-finite positions after sharded step"
