"""The social-force model as a single jitted device step.

This is the TPU-native re-design of the reference's per-tick pipeline
(lib.rs:64-100 + sfm.rs): where the reference mutates growable host vectors,
we keep fixed-capacity SoA arrays resident on device and express
spawn/despawn as mask flips plus a per-step cell sort (the reference already
re-sorts every step, sfm.rs:58-77, so the layout is faithful).

Step phases (one ``jit``-compiled function, no host round-trips):

1. spawn    — Poisson arrivals per periodic group (lib.rs:70-84), lerped
              along the origin waypoint line, desired speed ~ N(1.34, 0.26)
              (sfm.rs:54).  Fixed per-group candidate caps keep shapes
              static; the seeded ``jax.random`` PRNG improves on the
              reference's unseeded global RNG.
2. despawn  — deactivate agents whose destination potential <= 0.25
              (sfm.rs:69) or that left the neighbor grid
              (neighbor_grid.rs:29).
3. sort     — stable argsort by cell id: the counting-sort analog
              (sfm.rs:61-77).  Active agents compact to the front; candidate
              slots merge in the same sort.
4. forces   — goal + pairwise + obstacle forces over the dense 3x3-cell
              candidate table (sfm.rs:93-241), evaluated in fixed-size agent
              chunks to bound memory.
5. integrate— trapezoidal with speed clamp (sfm.rs:245-254).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FieldMaps
from ..ops import forces as F
from ..ops.neighbor import CellGrid, build_neighbor_data, compute_cell_ids, gather_candidates
from ..ops.sampling import DeviceField, sample_grad, sample_scalar
from ..physics import Physics
from ..scenario import Scenario


class AgentState(NamedTuple):
    """SoA agent arrays, fixed capacity (sfm.rs:26-33 analog)."""

    pos: jnp.ndarray  # [C, 2] f32
    vel: jnp.ndarray  # [C, 2] f32
    speed: jnp.ndarray  # [C] f32 desired speed
    dest: jnp.ndarray  # [C] i32 destination waypoint id
    active: jnp.ndarray  # [C] bool


class SimState(NamedTuple):
    agents: AgentState
    key: jnp.ndarray  # PRNG key
    step: jnp.ndarray  # i32 step counter


class StepMetrics(NamedTuple):
    """Device-side per-step metrics (diagnostic.rs:45-50 analog plus
    capacity health counters the reference lacks)."""

    n_active: jnp.ndarray  # i32
    n_spawned: jnp.ndarray  # i32
    n_dropped: jnp.ndarray  # i32: active agents lost to capacity saturation
    n_overflow: jnp.ndarray  # i32: cell-table overflow drops


def _spawn_cap(lam: float) -> int:
    """Static per-step candidate cap for a Poisson(lam) arrival count.
    P(X > lam + 6 sqrt(lam) + 6) is negligible (< 1e-8 per step)."""
    return int(math.ceil(lam + 6.0 * math.sqrt(max(lam, 0.0)) + 6.0))


@dataclasses.dataclass(frozen=True)
class SpawnPlan:
    """Static spawn tables derived from the scenario's periodic groups."""

    p0: np.ndarray  # [G, 2] origin line start
    p1: np.ndarray  # [G, 2] origin line end
    lam: np.ndarray  # [G] Poisson rate per step (frequency * dt)
    dest: np.ndarray  # [G] destination ids
    caps: tuple[int, ...]  # static per-group candidate caps

    @property
    def total(self) -> int:
        return sum(self.caps)

    @classmethod
    def from_scenario(cls, scenario: Scenario, phys: Physics) -> "SpawnPlan":
        groups = scenario.periodic_groups
        if not groups:
            return cls(
                p0=np.zeros((0, 2), np.float32),
                p1=np.zeros((0, 2), np.float32),
                lam=np.zeros((0,), np.float32),
                dest=np.zeros((0,), np.int32),
                caps=(),
            )
        p0 = np.array([scenario.waypoints[g.origin].line[0] for g in groups], np.float32)
        p1 = np.array([scenario.waypoints[g.origin].line[1] for g in groups], np.float32)
        lam = np.array(
            [g.spawn.frequency * phys.spawn_rate_scale for g in groups], np.float32
        )
        dest = np.array([g.destination for g in groups], np.int32)
        caps = tuple(_spawn_cap(float(l)) for l in lam)
        return cls(p0=p0, p1=p1, lam=lam, dest=dest, caps=caps)


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Everything static the step function needs."""

    scenario: Scenario
    physics: Physics
    capacity: int
    grid: CellGrid
    spawn: SpawnPlan
    field_unit: float
    table_capacity: int = 16
    chunk_size: int = 2048
    use_neighbor_grid: bool = True
    use_distance_map: bool = True

    @classmethod
    def build(
        cls,
        scenario: Scenario,
        physics: Physics = Physics(),
        capacity: int = 4096,
        neighbor_grid_unit: float = 1.4,
        field_unit: float = 0.25,
        table_capacity: int = 16,
        chunk_size: int = 2048,
        use_neighbor_grid: bool = True,
        use_distance_map: bool = True,
    ) -> "StepConfig":
        spawn = SpawnPlan.from_scenario(scenario, physics)
        chunk = min(chunk_size, capacity)
        capacity = ((capacity + chunk - 1) // chunk) * chunk
        return cls(
            scenario=scenario,
            physics=physics,
            capacity=capacity,
            grid=CellGrid.for_size(scenario.size, neighbor_grid_unit),
            spawn=spawn,
            field_unit=field_unit,
            table_capacity=table_capacity,
            chunk_size=chunk,
            use_neighbor_grid=use_neighbor_grid,
            use_distance_map=use_distance_map,
        )

    def obstacle_arrays(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        obs = self.scenario.obstacles
        if not obs:
            return (
                np.zeros((0, 2), np.float32),
                np.zeros((0, 2), np.float32),
                np.zeros((0,), np.float32),
            )
        p0 = np.array([o.line[0] for o in obs], np.float32)
        p1 = np.array([o.line[1] for o in obs], np.float32)
        w = np.array([o.width for o in obs], np.float32)
        return p0, p1, w


def make_initial_state(cfg: StepConfig, seed: int = 0) -> SimState:
    """Initial state: agents from every ``once`` spawn group placed along
    their origin waypoint line (lib.rs:37-52)."""
    key = jax.random.PRNGKey(seed)
    c = cfg.capacity
    pos = np.zeros((c, 2), np.float32)
    vel = np.zeros((c, 2), np.float32)
    speed = np.full((c,), cfg.physics.speed_mean, np.float32)
    dest = np.zeros((c,), np.int32)
    active = np.zeros((c,), bool)

    i = 0
    for g in cfg.scenario.once_groups:
        n = g.spawn.count
        if i + n > c:
            raise ValueError(
                f"capacity {c} too small for {sum(x.spawn.count for x in cfg.scenario.once_groups)} once-spawned agents"
            )
        key, k1, k2 = jax.random.split(key, 3)
        t = np.asarray(jax.random.uniform(k1, (n,)))
        a = np.asarray(cfg.scenario.waypoints[g.origin].line[0], np.float32)
        b = np.asarray(cfg.scenario.waypoints[g.origin].line[1], np.float32)
        pos[i : i + n] = a[None, :] + t[:, None] * (b - a)[None, :]
        sp = cfg.physics.speed_mean + cfg.physics.speed_std * np.asarray(
            jax.random.normal(k2, (n,))
        )
        speed[i : i + n] = np.maximum(sp, 0.1)
        dest[i : i + n] = g.destination
        active[i : i + n] = True
        i += n

    agents = AgentState(
        pos=jnp.asarray(pos),
        vel=jnp.asarray(vel),
        speed=jnp.asarray(speed),
        dest=jnp.asarray(dest),
        active=jnp.asarray(active),
    )
    return SimState(agents=agents, key=key, step=jnp.int32(0))


def _spawn_candidates(cfg: StepConfig, key: jnp.ndarray) -> AgentState:
    """Sample this step's spawn candidates: [S] arrays, S static."""
    plan = cfg.spawn
    s = plan.total
    if s == 0:
        z2 = jnp.zeros((0, 2), jnp.float32)
        z1 = jnp.zeros((0,), jnp.float32)
        return AgentState(z2, z2, z1, jnp.zeros((0,), jnp.int32), jnp.zeros((0,), bool))

    k_count, k_pos, k_speed = jax.random.split(key, 3)
    counts = jax.random.poisson(k_count, jnp.asarray(plan.lam))  # [G]

    # Expand per-group caps into flat candidate slots.
    group_of = np.concatenate(
        [np.full(cap, g, np.int32) for g, cap in enumerate(plan.caps)]
    )
    slot_in_group = np.concatenate(
        [np.arange(cap, dtype=np.int32) for cap in plan.caps]
    )
    group_of_j = jnp.asarray(group_of)
    active = jnp.asarray(slot_in_group) < jnp.take(counts, group_of_j)

    t = jax.random.uniform(k_pos, (s,))
    p0 = jnp.asarray(plan.p0)[group_of]
    p1 = jnp.asarray(plan.p1)[group_of]
    pos = p0 + t[:, None] * (p1 - p0)
    speed = cfg.physics.speed_mean + cfg.physics.speed_std * jax.random.normal(
        k_speed, (s,)
    )
    speed = jnp.maximum(speed, 0.1)
    dest = jnp.asarray(plan.dest)[group_of]
    return AgentState(
        pos=pos,
        vel=jnp.zeros((s, 2), jnp.float32),
        speed=speed,
        dest=dest,
        active=active,
    )


def _force_pass(cfg: StepConfig, field: DeviceField, agents: AgentState,
                table: jnp.ndarray, obstacles) -> jnp.ndarray:
    """Accelerations for all agents, chunked to bound memory."""
    phys = cfg.physics
    c = cfg.capacity
    b = cfg.chunk_size
    n_chunks = c // b
    obs_p0, obs_p1, obs_w = obstacles

    pos_all, vel_all = agents.pos, agents.vel
    cid_all = compute_cell_ids(pos_all, agents.active, cfg.grid)
    if cfg.use_neighbor_grid:
        cand_all = gather_candidates(cid_all, table, cfg.grid)  # [C, 9K]
    else:
        cand_all = jnp.broadcast_to(
            jnp.arange(c, dtype=jnp.int32)[None, :], (c, c)
        )

    # Sentinel row: gathers with index C read an always-invalid agent.
    pos_ext = jnp.concatenate([pos_all, jnp.full((1, 2), 1e30, jnp.float32)])
    vel_ext = jnp.concatenate([vel_all, jnp.zeros((1, 2), jnp.float32)])
    act_ext = jnp.concatenate([agents.active, jnp.zeros((1,), bool)])

    def chunk_fn(args):
        idx, pos, vel, speed, dest, cand = args
        # Goal force (sfm.rs:107-109).
        grad = sample_grad(field.pot_gx, field.pot_gy, dest, pos, cfg.field_unit)
        e = F.safe_normalize(grad)
        acc = F.goal_force(e, vel, speed, phys)

        # Pairwise repulsion.
        cand_pos = jnp.take(pos_ext, cand, axis=0)
        cand_vel = jnp.take(vel_ext, cand, axis=0)
        cand_ok = jnp.take(act_ext, cand) & (cand != idx[:, None])
        acc = acc + F.pairwise_force(pos, vel, e, cand_pos, cand_vel, cand_ok, phys)

        # Obstacle force.
        if cfg.use_distance_map:
            dval = sample_scalar(field.dist, 0, pos, cfg.field_unit)
            dgrad = sample_grad(field.dist_gx, field.dist_gy, 0, pos, cfg.field_unit)
            acc = acc + F.obstacle_force(dval, dgrad, phys)
        elif obs_p0.shape[0] > 0:
            acc = acc + F.segment_obstacle_force(pos, obs_p0, obs_p1, obs_w, phys)
        return acc

    idx = jnp.arange(c, dtype=jnp.int32)
    args = (
        idx.reshape(n_chunks, b),
        pos_all.reshape(n_chunks, b, 2),
        vel_all.reshape(n_chunks, b, 2),
        agents.speed.reshape(n_chunks, b),
        agents.dest.reshape(n_chunks, b),
        cand_all.reshape(n_chunks, b, -1),
    )
    if n_chunks == 1:
        acc = chunk_fn(jax.tree.map(lambda x: x[0], args))
        return acc
    acc = jax.lax.map(chunk_fn, args)
    return acc.reshape(c, 2)


def make_step(cfg: StepConfig, maps: FieldMaps):
    """Build the jitted step function: SimState -> (SimState, StepMetrics)."""
    field = DeviceField.from_maps(maps)
    obstacles = tuple(map(jnp.asarray, cfg.obstacle_arrays()))
    phys = cfg.physics
    c = cfg.capacity

    def step(state: SimState) -> tuple[SimState, StepMetrics]:
        key, k_spawn = jax.random.split(state.key)
        a = state.agents

        # 1. spawn candidates, appended past the capacity window.
        cand = _spawn_candidates(cfg, k_spawn)
        n_spawned = jnp.sum(cand.active).astype(jnp.int32)
        ext = AgentState(
            pos=jnp.concatenate([a.pos, cand.pos]),
            vel=jnp.concatenate([a.vel, cand.vel]),
            speed=jnp.concatenate([a.speed, cand.speed]),
            dest=jnp.concatenate([a.dest, cand.dest]),
            active=jnp.concatenate([a.active, cand.active]),
        )

        # 2. despawn: arrived (potential <= 0.25, sfm.rs:69) or out of grid.
        potv = sample_scalar(field.pot, ext.dest, ext.pos, cfg.field_unit)
        alive = ext.active & (potv > phys.despawn_potential)
        cid = compute_cell_ids(ext.pos, alive, cfg.grid)

        # 3. cell-sort and truncate back to capacity; active agents sort to
        # the front (sentinel id for the rest), so truncation only ever
        # drops agents when the population exceeds capacity.
        order = jnp.argsort(cid, stable=True)
        cid_sorted = jnp.take(cid, order)[:c]
        take = lambda arr: jnp.take(arr, order, axis=0)[:c]
        agents = AgentState(
            pos=take(ext.pos),
            vel=take(ext.vel),
            speed=take(ext.speed),
            dest=take(ext.dest),
            active=jnp.take(alive, order)[:c],
        )
        n_alive_total = jnp.sum(alive).astype(jnp.int32)
        n_active = jnp.sum(agents.active).astype(jnp.int32)
        n_dropped = n_alive_total - n_active

        # 4. neighbor table + forces.
        if cfg.use_neighbor_grid:
            nb = build_neighbor_data(cid_sorted, cfg.grid, cfg.table_capacity)
            table = nb.table
            n_overflow = nb.n_overflow
        else:
            table = jnp.zeros((1, 1), jnp.int32)
            n_overflow = jnp.int32(0)
        acc = _force_pass(cfg, field, agents, table, obstacles)

        # 5. integrate (sfm.rs:245-254).
        pos, vel = F.integrate(
            agents.pos, agents.vel, acc, agents.speed, agents.active, phys
        )
        agents = agents._replace(pos=pos, vel=vel)

        new_state = SimState(agents=agents, key=key, step=state.step + 1)
        metrics = StepMetrics(
            n_active=n_active,
            n_spawned=n_spawned,
            n_dropped=n_dropped,
            n_overflow=n_overflow,
        )
        return new_state, metrics

    return step
