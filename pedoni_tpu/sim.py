"""Simulator orchestration: state management, capacity growth, ticking.

The host-side owner of the device state — the analog of the reference's
``Simulator`` (lib.rs:17-105), with the same surface:

    sim = Simulator(options, scenario)
    metrics = sim.tick()
    agents = sim.list_pedestrians()
    sim.pedestrian_count

TPU specifics the reference never needed:

- **Fixed capacity + bucketed growth.** XLA wants static shapes, so agent
  arrays have a fixed capacity; when the active population nears it, the
  arrays are padded to double size and the step re-jits (a rare, amortized
  recompile).
- **Async metrics.** ``tick`` returns numbers the moment the host needs
  them; ``run`` variants keep metrics on device to avoid per-step syncs.
"""

from __future__ import annotations

import dataclasses
import logging
import math

import jax
import jax.numpy as jnp
import numpy as np

from .diagnostics import DiagnosticLog, StepRecord
from .field import Field, FieldMaps
from .models.sfm import SimState, StepConfig, device_inputs, make_initial_state, make_step
from .physics import Physics
from .scenario import Scenario
from .utils.timing import Timer

log = logging.getLogger(__name__)


@jax.jit
def _accumulate_metrics(tot, m):
    """Device-side running totals for Simulator.run(): counters sum,
    max_demand takes the max, n_active keeps the latest (it is a level,
    not a flow).  One fused scalar kernel per step — run() stays
    sync-free but no step's overflow/drop count is ever lost."""
    return m._replace(
        n_spawned=tot.n_spawned + m.n_spawned,
        n_dropped=tot.n_dropped + m.n_dropped,
        n_overflow=tot.n_overflow + m.n_overflow,
        max_demand=jnp.maximum(tot.max_demand, m.max_demand),
        n_exited=tot.n_exited + m.n_exited,
    )


@dataclasses.dataclass(frozen=True)
class SimulatorOptions:
    """Counterpart of lib.rs:109-135 with the same defaults."""

    backend: str = "xla"  # "xla" | "pallas" (flat fused kernel) | "grid"
    #                        ("grid" = cell-resident two-kernel step, the
    #                        fast path; see models/sfm_grid.py)
    neighbor_grid_unit: float = 1.4
    field_grid_unit: float = 0.25
    use_neighbor_grid: bool = True
    use_distance_map: bool = True
    table_capacity: int = 16
    chunk_size: int = 2048  # reference --work-size; row_block derives from it
    capacity: int = 0  # 0 = auto-size from the scenario
    seed: int = 0
    physics: Physics = Physics()
    n_devices: int = 1  # >1 = spatial sharding (grid backend only)
    tile: tuple[int, int] | None = None  # (rows, cols) 2D device tiling;
    #                        None = row strips (rows = n_devices, cols = 1)
    # Incremental (hole-preserving) rebin on the grid backend: ~90% of
    # agents do not change cell per step, so the rebin walks only the
    # compacted mover table on non-compaction steps.  compact_every=8
    # is the measured winner of the round-4 cadence sweep
    # (scripts/ab_incremental_rebin.py --cadence 4 6 8, 1M agents,
    # alternating on-hardware windows: full 13.57 / hybrid4 12.53 /
    # hybrid6 12.41 / hybrid8 12.37 ms/step — the curve flattens past 6
    # as the amortized full-rebin share vanishes).  Never compacting
    # LOSES long-run (holes freeze the occupancy bound the O(jmax) pair
    # pass runs to; see make_step_grid's docstring).
    # DENSITY MATTERS (round-5 sweep, same script, --density 0.5/1.0/
    # 2.5/5.0 at matched table capacities): the hybrid wins at bench
    # occupancy (lambda = 5.6) but the FULL rebin wins 1.13x at sparse
    # occupancy (lambda ~ 1.1, K = 8) — the mover-walk saving shrinks
    # with lambda while hole-driven occupancy-bound inflation hurts
    # proportionally more on one-sublane-tile tables.  None (default) =
    # auto: incremental iff the scenario's expected cell occupancy
    # lambda = E[agents]/area * unit^2 >= 1.75 (the measured crossover
    # lies between the 1.1 loss and the 2.25 win).
    # mover_capacity = mover-table slots per cell (grown preemptively
    # like table_capacity).
    incremental_rebin: bool | None = None
    mover_capacity: int = 8
    compact_every: int = 8
    # Per-block waypoint-plane skip (multi-waypoint scenarios; statically
    # a no-op at one waypoint): plane DMA + sampling run only in blocks
    # whose window holds an agent bound for that plane.
    wp_skip: bool = True

    def resolve_tile(self) -> tuple[int, int]:
        if self.tile is not None:
            r, c = self.tile
            if r * c != self.n_devices:
                raise ValueError(
                    f"tile {r}x{c} does not cover n_devices={self.n_devices}")
            return r, c
        return self.n_devices, 1

    @property
    def row_block(self) -> int:
        """Kernel dispatch granularity in cell rows — the analog of the
        reference's --work-size workgroup knob (args.rs:39-40,
        sfm_gpu.rs:172-173): one block processes ~chunk_size agent slots,
        so the flag genuinely changes dispatch shape here too."""
        return max(1, min(8, self.chunk_size // 1024))


class Simulator:
    def __init__(self, options: SimulatorOptions, scenario: Scenario) -> None:
        if options.backend in ("pallas", "grid") and options.neighbor_grid_unit == 1.4:
            # The fused kernel's stride-6 field layout needs 1.5 m cells;
            # auto-switch when the unit was left at the reference default.
            options = dataclasses.replace(options, neighbor_grid_unit=1.5)
        if options.backend in ("pallas", "grid") and not options.use_neighbor_grid:
            # All-pairs debug mode (args.rs:27-29) on the fused backends:
            # the reference's all-pairs path applies the SAME 2 m cutoff as
            # the grid path (sfm.rs:158-184, `distance_squared > 4.0`), so
            # any neighbor structure whose 3x3 window covers the cutoff
            # finds exactly the same interacting pairs.  The fused kernels
            # ARE the cell grid, so instead of rejecting the flag we grow
            # the cell unit to cover the cutoff (ceil to a field-unit
            # multiple for the stride layout; a missed pair would need
            # d >= unit >= cutoff, which the cutoff already excludes up to
            # the measure-zero d == cutoff boundary) and scale the table
            # capacity by the cell-area ratio.  The 1-cell ghost exchange
            # of the tiled path covers the cutoff the same way.
            cutoff = options.physics.interaction_cutoff
            fu = options.field_grid_unit
            unit_ap = math.ceil(cutoff / fu - 1e-9) * fu
            if unit_ap > options.neighbor_grid_unit:
                k_ap = math.ceil(options.table_capacity
                                 * (unit_ap / options.neighbor_grid_unit) ** 2)
                options = dataclasses.replace(
                    options, neighbor_grid_unit=unit_ap, table_capacity=k_ap)
                log.info(
                    "all-pairs mode on the %s backend: neighbor unit -> "
                    "%.2f m (covers the %.1f m interaction cutoff), table "
                    "capacity -> %d", options.backend, unit_ap, cutoff, k_ap)
        self.options = options
        self.scenario = scenario

        with Timer() as t_field:
            self.field = Field.from_scenario(scenario, options.field_grid_unit)
            self.maps = FieldMaps.from_field(self.field)
        self.time_calc_field = t_field.elapsed
        log.info(
            "field: %dx%d cells, %d potential maps, built in %.3fs",
            *self.field.shape, len(scenario.waypoints), t_field.elapsed,
        )

        if options.n_devices > 1 and options.backend != "grid":
            raise ValueError("--devices > 1 requires the grid backend")
        options.resolve_tile()  # reject a tile that mismatches n_devices
        #                         even when the sharded branch is skipped
        capacity = options.capacity or self._auto_capacity(scenario)
        self._build(capacity)
        self.state = self._from_flat_state(
            make_initial_state(self.cfg, seed=options.seed))
        self.step_count = 0
        self.last_metrics = None      # host StepMetrics of the last tick()
        self.last_run_metrics = None  # totals of the latest run() call

    @staticmethod
    def _auto_capacity(scenario: Scenario) -> int:
        n_once = sum(g.spawn.count for g in scenario.once_groups)
        rate = sum(g.spawn.frequency for g in scenario.periodic_groups)
        estimate = int(n_once * 1.25 + rate * 60 + 1024)
        cap = 1024
        while cap < estimate:
            cap *= 2
        return cap

    def _resolve_incremental(self) -> bool:
        """incremental_rebin=None -> auto by expected cell occupancy.

        Round-5 density sweep (scripts/ab_incremental_rebin.py,
        on-hardware alternating windows at matched table capacities):
        the hole-preserving rebin family wins at lambda >= 2.25 but the
        FULL rebin wins 1.13x at lambda ~ 1.1 — sparse tables pay the
        hole-driven occupancy-bound inflation without the mover-walk
        saving.  Threshold 1.75 = midpoint of the measured bracket."""
        o = self.options
        if o.incremental_rebin is not None:
            return o.incremental_rebin
        n_once = sum(g.spawn.count for g in self.scenario.once_groups)
        rate = sum(g.spawn.frequency for g in self.scenario.periodic_groups)
        est_n = n_once + rate * 60
        w, h = self.scenario.size
        lam = est_n / max(w * h, 1e-9) * o.neighbor_grid_unit ** 2
        return lam >= 1.75

    def _build(self, capacity: int) -> None:
        o = self.options
        self._mesh = None
        self._tcfg = None
        self._kernel_chain = None  # shapes depend on capacity/K
        self._spawn_chain = None   # traces self.cfg, rebuilt with it
        self.cfg = StepConfig.build(
            self.scenario,
            physics=o.physics,
            capacity=capacity,
            neighbor_grid_unit=o.neighbor_grid_unit,
            field_unit=o.field_grid_unit,
            table_capacity=o.table_capacity,
            chunk_size=o.chunk_size,
            use_neighbor_grid=o.use_neighbor_grid,
            use_distance_map=o.use_distance_map,
        )
        if o.backend in ("pallas", "grid"):
            from .models import sfm_grid, sfm_pallas

            if not sfm_pallas.supports(self.cfg, o.row_block,
                                       wp_skip=o.wp_skip):
                raise ValueError(
                    f"{o.backend} backend requires an integral neighbor/"
                    "field unit ratio and waypoint planes fitting VMEM; "
                    "use backend='xla' for this scenario"
                )
            if o.backend == "grid" and o.n_devices > 1:
                devices = jax.devices()
                if len(devices) < o.n_devices:
                    raise ValueError(
                        f"--devices {o.n_devices} but only {len(devices)} "
                        "devices are visible"
                    )
                # Row strips are the cols=1 case of the 2D tiling — one
                # sharded step implementation serves both.
                from .parallel import tile2d

                rows, cols = o.resolve_tile()
                self._tcfg = tile2d.Tile2DConfig.build(
                    self.cfg, rows, cols, row_block=o.row_block)
                self._mesh = tile2d.make_mesh(self._tcfg, devices)
                self._field_rows, self._obstacles = \
                    tile2d.device_inputs_on_mesh(
                        self._tcfg, self._mesh, self.maps)
                self._step = jax.jit(
                    tile2d.make_sharded_step(
                        self._tcfg, self._mesh,
                        incremental=self._resolve_incremental(),
                        mover_k=o.mover_capacity,
                        compact_every=o.compact_every,
                        wp_skip=o.wp_skip))
            else:
                self._mesh = None
                fwp, fobs = sfm_pallas.pallas_device_inputs(
                    self.cfg, self.maps, row_block=o.row_block)
                self._field_rows = fwp  # first step arg
                self._obstacles = fobs  # second step arg
                if o.backend == "grid":
                    self._step = jax.jit(sfm_grid.make_step_grid(
                        self.cfg, self.maps, row_block=o.row_block,
                        incremental=self._resolve_incremental(),
                        mover_k=o.mover_capacity,
                        compact_every=o.compact_every,
                        wp_skip=o.wp_skip))
                else:
                    self._step = jax.jit(sfm_pallas.make_step_pallas(
                        self.cfg, self.maps, row_block=o.row_block))
        else:
            field, obstacles = device_inputs(self.cfg, self.maps)
            self._field_rows = field.rows
            self._obstacles = obstacles
            self._step = jax.jit(make_step(self.cfg, self.maps))
        log.info("step function built: capacity=%d backend=%s",
                 self.cfg.capacity, o.backend)

    def _grow(self) -> None:
        old_cap = self.cfg.capacity
        self._build(old_cap * 2)
        pad = self.cfg.capacity - old_cap
        a = self.state.agents
        self.state = self.state._replace(
            agents=type(a)(
                pos=np.concatenate([np.asarray(a.pos), np.zeros((pad, 2), np.float32)]),
                vel=np.concatenate([np.asarray(a.vel), np.zeros((pad, 2), np.float32)]),
                speed=np.concatenate([np.asarray(a.speed), np.ones((pad,), np.float32)]),
                dest=np.concatenate([np.asarray(a.dest), np.zeros((pad,), np.int32)]),
                active=np.concatenate([np.asarray(a.active), np.zeros((pad,), bool)]),
            )
        )
        log.info("capacity grown: %d -> %d", old_cap, self.cfg.capacity)

    def tick(self) -> StepRecord:
        """Advance one step (lib.rs:64-100) and return host-side metrics."""
        with Timer() as t:
            self.state, dmetrics = self._step(self.state, self._field_rows, self._obstacles)
            # ONE batched device->host transfer for all metric scalars:
            # each separate int(jax_scalar) is an independent round trip
            # on the tunneled backend (milliseconds each on the
            # interactive hot path).
            metrics = jax.device_get(dmetrics)
            n_active = int(metrics.n_active)
        self.step_count += 1
        self.last_metrics = metrics  # full host-side StepMetrics

        n_dropped = int(metrics.n_dropped)
        if n_dropped > 0:
            if self.options.backend == "grid":
                log.warning("step %d: %d spawn candidates dropped into "
                            "full cells", self.step_count, n_dropped)
            else:
                log.warning("step %d: %d agents dropped at capacity",
                            self.step_count, n_dropped)
        n_exited = int(metrics.n_exited)
        if n_exited > 0:
            # Expected departure (the reference drops off-grid agents
            # silently, neighbor_grid.rs:29) — informational only.
            log.debug("step %d: %d agents left the field",
                      self.step_count, n_exited)
        if self.options.backend == "grid":
            if int(metrics.n_overflow) > 0:
                # Reactive fallback: a cell jumped past K within one step
                # (several agents converged at once) before the preemptive
                # trigger below could fire.  The overflow is counted.
                self._grow_table(int(metrics.n_overflow))
            elif int(metrics.max_demand) >= self.options.table_capacity - 1:
                # Drop-free growth: the rebin's demand channel says some
                # cell is one agent short of K — grow BEFORE it overflows
                # (cells gain at most a few agents per step, so K-1 is an
                # early-warning threshold, not a cliff).
                self._grow_table(0)
            elif (int(metrics.max_mover_demand)
                  >= self.options.mover_capacity - 1
                  and self.options.mover_capacity
                  < self.options.table_capacity):
                # Mover-table growth is a PERF trigger, not a safety one:
                # table overflow already falls back in-graph to the full
                # rebin with no loss; growing keeps the fast path fast.
                self._grow_movers()
        elif n_active > 0.8 * self.cfg.capacity:
            self._grow()

        return StepRecord(
            active_ped_count=n_active,
            time_spawn=0.0,
            time_calc_state=t.elapsed,
        )

    def run(self, n_steps: int, sync_every: int = 0,
            guard_every: int = 4) -> StepRecord:
        """Advance ``n_steps`` without per-step host syncs (throughput
        mode): metrics accumulate ON DEVICE (sums; max of max_demand) and
        are fetched once at the end, so no step's counters are ever lost
        — the totals land in :attr:`last_run_metrics` and loss warnings
        fire exactly as in tick().

        Capacity growth runs drop-free like tick() even with
        ``sync_every=0``: every ``guard_every`` steps the LAGGED metrics
        of the step ``guard_every`` dispatches ago are fetched (that step
        has long resolved, so the fetch costs one tunnel round trip
        without draining the dispatch queue) and tick()'s growth rules
        apply — grid tables grow preemptively at peak demand >= K-1,
        flat arrays double at 80% occupancy.  The lag means a cell
        sprinting from below K-1 past K within ``guard_every`` steps
        still falls to the counted reactive path, exactly tick()'s own
        caveat; set ``guard_every=0`` to trade the guard away for zero
        mid-run fetches.  ``sync_every`` > 0 additionally bounds the
        dispatch queue with full syncs (the pre-round-5 growth hook
        lived only here)."""
        totals = None
        metrics = None
        pending: list = []  # metrics of the last guard_every steps
        with Timer() as t:
            for i in range(n_steps):
                self.state, metrics = self._step(
                    self.state, self._field_rows, self._obstacles
                )
                # One tiny fused device op per step (scalar adds/max) —
                # dispatch stays async, nothing syncs until the end.
                totals = metrics if totals is None \
                    else _accumulate_metrics(totals, metrics)
                if guard_every:
                    pending.append(metrics)
                    if len(pending) > guard_every:
                        pending.pop(0)
                    if (i + 1) % guard_every == 0:
                        old = pending[0]  # resolved guard_every-1 steps ago
                        if self.options.backend == "grid":
                            if (int(old.max_demand)
                                    >= self.options.table_capacity - 1):
                                self._grow_table(0)
                                pending.clear()
                        elif int(old.n_active) > 0.8 * self.cfg.capacity:
                            self._grow()
                            pending.clear()
                if sync_every and (i + 1) % sync_every == 0:
                    if (self.options.backend == "grid"
                            and int(metrics.max_demand)
                            >= self.options.table_capacity - 1):
                        self._grow_table(0)  # int() above already synced
                    elif (self.options.backend != "grid"
                          and int(metrics.n_active) > 0.8 * self.cfg.capacity):
                        self._grow()  # flat-array capacity, like tick()
                    else:
                        jax.block_until_ready(self.state)
            totals = jax.device_get(totals) if totals is not None else None
            n_active = int(totals.n_active) if totals is not None else 0
        self.step_count += n_steps
        self.last_run_metrics = totals
        if totals is not None:
            if int(totals.n_dropped) > 0:
                log.warning(
                    "run(%d): %d %s over the run", n_steps,
                    int(totals.n_dropped),
                    "spawn candidates dropped into full cells"
                    if self.options.backend == "grid"
                    else "agents dropped at capacity")
            if int(totals.n_overflow) > 0:
                log.warning("run(%d): %d agents lost to cell overflow "
                            "over the run", n_steps, int(totals.n_overflow))
        return StepRecord(
            active_ped_count=n_active,
            time_spawn=0.0,
            time_calc_state=t.elapsed / max(n_steps, 1),
        )

    def _grow_table(self, n_lost: int) -> None:
        """Grid backend: grow the per-cell table K and re-bin.

        Called preemptively (n_lost == 0) when peak demand reaches K-1 —
        no agent has been dropped — or reactively when a cell actually
        overflowed (the dropped agents from that step are counted)."""
        old_k = self.options.table_capacity
        flat = self._to_flat_state()
        self.options = dataclasses.replace(
            self.options, table_capacity=old_k + max(4, old_k // 2)
        )
        if n_lost:
            log.warning(
                "step %d: %d agents dropped from full cells; growing "
                "table_capacity %d -> %d",
                self.step_count, n_lost, old_k, self.options.table_capacity,
            )
        else:
            log.info(
                "step %d: peak cell demand reached %d; growing "
                "table_capacity %d -> %d preemptively (drop-free)",
                self.step_count, old_k - 1, old_k, self.options.table_capacity,
            )
        self._build(self.cfg.capacity)
        self.state = self._from_flat_state(flat)

    def _grow_movers(self) -> None:
        """Grow the incremental rebin's per-cell mover table (capped at
        K) and re-jit — purely a fast-path-retention move; overflowing
        the mover table only costs a full-rebin step, never an agent."""
        old_mk = self.options.mover_capacity
        new_mk = min(old_mk + max(2, old_mk // 2),
                     self.options.table_capacity)
        if new_mk == old_mk:
            return
        flat = self._to_flat_state()
        self.options = dataclasses.replace(
            self.options, mover_capacity=new_mk)
        log.info(
            "step %d: peak mover demand reached %d; growing mover table "
            "%d -> %d (fast-path retention)",
            self.step_count, old_mk - 1, old_mk, new_mk)
        self._build(self.cfg.capacity)
        self.state = self._from_flat_state(flat)

    def measure_kernel_time(self, n: int = 10) -> float | None:
        """Device-side execution time (seconds/step) of the two Pallas
        kernels alone — the ``time_calc_state_kernel`` diagnostic slot
        (the reference measured this and threw it away,
        sfm_gpu.rs:229-236).  Chains the kernels-only step n times from
        the current state and fences on a scalar fetch (the only
        trustworthy sync on tunneled backends).  Grid backend,
        single-device only; returns None elsewhere."""
        if self.options.backend != "grid" or self._tcfg is not None:
            return None
        from .models import sfm_grid

        if getattr(self, "_kernel_chain", None) is None:
            self._kernel_chain = jax.jit(sfm_grid.make_kernel_chain(
                self.cfg, self.maps, row_block=self.options.row_block,
                incremental=self._resolve_incremental(),
                mover_k=self.options.mover_capacity,
                wp_skip=self.options.wp_skip))
        d = self._kernel_chain(self.state.d, self._field_rows,
                               self._obstacles)  # warm + drain the queue
        float(d[0, 0, 0, 0])
        with Timer() as t:
            for _ in range(n):
                d = self._kernel_chain(d, self._field_rows, self._obstacles)
            float(d[0, 0, 0, 0])
        return t.elapsed / n

    def measure_spawn_time(self, n: int = 10) -> float | None:
        """Device-side execution time (seconds) of the spawn scatter alone
        — the ``time_spawn`` diagnostic slot.  The reference times its
        host-side spawn loop every step (lib.rs:68-74, diagnostic.rs:45);
        our spawn is fused into the device step, so this isolates it the
        same way :meth:`measure_kernel_time` isolates the kernels: jit the
        spawn-only chain from the current state and fence on a scalar
        fetch.  Grid backend, single-device only; returns None elsewhere,
        0.0 when the scenario has no spawn sources."""
        if self.options.backend != "grid" or self._tcfg is not None:
            return None
        if self.cfg.spawn.total == 0:
            return 0.0
        from .models import sfm_grid

        if getattr(self, "_spawn_chain", None) is None:
            def _chain(d, key):
                for i in range(4):  # amortize the scalar-fetch fence
                    d, _, _ = sfm_grid.spawn_scatter(
                        self.cfg, d, jax.random.fold_in(key, i),
                        row_lo=0, n_rows=d.shape[0] - 2)
                return d
            self._spawn_chain = jax.jit(_chain)
        d = self._spawn_chain(self.state.d, self.state.key)  # warm + drain
        float(d[0, 0, 0, 0])
        with Timer() as t:
            for _ in range(n):
                d = self._spawn_chain(d, self.state.key)
            float(d[0, 0, 0, 0])
        return t.elapsed / (4 * n)

    def _to_flat_state(self):
        """The state as flat agent arrays (SimState) regardless of backend
        or device count — the checkpoint/render/diagnostic exchange
        format."""
        if self.options.backend == "grid":
            from .models import sfm_grid

            if self._tcfg is not None:
                from .parallel import tile2d

                return tile2d.unbin_sharded(self._tcfg, self.state)
            return sfm_grid.unbin_state(self.cfg, self.state,
                                        row_block=self.options.row_block)
        return self.state

    def _from_flat_state(self, state):
        """Inverse of :meth:`_to_flat_state` for the current backend —
        checkpoints restore across backends AND device counts."""
        if self.options.backend == "grid":
            from .models import sfm_grid

            if self._tcfg is not None:
                from .parallel import tile2d

                return tile2d.make_sharded_grid_state(
                    self._tcfg, self._mesh, state)
            return sfm_grid.bin_state(self.cfg, state,
                                      row_block=self.options.row_block)
        return state

    def _flat_agents(self):
        return self._to_flat_state().agents

    def list_pedestrians(self) -> tuple[np.ndarray, np.ndarray]:
        """Positions [n, 2] and destinations [n] of active agents
        (models/mod.rs:29-32 exchange struct analog)."""
        a = self._flat_agents()
        active = np.asarray(a.active)
        return np.asarray(a.pos)[active], np.asarray(a.dest)[active]

    @property
    def pedestrian_count(self) -> int:
        return int(np.asarray(self._flat_agents().active).sum())

    def new_log(self, scenario_name: str = "") -> DiagnosticLog:
        lg = DiagnosticLog(model=f"sfm-tpu/{self.options.backend}", scenario=scenario_name)
        lg.time_calc_field = self.time_calc_field
        return lg
