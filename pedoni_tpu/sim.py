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

import jax
import numpy as np

from .diagnostics import DiagnosticLog, StepRecord
from .field import Field, FieldMaps
from .models.sfm import SimState, StepConfig, device_inputs, make_initial_state, make_step
from .physics import Physics
from .scenario import Scenario
from .utils.timing import Timer

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class SimulatorOptions:
    """Counterpart of lib.rs:109-135 with the same defaults."""

    backend: str = "xla"  # "xla" | "pallas" (force-pass implementation)
    neighbor_grid_unit: float = 1.4
    field_grid_unit: float = 0.25
    use_neighbor_grid: bool = True
    use_distance_map: bool = True
    table_capacity: int = 16
    chunk_size: int = 2048
    capacity: int = 0  # 0 = auto-size from the scenario
    seed: int = 0
    physics: Physics = Physics()


class Simulator:
    def __init__(self, options: SimulatorOptions, scenario: Scenario) -> None:
        if options.backend == "pallas" and options.neighbor_grid_unit == 1.4:
            # The fused kernel's stride-6 field layout needs 1.5 m cells;
            # auto-switch when the unit was left at the reference default.
            options = dataclasses.replace(options, neighbor_grid_unit=1.5)
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

        capacity = options.capacity or self._auto_capacity(scenario)
        self._build(capacity)
        self.state: SimState = make_initial_state(self.cfg, seed=options.seed)
        self.step_count = 0

    @staticmethod
    def _auto_capacity(scenario: Scenario) -> int:
        n_once = sum(g.spawn.count for g in scenario.once_groups)
        rate = sum(g.spawn.frequency for g in scenario.periodic_groups)
        estimate = int(n_once * 1.25 + rate * 60 + 1024)
        cap = 1024
        while cap < estimate:
            cap *= 2
        return cap

    def _build(self, capacity: int) -> None:
        o = self.options
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
        if o.backend == "pallas":
            from .models import sfm_pallas

            if not sfm_pallas.supports(self.cfg):
                raise ValueError(
                    "pallas backend requires neighbor_grid_unit=1.5, "
                    "field_grid_unit=0.25 and <= 8 waypoints; "
                    "use backend='xla' for this scenario"
                )
            fwp, fobs = sfm_pallas.pallas_device_inputs(self.cfg, self.maps)
            self._field_rows = fwp  # first step arg
            self._obstacles = fobs  # second step arg
            self._step = jax.jit(sfm_pallas.make_step_pallas(self.cfg, self.maps))
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
            self.state, metrics = self._step(self.state, self._field_rows, self._obstacles)
            n_active = int(metrics.n_active)  # device sync
        self.step_count += 1

        n_dropped = int(metrics.n_dropped)
        if n_dropped > 0:
            log.warning("step %d: %d agents dropped at capacity", self.step_count, n_dropped)
        if n_active > 0.8 * self.cfg.capacity:
            self._grow()

        return StepRecord(
            active_ped_count=n_active,
            time_spawn=0.0,
            time_calc_state=t.elapsed,
        )

    def run(self, n_steps: int, sync_every: int = 0) -> StepRecord:
        """Advance ``n_steps`` without per-step host syncs (throughput
        mode): metrics stay on device and only the final step's record is
        fetched.  ``sync_every`` > 0 adds periodic syncs to bound the
        dispatch queue.  Capacity growth is NOT monitored here — size the
        capacity up front (the n_dropped metric still reports losses)."""
        metrics = None
        with Timer() as t:
            for i in range(n_steps):
                self.state, metrics = self._step(
                    self.state, self._field_rows, self._obstacles
                )
                if sync_every and (i + 1) % sync_every == 0:
                    jax.block_until_ready(self.state)
            n_active = int(metrics.n_active)
        self.step_count += n_steps
        return StepRecord(
            active_ped_count=n_active,
            time_spawn=0.0,
            time_calc_state=t.elapsed / max(n_steps, 1),
        )

    def list_pedestrians(self) -> tuple[np.ndarray, np.ndarray]:
        """Positions [n, 2] and destinations [n] of active agents
        (models/mod.rs:29-32 exchange struct analog)."""
        a = self.state.agents
        active = np.asarray(a.active)
        return np.asarray(a.pos)[active], np.asarray(a.dest)[active]

    @property
    def pedestrian_count(self) -> int:
        return int(np.asarray(self.state.agents.active).sum())

    def new_log(self, scenario_name: str = "") -> DiagnosticLog:
        lg = DiagnosticLog(model=f"sfm-tpu/{self.options.backend}", scenario=scenario_name)
        lg.time_calc_field = self.time_calc_field
        return lg
