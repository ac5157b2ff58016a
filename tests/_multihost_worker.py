"""Worker process for tests/test_multihost.py.

Usage: python tests/_multihost_worker.py <process_id> <num_processes> <port> [RxC]

The optional 4th argument tiles the global mesh RxC (default: row strips,
n_devices x 1).  With 2 processes x 4 devices as 4x2 tiles, the column
ghost exchange stays intra-process while the middle row exchange crosses
the process boundary — both collective axes of docs/multihost.md.

Each worker owns 4 virtual CPU devices; together the processes form one
global 2x(4*P/2... ) — concretely a (num_processes*4) x 1 row-strip mesh
via jax.distributed: the same global-mesh construction and cross-process
ppermute ghost exchange docs/multihost.md promises over DCN.  Worker 0
also runs the single-device grid step on the same initial state and
checks the sharded metrics against it step by step.

Prints one line per step:  STEP <i> n_active=<n>
and finally:               MULTIHOST OK
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = int(sys.argv[3])
    tile = sys.argv[4] if len(sys.argv) > 4 else None

    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    import jax.numpy as jnp

    from pedoni_tpu.field import Field, FieldMaps
    from pedoni_tpu.models import sfm_grid, sfm_pallas
    from pedoni_tpu.models.sfm import StepConfig, make_initial_state
    from pedoni_tpu.parallel import tile2d
    from pedoni_tpu.scenario import loads_scenario

    n_devices = len(jax.devices())
    assert n_devices == nprocs * 4, (n_devices, nprocs)

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
    state0 = make_initial_state(cfg, seed=0)

    # Sharded path over the GLOBAL (cross-process) mesh.
    if tile:
        rows, cols = (int(x) for x in tile.split("x"))
        assert rows * cols == n_devices, (tile, n_devices)
    else:
        rows, cols = n_devices, 1  # row strips
    tcfg = tile2d.Tile2DConfig.build(cfg, rows, cols)
    mesh = tile2d.make_mesh(tcfg)  # jax.devices() = global device list
    wp, obs = tile2d.device_inputs_on_mesh(tcfg, mesh, maps)
    gs = tile2d.make_sharded_grid_state(tcfg, mesh, state0)
    step = jax.jit(tile2d.make_sharded_step(tcfg, mesh))

    # AOT-compile, then rendezvous at the coordinator barrier BEFORE the
    # first execution: gloo gives the peer only 30 s to show up at the
    # first collective's context init, but on this 1-core host the two
    # ranks' compiles (when the persistent cache misses) finish with a
    # measured ~50 s skew — one rank was timing out while the other was
    # still compiling.  Compiling first and meeting at the coordinator
    # barrier (which has no such deadline) makes the ranks reach the
    # gloo rendezvous together.  Real multi-host deployments want the
    # same discipline when compile times differ across hosts
    # (docs/multihost.md).
    step.lower(gs, wp, obs).compile()
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(
        "sharded_step_compiled", timeout_in_ms=1_200_000)

    # Single-device reference (worker 0 only): same physics, same spawn
    # stream -> metrics must match the sharded run exactly.
    if pid == 0:
        fwp1, fobs1 = map(jnp.asarray,
                          sfm_pallas.pallas_device_inputs(cfg, maps))
        sstep = jax.jit(sfm_grid.make_step_grid(cfg, maps))
        sgs = sfm_grid.bin_state(cfg, state0)

    for i in range(3):
        gs, metrics = step(gs, wp, obs)
        # Lockstep: single-core hosts starve the collective rendezvous
        # under deep dispatch queues (CLAUDE.md) — sync every step.
        jax.block_until_ready(gs.d)
        n = int(metrics.n_active)
        print(f"STEP {i} n_active={n}", flush=True)
        if pid == 0:
            sgs, sm = sstep(sgs, fwp1, fobs1)
            ns = int(sm.n_active)
            if ns != n:
                print(f"MISMATCH step {i}: sharded {n} vs single {ns}",
                      flush=True)
                return 1

    total = float(jnp.sum(gs.d[:, :, 6, :]))  # global reduce -> replicated
    assert total > 0, "no active agents after 3 steps"
    print("MULTIHOST OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
