#!/usr/bin/env python
"""Measure the cost of the multi-chip tiling machinery itself on one chip.

Arm A = the plain single-chip grid step (bench.py's headline path).
Arm B = the SAME problem through parallel/tile2d.py on a 1x1 device mesh:
shard_map, ghost-carrying slab layout, offset scalars into the kernels,
psum'd metrics — everything the R x C path runs except the ppermute
exchanges (no-ops at 1x1 by construction).

If B ~= A, the sharded step's fixed costs are zero and multi-chip scaling
is pure ghost-exchange + ICI — the claim docs/multihost.md and PLAN.md
make when they call multi-chip "where this framework already lives".

Alternating timing windows so tunnel drift hits both arms equally.

Usage: python scripts/ab_tile_overhead.py [--agents 1000000]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    import jax

    from bench import build, build_problem
    from pedoni_tpu.parallel.tile2d import (
        Tile2DConfig,
        device_inputs_on_mesh,
        make_mesh,
        make_sharded_grid_state,
        make_sharded_step,
    )

    # Arm A: plain grid step on the bench problem.
    step_a, state_a, cfg = build(args.agents, 2.5, 0, "grid", 14, 16384, 2)

    # Arm B: same problem, 1x1 tile mesh.
    _scn, maps, cfg_b, flat = build_problem(
        args.agents, 2.5, 0, "grid", 14, 16384)
    tcfg = Tile2DConfig.build(cfg_b, 1, 1)
    mesh = make_mesh(tcfg)
    wp, obs = device_inputs_on_mesh(tcfg, mesh, maps)
    gs = make_sharded_grid_state(tcfg, mesh, flat)
    raw_b = jax.jit(make_sharded_step(tcfg, mesh))

    def step_b(s):
        return raw_b(s, wp, obs)

    arms = []
    for name, step, state in (("grid 1-chip", step_a, state_a),
                              ("tile2d 1x1 ", step_b, gs)):
        for _ in range(5):  # compile + settle into steady state
            state, m = step(state)
        n = int(m.n_active)
        print(f"{name}: built, active={n}")
        arms.append((name, step, state))

    best = {name: float("inf") for name, *_ in arms}
    for w in range(args.windows):
        for name, step, state in arms:
            s = state
            for _ in range(3):
                s, m = step(s)
            int(m.n_active)  # hard sync (block_until_ready lies on the tunnel)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                s, m = step(s)
            int(m.n_active)
            ms = (time.perf_counter() - t0) / args.steps * 1000
            best[name] = min(best[name], ms)
            print(f"  w{w} {name}: {ms:7.2f} ms/step")
    print("best of windows:")
    for name, *_ in arms:
        print(f"  {name}: {best[name]:7.2f} ms/step")
    a, b = (best[n] for n, *_ in arms)
    print(f"tile2d 1x1 overhead vs plain grid: {(b / a - 1) * 100:+.1f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
