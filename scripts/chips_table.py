#!/usr/bin/env python
"""Measured chips-needed table for the 1e9 agent-steps/s target.

VERDICT round-4 ask #2: replace the "~4-chip scaling claim" prose with
arithmetic a reader can recompute from measured numbers.  This measures,
on the one real chip, the per-chip step time of the TILED step (tile2d
on a 1x1 mesh — all the sharding machinery, shard_map, offset scalars,
psum'd metrics; the ppermute ghost exchanges are no-ops at 1x1 and are
the ONLY unmeasured term) at per-chip populations 1M, 250k, 125k, 62.5k
— i.e. what each chip holds when a 1M-agent problem is strong-scaled
over N = 1/4/8/16 chips, and what each chip holds under weak scaling
(1M/chip) at any N.

Prints a markdown table of:
  strong scaling, 1M total:  aggregate = 1M / ms(1M/N per chip)
  weak scaling, 1M/chip:     aggregate(N) = N * 1M / ms(1M)
  chips to 1e9 (weak):       ceil(1e9 * ms(1M) / 1M / 1000)
and the same at ROOFLINE's single-chip speed of light (~330M/s/chip).
The ghost-exchange term is bounded, not measured (no second chip here):
~2 ghost rows+cols of state+mover slabs ≈ 3 MB/chip/step, < 0.1 ms at
ICI bandwidths — quoted next to the table, not silently included.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def measure_tiled(n_agents: int, steps: int, windows: int) -> float:
    import jax

    from bench import build_problem
    from pedoni_tpu.parallel.tile2d import (
        Tile2DConfig,
        device_inputs_on_mesh,
        make_mesh,
        make_sharded_grid_state,
        make_sharded_step,
    )

    _scn, maps, cfg, flat = build_problem(n_agents, 2.5, 0, "grid", 14, 16384)
    tcfg = Tile2DConfig.build(cfg, 1, 1)
    mesh = make_mesh(tcfg)
    wp, obs = device_inputs_on_mesh(tcfg, mesh, maps)
    gs = make_sharded_grid_state(tcfg, mesh, flat)
    step = jax.jit(make_sharded_step(tcfg, mesh))
    for _ in range(16):  # settle the occupancy bound
        gs, m = step(gs, wp, obs)
    int(m.n_active)
    best = float("inf")
    for _ in range(windows):
        s = gs
        t0 = time.perf_counter()
        for _ in range(steps):
            s, m = step(s, wp, obs)
        int(m.n_active)  # hard sync
        best = min(best, (time.perf_counter() - t0) / steps * 1000)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--total", type=int, default=1_000_000)
    ap.add_argument("--chips", type=int, nargs="+", default=[1, 4, 8, 16])
    args = ap.parse_args()

    ms = {}
    for n in args.chips:
        per_chip = args.total // n
        ms[n] = measure_tiled(per_chip, args.steps, args.windows)
        rate = per_chip / ms[n] * 1e3 / 1e6  # agents/ms -> M agent-steps/s
        print(f"# per-chip {per_chip}: {ms[n]:.2f} ms/step "
              f"= {rate:.1f}M agent-steps/s/chip", flush=True)

    sol_ms_1m = args.total / 330e6 * 1000  # ROOFLINE speed of light
    print("\n| N chips | per-chip agents | ms/step (tiled, measured) | "
          "strong agg (1M total) | weak agg (1M/chip) |")
    print("|---|---|---|---|---|")
    for n in args.chips:
        per_chip = args.total // n
        strong = args.total / ms[n] * 1e3 / 1e6  # M/s
        weak = n * args.total / ms[1] * 1e3 / 1e6
        print(f"| {n} | {per_chip} | {ms[n]:.2f} | {strong:.0f}M/s | "
              f"{weak:.0f}M/s |")
    chips_now = 1e9 * ms[1] / 1000 / args.total
    chips_sol = 1e9 * sol_ms_1m / 1000 / args.total
    print(f"\nchips to 1e9 agent-steps/s, weak scaling at 1M/chip: "
          f"ceil({chips_now:.1f}) = {int(-(-chips_now // 1))} at today's "
          f"measured rate; {chips_sol:.1f} at ROOFLINE's ~330M/s "
          "single-chip speed of light.")
    print("unmeasured term: ppermute ghost exchange (~3 MB/chip/step, "
          "< 0.1 ms at ICI bandwidths; no second chip in this "
          "environment to measure it).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
