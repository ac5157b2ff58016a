#!/usr/bin/env python
"""Post-compaction occupancy statistics + A/B for the pair-pass slot split.

VERDICT round-4 ask #1: the round-3 slot-split rejection ("per-block
bounds sit at ~K for every block at bench density") was measured BEFORE
the hybrid rebin's compaction settled the occupancy bound from ~13.9 to
~9.7.  SFM repulsion makes the settled occupancy strongly SUB-Poisson
(a Poisson(5.625) grid of 90k cells would have thousands of cells >= 10;
the measured settled max is ~9.7), so the question is now empirical:
what fraction of kernel blocks have a settled bound <= 8 — i.e. could
run the pair pass's center side at ONE sublane tile ([rb, 8, NXL],
measured 0.58x the wide-op cost of [rb, 16, NXL], PLAN.md round-3
narrow-op calibration) with the second tile's accumulation skipped?

--stats  run the bench workload to a settled state and print the
         per-block bound histograms: the (rb+2)-row WINDOW bound (feeds
         candidate trips) and the rb-row CENTER bound (gates the split).
--ab     alternating-window A/B of split=off vs split=on (bit-exactness
         is CI-checked by tests/test_slot_split.py).

MEASURED (2026-08-20, 1M @ 2.5/m2, 24 settled steps, K=14): window
bound mean 10.09 (hist 10:69 11:16 of 88 blocks), center bound mean
9.88, p(center > 8) = 0.966; per-cell tail P(>=10) = 1.5e-3,
P(>=12) = 0.  So the run-both-halves split (cost 0.58 * (1 + p)) LOSES
at bench density — the landed kernel uses the BRANCH form instead: a
block runs EITHER the one-tile loop (center bound <= 8, 0.58x) OR the
original unsplit loop, so the bench-density cost factor is
(1-p) * 0.58 + p = 0.99 (neutral) and sparse / low-density /
evacuation-endgame states win up to 1.7x on their pair pass.  The --ab
mode at --density 1.0 (settled bounds fit one tile nearly everywhere)
shows the win; at 2.5 it must show ~1.00x (the no-regression check).
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def settled_state(args):
    import jax

    from bench import build_problem
    from pedoni_tpu.models import sfm_grid, sfm_pallas

    _sc, maps, cfg, flat = build_problem(
        args.agents, args.density, args.seed, "grid", args.table_capacity,
        16384, "auto", args.waypoints)
    fwp, fobs = sfm_pallas.pallas_device_inputs(cfg, maps, 2)
    state = jax.jit(lambda s: sfm_grid.bin_state(cfg, s, 2))(flat)
    step = jax.jit(sfm_grid.make_step_grid(cfg, maps, 2, slot_split=False))
    for _ in range(args.warmup):
        state, m = step(state, fwp, fobs)
    print(f"# settled: {int(m.n_active)} active after {args.warmup} steps",
          file=sys.stderr)
    return maps, cfg, state, fwp, fobs


def stats(args) -> int:
    maps, cfg, state, fwp, fobs = settled_state(args)
    rb = 2
    cnt = np.asarray(state.d[:, 0, 7, :])  # [ny_pad+2, NXL] per-cell counts
    ny2 = cnt.shape[0]
    nb = (ny2 - 2) // rb
    rowmax = cnt.max(axis=-1)  # [ny_pad+2]
    win = np.stack([rowmax[off::rb][:nb] for off in range(rb + 2)]).max(axis=0)
    cen = np.stack([rowmax[off::rb][:nb] for off in range(1, rb + 1)]).max(axis=0)
    k = cfg.table_capacity
    occupied = win > 0
    print(f"# blocks={nb} occupied={int(occupied.sum())} K={k}")
    for name, b in (("window", win), ("center", cen)):
        b = b[occupied]
        hist = np.bincount(b.astype(int), minlength=k + 1)
        print(f"{name} bound: mean {b.mean():.2f} max {int(b.max())} "
              f"p(>8) {float((b > 8).mean()):.3f}")
        print(f"  hist {dict((i, int(c)) for i, c in enumerate(hist) if c)}")
    # Per-cell occupancy distribution (the underlying sub-Poisson law).
    occ = cnt[1:-1, :].ravel()
    occ = occ[occ >= 0]
    h = np.bincount(occ.astype(int), minlength=k + 1)
    tot = h.sum()
    print(f"cell occupancy: mean {occ.mean():.2f} "
          f"tail {' '.join(f'P(>={i})={h[i:].sum()/tot:.2e}' for i in (8, 9, 10, 12))}")
    return 0


def ab(args) -> int:
    import jax
    import jax.numpy as jnp

    from pedoni_tpu.models import sfm_grid

    maps, cfg, state, fwp, fobs = settled_state(args)
    arms = {
        "split_off": jax.jit(sfm_grid.make_kernel_chain(
            cfg, maps, 2, incremental=True, slot_split=False)),
        "split_on": jax.jit(sfm_grid.make_kernel_chain(
            cfg, maps, 2, incremental=True, slot_split=True)),
    }
    d0 = state.d
    for name, chain in arms.items():  # warm both
        d = chain(d0, fwp, fobs)
        float(jnp.sum(d[1, 0, 0, :8]))
    best = {name: float("inf") for name in arms}
    for w in range(args.windows):
        for name, chain in arms.items():
            d = d0
            t0 = time.perf_counter()
            for _ in range(args.steps):
                d = chain(d, fwp, fobs)
            float(jnp.sum(d[1, 0, 0, :8]))
            ms = (time.perf_counter() - t0) / args.steps * 1000
            best[name] = min(best[name], ms)
            print(f"# window {w} {name}: {ms:.2f} ms/step", file=sys.stderr)
    for name, ms in best.items():
        print(f"{name}: {ms:.3f} ms/step (best of {args.windows})")
    print(f"speedup: {best['split_off'] / best['split_on']:.3f}x")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["stats", "ab"], default="stats")
    ap.add_argument("--agents", type=int, default=1_000_000)
    ap.add_argument("--density", type=float, default=2.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--table-capacity", type=int, default=14)
    ap.add_argument("--warmup", type=int, default=24)
    ap.add_argument("--waypoints", type=int, default=1)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    return stats(args) if args.mode == "stats" else ab(args)


if __name__ == "__main__":
    raise SystemExit(main())
