#!/usr/bin/env python
"""n_wp sensitivity curve + waypoint-plane-skip A/B on hardware.

VERDICT round 3 called the single-waypoint headline "the friendliest
possible plane count" for a kernel that samples EVERY plane per block
(weak #3) and the linear-in-n_wp sampling an asymptotic regression vs
the reference's O(1) maps-per-agent (missing #2, sfm.rs:107,
field.rs:235-239).  This script publishes the curve: for each W it
times the full grid step at 1M agents with the per-block waypoint-plane
skip ON vs OFF, alternating timing windows so shared-tunnel drift hits
both arms (PLAN.md methodology).

The workload is bench.py --waypoints W: W band exits along the goal
edge, nearest-exit destination assignment (evacuation.toml's shape).
Expected: OFF grows ~linearly in W, ON stays near the W=1 line (each
row-slab block wants 1-2 planes).  VMEM bounds W at full lane width
(the plane buffer is resident per plane): W=16 runs at --domain tiles:4.
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
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--wp", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build
    from pedoni_tpu.ops.pallas.step_kernel import waypoint_block_mask

    results = {}
    wanted = {}
    for w in args.wp:
        arms = []
        for skip in ((True,) if w == 1 else (False, True)):
            # tiles:4 above W=8: the resident per-plane VMEM slab bounds
            # W at full 1024-lane width (supports() enforces it)
            domain = "auto" if w <= 8 else "tiles:4"
            step, state, cfg = build(args.agents, 2.5, 0, "grid", 14,
                                     16384, 2, domain, w, skip)
            for _ in range(3):
                state, m = step(state)
            print(f"  W={w} skip={skip}: warm, active={int(m.n_active)}",
                  flush=True)
            if skip and w > 1:
                # Attribution diagnostic: how many planes does each block
                # actually WANT after warmup?  If the skip-on ms growth vs
                # W=1 tracks this mean, the gate achieves its design and
                # the residual slope is physics (band-boundary mixing),
                # not gate overhead.
                mask = waypoint_block_mask(state.d, 2, w)
                pops = jax.lax.population_count(mask).sum(axis=1)
                wanted[w] = (float(jnp.mean(pops)), int(jnp.max(pops)))
                print(f"  W={w}: wanted planes/block mean "
                      f"{wanted[w][0]:.2f} max {wanted[w][1]}", flush=True)
            arms.append((skip, step, state))

        best = {skip: float("inf") for skip, _, _ in arms}
        for wd in range(args.windows):
            for skip, step, state in arms:
                s = state
                for _ in range(2):
                    s, m = step(s)
                int(m.n_active)
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    s, m = step(s)
                int(m.n_active)  # hard sync (tunnel-safe fence)
                ms = (time.perf_counter() - t0) / args.steps * 1000
                best[skip] = min(best[skip], ms)
        if w == 1:
            results[w] = (best[True], best[True])
            print(f"W={w:3d}: {best[True]:7.2f} ms/step (skip statically "
                  "off at one plane)", flush=True)
        else:
            results[w] = (best[False], best[True])
            print(f"W={w:3d}: off {best[False]:7.2f} ms/step, "
                  f"on {best[True]:7.2f} ms/step, "
                  f"skip win {best[False] / best[True]:.3f}x", flush=True)

    print("\nn_wp curve (ms/step at 1M agents):")
    print("  W    skip-off  skip-on   vs W=1(on)  wanted/block")
    base = results[args.wp[0]][1]
    for w, (off, on) in results.items():
        wn = (f"{wanted[w][0]:.2f} (max {wanted[w][1]})"
              if w in wanted else "1 (static)")
        print(f"  {w:3d}  {off:8.2f}  {on:8.2f}   {on / base:.2f}x"
              f"   {wn}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
