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
    ap.add_argument("--decompose", action="store_true",
                    help="add a third arm per W: the gated machinery with "
                         "the mask FORCED all-ones (every block samples "
                         "every plane, like skip-off, but through the "
                         "scratch-accumulate + per-plane-branch path).  "
                         "all - off = pure gating overhead; off - on = "
                         "net skip win; on - all + (off - on)... i.e. the "
                         "W=2 constant (VERDICT round-4 ask #3) splits "
                         "into gate overhead (all-off) vs physics "
                         "(on - W1_on - gate overhead).")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build, build_problem
    from pedoni_tpu.ops.pallas.step_kernel import waypoint_block_mask

    def build_forced(w, domain):
        # The "all" attribution arm: bench problem through make_step_grid
        # with wp_force_all (mirrors bench.build's grid branch).
        from pedoni_tpu.models import sfm_grid, sfm_pallas

        _s, maps, cfg, flat = build_problem(args.agents, 2.5, 0, "grid",
                                            14, 16384, domain, w)
        fwp, fobs = sfm_pallas.pallas_device_inputs(cfg, maps, 2)
        state = jax.jit(lambda s: sfm_grid.bin_state(cfg, s, 2))(flat)
        raw = jax.jit(sfm_grid.make_step_grid(cfg, maps, 2,
                                              wp_force_all=True))
        return (lambda s: raw(s, fwp, fobs)), state

    results = {}
    wanted = {}
    for w in args.wp:
        arms = []
        modes = (("on",) if w == 1
                 else ("off", "on", "all") if args.decompose
                 else ("off", "on"))
        for mode in modes:
            skip = mode != "off"
            # The slot walk bounds resident slabs at wp_slots, so gated
            # arms run ANY W at full lane width; only the ungated OFF
            # arm still needs all planes resident (tiles:4 above W=8).
            domain = "auto" if (skip or w <= 8) else "tiles:4"
            if mode == "all":
                step, state = build_forced(w, domain)
            else:
                step, state, cfg = build(args.agents, 2.5, 0, "grid", 14,
                                         16384, 2, domain, w, skip)
            for _ in range(3):
                state, m = step(state)
            print(f"  W={w} {mode}: warm, active={int(m.n_active)}",
                  flush=True)
            if mode == "on" and w > 1:
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
            arms.append((mode, step, state))

        best = {mode: float("inf") for mode, _, _ in arms}
        for wd in range(args.windows):
            for mode, step, state in arms:
                s = state
                for _ in range(2):
                    s, m = step(s)
                int(m.n_active)
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    s, m = step(s)
                int(m.n_active)  # hard sync (tunnel-safe fence)
                ms = (time.perf_counter() - t0) / args.steps * 1000
                best[mode] = min(best[mode], ms)
        if w == 1:
            results[w] = (best["on"], best["on"], None)
            print(f"W={w:3d}: {best['on']:7.2f} ms/step (skip statically "
                  "off at one plane)", flush=True)
        else:
            results[w] = (best["off"], best["on"], best.get("all"))
            extra = (f", all-wanted {best['all']:7.2f}"
                     if "all" in best else "")
            print(f"W={w:3d}: off {best['off']:7.2f} ms/step, "
                  f"on {best['on']:7.2f} ms/step{extra}, "
                  f"skip win {best['off'] / best['on']:.3f}x", flush=True)

    print("\nn_wp curve (ms/step at 1M agents):")
    print("  W    skip-off  skip-on   all-wanted  vs W=1(on)  wanted/block")
    base = results[args.wp[0]][1]
    for w, (off, on, allw) in results.items():
        wn = (f"{wanted[w][0]:.2f} (max {wanted[w][1]})"
              if w in wanted else "1 (static)")
        aw = f"{allw:8.2f}" if allw is not None else "       -"
        print(f"  {w:3d}  {off:8.2f}  {on:8.2f}  {aw}   {on / base:.2f}x"
              f"   {wn}")
    if args.decompose:
        print("\nattribution (W>1): gate overhead = all - off; "
              "sampling saved by gating = all - on; "
              "physics slope = on - W1 - (all - off).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
