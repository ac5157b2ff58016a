#!/usr/bin/env python
"""A/B the incremental (hole-preserving) rebin on hardware at bench shape.

Two arms over the kernels-only chain, alternating timing windows so
tunnel drift hits both arms (the only trustworthy comparison through the
shared axon tunnel, PLAN.md):

  full         round-3 step: fused kernel + full compacting rebin
               (9*jmax one-hot MACs per block, jmax ~ K at bench density)
  incremental  round-4 step: fused kernel with emit_movers (stay mask +
               compacted per-cell mover table) + rebin_incremental
               (stayers keep slots; 9*mmax mover-only walk, mmax ~ 5)

Also times each arm's rebin in isolation (k1 fixed) by differencing a
kernel1-only chain, mirroring PLAN.md's round-2 decomposition method.
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
    ap.add_argument("--density", type=float, default=2.5,
                    help="agents per m^2 (VERDICT round-4 ask #5: the "
                         "compact_every default must not be a "
                         "bench-density overfit — sweep 0.5/1.0/2.5/5.0; "
                         "size --table-capacity ~4x density at 1.5 m "
                         "cells so crush densities don't overflow)")
    ap.add_argument("--table-capacity", type=int, default=14)
    ap.add_argument("--warmup", type=int, default=16,
                    help="settling steps before timing (the occupancy "
                         "bound decays over ~15 compacting steps)")
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--mover-k", type=int, default=8)
    ap.add_argument("--cadence", type=int, nargs="+", default=[4],
                    help="compact_every values to time as hybrid arms "
                         "(the occupancy bound only re-lowers on "
                         "compaction steps; longer cadences amortize the "
                         "full rebin further but ride a staler bound)")
    ap.add_argument("--decompose", action="store_true",
                    help="add a k1mv+full arm + jmax-drift traces + "
                         "mover-demand probe")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build
    from pedoni_tpu.field import Field, FieldMaps
    from pedoni_tpu.models import sfm_grid, sfm_pallas

    step, state, cfg = build(args.agents, args.density, 0, "grid",
                             args.table_capacity, 16384, 2)
    for _ in range(args.warmup):  # settle into steady state
        state, _m = step(state)
    float(jnp.sum(state.d[0, 0, 0, :8]))

    fld = Field.from_scenario(cfg.scenario, unit=0.25)
    maps = FieldMaps.from_field(fld)
    fwp, fobs = map(jnp.asarray, sfm_pallas.pallas_device_inputs(cfg, maps, 2))

    chain_full = jax.jit(sfm_grid.make_kernel_chain(
        cfg, maps, row_block=2, incremental=False))
    chain_inc = jax.jit(sfm_grid.make_kernel_chain(
        cfg, maps, row_block=2, incremental=True, mover_k=args.mover_k))

    def hybrid(n):
        # the compact_every=n regime as one superstep: the compacting
        # rebin re-lowers the occupancy bound, then n-1 hole-preserving
        # steps ride it — ms reported per SINGLE step (cycle / n).
        # No new compiles: reuses the two jitted chains.
        def fn(d, fwp, fobs):
            d = chain_full(d, fwp, fobs)
            for _ in range(n - 1):
                d = chain_inc(d, fwp, fobs)
            return d
        return fn

    arms = [("full       ", chain_full, 1), ("incremental", chain_inc, 1)]
    for n in args.cadence:
        arms.append((f"hybrid{n:<4d}", hybrid(n), n))

    for name, fn, _m in arms:  # warm: compile + one chained run
        d = fn(state.d, fwp, fobs)
        float(jnp.sum(d[0, 0, 0, :8]))

    # sanity: every arm conserves the population from the same start
    n0 = float(jnp.sum(state.d[:, :, 6, :]))
    for name, fn, _m in arms:
        n1 = float(jnp.sum(fn(state.d, fwp, fobs)[:, :, 6, :]))
        print(f"{name}: {n0:.0f} -> {n1:.0f} active after 1 chain call")

    if args.decompose:
        # Where does the incremental arm's time go?  Three extra arms:
        #   k1mv+full   kernel 1 WITH the mover pass, but the full
        #               compacting rebin (ignores M) — isolates kernel 1's
        #               mover-pass + M-write cost (vs full), with NO hole
        #               drift (bins recompact every step).
        # plus per-step occupancy-bound traces on both end-to-end arms:
        # holes raise topcnt, and kernel 1's pair pass is O(jmax), so
        # fragmentation taxes the NEXT step's kernel 1, not the rebin.
        from pedoni_tpu.ops.pallas.rebin import rebin_kernel
        from pedoni_tpu.ops.pallas.step_kernel import fused_step_kernel
        from pedoni_tpu.models.sfm_pallas import stride_for, debug_segments

        stride = stride_for(cfg)
        dims = sfm_grid.GridDims.build(cfg, 2)
        k, rb, ny_pad = dims.k, dims.rb, dims.ny_pad
        nb = ny_pad // rb

        def chain_mv_full(d, fwp, fobs):
            jmax = sfm_grid.occupancy_bound(d, rb, nb, k)
            g, m, movf, mdmx = fused_step_kernel(
                d, fwp, fobs, cfg.physics, cfg.scenario.size,
                row_block=rb, interpret=False, jmax=jmax, stride=stride,
                field_unit=cfg.field_unit, segments=debug_segments(cfg),
                emit_movers=args.mover_k)
            d2, _ovf, _dmx = rebin_kernel(
                g, cfg.grid.unit, cfg.grid.nx, cfg.grid.ny,
                row_block=rb, interpret=False, jmax=jmax)
            return d2
        arms.append(("k1mv+full  ", jax.jit(chain_mv_full), 1))
        d = arms[-1][1](state.d, fwp, fobs)
        float(jnp.sum(d[0, 0, 0, :8]))

        bound = jax.jit(lambda d: jnp.mean(
            sfm_grid.occupancy_bound(d, rb, nb, k).astype(jnp.float32)))
        for name, fn in (("full       ", chain_full),
                         ("incremental", chain_inc)):
            d = state.d
            trace = [float(bound(d))]
            for _ in range(args.steps):
                d = fn(d, fwp, fobs)
                trace.append(float(bound(d)))
            print(f"  jmax trace {name}: "
                  + " ".join(f"{b:.1f}" for b in trace))
        # peak mover demand at bench density (mover-table sizing)
        def _probe(d, fwp, fobs):
            jmax = sfm_grid.occupancy_bound(d, rb, nb, k)
            _g, _m, movf, mdmx = fused_step_kernel(
                d, fwp, fobs, cfg.physics, cfg.scenario.size,
                row_block=rb, jmax=jmax, stride=stride,
                field_unit=cfg.field_unit, segments=debug_segments(cfg),
                emit_movers=args.mover_k)
            return jnp.max(mdmx), jnp.sum(movf)
        dmx, ovf = jax.jit(_probe)(state.d, fwp, fobs)
        print(f"  mover demand max {float(dmx):.0f}, "
              f"table overflow {float(ovf):.0f}")

    best = {name: float("inf") for name, _, _m in arms}
    for w in range(args.windows):
        for name, fn, mult in arms:
            d = state.d
            for _ in range(3):
                d = fn(d, fwp, fobs)
            float(jnp.sum(d[0, 0, 0, :8]))
            t0 = time.perf_counter()
            calls = max(1, args.steps // mult)
            for _ in range(calls):
                d = fn(d, fwp, fobs)
            float(jnp.sum(d[0, 0, 0, :8]))
            ms = (time.perf_counter() - t0) / (calls * mult) * 1000
            best[name] = min(best[name], ms)
            print(f"  w{w} {name}: {ms:7.2f} ms/step")
    print("best of windows:")
    for name, _, _m in arms:
        thr = args.agents / (best[name] / 1000) / 1e6
        print(f"  {name}: {best[name]:7.2f} ms/step = {thr:.1f}M agent-steps/s")
    print(f"incremental win: {best['full       '] / best['incremental']:.3f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
