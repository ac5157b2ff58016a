#!/usr/bin/env python
"""Attribute the full-step vs kernels-only gap ("XLA glue") in ONE process.

ROOFLINE.md books ~0.5 ms/step of glue (occupancy bound, waypoint mask,
metric reductions, the cadence lax.cond, PRNG split) — but that number
was a CROSS-RUN difference (kernels-only cadence sweep vs a separate
bench capture), which is within shared-tunnel drift (±5-10%).  This A/B
alternates both arms inside one process so drift hits them equally:

  fullstep  bench.build's grid step (hybrid rebin, metrics every step,
            fetched only at the window fence)
  kernels   the same hybrid-8 regime as bare kernel chains
            (1 x compacting + 7 x hole-preserving per supercycle; no
            metrics, no cond, no PRNG, occupancy bound still computed —
            it feeds the kernels)

glue = fullstep - kernels.  If it is <~0.2 ms, fusing the metric
reductions into the kernels' SMEM scalar outputs is not worth the
signature churn; if >=0.3 ms, it is the next cut (per-block active-sum
outputs already have a plumbing precedent: movf/mdmx).
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
    ap.add_argument("--steps", type=int, default=16,
                    help="steps per timing window (multiple of 8 so the "
                         "hybrid supercycle divides it)")
    ap.add_argument("--windows", type=int, default=4)
    args = ap.parse_args()
    assert args.steps % 8 == 0

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build
    from pedoni_tpu.field import Field, FieldMaps
    from pedoni_tpu.models import sfm_grid, sfm_pallas

    step, state, cfg = build(args.agents, 2.5, 0, "grid", 14, 16384, 2)
    # settle the occupancy bound (same rationale as bench --warmup 16)
    for _ in range(16):
        state, m = step(state)
    int(m.n_active)

    fld = Field.from_scenario(cfg.scenario, unit=0.25)
    maps = FieldMaps.from_field(fld)
    fwp, fobs = map(jnp.asarray,
                    sfm_pallas.pallas_device_inputs(cfg, maps, 2))

    chain_full = jax.jit(sfm_grid.make_kernel_chain(
        cfg, maps, row_block=2, incremental=False))
    chain_inc = jax.jit(sfm_grid.make_kernel_chain(
        cfg, maps, row_block=2, incremental=True))

    def kernels8(d):
        d = chain_full(d, fwp, fobs)
        for _ in range(7):
            d = chain_inc(d, fwp, fobs)
        return d

    # warm both arms
    d = kernels8(state.d)
    float(jnp.sum(d[0, 0, 0, :8]))
    s, m = step(state)
    int(m.n_active)

    best = {"fullstep": float("inf"), "kernels ": float("inf")}
    for w in range(args.windows):
        s = state
        for _ in range(2):
            s, m = step(s)
        int(m.n_active)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            s, m = step(s)
        int(m.n_active)
        ms = (time.perf_counter() - t0) / args.steps * 1000
        best["fullstep"] = min(best["fullstep"], ms)
        print(f"  w{w} fullstep: {ms:7.2f} ms/step", flush=True)

        d = state.d
        d = kernels8(d)
        float(jnp.sum(d[0, 0, 0, :8]))
        t0 = time.perf_counter()
        for _ in range(args.steps // 8):
            d = kernels8(d)
        float(jnp.sum(d[0, 0, 0, :8]))
        ms = (time.perf_counter() - t0) / args.steps * 1000
        best["kernels "] = min(best["kernels "], ms)
        print(f"  w{w} kernels : {ms:7.2f} ms/step", flush=True)

    print("best of windows:")
    for name, ms in best.items():
        print(f"  {name}: {ms:7.2f} ms/step")
    glue = best["fullstep"] - best["kernels "]
    print(f"glue = {glue:+.2f} ms/step "
          f"({100 * glue / best['fullstep']:.1f}% of the full step)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
