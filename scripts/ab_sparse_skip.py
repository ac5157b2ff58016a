#!/usr/bin/env python
"""A/B the empty-block skip (ops/pallas/{step_kernel,rebin}.py) on
hardware.

Three arms over the kernels-only chain (k1 + rebin + per-step occupancy
bound), alternating timing windows so tunnel drift hits all arms:

  dense       bench-density state — every block occupied, the skip never
              fires; measures the gating overhead (jmax SMEM reads +
              pl.when branches per block) against the quoted headline.
  sparse      same field geometry, agents only in the first 1/8 of cell
              rows — 7/8 of blocks have empty windows and take the skip
              (no window/field DMA, no sampling/force body).
  sparse-ns   the same sparse state with the bound clamped to >= 1, so
              every block computes (9 candidate trips on empty data +
              the full DMA + sampling body) — approximates the pre-skip
              kernel within ~9 trips/block of pair math.

The sparse arms carry 1/8 of the agents; per-STEP time is what the skip
changes (evacuation endgames, localized crowds in large domains).
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
    import jax.numpy as jnp

    from bench import build
    from pedoni_tpu.field import Field, FieldMaps
    from pedoni_tpu.models import sfm_grid, sfm_pallas
    from pedoni_tpu.models.sfm_grid import occupancy_bound
    from pedoni_tpu.ops.pallas.rebin import rebin_kernel
    from pedoni_tpu.ops.pallas.step_kernel import fused_step_kernel

    step, state, cfg = build(args.agents, 2.5, 0, "grid", 14, 16384, 2)
    for _ in range(5):  # settle into steady state
        state, _m = step(state)
    float(jnp.sum(state.d[0, 0, 0, :8]))

    fld = Field.from_scenario(cfg.scenario, unit=0.25)
    maps = FieldMaps.from_field(fld)
    fwp, fobs = map(jnp.asarray, sfm_pallas.pallas_device_inputs(cfg, maps, 2))
    stride = sfm_pallas.stride_for(cfg)
    dims = sfm_grid.GridDims.build(cfg, 2)
    nb = dims.ny_pad // dims.rb

    interp = jax.default_backend() != "tpu"  # CPU smoke runs interpret

    def make_chain(clamp: bool):
        def k12(d, fwp, fobs):
            jm = occupancy_bound(d, 2, nb, dims.k)
            if clamp:
                jm = jnp.maximum(jm, 1)
            g = fused_step_kernel(d, fwp, fobs, cfg.physics,
                                  cfg.scenario.size, row_block=2, jmax=jm,
                                  stride=stride, field_unit=cfg.field_unit,
                                  interpret=interp)
            d2, _ovf, _dmx = rebin_kernel(g, cfg.grid.unit, cfg.grid.nx,
                                          cfg.grid.ny, row_block=2, jmax=jm,
                                          interpret=interp)
            return d2

        return jax.jit(k12)

    # sparse state: keep cell rows [0, ny/8), zero the rest (all channels,
    # including the slot-0 count the bound reads)
    band = max(2, cfg.grid.ny // 8)
    d_sparse = state.d.at[band + 1 :].set(0.0)
    n_sparse = float(jnp.sum(d_sparse[:, :, 6, :]))
    n_full = float(jnp.sum(state.d[:, :, 6, :]))
    print(f"agents: dense {n_full:.0f}, sparse {n_sparse:.0f} "
          f"(rows 0..{band} of {cfg.grid.ny}; {nb} blocks)")

    chain = make_chain(clamp=False)
    chain_ns = make_chain(clamp=True)
    arms = [("dense    ", chain, state.d),
            ("sparse   ", chain, d_sparse),
            ("sparse-ns", chain_ns, d_sparse)]

    # warm all arms (compile + one chained run)
    for name, fn, d0 in arms:
        d = fn(d0, fwp, fobs)
        float(jnp.sum(d[0, 0, 0, :8]))

    best = {name: float("inf") for name, _f, _d in arms}
    for w in range(args.windows):
        for name, fn, d0 in arms:
            d = d0
            for _ in range(3):
                d = fn(d, fwp, fobs)
            float(jnp.sum(d[0, 0, 0, :8]))
            t0 = time.perf_counter()
            for _ in range(args.steps):
                d = fn(d, fwp, fobs)
            float(jnp.sum(d[0, 0, 0, :8]))
            ms = (time.perf_counter() - t0) / args.steps * 1000
            best[name] = min(best[name], ms)
            print(f"  w{w} {name}: {ms:7.2f} ms/step")
    print("best of windows:")
    for name, _f, _d in arms:
        print(f"  {name}: {best[name]:7.2f} ms/step")
    print(f"skip win on sparse: {best['sparse-ns'] / best['sparse   ']:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
