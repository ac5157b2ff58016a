#!/usr/bin/env python
"""Steady-state phase profile of the grid-backend step at bench shapes.

Chained (donation-friendly) per-variant timings on the real TPU; the
numbers behind PLAN.md's round-2 cost model.  Run on hardware:

    python scripts/profile_step.py [--agents 1000000]

Caveat (PLAN.md): repeated runs through the shared axon tunnel drift
±5-10% across minutes — only the RELATIVE comparison of variants inside
one invocation is trustworthy.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def chain(fn, x0, *args, n=30, warm=5):
    import jax.numpy as jnp

    x = x0
    for _ in range(warm):
        x = fn(x, *args)
    float(jnp.sum(x[0, 0, 0, :8]))
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x, *args)
    float(jnp.sum(x[0, 0, 0, :8]))
    return (time.perf_counter() - t0) / n * 1000


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build
    from pedoni_tpu.field import Field, FieldMaps
    from pedoni_tpu.models import sfm_grid, sfm_pallas
    from pedoni_tpu.ops.pallas.rebin import rebin_kernel
    from pedoni_tpu.ops.pallas.step_kernel import fused_step_kernel

    step, state, cfg = build(args.agents, 2.5, 0, "grid", 14, 16384, 2)
    state, _ = step(state)
    fld = Field.from_scenario(cfg.scenario, unit=0.25)
    maps = FieldMaps.from_field(fld)
    fwp, fobs = map(jnp.asarray, sfm_pallas.pallas_device_inputs(cfg, maps, 2))
    stride = sfm_pallas.stride_for(cfg)
    dims = sfm_grid.GridDims.build(cfg, 2)
    nb = dims.ny_pad // dims.rb
    jmax14 = jnp.full((nb,), dims.k, jnp.int32)

    # full production step, chained.  NOTE: use bench's step as-is — it
    # is already jitted with the field maps as ARGUMENTS; wrapping it in
    # another jit would re-trace them as closure CONSTANTS and blow the
    # remote-compile request size at large agent counts (CLAUDE.md).
    s = state
    for _ in range(5):
        s, _m = step(s)
    float(jnp.sum(s.d[0, 0, 0, :8]))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        s, _m = step(s)
    float(jnp.sum(s.d[0, 0, 0, :8]))
    print(f"full step:        "
          f"{(time.perf_counter() - t0) / args.steps * 1000:7.2f} ms")

    # Both kernels are ghost-carrying since round 3: output shape ==
    # input shape, so the chains need no pad glue.
    k1 = jax.jit(lambda d, fwp, fobs: fused_step_kernel(
        d, fwp, fobs, cfg.physics, cfg.scenario.size,
        row_block=2, jmax=jmax14, stride=stride,
        field_unit=cfg.field_unit))
    print(f"kernel1:          {chain(k1, state.d, fwp, fobs, n=args.steps):7.2f} ms")

    k2 = jax.jit(lambda d, fwp, fobs: rebin_kernel(
        d, cfg.grid.unit, cfg.grid.nx, cfg.grid.ny,
        row_block=2, jmax=jmax14)[0])
    print(f"rebin:            {chain(k2, state.d, fwp, fobs, n=args.steps):7.2f} ms")

    def k12(d, fwp, fobs):
        from pedoni_tpu.models.sfm_grid import occupancy_bound

        jm = occupancy_bound(d, 2, nb, dims.k)
        g = fused_step_kernel(d, fwp, fobs, cfg.physics, cfg.scenario.size,
                              row_block=2, jmax=jm, stride=stride,
                              field_unit=cfg.field_unit)
        d2, _ovf, _dmx = rebin_kernel(g, cfg.grid.unit, cfg.grid.nx,
                                      cfg.grid.ny, row_block=2, jmax=jm)
        return d2

    print(f"k1+rebin+jmax:    "
          f"{chain(jax.jit(k12), state.d, fwp, fobs, n=args.steps):7.2f} ms "
          "(full minus spawn/metrics)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
