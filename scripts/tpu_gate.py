#!/usr/bin/env python
"""On-hardware Pallas gate: Mosaic-compile and run both production kernels
on a tiny grid and check one step's physics against the XLA path.

The CI suite runs the kernels in interpret mode on CPU (tests/conftest.py
forces the CPU backend), so a Mosaic-lowering regression would otherwise
only surface as bench.py failing — run this (~60 s, most of it one remote
compile) whenever kernel code changes:

    python scripts/tpu_gate.py

Exits nonzero with a loud message on any compile failure or numeric
mismatch.  Requires the real TPU (the default interpreter env here).
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# Recorded best-of-5x100 kernels-only chain time (ms/step) at the gate's
# fixed tiny shape, measured through the shared tunnel (the minimum is
# the chip's own time; congestion only adds).  0 = record mode (print,
# never fail).  Re-record after intentional, measured kernel changes.
_GATE_BAND_MS = 0.387  # re-recorded after the round-4 rebin op cut

# Recorded best-of-5x100 ASSEMBLED-step time (ms/step, make_step_grid:
# kernels + spawn scatter + occupancy bound + metric glue) at the same
# tiny shape but on a spawn-carrying scenario.  Guards the XLA glue the
# kernels-only band cannot see (VERDICT round-4 weak #6): a regression
# there used to surface only at the next round's bench capture.
_GATE_FULL_BAND_MS = 0.448  # recorded on hardware 2026-08-20 (round 5)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() == "cpu":
        print("FATAL: no TPU visible — this gate must run on hardware",
              file=sys.stderr)
        return 2

    from pedoni_tpu.field import Field, FieldMaps
    from pedoni_tpu.models import sfm_grid, sfm_pallas
    from pedoni_tpu.models.sfm import AgentState, SimState, StepConfig, make_step, device_inputs
    from pedoni_tpu.scenario import loads_scenario

    sc = loads_scenario("""
[field]
size = [18, 12]
[[waypoints]]
line = [[2, 2], [2, 10]]
[[waypoints]]
line = [[16, 2], [16, 10]]
[[obstacles]]
line = [[9, 0], [9, 5]]
width = 1
""")
    field = Field.from_scenario(sc, unit=0.25)
    maps = FieldMaps.from_field(field)
    cfg = StepConfig.build(sc, capacity=256, neighbor_grid_unit=1.5,
                           table_capacity=8)

    rng = np.random.default_rng(0)
    n = 120
    pos = rng.uniform(0.8, np.array(sc.size) - 0.8, (256, 2)).astype(np.float32)
    vel = rng.normal(0, 0.3, (256, 2)).astype(np.float32)
    speed = np.clip(rng.normal(1.34, 0.26, 256), 0.3, None).astype(np.float32)
    dest = rng.integers(0, 2, 256).astype(np.int32)
    active = np.arange(256) < n
    agents = AgentState(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                        speed=jnp.asarray(speed), dest=jnp.asarray(dest),
                        active=jnp.asarray(active))
    state0 = SimState(agents=agents, key=jax.random.PRNGKey(3),
                      step=jnp.int32(0))

    # Mosaic path: grid backend (fused step kernel + rebin kernel).
    try:
        fwp, fobs = map(jnp.asarray, sfm_pallas.pallas_device_inputs(cfg, maps))
        step = jax.jit(sfm_grid.make_step_grid(cfg, maps))
        gs = sfm_grid.bin_state(cfg, state0)
        gs, metrics = step(gs, fwp, fobs)
        n_active = int(metrics.n_active)
    except Exception as e:
        print(f"FATAL: Mosaic kernel compile/run FAILED: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
        return 1

    # XLA reference step from the same state.
    xcfg = StepConfig.build(sc, capacity=256, neighbor_grid_unit=1.5,
                            table_capacity=8)
    dfield, obstacles = device_inputs(xcfg, maps)
    xstep = jax.jit(make_step(xcfg, maps))
    xs, xm = xstep(state0, dfield.rows, obstacles)

    if n_active != int(xm.n_active):
        print(f"FATAL: active-count mismatch grid={n_active} "
              f"xla={int(xm.n_active)}", file=sys.stderr)
        return 1

    flat = sfm_grid.unbin_state(cfg, gs)

    def key_sorted(a):
        act = np.asarray(a.active)
        r = np.concatenate([np.asarray(a.pos), np.asarray(a.vel)], axis=1)[act]
        return r[np.lexsort((r[:, 1], r[:, 0]))]

    a, b = key_sorted(xs.agents), key_sorted(flat.agents)
    if a.shape != b.shape or not np.allclose(a, b, rtol=1e-3, atol=1e-3):
        err = np.abs(a - b).max() if a.shape == b.shape else float("inf")
        print(f"FATAL: physics mismatch vs XLA step (max err {err:.2e})",
              file=sys.stderr)
        return 1

    # Offset (sharded-slab) Mosaic path: run the fused kernel on a
    # column-tile slab with a nonzero col_offset and a lane-sliced field
    # slab — the code path parallel/tile2d.py uses per device — and check
    # it reproduces the full-width kernel on the owned lanes.  Runs on
    # one chip: the exchange is done host-side, only the kernels matter.
    try:
        from pedoni_tpu.ops.pallas.step_kernel import fused_step_kernel
        from pedoni_tpu.parallel import tile2d

        tcfg = tile2d.Tile2DConfig.build(cfg, 1, 2)
        wp_t, obs_t = tile2d.shard_device_inputs(tcfg, maps)  # [1, 2, ...]
        cl, nxl = tcfg.cols_local, tcfg.nxl_local
        k = cfg.table_capacity
        dfull = np.asarray(sfm_grid.bin_state(cfg, state0).d)
        nb = (dfull.shape[0] - 2) // 2
        g_full = np.asarray(fused_step_kernel(
            jnp.asarray(dfull), fwp, fobs, cfg.physics, sc.size,
            row_block=2, stride=sfm_pallas.stride_for(cfg),
            field_unit=cfg.field_unit))
        max_err = 0.0
        for c in range(2):
            slab = np.zeros(dfull.shape[:3] + (nxl,), np.float32)
            n_own = min(cl, cfg.grid.nx - c * cl)
            # owned lanes + host-side ghost-lane "exchange" from the
            # full grid (the values ppermute would deliver)
            lo = c * cl
            src = dfull[..., lo : lo + n_own + 2]
            slab[..., : src.shape[-1]] = src
            g = np.asarray(fused_step_kernel(
                jnp.asarray(slab), jnp.asarray(wp_t[0, c]),
                jnp.asarray(obs_t[0, c]), cfg.physics, sc.size,
                row_block=2, stride=sfm_pallas.stride_for(cfg),
                field_unit=cfg.field_unit,
                col_offset=jnp.asarray([lo], jnp.int32)))
            want = g_full[..., lo + 1 : lo + 1 + n_own]
            got = g[..., 1 : 1 + n_own]
            max_err = max(max_err, float(np.abs(got - want).max()))
        if max_err > 1e-3:
            print(f"FATAL: offset-slab kernel mismatch vs full-width "
                  f"kernel (max err {max_err:.2e})", file=sys.stderr)
            return 1
    except Exception as e:
        print(f"FATAL: offset-slab Mosaic compile/run FAILED: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
        return 1

    # Empty-block skip on hardware: a sparse band leaves middle blocks'
    # occupancy bound at 0, so their window/field DMAs and compute body
    # are skipped (ops/pallas/{step_kernel,rebin}.py).  The skipped run
    # must be bit-exact vs forcing every block to compute (bound
    # clamped >= 1) through the rebin.
    try:
        from pedoni_tpu.models.sfm_grid import occupancy_bound
        from pedoni_tpu.ops.pallas.rebin import rebin_kernel

        dsp = np.asarray(sfm_grid.bin_state(cfg, state0).d).copy()
        dsp[3:-2] = 0.0  # keep cell rows {0, 1} and the last row
        nb = (dsp.shape[0] - 2) // 2
        jm = occupancy_bound(jnp.asarray(dsp), 2, nb, k)
        if int(jnp.sum(jm == 0)) == 0:
            print("FATAL: skip gate setup broken — no empty block",
                  file=sys.stderr)
            return 1
        outs = []
        for bound in (jm, jnp.maximum(jm, 1)):
            g = fused_step_kernel(jnp.asarray(dsp), fwp, fobs, cfg.physics,
                                  sc.size, row_block=2, jmax=bound,
                                  stride=sfm_pallas.stride_for(cfg),
                                  field_unit=cfg.field_unit)
            d2, ovf, dmx = rebin_kernel(g, cfg.grid.unit, cfg.grid.nx,
                                        cfg.grid.ny, row_block=2,
                                        jmax=bound)
            outs.append((np.asarray(d2), np.asarray(ovf), np.asarray(dmx)))
        if not all((x == y).all() for x, y in zip(outs[0], outs[1])):
            print("FATAL: empty-block skip not bit-exact on hardware",
                  file=sys.stderr)
            return 1
    except Exception as e:
        print(f"FATAL: empty-block-skip Mosaic compile/run FAILED: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
        return 1

    # Waypoint-plane slot walk on hardware: the dynamic wanted-plane
    # fori (rank-indexed slab DMA) must be bit-exact on active slots vs
    # the ungated kernel (inactive slots may differ in channel 7 —
    # ungated samples planes for garbage positions; no consumer reads
    # them).  wp_slots=2 with 3 planes also exercises the serialization
    # wrap on hardware.
    try:
        from pedoni_tpu.ops.pallas.step_kernel import waypoint_block_planes

        dg = sfm_grid.bin_state(cfg, state0).d
        wpp = waypoint_block_planes(dg, 2, int(fwp.shape[0]))
        g_off = np.asarray(fused_step_kernel(
            dg, fwp, fobs, cfg.physics, sc.size, row_block=2,
            stride=sfm_pallas.stride_for(cfg), field_unit=cfg.field_unit))
        g_on = np.asarray(fused_step_kernel(
            dg, fwp, fobs, cfg.physics, sc.size, row_block=2,
            stride=sfm_pallas.stride_for(cfg), field_unit=cfg.field_unit,
            wp_planes=wpp, wp_slots=2))
        act_m = g_off[:, :, 6, :] > 0.5
        if not all((g_on[:, :, c, :][act_m] == g_off[:, :, c, :][act_m]).all()
                   for c in range(8)):
            print("FATAL: waypoint-plane skip not bit-exact on hardware",
                  file=sys.stderr)
            return 1
    except Exception as e:
        print(f"FATAL: waypoint-skip Mosaic compile/run FAILED: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
        return 1

    # Slot-split branch on hardware: the gate scenarios run K = 8 where
    # the split is statically disabled, so Mosaic-check it explicitly at
    # K = 12 with one crammed cell (> 8 occupants -> its block takes the
    # full branch; every other block takes the one-tile branch) — the
    # full step must be BIT-identical to slot_split=False.
    try:
        cfg12 = StepConfig.build(sc, capacity=256, neighbor_grid_unit=1.5,
                                 table_capacity=12)
        fwp12, fobs12 = map(jnp.asarray,
                            sfm_pallas.pallas_device_inputs(cfg12, maps))
        pos12 = pos.copy()
        pos12[:10] = rng.uniform((6.1, 3.1), (7.4, 4.4), (10, 2))
        ag12 = AgentState(pos=jnp.asarray(pos12), vel=jnp.asarray(vel),
                          speed=jnp.asarray(speed), dest=jnp.asarray(dest),
                          active=jnp.asarray(active))
        st12 = SimState(agents=ag12, key=jax.random.PRNGKey(3),
                        step=jnp.int32(0))
        outs12 = []
        for split in (False, True):
            s12 = sfm_grid.bin_state(cfg12, st12)
            stp = jax.jit(sfm_grid.make_step_grid(cfg12, maps,
                                                  slot_split=split))
            for _ in range(3):
                s12, m12 = stp(s12, fwp12, fobs12)
            outs12.append((np.asarray(s12.d), int(m12.n_active)))
        if outs12[0][1] != outs12[1][1] or not (
                outs12[0][0] == outs12[1][0]).all():
            print("FATAL: slot-split branch not bit-exact on hardware",
                  file=sys.stderr)
            return 1
    except Exception as e:
        print(f"FATAL: slot-split Mosaic compile/run FAILED: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
        return 1

    # Hardware perf band (VERDICT round-3 ask #5): a timed kernels-only
    # chain at this fixed small shape, best of several windows so tunnel
    # congestion (which only ever ADDS time) cannot fail a healthy
    # kernel.  Band recorded on hardware 2026-08-19; fail loud on >25%
    # regression so a de-optimized kernel is caught at gate time instead
    # of at the next round's bench capture.  Override / re-record with
    # PEDONI_GATE_BAND_MS=<float> (0 disables).
    import os
    import time

    band_ms = float(os.environ.get("PEDONI_GATE_BAND_MS", _GATE_BAND_MS))
    try:
        chain = jax.jit(sfm_grid.make_kernel_chain(cfg, maps, row_block=2))
        d = chain(dg, fwp, fobs)
        float(jnp.sum(d[0, 0, 0, :8]))  # warm + fence
        best = float("inf")
        for _ in range(5):
            d = dg
            t0 = time.perf_counter()
            for _ in range(100):
                d = chain(d, fwp, fobs)
            float(jnp.sum(d[0, 0, 0, :8]))
            best = min(best, (time.perf_counter() - t0) / 100 * 1000)
    except Exception as e:
        print(f"FATAL: perf-band chain compile/run FAILED: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
        return 1
    if band_ms > 0 and best > band_ms * 1.25:
        print(f"FATAL: kernel-chain perf regression: {best:.3f} ms/step "
              f"vs recorded band {band_ms:.3f} ms (+25% allowed). "
              "If a slowdown is intentional and measured, re-record with "
              "PEDONI_GATE_BAND_MS and update _GATE_BAND_MS.",
              file=sys.stderr)
        return 1

    # Full-step perf band (VERDICT round-4 weak #6): the ASSEMBLED
    # make_step_grid step — spawn scatter, occupancy bound, metric sums,
    # cadence cond — on a spawn-carrying variant of the same scenario, so
    # a glue de-optimization (e.g. re-adding a full act-channel reduce)
    # trips the gate instead of the next round's bench.  Same best-of-
    # windows discipline; override with PEDONI_GATE_FULL_BAND_MS.
    full_band_ms = float(os.environ.get("PEDONI_GATE_FULL_BAND_MS",
                                        _GATE_FULL_BAND_MS))
    try:
        sc_sp = loads_scenario("""
[field]
size = [18, 12]
[[waypoints]]
line = [[2, 2], [2, 10]]
[[waypoints]]
line = [[16, 2], [16, 10]]
[[obstacles]]
line = [[9, 0], [9, 5]]
width = 1
[[pedestrians]]
origin = 0
destination = 1
spawn = { kind = "periodic", frequency = 4.0 }
""")
        cfg_sp = StepConfig.build(sc_sp, capacity=256, neighbor_grid_unit=1.5,
                                  table_capacity=8)
        maps_sp = FieldMaps.from_field(Field.from_scenario(sc_sp, unit=0.25))
        fwp_s, fobs_s = map(jnp.asarray,
                            sfm_pallas.pallas_device_inputs(cfg_sp, maps_sp))
        fstep = jax.jit(sfm_grid.make_step_grid(cfg_sp, maps_sp))
        gs0 = sfm_grid.bin_state(cfg_sp, state0)
        gsw, mw = fstep(gs0, fwp_s, fobs_s)
        float(mw.n_active)  # warm + fence
        full_best = float("inf")
        for _ in range(5):
            g = gs0
            t0 = time.perf_counter()
            for _ in range(100):
                g, m = fstep(g, fwp_s, fobs_s)
            float(m.n_active)
            full_best = min(full_best, (time.perf_counter() - t0) / 100 * 1000)
    except Exception as e:
        print(f"FATAL: full-step band compile/run FAILED: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
        return 1
    if full_band_ms > 0 and full_best > full_band_ms * 1.25:
        print(f"FATAL: assembled-step perf regression: {full_best:.3f} "
              f"ms/step vs recorded band {full_band_ms:.3f} ms (+25% "
              "allowed) — the XLA glue (spawn/bound/metrics) regressed; "
              "kernels-only chain passed its own band. Re-record with "
              "PEDONI_GATE_FULL_BAND_MS if intentional and measured.",
              file=sys.stderr)
        return 1

    print(f"tpu_gate OK: Mosaic kernels compiled and ran, {n_active} active, "
          "physics matches the XLA step; offset-slab path max err "
          f"{max_err:.1e}; empty-block skip bit-exact; waypoint-plane "
          f"skip bit-exact; slot-split branch bit-exact; "
          f"kernel chain {best:.3f} ms/step "
          f"(band {band_ms:.3f}); full step {full_best:.3f} ms/step "
          f"(band {full_band_ms:.3f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
