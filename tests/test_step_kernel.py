"""Fused Pallas step kernel vs the XLA reference pipeline (interpret mode).

Builds a small scenario at neighbor unit 1.5 m, places agents, runs one
fused-kernel step, and checks every output (positions, velocities, despawn
flags, potential) against the same physics computed with the validated XLA
ops.  Covered in both obstacle modes: the default distance-map sampling
and the --no-distance-map per-segment geometry (sfm.rs:194-237, statically
unrolled in the kernel)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pedoni_tpu.field import Field, FieldMaps
from pedoni_tpu.models.sfm import device_inputs
from pedoni_tpu.ops import forcepass
from pedoni_tpu.ops import forces as F
from pedoni_tpu.ops.neighbor import CellGrid, compute_cell_ids
from pedoni_tpu.ops.pallas.fields6 import Fields6
from pedoni_tpu.ops.pallas.step_kernel import fused_step_kernel
from pedoni_tpu.ops.sampling import sample_field
from pedoni_tpu.physics import Physics
from pedoni_tpu.scenario import loads_scenario

SCENARIO = """
[field]
size = [18, 12]
[[waypoints]]
line = [[2, 2], [2, 10]]
[[waypoints]]
line = [[16, 2], [16, 10]]
[[obstacles]]
line = [[9, 0], [9, 5]]
width = 1
"""


def _run_fused_vs_xla(segment_mode: bool):
    phys = Physics()
    sc = loads_scenario(SCENARIO)
    field = Field.from_scenario(sc, unit=0.25)
    maps = FieldMaps.from_field(field)
    grid = CellGrid.for_size(sc.size, 1.5)
    k = 8
    rb = 2
    ny_pad = -(-grid.ny // rb) * rb

    rng = np.random.default_rng(0)
    n = 220
    pos = rng.uniform(0.8, np.array(sc.size) - 0.8, (n, 2)).astype(np.float32)
    vel = rng.normal(0, 0.5, (n, 2)).astype(np.float32)
    speed = np.clip(rng.normal(1.34, 0.26, n), 0.3, None).astype(np.float32)
    dest = rng.integers(0, 2, n).astype(np.int32)
    active = jnp.ones((n,), bool)

    # --- build the sorted slot layout ---
    cid = compute_cell_ids(jnp.asarray(pos), active, grid)
    order = np.argsort(np.asarray(cid), kind="stable")
    pos_s, vel_s = pos[order], vel[order]
    speed_s, dest_s = speed[order], dest[order]
    cid_s = jnp.asarray(np.asarray(cid)[order])
    layout = forcepass.build_layout(cid_s, jnp.ones((n,), bool), grid, k)
    assert int(layout.n_overflow) == 0

    # XLA reference: sampling + forces + integrate on the agent arrays.
    from pedoni_tpu.models.sfm import StepConfig

    cfg = StepConfig.build(sc, capacity=n, neighbor_grid_unit=1.5,
                           table_capacity=k,
                           use_distance_map=not segment_mode)
    dfield, obstacles = device_inputs(cfg, maps)
    hp, wpc = maps.pot.shape[1], maps.pot.shape[2]
    fs = sample_field(dfield.rows, hp, wpc, jnp.asarray(dest_s),
                      jnp.asarray(pos_s), 0.25)
    e = F.safe_normalize(fs.pot_grad)
    alive_ref = np.asarray(fs.potential) > phys.despawn_potential
    acc_ref = np.array(F.goal_force(e, jnp.asarray(vel_s),
                                    jnp.asarray(speed_s), phys))
    if segment_mode:
        acc_ref = acc_ref + np.asarray(F.segment_obstacle_force(
            jnp.asarray(pos_s), *obstacles, phys))
    else:
        acc_ref = acc_ref + np.asarray(
            F.obstacle_force(fs.obs_dist, fs.obs_grad, phys))

    # Pairwise via the validated dense pass, with post-despawn actives.
    data = forcepass.scatter_cell_data(
        forcepass.build_layout(cid_s, jnp.asarray(alive_ref), grid, k),
        grid, k, jnp.asarray(pos_s), jnp.asarray(vel_s), e,
    )
    acc_flat = forcepass.dense_pairwise(data, grid, k, phys, row_block=4)
    acc_ref = acc_ref + np.asarray(forcepass.gather_pair_acc(acc_flat, layout))
    p_ref, v_ref = F.integrate(
        jnp.asarray(pos_s), jnp.asarray(vel_s), jnp.asarray(acc_ref),
        jnp.asarray(speed_s), jnp.asarray(alive_ref), phys,
    )

    # --- fused kernel ---
    slot = np.asarray(layout.slot)
    nxl = -(-(grid.nx + 3) // 128) * 128
    rows = np.concatenate(
        [pos_s, vel_s, speed_s[:, None], dest_s[:, None].astype(np.float32),
         np.ones((n, 1), np.float32), np.zeros((n, 1), np.float32)], axis=1,
    )
    # layout.slot indexes a (ny+2, nx+2, K) grid; re-home into ny_pad rows.
    d_grid = np.zeros((grid.ny + 2, grid.nx + 2, k, 8), np.float32)
    d_grid.reshape(-1, 8)[slot] = rows
    dk = np.zeros((ny_pad + 2, k, 8, nxl), np.float32)
    dk[: grid.ny + 2, :, :, : grid.nx + 2] = np.transpose(d_grid, (0, 2, 3, 1))

    segs = None
    if segment_mode:
        segs = tuple(
            (float(s.line[0][0]), float(s.line[0][1]),
             float(s.line[1][0]), float(s.line[1][1]), float(s.width))
            for s in sc.obstacles)
    f6 = Fields6.build(maps, grid.nx, ny_pad, lane_align=128)
    out = fused_step_kernel(
        jnp.asarray(dk), jnp.asarray(f6.wp), jnp.asarray(f6.obs),
        phys, sc.size, row_block=rb, interpret=True, segments=segs,
    )
    out = np.asarray(out)

    # Gather per-agent results back by slot (output is ghost-carrying:
    # same row indexing as the input grid).
    gy, gxx, gk = np.unravel_index(slot, (grid.ny + 2, grid.nx + 2, k))
    res = out[gy, gk, :, gxx]  # [n, 8]
    assert np.all(out[0] == 0) and np.all(out[-1] == 0)  # zero ghosts

    np.testing.assert_array_equal(res[:, 6] > 0.5, alive_ref)
    np.testing.assert_allclose(res[:, 7], np.asarray(fs.potential),
                               rtol=1e-4, atol=1e-4)
    # speed/dest pass through unchanged (the rebin kernel relies on it).
    np.testing.assert_allclose(res[:, 4], dk[gy, gk, 4, gxx], rtol=1e-6)
    np.testing.assert_array_equal(res[:, 5], dk[gy, gk, 5, gxx])
    np.testing.assert_allclose(res[:, 0:2], np.asarray(p_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(res[:, 2:4], np.asarray(v_ref),
                               rtol=1e-4, atol=1e-3)


def test_fused_kernel_matches_xla_step():
    _run_fused_vs_xla(segment_mode=False)


def test_fused_kernel_segment_obstacles_match_xla():
    """--no-distance-map mode: the kernel's statically unrolled 4-edge
    rectangle geometry must match ops/forces.segment_obstacle_force
    (itself exact-value tested against sfm.rs:194-237)."""
    _run_fused_vs_xla(segment_mode=True)
