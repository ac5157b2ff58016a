"""Fused Pallas step kernel: field sampling + despawn + all forces +
integration in one pass over the cell grid.

Extends the pairwise kernel (pairwise.py) with in-kernel field sampling via
the stride-6 plane layout (fields6.py): every agent's bilinear taps live in
a *static* 8x8 patch of the block's field window, so sampling becomes an
8x8 select-multiply-accumulate over [K, NXL] lane arrays — no gathers.
This removes the dominant index-bound XLA phases (field sampling, the
separate despawn potential check, goal/obstacle force plumbing and the
pairwise-acceleration gather) from the step.

Geometry (neighbor unit 1.5 m, field unit 0.25 m, PAD = 4):
    field coord   p = pos * 4 - 0.5 + 4
    agent y in cell row r  =>  floor(py) in [6r+3, 6r+9], +1 tap -> 6r+10
so the patch of cell (r, x) is padded-map rows/cols [6r+3, 6r+10] x
[6x+3, 6x+10]; fields6.py pre-offsets rows by +6 and lanes by +1 so block
i DMAs F rows [6*i*rb + 3, +6(rb+2)+2) and patch column p of the agent at
lane l is F[6w + q, (3+p) % 6, ch, l + (3+p)//6] for window row w.

Input  D  [ny_pad+2, K, 8, NXL]: 0 pos.x, 1 pos.y, 2 vel.x, 3 vel.y,
                                 4 speed, 5 dest, 6 active, 7 spare
Output OUT [ny_pad+2, K, 8, NXL]: same channel layout, post-step values
                                 (active is post-despawn; speed/dest pass
                                 through), GHOST-CARRYING: rows 0 and
                                 ny_pad+1 are written zero by the edge
                                 blocks, so the rebin kernel
                                 (ops/pallas/rebin.py) consumes OUT
                                 directly with no XLA-side pad copy, and
                                 the sharded paths refresh the ghost rows
                                 in place (dynamic-update-slice) instead
                                 of concatenating a fresh array — at 1M
                                 agents each avoided pad/concat is a
                                 ~100 MB HBM round trip per step.

Physics per sfm.rs:91-255; despawn per sfm.rs:69 (+ out-of-grid,
neighbor_grid.rs:29).  Cell (r, x) holds agents at D row r+1, lane x+1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...physics import Physics
from .fields6 import N_CH, ROW0, STRIDE, patch_extent
from .pairwise import _pair_accum

EPS = 1e-12
FPAD = 4.0  # field-map PAD rings


def _shift_lane(arr, delta: int):
    """arr[..., l] -> arr[..., l + delta] (circular; wrapped lanes are
    zero padding or >2 m away, so downstream masks kill them)."""
    if delta == 0:
        return arr
    return pltpu.roll(arr, shift=(-delta) % arr.shape[-1], axis=arr.ndim - 1)


def _sample_row(fwin, base_row: int, q0, p0, tx, ty, channels=(0, 1, 2),
                stride: int = STRIDE):
    """Bilinear sample of a stride-S plane for one cell row.

    fwin: [FLEN, S, 4, NXL] VMEM window; base_row: S * w (static);
    q0/p0: [K, NXL] integer patch-local tap coords; tx/ty: fractions.
    ``channels`` selects which plane channels to evaluate (halo rows only
    need the potential for the despawn test — a 6x saving there).
    Returns one [K, NXL] array per requested channel.

    The two-sided select form is deliberate: inactive taps must carry an
    EXACT zero weight.  A hat form max(0, 1 - |p0 + tx - q|) looks one op
    cheaper but the p0 + tx rounding can leak ~2^-22 of weight onto a
    neighboring tap, and taps just outside the field hold the 1e12
    out-of-bounds clamp (util.rs:44-58) — a catastrophic ~1e5 potential
    error next to obstacle rings.

    The flat tap loop is also deliberate: a separable two-pass rewrite
    (per-axis weights computed once, x-pass then y-fold) cuts ~35% of
    the nominal ops but MEASURED 2.4 ms/step SLOWER at 1M agents — the
    8 live wx arrays + per-channel row accumulators blow the register
    budget and Mosaic's schedule degrades.  Op counting is not a cost
    model on this VPU; see PLAN.md.
    """
    out = {ci: None for ci in channels}
    for qy in range(patch_extent(stride)):
        wy = jnp.where(q0 == qy, 1.0 - ty, 0.0) + jnp.where(q0 == qy - 1, ty, 0.0)
        for qx in range(patch_extent(stride)):
            wx = jnp.where(p0 == qx, 1.0 - tx, 0.0) + jnp.where(p0 == qx - 1, tx, 0.0)
            w = wy * wx
            c = (ROW0 + qx) % stride
            dlt = (ROW0 + qx) // stride
            for ci in channels:
                # keep reads 2D ([1, NXL]); Mosaic rejects 1D vectors
                val = _shift_lane(fwin[base_row + qy, c, ci : ci + 1, :], dlt)
                term = w * val
                out[ci] = term if out[ci] is None else out[ci] + term
    return [out[ci] for ci in channels]


def _segment_accel(posx, posy, segments, phys: Physics):
    """Exact per-segment obstacle acceleration — the reference's
    --no-distance-map fallback (sfm.rs:194-237), unrolled over the STATIC
    obstacle list (obstacle geometry never changes during a run, so each
    rectangle's 4 edges are baked in as compile-time constants; ~50 wide
    ops per obstacle per center row — a debug mode, not the fast path).

    Mirrors ops/forces.segment_obstacle_force exactly: nearest of the 4
    edges of the width-widened rectangle repels along (pos - closest);
    agents INSIDE the rectangle are skipped.  Min selection runs on
    squared distances (monotone, first-min semantics preserved by the
    strict < update).  Sanitized garbage slots (|pos| = 2^30) stay
    finite: exp underflows to 0 and the 1/d divisor is ~1e-9.
    """
    afx = jnp.zeros_like(posx)
    afy = jnp.zeros_like(posx)
    for (x0, y0, x1, y1, width) in segments:
        dx_ = x1 - x0
        dy_ = y1 - y0
        h = max((dx_ * dx_ + dy_ * dy_) ** 0.5, 1e-6)
        nx_ = dy_ / h * (width * 0.5)
        ny_ = -dx_ / h * (width * 0.5)
        p0p = (x0 + nx_, y0 + ny_)
        p0m = (x0 - nx_, y0 - ny_)
        p1p = (x1 + nx_, y1 + ny_)
        p1m = (x1 - nx_, y1 - ny_)
        # edge order matches forces.py (e0/e1 across the endpoints,
        # e2/e3 the long sides) — the inside test depends on it.
        edges = ((p0p, p0m), (p1p, p1m), (p0p, p1p), (p0m, p1m))
        d2s, dxs, dys = [], [], []
        for q0, q1 in edges:
            sx = q1[0] - q0[0]
            sy = q1[1] - q0[1]
            il2 = 1.0 / max(sx * sx + sy * sy, 1e-12)
            t = jnp.clip(((posx - q0[0]) * sx + (posy - q0[1]) * sy) * il2,
                         0.0, 1.0)
            ddx = posx - (q0[0] + t * sx)
            ddy = posy - (q0[1] + t * sy)
            d2s.append(ddx * ddx + ddy * ddy)
            dxs.append(ddx)
            dys.append(ddy)
        inside = ((d2s[0] < width * width) & (d2s[1] < width * width)
                  & (d2s[2] < h * h) & (d2s[3] < h * h))
        best, bdx, bdy = d2s[0], dxs[0], dys[0]
        for e in (1, 2, 3):
            sel = d2s[e] < best
            best = jnp.where(sel, d2s[e], best)
            bdx = jnp.where(sel, dxs[e], bdx)
            bdy = jnp.where(sel, dys[e], bdy)
        dmin = jnp.sqrt(jnp.maximum(best, EPS))
        coef = jnp.where(
            inside, 0.0,
            phys.obs_strength * jnp.exp(-dmin / phys.obs_range) / dmin)
        afx = afx + coef * bdx
        afy = afy + coef * bdy
    return afx, afy


def _kernel(jmax_ref, roff_ref, coff_ref, d_hbm, fwp_hbm, fobs_hbm, out_hbm,
            window2, fwp2, fobs2, act_scr, outbuf, sems, out_sem, *, rb: int, k: int,
            n_wp: int, phys: Physics, grid_w: float, grid_h: float,
            stride: int = STRIDE, inv_unit: float = 4.0,
            segments: tuple | None = None):
    i = pl.program_id(0)
    jmax = jmax_ref[i]

    # Double-buffered input DMA: block i computes out of slot i%2 while
    # block i+1's window + field slabs stream into the other slot — the
    # ~3.5 MB/block of input traffic is hidden behind compute instead of
    # serializing in front of it (the wait used to head every block).
    # Descriptors are re-created at wait time (same src/dst/semaphore),
    # the standard Pallas pattern for cross-iteration copies.
    #
    # Empty-block skip: jmax == 0 means no active agent anywhere in this
    # block's (rb+2)-row window (the occupancy bound is a max over the
    # exchanged count channel), so the block's output is all-inactive by
    # construction — every start/wait below is gated on the TARGET
    # block's bound (consistently, so semaphores stay balanced) and the
    # whole sampling + force + integrate body is skipped.  Uniform-density
    # benches never take this path; sparse production grids (evacuation
    # endgames, localized crowds in large fields) skip the full window +
    # field-slab DMA and the per-row sampling pass for most blocks.
    slot = jax.lax.rem(i, 2)

    def _copies(j, s):
        flen = fwp2.shape[2]
        fstart = j * (stride * rb) + ROW0
        return (
            pltpu.make_async_copy(d_hbm.at[pl.ds(j * rb, rb + 2)],
                                  window2.at[s], sems.at[s, 0]),
            pltpu.make_async_copy(fwp_hbm.at[:, pl.ds(fstart, flen)],
                                  fwp2.at[s], sems.at[s, 1]),
            pltpu.make_async_copy(fobs_hbm.at[pl.ds(fstart, flen)],
                                  fobs2.at[s], sems.at[s, 2]),
        )

    @pl.when((i == 0) & (jmax > 0))
    def _issue_first():
        for c in _copies(0, 0):
            c.start()

    @pl.when(jmax > 0)
    def _wait_inputs():
        for c in _copies(i, slot):
            c.wait()

    # (clamped read: jmax_ref[i+1] would be out of bounds on the last
    # block — the condition masks the clamp's aliased value.)
    nxt = jnp.minimum(i + 1, pl.num_programs(0) - 1)

    @pl.when((i + 1 < pl.num_programs(0)) & (jmax_ref[nxt] > 0))
    def _prefetch_next():
        for c in _copies(i + 1, 1 - slot):
            c.start()

    @pl.when(jmax == 0)
    def _empty_block():
        outbuf[:] = jnp.zeros_like(outbuf[:])

    @pl.when(jmax > 0)
    def _compute_block():
        _compute(i, jmax, roff_ref, coff_ref, window2.at[slot],
                 fwp2.at[slot], fobs2.at[slot], act_scr, outbuf, rb=rb,
                 k=k, n_wp=n_wp, phys=phys, grid_w=grid_w, grid_h=grid_h,
                 stride=stride, inv_unit=inv_unit, segments=segments)

    # Ghost-carrying output: center rows land at [1 + i*rb, 1 + i*rb + rb);
    # the edge blocks also zero the ghost rows so downstream consumers
    # never pad.  The output DMA is ~0.3 us/block vs ~70 us of compute,
    # so start+wait (no double buffering) costs nothing measurable.
    co = pltpu.make_async_copy(
        outbuf, out_hbm.at[pl.ds(i * rb + 1, rb)], out_sem)
    co.start()
    co.wait()

    @pl.when(i == 0)
    def _write_top_ghost():
        outbuf[0:1] = jnp.zeros_like(outbuf[0:1])
        cz = pltpu.make_async_copy(
            outbuf.at[pl.ds(0, 1)], out_hbm.at[pl.ds(0, 1)], out_sem)
        cz.start()
        cz.wait()

    @pl.when(i == pl.num_programs(0) - 1)
    def _write_bottom_ghost():
        outbuf[0:1] = jnp.zeros_like(outbuf[0:1])
        nyp1 = pl.num_programs(0) * rb + 1
        cz = pltpu.make_async_copy(
            outbuf.at[pl.ds(0, 1)], out_hbm.at[pl.ds(nyp1, 1)], out_sem)
        cz.start()
        cz.wait()


def _compute(i, jmax, roff_ref, coff_ref, window, fwp, fobs, act_scr,
             outbuf, *, rb: int, k: int, n_wp: int, phys: Physics,
             grid_w: float, grid_h: float, stride: int, inv_unit: float,
             segments: tuple | None):
    """The occupied-block body: sanitize, sample, forces, integrate,
    fill ``outbuf`` with the post-step center rows.  (``i``/``jmax`` =
    pl.program_id(0) and this block's occupancy bound, passed in: calling
    the primitive inside a pl.when body escapes the interpret-mode
    evaluator.)"""

    # Fault containment: a non-finite pos/vel (corrupt checkpoint, any
    # upstream bug) would otherwise POISON every neighbor through the
    # pair pass — 0 * NaN = NaN in the masked accumulate — and cascade
    # one cell per step until the whole field is NaN.  Replacing bad
    # values with a huge FINITE sentinel at the window keeps everything
    # downstream finite: the agent exerts zero force (beyond cutoff),
    # samples zero potential, despawns this step, and is counted — and
    # kernel outputs are then always finite, so the rebin needs no
    # sanitizing of its own.  Channel 4 (speed) is included: a NaN speed
    # would otherwise reach the goal force and NaN the integrated
    # position while the agent stays active; the huge-finite sentinel
    # instead catapults it off-grid where the rebin drops it, counted.
    # Measured 0.6 ms/step at 1M; doing this
    # per-candidate-slice instead fuses the select into the broadcast
    # consumers at full [rb, K, NXL] width and costs 5x more (PLAN.md).
    for w in range(rb + 2):
        for ch in range(5):  # pos.x, pos.y, vel.x, vel.y, speed
            v = window[w, :, ch, :]
            window[w, :, ch, :] = jnp.where(
                jnp.abs(v) < jnp.float32(2.0**30), v, jnp.float32(2.0**30))

    nxl = window.shape[-1]
    # Global cell row/column offsets of this block: nonzero under spatial
    # sharding (parallel/grid_shard.py rows; parallel/tile2d.py rows x
    # cols), where positions stay in global coordinates but blocks index a
    # local slab whose lane l holds global cell column col_offset + l - 1.
    lane = (jax.lax.broadcasted_iota(jnp.int32, (1, nxl), 1)
            + coff_ref[0]).astype(jnp.float32)
    r0 = (i * rb + roff_ref[0]).astype(jnp.float32)

    # --- per-window-row sampling, despawn, goal/obstacle accelerations ---
    # Halo rows (w = 0 and rb+1) contribute only their post-despawn active
    # flag to the pair pass, so they sample just the potential channel of
    # the destination plane — gradients, the obstacle plane and the force
    # terms are center-row-only work.
    exs, eys, acts, accfx, accfy, pots = [], [], [], [], [], []
    for w in range(rb + 2):
        is_center = 1 <= w <= rb
        posx = window[w, :, 0, :]
        posy = window[w, :, 1, :]
        velx = window[w, :, 2, :]
        vely = window[w, :, 3, :]
        speed = window[w, :, 4, :]
        dest = window[w, :, 5, :]
        act = window[w, :, 6, :]

        px = posx * inv_unit - 0.5 + FPAD
        py = posy * inv_unit - 0.5 + FPAD
        bx = jnp.floor(px)
        by = jnp.floor(py)
        tx = px - bx
        ty = py - by
        # Patch-local taps: p0 = floor(px) - (S x + 3), x = lane - 1;
        # q0 = floor(py) - S (r0 - 1 + w) - 3.
        p0 = bx - (lane - 1.0) * stride - ROW0
        q0 = by - (r0 - 1.0 + w) * stride - ROW0
        base_row = stride * w

        pot = jnp.zeros_like(posx)
        gx = jnp.zeros_like(posx)
        gy = jnp.zeros_like(posx)
        for plane in range(n_wp):
            sel = dest == plane
            if is_center:
                v0, v1, v2 = _sample_row(fwp.at[plane], base_row, q0, p0,
                                         tx, ty, stride=stride)
                gx = jnp.where(sel, v1, gx)
                gy = jnp.where(sel, v2, gy)
            else:
                (v0,) = _sample_row(fwp.at[plane], base_row, q0, p0, tx, ty,
                                    channels=(0,), stride=stride)
            pot = jnp.where(sel, v0, pot)

        # Despawn (sfm.rs:69) + out-of-grid (neighbor_grid.rs:29).
        in_grid = (posx >= 0.0) & (posx < grid_w) & (posy >= 0.0) & (posy < grid_h)
        act_new = jnp.where((pot > phys.despawn_potential) & in_grid, act, 0.0)
        acts.append(act_new)
        pots.append(pot)

        if not is_center:
            exs.append(None)
            eys.append(None)
            accfx.append(None)
            accfy.append(None)
            continue

        # Goal force (sfm.rs:107-109); the Sobel points downhill.
        g_norm = jax.lax.rsqrt(jnp.maximum(gx * gx + gy * gy, EPS))
        ex = gx * g_norm
        ey = gy * g_norm
        afx = (ex * speed - velx) / phys.relaxation_time
        afy = (ey * speed - vely) / phys.relaxation_time

        if segments is None:
            # Obstacle force from the pre-convolved distance map
            # (sfm.rs:188-192): repel along -normalize(sobel).
            dist, dgx, dgy = _sample_row(fobs, base_row, q0, p0, tx, ty,
                                         stride=stride)
            d_norm = jax.lax.rsqrt(jnp.maximum(dgx * dgx + dgy * dgy, EPS))
            mag = phys.obs_strength * jnp.exp(-dist / phys.obs_range)
            afx = afx - mag * dgx * d_norm
            afy = afy - mag * dgy * d_norm
        else:
            # --no-distance-map debug mode: exact per-segment geometry.
            sfx, sfy = _segment_accel(posx, posy, segments, phys)
            afx = afx + sfx
            afy = afy + sfy

        exs.append(ex)
        eys.append(ey)
        accfx.append(afx)
        accfy.append(afy)

    # Candidate actives must live in a ref (Mosaic cannot dynamic-slice
    # values inside the slot loop).
    for w in range(rb + 2):
        act_scr[w] = acts[w]
    act_c = jnp.stack(acts[1 : 1 + rb])

    # --- pairwise pass (center rows 1..rb of the window) ---
    center = {
        "px": window[1 : 1 + rb, :, 0, :],
        "py": window[1 : 1 + rb, :, 1, :],
        "vx": window[1 : 1 + rb, :, 2, :],
        "vy": window[1 : 1 + rb, :, 3, :],
        "ex": jnp.stack(exs[1 : 1 + rb]),
        "ey": jnp.stack(eys[1 : 1 + rb]),
    }
    accx = jnp.stack(accfx[1 : 1 + rb])
    accy = jnp.stack(accfy[1 : 1 + rb])

    # Occupancy bound: no cell in this block's window holds more than
    # jmax agents, so candidate slots >= jmax are all empty — skip them.
    # All 9 window offsets sit in ONE fori body: the loop-control and
    # carry overhead (~200 ns/trip measured, PLAN.md) is paid once per
    # candidate slot instead of once per (dy, slot).
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)

    def body(j, acc):
        for dy in (-1, 0, 1):
            row = {
                "px": window[1 + dy : 1 + dy + rb, pl.ds(j, 1), 0, :],
                "py": window[1 + dy : 1 + dy + rb, pl.ds(j, 1), 1, :],
                "vx": window[1 + dy : 1 + dy + rb, pl.ds(j, 1), 2, :],
                "vy": window[1 + dy : 1 + dy + rb, pl.ds(j, 1), 3, :],
                "act": act_scr[1 + dy : 1 + dy + rb, pl.ds(j, 1), :],
            }
            for dxo in (-1, 0, 1):
                cand = {name: _shift_lane(arr, dxo) for name, arr in row.items()}
                self_slot = (slot_iota == j) if (dy == 0 and dxo == 0) else None
                acc = _pair_accum(acc, center, cand, phys, self_slot)
        return acc

    accx, accy = jax.lax.fori_loop(0, jmax, body, (accx, accy))

    # --- integrate (sfm.rs:245-254), center rows only ---
    dt = phys.delta_time
    velx = center["vx"]
    vely = center["vy"]
    speed = window[1 : 1 + rb, :, 4, :]
    nvx = velx + accx * dt
    nvy = vely + accy * dt
    vmax = speed * phys.max_speed_factor
    vlen = jnp.sqrt(jnp.maximum(nvx * nvx + nvy * nvy, EPS))
    scale = jnp.minimum(1.0, vmax / vlen)
    nvx = nvx * scale
    nvy = nvy * scale
    keep = act_c > 0.5
    npx = jnp.where(keep, center["px"] + (nvx + velx) * (dt * 0.5), center["px"])
    npy = jnp.where(keep, center["py"] + (nvy + vely) * (dt * 0.5), center["py"])
    nvx = jnp.where(keep, nvx, velx)
    nvy = jnp.where(keep, nvy, vely)

    outbuf[:, :, 0, :] = npx
    outbuf[:, :, 1, :] = npy
    outbuf[:, :, 2, :] = nvx
    outbuf[:, :, 3, :] = nvy
    outbuf[:, :, 4, :] = speed
    outbuf[:, :, 5, :] = window[1 : 1 + rb, :, 5, :]
    outbuf[:, :, 6, :] = act_c
    outbuf[:, :, 7, :] = jnp.stack(pots[1 : 1 + rb])


def fused_step_kernel(d: jnp.ndarray, fwp: jnp.ndarray, fobs: jnp.ndarray,
                      phys: Physics, grid_size: tuple[float, float],
                      row_block: int = 4, interpret: bool = False,
                      jmax: jnp.ndarray | None = None,
                      row_offset: jnp.ndarray | None = None,
                      col_offset: jnp.ndarray | None = None,
                      stride: int = STRIDE,
                      field_unit: float = 0.25,
                      segments: tuple | None = None) -> jnp.ndarray:
    """Run the fused sample+forces+integrate kernel.

    d    [ny_pad+2, K, 8, NXL]  (NXL % 128 == 0, ny_pad % row_block == 0)
    fwp  [n_wp, R, S, 4, NXL]  (fields6.Fields6.wp, stride S)
    fobs [R, S, 4, NXL]
    grid_size: world (width, height) in meters for the out-of-grid despawn.
    jmax [nb] i32: per-block occupancy bound (max agents in any cell of the
    block's 3-row window); None disables the optimization (bound = K).
    row_offset [1] i32: global cell row of d's first real row — nonzero
    under row-strip sharding, where ``d``/``fwp``/``fobs`` are per-device
    slabs but agent positions stay in global coordinates.
    col_offset [1] i32: global cell column of lane 1 (2D tile sharding,
    parallel/tile2d.py); the field slabs must be lane-sliced at the same
    offset.
    stride / field_unit: the field layout (neighbor unit = stride *
    field_unit; see fields6.py).
    segments: optional static obstacle geometry ((x0, y0, x1, y1, width)
    per obstacle, world coordinates) — when given, the obstacle force
    uses exact per-segment distances (the reference's --no-distance-map
    mode, sfm.rs:194-237) instead of sampling ``fobs``; ``fobs`` is
    still DMA'd (interface stability) but never read.
    Returns OUT [ny_pad+2, K, 8, NXL], ghost-carrying (rows 0 and
    ny_pad+1 zeroed).
    """
    ny2, k, ch, nxl = d.shape
    assert ch == 8 and nxl % 128 == 0
    ny_pad = ny2 - 2
    rb = row_block
    assert ny_pad % rb == 0
    nb = ny_pad // rb
    n_wp = fwp.shape[0]
    assert fwp.shape[2] == stride, (fwp.shape, stride)
    flen = stride * (rb + 2) + 2
    need = stride * (ny_pad - rb) + ROW0 + flen
    assert fwp.shape[1] >= need, (fwp.shape, need)

    if jmax is None:
        jmax = jnp.full((nb,), k, jnp.int32)
    if row_offset is None:
        row_offset = jnp.zeros((1,), jnp.int32)
    if col_offset is None:
        col_offset = jnp.zeros((1,), jnp.int32)

    kernel = functools.partial(
        _kernel, rb=rb, k=k, n_wp=n_wp, phys=phys,
        grid_w=grid_size[0], grid_h=grid_size[1],
        stride=stride, inv_unit=1.0 / field_unit,
        segments=segments,
    )
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((ny_pad + 2, k, 8, nxl), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rb + 2, k, 8, nxl), jnp.float32),
            pltpu.VMEM((2, n_wp, flen, stride, N_CH, nxl), jnp.float32),
            pltpu.VMEM((2, flen, stride, N_CH, nxl), jnp.float32),
            pltpu.VMEM((rb + 2, k, nxl), jnp.float32),
            pltpu.VMEM((rb, k, 8, nxl), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jmax, row_offset, col_offset, d, fwp, fobs)
