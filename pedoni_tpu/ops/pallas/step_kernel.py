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


def _kernel(jmax_ref, roff_ref, coff_ref, *rest, rb: int, k: int, mk: int,
            wp_skip: bool, n_wp: int, ring: int, phys: Physics,
            grid_w: float, grid_h: float, stride: int = STRIDE,
            inv_unit: float = 4.0, cell_unit: float = 1.5,
            segments: tuple | None = None, split: bool = False):
    """One kernel, three statically-selected modes:

    mk == 0, wp_skip False   the round-3 fused step (OUT alone)
    mk > 0                   incremental-rebin mode: channel 7 = stay
                             mask + compacted per-cell mover table M
    wp_skip True             per-block waypoint-plane SLOT sampling:
                             each block walks ONLY its wanted planes —
                             a compacted per-block plane-index list
                             (SMEM, from waypoint_block_planes) drives
                             a dynamic-trip-count fori whose body DMAs
                             + samples plane list[s] — the reference's
                             O(1) maps-per-agent property (sfm.rs:107,
                             field.rs:235-239) recovered per block with
                             NO per-plane branches.  The round-4
                             bitmask form gated 1 static branch pair
                             per (plane, block) and measured ~0.44
                             ms/step of machinery PER PLANE at 1M
                             (ab_wp_curve --decompose, round 5); the
                             slot walk's cost is O(wanted planes) with
                             a W-independent constant.

    ``ring`` (= n_wp without wp_skip) bounds the plane slab VMEM: slot
    rank s lives in ring slot s % ring, so the footprint is
    O(min(n_wp, ring)) — the reference keeps all potential maps in host
    RAM at O(1) working set (field.rs:235-239); the ring is the VMEM
    analog.  Slot reuse is safe by LOOP ORDER: rank s + ring's DMA
    starts at the bottom of rank s's loop iteration, after slot
    s % ring's tenant finished sampling.  Blocks wanting <= ring planes
    behave exactly as an unbounded build (all their slabs prefetched at
    block entry); only denser blocks serialize extra planes."""
    idx = 0
    jcen_ref = None
    if split:
        jcen_ref, idx = rest[0], 1
    pidx_ref = pcnt_ref = None
    if wp_skip:
        pidx_ref, pcnt_ref, idx = rest[idx], rest[idx + 1], idx + 2
    d_hbm, fwp_hbm, fobs_hbm, out_hbm = rest[idx : idx + 4]
    idx += 4
    if mk:
        m_hbm, movf_ref, mdmx_ref = rest[idx : idx + 3]
        idx += 3
    window2, fwp2, fobs2, act_scr, outbuf = rest[idx : idx + 5]
    idx += 5
    acc_scr = None
    if split:
        acc_scr = rest[idx]
        idx += 1
    mbuf = None
    wp_scr = None
    if mk:
        mbuf = rest[idx]
        idx += 1
    if wp_skip:
        wp_scr = rest[idx : idx + 3]  # pot/gx/gy accumulators
        idx += 3
    sems = rest[idx]
    idx += 1
    wsems = None
    if wp_skip:
        wsems = rest[idx]
        idx += 1
    out_sem = rest[idx]

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
    # The waypoint slot walk gates each slab copy the same way (start
    # and wait under the same target-block condition, so semaphores stay
    # balanced); an unused slab slot holds stale bytes that the slot
    # loop never reads (trip count = this block's wanted-plane count).
    slot = jax.lax.rem(i, 2)

    def _base_copies(j, s):
        flen = fwp2.shape[2]
        fstart = j * (stride * rb) + ROW0
        cs = [
            pltpu.make_async_copy(d_hbm.at[pl.ds(j * rb, rb + 2)],
                                  window2.at[s], sems.at[s, 0]),
            pltpu.make_async_copy(fobs_hbm.at[pl.ds(fstart, flen)],
                                  fobs2.at[s], sems.at[s, 2]),
        ]
        if not wp_skip:
            cs.append(
                pltpu.make_async_copy(fwp_hbm.at[:, pl.ds(fstart, flen)],
                                      fwp2.at[s], sems.at[s, 1]))
        return cs

    def _slab_copy(j, s, rm, plane):
        # Slab for wanted-plane RANK r (r % ring == rm) of block j:
        # HBM plane ``plane`` (dynamic scalar from the SMEM list) ->
        # VMEM ring slot rm of buffer s.  rm/plane may be traced scalars
        # (in-loop serialization) or Python ints (block-entry prefetch);
        # descriptors are recreated at wait time with the same values.
        flen = fwp2.shape[2]
        fstart = j * (stride * rb) + ROW0
        return pltpu.make_async_copy(
            fwp_hbm.at[pl.ds(plane, 1), pl.ds(fstart, flen)],
            fwp2.at[s, pl.ds(rm, 1)], wsems.at[s, rm])

    def _move_inputs(cond, j, jc, s, op):
        @pl.when(cond)
        def _base():
            for c in _base_copies(j, s):
                getattr(c, op)()
        # Slab STARTS for the first ring's worth of wanted ranks only;
        # ranks >= ring start inside the slot loop (after the ring
        # slot's previous tenant finished) and every rank's WAIT sits at
        # its sampling site (_compute), under the same rank < cnt
        # condition — semaphores stay balanced start-to-wait.
        if wp_skip and op == "start":
            cnt = pcnt_ref[jc]
            for r in range(ring):
                @pl.when(cond & (r < cnt))
                def _slab(r=r):
                    _slab_copy(j, s, r, pidx_ref[jc, r]).start()

    zero = jnp.int32(0)
    _move_inputs((i == 0) & (jmax > 0), zero, zero, 0, "start")
    _move_inputs(jmax > 0, i, i, slot, "wait")

    # (clamped read: jmax_ref[i+1] would be out of bounds on the last
    # block — the condition masks the clamp's aliased value.)
    nxt = jnp.minimum(i + 1, pl.num_programs(0) - 1)
    _move_inputs((i + 1 < pl.num_programs(0)) & (jmax_ref[nxt] > 0),
                 i + 1, nxt, 1 - slot, "start")

    @pl.when(jmax == 0)
    def _empty_block():
        outbuf[:] = jnp.zeros_like(outbuf[:])
        if mk:
            mbuf[:] = jnp.zeros_like(mbuf[:])
            movf_ref[i] = 0.0
            mdmx_ref[i] = 0.0

    @pl.when(jmax > 0)
    def _compute_block():
        wp_gate = None
        if wp_skip:
            wp_gate = (pidx_ref, pcnt_ref, *wp_scr,
                       lambda rm, p: _slab_copy(i, slot, rm, p).wait(),
                       lambda rm, p: _slab_copy(i, slot, rm, p).start())
        _compute(i, jmax, roff_ref, coff_ref, window2.at[slot],
                 fwp2.at[slot], fobs2.at[slot], act_scr, outbuf, rb=rb,
                 k=k, n_wp=n_wp, ring=ring, phys=phys, grid_w=grid_w,
                 grid_h=grid_h, stride=stride, inv_unit=inv_unit,
                 segments=segments, cell_unit=cell_unit if mk else None,
                 wp_gate=wp_gate,
                 jcen=jcen_ref[i] if split else None, acc_scr=acc_scr)
        if mk:
            _mover_pass(i, jmax, act_scr, outbuf, mbuf, movf_ref,
                        mdmx_ref, rb=rb, mk=mk)

    # Ghost-carrying output: center rows land at [1 + i*rb, 1 + i*rb + rb);
    # the edge blocks also zero the ghost rows so downstream consumers
    # never pad.  The output DMA is ~0.3 us/block vs ~70 us of compute,
    # so start+wait (no double buffering) costs nothing measurable.
    outs = [(outbuf, out_hbm)] + ([(mbuf, m_hbm)] if mk else [])
    for buf, hbm in outs:
        co = pltpu.make_async_copy(buf, hbm.at[pl.ds(i * rb + 1, rb)],
                                   out_sem)
        co.start()
        co.wait()

    @pl.when(i == 0)
    def _write_top_ghost():
        for buf, hbm in outs:
            buf[0:1] = jnp.zeros_like(buf[0:1])
            cz = pltpu.make_async_copy(
                buf.at[pl.ds(0, 1)], hbm.at[pl.ds(0, 1)], out_sem)
            cz.start()
            cz.wait()

    @pl.when(i == pl.num_programs(0) - 1)
    def _write_bottom_ghost():
        nyp1 = pl.num_programs(0) * rb + 1
        for buf, hbm in outs:
            buf[0:1] = jnp.zeros_like(buf[0:1])
            cz = pltpu.make_async_copy(
                buf.at[pl.ds(0, 1)], hbm.at[pl.ds(nyp1, 1)], out_sem)
            cz.start()
            cz.wait()


def _compute(i, jmax, roff_ref, coff_ref, window, fwp, fobs, act_scr,
             outbuf, *, rb: int, k: int, n_wp: int, phys: Physics,
             grid_w: float, grid_h: float, stride: int, inv_unit: float,
             segments: tuple | None, cell_unit: float | None = None,
             wp_gate: tuple | None = None, ring: int = 0, jcen=None,
             acc_scr=None):
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
    if wp_gate is not None:
        # Waypoint-plane SLOT walk: a dynamic-trip-count fori over this
        # block's wanted planes (compacted index list in SMEM, built by
        # waypoint_block_planes — any active agent in the rb+2-row
        # window has dest == list[s] for exactly one s).  The body DMAs
        # + samples ONE plane, accumulating into VMEM scratch the
        # per-row pass below then reads.  Tap coords are recomputed per
        # (slot, row) — ~10 elem-ops vs the ~400 of a sampled plane-row.
        # Accumulation via where(sel, v, acc) is exact: each agent has
        # ONE dest, so exactly one slot writes each lane.  vs the
        # round-4 per-plane bitmask branches: zero branches here, cost
        # O(wanted) with a W-independent constant (the branch pair per
        # (plane, block) measured ~0.44 ms/step per plane at 1M —
        # ab_wp_curve --decompose, round-5 ledger).
        pidx_ref, pcnt_ref, pot_scr, gx_scr, gy_scr, wait_slab, start_slab \
            = wp_gate
        for w in range(rb + 2):
            pot_scr[w] = jnp.zeros_like(pot_scr[w])
            if 1 <= w <= rb:
                gx_scr[w - 1] = jnp.zeros_like(gx_scr[w - 1])
                gy_scr[w - 1] = jnp.zeros_like(gy_scr[w - 1])
        cnt = pcnt_ref[i]

        def _slot_body(s, carry):
            rm = jax.lax.rem(s, ring)
            plane = pidx_ref[i, s]
            # Wait rank s's slab (started by the block-entry prefetch
            # for s < ring, or by iteration s - ring below).
            wait_slab(rm, plane)
            planef = plane.astype(jnp.float32)
            for w in range(rb + 2):
                is_center = 1 <= w <= rb
                posx = window[w, :, 0, :]
                posy = window[w, :, 1, :]
                dest = window[w, :, 5, :]
                px = posx * inv_unit - 0.5 + FPAD
                py = posy * inv_unit - 0.5 + FPAD
                bx = jnp.floor(px)
                by = jnp.floor(py)
                tx = px - bx
                ty = py - by
                p0 = bx - (lane - 1.0) * stride - ROW0
                q0 = by - (r0 - 1.0 + w) * stride - ROW0
                base_row = stride * w
                sel = dest == planef
                if is_center:
                    v0, v1, v2 = _sample_row(fwp.at[rm], base_row, q0,
                                             p0, tx, ty, stride=stride)
                    gx_scr[w - 1] = jnp.where(sel, v1, gx_scr[w - 1])
                    gy_scr[w - 1] = jnp.where(sel, v2, gy_scr[w - 1])
                else:
                    (v0,) = _sample_row(fwp.at[rm], base_row, q0, p0,
                                        tx, ty, channels=(0,),
                                        stride=stride)
                pot_scr[w] = jnp.where(sel, v0, pot_scr[w])

            # Ring slot rm is now free: start rank s + ring's slab (its
            # wait sits at iteration s + ring's top — balanced, and only
            # reached when s + ring < cnt).
            @pl.when(s + ring < cnt)
            def _start_next():
                start_slab(rm, pidx_ref[i, s + ring])
            return carry

        jax.lax.fori_loop(0, cnt, _slot_body, 0)

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

        if wp_gate is not None:
            pot = pot_scr[w]
            gx = gx_scr[w - 1] if is_center else None
            gy = gy_scr[w - 1] if is_center else None
        else:
            pot = jnp.zeros_like(posx)
            gx = jnp.zeros_like(posx)
            gy = jnp.zeros_like(posx)
            for plane in range(n_wp):
                sel = dest == plane
                if is_center:
                    v0, v1, v2 = _sample_row(fwp.at[plane], base_row, q0,
                                             p0, tx, ty, stride=stride)
                    gx = jnp.where(sel, v1, gx)
                    gy = jnp.where(sel, v2, gy)
                else:
                    (v0,) = _sample_row(fwp.at[plane], base_row, q0, p0,
                                        tx, ty, channels=(0,),
                                        stride=stride)
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
    dt_pair = phys.delta_time

    def make_body(ctr, slot_iota):
        def body(j, acc):
            for dy in (-1, 0, 1):
                # Offset-invariant candidate products hoisted out of the
                # dxo loop (elementwise math commutes with the lane roll,
                # so this is bit-exact): vx·dt / vy·dt / (vx²+vy²)·dt²
                # are paid once per candidate row instead of once per
                # (row, offset) — 6 narrow ops x 2 rolled offsets saved
                # vs 2 extra rolls.
                cvx = window[1 + dy : 1 + dy + rb, pl.ds(j, 1), 2, :]
                cvy = window[1 + dy : 1 + dy + rb, pl.ds(j, 1), 3, :]
                row = {
                    "px": window[1 + dy : 1 + dy + rb, pl.ds(j, 1), 0, :],
                    "py": window[1 + dy : 1 + dy + rb, pl.ds(j, 1), 1, :],
                    "vxdt": cvx * dt_pair,
                    "vydt": cvy * dt_pair,
                    "v2dtt": (cvx * cvx + cvy * cvy) * (dt_pair * dt_pair),
                    "act": act_scr[1 + dy : 1 + dy + rb, pl.ds(j, 1), :],
                }
                for dxo in (-1, 0, 1):
                    cand = {name: _shift_lane(arr, dxo)
                            for name, arr in row.items()}
                    self_slot = ((slot_iota == j)
                                 if (dy == 0 and dxo == 0) else None)
                    acc = _pair_accum(acc, ctr, cand, phys, self_slot)
            return acc
        return body

    if jcen is None or k <= 8:
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)
        accx, accy = jax.lax.fori_loop(0, jmax,
                                       make_body(center, slot_iota),
                                       (accx, accy))
    else:
        # Slot-split, BRANCH form (VERDICT round-4 ask #1 redux).  The
        # measured settled occupancy at bench density is strongly
        # sub-Poisson but sits at 9-11 (scripts/ab_pair_split.py --stats:
        # p(center bound > 8) = 0.966, K = 14), so a run-both-halves
        # split would pay 2 x 0.58 + duplicated candidate prep nearly
        # everywhere — a regression.  Instead each block takes exactly
        # ONE path: blocks whose CENTER-row bound fits one sublane tile
        # (jcen <= 8) run the pair loop on center slots [0:8] only
        # ([rb, 8, NXL] ops measure 0.58x of [rb, 16, NXL] — PLAN.md
        # narrow-op curve); all others run the ORIGINAL unsplit loop,
        # bit-for-bit, with no duplicated work.  Cost factor
        # (1-p) * 0.58 + p * 1.0: never worse than unsplit (two scalar
        # branches), a ~1.7x pair-pass win on sparse / low-density /
        # evacuation-endgame blocks — the empty-block skip's discipline
        # extended from "no agents" to "no crowded cell".
        # Outputs are BIT-identical either way: slots >= the center
        # bound are inactive (topcnt covers holes on the incremental
        # path), and every outbuf channel of an inactive slot is
        # keep-gated passthrough.
        k_lo = 8
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (1, k_lo, 1), 1)
        iota_full = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)

        @pl.when(jcen <= k_lo)
        def _pairs_one_tile():
            ctr_lo = {n: a[:, :k_lo, :] for n, a in center.items()}
            lo = jax.lax.fori_loop(
                0, jmax, make_body(ctr_lo, iota_lo),
                (accx[:, :k_lo, :], accy[:, :k_lo, :]))
            acc_scr[:, :k_lo, 0, :] = lo[0]
            acc_scr[:, :k_lo, 1, :] = lo[1]
            # hi slots are all inactive here: pass the goal/obstacle
            # term through so integrate sees finite values (keep-gated).
            acc_scr[:, k_lo:, 0, :] = accx[:, k_lo:, :]
            acc_scr[:, k_lo:, 1, :] = accy[:, k_lo:, :]

        @pl.when(jcen > k_lo)
        def _pairs_full():
            full = jax.lax.fori_loop(
                0, jmax, make_body(center, iota_full), (accx, accy))
            acc_scr[:, :, 0, :] = full[0]
            acc_scr[:, :, 1, :] = full[1]

        accx = acc_scr[:, :, 0, :]
        accy = acc_scr[:, :, 1, :]

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
    if cell_unit is None:
        outbuf[:, :, 7, :] = jnp.stack(pots[1 : 1 + rb])
    else:
        # Incremental-rebin mode: channel 7 carries the STAY mask (active
        # AND integrated position still in its own cell) instead of the
        # sampled potential, and the mover mask parks in act_scr rows
        # [0, rb) (the pair pass is done with them) for the mover pass.
        # Classification math must match the rebin's EXACTLY (f32 divide
        # then floor, ops/pallas/rebin.py) so both kernels agree on who
        # moved at cell boundaries.
        lane3 = lane[:, None, :]  # [1, 1, nxl] global lane coordinate
        rowc = (jax.lax.broadcasted_iota(jnp.int32, (rb, 1, 1), 0)
                .astype(jnp.float32) + r0)
        same = jnp.where(
            (jnp.floor(npx / cell_unit) + 1.0 == lane3)
            & (jnp.floor(npy / cell_unit) == rowc),
            1.0, 0.0)
        stay = act_c * same
        outbuf[:, :, 7, :] = stay
        for w in range(rb):
            act_scr[w] = act_c[w] * (1.0 - same[w])


def _mover_pass(i, jmax, act_scr, outbuf, mbuf, movf_ref, mdmx_ref, *,
                rb: int, mk: int):
    """Compact this block's movers (mask in act_scr rows [0, rb), values
    in outbuf) into per-cell mover-table rows in ``mbuf``.

    One one-hot MAC per source slot at MK(=8) sublane width — ~0.35x the
    cost of a K-wide op — so the rebin can walk 9*mmax mover candidates
    instead of 9*jmax occupants (rebin_incremental).  Channel 7 = per-cell
    mover count (clamped to MK); movers beyond MK are dropped FROM THE
    TABLE ONLY and reported via movf — the step falls back to the full
    rebin for that step, so no agent is ever lost."""
    nxl = outbuf.shape[-1]
    mk_iota = jax.lax.broadcasted_iota(jnp.int32, (1, mk, 1), 1).astype(
        jnp.float32)
    mcnt0 = jnp.zeros((rb, 1, nxl), jnp.float32)
    mouts0 = tuple(jnp.zeros((rb, mk, nxl), jnp.float32) for _ in range(6))

    def body(j, carry):
        mcnt, *mouts = carry
        mvj = act_scr[0:rb, pl.ds(j, 1), :]
        onehot = jnp.where(mk_iota == mcnt, mvj, 0.0)
        vals = [outbuf[:, pl.ds(j, 1), c, :] for c in range(6)]
        mouts = [o + onehot * v for o, v in zip(mouts, vals)]
        return (mcnt + mvj, *mouts)

    mcnt, *mouts = jax.lax.fori_loop(0, jmax, body, (mcnt0, *mouts0))
    for c in range(6):
        mbuf[:, :, c, :] = mouts[c]
    mbuf[:, :, 6, :] = jnp.where(mk_iota < mcnt, 1.0, 0.0)
    mbuf[:, :, 7, :] = jnp.broadcast_to(
        jnp.minimum(mcnt, float(mk)), (rb, mk, nxl))
    movf_ref[i] = jnp.sum(jnp.maximum(mcnt - float(mk), 0.0))
    mdmx_ref[i] = jnp.max(mcnt)


def fused_step_kernel(d: jnp.ndarray, fwp: jnp.ndarray, fobs: jnp.ndarray,
                      phys: Physics, grid_size: tuple[float, float],
                      row_block: int = 4, interpret: bool = False,
                      jmax: jnp.ndarray | None = None,
                      row_offset: jnp.ndarray | None = None,
                      col_offset: jnp.ndarray | None = None,
                      stride: int = STRIDE,
                      field_unit: float = 0.25,
                      segments: tuple | None = None,
                      emit_movers: int = 0,
                      wp_planes: tuple | None = None,
                      wp_slots: int = 4,
                      jcen: jnp.ndarray | None = None) -> jnp.ndarray:
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
    emit_movers: 0 (default) returns OUT alone with channel 7 = sampled
    potential; MK > 0 switches channel 7 to the STAY mask and returns
    (OUT, M [ny_pad+2, MK, 8, NXL] compacted per-cell mover table with
    ch 7 = mover count, movf [nb] table-overflow counts, mdmx [nb] peak
    mover demand) — the inputs of ops/pallas/rebin.rebin_incremental.
    wp_planes: optional (idx [nb, n_wp] i32, cnt [nb] i32) from
    ``waypoint_block_planes`` — enables the per-block waypoint-plane
    slot walk (each block DMAs + samples ONLY the cnt[b] planes in its
    compacted wanted list, via a dynamic-trip fori — no per-plane
    branches).  None or n_wp == 1 leaves the kernel byte-identical to
    the ungated build.
    wp_slots: plane slab ring size under the slot walk — VMEM holds at
    most min(n_wp, wp_slots) plane slabs per buffer (wanted rank s in
    slot s % wp_slots), so the footprint is O(1) in waypoint count like
    the reference's host-RAM potential maps (field.rs:235-239).  Blocks
    wanting more than wp_slots planes serialize the extras' DMA behind
    sampling; typical destination-clustered blocks want 1-2.
    jcen: optional [nb] i32 CENTER-row occupancy bound (max count-channel
    value over each block's rb center rows, sfm_grid.occupancy_bounds)
    — enables the pair-pass slot-split BRANCH: a block whose center
    bound fits one sublane tile (<= 8) runs the pair loop on center
    slots [0:8] only (0.58x); all others run the original unsplit loop.
    Output bit-identical with or without (inactive slots are keep-gated
    passthrough); ignored at K <= 8.
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

    wp_skip = wp_planes is not None and n_wp > 1
    split = jcen is not None and k > 8
    if split:
        assert jcen.shape == (nb,) and jcen.dtype == jnp.int32, (
            jcen.shape, jcen.dtype, nb)
    mk = emit_movers
    if wp_skip:
        wp_idx, wp_cnt = wp_planes
        assert wp_idx.shape == (nb, n_wp) and wp_idx.dtype == jnp.int32, (
            wp_idx.shape, wp_idx.dtype, (nb, n_wp))
        assert wp_cnt.shape == (nb,) and wp_cnt.dtype == jnp.int32, (
            wp_cnt.shape, wp_cnt.dtype, nb)
    # Without the slot walk every plane is one slab DMA with its own
    # resident buffer (ring == n_wp); with it the ring caps residency at
    # wp_slots slabs.
    ring = min(n_wp, max(1, wp_slots)) if wp_skip else n_wp

    kernel = functools.partial(
        _kernel, rb=rb, k=k, mk=mk, wp_skip=wp_skip, n_wp=n_wp, ring=ring,
        phys=phys,
        grid_w=grid_size[0], grid_h=grid_size[1],
        stride=stride, inv_unit=1.0 / field_unit,
        cell_unit=stride * field_unit, segments=segments, split=split,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = ([smem, smem, smem] + ([smem] if split else [])
                + ([smem, smem] if wp_skip else []) + [any_] * 3)
    args = ((jmax, row_offset, col_offset)
            + ((jcen,) if split else ())
            + ((wp_idx, wp_cnt) if wp_skip else ()) + (d, fwp, fobs))
    if mk:
        out_specs = [any_, any_,
                     pl.BlockSpec((nb,), lambda i: (0,),
                                  memory_space=pltpu.SMEM),
                     pl.BlockSpec((nb,), lambda i: (0,),
                                  memory_space=pltpu.SMEM)]
        out_shape = [
            jax.ShapeDtypeStruct((ny_pad + 2, k, 8, nxl), jnp.float32),
            jax.ShapeDtypeStruct((ny_pad + 2, mk, 8, nxl), jnp.float32),
            jax.ShapeDtypeStruct((nb,), jnp.float32),
            jax.ShapeDtypeStruct((nb,), jnp.float32),
        ]
    else:
        out_specs = any_
        out_shape = jax.ShapeDtypeStruct((ny_pad + 2, k, 8, nxl),
                                         jnp.float32)
    scratch = [
        pltpu.VMEM((2, rb + 2, k, 8, nxl), jnp.float32),
        pltpu.VMEM((2, ring, flen, stride, N_CH, nxl), jnp.float32),
        pltpu.VMEM((2, flen, stride, N_CH, nxl), jnp.float32),
        pltpu.VMEM((rb + 2, k, nxl), jnp.float32),
        pltpu.VMEM((rb, k, 8, nxl), jnp.float32),
    ]
    if split:
        scratch.append(pltpu.VMEM((rb, k, 2, nxl), jnp.float32))
    if mk:
        scratch.append(pltpu.VMEM((rb, mk, 8, nxl), jnp.float32))
    if wp_skip:
        scratch += [pltpu.VMEM((rb + 2, k, nxl), jnp.float32),
                    pltpu.VMEM((rb, k, nxl), jnp.float32),
                    pltpu.VMEM((rb, k, nxl), jnp.float32)]
    scratch.append(pltpu.SemaphoreType.DMA((2, 3)))
    if wp_skip:
        scratch.append(pltpu.SemaphoreType.DMA((2, ring)))
    scratch.append(pltpu.SemaphoreType.DMA)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def waypoint_block_mask(d: jnp.ndarray, row_block: int,
                        n_wp: int) -> jnp.ndarray | None:
    """Per-block wanted-waypoint-plane bitmask for the waypoint skip.

    The reference samples exactly ONE potential map per agent
    (sfm.rs:107, field.rs:235-239 — O(1) in waypoint count); the fused
    kernel's lane-parallel sampling instead visits every plane.  This
    mask restores the asymptotics at block granularity: bit p of word
    ``out[b, p // 31]`` is set iff any ACTIVE agent in block b's
    (rb+2)-row window has dest == p, so the kernel runs plane p's slab
    DMA + 64-tap pass only where someone actually wants it.  In
    destination-clustered crowds (evacuation.toml's 33 waypoints feeding
    distinct exits) each block wants ~1-2 planes.

    Cost: one act/dest channel read + an OR-reduce — O(grid), no index
    ops; the shifted-slice window OR matches how block b's window rows
    are b*rb .. b*rb+rb+1 of d (ghost rows included, they are zero).
    31 planes per word keeps the shift off the i32 sign bit.
    """
    if n_wp <= 1:
        return None
    ny2 = d.shape[0]
    rb = row_block
    nb = (ny2 - 2) // rb
    act = d[:, :, 6, :] > 0.5
    dest = d[:, :, 5, :].astype(jnp.int32)
    words = []
    for w in range((n_wp + 30) // 31):
        lo = w * 31
        bits = jnp.where(
            act & (dest >= lo) & (dest < lo + 31),
            jnp.left_shift(jnp.int32(1), jnp.clip(dest - lo, 0, 30)),
            jnp.int32(0))
        rowbits = jax.lax.reduce(bits, jnp.int32(0), jax.lax.bitwise_or,
                                 (1, 2))  # [ny2]
        blk = jax.lax.slice(rowbits, (0,), ((nb - 1) * rb + 1,), (rb,))
        for off in range(1, rb + 2):
            blk = blk | jax.lax.slice(rowbits, (off,),
                                      (off + (nb - 1) * rb + 1,), (rb,))
        words.append(blk)
    return jnp.stack(words, axis=1)  # [nb, ceil(n_wp/31)]


def waypoint_block_planes(d: jnp.ndarray, row_block: int, n_wp: int,
                          force_all: bool = False
                          ) -> tuple[jnp.ndarray, jnp.ndarray] | None:
    """Per-block compacted wanted-plane lists for the slot walk.

    Returns (idx [nb, n_wp] i32, cnt [nb] i32): idx[b, :cnt[b]] are the
    ascending plane ids some ACTIVE agent in block b's (rb+2)-row window
    is bound for; entries past cnt[b] are zero-padded and never read
    (the kernel's slot fori trips exactly cnt[b] times).  None at
    n_wp <= 1 (the gate is statically off — the single plane is sampled
    unconditionally, bit-identical to the ungated kernel).

    The wanted bits come from waypoint_block_mask (one O(grid) pass per
    31 planes, no index ops); the unpack/compact below is O(nb · n_wp²)
    on ~100-element rows — microseconds.  ``force_all`` builds the
    attribution arm (every block wants every plane — same sampling work
    as skip-off through the gated machinery; ab_wp_curve --decompose).
    """
    if n_wp <= 1:
        return None
    if force_all:
        nb = (d.shape[0] - 2) // row_block
        return (jnp.broadcast_to(jnp.arange(n_wp, dtype=jnp.int32),
                                 (nb, n_wp)),
                jnp.full((nb,), n_wp, jnp.int32))
    words = waypoint_block_mask(d, row_block, n_wp)  # [nb, ceil(n_wp/31)]
    planes = jnp.arange(n_wp, dtype=jnp.int32)
    wanted = (jax.lax.shift_right_logical(
        words[:, planes // 31], (planes % 31)[None, :]) & 1)  # [nb, n_wp]
    cnt = jnp.sum(wanted, axis=1, dtype=jnp.int32)
    rank = jnp.cumsum(wanted, axis=1, dtype=jnp.int32) - 1  # [nb, n_wp]
    # idx[b, s] = the plane with rank s: one-hot contraction over p.
    hit = (wanted[:, None, :] > 0) & (rank[:, None, :] == planes[None, :, None])
    idx = jnp.sum(jnp.where(hit, planes[None, None, :], 0),
                  axis=2, dtype=jnp.int32)  # [nb, n_wp]
    return idx, cnt
