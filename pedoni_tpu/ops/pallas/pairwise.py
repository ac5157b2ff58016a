"""Fused Pallas pairwise-force kernel over the cell grid.

Replaces the XLA dense pass (ops/forcepass.dense_pairwise) with a hand-tiled
TPU kernel.  Input layout is x-minor — ``D [ny_pad + 2, K, 8, NX]`` with the
column dim padded to a multiple of 128 — so every vector op runs with the
wide field dimension in the 128-lane axis (the natural ``[.., K]``-minor
layout would waste 8x lanes) and every DMA slice is tile-aligned.

Per grid step (one block of ``rb`` cell rows):

1. async-copy the (overlapping) window of ``rb + 2`` rows HBM -> VMEM
   (row slicing only — rows are the outermost dim, always aligned);
2. for each of the 3 row offsets and each candidate slot j (fori loop),
   take the candidate lane-row and lane-``roll`` it for the -1/0/+1 column
   offsets, accumulating the Helbing repulsion onto all K center slots —
   pure [rb, K, NX] VPU arithmetic (sfm.rs:129-153 semantics: elliptical b,
   2 m cutoff, FOV damping, self-exclusion).  Roll wrap-around is harmless:
   wrapped candidates sit >2 m away (the cutoff kills them) or are inactive
   zero-ring entries;
3. write the [rb, K, 2, NX] acceleration block.

Channels (dim 2 of D): 0 pos.x, 1 pos.y, 2 vel.x, 3 vel.y, 4 e.x, 5 e.y,
6 active, 7 spare.  Cell (cy, cx) lives at row cy+1, column cx+1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...physics import Physics

EPS = 1e-12


def _pair_accum(acc, center, cand, phys: Physics, self_slot=None):
    """Accumulate repulsion of one candidate lane-array onto all centers.

    center: dict of [rb, K, NX] channel arrays; cand: dict of [rb, 1, NX].
    ``self_slot``: when not None, a [1, K, 1] bool mask that is True for the
    center slot equal to the candidate slot (same cell, k == j).

    Strength-reduced form of sfm.rs:129-153 (the VPU here is issue-bound
    at ~1.5e12 elem-ops/s and each rsqrt costs ~2 extra slots — see
    PLAN.md round-2 calibration — so every op counts): all norms via one
    rsqrt (x·rsqrt(x) == sqrt(x) to 1 ulp, lax.rsqrt is full precision on
    this TPU), and the FOV test divided through by the (positive) force
    magnitude AND squared so neither |force| nor |u| materializes:
    e·(−f) ≥ |f|·cosφ  ⇔  −(e·u) ≥ |u|·cosφ with f = mag·u, mag ≥ 0
                       ⇔  (e·u ≤ 0) ∨ ((e·u)² ≤ |u|²·cos²φ)  since cosφ < 0.

    Callers looping lane offsets over one candidate row may pass the
    offset-invariant products pre-computed ("vxdt" = vx·dt, "vydt" =
    vy·dt, "v2dtt" = (vx²+vy²)·dt²) instead of "vx"/"vy": elementwise
    math commutes with the lane roll, so hoisting is bit-exact while
    paying those 6 candidate-side ops once per row instead of per
    (row, dx offset).
    """
    dt = phys.delta_time
    dx = center["px"] - cand["px"]
    dy = center["py"] - cand["py"]
    d2 = dx * dx + dy * dy

    valid = (cand["act"] > 0.5) & (d2 <= phys.cutoff_sq)
    if self_slot is not None:
        valid = valid & jnp.logical_not(self_slot)

    vxdt = cand["vxdt"] if "vxdt" in cand else cand["vx"] * dt
    vydt = cand["vydt"] if "vydt" in cand else cand["vy"] * dt
    t1x = dx - vxdt
    t1y = dy - vydt
    t1l2 = t1x * t1x + t1y * t1y
    inv_d = jax.lax.rsqrt(jnp.maximum(d2, EPS))
    inv_t1l = jax.lax.rsqrt(jnp.maximum(t1l2, EPS))
    t2 = d2 * inv_d + t1l2 * inv_t1l  # d + |t1|
    if "v2dtt" in cand:
        v2dtt = cand["v2dtt"]
    else:
        v2dtt = (cand["vx"] * cand["vx"] + cand["vy"] * cand["vy"]) * (dt * dt)
    b2 = jnp.maximum(t2 * t2 - v2dtt, EPS)
    inv_b = jax.lax.rsqrt(b2)  # 1 / (2b)
    # mag/(4b) with b = sqrt(b2)/2: strength·exp(−b/σ)·t2 · inv_b/2
    mag = (0.5 * phys.ped_strength) * jnp.exp(
        (b2 * inv_b) * (-0.5 / phys.ped_range)
    ) * t2 * inv_b

    ux = dx * inv_d + t1x * inv_t1l
    uy = dy * inv_d + t1y * inv_t1l
    u2 = ux * ux + uy * uy
    eu = center["ex"] * ux + center["ey"] * uy
    assert phys.cos_phi < 0, "squared FOV test assumes an obtuse half-angle"
    # One-sided form of (eu <= 0) | (eu^2 <= u2 cos^2):  eu*|eu| folds the
    # sign through the square, so eu <= 0 makes the LHS non-positive and
    # the test vacuously true — exact, and one VPU op cheaper.
    in_front = eu * jnp.abs(eu) <= u2 * (phys.cos_phi * phys.cos_phi)

    w = jnp.where(valid, jnp.where(in_front, 1.0, phys.fov_damping), 0.0)
    m = w * mag
    return acc[0] + m * ux, acc[1] + m * uy


_CAND_CH = (("px", 0), ("py", 1), ("vx", 2), ("vy", 3), ("act", 6))


def _kernel(d_hbm, acc_ref, window, sem, *, rb: int, k: int, phys: Physics):
    i = pl.program_id(0)

    copy = pltpu.make_async_copy(d_hbm.at[pl.ds(i * rb, rb + 2)], window, sem)
    copy.start()
    copy.wait()

    center = {
        name: window[1 : 1 + rb, :, idx, :]
        for name, idx in (("px", 0), ("py", 1), ("vx", 2), ("vy", 3),
                          ("ex", 4), ("ey", 5))
    }

    accx = jnp.zeros_like(center["px"])
    accy = jnp.zeros_like(center["px"])

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)

    dt = phys.delta_time
    for dy in (-1, 0, 1):
        def body(j, acc, dy=dy):
            raw = {
                name: window[1 + dy : 1 + dy + rb, pl.ds(j, 1), idx, :]
                for name, idx in _CAND_CH
            }
            # dx-offset-invariant candidate products hoisted out of the
            # dxo loop (bit-exact: elementwise math commutes with roll).
            row = {
                "px": raw["px"], "py": raw["py"], "act": raw["act"],
                "vxdt": raw["vx"] * dt,
                "vydt": raw["vy"] * dt,
                "v2dtt": (raw["vx"] * raw["vx"] + raw["vy"] * raw["vy"])
                         * (dt * dt),
            }
            for dxo in (-1, 0, 1):
                cand = {
                    # circular roll; negative shifts expressed mod NX
                    name: pltpu.roll(arr, shift=(-dxo) % arr.shape[2], axis=2)
                    for name, arr in row.items()
                } if dxo else row
                self_slot = (slot_iota == j) if (dy == 0 and dxo == 0) else None
                acc = _pair_accum(acc, center, cand, phys, self_slot)
            return acc

        accx, accy = jax.lax.fori_loop(0, k, body, (accx, accy))

    acc_ref[:, :, 0, :] = accx
    acc_ref[:, :, 1, :] = accy


def pallas_pairwise(d: jnp.ndarray, phys: Physics, row_block: int = 4,
                    interpret: bool = False) -> jnp.ndarray:
    """Pairwise accelerations over the x-minor cell grid.

    ``d`` is [ny_pad + 2, K, 8, NX]; NX must be a multiple of 128 and
    ny_pad a multiple of ``row_block``.  Returns acc [ny_pad, K, 2, NX]
    (column c of the output corresponds to the same column of the input,
    i.e. cell cx sits at column cx + 1).
    """
    ny2, k, ch, nx128 = d.shape
    assert ch == 8
    assert nx128 % 128 == 0, nx128
    ny_pad = ny2 - 2
    rb = row_block
    assert ny_pad % rb == 0, (ny_pad, rb)
    nb = ny_pad // rb

    kernel = functools.partial(_kernel, rb=rb, k=k, phys=phys)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (rb, k, 2, nx128), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((ny_pad, k, 2, nx128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rb + 2, k, 8, nx128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(d)
