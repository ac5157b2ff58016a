"""Device-side field sampling (JAX).

Runtime counterpart of the reference's per-agent field queries
(field.rs:235-258 + util.rs:44-75).  All maps are pre-padded with PAD rings
of the out-of-bounds value 1e12 (see pedoni_tpu/field.py), so sampling is a
branch-free 4-tap bilinear gather; gradients read the pre-convolved Sobel
maps instead of doing 8 bilinear taps per agent per map.

Coordinates: world position ``pos`` (meters) maps to unpadded grid coords
``pos / unit - 0.5`` (field.rs:236 half-cell offset); add PAD for the padded
arrays.  Out-of-range positions clamp into the 1e12 ring, reproducing the
reference's OOB semantics for any excursion up to PAD-1 cells (beyond that
the agent has already been despawned for leaving the neighbor grid).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..field import PAD, FieldMaps


class DeviceField(NamedTuple):
    """Field maps as device arrays.  Shapes: pot* are [n_wp, Hp, Wp],
    dist* are [Hp, Wp]; all float32, padded by PAD rings of 1e12."""

    pot: jnp.ndarray
    pot_gx: jnp.ndarray
    pot_gy: jnp.ndarray
    dist: jnp.ndarray
    dist_gx: jnp.ndarray
    dist_gy: jnp.ndarray

    @classmethod
    def from_maps(cls, maps: FieldMaps) -> "DeviceField":
        return cls(
            pot=jnp.asarray(maps.pot),
            pot_gx=jnp.asarray(maps.pot_gx),
            pot_gy=jnp.asarray(maps.pot_gy),
            dist=jnp.asarray(maps.dist),
            dist_gx=jnp.asarray(maps.dist_gx),
            dist_gy=jnp.asarray(maps.dist_gy),
        )


def grid_coords(pos: jnp.ndarray, unit: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World position [N, 2] -> padded grid coords (px, py), each [N]."""
    px = pos[..., 0] / unit - 0.5 + PAD
    py = pos[..., 1] / unit - 0.5 + PAD
    return px, py


def bilinear(flat: jnp.ndarray, wp: int, hp: int, base: jnp.ndarray | int,
             px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """4-tap bilinear gather from a flattened padded map.

    ``flat`` is the map raveled to 1D (possibly a stack: ``base`` selects the
    per-agent plane offset, e.g. destination * Hp * Wp).  Coordinates beyond
    the padded extent clamp onto the 1e12 ring, matching util.rs:44-58.
    """
    px = jnp.clip(px, 0.0, wp - 1.001)
    py = jnp.clip(py, 0.0, hp - 1.001)
    bx = jnp.floor(px)
    by = jnp.floor(py)
    tx = px - bx
    ty = py - by
    ix = bx.astype(jnp.int32)
    iy = by.astype(jnp.int32)
    i00 = base + iy * wp + ix
    v00 = jnp.take(flat, i00)
    v01 = jnp.take(flat, i00 + 1)
    v10 = jnp.take(flat, i00 + wp)
    v11 = jnp.take(flat, i00 + wp + 1)
    top = v00 + tx * (v01 - v00)
    bot = v10 + tx * (v11 - v10)
    return top + ty * (bot - top)


def sample_scalar(stack: jnp.ndarray, plane: jnp.ndarray | int,
                  pos: jnp.ndarray, unit: float) -> jnp.ndarray:
    """Sample a (stacked) scalar map at world positions.

    ``stack`` is [n_planes, Hp, Wp] or [Hp, Wp]; ``plane`` selects the plane
    per agent (e.g. destination waypoint id), ignored for 2D stacks.
    """
    if stack.ndim == 2:
        hp, wp = stack.shape
        base = 0
    else:
        _, hp, wp = stack.shape
        base = plane * (hp * wp)
    px, py = grid_coords(pos, unit)
    return bilinear(stack.reshape(-1), wp, hp, base, px, py)


def sample_grad(stack_gx: jnp.ndarray, stack_gy: jnp.ndarray,
                plane: jnp.ndarray | int, pos: jnp.ndarray,
                unit: float) -> jnp.ndarray:
    """Sample the Sobel (negative-)gradient of a map: returns [N, 2].

    Equivalent to the reference's ``sobel_filter`` at the same position
    (util.rs:61-75) — points downhill, toward decreasing values.
    """
    gx = sample_scalar(stack_gx, plane, pos, unit)
    gy = sample_scalar(stack_gy, plane, pos, unit)
    return jnp.stack([gx, gy], axis=-1)
