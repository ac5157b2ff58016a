"""Device-side field sampling (JAX).

Runtime counterpart of the reference's per-agent field queries
(field.rs:235-258 + util.rs:44-75).  All maps are pre-padded with PAD rings
of the out-of-bounds value 1e12 (see pedoni_tpu/field.py); gradients read
pre-convolved Sobel maps instead of 8 bilinear taps per agent per map.

TPU cost model: XLA gathers on TPU are scalar-unit bound (~10 cycles per
index), so the layout packs all channels of a map *channel-last* and every
agent fetches one (2, 2, 4) patch — a single indexed slice delivering all
four bilinear taps of all channels at once.  Two patch fetches per agent
(destination potential stack + obstacle stack) replace the reference's 64+
scalar map reads (sfm.rs:107, 188-190 via util.rs:61-75).

Coordinates: world position ``pos`` (meters) maps to unpadded grid coords
``pos / unit - 0.5`` (field.rs:236 half-cell offset); add PAD for the padded
arrays.  Out-of-range positions clamp into the 1e12 ring, reproducing the
reference's OOB semantics for any excursion up to PAD-1 cells (beyond that
the agent has already been despawned for leaving the neighbor grid).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import PAD, FieldMaps


class DeviceField(NamedTuple):
    """Packed, padded field maps as device arrays, flattened row-major so a
    bilinear tap is one row-gather of all 4 channels.

    - ``wp``  [n_wp * Hp * Wp, 4]: (potential, sobel_gx, sobel_gy, 0) per
      waypoint — goal navigation + despawn checks.
    - ``obs`` [Hp * Wp, 4]: (distance, sobel_gx, sobel_gy, 0) — obstacle
      repulsion.
    - ``hp``/``wp_cols``: padded map dims (static Python ints).
    """

    wp: jnp.ndarray
    obs: jnp.ndarray
    hp: int
    wp_cols: int

    @classmethod
    def from_maps(cls, maps: FieldMaps) -> "DeviceField":
        n_wp, hp, wp_cols = maps.pot.shape
        wp = np.stack(
            [maps.pot, maps.pot_gx, maps.pot_gy, np.zeros_like(maps.pot)],
            axis=-1,
        ).reshape(n_wp * hp * wp_cols, 4)
        obs = np.stack(
            [maps.dist, maps.dist_gx, maps.dist_gy, np.zeros_like(maps.dist)],
            axis=-1,
        ).reshape(hp * wp_cols, 4)
        return cls(wp=jnp.asarray(wp), obs=jnp.asarray(obs),
                   hp=hp, wp_cols=wp_cols)


def _patch_bilinear(flat: jnp.ndarray, hp: int, wp: int,
                    plane: jnp.ndarray | None, pos: jnp.ndarray,
                    unit: float) -> jnp.ndarray:
    """Bilinear-interpolate all channels of a packed map at world positions.

    ``flat`` is [(n_planes*)Hp*Wp, 4]; ``plane`` picks the plane per agent
    for stacked maps.  Returns [N, 4].  Four row-gathers per agent — each
    delivering all channels — instead of the reference's per-channel scalar
    taps (util.rs:44-58 semantics via the 1e12 padding + clamping).
    """
    px = jnp.clip(pos[:, 0] / unit - 0.5 + PAD, 0.0, wp - 1.001)
    py = jnp.clip(pos[:, 1] / unit - 0.5 + PAD, 0.0, hp - 1.001)
    bx = jnp.floor(px)
    by = jnp.floor(py)
    tx = (px - bx)[:, None]
    ty = (py - by)[:, None]
    base = by.astype(jnp.int32) * wp + bx.astype(jnp.int32)
    if plane is not None:
        base = base + plane * (hp * wp)

    v00 = jnp.take(flat, base, axis=0)
    v01 = jnp.take(flat, base + 1, axis=0)
    v10 = jnp.take(flat, base + wp, axis=0)
    v11 = jnp.take(flat, base + wp + 1, axis=0)

    top = v00 + tx * (v01 - v00)
    bot = v10 + tx * (v11 - v10)
    return top + ty * (bot - top)


def sample_waypoint(field: DeviceField, dest: jnp.ndarray, pos: jnp.ndarray,
                    unit: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Potential value [N] and its Sobel (negative-)gradient [N, 2] of each
    agent's destination map at its position."""
    v = _patch_bilinear(field.wp, field.hp, field.wp_cols, dest, pos, unit)
    return v[:, 0], v[:, 1:3]


def sample_obstacle(field: DeviceField, pos: jnp.ndarray,
                    unit: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Obstacle distance [N] and its Sobel gradient [N, 2]."""
    v = _patch_bilinear(field.obs, field.hp, field.wp_cols, None, pos, unit)
    return v[:, 0], v[:, 1:3]
