"""Social-force computation (JAX, fully vectorized).

The physics of the reference's hot loop (sfm.rs:91-255), reshaped for the
VPU: per-agent scalar loops become masked lane-wise math over fixed-shape
candidate sets.

Force terms per agent (all constants from Physics, defaults = reference):

- goal        (sfm.rs:107-109): ``e = normalize(sobel(potential))``;
              ``acc += (e * v0 - v) / tau``.  The Sobel sign convention makes
              ``e`` point downhill, toward the destination.
- pairwise    (sfm.rs:131-153): elliptical Helbing repulsion with a 2 m
              cutoff and 100-degree field-of-view damping.
- obstacle    (sfm.rs:188-192): exponential repulsion along the negative
              obstacle-distance gradient.

Integration   (sfm.rs:245-254): trapezoidal with speed clamp at 1.3 * v0.

Numerical care: every division is guarded so masked-out lanes never produce
NaN/Inf that could leak through ``where`` (standard JAX practice the scalar
reference never needed).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..physics import Physics

EPS = 1e-12


def safe_norm(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis), EPS))


def safe_normalize(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return v / safe_norm(v, axis=axis)[..., None]


def goal_force(e: jnp.ndarray, vel: jnp.ndarray, desired_speed: jnp.ndarray,
               phys: Physics) -> jnp.ndarray:
    """Acceleration toward the destination (sfm.rs:107-109).

    ``e`` is the unit downhill direction of the destination's potential.
    """
    return (e * desired_speed[:, None] - vel) / phys.relaxation_time


def pairwise_force(pos: jnp.ndarray, vel: jnp.ndarray, e: jnp.ndarray,
                   cand_pos: jnp.ndarray, cand_vel: jnp.ndarray,
                   cand_valid: jnp.ndarray, phys: Physics) -> jnp.ndarray:
    """Summed repulsion from candidate neighbors.

    Shapes: pos/vel/e are [N, 2]; cand_* are [N, M, 2] / [N, M].
    Faithful to sfm.rs:129-153:

      diff = pos_self - pos_other;  skip if |diff|^2 > cutoff^2
      t1 = diff - vel_other * dt;  t2 = |diff| + |t1|
      b = 0.5 * sqrt(t2^2 - (|vel_other| * dt)^2)        # ellipse semi-axis
      grad_b = t2 * (diff/|diff| + t1/|t1|) / (4 b)
      f = strength * exp(-b / range) * grad_b
      if e . (-f) < |f| * cos_phi:  f *= 0.5              # outside FOV
    """
    dt = phys.delta_time
    diff = pos[:, None, :] - cand_pos  # [N, M, 2]
    d2 = jnp.sum(diff * diff, axis=-1)
    valid = cand_valid & (d2 <= phys.cutoff_sq)

    d = jnp.sqrt(jnp.maximum(d2, EPS))
    direction = diff / d[..., None]

    t1 = diff - cand_vel * dt
    t1_len = safe_norm(t1)
    t2 = d + t1_len
    vlen = safe_norm(cand_vel)
    b_sq = t2 * t2 - (vlen * dt) ** 2
    b = jnp.sqrt(jnp.maximum(b_sq, EPS)) * 0.5

    nabla_b = t2[..., None] * (direction + t1 / t1_len[..., None]) / (4.0 * b[..., None])
    force = phys.ped_strength * jnp.exp(-b / phys.ped_range)[..., None] * nabla_b

    # Field-of-view anisotropy (sfm.rs:149-151).
    f_len = safe_norm(force)
    in_front = jnp.sum(e[:, None, :] * (-force), axis=-1) >= f_len * phys.cos_phi
    force = jnp.where(in_front[..., None], force, force * phys.fov_damping)

    force = jnp.where(valid[..., None], force, 0.0)
    return jnp.sum(force, axis=1)


def obstacle_force(dist: jnp.ndarray, dist_grad: jnp.ndarray,
                   phys: Physics) -> jnp.ndarray:
    """Repulsion away from the nearest obstacle (sfm.rs:188-192).

    ``dist`` [N] is the sampled obstacle distance, ``dist_grad`` [N, 2] the
    sampled Sobel of the distance map.  The Sobel points downhill (toward
    the obstacle), so the repulsion direction is its negation — matching the
    reference's ``-field.get_obstacle_distance_grad(pos).normalize()``.
    """
    direction = -safe_normalize(dist_grad)
    magnitude = phys.obs_strength * jnp.exp(-dist / phys.obs_range)
    return magnitude[:, None] * direction


def segment_obstacle_force(pos: jnp.ndarray, seg_p0: jnp.ndarray,
                           seg_p1: jnp.ndarray, seg_width: jnp.ndarray,
                           phys: Physics) -> jnp.ndarray:
    """Exact per-segment obstacle force — the reference's fallback when the
    distance map is disabled (sfm.rs:194-237, --no-distance-map).

    For each obstacle rectangle (segment widened by ``width``), the force
    comes from the nearest of its 4 edges, unless the agent is inside the
    rectangle (then that obstacle is skipped).
    Shapes: pos [N, 2]; seg_* [O, 2] / [O].  Returns [N, 2].
    """
    d = seg_p1 - seg_p0  # [O, 2]
    h = safe_norm(d)
    a = d / h[:, None]
    n = jnp.stack([a[:, 1], -a[:, 0]], axis=-1) * (seg_width * 0.5)[:, None]

    # 4 edges per rectangle, as in sfm.rs:199-205.
    e0 = jnp.stack([seg_p0 + n, seg_p0 - n], axis=1)  # [O, 2pts, 2]
    e1 = jnp.stack([seg_p1 + n, seg_p1 - n], axis=1)
    e2 = jnp.stack([seg_p0 + n, seg_p1 + n], axis=1)
    e3 = jnp.stack([seg_p0 - n, seg_p1 - n], axis=1)
    edges = jnp.stack([e0, e1, e2, e3], axis=1)  # [O, 4, 2pts, 2]

    p = pos[:, None, None, :]  # [N, 1, 1, 2]
    q0 = edges[None, :, :, 0, :]  # [1, O, 4, 2]
    q1 = edges[None, :, :, 1, :]
    seg = q1 - q0
    seg_len2 = jnp.maximum(jnp.sum(seg * seg, axis=-1), EPS)
    t = jnp.clip(jnp.sum((p - q0) * seg, axis=-1) / seg_len2, 0.0, 1.0)
    diffs = p - (q0 + t[..., None] * seg)  # [N, O, 4, 2]
    dists = safe_norm(diffs)  # [N, O, 4]

    # Inside test (sfm.rs:211-216): d0 < w && d1 < w && d2 < h && d3 < h.
    w_ = seg_width[None, :]
    h_ = h[None, :]
    inside = (
        (dists[:, :, 0] < w_) & (dists[:, :, 1] < w_)
        & (dists[:, :, 2] < h_) & (dists[:, :, 3] < h_)
    )

    min_idx = jnp.argmin(dists, axis=-1)  # [N, O]
    min_d = jnp.take_along_axis(dists, min_idx[..., None], axis=-1)[..., 0]
    min_diff = jnp.take_along_axis(
        diffs, min_idx[..., None, None], axis=-2
    )[..., 0, :]
    direction = min_diff / jnp.maximum(min_d, EPS)[..., None]

    force = (phys.obs_strength * jnp.exp(-min_d / phys.obs_range))[..., None] * direction
    force = jnp.where(inside[..., None], 0.0, force)
    return jnp.sum(force, axis=1)


def integrate(pos: jnp.ndarray, vel: jnp.ndarray, acc: jnp.ndarray,
              desired_speed: jnp.ndarray, active: jnp.ndarray,
              phys: Physics) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Trapezoidal update with speed clamp (sfm.rs:245-254)."""
    dt = phys.delta_time
    vel_prev = vel
    vel_new = vel + acc * dt
    vmax = desired_speed * phys.max_speed_factor
    speed = safe_norm(vel_new)
    scale = jnp.minimum(1.0, vmax / jnp.maximum(speed, EPS))
    vel_new = vel_new * scale[:, None]
    pos_new = pos + (vel_new + vel_prev) * (dt * 0.5)
    keep = active[:, None]
    return jnp.where(keep, pos_new, pos), jnp.where(keep, vel_new, vel)
