"""Exact-value tests of the force math against hand-computed references
(the numbers below are worked out by hand from sfm.rs:104-254)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pedoni_tpu.ops import forces as F
from pedoni_tpu.physics import Physics

PHYS = Physics()


def test_goal_force_exact():
    # acc = (e * v0 - v) / 0.5   (sfm.rs:107-109)
    e = jnp.array([[1.0, 0.0]])
    vel = jnp.array([[0.3, 0.1]])
    speed = jnp.array([1.5])
    acc = np.asarray(F.goal_force(e, vel, speed, PHYS))
    np.testing.assert_allclose(acc, [[(1.5 - 0.3) / 0.5, -0.1 / 0.5]], rtol=1e-6)


def test_pairwise_force_head_on_exact():
    # A at origin moving +x; B at (1, 0) moving -x.  Hand computation:
    #   diff = (-1, 0); d = 1; t1 = (-0.9, 0); t2 = 1.9
    #   b = sqrt(1.9^2 - 0.1^2)/2 = sqrt(3.6)/2
    #   nabla_b = 1.9 * (-2, 0) / (4 b)
    #   force = 7 * exp(-b/0.3) * nabla_b   (B in front of A -> no damping)
    b = np.sqrt(3.6) / 2
    fx = 7.0 * np.exp(-b / 0.3) * 1.9 * (-2.0) / (4 * b)

    pos = jnp.array([[0.0, 0.0]])
    vel = jnp.array([[1.0, 0.0]])
    e = jnp.array([[1.0, 0.0]])
    cand_pos = jnp.array([[[1.0, 0.0]]])
    cand_vel = jnp.array([[[-1.0, 0.0]]])
    valid = jnp.array([[True]])
    acc = np.asarray(F.pairwise_force(pos, vel, e, cand_pos, cand_vel, valid, PHYS))
    np.testing.assert_allclose(acc, [[fx, 0.0]], rtol=1e-5, atol=1e-7)


def test_pairwise_fov_damping():
    # Candidate directly BEHIND the agent (relative to its goal direction):
    # the push it exerts points forward; e . (-f) = -|f| < |f| cos(100deg),
    # so the force is halved (sfm.rs:149-151).
    pos = jnp.array([[0.0, 0.0]])
    vel = jnp.array([[0.0, 0.0]])
    e = jnp.array([[1.0, 0.0]])  # looking +x
    behind = jnp.array([[[-1.0, 0.0]]])  # candidate at -x
    still = jnp.zeros((1, 1, 2))
    valid = jnp.array([[True]])
    acc_behind = np.asarray(
        F.pairwise_force(pos, vel, e, behind, still, valid, PHYS)
    )
    # Same geometry but looking the other way: candidate in front.
    e2 = jnp.array([[-1.0, 0.0]])
    acc_front = np.asarray(
        F.pairwise_force(pos, vel, e2, behind, still, valid, PHYS)
    )
    np.testing.assert_allclose(acc_behind, acc_front * 0.5, rtol=1e-6)


def test_pairwise_cutoff():
    # Beyond 2 m: no force (sfm.rs:133).
    pos = jnp.zeros((1, 2))
    vel = jnp.zeros((1, 2))
    e = jnp.array([[1.0, 0.0]])
    cand_pos = jnp.array([[[2.001, 0.0]]])
    acc = np.asarray(F.pairwise_force(pos, vel, e, cand_pos,
                                      jnp.zeros((1, 1, 2)),
                                      jnp.array([[True]]), PHYS))
    np.testing.assert_array_equal(acc, 0.0)
    # Just inside: nonzero.
    cand_pos = jnp.array([[[1.999, 0.0]]])
    acc = np.asarray(F.pairwise_force(pos, vel, e, cand_pos,
                                      jnp.zeros((1, 1, 2)),
                                      jnp.array([[True]]), PHYS))
    assert abs(acc[0, 0]) > 0


def test_obstacle_force_exact():
    # force = 2.0 * exp(-d / 0.2) * (-normalize(sobel))   (sfm.rs:188-192)
    dist = jnp.array([0.4])
    grad = jnp.array([[3.0, 4.0]])  # sobel (downhill, toward obstacle)
    acc = np.asarray(F.obstacle_force(dist, grad, PHYS))
    mag = 2.0 * np.exp(-0.4 / 0.2)
    np.testing.assert_allclose(acc, [[-mag * 0.6, -mag * 0.8]], rtol=1e-5)


def test_integrate_exact_and_clamp():
    # v' = clamp(v + a dt, 1.3 v0); x' = x + (v' + v) dt/2  (sfm.rs:245-254)
    pos = jnp.array([[1.0, 1.0]])
    vel = jnp.array([[1.0, 0.0]])
    acc = jnp.array([[2.0, 0.0]])
    speed = jnp.array([1.0])
    active = jnp.array([True])
    p, v = F.integrate(pos, vel, acc, speed, active, PHYS)
    np.testing.assert_allclose(np.asarray(v), [[1.2, 0.0]], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p), [[1.0 + (1.2 + 1.0) * 0.05, 1.0]],
                               rtol=1e-6)
    # Clamp: huge acceleration saturates at 1.3 * v0.
    p2, v2 = F.integrate(pos, vel, jnp.array([[100.0, 0.0]]), speed, active, PHYS)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v2)), 1.3, rtol=1e-6)
    # Inactive agents never move.
    p3, v3 = F.integrate(pos, vel, acc, speed, jnp.array([False]), PHYS)
    np.testing.assert_array_equal(np.asarray(p3), np.asarray(pos))


def test_segment_obstacle_force_matches_distance_form():
    # A point near a long wall: the per-segment force direction and
    # magnitude follow the nearest-edge rule (sfm.rs:194-237).
    pos = jnp.array([[5.0, 3.0]])
    p0 = jnp.array([[0.0, 4.0]])
    p1 = jnp.array([[10.0, 4.0]])
    w = jnp.array([0.5])
    acc = np.asarray(F.segment_obstacle_force(pos, p0, p1, w, PHYS))
    # Wall edge at y = 3.75 -> distance 0.75, pushed in -y.
    mag = 2.0 * np.exp(-0.75 / 0.2)
    np.testing.assert_allclose(acc, [[0.0, -mag]], rtol=1e-4, atol=1e-8)
