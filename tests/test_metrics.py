"""ADD / ADD-S metric tests."""

import numpy as np
import jax.numpy as jnp

from diffdope_tpu import geometry as geo
from diffdope_tpu.metrics import (
    add_auc,
    add_metric,
    adds_metric,
    object_diameter,
    rotation_angle_deg,
)


def test_add_identity_zero():
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32))
    r = jnp.eye(3)
    t = jnp.zeros(3)
    assert float(add_metric(pts, r, t, r, t)) < 1e-6
    assert float(adds_metric(pts, r, t, r, t)) < 1e-6


def test_add_pure_translation():
    pts = jnp.asarray(np.random.default_rng(1).normal(size=(50, 3)).astype(np.float32))
    r = jnp.eye(3)
    t0 = jnp.zeros(3)
    t1 = jnp.asarray([0.3, 0.0, 0.0])
    np.testing.assert_allclose(float(add_metric(pts, r, t1, r, t0)), 0.3, atol=1e-5)


def test_adds_less_than_add_for_symmetric():
    """A rotated ring: ADD is large, ADD-S ~ 0 (rotational symmetry)."""
    theta = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    pts = jnp.asarray(np.stack([np.cos(theta), np.sin(theta), 0 * theta], 1).astype(np.float32))
    r_gt = jnp.eye(3)
    ang = 2 * np.pi / 64 * 7  # multiple of the discrete symmetry
    r_est = jnp.asarray(geo.matrix33_from_quat(
        jnp.asarray(geo.quat_from_axis_angle(np.array([0, 0, 1.0]), ang))))
    t = jnp.zeros(3)
    add = float(add_metric(pts, r_est, t, r_gt, t))
    adds = float(adds_metric(pts, r_est, t, r_gt, t))
    assert add > 0.5
    assert adds < 1e-4


def test_batched_poses():
    pts = jnp.asarray(np.random.default_rng(2).normal(size=(30, 3)).astype(np.float32))
    r = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    t_est = jnp.asarray(np.array([[0.1, 0, 0], [0, 0.2, 0], [0, 0, 0.3], [0, 0, 0]], np.float32))
    t_gt = jnp.zeros((4, 3))
    out = np.asarray(add_metric(pts, r, t_est, r, t_gt))
    np.testing.assert_allclose(out, [0.1, 0.2, 0.3, 0.0], atol=1e-5)


def test_auc_and_diameter_and_angle():
    assert add_auc(np.array([0.0, 0.0, 0.0]), 0.1) > 0.99
    assert add_auc(np.array([1.0, 1.0]), 0.1) < 0.01
    mid = add_auc(np.array([0.05]), 0.1)
    assert 0.4 < mid < 0.6

    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 2, 0]], np.float32)
    np.testing.assert_allclose(object_diameter(pts), np.sqrt(5), atol=1e-5)

    r90 = np.asarray(geo.matrix33_from_quat(
        jnp.asarray(geo.quat_from_axis_angle(np.array([0, 0, 1.0]), np.pi / 2))))
    np.testing.assert_allclose(rotation_angle_deg(np.eye(3), r90), 90.0, atol=1e-4)
