"""Pose-accuracy metrics: ADD / ADD-S and batch evaluation helpers.

The reference repository ships no evaluation code, but its bundled data
defines the protocol (SURVEY.md section 6): BOP-style per-frame
{cam_R_m2c, cam_t_m2c} poses at three perturbation levels, scored with the
standard ADD(-S) metrics:

* ADD  — mean distance between corresponding model points under the two
  poses (Hinterstoisser et al.);
* ADD-S — mean distance to the *nearest* model point (symmetric objects).

A pose is typically counted correct when ADD(-S) < 10% of the object
diameter.  All jnp, so whole-dataset evaluation batches on device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

__all__ = ["add_metric", "adds_metric", "add_auc", "object_diameter", "rotation_angle_deg", "subsample_points"]


def _transform(points: Array, rot: Array, trans: Array) -> Array:
    """(N,3) points by (...,3,3) + (...,3) -> (...,N,3)."""
    return (
        jnp.einsum("...ij,nj->...ni", rot, points, precision="highest")
        + trans[..., None, :]
    )


def add_metric(points: Array, r_est: Array, t_est: Array, r_gt: Array, t_gt: Array) -> Array:
    """ADD: mean pairwise distance of corresponding transformed points.

    Args:
        points: (N,3) model points (subsample large meshes for speed).
        r_est/t_est, r_gt/t_gt: (...,3,3) and (...,3) pose batches.

    Returns: (...,) mean distances.
    """
    pe = _transform(points, r_est, t_est)
    pg = _transform(points, r_gt, t_gt)
    return jnp.mean(jnp.linalg.norm(pe - pg, axis=-1), axis=-1)


def adds_metric(
    points: Array, r_est: Array, t_est: Array, r_gt: Array, t_gt: Array,
    max_points: int = 2000,
) -> Array:
    """ADD-S: mean nearest-neighbor distance (symmetric objects).

    O(N^2) pairwise distances on device, so the point set is capped inside
    the metric: above ``max_points`` a deterministic stride subsample is
    applied (same rule as subsample_points), bounding the distance matrix at
    max_points^2 regardless of mesh size.  Pass ``max_points=None`` to
    disable.
    """
    if max_points is not None and points.shape[-2] > max_points:
        step = points.shape[-2] // max_points
        points = points[..., ::step, :]
    pe = _transform(points, r_est, t_est)  # (...,N,3)
    pg = _transform(points, r_gt, t_gt)
    d2 = jnp.sum((pe[..., :, None, :] - pg[..., None, :, :]) ** 2, axis=-1)
    return jnp.mean(jnp.sqrt(jnp.min(d2, axis=-1)), axis=-1)


def add_auc(adds: np.ndarray, max_threshold: float) -> float:
    """Area under the ADD(-S) accuracy-threshold curve in [0, max_threshold]
    (the YCB-Video protocol)."""
    adds = np.asarray(adds, dtype=np.float64).reshape(-1)
    if adds.size == 0:
        return 0.0
    # accuracy(tau) is a step function: sample i contributes 1 for every
    # tau >= add_i, so its exact integral over [0, max_threshold] is
    # max(0, max_threshold - add_i) per sample.
    contrib = np.clip(max_threshold - adds, 0.0, max_threshold)
    return float(contrib.mean() / max_threshold)


def object_diameter(points: np.ndarray, sample: int = 2048, seed: int = 0) -> float:
    """Max pairwise distance over (a subsample of) the model points."""
    pts = np.asarray(points)
    if len(pts) > sample:
        rng = np.random.default_rng(seed)
        pts = pts[rng.choice(len(pts), sample, replace=False)]
    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    return float(np.sqrt(d2.max()))


def rotation_angle_deg(r_a: np.ndarray, r_b: np.ndarray) -> float:
    """Geodesic angle between two rotations, degrees."""
    c = (np.trace(np.asarray(r_a).T @ np.asarray(r_b)) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def subsample_points(points, target: int = 1000):
    """Deterministic stride subsample to ~`target` points for ADD scoring
    (shared by the BOP sweep's synthesized and real branches so their
    metrics use identical point sets)."""
    import numpy as np

    pts = np.asarray(points)
    if len(pts) > target:
        pts = pts[:: len(pts) // target]
    return pts
