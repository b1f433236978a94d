"""Synthetic scenes for tests, the graft entry, and benchmarks.

Self-contained (no file IO): procedural icosphere meshes with positional
vertex colors, a pinhole camera, a ground-truth pose render, and perturbed
initial parameters — the same shape of problem as a BOP object refinement.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from diffdope_tpu import geometry as geo
from diffdope_tpu.mesh import build_edge_adjacency
from diffdope_tpu.optimize import pose_matrix, pose_params
from diffdope_tpu.render.pipeline import render_batch


def icosphere(subdiv: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """Unit icosphere: (N,3) float32 vertices, (T,3) int32 faces.

    20 * 4**subdiv triangles (subdiv=3 -> 1280, 4 -> 5120, 5 -> 20480).
    """
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array(
        [
            [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
            [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
            [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
        ],
        np.float64,
    )
    v /= np.linalg.norm(v[0])
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(subdiv):
        cache: dict = {}
        verts = list(map(tuple, v))
        new_faces = []

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2.0
                m /= np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(tuple(m))
            return cache[key]

        for (a, b, c) in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.asarray(verts, np.float64)
        f = np.asarray(new_faces, np.int64)
    return v.astype(np.float32), f.astype(np.int32)


def synthetic_scene(
    subdiv: int = 3,
    resolution: Tuple[int, int] = (128, 128),
    batchsize: int = 8,
    seed: int = 0,
    perturb_deg: float = 10.0,
    perturb_trans: float = 0.08,
    radius: float = 0.4,
    distance: float = 3.0,
    raster_impl: str = "auto",
) -> Dict:
    """Build a full synthetic refinement problem.

    Returns a dict with: render_fn (mtx -> renders), gt (render of the gt
    pose), params0 (perturbed (B,) pose params), gt pose (quat, trans),
    mesh arrays, and the projection.
    """
    h, w = resolution
    f = 1.2 * max(h, w)
    proj = jnp.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )
    verts, faces = icosphere(subdiv)
    pos = jnp.asarray(verts * radius)
    tri = jnp.asarray(faces)
    vtx_color = jnp.asarray((verts * 0.5 + 0.5).astype(np.float32))
    edge_adj = jnp.asarray(build_edge_adjacency(faces))

    def render_fn(mtx):
        return render_batch(
            proj, mtx, pos, tri, resolution,
            vtx_color=vtx_color, raster_impl=raster_impl, edge_adj=edge_adj,
        )

    rng = np.random.default_rng(seed)
    q_gt = geo.quat_from_axis_angle(rng.normal(size=3), rng.uniform(0, np.pi))
    t_gt = np.array([0.0, 0.0, -distance])
    mtx_gt, _, _ = pose_matrix(pose_params(q_gt, t_gt, 1))
    gt_render = jax.jit(render_fn)(mtx_gt)
    gt = {
        "rgb": jax.lax.stop_gradient(gt_render["rgb"][0]),
        "segmentation": jax.lax.stop_gradient(gt_render["mask"][0]),
        "depth": jax.lax.stop_gradient(gt_render["depth"][0]),
    }

    dq = geo.quat_from_axis_angle(rng.normal(size=3), np.deg2rad(perturb_deg))
    q0 = np.asarray(geo.quat_multiply(jnp.asarray(dq), jnp.asarray(q_gt)))
    t0 = t_gt + rng.normal(size=3) * perturb_trans
    params0 = pose_params(q0.astype(np.float32), t0.astype(np.float32), batchsize)

    return dict(
        render_fn=render_fn,
        gt=gt,
        params0=params0,
        q_gt=q_gt,
        t_gt=t_gt,
        proj=proj,
        pos=pos,
        tri=tri,
        vtx_color=vtx_color,
        edge_adj=edge_adj,
        resolution=resolution,
    )
