#!/usr/bin/env python3
"""Measure backface culling's output delta on the bench problem.

Backface culling (planar.bin_triangles_planar cull_backfaces) is exact for
closed consistently-wound meshes — along any pixel ray the depth winner is
the entering (front-facing) crossing, so back faces can never win.  For OPEN
meshes (AlphabetSoup: 2548 boundary edges after winding repair) a ray can
slip through a crack and legitimately hit a back face; culling changes those
pixels.  This tool counts them: ids + shaded rgb deltas between culled and
unculled renders at the gt pose and at bench-style perturbed poses.

Usage: python tools/cull_ab.py   (default env; runs on the TPU)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from diffdope_tpu import geometry as geo
    from diffdope_tpu.mesh import load_mesh
    from diffdope_tpu.optimize import pose_matrix, pose_params
    from diffdope_tpu.render.pipeline import render_batch

    RES = (400, 400)
    h, w = RES
    f = 1.2 * max(h, w)
    proj = jnp.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )
    m = load_mesh("/root/reference/data/example/mesh/AlphabetSoup.ply",
                  scale=0.01, vertex_pad=128, triangle_pad=128)
    print(f"mesh: closed={m.is_closed} oriented={m.is_oriented} "
          f"rewound={m.n_rewound}")
    pos = jnp.asarray(m.pos)
    tri = jnp.asarray(m.pos_idx)
    edge_adj = jnp.asarray(m.edge_adj)
    cc = jnp.asarray(m.corner_colors)

    rng = np.random.default_rng(0)
    q_gt = geo.quat_from_axis_angle(np.array([0.2, 1.0, 0.1]), 0.8)
    t_gt = np.array([0.0, 0.0, -2.0], np.float32)
    B = 8
    qs = [q_gt]
    ts = [t_gt]
    for _ in range(B - 1):
        dq = geo.quat_from_axis_angle(rng.normal(size=3), np.deg2rad(8.0))
        qs.append(np.asarray(geo.quat_multiply(jnp.asarray(dq), jnp.asarray(q_gt))))
        ts.append(t_gt + rng.normal(size=3).astype(np.float32) * 0.02)
    q0 = np.stack(qs).astype(np.float32)
    t0 = np.stack(ts).astype(np.float32)

    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def render(q, t, cull):
        mtx = jax.vmap(
            lambda qq, tt: pose_matrix(pose_params(qq, tt, 1))[0][0]
        )(q, t)
        return render_batch(
            proj, mtx, pos, tri, RES, edge_adj=edge_adj,
            raster_impl="pallas", tile_hw=(32, 128), max_tris_per_tile=2048,
            layout="stacked", cull_backfaces=cull, corner_colors=cc,
        )

    a = jax.tree.map(np.asarray, render(q0, t0, False))
    b = jax.tree.map(np.asarray, render(q0, t0, True))
    ids_diff = (a["ids"] != b["ids"]).sum(axis=(1, 2)) if "ids" in a else None
    rgb_diff = np.abs(a["rgb"] - b["rgb"]).max(axis=(1, 2, 3))
    npx_diff = (np.abs(a["rgb"] - b["rgb"]).max(axis=-1) > 1e-6).sum(axis=(1, 2))
    fg = (a["mask"][..., 0] > 0).sum(axis=(1, 2))
    print("pose  fg_px  rgb_diff_px  (frac)    max|drgb|"
          + ("  ids_diff" if ids_diff is not None else ""))
    for i in range(B):
        row = (f"{i:4d}  {fg[i]:6d} {npx_diff[i]:8d}  "
               f"{npx_diff[i] / max(fg[i], 1):8.5f}  {rgb_diff[i]:9.5f}")
        if ids_diff is not None:
            row += f"  {ids_diff[i]:8d}"
        print(row)


if __name__ == "__main__":
    main()
