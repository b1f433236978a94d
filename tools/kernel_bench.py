#!/usr/bin/env python3
"""Microbenchmark the raster kernel (fwd/bwd) in isolation at bench scale.

Usage: python tools/kernel_bench.py [reps]
Builds the AlphabetSoup bench problem once, then times raster_gather_rows_v2
forward and VJP separately (the full refinement step divides attention across
too many ops to iterate on kernel changes).
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from diffdope_tpu import geometry as geo
    from diffdope_tpu.mesh import load_mesh
    from diffdope_tpu.optimize import pose_matrix, pose_params
    from diffdope_tpu.render.planar import (
        bin_triangles_planar, corner_planes, packed_planar,
    )
    from diffdope_tpu.render.gather_rows import invert_bins
    from diffdope_tpu.render.raster_v2 import raster_gather_rows_v2

    RES = (400, 400)
    B = int(os.environ.get("DD_B", "64"))
    tile_h = int(os.environ.get("DD_TILE_H", "32"))
    tile_w = int(os.environ.get("DD_TILE_W", "128"))
    max_k = int(os.environ.get("DD_MAX_K", "2048"))
    h, w = RES
    f = 1.2 * max(h, w)
    proj = jnp.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )
    m = load_mesh("/root/reference/data/example/mesh/AlphabetSoup.ply",
                  scale=0.01, vertex_pad=128, triangle_pad=128)
    pos = jnp.asarray(m.pos)
    tri = jnp.asarray(m.pos_idx)
    edge_adj = jnp.asarray(m.edge_adj)
    cc = jnp.asarray(m.corner_colors)
    t_count = tri.shape[0]

    q = geo.quat_from_axis_angle(np.array([0.2, 1.0, 0.1]), 0.8)
    t = np.array([0.0, 0.0, -2.0], np.float32)

    @jax.jit
    def setup(q, t):
        mtx, _, _ = pose_matrix(pose_params(q, t, B))
        mvp = jnp.einsum("ij,bjk->bik", proj, mtx, precision="highest")
        pos_c = pos[tri.reshape(-1)][None]
        cp = corner_planes(pos_c, mvp)
        degen = (tri[:, 0] == tri[:, 1]) | (tri[:, 1] == tri[:, 2]) | (tri[:, 2] == tri[:, 0])
        zrot = jnp.einsum("bj,bnj->bn", mtx[:, 2, :3],
                          jnp.broadcast_to(pos_c, (B,) + pos_c.shape[1:]),
                          precision="highest")
        packed, det = packed_planar(cp, cc, zrot, edge_adj, degen)
        idx, counts, _ = bin_triangles_planar(cp, det, RES, (tile_h, tile_w), max_k)
        inv_pos, inv_valid = invert_bins(idx, t_count, 6)
        return packed, idx, counts, inv_pos, inv_valid

    args = jax.block_until_ready(setup(jnp.asarray(q, jnp.float32), jnp.asarray(t)))
    packed, idx, counts, inv_pos, inv_valid = args
    print(f"B={B} tiles={idx.shape[0]} K={idx.shape[1]} counts max={int(counts.max())}",
          file=sys.stderr)

    fwd = jax.jit(lambda p: raster_gather_rows_v2(
        p, idx, counts, inv_pos, inv_valid, RES, (tile_h, tile_w), False, True, True))

    def loss(p):
        ids, rows = raster_gather_rows_v2(
            p, idx, counts, inv_pos, inv_valid, RES, (tile_h, tile_w),
            False, True, True)
        return jnp.sum(rows * 1e-6)

    gradf = jax.jit(jax.grad(loss))

    for name, fn in (("fwd", fwd), ("fwd+bwd", gradf)):
        out = jax.block_until_ready(fn(packed))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(packed)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / REPS * 1000
        print(f"{name}: {dt:.2f} ms")


if __name__ == "__main__":
    main()
