"""Refine a pose with the hypothesis batch sharded over a TPU slice.

The deployment shape for the <1 s/refinement operating point
(docs/ROADMAP.md "Measured path to < 1 s"): B hypotheses spread over an
N-chip mesh, zero cross-chip traffic inside a step, one tiny loss psum.
The reference is single-GPU (`.cuda()` placement throughout,
reference diffdope.py) — this is the TPU-native scaling axis it lacks.

Run on a real slice:

    python examples/multichip_refine.py --batchsize 64

Validate anywhere on a virtual 8-device CPU mesh (what CI does —
tests/test_parallel.py asserts sharded == unsharded):

    env PYTHONPATH= JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_refine.py --batchsize 16 \
        --resolution 96x96 --iterations 5
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batchsize", type=int, default=64)
    ap.add_argument("--iterations", type=int, default=50)
    ap.add_argument("--resolution", default="400x400")
    ap.add_argument("--devices", type=int, default=None,
                    help="mesh size (default: all devices)")
    ap.add_argument("--mesh-path", default=None,
                    help="PLY/OBJ path (default: reference AlphabetSoup, "
                         "else a synthetic icosphere)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from diffdope_tpu import geometry as geo
    from diffdope_tpu.losses import select_losses
    from diffdope_tpu.optimize import (
        argmin_hypothesis, draw_learning_rates, pose_matrix, pose_params,
    )
    from diffdope_tpu.parallel import hypothesis_mesh, refine_sharded
    from diffdope_tpu.render.pipeline import render_batch

    h, w = (int(x) for x in args.resolution.split("x"))
    f = 1.2 * max(h, w)
    proj = jnp.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )

    mesh_path = args.mesh_path or "/root/reference/data/example/mesh/AlphabetSoup.ply"
    if Path(mesh_path).exists():
        from diffdope_tpu.mesh import load_mesh

        m = load_mesh(mesh_path, scale=0.01, vertex_pad=128, triangle_pad=128)
        pos, tri = jnp.asarray(m.pos), jnp.asarray(m.pos_idx)
        edge_adj = jnp.asarray(m.edge_adj)
        color_kw = dict(corner_colors=jnp.asarray(m.corner_colors))
        cull = bool(m.is_closed and m.is_oriented)
    else:
        from diffdope_tpu.mesh import build_edge_adjacency
        from diffdope_tpu.testing import icosphere

        v, fc = icosphere(3)
        pos, tri = jnp.asarray(v * 0.4), jnp.asarray(fc)
        edge_adj = jnp.asarray(build_edge_adjacency(fc))
        color_kw = dict(vtx_color=jnp.asarray((v * 0.5 + 0.5).astype(np.float32)))
        cull = True

    def render_fn(mtx, layout="channels"):
        return render_batch(
            proj, mtx, pos, tri, (h, w), edge_adj=edge_adj,
            raster_impl="pallas", layout=layout, cull_backfaces=cull,
            **color_kw,
        )

    rng = np.random.default_rng(0)
    q_gt = geo.quat_from_axis_angle(np.array([0.2, 1.0, 0.1]), 0.8)
    t_gt = np.array([0.0, 0.0, -2.0], np.float32)

    @jax.jit
    def make_gt(q, t):
        mtx, _, _ = pose_matrix(pose_params(q, t, 1))
        r = render_fn(mtx, layout="stacked")
        return {"rgb": r["rgb"][0], "segmentation": r["mask"][0],
                "depth": r["depth"][0]}

    gt = make_gt(jnp.asarray(q_gt, jnp.float32), jnp.asarray(t_gt))

    dq = geo.quat_from_axis_angle(rng.normal(size=3), np.deg2rad(8.0))
    q0 = np.asarray(geo.quat_multiply(jnp.asarray(dq), jnp.asarray(q_gt)))
    t0 = t_gt + np.array([0.02, -0.015, 0.04], np.float32)
    params0 = pose_params(q0.astype(np.float32), t0, args.batchsize)

    loss_fns, weights = select_losses(
        {"l1_mask": True, "weight_mask": 1.0,
         "l1_rgb_with_mask": True, "weight_rgb": 0.7}
    )
    lrs = draw_learning_rates(jax.random.PRNGKey(0), args.batchsize, (0.5, 4.0))

    mesh = hypothesis_mesh(args.devices)
    n = mesh.devices.size
    print(f"mesh: {n} device(s) x {args.batchsize // n} hypotheses/device "
          f"({jax.default_backend()})")

    t0_ = time.perf_counter()
    result = refine_sharded(
        params0, render_fn, loss_fns, gt, lrs, weights, mesh,
        nb_iterations=args.iterations, base_lr=0.02, lr_decay=0.1,
        optimizer="adam",
    )
    jax.block_until_ready(result.params["qx"])
    wall = time.perf_counter() - t0_

    best = int(argmin_hypothesis(result.losses_values))
    final = float(np.asarray(result.total_loss)[-1])
    print(f"{args.iterations} steps on {n} device(s): {wall:.2f}s "
          f"(incl. compile)")
    print(f"best hypothesis {best}, final loss {final:.5f}")
    mtx, _, _ = jax.jit(pose_matrix)(result.params)
    print("refined pose (OpenGL frame):")
    print(np.asarray(mtx)[best])


if __name__ == "__main__":
    main()
