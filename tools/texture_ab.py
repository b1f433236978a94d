#!/usr/bin/env python3
"""Baked-corner vs exact-bilinear texture: speed and pose-accuracy A/B.

The production default bakes the 2048^2 texture to per-corner Gouraud
colors (zero texture gathers per step); the reference samples bilinearly
per pixel (diffdope.py:218-228).  This runs the same synthetic refinement
(AlphabetSoup, known gt pose, rgb+mask losses) through both paths and
reports wall time and the refined pose's ADD vs ground truth for each —
the numbers quoted in docs/ROADMAP.md.

Usage: python tools/texture_ab.py [steps=50] [batch=32]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 50
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 32
RES = (400, 400)


def main():
    import jax
    import jax.numpy as jnp

    from diffdope_tpu import geometry as geo
    from diffdope_tpu.losses import select_losses
    from diffdope_tpu.mesh import load_mesh
    from diffdope_tpu.metrics import add_metric, object_diameter
    from diffdope_tpu.optimize import (
        argmin_hypothesis, draw_learning_rates, pose_matrix, pose_params,
        refine,
    )
    from diffdope_tpu.render.pipeline import make_fused_loss, render_batch

    h, w = RES
    f = 1.2 * max(h, w)
    proj = jnp.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )
    m = load_mesh("/root/reference/data/example/mesh/AlphabetSoup.ply",
                  scale=0.01, vertex_pad=128, triangle_pad=128)
    pos, tri = jnp.asarray(m.pos), jnp.asarray(m.pos_idx)
    edge_adj = jnp.asarray(m.edge_adj)

    modes = {
        "baked": dict(corner_colors=jnp.asarray(m.corner_colors)),
        "exact": dict(tex=jnp.asarray(m.tex), uv=jnp.asarray(m.uv),
                      uv_idx=jnp.asarray(m.uv_idx)),
    }

    q_gt = np.asarray(
        geo.quat_from_axis_angle(np.array([0.2, 1.0, 0.1]), 0.8), np.float32)
    t_gt = np.array([0.0, 0.0, -2.0], np.float32)
    rng = np.random.default_rng(0)
    dq = geo.quat_from_axis_angle(rng.normal(size=3), np.deg2rad(10.0))
    q0 = np.asarray(geo.quat_multiply(jnp.asarray(dq), jnp.asarray(q_gt)),
                    np.float32)
    t0 = t_gt + np.array([0.02, -0.015, 0.04], np.float32)

    loss_fns, weights = select_losses(
        {"l1_mask": True, "weight_mask": 1.0,
         "l1_rgb_with_mask": True, "weight_rgb": 0.7})
    lrs = draw_learning_rates(jax.random.PRNGKey(0), BATCH, (0.5, 4.0))
    pts = np.asarray(m.pos[: m.num_vertices])[::14]  # ~600 points
    dia = object_diameter(np.asarray(m.pos[: m.num_vertices]))
    mtx_gt = np.asarray(jax.jit(pose_matrix)(pose_params(q_gt, t_gt, 1))[0][0])

    for name, kw in modes.items():
        def render_fn(mtx, layout="channels", kw=kw):
            return render_batch(
                proj, mtx, pos, tri, RES, edge_adj=edge_adj,
                raster_impl="pallas", layout=layout, max_tris_per_tile=2048,
                **kw,
            )

        # gt rendered by the SAME mode (each mode refines against its own
        # appearance model, like the reference does)
        @jax.jit
        def make_gt(q, t, kw=kw):
            mtx, _, _ = pose_matrix(pose_params(q, t, 1))
            r = render_batch(
                proj, mtx, pos, tri, RES, edge_adj=edge_adj,
                raster_impl="pallas", layout="stacked",
                max_tris_per_tile=2048, **kw)
            return {"rgb": r["rgb"][0], "segmentation": r["mask"][0]}

        gt = jax.block_until_ready(make_gt(jnp.asarray(q_gt), jnp.asarray(t_gt)))

        # both modes run fused: baked keeps the fully-fused kernel, exact
        # routes through the SEMI-FUSED bilinear path (make_fused_loss with
        # tex/uv/uv_idx) — the round-3 replacement for the old 4x unfused
        # fallback
        fused_fn = make_fused_loss(
            proj, pos, tri, RES, gt, lrs, weights,
            use_rgb=True, use_depth=False, use_mask=True,
            edge_adj=edge_adj, max_tris_per_tile=2048, **kw)

        jit_refine = jax.jit(functools.partial(
            refine, render_fn=render_fn, loss_fns=tuple(loss_fns),
            weights=weights, nb_iterations=STEPS - 1, base_lr=0.02,
            lr_decay=0.1, optimizer="adam", fused_loss_fn=fused_fn,
        ))
        params0 = pose_params(q0, t0, BATCH)
        r = jit_refine(params0, gt=gt, learning_rates=lrs)
        jax.block_until_ready(r.mtx_history)
        t0_ = time.perf_counter()
        r = jit_refine(params0, gt=gt, learning_rates=lrs)
        jax.block_until_ready(r.mtx_history)
        dt = time.perf_counter() - t0_

        best = int(argmin_hypothesis(
            {k: jnp.asarray(v) for k, v in r.losses_values.items()}))
        mtx = np.asarray(r.mtx_history[-1][best])
        add = float(add_metric(
            jnp.asarray(pts), jnp.asarray(mtx[:3, :3]), jnp.asarray(mtx[:3, 3]),
            jnp.asarray(mtx_gt[:3, :3]), jnp.asarray(mtx_gt[:3, 3])))
        print(f"{name:6s}: {dt:7.3f}s for {STEPS} steps (B={BATCH})  "
              f"ADD={add:.5f}  ADD/diameter={add / dia:.4f}  "
              f"final_loss={float(np.asarray(r.total_loss)[-1]):.5f}")


if __name__ == "__main__":
    main()
