#!/usr/bin/env python3
"""Baked-corner vs exact-bilinear texture: speed, image error, pose A/B.

The production default bakes the texture to per-corner Gouraud colors
(zero texture gathers per step); the reference samples bilinearly per
pixel (reference diffdope.py:218-228).  This quantifies the approximation
on MULTIPLE meshes/textures (VERDICT r3 item 4):

* image-space error bound: PSNR / SSIM between the baked and exact renders
  of the SAME gt pose, over the union foreground — how far the bake's
  appearance model is from the reference contract, per texture frequency;
* pose ADD per mode (each mode refines against its own render, like the
  reference refines against its own renderer) and CROSS-model ADD (baked
  model refining against the EXACT render — the honest deployment case
  where the gt image comes from the real world);
* wall time per mode (baked keeps the fully-fused kernel; exact is the
  semi-fused bilinear path).

Meshes: AlphabetSoup (2048^2 photo texture) + two synthetic A/B extremes
(tools/make_standins.py): a 32-px random-tint checker (high-frequency,
worst case for the bake) and smooth color blobs (low-frequency, best
case).

Usage: python tools/texture_ab.py [steps=50] [batch=32]
"""

import functools
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 50
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 32
RES = (400, 400)

MESHES = {
    "alphabetsoup": "/root/reference/data/example/mesh/AlphabetSoup.ply",
    "checker_1024": str(REPO / "data/standins/standin_tex_checker.ply"),
    "smooth_1024": str(REPO / "data/standins/standin_tex_smooth.ply"),
}


def psnr(a, b, mask):
    mse = float((((a - b) ** 2) * mask).sum() / max(mask.sum() * 3, 1))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def ssim(a, b, mask):
    """Mean SSIM over the masked region (uniform 7x7 window, per channel)."""
    import cv2

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    vals = []
    for c in range(3):
        x = a[..., c].astype(np.float64)
        y = b[..., c].astype(np.float64)
        mu_x = cv2.blur(x, (7, 7))
        mu_y = cv2.blur(y, (7, 7))
        xx = cv2.blur(x * x, (7, 7)) - mu_x ** 2
        yy = cv2.blur(y * y, (7, 7)) - mu_y ** 2
        xy = cv2.blur(x * y, (7, 7)) - mu_x * mu_y
        s = ((2 * mu_x * mu_y + c1) * (2 * xy + c2)) / (
            (mu_x ** 2 + mu_y ** 2 + c1) * (xx + yy + c2)
        )
        vals.append(float((s * mask[..., 0]).sum() / max(mask[..., 0].sum(), 1)))
    return float(np.mean(vals))


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
    if not Path(MESHES["checker_1024"]).exists():
        import subprocess

        subprocess.run(
            [sys.executable, str(REPO / "tools/make_standins.py"),
             str(REPO / "data/standins")],
            check=True,
        )

    loss_fns, weights = select_losses(
        {"l1_mask": True, "weight_mask": 1.0,
         "l1_rgb_with_mask": True, "weight_rgb": 0.7})
    lrs = draw_learning_rates(jax.random.PRNGKey(0), BATCH, (0.5, 4.0))

    q_gt = np.asarray(
        geo.quat_from_axis_angle(np.array([0.2, 1.0, 0.1]), 0.8), np.float32)
    t_gt = np.array([0.0, 0.0, -2.0], np.float32)
    rng = np.random.default_rng(0)
    dq = geo.quat_from_axis_angle(rng.normal(size=3), np.deg2rad(10.0))
    q0 = np.asarray(geo.quat_multiply(jnp.asarray(dq), jnp.asarray(q_gt)),
                    np.float32)
    t0 = t_gt + np.array([0.02, -0.015, 0.04], np.float32)

    print(f"{'mesh':14s} {'PSNR':>6s} {'SSIM':>6s} | "
          f"{'baked s':>8s} {'ADD/d':>7s} | {'exact s':>8s} {'ADD/d':>7s} | "
          f"{'cross ADD/d':>11s}")

    for mesh_name, mesh_path in MESHES.items():
        m = load_mesh(mesh_path, scale=0.01, vertex_pad=128, triangle_pad=128)
        pos, tri = jnp.asarray(m.pos), jnp.asarray(m.pos_idx)
        edge_adj = jnp.asarray(m.edge_adj)
        modes = {
            "baked": dict(corner_colors=jnp.asarray(m.corner_colors)),
            "exact": dict(tex=jnp.asarray(m.tex), uv=jnp.asarray(m.uv),
                          uv_idx=jnp.asarray(m.uv_idx)),
        }
        pts = np.asarray(m.pos[: m.num_vertices])[::14]
        dia = object_diameter(np.asarray(m.pos[: m.num_vertices]))
        mtx_gt = np.asarray(
            jax.jit(pose_matrix)(pose_params(q_gt, t_gt, 1))[0][0])

        gts, stats = {}, {}
        for name, kw in modes.items():
            @jax.jit
            def make_gt(q, t, kw=kw):
                mtx, _, _ = pose_matrix(pose_params(q, t, 1))
                r = render_batch(
                    proj, mtx, pos, tri, RES, edge_adj=edge_adj,
                    raster_impl="pallas", layout="stacked",
                    max_tris_per_tile=2048, **kw)
                return {"rgb": r["rgb"][0], "segmentation": r["mask"][0]}

            gts[name] = jax.block_until_ready(
                make_gt(jnp.asarray(q_gt), jnp.asarray(t_gt)))

        # image-space bound: baked vs exact render of the SAME pose
        rb = np.asarray(gts["baked"]["rgb"])
        re = np.asarray(gts["exact"]["rgb"])
        msk = np.maximum(np.asarray(gts["baked"]["segmentation"]),
                         np.asarray(gts["exact"]["segmentation"])) > 0.5
        p = psnr(rb, re, msk.astype(np.float64))
        s = ssim(rb, re, msk.astype(np.float64))

        def run_mode(kw, gt):
            def render_fn(mtx, layout="channels", kw=kw):
                return render_batch(
                    proj, mtx, pos, tri, RES, edge_adj=edge_adj,
                    raster_impl="pallas", layout=layout,
                    max_tris_per_tile=2048, **kw)

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
            tt = time.perf_counter()
            r = jit_refine(params0, gt=gt, learning_rates=lrs)
            jax.block_until_ready(r.mtx_history)
            dt = time.perf_counter() - tt
            best = int(argmin_hypothesis(
                {k: jnp.asarray(v) for k, v in r.losses_values.items()}))
            mtx = np.asarray(r.mtx_history[-1][best])
            add = float(add_metric(
                jnp.asarray(pts), jnp.asarray(mtx[:3, :3]),
                jnp.asarray(mtx[:3, 3]),
                jnp.asarray(mtx_gt[:3, :3]), jnp.asarray(mtx_gt[:3, 3])))
            return dt, add / dia

        for name, kw in modes.items():
            stats[name] = run_mode(kw, gts[name])
        # cross-model: baked appearance refining against the EXACT render
        # (deployment: the gt image is the world, the bake is the model)
        _, cross = run_mode(modes["baked"], gts["exact"])

        print(f"{mesh_name:14s} {p:6.2f} {s:6.4f} | "
              f"{stats['baked'][0]:8.3f} {stats['baked'][1]:7.4f} | "
              f"{stats['exact'][0]:8.3f} {stats['exact'][1]:7.4f} | "
              f"{cross:11.4f}")


if __name__ == "__main__":
    main()
