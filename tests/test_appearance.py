"""Appearance refinement: optimizing colors alongside the pose
(the reference's Mesh.enable_gradients_texture capability,
diffdope.py:909-920, via extra optimized leaves)."""

import numpy as np
import jax
import jax.numpy as jnp

from diffdope_tpu import geometry as geo
from diffdope_tpu.losses import select_losses
from diffdope_tpu.optimize import draw_learning_rates, pose_matrix, pose_params, refine
from diffdope_tpu.render.pipeline import render_batch
from diffdope_tpu.testing import icosphere

RES = (48, 48)


def test_vertex_color_refinement():
    h, w = RES
    f = 48.0
    proj = jnp.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )
    verts, faces = icosphere(1)
    pos = jnp.asarray(verts * 0.4)
    tri = jnp.asarray(faces)
    col_gt = jnp.asarray((verts * 0.5 + 0.5).astype(np.float32))

    def render_fn(mtx, vtx_color=None):
        return render_batch(
            proj, mtx, pos, tri, RES,
            vtx_color=col_gt if vtx_color is None else vtx_color,
            raster_impl="reference", layout="channels",
        )

    q = np.array([0, 0, 0, 1.0], np.float32)
    t = np.array([0, 0, -3.0], np.float32)
    mtx_gt, _, _ = pose_matrix(pose_params(q, t, 1))
    gtr = jax.jit(lambda m: render_fn(m))(mtx_gt)
    gt = {
        "rgb": jnp.stack(gtr["rgb"], -1)[0],
        "segmentation": jnp.repeat(gtr["mask"][0][..., None], 3, -1),
        "depth": gtr["depth"][0],
    }

    b = 2
    params0 = pose_params(q, t, b)  # pose starts AT gt; colors start wrong
    col0 = jnp.full_like(col_gt, 0.3)
    loss_fns, weights = select_losses(
        {"l1_rgb_with_mask": True, "weight_rgb": 1.0}
    )
    lrs = draw_learning_rates(jax.random.PRNGKey(0), b, (1.0, 1.0))

    run = jax.jit(
        lambda p, extra: refine(
            p, render_fn, loss_fns, gt, lrs, weights,
            nb_iterations=60, base_lr=0.08, lr_decay=0.5, optimizer="adam",
            extra_params=extra,
        )
    )
    result = run(params0, {"vtx_color": col0})

    col_final = np.asarray(result.params["vtx_color"])
    err0 = np.abs(np.asarray(col0) - np.asarray(col_gt)).mean()
    err1 = np.abs(col_final - np.asarray(col_gt)).mean()
    assert err1 < err0 * 0.6, (err0, err1)
    log = np.asarray(result.losses_values["rgb"])
    assert log[-1].min() < log[0].min() * 0.5
