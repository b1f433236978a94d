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


def test_texture_map_refinement():
    """The reference's ACTUAL appearance target is the texture map itself
    (Mesh.enable_gradients_texture, reference diffdope.py:909-920): the
    texture tensor is optimized through the differentiable bilinear
    sampler.  Start with a wrong flat texture and recover the gt texture
    where the object is visible."""
    h, w = RES
    f = 48.0
    proj = jnp.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )
    verts, faces = icosphere(1)
    pos = jnp.asarray(verts * 0.4)
    tri = jnp.asarray(faces)
    # spherical uv (same mapping the fused-texture tests use)
    n = verts / np.maximum(np.linalg.norm(verts, axis=1, keepdims=True), 1e-9)
    uv = jnp.asarray(
        np.stack(
            [0.5 + np.arctan2(n[:, 2], n[:, 0]) / (2 * np.pi),
             0.5 - np.arcsin(np.clip(n[:, 1], -1, 1)) / np.pi],
            axis=1,
        ).astype(np.float32)
    )
    rng = np.random.default_rng(3)
    tex_gt = jnp.asarray(rng.uniform(0.2, 0.9, (16, 16, 3)).astype(np.float32))

    def render_fn(mtx, tex=None):
        return render_batch(
            proj, mtx, pos, tri, RES, uv=uv, uv_idx=tri,
            tex=tex_gt if tex is None else tex,
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
    params0 = pose_params(q, t, b)  # pose starts AT gt; texture starts flat
    tex0 = jnp.full_like(tex_gt, 0.5)
    loss_fns, weights = select_losses(
        {"l1_rgb_with_mask": True, "weight_rgb": 1.0}
    )
    lrs = draw_learning_rates(jax.random.PRNGKey(0), b, (1.0, 1.0))

    run = jax.jit(
        lambda p, extra: refine(
            p, render_fn, loss_fns, gt, lrs, weights,
            nb_iterations=150, base_lr=0.08, lr_decay=0.5, optimizer="adam",
            extra_params=extra,
        )
    )
    result = run(params0, {"tex": tex0})

    log = np.asarray(result.losses_values["rgb"])
    assert log[-1].min() < log[0].min() * 0.5, (log[0], log[-1])
    tex_final = np.asarray(result.params["tex"])
    assert np.abs(tex_final - np.asarray(tex0)).max() > 0.05  # it moved
    # visible texels moved toward gt (unseen texels keep zero gradient)
    moved = np.abs(tex_final - np.asarray(tex0)).max(axis=-1) > 1e-3
    assert moved.sum() > 20
    err0 = np.abs(np.asarray(tex0) - np.asarray(tex_gt))[moved].mean()
    err1 = np.abs(tex_final - np.asarray(tex_gt))[moved].mean()
    # partial convergence is expected: a 16x16 texture seen through a 48x48
    # render gives each visible texel only a few pixels of signal, and
    # bilinear mixing couples neighbors — assert a solid improvement, not
    # recovery
    assert err1 < err0 * 0.7, (err0, err1)
