"""Multi-chip sharding: sharded refinement must equal the unsharded run.

conftest forces 8 virtual CPU devices, so this exercises the real
jax.sharding.Mesh path (GSPMD partitioning of the hypothesis batch + the
implicit loss-mean collective) without TPU hardware.
"""

import numpy as np
import jax
import pytest

from diffdope_tpu.losses import select_losses
from diffdope_tpu.optimize import draw_learning_rates, refine
from diffdope_tpu.parallel import hypothesis_mesh, refine_sharded
from diffdope_tpu.testing import synthetic_scene


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_matches_unsharded():
    b = 8
    scene = synthetic_scene(
        subdiv=1, resolution=(32, 32), batchsize=b, seed=3,
        raster_impl="reference",
    )
    loss_fns, weights = select_losses({"l1_mask": True, "weight_mask": 1.0})
    lrs = draw_learning_rates(jax.random.PRNGKey(1), b, (0.5, 2.0))
    kwargs = dict(
        nb_iterations=3, base_lr=0.1, lr_decay=0.1, optimizer="adam",
    )

    ref = jax.jit(
        lambda p: refine(
            p, scene["render_fn"], loss_fns, scene["gt"], lrs, weights, **kwargs
        )
    )(scene["params0"])

    mesh = hypothesis_mesh(8)
    shard = refine_sharded(
        scene["params0"], scene["render_fn"], loss_fns, scene["gt"], lrs,
        weights, mesh, **kwargs
    )

    # per-hypothesis trajectories must agree (independent except for the
    # scalar loss mean, which only enters through logging)
    np.testing.assert_allclose(
        np.asarray(ref.mtx_history), np.asarray(shard.mtx_history),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ref.total_loss), np.asarray(shard.total_loss),
        rtol=2e-4, atol=1e-6,
    )
    # outputs actually carried a sharded layout
    hist_shard = shard.mtx_history
    assert len(hist_shard.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_fused_loss_matches_unsharded():
    """The fused shade+AA+loss kernel path must also run and agree under a
    hypothesis-sharded mesh (DiffDope passes fused_loss_fn through
    refine_sharded when tpu.mesh_axis > 1)."""
    import jax.numpy as jnp

    from diffdope_tpu.mesh import build_edge_adjacency
    from diffdope_tpu.optimize import pose_matrix, pose_params
    from diffdope_tpu.render.pipeline import make_fused_loss, render_batch
    from diffdope_tpu.testing import icosphere
    from diffdope_tpu import geometry as geo

    RES = (32, 32)
    b = 8
    h, w = RES
    f = 1.2 * max(h, w)
    proj = jnp.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )
    v, fc = icosphere(2)
    pos = jnp.asarray(v.astype(np.float32) * 0.4)
    tri = jnp.asarray(fc.astype(np.int32))
    edge_adj = jnp.asarray(build_edge_adjacency(fc))
    vtx_color = jnp.asarray((v * 0.5 + 0.5).astype(np.float32))

    def render_fn(mtx, layout="channels"):
        return render_batch(
            proj, mtx, pos, tri, RES, vtx_color=vtx_color, edge_adj=edge_adj,
            raster_impl="pallas", layout=layout, max_tris_per_tile=512,
        )

    q = np.array([0, 0, 0, 1.0], np.float32)
    t = np.array([0.0, 0.0, -2.0], np.float32)
    mtx_gt, _, _ = pose_matrix(pose_params(q, t, 1))
    gtr = jax.jit(lambda m: render_fn(m, layout="stacked"))(mtx_gt)
    gt = {"rgb": gtr["rgb"][0], "segmentation": gtr["mask"][0]}

    loss_fns, weights = select_losses(
        {"l1_mask": True, "weight_mask": 1.0,
         "l1_rgb_with_mask": True, "weight_rgb": 0.7})
    lrs = draw_learning_rates(jax.random.PRNGKey(1), b, (0.5, 2.0))
    fused = make_fused_loss(
        proj, pos, tri, RES, gt, lrs, weights,
        use_rgb=True, use_depth=False, use_mask=True,
        edge_adj=edge_adj, vtx_color=vtx_color, max_tris_per_tile=512,
    )
    params0 = pose_params(
        np.array([0.05, 0, 0, 1.0], np.float32),
        np.array([0.02, 0.0, -2.0], np.float32), b)
    kwargs = dict(
        nb_iterations=2, base_lr=0.1, lr_decay=0.1, optimizer="adam",
        fused_loss_fn=fused,
    )

    ref = jax.jit(
        lambda p: refine(p, render_fn, loss_fns, gt, lrs, weights, **kwargs)
    )(params0)
    shard = refine_sharded(
        params0, render_fn, loss_fns, gt, lrs, weights,
        hypothesis_mesh(8), **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(ref.mtx_history), np.asarray(shard.mtx_history),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ref.total_loss), np.asarray(shard.total_loss),
        rtol=2e-4, atol=1e-6,
    )
