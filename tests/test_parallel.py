"""Multi-chip sharding: sharded refinement must equal the unsharded run.

conftest forces 8 virtual CPU devices, so this exercises the real
jax.sharding.Mesh + shard_map path (hypothesis batch sharded over the mesh,
psum'd scalar logs / appearance gradients) without TPU hardware — including
the guarantee that each device runs the raster kernel on its LOCAL batch
slice (test_shard_map_runs_local_batch).
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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_shard_map_runs_local_batch(monkeypatch):
    """The production raster kernel must trace with the LOCAL B/n batch
    under the sharded runner — i.e. each device runs a B/n-sized kernel
    grid, not an all-gathered full-batch grid (which GSPMD would produce,
    since XLA cannot partition a custom call: bare jit + sharded operands
    measured 7 all-gathers in the compiled HLO)."""
    import jax.numpy as jnp

    import diffdope_tpu.render.raster_v2 as rv2
    from diffdope_tpu.mesh import build_edge_adjacency
    from diffdope_tpu.optimize import pose_matrix, pose_params
    from diffdope_tpu.render.pipeline import make_fused_loss
    from diffdope_tpu.testing import icosphere
    from diffdope_tpu import geometry as geo

    RES = (32, 32)
    b, n = 16, 8
    h, w = RES
    f = 1.2 * max(h, w)
    proj = jnp.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )
    v, fc = icosphere(1)
    pos = jnp.asarray(v.astype(np.float32) * 0.4)
    tri = jnp.asarray(fc.astype(np.int32))
    edge_adj = jnp.asarray(build_edge_adjacency(fc))
    vtx_color = jnp.asarray((v * 0.5 + 0.5).astype(np.float32))

    q = np.array([0, 0, 0, 1.0], np.float32)
    t = np.array([0.0, 0.0, -2.0], np.float32)
    mtx_gt, _, _ = pose_matrix(pose_params(q, t, 1))
    from diffdope_tpu.render.pipeline import render_batch

    gtr = jax.jit(
        lambda m: render_batch(
            proj, m, pos, tri, RES, vtx_color=vtx_color, edge_adj=edge_adj,
            raster_impl="pallas", layout="stacked", max_tris_per_tile=256,
        )
    )(mtx_gt)
    gt = {"rgb": gtr["rgb"][0], "segmentation": gtr["mask"][0]}

    seen_batches = []
    orig = rv2.raster_gather_rows_binned

    def spy(bins, *args, **kwargs):
        seen_batches.append(int(bins.shape[0]))
        return orig(bins, *args, **kwargs)

    monkeypatch.setattr(rv2, "raster_gather_rows_binned", spy)

    loss_fns, weights = select_losses(
        {"l1_mask": True, "weight_mask": 1.0,
         "l1_rgb_with_mask": True, "weight_rgb": 0.7})
    lrs = draw_learning_rates(jax.random.PRNGKey(1), b, (0.5, 2.0))
    fused = make_fused_loss(
        proj, pos, tri, RES, gt, lrs, weights,
        use_rgb=True, use_depth=False, use_mask=True,
        edge_adj=edge_adj, vtx_color=vtx_color, max_tris_per_tile=256,
    )
    params0 = pose_params(
        np.array([0.05, 0, 0, 1.0], np.float32),
        np.array([0.02, 0.0, -2.0], np.float32), b)

    def render_fn(mtx, layout="channels"):
        return render_batch(
            proj, mtx, pos, tri, RES, vtx_color=vtx_color, edge_adj=edge_adj,
            raster_impl="pallas", layout=layout, max_tris_per_tile=256,
        )

    result = refine_sharded(
        params0, render_fn, loss_fns, gt, lrs, weights, hypothesis_mesh(n),
        nb_iterations=1, base_lr=0.1, lr_decay=0.1, optimizer="adam",
        fused_loss_fn=fused,
    )
    assert np.isfinite(np.asarray(result.total_loss)).all()
    # every kernel trace (eval_shape pre-trace + the shard_map trace) saw
    # the shard-local batch; a full-batch (16) trace means an all-gather
    assert seen_batches, "raster kernel was never invoked"
    assert set(seen_batches) == {b // n}, seen_batches
    # and the per-hypothesis outputs really are laid out over all 8 devices
    assert len(result.mtx_history.sharding.device_set) == n


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_appearance_matches_unsharded():
    """Replicated appearance leaves (extra_params) refine identically under
    sharding: their gradients psum across shards (optimize.refine
    axis_name handling) so the shared-parameter update equals the
    global-batch gradient."""
    import jax.numpy as jnp

    from diffdope_tpu.optimize import pose_matrix, pose_params
    from diffdope_tpu.render.pipeline import render_batch
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
    v, fc = icosphere(1)
    pos = jnp.asarray(v.astype(np.float32) * 0.4)
    tri = jnp.asarray(fc.astype(np.int32))
    col_gt = jnp.asarray((v * 0.5 + 0.5).astype(np.float32))

    def render_fn(mtx, vtx_color=None):
        return render_batch(
            proj, mtx, pos, tri, RES,
            vtx_color=col_gt if vtx_color is None else vtx_color,
            raster_impl="reference", layout="channels",
        )

    q = np.array([0, 0, 0, 1.0], np.float32)
    t = np.array([0, 0, -2.0], np.float32)
    mtx_gt, _, _ = pose_matrix(pose_params(q, t, 1))
    gtr = jax.jit(lambda m: render_fn(m))(mtx_gt)
    gt = {
        "rgb": jnp.stack(gtr["rgb"], -1)[0],
        "segmentation": jnp.repeat(gtr["mask"][0][..., None], 3, -1),
    }

    params0 = pose_params(q, t, b)
    col0 = jnp.full_like(col_gt, 0.3)
    loss_fns, weights = select_losses(
        {"l1_rgb_with_mask": True, "weight_rgb": 1.0})
    lrs = draw_learning_rates(jax.random.PRNGKey(0), b, (0.5, 2.0))
    # SGD: updates are LINEAR in the gradients, so sharded-vs-unsharded
    # equality is a clean determinism check (Adam's 1/sqrt(nu) near zero
    # turns psum reduction-order float noise into sign flips)
    kwargs = dict(
        nb_iterations=2, base_lr=0.5, lr_decay=0.5, optimizer="sgd",
    )

    ref = jax.jit(
        lambda p, extra: refine(
            p, render_fn, loss_fns, gt, lrs, weights,
            extra_params=extra, **kwargs,
        )
    )(params0, {"vtx_color": col0})
    shard = refine_sharded(
        params0, render_fn, loss_fns, gt, lrs, weights, hypothesis_mesh(8),
        extra_params={"vtx_color": col0}, **kwargs,
    )
    np.testing.assert_allclose(
        np.asarray(ref.params["vtx_color"]),
        np.asarray(shard.params["vtx_color"]),
        rtol=2e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ref.mtx_history), np.asarray(shard.mtx_history),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ref.total_loss), np.asarray(shard.total_loss),
        rtol=2e-4, atol=1e-6,
    )
