"""End-to-end pose refinement on a synthetic scene (the minimum slice).

Render a ground-truth pose, perturb it, and check the scan-based refiner
pulls the pose back — the core capability of the framework (reference
simple_scene.py flow, SURVEY.md section 7 "minimum end-to-end slice").
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from diffdope_tpu import geometry as geo
from diffdope_tpu.losses import select_losses
from diffdope_tpu.optimize import (
    argmin_hypothesis,
    draw_learning_rates,
    pose_matrix,
    pose_params,
    refine,
)
from diffdope_tpu.render.pipeline import render_batch

RES = (48, 48)


def _setup():
    h, w = RES
    f = 48.0
    proj = jnp.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )
    v = np.array(
        [[-0.4, -0.4, 0.0], [0.4, -0.4, 0.0], [0.4, 0.4, 0.0], [-0.4, 0.4, 0.0],
         [0.0, 0.0, 0.3]],
        np.float32,
    )
    f_idx = np.array(
        [[0, 1, 2], [0, 2, 3], [0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]], np.int32
    )
    # distinct colors give the rgb loss rotational signal
    col = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1]], np.float32
    )
    pos, tri, vtx_color = jnp.asarray(v), jnp.asarray(f_idx), jnp.asarray(col)

    def render_fn(mtx):
        return render_batch(
            proj, mtx, pos, tri, RES, vtx_color=vtx_color, raster_impl="reference"
        )

    return render_fn


def test_pose_recovery_translation():
    render_fn = _setup()
    q_gt = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    t_gt = np.array([0.0, 0.0, -3.0], np.float32)
    mtx_gt, _, _ = pose_matrix(pose_params(q_gt, t_gt, 1))
    gt_render = jax.jit(render_fn)(mtx_gt)
    gt = {
        "rgb": jax.lax.stop_gradient(gt_render["rgb"][0]),
        "segmentation": jax.lax.stop_gradient(gt_render["mask"][0]),
        "depth": jax.lax.stop_gradient(gt_render["depth"][0]),
    }

    # perturbed init: shifted in x/y
    b = 4
    t0 = t_gt + np.array([0.25, -0.18, 0.0], np.float32)
    params0 = pose_params(q_gt, t0, b)
    loss_fns, weights = select_losses(
        {"l1_mask": True, "weight_mask": 1.0, "l1_rgb_with_mask": True, "weight_rgb": 0.7}
    )
    lrs = draw_learning_rates(jax.random.PRNGKey(0), b, (0.5, 4.0))

    run = jax.jit(
        lambda p: refine(
            p, render_fn, loss_fns, gt, lrs, weights,
            nb_iterations=40, base_lr=0.4, lr_decay=0.1, optimizer="adam",
        )
    )
    result = run(params0)

    best = int(argmin_hypothesis(result.losses_values))
    mtx_final = np.asarray(result.mtx_history[-1, best])
    err0 = np.linalg.norm(t0 - t_gt)
    err1 = np.linalg.norm(mtx_final[:3, 3] - t_gt)
    assert err1 < err0 * 0.35, (err0, err1)
    # loss decreased for the winning hypothesis
    mask_log = np.asarray(result.losses_values["mask_selection"])[:, best]
    assert mask_log[-1] < mask_log[0] * 0.7


def test_pose_recovery_rotation():
    render_fn = _setup()
    q_gt = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    t_gt = np.array([0.0, 0.0, -3.0], np.float32)
    mtx_gt, _, _ = pose_matrix(pose_params(q_gt, t_gt, 1))
    gt_render = jax.jit(render_fn)(mtx_gt)
    gt = {
        "rgb": jax.lax.stop_gradient(gt_render["rgb"][0]),
        "segmentation": jax.lax.stop_gradient(gt_render["mask"][0]),
        "depth": jax.lax.stop_gradient(gt_render["depth"][0]),
    }
    b = 4
    q0 = geo.quat_from_axis_angle(np.array([0.3, 1.0, 0.2]), np.deg2rad(18.0))
    params0 = pose_params(q0.astype(np.float32), t_gt, b)
    loss_fns, weights = select_losses(
        {"l1_mask": True, "weight_mask": 1.0, "l1_rgb_with_mask": True, "weight_rgb": 2.0}
    )
    lrs = draw_learning_rates(jax.random.PRNGKey(1), b, (0.5, 4.0))

    run = jax.jit(
        lambda p: refine(
            p, render_fn, loss_fns, gt, lrs, weights,
            nb_iterations=80, base_lr=0.5, lr_decay=0.1, optimizer="adam",
        )
    )
    result = run(params0)
    best = int(argmin_hypothesis(result.losses_values))
    r_final = np.asarray(result.mtx_history[-1, best])[:3, :3]
    r_gt = np.asarray(geo.matrix33_from_quat(jnp.asarray(q_gt)))

    def angle_err(ra, rb):
        c = (np.trace(ra.T @ rb) - 1) / 2
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    r0 = np.asarray(geo.matrix33_from_quat(jnp.asarray(q0)))
    assert angle_err(r_final, r_gt) < angle_err(r0, r_gt) * 0.6, (
        angle_err(r0, r_gt), angle_err(r_final, r_gt))
    rgb_log = np.asarray(result.losses_values["rgb"])[:, best]
    assert rgb_log[-1] < rgb_log[0] * 0.6


def test_history_shapes_and_argmin():
    render_fn = _setup()
    b = 3
    params0 = pose_params(
        np.array([0, 0, 0, 1.0], np.float32), np.array([0, 0, -3.0], np.float32), b
    )
    mtx_gt, _, _ = pose_matrix(pose_params(
        np.array([0, 0, 0, 1.0], np.float32), np.array([0, 0, -3.0], np.float32), 1))
    gtr = jax.jit(render_fn)(mtx_gt)
    gt = {k: jax.lax.stop_gradient(v[0]) for k, v in
          [("rgb", gtr["rgb"]), ("segmentation", gtr["mask"]), ("depth", gtr["depth"])]}
    loss_fns, weights = select_losses(
        {"l1_mask": True, "weight_mask": 1.0, "l1_depth_with_mask": True, "weight_depth": 1.0}
    )
    lrs = draw_learning_rates(jax.random.PRNGKey(2), b, (0.01, 100.0))
    result = jax.jit(
        lambda p: refine(p, render_fn, loss_fns, gt, lrs, weights, nb_iterations=5)
    )(params0)
    assert result.mtx_history.shape == (6, b, 4, 4)
    assert set(result.losses_values) == {"mask_selection", "depth"}
    assert result.losses_values["depth"].shape == (6, b)
    idx = int(argmin_hypothesis(result.losses_values))
    assert 0 <= idx < b


def test_jitter_pose_params():
    """Seeded init diversification: hypothesis 0 pinned, magnitudes bounded,
    unit quats, deterministic, and 0-magnitude = identity."""
    from diffdope_tpu.optimize import jitter_pose_params, pose_params

    q = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    t = np.array([0.1, -0.2, -2.0], np.float32)
    p = pose_params(q, t, 16)
    key = jax.random.PRNGKey(7)

    # no-op when both magnitudes are 0 (reference parity default)
    assert jitter_pose_params(p, key, 0.0, 0.0) is p

    pj = jitter_pose_params(p, key, 15.0, 0.05)
    qj = np.stack([np.asarray(pj[k]) for k in ("qx", "qy", "qz", "qw")], -1)
    tj = np.stack([np.asarray(pj[k]) for k in ("x", "y", "z")], -1)
    # hypothesis 0 unjittered
    np.testing.assert_allclose(qj[0], q, atol=1e-6)
    np.testing.assert_allclose(tj[0], t, atol=1e-6)
    # the rest actually moved, within bounds
    np.testing.assert_allclose(np.linalg.norm(qj, axis=-1), 1.0, atol=1e-5)
    dots = np.abs(qj @ q)
    angles = 2 * np.arccos(np.clip(dots, -1, 1))
    assert (angles[1:] <= np.deg2rad(15.0) + 1e-4).all()
    assert (angles[1:] > 0).any()
    dt = np.linalg.norm(tj - t, axis=-1)
    assert (dt[1:] <= 0.05 + 1e-6).all() and (dt[1:] > 0).any()
    # deterministic
    pj2 = jitter_pose_params(p, key, 15.0, 0.05)
    np.testing.assert_array_equal(np.asarray(pj["qx"]), np.asarray(pj2["qx"]))


def test_refine_with_restarts():
    """Restart-from-argmin: same total step count, finite losses, and the
    post-restart segment starts from the previous argmin's neighborhood."""
    from diffdope_tpu.optimize import refine_with_restarts
    from diffdope_tpu.testing import synthetic_scene

    b = 8
    scene = synthetic_scene(
        subdiv=1, resolution=(32, 32), batchsize=b, seed=5,
        raster_impl="reference", perturb_deg=25.0,
    )
    loss_fns, weights = select_losses({"l1_mask": True, "weight_mask": 1.0})
    lrs = draw_learning_rates(jax.random.PRNGKey(1), b, (0.5, 2.0))

    result = refine_with_restarts(
        scene["params0"], scene["render_fn"], loss_fns, scene["gt"], lrs,
        weights, nb_iterations=5, restarts=1, restart_jitter_deg=5.0,
        restart_jitter_trans=0.01, key=jax.random.PRNGKey(2),
        base_lr=0.05, lr_decay=0.1, optimizer="adam",
    )
    assert result.mtx_history.shape == (6, b, 4, 4)
    assert result.total_loss.shape == (6,)
    tl = np.asarray(result.total_loss)
    assert np.isfinite(tl).all()
    for k, v in result.losses_values.items():
        assert v.shape == (6, b), (k, v.shape)
    # after the restart (step 3) all hypotheses sit near one pose: the
    # spread of translations collapses vs the perturbed-but-shared init
    mtx = np.asarray(result.mtx_history)
    spread_post = np.ptp(mtx[3, :, :3, 3], axis=0).max()
    assert spread_post <= 2 * 0.01 + 0.05, spread_post


def test_argmin_step_hypothesis_rules():
    """best_step picks the global (step, hypothesis) minimum over the whole
    history (so a hypothesis that visited a good pose and then diverged
    still wins at its good step); last_step reproduces the reference rule
    (get_argmin, reference diffdope.py:1488-1513)."""
    from diffdope_tpu.optimize import argmin_step_hypothesis

    # two terms, 4 steps, 3 hypotheses; mean-of-terms is what is ranked
    a = np.array(
        [[5.0, 5.0, 5.0],
         [4.0, 0.2, 5.0],   # hyp 1 visits the best pose at step 1...
         [4.0, 3.0, 5.0],
         [1.0, 9.0, 5.0]],  # ...then diverges; hyp 0 is best at the end
        np.float32,
    )
    losses = {"rgb": jnp.asarray(a), "mask_selection": jnp.asarray(a * 3.0)}

    s, b = argmin_step_hypothesis(losses, "best_step")
    assert (int(s), int(b)) == (1, 1)

    s, b = argmin_step_hypothesis(losses, "last_step")
    assert (int(s), int(b)) == (3, 0)
    # last_step matches the original single-index rule
    assert int(b) == int(argmin_hypothesis(losses))

    import pytest

    with pytest.raises(ValueError):
        argmin_step_hypothesis(losses, "bogus")


def test_best_step_never_worse_than_init():
    """The best_step winner's logged loss can never exceed step 0's best —
    step 0 scores the init pose itself, so the selected pose is never worse
    (in loss) than where the refinement started.  Drive a refinement with a
    destructively large LR so the trajectory genuinely diverges."""
    from diffdope_tpu.optimize import argmin_step_hypothesis

    render_fn = _setup()
    b = 4
    q_gt = geo.quat_from_axis_angle(np.array([0.0, 1.0, 0.0]), 0.3)
    t_gt = np.array([0.0, 0.0, -3.0], np.float32)
    mtx_gt, _, _ = pose_matrix(pose_params(np.asarray(q_gt, np.float32), t_gt, 1))
    gtr = jax.jit(render_fn)(mtx_gt)
    gt = {"rgb": gtr["rgb"][0], "segmentation": gtr["mask"][0],
          "depth": gtr["depth"][0]}

    # tiny init error + huge SGD base_lr: steps overshoot immediately
    dq = geo.quat_from_axis_angle(np.array([1.0, 0.2, 0.0]), np.deg2rad(1.0))
    q0 = np.asarray(geo.quat_multiply(jnp.asarray(dq), jnp.asarray(q_gt)))
    params0 = pose_params(q0.astype(np.float32), t_gt, b)
    loss_fns, weights = select_losses({"l1_mask": True, "weight_mask": 1.0})
    lrs = draw_learning_rates(jax.random.PRNGKey(0), b, (0.01, 100.0))
    result = jax.jit(
        lambda p: refine(p, render_fn, loss_fns, gt, lrs, weights,
                         nb_iterations=12, base_lr=500.0, optimizer="sgd")
    )(params0)

    mean = np.asarray(
        jnp.mean(jnp.stack(list(result.losses_values.values()), 0), axis=0)
    )  # (steps, B)
    s, hyp = argmin_step_hypothesis(result.losses_values, "best_step")
    s, hyp = int(s), int(hyp)
    assert mean[s, hyp] <= mean[0].min() + 1e-7
    assert mean[s, hyp] == mean.min()


def test_restarts_segmented_identical():
    """refine_with_restarts(segment_steps=k) chunks each restart segment's
    device dispatches while carrying optimizer state — numerically identical
    history to the one-dispatch-per-restart run."""
    import functools

    from diffdope_tpu.optimize import refine_with_restarts
    from diffdope_tpu.testing import synthetic_scene

    b = 4
    scene = synthetic_scene(
        subdiv=1, resolution=(32, 32), batchsize=b, seed=3,
        raster_impl="reference", perturb_deg=15.0,
    )
    loss_fns, weights = select_losses({"l1_mask": True, "weight_mask": 1.0})
    lrs = draw_learning_rates(jax.random.PRNGKey(1), b, (0.5, 2.0))
    jit_refine = jax.jit(
        functools.partial(
            refine, render_fn=scene["render_fn"], loss_fns=tuple(loss_fns),
            weights=weights, nb_iterations=7, base_lr=0.05, lr_decay=0.1,
            optimizer="adam",
        ),
        static_argnames=("num_steps",),
    )
    kw = dict(
        nb_iterations=7, restarts=1, restart_jitter_deg=5.0,
        restart_jitter_trans=0.01, key=jax.random.PRNGKey(2),
        jit_refine=jit_refine,
    )
    r_whole = refine_with_restarts(
        scene["params0"], None, (), scene["gt"], lrs, weights, **kw)
    r_chunk = refine_with_restarts(
        scene["params0"], None, (), scene["gt"], lrs, weights,
        segment_steps=3, **kw)
    np.testing.assert_array_equal(
        np.asarray(r_whole.mtx_history), np.asarray(r_chunk.mtx_history))
    for k in r_whole.losses_values:
        np.testing.assert_array_equal(
            np.asarray(r_whole.losses_values[k]),
            np.asarray(r_chunk.losses_values[k]))


def test_step_callback_fires_per_step():
    """step_callback: per-step live loss from inside the compiled scan
    (jax.debug.callback) — indices 0..n-1 in order, losses matching the
    returned per-step totals."""
    from diffdope_tpu.optimize import refine
    from diffdope_tpu.testing import synthetic_scene

    b = 4
    scene = synthetic_scene(
        subdiv=1, resolution=(32, 32), batchsize=b, seed=3,
        raster_impl="reference",
    )
    loss_fns, weights = select_losses({"l1_mask": True, "weight_mask": 1.0})
    lrs = draw_learning_rates(jax.random.PRNGKey(1), b, (0.5, 2.0))

    seen = []

    def cb(i, total):
        seen.append((int(i), float(total)))

    result = jax.jit(
        partial(
            refine, render_fn=scene["render_fn"],
            loss_fns=tuple(loss_fns), weights=weights, nb_iterations=4,
            base_lr=0.05, lr_decay=0.1, optimizer="adam", step_callback=cb,
        )
    )(scene["params0"], gt=scene["gt"], learning_rates=lrs)
    jax.effects_barrier()
    assert [i for i, _ in seen] == [0, 1, 2, 3, 4]
    tl = np.asarray(result.total_loss)
    for i, v in seen:
        assert v == tl[i], (i, v, tl[i])
