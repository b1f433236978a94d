"""Fused shade+AA+loss kernel vs the unfused render_batch + losses path.

The fused path (render/fused_loss.py + pipeline.make_fused_loss) must
reproduce the unfused pipeline's loss values, per-term logs, and pose
gradients exactly (both implement the reference semantics,
diffdope/diffdope.py:534-613); it differs only in where the math runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffdope_tpu import geometry as geo
from diffdope_tpu.losses import select_losses
from diffdope_tpu.mesh import build_edge_adjacency
from diffdope_tpu.optimize import pose_matrix, pose_params, refine
from diffdope_tpu.render.pipeline import make_fused_loss, render_batch
from diffdope_tpu.testing import icosphere

RES = (64, 96)
B = 3


@pytest.fixture(scope="module")
def scene():
    h, w = RES
    f = 1.2 * max(h, w)
    proj = jnp.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )
    v, fc = icosphere(2)  # 320 tris
    pos = jnp.asarray(v.astype(np.float32) * 0.4)
    tri = jnp.asarray(fc.astype(np.int32))
    edge_adj = jnp.asarray(build_edge_adjacency(np.asarray(fc)))
    vtx_color = jnp.asarray((v * 0.5 + 0.5).astype(np.float32))

    q_gt = geo.quat_from_axis_angle(np.array([0.2, 1.0, 0.1]), 0.8)
    t_gt = np.array([0.0, 0.0, -2.0], np.float32)
    mtx_gt, _, _ = pose_matrix(pose_params(np.asarray(q_gt, np.float32), t_gt, 1))

    def render_fn(mtx, layout="channels"):
        return render_batch(
            proj, mtx, pos, tri, RES, vtx_color=vtx_color, edge_adj=edge_adj,
            raster_impl="pallas", layout=layout, max_tris_per_tile=512,
        )

    gt_r = jax.jit(lambda m: render_fn(m, layout="stacked"))(mtx_gt)
    gt = {
        "rgb": gt_r["rgb"][0],
        "segmentation": gt_r["mask"][0],
        "depth": gt_r["depth"][0],
    }

    dq = geo.quat_from_axis_angle(np.array([0.5, -0.2, 0.9]), np.deg2rad(10.0))
    q0 = np.asarray(geo.quat_multiply(jnp.asarray(dq), jnp.asarray(q_gt)), np.float32)
    t0 = t_gt + np.array([0.03, -0.02, 0.05], np.float32)
    params0 = pose_params(q0, t0, B)
    params0 = {k: val + jnp.arange(B) * 0.01 for k, val in params0.items()}

    return dict(
        proj=proj, pos=pos, tri=tri, edge_adj=edge_adj, vtx_color=vtx_color,
        render_fn=render_fn, gt=gt, params0=params0,
    )


def _loss_setup(scene, cfg):
    loss_fns, weights = select_losses(cfg)
    lrs = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)

    def unfused(params):
        mtx, _, _ = pose_matrix(params)
        renders = scene["render_fn"](mtx)
        total = jnp.float32(0.0)
        logs = {}
        for fn in loss_fns:
            term, (key, vals) = fn(renders, scene["gt"], lrs, weights)
            total = total + term
            logs[key] = vals
        return total, logs

    fused_fn = make_fused_loss(
        scene["proj"], scene["pos"], scene["tri"], RES, scene["gt"], lrs,
        weights,
        use_rgb=bool(cfg.get("l1_rgb_with_mask")),
        use_depth=bool(cfg.get("l1_depth_with_mask")),
        use_mask=bool(cfg.get("l1_mask")),
        edge_adj=scene["edge_adj"], vtx_color=scene["vtx_color"],
        max_tris_per_tile=512,
    )

    def fused(params):
        mtx, _, _ = pose_matrix(params)
        return fused_fn(mtx)

    return unfused, fused, lrs, weights, loss_fns


@pytest.mark.parametrize(
    "cfg",
    [
        {"l1_mask": True, "weight_mask": 1.0},
        {
            "l1_mask": True, "weight_mask": 1.0,
            "l1_rgb_with_mask": True, "weight_rgb": 0.7,
            "l1_depth_with_mask": True, "weight_depth": 0.9,
        },
    ],
    ids=["mask_only", "all_terms"],
)
def test_fused_matches_unfused(scene, cfg):
    unfused, fused, _, _, _ = _loss_setup(scene, cfg)
    p = scene["params0"]
    (tu, logs_u), gu = jax.jit(jax.value_and_grad(unfused, has_aux=True))(p)
    (tf, logs_f), gf = jax.jit(jax.value_and_grad(fused, has_aux=True))(p)

    # the fused fn carries binning telemetry in underscore keys (split out of
    # the loss logs by optimize.refine); the loss-term keys must match exactly
    assert "_bin_overflow" in logs_f
    logs_f = {k: v for k, v in logs_f.items() if not k.startswith("_")}
    assert set(logs_u) == set(logs_f)
    np.testing.assert_allclose(tu, tf, rtol=1e-5, atol=1e-7)
    for k in logs_u:
        np.testing.assert_allclose(
            np.asarray(logs_u[k]), np.asarray(logs_f[k]), rtol=1e-5,
            atol=1e-7, err_msg=f"log {k}",
        )
    for k in gu:
        np.testing.assert_allclose(
            np.asarray(gu[k]), np.asarray(gf[k]), rtol=2e-4, atol=1e-6,
            err_msg=f"grad {k}",
        )


def test_refine_with_fused_loss(scene):
    """refine(fused_loss_fn=...) produces the same trajectory as unfused."""
    cfg = {
        "l1_mask": True, "weight_mask": 1.0,
        "l1_rgb_with_mask": True, "weight_rgb": 0.7,
    }
    unfused, fused, lrs, weights, loss_fns = _loss_setup(scene, cfg)

    import functools

    common = dict(
        gt=scene["gt"], learning_rates=lrs,
        opt_state=None, num_steps=4,
    )
    ref = jax.jit(
        functools.partial(
            refine, render_fn=scene["render_fn"], loss_fns=tuple(loss_fns),
            weights=weights, nb_iterations=3, base_lr=0.02, lr_decay=0.1,
            optimizer="adam",
        ),
        static_argnames=("num_steps",),
    )(scene["params0"], **common)
    fused_loss_fn = make_fused_loss(
        scene["proj"], scene["pos"], scene["tri"], RES, scene["gt"], lrs,
        weights, use_rgb=True, use_depth=False, use_mask=True,
        edge_adj=scene["edge_adj"], vtx_color=scene["vtx_color"],
        max_tris_per_tile=512,
    )
    fus = jax.jit(
        functools.partial(
            refine, render_fn=scene["render_fn"], loss_fns=tuple(loss_fns),
            weights=weights, nb_iterations=3, base_lr=0.02, lr_decay=0.1,
            optimizer="adam", fused_loss_fn=fused_loss_fn,
        ),
        static_argnames=("num_steps",),
    )(scene["params0"], **common)

    np.testing.assert_allclose(
        np.asarray(ref.total_loss), np.asarray(fus.total_loss),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ref.mtx_history), np.asarray(fus.mtx_history),
        rtol=1e-4, atol=1e-5,
    )
    for k in ref.losses_values:
        np.testing.assert_allclose(
            np.asarray(ref.losses_values[k]),
            np.asarray(fus.losses_values[k]),
            rtol=1e-4, atol=1e-6, err_msg=k,
        )


def test_bin_overflow_telemetry(scene):
    """Per-step _bin_overflow telemetry: fires when a tile's triangle count
    exceeds max_tris_per_tile mid-run, is split out of losses_values, and
    drives the session's trajectory warning (VERDICT r2 item 8)."""
    import logging

    from diffdope_tpu.diffdope import DiffDope
    from diffdope_tpu.losses import select_losses

    loss_fns, weights = select_losses({"l1_mask": True, "weight_mask": 1.0})
    lrs = jnp.ones((B,), jnp.float32)

    # K=128 < 320 triangles: the sphere always occupies few tiles at this
    # scale, so binning overflows at every step of the refinement
    fused_small_k = make_fused_loss(
        scene["proj"], scene["pos"], scene["tri"], RES, scene["gt"], lrs,
        weights, use_mask=True,
        edge_adj=scene["edge_adj"], vtx_color=scene["vtx_color"],
        max_tris_per_tile=128,
    )
    import functools

    res = jax.jit(
        functools.partial(
            refine, render_fn=scene["render_fn"], loss_fns=tuple(loss_fns),
            weights=weights, nb_iterations=2, base_lr=0.01, lr_decay=0.1,
            optimizer="adam", fused_loss_fn=fused_small_k,
        ),
    )(scene["params0"], gt=scene["gt"], learning_rates=lrs)

    assert res.telemetry is not None and "_bin_overflow" in res.telemetry
    ov = np.asarray(res.telemetry["_bin_overflow"])
    assert ov.shape == (3,)
    assert (ov > 0).all(), ov
    assert not any(k.startswith("_") for k in res.losses_values)

    # the session check warns from the trajectory telemetry alone (no
    # final-pose re-binning) — the mid-run excursion case
    class _FakeResult:
        telemetry = {"_bin_overflow": np.array([0, 7, 0])}

    logger = logging.getLogger("diffdope_tpu")
    records = []

    class _Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = _Capture()
    logger.addHandler(h)
    old_level = logger.level
    logger.setLevel(logging.WARNING)
    try:
        DiffDope._check_bin_overflow(None, _FakeResult())
    finally:
        logger.removeHandler(h)
        logger.setLevel(old_level)
    assert any("bin overflow during refinement" in m for m in records), records

    # and stays silent when the trajectory never overflowed
    class _CleanResult:
        telemetry = {"_bin_overflow": np.array([0, 0, 0])}

    records.clear()
    logger.addHandler(h)
    logger.setLevel(logging.WARNING)
    try:
        DiffDope._check_bin_overflow(None, _CleanResult())
    finally:
        logger.removeHandler(h)
        logger.setLevel(old_level)
    assert not records, records


def test_fused_texture_matches_unfused(scene):
    """Semi-fused exact-texture path (make_fused_loss(tex=...)) must
    reproduce the unfused render_batch(tex=...) + losses path: totals,
    logs, and pose gradients (reference per-pixel bilinear contract,
    diffdope.py:218-228)."""
    from diffdope_tpu.render.pipeline import render_batch as rb

    v = np.asarray(scene["pos"])
    n = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-9)
    uv = np.stack(
        [0.5 + np.arctan2(n[:, 2], n[:, 0]) / (2 * np.pi),
         0.5 - np.arcsin(np.clip(n[:, 1], -1, 1)) / np.pi], axis=1
    ).astype(np.float32)
    uv = jnp.asarray(uv)
    uv_idx = scene["tri"]
    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.uniform(0.1, 0.9, (32, 32, 3)).astype(np.float32))

    loss_fns, weights = select_losses(
        {"l1_mask": True, "weight_mask": 1.0,
         "l1_rgb_with_mask": True, "weight_rgb": 0.7}
    )
    lrs = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)

    def unfused(params):
        mtx, _, _ = pose_matrix(params)
        renders = rb(
            scene["proj"], mtx, scene["pos"], scene["tri"], RES,
            uv=uv, uv_idx=uv_idx, tex=tex, edge_adj=scene["edge_adj"],
            raster_impl="pallas", layout="channels", max_tris_per_tile=512,
        )
        total = jnp.float32(0.0)
        logs = {}
        for fn in loss_fns:
            term, (key, vals) = fn(renders, scene["gt"], lrs, weights)
            total = total + term
            logs[key] = vals
        return total, logs

    fused_fn = make_fused_loss(
        scene["proj"], scene["pos"], scene["tri"], RES, scene["gt"], lrs,
        weights, use_rgb=True, use_mask=True,
        edge_adj=scene["edge_adj"], tex=tex, uv=uv, uv_idx=uv_idx,
        max_tris_per_tile=512,
    )

    def fused(params):
        mtx, _, _ = pose_matrix(params)
        return fused_fn(mtx)

    p = scene["params0"]
    (tu, logs_u), gu = jax.jit(jax.value_and_grad(unfused, has_aux=True))(p)
    (tf, logs_f), gf = jax.jit(jax.value_and_grad(fused, has_aux=True))(p)
    logs_f = {k: v for k, v in logs_f.items() if not k.startswith("_")}

    assert set(logs_u) == set(logs_f)
    np.testing.assert_allclose(tu, tf, rtol=1e-5, atol=1e-7)
    for k in logs_u:
        np.testing.assert_allclose(
            np.asarray(logs_u[k]), np.asarray(logs_f[k]), rtol=1e-5,
            atol=1e-7, err_msg=f"log {k}",
        )
    for k in gu:
        np.testing.assert_allclose(
            np.asarray(gu[k]), np.asarray(gf[k]), rtol=2e-4, atol=1e-6,
            err_msg=f"grad {k}",
        )


def test_texture_crop_matches_full(scene, monkeypatch):
    """gt-seg crop of the exact-texture gathers (DD_TEX_CROP): the rgb
    term carries a gt-seg factor (reference diffdope.py:547-562), so
    colors outside the crop can never contribute to the loss or its
    gradients.  Loss and logs must be BIT-identical; gradients are
    identical math but accumulate d_rows in a different op order (the
    crop path slices rows before the uv shade), so they match to f32
    reassociation tolerance."""
    v = np.asarray(scene["pos"])
    n = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-9)
    uv = jnp.asarray(
        np.stack(
            [0.5 + np.arctan2(n[:, 2], n[:, 0]) / (2 * np.pi),
             0.5 - np.arcsin(np.clip(n[:, 1], -1, 1)) / np.pi],
            axis=1,
        ).astype(np.float32)
    )
    rng = np.random.default_rng(5)
    tex = jnp.asarray(rng.uniform(0.1, 0.9, (32, 32, 3)).astype(np.float32))
    loss_fns, weights = select_losses(
        {"l1_mask": True, "weight_mask": 1.0,
         "l1_rgb_with_mask": True, "weight_rgb": 0.7}
    )
    lrs = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)

    def build():
        return make_fused_loss(
            scene["proj"], scene["pos"], scene["tri"], RES, scene["gt"],
            lrs, weights, use_rgb=True, use_mask=True,
            edge_adj=scene["edge_adj"], tex=tex, uv=uv,
            uv_idx=scene["tri"], max_tris_per_tile=512,
        )

    monkeypatch.setenv("DD_TEX_CROP", "1")
    fn_crop = build()
    monkeypatch.setenv("DD_TEX_CROP", "0")
    fn_full = build()

    def total(fn, params):
        mtx, _, _ = pose_matrix(params)
        t, logs = fn(mtx)
        return t, {k: v for k, v in logs.items() if not k.startswith("_")}

    p = scene["params0"]
    (tc, lc), gc = jax.jit(
        jax.value_and_grad(lambda q: total(fn_crop, q), has_aux=True)
    )(p)
    (tf, lf), gf = jax.jit(
        jax.value_and_grad(lambda q: total(fn_full, q), has_aux=True)
    )(p)
    assert np.asarray(tc) == np.asarray(tf)
    for k in lf:
        np.testing.assert_array_equal(np.asarray(lc[k]), np.asarray(lf[k]))
    for k in gf:
        np.testing.assert_allclose(
            np.asarray(gc[k]), np.asarray(gf[k]), rtol=2e-3, atol=1e-7,
            err_msg=f"grad {k}",
        )


def test_spanning_op_matches_chained(scene, monkeypatch):
    """raster_loss_compact (raster + loss under ONE custom VJP) must be
    bit-identical to the chained raster_gather_rows_compact +
    fused_loss_sums ops with DD_DROWS_BF16=0 (same kernels, same inputs),
    and close with the bf16 d_rows cotangent (one rounding of the
    per-pixel cotangents at the HBM boundary)."""
    lrs = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)
    _, weights = select_losses(
        {"l1_mask": True, "weight_mask": 1.0,
         "l1_rgb_with_mask": True, "weight_rgb": 0.7})

    def build():
        return make_fused_loss(
            scene["proj"], scene["pos"], scene["tri"], RES, scene["gt"],
            lrs, weights, use_rgb=True, use_mask=True,
            edge_adj=scene["edge_adj"], vtx_color=scene["vtx_color"],
            max_tris_per_tile=512, compact_total=1024,
        )

    def val_and_grad(fn):
        def loss(p):
            mtx, _, _ = pose_matrix(p)
            return fn(mtx)[0]

        v, g = jax.value_and_grad(loss)(scene["params0"])
        return v, g

    monkeypatch.setenv("DD_SPAN", "0")
    v_chain, g_chain = val_and_grad(build())
    monkeypatch.setenv("DD_SPAN", "1")
    monkeypatch.setenv("DD_DROWS_BF16", "0")
    v_span, g_span = val_and_grad(build())
    np.testing.assert_array_equal(np.asarray(v_chain), np.asarray(v_span))
    for k in g_chain:
        np.testing.assert_array_equal(
            np.asarray(g_chain[k]), np.asarray(g_span[k])
        )

    monkeypatch.setenv("DD_DROWS_BF16", "1")
    v_bf, g_bf = val_and_grad(build())
    # forward identical (bf16 only touches the backward intermediate)
    np.testing.assert_array_equal(np.asarray(v_chain), np.asarray(v_bf))
    for k in g_chain:
        ref = np.asarray(g_chain[k])
        got = np.asarray(g_bf[k])
        scale = max(1e-6, float(np.abs(ref).max()))
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-2)
