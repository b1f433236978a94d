"""ROI-crop raster+loss (tile-aligned crop around the gt segmentation).

The crop's contract (pipeline.make_fused_loss, raster_v2/fused_loss
`roi=`): per-pixel kernel math stays in GLOBAL frame coordinates, so the
cropped raster is BIT-identical to the full-frame raster at the crop's
pixels, and the loss sums match the full-frame sums exactly as long as no
triangle renders within 2 px of a crop edge (the `_crop_leak` telemetry
counts violations per step).  The reference has no crop (nvdiffrast
rasterizes the full viewport); this is a TPU-side optimization that must
be invisible at the loss level.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffdope_tpu import geometry as geo
from diffdope_tpu.losses import select_losses
from diffdope_tpu.mesh import build_edge_adjacency
from diffdope_tpu.optimize import pose_matrix, pose_params
from diffdope_tpu.render.pipeline import make_fused_loss, render_batch
from diffdope_tpu.testing import icosphere

RES = (160, 256)  # hp=160 (5 tile rows), wp=256 (2 tile cols)
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
    pos = jnp.asarray(v.astype(np.float32) * 0.22)
    tri = jnp.asarray(fc.astype(np.int32))
    edge_adj = jnp.asarray(build_edge_adjacency(np.asarray(fc)))
    vtx_color = jnp.asarray((v * 0.5 + 0.5).astype(np.float32))

    # object off-center (upper-left) so the tile-aligned crop drops BOTH a
    # row band and the right 128-px tile column
    q_gt = geo.quat_from_axis_angle(np.array([0.2, 1.0, 0.1]), 0.8)
    t_gt = np.array([-0.32, 0.18, -2.0], np.float32)
    mtx_gt, _, _ = pose_matrix(
        pose_params(np.asarray(q_gt, np.float32), t_gt, 1)
    )

    def render_fn(mtx, layout="channels"):
        return render_batch(
            proj, mtx, pos, tri, RES, vtx_color=vtx_color, edge_adj=edge_adj,
            raster_impl="pallas", layout=layout, max_tris_per_tile=512,
        )

    gt_r = jax.jit(lambda m: render_fn(m, layout="stacked"))(mtx_gt)
    gt = {"rgb": gt_r["rgb"][0], "segmentation": gt_r["mask"][0]}

    dq = geo.quat_from_axis_angle(np.array([0.5, -0.2, 0.9]), np.deg2rad(8.0))
    q0 = np.asarray(
        geo.quat_multiply(jnp.asarray(dq), jnp.asarray(q_gt)), np.float32
    )
    t0 = t_gt + np.array([0.01, -0.01, 0.03], np.float32)
    params0 = pose_params(q0, t0, B)
    params0 = {k: val + jnp.arange(B) * 0.01 for k, val in params0.items()}

    seg = np.asarray(gt["segmentation"])[..., 0]
    assert seg.sum() > 200, "object must be visible"
    rows_any = (seg > 0).any(axis=1)
    cols_any = (seg > 0).any(axis=0)
    assert int(np.argmax(cols_any[::-1])) > 130, (
        "object must stay left of the second tile column for the crop test"
    )
    return dict(
        proj=proj, pos=pos, tri=tri, edge_adj=edge_adj, vtx_color=vtx_color,
        gt=gt, params0=params0, mtx_gt=mtx_gt,
    )


def _fused(scene, monkeypatch, crop, margin=16, spy=None):
    monkeypatch.setenv("DD_CROP", "1" if crop else "0")
    monkeypatch.setenv("DD_CROP_MARGIN", str(margin))
    if spy is not None:
        import diffdope_tpu.render.fused_loss as fl

        orig = fl.raster_loss_compact

        def wrapper(*args, **kwargs):
            spy.append((args[5], args[10] if len(args) > 10 else None))
            return orig(*args, **kwargs)

        monkeypatch.setattr(fl, "raster_loss_compact", wrapper)
    loss_fns, weights = select_losses(
        {"l1_mask": True, "weight_mask": 1.0,
         "l1_rgb_with_mask": True, "weight_rgb": 0.7}
    )
    lrs = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)
    return make_fused_loss(
        scene["proj"], scene["pos"], scene["tri"], RES, scene["gt"], lrs,
        weights, use_rgb=True, use_depth=False, use_mask=True,
        edge_adj=scene["edge_adj"], vtx_color=scene["vtx_color"],
        max_tris_per_tile=512, compact_total=1024,
    )


def test_cropped_raster_bit_equals_fullframe_slice(scene):
    """raster_gather_rows_compact(roi=...) == the full-frame outputs sliced
    to the crop window, bit for bit (same kernels, same global NDC)."""
    from diffdope_tpu.render.planar import (
        bin_triangles_planar,
        compact_bins,
        corner_planes,
        det_planar,
        pack_binned,
        _silhouette_planar,
    )
    from diffdope_tpu.render.raster_v2 import (
        _pick_chunk,
        raster_gather_rows_compact,
    )

    h, w = RES
    th, tw = 32, 128
    mtx, _, _ = pose_matrix(scene["params0"])
    mvp = jnp.einsum(
        "ij,bjk->bik", scene["proj"], mtx, precision="highest"
    )
    tri = np.asarray(scene["tri"])
    pos_c = scene["pos"][tri.reshape(-1)][None]
    cp = corner_planes(pos_c, mvp)
    degen = jnp.zeros((tri.shape[0],), bool)
    det = det_planar(cp, degen)
    idx, counts, ovf = bin_triangles_planar(
        cp, det, RES, (th, tw), 512
    )
    assert int(ovf) == 0
    sil = _silhouette_planar(det, scene["edge_adj"])
    attr = scene["vtx_color"][tri.reshape(-1)].reshape(tri.shape[0], 3, 3)

    total = 1024
    kc = _pick_chunk(total)

    def run(idx_t, counts_t, resolution, roi):
        flat, off_c, used, c_ovf = compact_bins(
            idx_t, counts_t, tri.shape[0], kc, total
        )
        assert int(c_ovf) == 0
        packed = pack_binned(
            pos_c, mvp, mtx, flat, attr, sil, degen, tri.shape[0]
        )
        return raster_gather_rows_compact(
            packed, counts_t, off_c, used, resolution, (th, tw),
            idx_t.shape[1] // kc, True, True, roi,
        )

    ids_full, rows_full = run(idx, counts, RES, None)

    # crop: drop the top tile row and the right tile column
    oy, ox, hc, wc = th, 0, 128, 128
    nty, ntx = 160 // th, 256 // tw
    idx_c = idx.reshape(nty, ntx, -1)[
        oy // th : (oy + hc) // th, ox // tw : (ox + wc) // tw
    ].reshape(-1, idx.shape[1])
    counts_c = counts.reshape(nty, ntx)[
        oy // th : (oy + hc) // th, ox // tw : (ox + wc) // tw
    ].reshape(-1)
    ids_crop, rows_crop = run(idx_c, counts_c, (hc, wc), (oy, ox, h, w))

    np.testing.assert_array_equal(
        np.asarray(ids_crop),
        np.asarray(ids_full)[:, oy : oy + hc, ox : ox + wc],
    )
    np.testing.assert_array_equal(
        np.asarray(rows_crop),
        np.asarray(rows_full)[:, :, oy : oy + hc, ox : ox + wc],
    )


def test_cropped_loss_matches_fullframe(scene, monkeypatch):
    """make_fused_loss with DD_CROP=1: same total loss, same per-term logs,
    same pose gradients as full-frame (the crop drops only |0-0| pixels),
    zero leak telemetry — and the crop really was applied."""
    mtx, _, _ = pose_matrix(scene["params0"])

    spy = []
    fn_crop = _fused(scene, monkeypatch, crop=True, spy=spy)
    total_c, logs_c = jax.jit(fn_crop)(mtx)
    assert spy, "spanning op not used"
    res_k, roi_k = spy[0]
    assert roi_k is not None and res_k[0] < 160, (
        f"crop was not applied: res={res_k} roi={roi_k}"
    )
    assert int(logs_c["_crop_leak"]) == 0
    assert "_crop_leak" in logs_c

    fn_full = _fused(scene, monkeypatch, crop=False)
    total_f, logs_f = jax.jit(fn_full)(mtx)
    assert "_crop_leak" not in logs_f

    np.testing.assert_allclose(
        np.asarray(total_c), np.asarray(total_f), rtol=1e-6, atol=1e-7
    )
    for k in ("rgb", "mask_selection"):
        np.testing.assert_allclose(
            np.asarray(logs_c[k]), np.asarray(logs_f[k]),
            rtol=1e-6, atol=1e-7,
        )

    def total_of(fn):
        def g(params):
            m, _, _ = pose_matrix(params)
            return fn(m)[0]
        return jax.jit(jax.grad(g))

    g_c = total_of(fn_crop)(scene["params0"])
    g_f = total_of(fn_full)(scene["params0"])
    for k in g_f:
        np.testing.assert_allclose(
            np.asarray(g_c[k]), np.asarray(g_f[k]), rtol=1e-5, atol=1e-7
        )


def test_crop_leak_telemetry_fires(scene, monkeypatch):
    """A pose that renders outside the crop interior raises _crop_leak > 0
    (the exactness guard the auto-recovery loop watches)."""
    fn_crop = _fused(scene, monkeypatch, crop=True)
    q = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    # push the object toward the (cropped-away) right edge
    t = np.array([0.55, -0.3, -2.0], np.float32)
    mtx, _, _ = pose_matrix(pose_params(q, t, B))
    _, logs = jax.jit(fn_crop)(mtx)
    assert int(logs["_crop_leak"]) > 0
