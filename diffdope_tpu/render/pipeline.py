"""Full differentiable render of a posed mesh (reference `render_texture_batch`).

Reference: diffdope/diffdope.py:156-234.  Produces {'rgb', 'depth', 'mask',
'rast_out'} for a batch of pose hypotheses:

* rgb   — textured (bilinear) or vertex-color, background-masked
          (reference diffdope.py:218-231);
* depth — negated camera-space z (reference diffdope.py:203-209), including
          the reference's exact background value (-t_z);
* mask  — coverage (3-channel, like interpolating all-ones attributes,
          reference diffdope.py:212-213) passed through antialiasing, the
          only coverage->pose gradient path (diffdope.py:214).

TPU-native architecture (see render/shade.py):

* object-space vertices are corner-expanded at compile time (gather of
  constants) and transformed by one MXU matmul — no per-step vertex gather;
* per-triangle data (barycentric planes, z plane, attribute interpolation
  planes, silhouette bits) is packed into one 32-lane row; shading any pixel
  is ONE row gather + FMAs;
* antialiasing reuses the gathered rows — zero additional gathers;
* rast_db is skipped unless requested (the reference's texture path uses
  filter_mode='linear', which ignores derivatives — diffdope.py:225).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffdope_tpu.geometry import xfm_points
from diffdope_tpu.render.rasterize import (
    raster_ids_pallas,
    raster_ids_reference,
)
from diffdope_tpu.render.gather_rows import invert_bins, raster_gather_rows
from diffdope_tpu.render.setup_tris import triangle_setup_from_corners
from diffdope_tpu.render.shade import (
    antialias_rows,
    attribute_planes,
    pack_rows,
    shade_from_rows,
    shade_rows,
    silhouette_bits,
)
from diffdope_tpu.render.texture import texture

Array = jax.Array


def _pack_dispatch(pos_c, mvp, mtx, idx, attr_corner_vals, sil, degenerate,
                   t_count, interpret):
    """Bin-ordered table pack: the fused Pallas kernel when eligible
    (DD_PACK=pallas default; static vertices/attrs), else the XLA
    planar.pack_binned.  One dispatch for all call sites so the
    eligibility rules (and the uniform/compact bit-equality contract)
    can never diverge between them."""
    import os

    from diffdope_tpu.render.planar import pack_binned

    if os.environ.get("DD_PACK", "pallas") == "pallas":
        from diffdope_tpu.render.pack_kernel import pack_binned_auto

        packed = pack_binned_auto(
            pos_c, mvp, mtx, idx, attr_corner_vals, sil, degenerate,
            t_count, interpret,
        )
        if packed is not None:
            return packed
    return pack_binned(
        pos_c, mvp, mtx, idx, attr_corner_vals, sil, degenerate, t_count
    )


def render_batch(
    proj_cam: Array,
    mtx: Array,
    pos: Array,
    pos_idx: Array,
    resolution: Tuple[int, int],
    uv: Optional[Array] = None,
    uv_idx: Optional[Array] = None,
    tex: Optional[Array] = None,
    vtx_color: Optional[Array] = None,
    return_rast_out: bool = False,
    antialias_rgb: bool = False,
    raster_impl: str = "auto",
    tile_hw: Tuple[int, int] = (32, 128),
    max_tris_per_tile: int = 1024,
    edge_adj: Optional[Array] = None,
    corner_colors: Optional[Array] = None,
    layout: str = "stacked",
    bins: Optional[Tuple[Array, Array, Array, Array]] = None,
    cull_backfaces: bool = False,
    max_occ: int = 16,
    compact_total: Optional[int] = None,
) -> Dict[str, Array]:
    """Render a mesh under B pose hypotheses.

    Args:
        proj_cam: (4,4) or (B,4,4) OpenGL projection.
        mtx: (B,4,4) object-to-camera (OpenGL frame) poses — differentiable.
        pos: (N,3) object-space vertices (or (B,N,3)).
        pos_idx: (T,3) int32 triangles.
        uv/uv_idx/tex: texture path inputs ((N,2), (T,3), (TH,TW,3)).
        vtx_color: (N,3) vertex colors — used when tex is None.
        return_rast_out: include the raw rasterizer output.
        antialias_rgb: also antialias the color image (the reference only
            antialiases the mask).
        raster_impl/tile_hw/max_tris_per_tile: rasterizer knobs.
        edge_adj: (T,3) silhouette adjacency (mesh.build_edge_adjacency).
        layout: 'stacked' (reference-compatible channels-last outputs) or
            'channels' (channel-planar (B,H,W) arrays — the TPU-fast layout
            the losses consume; 'rgb' is a tuple of 3, 'mask' single-channel
            with identical 3 channels implied).

    Returns:
        layout='stacked': dict with 'rgb' (B,H,W,3), 'depth' (B,H,W),
        'mask' (B,H,W,3), 'rast_out' ((B,H,W,4) or None).
    """
    if mtx.ndim == 2:
        mtx = mtx[None]
    b = mtx.shape[0]
    if proj_cam.ndim == 2:
        proj_cam = proj_cam[None]

    mvp = jnp.einsum("...ij,...jk->...ik", proj_cam, mtx, precision="highest")

    t_count = pos_idx.shape[0]
    flat_idx = pos_idx.reshape(-1)

    # corner expansion of object-space constants (compile-time folded)
    if pos.ndim == 2:
        pos_c = pos[flat_idx][None]  # (1, 3T, 3)
    else:
        pos_c = jnp.take(pos, flat_idx, axis=1)

    # per-corner attribute values (static for meshes, traced for appearance
    # optimization); the rotation-only camera z is appended as the depth
    # channel in each branch (reference depth semantics incl. the -t_z
    # background, diffdope.py:203-209)
    color_mode = None
    if corner_colors is not None:
        attr_corner_vals = corner_colors  # (T, 3, 3) baked texture / Gouraud
        color_mode = "planes"
    elif tex is not None:
        if uv is None or uv_idx is None:
            raise ValueError("textured render requires uv and uv_idx")
        attr_corner_vals = uv[uv_idx.reshape(-1)].reshape(t_count, 3, 2)
        color_mode = "texture"
    elif vtx_color is not None:
        attr_corner_vals = vtx_color[flat_idx].reshape(t_count, 3, 3)
        color_mode = "planes"
    else:
        raise ValueError("render requires corner_colors, tex(+uv), or vtx_color")
    n_attr = attr_corner_vals.shape[-1] + 1  # + rotation-z depth channel

    impl = raster_impl
    if impl == "auto":
        impl = "reference" if t_count <= 256 else "pallas"

    bin_overflow = None
    if impl == "reference":
        corners_clip = xfm_points(pos_c, mvp).reshape(b, t_count, 3, 4)
        setup = triangle_setup_from_corners(corners_clip)
        zrot_c = jnp.einsum(
            "...j,...nj->...n", mtx[..., 2, :3], pos_c, precision="highest"
        ).reshape(b, t_count, 3, 1)
        corner_vals = jnp.concatenate(
            [
                jnp.broadcast_to(
                    attr_corner_vals[None], (b,) + attr_corner_vals.shape
                ),
                zrot_c,
            ],
            axis=-1,
        )
        planes = attribute_planes(corner_vals, setup)
        packed = pack_rows(setup, silhouette_bits(setup.det, edge_adj), planes)
        ids = jax.lax.stop_gradient(raster_ids_reference(setup.coef, resolution))
        sh = shade_rows(
            ids, packed, resolution, attr_channels=n_attr,
            stack_outputs=return_rast_out,
        )
    elif impl == "pallas":
        # planar fast path (render/planar.py): every per-triangle quantity
        # is built as a (B, T) plane (no small minor dims); one transpose at
        # the kernel boundary converts to the sublane-major layout the
        # Mosaic kernel needs for its per-triangle scalar loads
        from diffdope_tpu.render.planar import (
            _silhouette_planar,
            bin_triangles_planar,
            compact_bins,
            corner_planes,
            det_planar,
            packed_planar,
        )

        interpret = jax.default_backend() not in ("tpu", "axon")
        cp = corner_planes(pos_c, mvp)
        degenerate = (
            (pos_idx[:, 0] == pos_idx[:, 1])
            | (pos_idx[:, 1] == pos_idx[:, 2])
            | (pos_idx[:, 2] == pos_idx[:, 0])
        )

        import os

        # bin-ordered packing (planar.pack_binned, default): skips the
        # compact->bin lane gather in the forward and the whole inverted-bin
        # reduction in the backward.  Static per-corner attributes only — a
        # traced-attr (appearance) gather would put a large scatter-add in
        # the backward, so that path keeps the compact packing.
        use_binned = (
            os.environ.get("DD_BINNED", "1") == "1"
            and os.environ.get("DD_RASTER", "v2") != "v3"
            and attr_corner_vals.ndim == 3
            and pos.ndim == 2
        )
        if use_binned:
            from diffdope_tpu.render.raster_v2 import raster_gather_rows_binned

            det = det_planar(cp, degenerate)
            if bins is not None:
                idx, counts = bins[0], bins[1]
            else:
                idx, counts, bin_overflow = bin_triangles_planar(
                    cp, det, resolution, tile_hw, max_tris_per_tile,
                    cull_backfaces=cull_backfaces,
                )
            sil = _silhouette_planar(det, edge_adj)
            if compact_total:
                # chunk-aligned compact table (planar.compact_bins): every
                # table-width-scaled cost shrinks by the K-padding factor
                # (~6x at bench scale)
                from diffdope_tpu.render.raster_v2 import (
                    _pick_chunk,
                    raster_gather_rows_compact,
                )

                kc = _pick_chunk(compact_total)
                flat, off_c, usedc, c_ovf = compact_bins(
                    idx, counts, t_count, kc, compact_total
                )
                if bin_overflow is None:
                    bin_overflow = c_ovf
                else:
                    bin_overflow = bin_overflow + c_ovf
                packed_b = _pack_dispatch(
                    pos_c, mvp, mtx, flat, attr_corner_vals, sil,
                    degenerate, t_count, interpret,
                )
                ids, rows = raster_gather_rows_compact(
                    packed_b, counts, off_c, usedc, tuple(resolution),
                    tuple(tile_hw), idx.shape[1] // kc, interpret,
                )
            else:
                packed_b = _pack_dispatch(
                    pos_c, mvp, mtx, idx, attr_corner_vals, sil,
                    degenerate, t_count, interpret,
                )
                ids, rows = raster_gather_rows_binned(
                    packed_b, counts, tuple(resolution), tuple(tile_hw),
                    interpret,
                )
        else:
            zrot = jnp.einsum(
                "...j,...nj->...n", mtx[..., 2, :3], pos_c, precision="highest"
            )  # (B, 3T)
            packed_pl, det = packed_planar(
                cp, attr_corner_vals, zrot, edge_adj, degenerate
            )

            if bins is None and os.environ.get("DD_RASTER", "v2") == "v3":
                from diffdope_tpu.render.raster_v3 import raster_gather_rows_v3

                ids, rows = raster_gather_rows_v3(
                    packed_pl, tuple(resolution), tuple(tile_hw), interpret
                )
            else:
                if bins is not None:
                    idx, counts, inv_pos, inv_valid = bins
                else:
                    idx, counts, bin_overflow = bin_triangles_planar(
                        cp, det, resolution, tile_hw, max_tris_per_tile,
                        cull_backfaces=cull_backfaces,
                    )
                    # the backward's inverted-bin gather scales with
                    # B*32*T*max_occ; size it from gather_rows.bin_occupancy
                    # when the scene is known
                    inv_pos, inv_valid = invert_bins(idx, t_count, max_occ)
                from diffdope_tpu.render.raster_v2 import raster_gather_rows_v2

                ids, rows = raster_gather_rows_v2(
                    packed_pl, idx, counts, inv_pos, inv_valid,
                    tuple(resolution), tuple(tile_hw), interpret,
                )
        sh = None  # shading happens inside the checkpointed section below
    else:
        raise ValueError(f"unknown raster_impl {impl!r}")

    # everything below is channel-planar (B, H, W) — channels-last temps pay
    # a 42x lane-padding penalty on TPU
    def shade_and_aa(rows_in, ids_in, tz, sh_pre):
        if sh_pre is None:
            shd = shade_from_rows(
                ids_in, rows_in, resolution, attr_channels=n_attr,
                stack_outputs=return_rast_out,
            )
        else:
            shd = sh_pre
        fg = (ids_in > 0).astype(rows_in.dtype)

        # mask with analytic antialiasing (coverage gradients)
        mask1 = antialias_rows(fg, ids_in, shd["zw"], shd["rows"], resolution)

        # color channels
        if color_mode == "texture":
            texc = jnp.stack([shd["attrs_list"][0], shd["attrs_list"][1]], axis=-1)
            color_img = texture(tex, texc, filter_mode="linear")
            colors = tuple(color_img[..., c] * fg for c in range(3))
        else:
            colors = tuple(shd["attrs_list"][c] for c in range(3))
        if antialias_rgb:
            colors = tuple(
                antialias_rows(c, ids_in, shd["zw"], shd["rows"], resolution)
                for c in colors
            )

        # depth (rotation-z plane + translation; bg = -t_z exactly)
        depth = -(shd["attrs_list"][n_attr - 1] + tz[..., None, None])
        rast = shd["rast"]
        return mask1, colors, depth, rast

    if impl == "pallas":
        # Rematerialize only the post-kernel shading in the backward pass:
        # its AD residuals are the wide rows-derived temps (>24 GB at bench
        # scale unchecked), while recomputing it costs a few elementwise
        # passes.  The raster kernel output (rows) is a saved input here, so
        # the kernel is NOT re-run (jax.checkpoint around the whole render —
        # including the custom-vjp kernel — would re-run it: 268 ms/step).
        mask1, colors, depth, rast_stacked = jax.checkpoint(shade_and_aa)(
            rows, ids, mtx[..., 2, 3], None
        )
    else:
        mask1, colors, depth, rast_stacked = shade_and_aa(
            sh["rows"], ids, mtx[..., 2, 3], sh
        )

    # scan-carried binning telemetry (per-step overflow; underscore keys are
    # routed into RefineResult.telemetry by optimize.refine, not the loss
    # logs) — present only when this call re-binned
    telemetry = (
        {"_bin_overflow": jax.lax.stop_gradient(bin_overflow)}
        if bin_overflow is not None else {}
    )

    if layout == "channels":
        return {
            "mask": mask1,            # (B, H, W) — identical 3 channels implied
            "rgb": colors,            # tuple of 3 (B, H, W)
            "depth": depth,           # (B, H, W)
            "ids": ids,
            "rast_out": rast_stacked if return_rast_out else None,
            **telemetry,
        }

    rgb = jnp.stack(colors, axis=-1)
    mask = jnp.repeat(mask1[..., None], 3, axis=-1)
    return {
        "rgb": rgb,
        "depth": depth,
        "mask": mask,
        "rast_out": rast_stacked if return_rast_out else None,
        **telemetry,
    }


def make_fused_loss(
    proj_cam: Array,
    pos: Array,
    pos_idx: Array,
    resolution: Tuple[int, int],
    gt: Optional[Dict[str, Array]],
    learning_rates: Array,
    weights: Dict[str, float],
    use_rgb: bool = False,
    use_depth: bool = False,
    use_mask: bool = True,
    edge_adj: Optional[Array] = None,
    corner_colors: Optional[Array] = None,
    vtx_color: Optional[Array] = None,
    tex: Optional[Array] = None,
    uv: Optional[Array] = None,
    uv_idx: Optional[Array] = None,
    tile_hw: Tuple[int, int] = (32, 128),
    max_tris_per_tile: int = 1024,
    bins: Optional[Tuple[Array, Array, Array, Array]] = None,
    cull_backfaces: bool = False,
    max_occ: int = 16,
    compact_total: Optional[int] = None,
    roi_crop: str = "auto",
):
    """Build ``fn(mtx) -> (total_loss, logs)`` on the fused loss kernel.

    The production fast path: raster (padded layout) -> fused
    shade+antialias+L1 partial sums (render/fused_loss.py) — the wide
    per-pixel images never exist in HBM.  Exact reference loss semantics
    (losses.py / reference diffdope.py:534-613): per-term per-hypothesis
    means, per-hypothesis learning-rate scaling, weighted total, and the
    reference log keys in registration order (rgb, depth, mask_selection).

    Covers the standard configurations (pallas raster + the three
    reference losses) with per-corner color planes OR exact per-pixel
    bilinear texture (tex/uv/uv_idx — the SEMI-FUSED path: the kernel
    interpolates uv in its rows, colors are sampled between the raster and
    loss kernels with the planar sampler, and their cotangent flows back
    through the same kernel); custom loss functions use the unfused
    render_batch path instead.

    gt=None defers the ground truth: the returned fn has signature
    ``fn(mtx, gt)`` with gt a traced {'rgb','segmentation'[,'depth']} dict —
    one trace serves many scenes (the BOP sweep uses this).
    """
    from diffdope_tpu.render.fused_loss import fused_loss_sums
    from diffdope_tpu.render.planar import (
        _silhouette_planar,
        bin_triangles_planar,
        compact_bins,
        corner_planes,
        det_planar,
        packed_planar,
    )

    if proj_cam.ndim == 2:
        proj_cam = proj_cam[None]
    h, w = resolution
    th, tw = tile_hw
    from diffdope_tpu.render.raster_v2 import padded_hw

    # raster outputs are padded to the 128-wide SUPER-tile grid even when
    # binning uses narrower sub-tiles (raster_v2._sub_split)
    hp, wp = padded_hw(resolution, tile_hw)
    t_count = pos_idx.shape[0]
    flat_idx = pos_idx.reshape(-1)
    pos_c = pos[flat_idx][None] if pos.ndim == 2 else jnp.take(pos, flat_idx, axis=1)

    texture_mode = tex is not None
    tex_packed = None
    if texture_mode:
        if uv is None or uv_idx is None:
            raise ValueError("fused texture loss requires uv and uv_idx")
        attr_corner_vals = uv[uv_idx.reshape(-1)].reshape(t_count, 3, 2)
        if not isinstance(tex, jax.core.Tracer):
            from diffdope_tpu.render.texture import pack_bilinear_blocks4

            tp = pack_bilinear_blocks4(tex)
            if tp is not None:
                # host constant on purpose: device-resident closure
                # constants are fetched back to host at lowering (minutes
                # on the tunnel backend — see DiffDope._mesh_arrays)
                tex_packed = np.asarray(tp)
    elif corner_colors is not None:
        attr_corner_vals = corner_colors
    elif vtx_color is not None:
        attr_corner_vals = vtx_color[flat_idx].reshape(t_count, 3, 3)
    else:
        raise ValueError(
            "fused loss requires corner_colors, vtx_color, or tex(+uv)"
        )
    n_attr = attr_corner_vals.shape[-1] + 1

    degenerate = (
        (pos_idx[:, 0] == pos_idx[:, 1])
        | (pos_idx[:, 1] == pos_idx[:, 2])
        | (pos_idx[:, 2] == pos_idx[:, 0])
    )

    # ground-truth planes in the padded raster layout
    def pad_plane(a):
        return jnp.pad(jnp.asarray(a, jnp.float32), ((0, hp - h), (0, wp - w)))

    def prep_gt(gt_arrays):
        seg = gt_arrays.get("segmentation")
        if seg is None:
            raise ValueError("fused loss requires gt['segmentation']")
        rgb_gt = gt_arrays.get("rgb")
        planes = [pad_plane(seg[..., c]) for c in range(3)]
        if rgb_gt is not None:
            planes += [pad_plane(rgb_gt[..., c]) for c in range(3)]
        else:
            planes += [jnp.zeros((hp, wp), jnp.float32)] * 3
        gt6 = jnp.stack(planes, axis=0)
        gtd_p = pad_plane(gt_arrays["depth"]) if use_depth else None
        return gt6, gtd_p

    baked = prep_gt(gt) if gt is not None else None

    # Static gt-seg crop for the exact-texture gathers.  The rgb term is
    # |rc - gt_rgb| * gt_seg * lm (reference diffdope.py:547-562), so texture
    # samples only ever matter where the (static) gt segmentation is nonzero
    # — sampling a crop around its support is bit-exact for loss AND
    # gradients (d_colors carries the same seg factor) while cutting the
    # dominant XLA per-pixel gathers by the crop fraction (measured ~95% of
    # the exact-texture step).  Only available when gt is baked into the
    # closure; traced-gt callers (the BOP sweep) sample the full frame.
    import os as _os

    tex_crop = (0, 0, hp, wp)
    if (
        texture_mode
        and gt is not None
        and _os.environ.get("DD_TEX_CROP", "1") == "1"
    ):
        seg_np = np.asarray(gt["segmentation"])
        seg_any = seg_np.max(axis=-1) if seg_np.ndim == 3 else seg_np
        rows_any = (seg_any > 0).any(axis=1)
        cols_any = (seg_any > 0).any(axis=0)
        if rows_any.any():
            r0 = int(np.argmax(rows_any))
            r1 = int(len(rows_any) - np.argmax(rows_any[::-1]))
            c0 = int(np.argmax(cols_any))
            c1 = int(len(cols_any) - np.argmax(cols_any[::-1]))
            ct = (r0 // 8) * 8
            cl = (c0 // 8) * 8
            chh = min(hp - ct, -(-(r1 - ct) // 8) * 8)
            cww = min(wp - cl, -(-(c1 - cl) // 8) * 8)
            tex_crop = (ct, cl, chh, cww)

    # ROI crop for the fused raster+loss ops (DD_CROP, default on).  The
    # refinement only consumes loss sums; pixels far from the (static) gt
    # support can only ever contribute |0 - 0| terms, so rasterizing +
    # reducing a tile-aligned crop around the gt segmentation (+ margin
    # for pose drift) is loss-exact while shrinking every frame-
    # proportional cost: the rows/ids HBM writes+reads, the d_rows
    # cotangent, the loss kernels' grids, and the compact table/pack
    # (out-of-crop tiles are dropped before compact_bins).  Per-pixel
    # math is bit-identical (kernels keep global NDC coordinates via the
    # roi origin).  Exactness needs the renders to stay 2 px inside the
    # crop; violations are counted per step by the `_crop_leak` telemetry
    # (same scan-carried channel as the bin-overflow warnings).  Only
    # when gt is baked (static support) and not in texture mode (which
    # has its own gt-seg crop, tex_crop above).
    crop_tiles = None  # (oy, ox, hc, wc) tile-aligned, px
    if (
        gt is not None
        and not texture_mode
        and roi_crop != "off"
        and _os.environ.get("DD_CROP", "1") == "1"
    ):
        from diffdope_tpu.render.raster_v2 import _sub_split

        tws, _subn = _sub_split(tile_hw)
        seg_np = np.asarray(gt["segmentation"])
        seg_any = seg_np.max(axis=-1) if seg_np.ndim == 3 else seg_np
        rows_any = (seg_any > 0).any(axis=1)
        cols_any = (seg_any > 0).any(axis=0)
        if rows_any.any():
            # 24 px default: covers the bench protocol's drift (8 deg +
            # ~25 px translation) with zero measured leaks and matches
            # margin-16's crop after tile alignment (48/32/24/16 ->
            # 4.92/4.72/4.64/4.64 s, round-5 A/B); a too-small margin is
            # caught per step by the _crop_leak telemetry and DiffDope's
            # auto-recovery re-runs full-frame
            margin = int(_os.environ.get("DD_CROP_MARGIN", "24"))
            r0 = int(np.argmax(rows_any))
            r1 = int(len(rows_any) - np.argmax(rows_any[::-1]))
            c0 = int(np.argmax(cols_any))
            c1 = int(len(cols_any) - np.argmax(cols_any[::-1]))
            oy = max(0, r0 - margin) // th * th
            ox = max(0, c0 - margin) // tws * tws
            hc = min(hp, -(-(r1 + margin - oy) // th) * th)
            wc = min(wp, -(-(c1 + margin - ox) // tws) * tws)
            if (hc, wc) != (hp, wp):
                crop_tiles = (oy, ox, hc, wc)

    interpret = jax.default_backend() not in ("tpu", "axon")
    npx = float(h * w)
    baked_lrs = learning_rates
    # BUILD-TIME option (read once here, not inside the compiled VJP): the
    # spanning op's d_rows cotangent dtype.  bf16 (default) halves the
    # largest per-step HBM intermediate; one rounding of the per-pixel
    # cotangents to 8 mantissa bits before the f32 accumulation (~2e-3
    # relative grad effect, tolerance-tested in test_fused_loss.py).
    # Flipping the env var after this closure is built has no effect.
    drows_bf16 = _os.environ.get("DD_DROWS_BF16", "1") == "1"

    def fn(mtx, gt_arrays=None, learning_rates=None):
        # learning_rates may be passed traced (optimize.refine does, so a
        # shard_map'd run feeds each shard its LOCAL slice); the build-time
        # vector is the single-trace default
        learning_rates = (
            baked_lrs if learning_rates is None else learning_rates
        )
        if baked is not None:
            gt6, gtd_p = baked
        else:
            gt6, gtd_p = prep_gt(gt_arrays)
        if mtx.ndim == 2:
            mtx = mtx[None]
        mvp = jnp.einsum(
            "...ij,...jk->...ik", proj_cam, mtx, precision="highest"
        )
        cp = corner_planes(pos_c, mvp)
        import os

        bin_overflow = None
        sums = None  # set early by the spanning raster+loss op
        # crop-local views (overridden by the ROI crop in the compact
        # branch; full-frame defaults everywhere else)
        gt6_k, res_k, roi_k = gt6, tuple(resolution), None
        crop_leak = None
        use_binned = (
            os.environ.get("DD_BINNED", "1") == "1"
            and os.environ.get("DD_RASTER", "v2") != "v3"
            and pos.ndim == 2
        )
        if use_binned:
            # bin-ordered packing: no compact->bin lane gather forward, no
            # inverted-bin reduction backward (see planar.pack_binned)
            from diffdope_tpu.render.raster_v2 import raster_gather_rows_binned

            det = det_planar(cp, degenerate)
            if bins is not None:
                idx, counts = bins[0], bins[1]
            else:
                idx, counts, bin_overflow = bin_triangles_planar(
                    cp, det, resolution, tile_hw, max_tris_per_tile,
                    cull_backfaces=cull_backfaces,
                )
            sil = _silhouette_planar(det, edge_adj)
            if compact_total:
                # chunk-aligned compact table (planar.compact_bins) — see
                # render_batch
                from diffdope_tpu.render.raster_v2 import (
                    _pick_chunk,
                    _sub_split,
                    raster_gather_rows_compact,
                )

                # ROI crop (see crop_tiles above): drop out-of-crop tiles
                # BEFORE compact_bins so the table, the pack, and every
                # kernel shrink together; count triangles whose pixel
                # bounds escape the crop's 2 px interior (the exactness
                # condition) as scan-carried telemetry
                idx_k, counts_k = idx, counts
                if crop_tiles is not None:
                    from diffdope_tpu.render.planar import (
                        _xbounds_ndc,
                        _ybounds_ndc,
                    )

                    oy, ox, hc, wc = crop_tiles
                    tws, subn = _sub_split(tile_hw)
                    nty_f, ntx_f = hp // th, wp // tws
                    idx_k = idx.reshape(nty_f, ntx_f, subn, idx.shape[1])[
                        oy // th : (oy + hc) // th,
                        ox // tws : (ox + wc) // tws,
                    ].reshape(-1, idx.shape[1])
                    counts_k = counts.reshape(nty_f, ntx_f, subn)[
                        oy // th : (oy + hc) // th,
                        ox // tws : (ox + wc) // tws,
                    ].reshape(-1)
                    gt6_k = gt6[:, oy : oy + hc, ox : ox + wc]
                    res_k = (hc, wc)
                    roi_k = (oy, ox, h, w)
                    xlo, xhi = _xbounds_ndc(cp, degenerate)
                    ylo, yhi = _ybounds_ndc(cp, degenerate)
                    px_lo = (xlo + 1.0) * (w / 2.0) - 0.5
                    px_hi = (xhi + 1.0) * (w / 2.0) - 0.5
                    py_lo = (ylo + 1.0) * (h / 2.0) - 0.5
                    py_hi = (yhi + 1.0) * (h / 2.0) - 0.5
                    bx_lo = float(ox + 2) if ox > 0 else -1e9
                    bx_hi = float(ox + wc - 3) if ox + wc < w else 1e9
                    by_lo = float(oy + 2) if oy > 0 else -1e9
                    by_hi = float(oy + hc - 3) if oy + hc < h else 1e9
                    nonempty = xlo <= xhi
                    out_of_crop = nonempty & (
                        (px_lo < bx_lo) | (px_hi > bx_hi)
                        | (py_lo < by_lo) | (py_hi > by_hi)
                    )
                    crop_leak = jnp.sum(out_of_crop.astype(jnp.int32))

                kc = _pick_chunk(compact_total)
                flat, off_c, usedc, c_ovf = compact_bins(
                    idx_k, counts_k, t_count, kc, compact_total
                )
                if bin_overflow is None:
                    bin_overflow = c_ovf
                else:
                    bin_overflow = bin_overflow + c_ovf
                packed_b = _pack_dispatch(
                    pos_c, mvp, mtx, flat, attr_corner_vals, sil,
                    degenerate, t_count, interpret,
                )
                if (
                    not texture_mode
                    and not use_depth
                    and os.environ.get("DD_SPAN", "1") == "1"
                ):
                    # spanning op: raster + loss under ONE custom VJP so
                    # the 1.7 GB/step d_rows cotangent can cross the
                    # kernels in bf16 (fused_loss.raster_loss_compact)
                    from diffdope_tpu.render.fused_loss import (
                        raster_loss_compact,
                    )

                    sums = raster_loss_compact(
                        packed_b, counts_k, off_c, usedc, gt6_k,
                        res_k, tuple(tile_hw),
                        idx.shape[1] // kc, n_attr, interpret, roi_k,
                        drows_bf16,
                    )
                else:
                    ids, rows = raster_gather_rows_compact(
                        packed_b, counts_k, off_c, usedc, res_k,
                        tuple(tile_hw), idx.shape[1] // kc, interpret, True,
                        roi_k,
                    )
            else:
                packed_b = _pack_dispatch(
                    pos_c, mvp, mtx, idx, attr_corner_vals, sil,
                    degenerate, t_count, interpret,
                )
                ids, rows = raster_gather_rows_binned(
                    packed_b, counts, tuple(resolution), tuple(tile_hw),
                    interpret, True, True,
                )
        else:
            zrot = jnp.einsum(
                "...j,...nj->...n", mtx[..., 2, :3], pos_c, precision="highest"
            )
            packed_pl, det = packed_planar(
                cp, attr_corner_vals, zrot, edge_adj, degenerate
            )
            if bins is None and os.environ.get("DD_RASTER", "v2") == "v3":
                # sorted-range kernel: no bin lists, no K cap, direct d_packed
                from diffdope_tpu.render.raster_v3 import raster_gather_rows_v3

                ids, rows = raster_gather_rows_v3(
                    packed_pl, tuple(resolution), tuple(tile_hw), interpret,
                    True,
                )
            else:
                if bins is not None:
                    idx, counts, inv_pos, inv_valid = bins
                else:
                    idx, counts, bin_overflow = bin_triangles_planar(
                        cp, det, resolution, tile_hw, max_tris_per_tile,
                        cull_backfaces=cull_backfaces,
                    )
                    inv_pos, inv_valid = invert_bins(idx, t_count, max_occ)
                from diffdope_tpu.render.raster_v2 import raster_gather_rows_v2

                ids, rows = raster_gather_rows_v2(
                    packed_pl, idx, counts, inv_pos, inv_valid,
                    tuple(resolution), tuple(tile_hw), interpret, True, True,
                )
        dplane = None
        if use_depth:
            dplane = gtd_p[None] + mtx[..., 2, 3][:, None, None]
            if roi_k is not None:
                oy, ox, hc, wc = crop_tiles
                dplane = dplane[:, oy : oy + hc, ox : ox + wc]
        colors = None
        if texture_mode:
            # semi-fused exact texture: interpolate uv from the padded
            # rows (same math the kernel uses), sample the texture with
            # the planar bilinear sampler, mask to foreground, and hand
            # the color planes to the loss kernel (reference per-pixel
            # bilinear contract, diffdope.py:218-228)
            from diffdope_tpu.render.shade import shade_from_rows
            from diffdope_tpu.render.texture import (
                texture_planar,
                texture_planar_packed4,
            )

            hp_, wp_ = rows.shape[2], rows.shape[3]
            ct, cl, chh, cww = tex_crop
            cropped = (chh, cww) != (hp_, wp_)
            # gt-seg crop (see tex_crop above): slice rows/ids BEFORE the
            # uv shade so the interpolation, gathers, and their backward
            # all run at crop size (full-frame shade also provoked a
            # 1.7 GB rows relayout pair, ~11 ms/step)
            if cropped:
                rows_c = rows[:, :, ct:ct + chh, cl:cl + cww]
                ids_c = ids[:, ct:ct + chh, cl:cl + cww]
            else:
                rows_c, ids_c = rows, ids
            colp = jax.lax.broadcasted_iota(jnp.int32, (1, cww), 1) + cl
            rowp = jax.lax.broadcasted_iota(jnp.int32, (chh, 1), 0) + ct
            xg = (2.0 * colp.astype(jnp.float32) + 1.0) / w - 1.0
            yg = (2.0 * rowp.astype(jnp.float32) + 1.0) / h - 1.0
            shd = shade_from_rows(
                ids_c, rows_c, (chh, cww), attr_channels=2,
                stack_outputs=False, xy=(xg, yg),
            )
            up, vp = shd["attrs_list"][0], shd["attrs_list"][1]
            fgc = (ids_c > 0).astype(rows.dtype)
            if tex_packed is not None:
                # one WIDE-ROW gather for all channels (2.2x the per-
                # channel gathers; texture.pack_bilinear_blocks4) with a
                # regather-free custom VJP — bit-identical sampling for
                # the 8-bit-quantized textures every PNG produces
                stacked = texture_planar_packed4(
                    tex_packed, up, vp, tex.shape[0], tex.shape[1],
                    tex.shape[2],
                )
                colors = jnp.moveaxis(stacked * fgc[None], 0, 1)
            else:
                cplanes = texture_planar(tex, up, vp)
                colors = jnp.stack([c * fgc for c in cplanes], axis=1)
            if cropped:
                colors = jnp.pad(
                    colors,
                    ((0, 0), (0, 0), (ct, hp_ - ct - chh),
                     (cl, wp_ - cl - cww)),
                )
        if sums is None:
            sums = fused_loss_sums(
                rows, ids, gt6_k, dplane, colors, res_k, n_attr,
                interpret, roi_k,
            )

        total = jnp.float32(0.0)
        logs = {}
        if use_rgb:
            per_hyp = sums[:, 1] / (3.0 * npx)  # RGB_LANE
            total = total + jnp.mean(per_hyp * learning_rates) * weights["rgb"]
            logs["rgb"] = per_hyp * weights["rgb"]
        if use_depth:
            per_hyp = sums[:, 2] / npx
            total = total + jnp.mean(per_hyp * learning_rates) * weights["depth"]
            logs["depth"] = per_hyp * weights["depth"]
        if use_mask:
            per_hyp = sums[:, 0] / (3.0 * npx)
            total = total + jnp.mean(per_hyp * learning_rates) * weights["mask"]
            logs["mask_selection"] = per_hyp * weights["mask"]
        if crop_leak is not None:
            # triangles whose pixel bounds escape the ROI crop's 2 px
            # interior at THIS step's poses: nonzero means the cropped
            # loss may differ from the full-frame loss (optimize.refine
            # surfaces it like the bin-overflow warnings)
            logs["_crop_leak"] = jax.lax.stop_gradient(crop_leak)
        if bin_overflow is not None:
            # scan-carried telemetry (underscore keys are split out of the
            # loss logs by optimize.refine): dropped (tile, triangle) pairs
            # at THIS step's poses — catches mid-trajectory excursions past
            # the bin capacity that a final-pose check would miss
            logs["_bin_overflow"] = jax.lax.stop_gradient(bin_overflow)
            logs["_bin_max"] = jax.lax.stop_gradient(counts.max())
        return total, logs

    return fn


def precompute_bins(
    proj_cam: Array,
    mtx0: Array,
    pos: Array,
    pos_idx: Array,
    resolution: Tuple[int, int],
    tile_hw: Tuple[int, int] = (32, 128),
    max_tris_per_tile: int = 1024,
    margin_px: float = 24.0,
    max_occ="auto",
    cull_backfaces: bool = False,
):
    """One conservative binning (with pixel margin) for a whole refinement.

    The binning only has to be a *superset* of each triangle's touched
    tiles — the rasterizer re-tests coverage exactly — so binning once at
    the initial poses with a margin that covers the expected pose drift
    replaces per-step re-binning (binning + top_k + inversion every step).
    Increase `margin_px` (or re-bin) for refinements expected to move
    further.

    Runs eagerly (outside jit): the inverted-bin map is sized to the exact
    maximum tile-occurrence (max_occ='auto'), so no triangle ever loses
    backward contributions, and bin overflow (dropped (tile, triangle)
    pairs under max_tris_per_tile) raises instead of degrading silently.

    Returns (tile_idx, tile_counts, inv_pos, inv_valid) for
    render_batch(bins=...).
    """
    from diffdope_tpu.render.planar import bin_triangles_planar, corner_planes, packed_planar

    if mtx0.ndim == 2:
        mtx0 = mtx0[None]
    if proj_cam.ndim == 2:
        proj_cam = proj_cam[None]
    t_count = pos_idx.shape[0]

    @jax.jit
    def _bin(proj_cam, mtx0):
        mvp = jnp.einsum(
            "...ij,...jk->...ik", proj_cam, mtx0, precision="highest"
        )
        if pos.ndim == 2:
            pos_c = pos[pos_idx.reshape(-1)][None]
        else:
            pos_c = jnp.take(pos, pos_idx.reshape(-1), axis=1)
        cp = corner_planes(pos_c, mvp)
        degenerate = (
            (pos_idx[:, 0] == pos_idx[:, 1])
            | (pos_idx[:, 1] == pos_idx[:, 2])
            | (pos_idx[:, 2] == pos_idx[:, 0])
        )
        _, det = packed_planar(cp, None, None, None, degenerate)
        return bin_triangles_planar(
            cp, det, resolution, tile_hw, max_tris_per_tile,
            margin_px=margin_px, cull_backfaces=cull_backfaces,
        )

    idx, counts, overflow = jax.device_get(_bin(proj_cam, mtx0))
    if int(overflow) > 0:
        raise ValueError(
            f"bin overflow: {int(overflow)} (tile, triangle) pairs dropped "
            f"at max_tris_per_tile={max_tris_per_tile} "
            f"(max tile count {int(counts.max())}); raise max_tris_per_tile"
        )
    inv_pos, inv_valid = invert_bins(jnp.asarray(idx), t_count, max_occ)
    return jnp.asarray(idx), jnp.asarray(counts), inv_pos, inv_valid
