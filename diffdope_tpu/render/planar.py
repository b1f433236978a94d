"""Fully planar triangle setup / packing / binning (the TPU fast path).

Every intermediate in the naive formulation — corner positions (B,T,3,4),
cross products (B,T,3), planes (B,T,C,3), packed rows (B,T,32) — has a tiny
minor dimension that TPU tiling pads to 128 lanes: 4x to 42x wasted memory
and bandwidth (measured: a 24.9GB OOM and ~40ms/step of pure layout copies
at bench scale).

Here every per-triangle quantity is a (B, T) plane with T on the lanes, the
packed table is (B, 32, T), and the per-tile bin gather produces
(B, 32, num_tiles, K) — zero padding anywhere.  The fused raster kernel
(gather_rows.raster_gather_rows_planar) consumes these directly.

All differentiable jnp; the packing is pure elementwise + one stack.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from diffdope_tpu.render.shade import PACKED_WIDTH

Array = jax.Array


def corner_planes(pos_c: Array, mvp: Array) -> Dict[str, Array]:
    """Transform corner-expanded object-space points to planar clip coords.

    Args:
        pos_c: (3T, 3) or (B, 3T, 3) corner-expanded positions (constants
            for the static-mesh case -> the expansion folds at compile time).
        mvp: (B, 4, 4) model-view-projection.

    Returns dict with 'x','y','z','w': each (B, 3T) — no (…,4) minor dim.
    """
    if pos_c.ndim == 2:
        pos_c = pos_c[None]
    out = {}
    for name, row in (("x", 0), ("y", 1), ("z", 2), ("w", 3)):
        out[name] = (
            jnp.einsum(
                "...j,...nj->...n", mvp[..., row, :3], pos_c,
                precision="highest",
            )
            + mvp[..., row, 3][..., None]
        )
    return out


def _corner(p, k: int) -> Array:
    """Corner k's plane: from an interleaved (B, 3T) corner array -> (B, T),
    or from a per-corner list [c0, c1, c2] (the bin-ordered packing builds
    planes per corner to avoid interleaved/minor-dim layouts)."""
    if isinstance(p, (list, tuple)):
        return p[k]
    return p[:, k::3]


def packed_planar(
    cp: Dict[str, Array],
    corner_attrs: Optional[Array],
    zrot: Optional[Array],
    edge_adj: Optional[Array],
    degenerate: Optional[Array] = None,
    tri_indices: Optional[Array] = None,
    sil: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Build the (B, 32, T) packed table from corner planes.

    Args:
        cp: corner planes from :func:`corner_planes` ((B, 3T) each).
        corner_attrs: optional (T, 3, C) static per-corner attribute values
            (or (B, T, 3, C) traced); packed as interpolation planes.
        zrot: optional (B, 3T) per-corner rotation-only camera z (depth
            channel), appended after the attrs.
        edge_adj: optional (T, 3) silhouette adjacency.
        degenerate: optional (T,) bool padding-triangle mask.
        tri_indices: optional (T,) int global triangle index per column
            (lane 13); defaults to arange.  Bin-ordered packing
            (pack_binned) passes the bin slot -> triangle map here.
        sil: optional (B, T) precomputed silhouette bits (lane 14),
            overriding the edge_adj computation — required when the columns
            are not in global triangle order (neighbor lookups by edge_adj
            would dereference the wrong columns).

    Returns:
        packed (B, 32, T) float32, det (B, T).
    """
    x = [_corner(cp["x"], k) for k in range(3)]
    y = [_corner(cp["y"], k) for k in range(3)]
    z = [_corner(cp["z"], k) for k in range(3)]
    w = [_corner(cp["w"], k) for k in range(3)]

    # c_m = a_j x a_k with a = (x, y, w), (m, j, k) cyclic
    def cross(j, k):
        return (
            y[j] * w[k] - w[j] * y[k],   # X coefficient
            w[j] * x[k] - x[j] * w[k],   # Y coefficient
            x[j] * y[k] - y[j] * x[k],   # 1 coefficient
        )

    c0 = cross(1, 2)
    c1 = cross(2, 0)
    c2 = cross(0, 1)
    det = c0[0] * x[0] + c0[1] * y[0] + c0[2] * w[0]

    if degenerate is not None:
        keep = (~degenerate)[None, :].astype(det.dtype)
        c0 = tuple(c * keep for c in c0)
        c1 = tuple(c * keep for c in c1)
        c2 = tuple(c * keep for c in c2)
        det = det * keep

    zc = tuple(
        z[0] * c0[i] + z[1] * c1[i] + z[2] * c2[i] for i in range(3)
    )

    b, t = det.shape
    if tri_indices is None:
        tri_idx = jnp.broadcast_to(
            jnp.arange(t, dtype=det.dtype)[None, :], (b, t)
        )
    else:
        tri_idx = jnp.broadcast_to(
            tri_indices.astype(det.dtype)[None, :], (b, t)
        )
    if sil is None:
        sil = _silhouette_planar(det, edge_adj)
    ylo, yhi = _ybounds_ndc(cp, degenerate)

    lanes = [
        c0[0], c0[1], c0[2],
        c1[0], c1[1], c1[2],
        c2[0], c2[1], c2[2],
        zc[0], zc[1], zc[2],
        det, tri_idx, sil, jnp.zeros_like(det),
    ]

    # attribute interpolation planes: g_c[i] = sum_k attr[k, c] * cK[i]
    if corner_attrs is not None:
        cs = (c0, c1, c2)
        if isinstance(corner_attrs, (list, tuple)):
            # per-corner plane lists attr[k][c], each (T',) or (B, T')
            # (bin-ordered packing)
            n_ch = len(corner_attrs[0])
            for c in range(n_ch):
                a = [jnp.atleast_2d(corner_attrs[k][c]) for k in range(3)]
                for i in range(3):
                    lanes.append(
                        a[0] * cs[0][i] + a[1] * cs[1][i] + a[2] * cs[2][i]
                    )
        else:
            if corner_attrs.ndim == 3:
                attrs = corner_attrs[None]  # (1, T, 3, C)
            else:
                attrs = corner_attrs
            n_ch = attrs.shape[-1]
            for c in range(n_ch):
                a = [attrs[:, :, k, c] for k in range(3)]  # (1|B, T) each
                for i in range(3):
                    lanes.append(
                        a[0] * cs[0][i] + a[1] * cs[1][i] + a[2] * cs[2][i]
                    )
    if zrot is not None:
        zr = [_corner(zrot, k) for k in range(3)]
        cs = (c0, c1, c2)
        for i in range(3):
            lanes.append(zr[0] * cs[0][i] + zr[1] * cs[1][i] + zr[2] * cs[2][i])

    # lanes 28-31 carry the triangle's conservative NDC x/y bounds for the
    # raster kernels' work gating (chunk row ranges in raster_v2; sort keys,
    # tile ranges and x-overlap tests in raster_v3).  They are control data:
    # stop-gradient, and never read by shading/antialiasing, so their
    # cotangents are exactly zero.
    xlo, xhi = _xbounds_ndc(cp, degenerate)
    if len(lanes) > PACKED_WIDTH - 4:
        raise ValueError(f"too many packed lanes: {len(lanes)}")
    while len(lanes) < PACKED_WIDTH - 4:
        lanes.append(jnp.zeros_like(det))
    lanes.extend([xlo, xhi, ylo, yhi])
    lanes = [jnp.broadcast_to(p, (b, t)) for p in lanes]
    import os

    if os.environ.get("DD_PACK_MAJOR", "0") == "1":
        # measured-flat experiment (6.88 vs 6.87 s, kept as a flag): stack
        # along a LEADING axis then transpose, hoping to lift the lane
        # fusions from the (B, 1, T) T(1,128) layout (1/8 sublane
        # utilization, ~2.2 ms/step) the minor-axis concatenate forces.
        # XLA's layout assignment propagates the packed layout into the
        # transpose either way — no net win on v5e.
        return jnp.transpose(jnp.stack(lanes, axis=0), (1, 0, 2)), det
    return jnp.stack(lanes, axis=1), det  # (B, 32, T)


def det_planar(cp: Dict[str, Array], degenerate: Optional[Array] = None) -> Array:
    """Just the (B, T) determinant plane (for binning / silhouette bits
    without building the full packed table)."""
    x = [_corner(cp["x"], k) for k in range(3)]
    y = [_corner(cp["y"], k) for k in range(3)]
    w = [_corner(cp["w"], k) for k in range(3)]
    c0 = (
        y[1] * w[2] - w[1] * y[2],
        w[1] * x[2] - x[1] * w[2],
        x[1] * y[2] - y[1] * x[2],
    )
    det = c0[0] * x[0] + c0[1] * y[0] + c0[2] * w[0]
    if degenerate is not None:
        det = det * (~degenerate)[None, :].astype(det.dtype)
    return det


def static_pack_rows(pc, corner_attrs, degenerate):
    """Rows of the static per-triangle table gathered by bin slot: 9
    object-space corner coords (row 3k + c), then 3*n_ch per-corner
    attribute rows (row 9 + k*n_ch + c), then (when present) the
    degenerate mask.  BOTH pack implementations — :func:`pack_binned`
    and the fused Pallas pack (render/pack_kernel.py) — read this exact
    layout, so it lives in exactly one place."""
    rows = [pc[k::3, c] for k in range(3) for c in range(3)]
    n_ch = 0
    if corner_attrs is not None:
        n_ch = corner_attrs.shape[-1]
        rows += [
            corner_attrs[:, k, c] for k in range(3) for c in range(n_ch)
        ]
    if degenerate is not None:
        rows.append(degenerate.astype(pc.dtype))
    return rows, n_ch


def pack_binned(
    pos_c: Array,
    mvp: Array,
    mtx: Array,
    idx: Array,
    corner_attrs: Optional[Array],
    sil: Array,
    degenerate: Optional[Array],
    t_count: int,
) -> Array:
    """Build the packed table DIRECTLY in bin-slot order: (B, 32, nt*K).

    The per-tile bin layout the raster kernel consumes was previously
    produced by gathering the compact (B, 32, T) packed table along its
    lane dimension (jnp.take axis=2) — a minor-dim gather XLA lowers as
    transpose + gather + transpose, measured ~13 ms/step at bench scale.
    Here the only gather is of the tiny OBJECT-SPACE corner constants
    (3*nt*K, 3 — a few MB) by bin slot; the clip transform and packing math
    then stream directly into the bin layout on the MXU/VPU.  As a bonus,
    the backward needs no inverted-bin reduction at all: the kernel's
    d_packed lands on this table and flows to the pose through the packing
    einsum (an MXU reduction), replacing the invert_bins sort + per-triangle
    gather pipeline (~15 ms/step).

    Args:
        pos_c: (3T, 3) or (1|B, 3T, 3) corner-expanded object-space points
            (corner k of triangle i at row 3i + k, matching _corner).
        mvp/mtx: (B, 4, 4) projection-model-view and model-view.
        idx: (num_tiles, K) int32 bin slot -> triangle (sentinel t_count).
        corner_attrs: (T, 3, C) static per-corner attributes (or
            (B, T, 3, C) traced).
        sil: (B, T) silhouette bits in compact order (from
            _silhouette_planar on the compact det).
        degenerate: (T,) bool padding-triangle mask (or None).
        t_count: T.
    """
    flat = idx.reshape(-1)                      # (nt*K,)
    safe = jnp.minimum(flat, t_count - 1)
    pc = pos_c[0] if pos_c.ndim == 3 else pos_c  # (3T, 3) static constants

    # All static per-triangle data rides ONE gather: a (rows, T) table with
    # planes on sublanes and T on lanes, gathered along lanes by `safe`.
    # (Per-plane gathers measured ~2 ms/step of fixed per-op cost each; a
    # corner-tuple (3ntK, 3) gather was worse still — 42x lane padding.)
    attrs_static = corner_attrs is not None and not isinstance(
        corner_attrs, (list, tuple)
    ) and corner_attrs.ndim == 3
    static_rows, n_ch = static_pack_rows(
        pc, corner_attrs if attrs_static else None, degenerate
    )
    tab = jnp.take(jnp.stack(static_rows, axis=0), safe, axis=1)  # (R, ntK)

    def row(r):
        return tab[r : r + 1, :]  # (1, nt*K)

    pk = [[row(3 * k + c) for c in range(3)] for k in range(3)]

    def transform(rows3, trans):
        """rows3 (B, 3) + trans (B,) applied to the 9 gathered corner
        planes -> per-corner (B, nt*K) lists via broadcast FMAs."""
        return [
            rows3[:, 0:1] * pk[k][0]
            + rows3[:, 1:2] * pk[k][1]
            + rows3[:, 2:3] * pk[k][2]
            + trans[:, None]
            for k in range(3)
        ]

    cp_b = {
        name: transform(mvp[:, r, :3], mvp[:, r, 3])
        for name, r in (("x", 0), ("y", 1), ("z", 2), ("w", 3))
    }
    zrot_b = transform(
        mtx[:, 2, :3], jnp.zeros(mtx.shape[:1], mtx.dtype)
    )
    attr_b = None
    if attrs_static:
        attr_b = [
            [row(9 + k * n_ch + c) for c in range(n_ch)] for k in range(3)
        ]
    elif corner_attrs is not None:  # (B, T, 3, C) traced: per-b lane gather
        attr_b = [
            [
                jnp.take(corner_attrs[:, :, k, c], safe, axis=1)
                for c in range(corner_attrs.shape[-1])
            ]
            for k in range(3)
        ]
    sil_b = jnp.take(sil, safe, axis=1)
    degen_b = flat >= t_count
    if degenerate is not None:
        degen_b = degen_b | (tab[9 + 3 * n_ch, :] > 0.5)
    # lane 13 gets the UNCLAMPED slot value: sentinel slots keep t_count
    # (distinct from every real id) instead of inheriting t_count-1's id
    # from the `safe` gather clamp.  They are degenerate (det 0) and can
    # never win a pixel, so this only matters for the id-match indicators
    # in the compact raster kernels, which can then drop their per-pair
    # `& slot_ok` masks entirely (~1 of 3 indicator VPU ops per visit).
    packed_b, _ = packed_planar(
        cp_b, attr_b, zrot_b, None, degen_b, tri_indices=flat, sil=sil_b
    )
    return packed_b


XLO_LANE = PACKED_WIDTH - 4  # 28
XHI_LANE = PACKED_WIDTH - 3  # 29
YLO_LANE = PACKED_WIDTH - 2  # 30
YHI_LANE = PACKED_WIDTH - 1  # 31
_Y_OPEN = 4.0  # beyond any pixel row's NDC y in (-1, 1)


def _axis_bounds_ndc(cp: Dict[str, Array], axis: str, degenerate):
    """Per-triangle conservative NDC interval along `axis` ('x' or 'y').

    A pixel center covered by the triangle has its coordinate strictly
    inside the corner min/max, so gating outside the interval is exact.
    Behind-camera corners (w <= eps) open the interval to (-4, 4) (the
    kernel re-tests coverage exactly); degenerate padding triangles get an
    empty interval.  Accepts interleaved (B, 3T) planes or per-corner
    lists (see _corner)."""
    eps = 1e-9
    v = [jax.lax.stop_gradient(_corner(cp[axis], k)) for k in range(3)]
    w = [jax.lax.stop_gradient(_corner(cp["w"], k)) for k in range(3)]
    vn = [
        vk / jnp.where(jnp.abs(wk) > eps, wk, eps) for vk, wk in zip(v, w)
    ]
    bc = (w[0] <= eps) | (w[1] <= eps) | (w[2] <= eps)
    lo = jnp.minimum(jnp.minimum(vn[0], vn[1]), vn[2])
    hi = jnp.maximum(jnp.maximum(vn[0], vn[1]), vn[2])
    lo = jnp.where(bc, -_Y_OPEN, lo)
    hi = jnp.where(bc, _Y_OPEN, hi)
    if degenerate is not None:
        dg = degenerate[None, :]
        lo = jnp.where(dg, _Y_OPEN, lo)
        hi = jnp.where(dg, -_Y_OPEN, hi)
    return lo, hi


def _xbounds_ndc(cp, degenerate):
    return _axis_bounds_ndc(cp, "x", degenerate)


def _ybounds_ndc(cp, degenerate):
    return _axis_bounds_ndc(cp, "y", degenerate)


def _silhouette_planar(det: Array, edge_adj: Optional[Array]) -> Array:
    if edge_adj is None:
        return jnp.full(det.shape, 7.0, det.dtype)
    det_ng = jax.lax.stop_gradient(det)
    facing = det_ng > 0.0
    bits = jnp.zeros(det.shape, jnp.int32)
    for k in range(3):
        nb = edge_adj[:, k]
        nb_facing = jnp.take(facing, jnp.maximum(nb, 0), axis=1)
        sil = (nb < 0)[None, :] | (nb_facing != facing)
        bits = bits | (sil.astype(jnp.int32) << ((k + 2) % 3))
    return bits.astype(det.dtype)


def bin_triangles_planar(
    cp: Dict[str, Array],
    det: Array,
    resolution: Tuple[int, int],
    tile_hw: Tuple[int, int],
    max_tris_per_tile: int,
    margin_px: float = 0.0,
    sort_by_y: bool = True,
    cull_backfaces: bool = False,
) -> Tuple[Array, Array, Array]:
    """Conservative tile binning from corner planes (union over the batch).

    Same contract as setup_tris.bin_triangles but operating on planar
    (B, 3T) coordinates (no (…,3,4) corner tensor).

    sort_by_y orders each tile's slot list by the triangle's minimum screen
    y (union over the batch), so consecutive slots span nearby rows — this
    makes the raster kernel's per-(row, chunk) y-gating effective (most
    chunks of a sorted bin are inactive for most rows).  The kernel output
    is order-independent (z-test with smallest-id tie break).

    cull_backfaces drops triangles that are back-facing (det <= 0) in EVERY
    hypothesis, roughly halving bin counts.  Only valid for closed meshes
    with consistent outward (counter-clockwise) winding, where a back face
    can never win the depth test against the front face along the same ray
    (the reference's nvdiffrast rasterizes both windings, diffdope.py:198);
    ids can differ at exact-tie silhouette grazing pixels.  Off by default.

    tw < 128 bins at SUB-TILE granularity for the raster kernels' 128-wide
    super-tiles (raster_v2 statically unrolls 128//tw sub-tiles per kernel
    instance): the x grid is padded so each 128-px super-tile owns exactly
    128//tw consecutive sub-tiles (the pad columns past the image are
    always empty).  Narrow bins cut the kernels' evaluated (pixel,
    triangle) pairs roughly in half per halving of tw (~6-px triangles
    against the tile width).
    """
    h, w = resolution
    th, tw = tile_hw
    nty, ntx = -(-h // th), -(-w // tw)
    if tw < 128:
        if 128 % tw != 0:
            raise ValueError(f"sub-tile width must divide 128 (got {tw})")
        ntx = -(-w // 128) * (128 // tw)
    eps = 1e-9

    xs = jax.lax.stop_gradient(cp["x"])
    ys = jax.lax.stop_gradient(cp["y"])
    ws = jax.lax.stop_gradient(cp["w"])
    safe_w = jnp.where(jnp.abs(ws) > eps, ws, eps)
    px = (xs / safe_w + 1.0) * (w / 2.0) - 0.5  # (B, 3T)
    py = (ys / safe_w + 1.0) * (h / 2.0) - 0.5
    behind_c = ws <= eps

    def minmax3(p):
        c = [_corner(p, k) for k in range(3)]
        lo = jnp.minimum(jnp.minimum(c[0], c[1]), c[2])
        hi = jnp.maximum(jnp.maximum(c[0], c[1]), c[2])
        return jnp.min(lo, axis=0), jnp.max(hi, axis=0)  # union over batch

    px_min, px_max = minmax3(px)
    py_min, py_max = minmax3(py)
    px_min, px_max = px_min - margin_px, px_max + margin_px
    py_min, py_max = py_min - margin_px, py_max + margin_px
    behind = jnp.any(
        _corner(behind_c, 0) | _corner(behind_c, 1) | _corner(behind_c, 2),
        axis=0,
    )
    valid = jnp.any(det != 0.0, axis=0)
    if cull_backfaces:
        # behind-camera corners make the det sign meaningless — never cull
        # those (the kernel re-tests coverage exactly anyway)
        valid = valid & (jnp.any(det > 0.0, axis=0) | behind)

    tx_min = jnp.clip(jnp.floor(px_min / tw), 0, ntx - 1).astype(jnp.int32)
    tx_max = jnp.clip(jnp.floor(px_max / tw), 0, ntx - 1).astype(jnp.int32)
    ty_min = jnp.clip(jnp.floor(py_min / th), 0, nty - 1).astype(jnp.int32)
    ty_max = jnp.clip(jnp.floor(py_max / th), 0, nty - 1).astype(jnp.int32)
    onscreen = (px_max >= 0) & (px_min <= w - 1) & (py_max >= 0) & (py_min <= h - 1)

    tx_min = jnp.where(behind, 0, tx_min)
    tx_max = jnp.where(behind, ntx - 1, tx_max)
    ty_min = jnp.where(behind, 0, ty_min)
    ty_max = jnp.where(behind, nty - 1, ty_max)
    keep = valid & (onscreen | behind)

    t_count = det.shape[1]
    num_tiles = nty * ntx
    tiles_y = jnp.arange(nty, dtype=jnp.int32)
    tiles_x = jnp.arange(ntx, dtype=jnp.int32)
    oy = (tiles_y[:, None] >= ty_min[None, :]) & (tiles_y[:, None] <= ty_max[None, :])
    ox = (tiles_x[:, None] >= tx_min[None, :]) & (tiles_x[:, None] <= tx_max[None, :])
    mask = (oy[:, None, :] & ox[None, :, :] & keep[None, None, :]).reshape(
        num_tiles, t_count
    )

    sentinel = jnp.int32(t_count)
    k = min(max_tris_per_tile, t_count)
    counts_full = jnp.sum(mask, axis=-1).astype(jnp.int32)
    counts = jnp.minimum(counts_full, k)
    overflow = jnp.sum(jnp.maximum(counts_full - k, 0))
    import os

    band = int(os.environ.get("DD_SORT_BAND", "0"))
    if sort_by_y and band == 0 and (h + 3) * t_count < 2 ** 31:
        # fused ordering: pack (pixel-row rank, triangle index) into ONE
        # int32 so a single top_k yields the y-sorted bin directly — no
        # separate key gather + sort_key_val pass (measured ~1.3 ms/step at
        # bench scale).  Ranks: 0 = behind-camera (row-unbounded, first),
        # 1..h+2 = clip(floor(py_min), -1, h) + 2, sentinel rank = h+3.
        # The kernels' row gating reads the packed y-bound LANES, not this
        # order, so integer-pixel rank granularity gates identically to the
        # old exact-float ordering.  On overflow the drop set becomes the
        # highest-y triangles instead of the highest-index ones (still
        # counted by `overflow`).
        rank = jnp.clip(jnp.floor(py_min), -1, h).astype(jnp.int32) + 2
        rank = jnp.where(behind, 0, rank)  # (T,)
        comp = rank * t_count + jnp.arange(t_count, dtype=jnp.int32)[None, :]
        comp = jnp.where(mask, comp, (h + 3) * t_count)
        neg_topk, _ = jax.lax.top_k(-comp, k)
        vals = -neg_topk
        idx = jnp.where(vals >= (h + 3) * t_count, sentinel, vals % t_count)
    else:
        vals = jnp.where(
            mask, jnp.arange(t_count, dtype=jnp.int32)[None, :], sentinel
        )
        neg_topk, _ = jax.lax.top_k(-vals, k)
        idx = -neg_topk
        if sort_by_y:
            # order slots by the triangle's min screen y (behind-camera
            # first — they are row-unbounded; sentinels stay last).
            # DD_SORT_BAND=N sorts by (y-band of N rows, then min screen x)
            # instead, giving chunks x-locality so the raster kernel's
            # x-subwindow gating (DD_XWIN) can cut evaluated columns; pure-y
            # sort gates rows tightest, the banded sort trades a little row
            # range for column range.  All key components stay integers
            # < 2^24 — exact in f32.
            if band > 0:
                band_i = jnp.floor(py_min / band)
                x_i = jnp.clip(jnp.floor(px_min), -w, 2 * w) + w
                key_t = jnp.where(behind, -jnp.inf, band_i * (4 * w) + x_i)
            else:
                key_t = jnp.where(behind, -jnp.inf, py_min)  # (T,)
            keys = jnp.where(
                idx < t_count,
                jnp.take(key_t, jnp.minimum(idx, t_count - 1)),
                jnp.inf,
            )
            _, idx = jax.lax.sort_key_val(keys, idx, dimension=1)
    # pad K to a multiple of the kernel chunk (sentinel columns, never read)
    k_pad = -(-k // 128) * 128
    if k_pad != k:
        idx = jnp.pad(idx, ((0, 0), (0, k_pad - k)), constant_values=t_count)
    return idx, counts, overflow


def compact_bins(
    idx: Array,
    counts: Array,
    t_count: int,
    k_chunk: int,
    total: int,
):
    """Compact fixed-K bin lists into one flat, chunk-aligned slot array.

    The uniform-K layout pads every tile to the WORST tile's occupancy
    (measured ~6.5x at bench scale: 106496 slots for ~16k real entries),
    and every downstream cost — the bin-ordered packing math, the kernel
    input DMA, the backward's d_bin table and its cotangent flow — scales
    with the padded width.  Here tile t's first ceil(count_t / k_chunk) *
    k_chunk slots are copied to a contiguous region at a k_chunk-aligned
    dynamic offset, bounding the table at `total` (a static capacity the
    caller sizes from a probe pose plus slack, like the inverted-map M).

    Args:
        idx: (num_tiles, K) bin slot -> triangle index (sentinel t_count).
        counts: (num_tiles,) int32 real occupancies.
        t_count: triangle count (the sentinel value).
        k_chunk: kernel chunk width; offsets and per-tile sizes are
            multiples of it.
        total: static capacity of the flat array (multiple of k_chunk).

    Returns:
        flat (total,) int32 slot -> triangle (sentinel-filled padding),
        off_chunks (num_tiles,) int32 per-tile start in CHUNK units,
        used (num_tiles,) int32 per-tile chunk counts (clamped so
            off + used*k_chunk <= total even on overflow),
        overflow: scalar int32, number of real slots dropped because
            `total` was too small (0 = exact).
    """
    if total % k_chunk:
        raise ValueError(f"total {total} must be a multiple of k_chunk {k_chunk}")
    nt, k = idx.shape
    counts = jnp.minimum(counts, k)
    cnt_pad = jnp.minimum(-(-counts // k_chunk) * k_chunk, k)  # (nt,)
    off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt_pad)[:-1].astype(jnp.int32)]
    )
    fits = off + cnt_pad <= total
    used = jnp.where(
        fits, cnt_pad // k_chunk,
        jnp.maximum(jnp.minimum(total - off, cnt_pad), 0) // k_chunk,
    ).astype(jnp.int32)
    off_c = (jnp.minimum(off, total) // k_chunk).astype(jnp.int32)

    i = jnp.arange(k, dtype=jnp.int32)[None, :]
    pos = off[:, None] + i
    valid = (i < cnt_pad[:, None]) & (pos < total)
    # rejects get DISTINCT out-of-bounds targets (mode='drop' discards
    # them; duplicated indices would break the unique_indices contract)
    rej = total + jnp.arange(nt * k, dtype=jnp.int32).reshape(nt, k)
    pos = jnp.where(valid, pos, rej)
    flat = (
        jnp.full((total,), t_count, jnp.int32)
        .at[pos.reshape(-1)]
        .set(idx.reshape(-1), mode="drop", unique_indices=True)
    )
    overflow = jnp.sum(
        jnp.where((i < counts[:, None]) & (pos >= total), 1, 0)
    ).astype(jnp.int32)
    return flat, off_c, used, overflow
