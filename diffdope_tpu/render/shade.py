"""Packed-row shading: the TPU fast path for the full render pipeline.

Per-pixel gathers are the bottleneck on TPU (XLA gathers run far below HBM
bandwidth), so the production pipeline packs *everything a pixel needs* into
one 32-lane float row per triangle:

    lane  0:9   c0, c1, c2   barycentric coefficient vectors over (X, Y, 1)
    lane  9:12  zc           z/w numerator plane (over det)
    lane 12     det
    lane 13     triangle index (float; exact for T < 2**24)
    lane 14     silhouette bitmask (bit m: the line chat_m = 0 is a
                silhouette edge — boundary or front/back transition)
    lane 15     reserved
    lane 16:31  attribute planes: for each attribute channel c, the vector
                g_c with   value_c(X, Y) = g_c . (X, Y, 1) / s,
                s = sum_k chat_k  (perspective-correct interpolation as a
                ratio of two affine forms)
    lane 31     pad

Shading any pixel is then ONE 32-float gather by triangle id plus a handful
of FMAs — rgb / uv / depth / barycentrics / z-test all come from the same
row.  Antialiasing needs *no* gather at all: the silhouette edge of the
foreground triangle is the zero set of one of its own barycentric coefficient
lines, so edge crossings, validity (other barycentrics >= 0 at the crossing)
and the silhouette flag are all computed from the rows both pixels already
hold.

Everything is differentiable jnp; gradients flow through the packed rows
back to the corner positions and attribute values.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from diffdope_tpu.render.setup_tris import TriangleSetup, pixel_ndc

Array = jax.Array

PACKED_WIDTH = 32
_EPS = 1e-12


def attribute_planes(corner_vals: Array, setup: TriangleSetup) -> Array:
    """Per-triangle interpolation planes for per-corner attribute values.

    Args:
        corner_vals: (T, 3, C) or (B, T, 3, C) attribute value per corner.
        setup: triangle setup (c0, c1, c2 of shape (B, T, 3)).

    Returns:
        (B, T, C, 3) plane vectors g_c with value = g_c.(X,Y,1)/s.
    """
    c = jnp.stack([setup.c0, setup.c1, setup.c2], axis=2)  # (B, T, 3, 3)
    if corner_vals.ndim == 3:
        return jnp.einsum("tkc,btkx->btcx", corner_vals, c, precision="highest")
    return jnp.einsum("btkc,btkx->btcx", corner_vals, c, precision="highest")


def silhouette_bits(det: Array, edge_adj: Optional[Array]) -> Array:
    """(B, T) float bitmask: bit m set iff the line chat_m = 0 borders a
    silhouette (boundary edge or front/back facing transition).

    Edge slot k connects corners (k, k+1) and lies on the line of the third
    corner's coefficient, m = (k + 2) % 3; facing = sign(det) (valid for
    w > 0 vertices)."""
    if edge_adj is None:
        return jnp.full(det.shape, 7.0, det.dtype)  # all edges blend
    det_ng = jax.lax.stop_gradient(det)
    facing = det_ng > 0.0  # (B, T)
    bits = jnp.zeros(det.shape, jnp.int32)
    for k in range(3):  # edge slot k -> line m = (k+2)%3
        nb = edge_adj[:, k]  # (T,)
        nb_safe = jnp.maximum(nb, 0)
        nb_facing = facing[:, nb_safe]  # (B, T)
        sil = (nb < 0)[None, :] | (nb_facing != facing)
        m = (k + 2) % 3
        bits = bits | (sil.astype(jnp.int32) << m)
    return bits.astype(det.dtype)


def pack_rows(
    setup: TriangleSetup,
    sil_bits: Array,
    planes: Optional[Array] = None,
) -> Array:
    """Assemble (B, T, 32) packed rows from setup + silhouette + planes.

    planes: (B, T, C, 3) with C <= 5 attribute channels.
    """
    coef = setup.coef  # (B, T, 16): base layout with idx already unused
    b, t, _ = coef.shape
    tri_idx = jnp.broadcast_to(
        jnp.arange(t, dtype=coef.dtype)[None, :], (b, t)
    )
    base = coef.at[..., 13].set(tri_idx).at[..., 14].set(sil_bits)
    if planes is None:
        extra = jnp.zeros((b, t, PACKED_WIDTH - 16), coef.dtype)
    else:
        flat = planes.reshape(b, t, -1)
        pad = PACKED_WIDTH - 16 - flat.shape[-1]
        if pad < 0:
            raise ValueError("too many attribute planes for the 32-lane row")
        extra = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)))
    return jnp.concatenate([base, extra], axis=-1)


def shade_rows(
    ids: Array,
    packed: Array,
    resolution: Tuple[int, int],
    attr_channels: int = 0,
    stack_outputs: bool = True,
) -> Dict[str, Array]:
    """One gather + elementwise math: everything a pixel needs.

    Args:
        ids: (B, H, W) int32 triangle ids (+1; 0 = background), no grads.
        packed: (B, T, 32) packed rows (differentiable).
        resolution: (H, W).
        attr_channels: number of attribute-plane channels to evaluate.

    Returns dict with:
        'rows' (B,H,W,32) gathered rows (for antialias),
        'fg' (B,H,W,1) bool, 'u','v','zw' (B,H,W), 's' (B,H,W),
        'attrs' (B,H,W,C) perspective-correct attribute values,
        'rast' (B,H,W,4) nvdiffrast-style output.
    """
    idx = jnp.maximum(ids - 1, 0)
    rows = jnp.take_along_axis(
        packed, idx.reshape(ids.shape[0], -1, 1), axis=1
    ).reshape(ids.shape + (PACKED_WIDTH,))
    rows = jnp.where((ids > 0)[..., None], rows, 0.0)
    rows = jnp.moveaxis(rows, -1, 1)  # planar (B, 32, H, W)
    return shade_from_rows(ids, rows, resolution, attr_channels, stack_outputs)


def shade_from_rows(
    ids: Array,
    rows: Array,
    resolution: Tuple[int, int],
    attr_channels: int = 0,
    stack_outputs: bool = True,
    xy: Optional[Tuple[Array, Array]] = None,
) -> Dict[str, Array]:
    """Shading math on pre-gathered rows (see render/gather_rows.py for the
    fused Pallas producer).  Same returns as :func:`shade_rows`.

    `rows` is channel-PLANAR: (B, 32, H, W) — lane k of the packed layout
    lives at rows[:, k].  Channels-last (..., 32) would pad the minor dim to
    128 lanes on TPU (4x memory/bandwidth); planar slices are free.

    stack_outputs=False keeps every per-pixel quantity as its own (B, H, W)
    array ('attrs_list' instead of 'attrs', no 'rast').

    xy overrides the pixel NDC grids (broadcastable to (H, W)) — used by the
    fused loss kernel to shade a TILE of the screen with its true screen
    coordinates (render/fused_loss.py).
    """
    h, w = resolution
    x, y = pixel_ndc(resolution, rows.dtype) if xy is None else xy
    fgf = ids > 0
    fg = fgf[..., None]

    e0 = rows[:, 0] * x + rows[:, 1] * y + rows[:, 2]
    e1 = rows[:, 3] * x + rows[:, 4] * y + rows[:, 5]
    e2 = rows[:, 6] * x + rows[:, 7] * y + rows[:, 8]
    zlin = rows[:, 9] * x + rows[:, 10] * y + rows[:, 11]
    det = rows[:, 12]
    s = e0 + e1 + e2
    s_safe = jnp.where(jnp.abs(s) > _EPS, s, 1.0)
    det_safe = jnp.where(det != 0.0, det, 1.0)
    u = e1 / s_safe
    v = e2 / s_safe
    zw = zlin / det_safe

    out = {
        "rows": rows,
        "fg": fg,
        "u": jnp.where(fgf, u, 0.0),
        "v": jnp.where(fgf, v, 0.0),
        "zw": jnp.where(fgf, zw, 0.0),
        "s": s_safe,
        "attrs": None,
        "rast": None,
    }

    vals = []
    for c in range(attr_channels):
        g0 = rows[:, 16 + 3 * c]
        g1 = rows[:, 17 + 3 * c]
        g2 = rows[:, 18 + 3 * c]
        vals.append(jnp.where(fgf, (g0 * x + g1 * y + g2) / s_safe, 0.0))
    out["attrs_list"] = vals

    if stack_outputs:
        rast = jnp.stack([u, v, zw, ids.astype(rows.dtype)], axis=-1)
        out["rast"] = jnp.where(fg, rast, 0.0)
        if attr_channels:
            out["attrs"] = jnp.stack(vals, axis=-1)
    return out


# ---------------------------------------------------------------------------
# Gather-free antialiasing from packed rows
# ---------------------------------------------------------------------------

def antialias_rows(
    color: Array,
    ids: Array,
    zw: Array,
    rows: Array,
    resolution: Tuple[int, int],
    xy: Optional[Tuple[Array, Array]] = None,
    valid: Optional[Array] = None,
) -> Array:
    """Silhouette-edge antialiasing using only the per-pixel rows.

    Same contract as render.antialias.antialias (the coverage->position
    gradient path) but with zero gathers: the foreground triangle's edges
    are the zero sets of its barycentric coefficient lines (already in the
    row), a crossing is valid when the other two barycentrics are
    nonnegative there, and silhouette classification reads the packed
    bitmask.

    `color` may be (B, H, W) single-channel (preferred on TPU — no lane
    padding) or (B, H, W, C) channels-last.

    xy overrides the pixel NDC grids with true screen coordinates of shape
    (H, W) when antialiasing a tile window (render/fused_loss.py).

    valid optionally marks real image pixels ((B, H, W) or broadcastable
    bool); a pair is active only when BOTH pixels are valid — this is how a
    padded window (raster layout padding, slab halos) reproduces the
    no-pair-past-the-image-edge semantics of the full-image call.
    """
    has_c = color.ndim == 4
    x, y = pixel_ndc(resolution, color.dtype) if xy is None else xy
    x = jnp.broadcast_to(x, resolution)
    y = jnp.broadcast_to(y, resolution)

    ids_ng = jax.lax.stop_gradient(ids)
    zw_ng = jax.lax.stop_gradient(zw)
    valid_b = None
    if valid is not None:
        # keep the mask float through shape ops: Mosaic cannot relayout
        # i1 vectors (slice/broadcast of bools fails in-kernel)
        valid_b = jnp.broadcast_to(
            valid.astype(color.dtype), ids_ng.shape
        )

    def pad_img(a, axis, side):
        # explicit zero-strip concat (NOT jnp.pad: Mosaic's in-kernel pad
        # lowering rejects these shapes)
        shape = list(a.shape)
        shape[axis] = 1
        z = jnp.zeros(shape, a.dtype)
        parts = (z, a) if side == "front" else (a, z)
        return jnp.concatenate(parts, axis=axis)

    # horizontal pairs
    d_a, d_b = _aa_pairs_rows(
        color[:, :, :-1], color[:, :, 1:],
        ids_ng[:, :, :-1], ids_ng[:, :, 1:],
        zw_ng[:, :, :-1], zw_ng[:, :, 1:],
        rows[..., :-1], rows[..., 1:],
        # slice THEN add the batch axis: mixing None with slices in one
        # index lowers to a gather, which Mosaic can't lower in-kernel
        along=x[:, :-1][None], along_next=x[:, 1:][None],
        across=y[:, :-1][None],
        horizontal=True,
        pair_valid=None if valid_b is None
        else valid_b[:, :, :-1] * valid_b[:, :, 1:],
    )
    delta = pad_img(d_a, 2, "back") + pad_img(d_b, 2, "front")

    # vertical pairs
    d_t, d_bt = _aa_pairs_rows(
        color[:, :-1, :], color[:, 1:, :],
        ids_ng[:, :-1, :], ids_ng[:, 1:, :],
        zw_ng[:, :-1, :], zw_ng[:, 1:, :],
        rows[:, :, :-1, :], rows[:, :, 1:, :],
        along=y[:-1, :][None], along_next=y[1:, :][None],
        across=x[:-1, :][None],
        horizontal=False,
        pair_valid=None if valid_b is None
        else valid_b[:, :-1, :] * valid_b[:, 1:, :],
    )
    delta = delta + pad_img(d_t, 1, "back") + pad_img(d_bt, 1, "front")
    return color + delta


def _aa_pairs_rows(
    c_a, c_b, id_a, id_b, zw_a, zw_b, rows_a, rows_b,
    along, along_next, across, horizontal: bool,
    pair_valid=None,
):
    differ = id_a != id_b
    fg_is_a = (id_a > 0) & ((id_b == 0) | (zw_a <= zw_b))
    # pure logic, NOT jnp.where on bools: a select_n with i1 operands makes
    # Mosaic extend to i8 and truncate back, which it cannot compile
    active = differ & (
        (fg_is_a & (id_a > 0)) | (~fg_is_a & (id_b > 0))
    )
    if pair_valid is not None:
        active = active & (pair_valid > 0.5)

    def lane(k):
        """fg pixel's packed lane k, selected per plane (no wide temps)."""
        return jnp.where(fg_is_a, rows_a[:, k], rows_b[:, k])

    sil = jax.lax.stop_gradient(lane(14)).astype(jnp.int32)

    seg = along_next - along  # 2/W or 2/H, > 0

    # running reductions over the 3 edge lines — NO size-3 minor-dim stacks
    # (a channels-last f32[...,3] temp pays 42x lane padding on TPU).
    # Boolean accumulators start as None, not jnp.zeros(..., bool): wide i1
    # constants lower to an i8->i1 truncation Mosaic cannot compile
    any_valid = None
    lam_min = jnp.full(active.shape, jnp.inf, rows_a.dtype)
    lam_max = jnp.full(active.shape, -jnp.inf, rows_a.dtype)
    det_sign = jnp.sign(lane(12))
    for m in range(3):  # edge line: chat_m = 0
        am = lane(3 * m)      # coeff of X
        bm = lane(3 * m + 1)  # coeff of Y
        cm = lane(3 * m + 2)
        if horizontal:
            denom = am
            num = -(bm * across + cm)
        else:
            denom = bm
            num = -(am * across + cm)
        denom_safe = jnp.where(jnp.abs(denom) > _EPS, denom, _EPS)
        cross_pos = num / denom_safe
        lam = (cross_pos - along) / seg

        # endpoint check: the other two barycentric lines must be
        # nonnegative (w.r.t. facing) at the crossing point
        on_edge = None
        for j in range(3):
            if j == m:
                continue
            aj = lane(3 * j)
            bj = lane(3 * j + 1)
            cj = lane(3 * j + 2)
            if horizontal:
                ej = aj * cross_pos + bj * across + cj
            else:
                ej = aj * across + bj * cross_pos + cj
            cond = ej * det_sign >= 0.0
            on_edge = cond if on_edge is None else (on_edge & cond)

        valid = (
            active
            & (jnp.abs(denom) > _EPS)
            & on_edge
            & (lam >= 0.0) & (lam <= 1.0)
            & (((sil >> m) & 1) != 0)  # NOT astype(bool): int->i1
            # truncation is unsupported by Mosaic in-kernel
        )
        any_valid = valid if any_valid is None else (any_valid | valid)
        lam_min = jnp.where(valid & (lam < lam_min), lam, lam_min)
        lam_max = jnp.where(valid & (lam > lam_max), lam, lam_max)

    lam_sel = jnp.where(fg_is_a, lam_min, lam_max)
    lam_sel = jnp.where(any_valid, lam_sel, 0.5)
    lam_sel = jnp.clip(lam_sel, 0.0, 1.0)

    mu = jnp.where(fg_is_a, lam_sel - 0.5, 0.5 - lam_sel)
    gate = active & any_valid
    fg_sel = fg_is_a
    if c_a.ndim == mu.ndim + 1:  # channels-last colors
        mu = mu[..., None]
        gate = gate[..., None]
        fg_sel = fg_is_a[..., None]
    c_fg = jnp.where(fg_sel, c_a, c_b)
    c_bg = jnp.where(fg_sel, c_b, c_a)
    diff = c_fg - c_bg
    delta_bg = jnp.where(gate, jnp.maximum(mu, 0.0) * diff, 0.0)
    delta_fg = jnp.where(gate, -jnp.maximum(-mu, 0.0) * diff, 0.0)
    delta_a = jnp.where(fg_sel, delta_fg, delta_bg)
    delta_b = jnp.where(fg_sel, delta_bg, delta_fg)
    return delta_a, delta_b
