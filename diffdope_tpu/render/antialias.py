"""Analytic edge antialiasing (nvdiffrast `antialias` contract).

Reference call site: diffdope/diffdope.py:214 — applied to the rendered
*mask*, and it is the **only** path through which pixel coverage produces
gradients w.r.t. vertex positions, hence the pose (SURVEY.md sections 2.3, 7
"coverage gradients").

Method (after "Modular Primitives for High-Performance Differentiable
Rendering", arXiv 2011.03277, section on antialiasing): for every pair of
adjacent pixels whose triangle ids differ, locate where the foreground
triangle's silhouette edge crosses the segment between the two pixel
centers.  The crossing position lambda in [0,1] gives the true half-pixel
coverage, and the pair is blended by the amount the edge overhangs the
midpoint:

    lambda > 1/2 : foreground overhangs into the background pixel
                   -> bg += (lambda - 1/2) * (c_fg - c_bg)
    lambda < 1/2 : background cuts into the foreground pixel
                   -> fg += (1/2 - lambda) * (c_bg - c_fg)

lambda is an analytic, differentiable function of the edge's two vertex
positions, so d(blend)/d(pos_clip) carries the geometric gradient.  All jnp
(gathers + elementwise): the boundary set is sparse but the dense masked
formulation vectorizes perfectly on the VPU and fuses with the loss.

Foreground selection per pair: the non-background pixel, or if both are
covered the one nearer the camera (smaller z/w).  When an ``edge_adj``
topology map is supplied (mesh.build_edge_adjacency) edges are additionally
classified: only boundary edges and front/back facing transitions count as
silhouettes — the role of nvdiffrast's mesh topology hash — which prevents
spurious corner blends against interior edges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-12


def antialias(
    color: Array,
    rast: Array,
    pos_clip: Array | None,
    tri: Array,
    pos_gradient_boost: float = 1.0,
    edge_adj: Array | None = None,
    corners_clip: Array | None = None,
) -> Array:
    """Antialias `color` along silhouette edges.

    Args:
        color: (B, H, W, C) rendered image (differentiable).
        rast: (B, H, W, 4) rasterizer output (for ids and z/w; no grads).
        pos_clip: (B, N, 4) clip positions (differentiable — edge gradients).
        tri: (T, 3) int32.
        pos_gradient_boost: scale on the position gradient (nvdiffrast knob).
        edge_adj: optional (T, 3) int32 neighbor-triangle map (see
            mesh.build_edge_adjacency).  When given, only true silhouette
            edges blend: boundary edges (-1) and front/back facing
            transitions — the role of nvdiffrast's mesh topology hash.
            Without it every edge is treated as a potential silhouette,
            which can slightly over-blend at convex corners.

    Returns:
        (B, H, W, C) antialiased image.
    """
    b, h, w, _ = color.shape
    ids = jax.lax.stop_gradient(rast[..., 3]).astype(jnp.int32)
    zw = jax.lax.stop_gradient(rast[..., 2])

    # Corner-expanded NDC coordinates (B, 3T): either straight from the
    # corner-expanded clip positions (gather-free fast path) or via one
    # (3T,)-sized gather of the per-vertex positions.
    if corners_clip is not None:
        src = corners_clip.reshape(corners_clip.shape[0], -1, 4)  # (B, 3T, 4)
    else:
        src = pos_clip[:, tri.reshape(-1)]  # (B, 3T, 4)
    wc = src[..., 3]
    w_safe = jnp.where(jnp.abs(wc) > _EPS, wc, _EPS)
    sx = src[..., 0] / w_safe
    sy = src[..., 1] / w_safe
    if pos_gradient_boost != 1.0:
        boost = pos_gradient_boost

        @jax.custom_vjp
        def _boosted(x):
            return x

        def _fwd(x):
            return x, None

        def _bwd(_, g):
            return (g * boost,)

        _boosted.defvjp(_fwd, _bwd)
        sx = _boosted(sx)
        sy = _boosted(sy)

    # pixel-center NDC coords
    xs = (2.0 * jnp.arange(w, dtype=color.dtype) + 1.0) / w - 1.0
    ys = (2.0 * jnp.arange(h, dtype=color.dtype) + 1.0) / h - 1.0

    # per-triangle facing sign (screen-space winding), for the silhouette
    # test: an interior edge is a silhouette iff its two faces face
    # opposite ways.  Non-differentiable classification.
    if edge_adj is not None:
        v = jax.lax.stop_gradient(sx).reshape(b, -1, 3)  # (B, T, 3)
        u = jax.lax.stop_gradient(sy).reshape(b, -1, 3)
        area2 = (v[..., 1] - v[..., 0]) * (u[..., 2] - u[..., 0]) - (
            v[..., 2] - v[..., 0]
        ) * (u[..., 1] - u[..., 0])
        facing = area2 > 0.0  # (B, T)
    else:
        facing = None

    # ---- horizontal pairs: (i, j) vs (i, j+1), segment along X at Y=ys[i]
    d_l, d_r = _aa_pairs(
        color[:, :, :-1], color[:, :, 1:],
        ids[:, :, :-1], ids[:, :, 1:],
        zw[:, :, :-1], zw[:, :, 1:],
        along=jnp.broadcast_to(xs[None, None, :-1], (b, h, w - 1)),
        along_next=jnp.broadcast_to(xs[None, None, 1:], (b, h, w - 1)),
        across=jnp.broadcast_to(ys[None, :, None], (b, h, w - 1)),
        sx=sx, sy=sy, tri=tri, horizontal=True,
        edge_adj=edge_adj, facing=facing,
    )
    delta = jnp.pad(d_l, ((0, 0), (0, 0), (0, 1), (0, 0)))
    delta = delta + jnp.pad(d_r, ((0, 0), (0, 0), (1, 0), (0, 0)))

    # ---- vertical pairs: (i, j) vs (i+1, j), segment along Y at X=xs[j]
    d_t, d_b = _aa_pairs(
        color[:, :-1, :], color[:, 1:, :],
        ids[:, :-1, :], ids[:, 1:, :],
        zw[:, :-1, :], zw[:, 1:, :],
        along=jnp.broadcast_to(ys[None, :-1, None], (b, h - 1, w)),
        along_next=jnp.broadcast_to(ys[None, 1:, None], (b, h - 1, w)),
        across=jnp.broadcast_to(xs[None, None, :], (b, h - 1, w)),
        sx=sx, sy=sy, tri=tri, horizontal=False,
        edge_adj=edge_adj, facing=facing,
    )
    delta = delta + jnp.pad(d_t, ((0, 0), (0, 1), (0, 0), (0, 0)))
    delta = delta + jnp.pad(d_b, ((0, 0), (1, 0), (0, 0), (0, 0)))

    return color + delta


def _aa_pairs(
    c_a: Array, c_b: Array,
    id_a: Array, id_b: Array,
    zw_a: Array, zw_b: Array,
    along: Array, along_next: Array, across: Array,
    sx: Array, sy: Array, tri: Array, horizontal: bool,
    edge_adj=None, facing=None,
):
    """Blend deltas for one pass of adjacent pixel pairs.

    a = first pixel (at `along`), b = second pixel (at `along_next`).
    `across` is the shared coordinate of the segment (Y for horizontal
    pairs, X for vertical).  `sx`/`sy` are corner-expanded (B, 3T) NDC
    coordinates.  Returns (delta_a, delta_b), each (..., C).
    """
    differ = id_a != id_b
    fg_is_a = (id_a > 0) & ((id_b == 0) | (zw_a <= zw_b))
    fg_id = jnp.where(fg_is_a, id_a, id_b)
    active = differ & (fg_id > 0)

    # gather fg triangle's corner NDC coords (one flat-index gather)
    tri_idx = jnp.maximum(fg_id - 1, 0)
    bsz = sx.shape[0]
    flat = (tri_idx[..., None] * 3 + jnp.arange(3, dtype=tri_idx.dtype)).reshape(bsz, -1)
    shape3 = tri_idx.shape + (3,)
    vx = jnp.take_along_axis(sx, flat, axis=1).reshape(shape3)
    vy = jnp.take_along_axis(sy, flat, axis=1).reshape(shape3)

    if horizontal:
        e_along, e_across = vx, vy  # crossing solves for x at fixed y
    else:
        e_along, e_across = vy, vx

    if edge_adj is not None and facing is not None:
        flat_t = tri_idx.reshape(bsz, -1)
        fg_facing = jnp.take_along_axis(facing, flat_t, axis=1).reshape(tri_idx.shape)
        nb_all = edge_adj[tri_idx]  # (..., 3) neighbor triangle per edge
        nb_safe = jnp.maximum(nb_all, 0)
        nb_facing = jnp.take_along_axis(
            facing, nb_safe.reshape(bsz, -1), axis=1
        ).reshape(nb_all.shape)
        # silhouette: boundary edge, or front/back facing transition
        silhouette = (nb_all < 0) | (nb_facing != fg_facing[..., None])
    else:
        silhouette = None

    # test each of the 3 edges for a crossing of the pair segment
    lam_stack = []
    valid_stack = []
    for k in range(3):
        k2 = (k + 1) % 3
        a0, a1 = e_across[..., k], e_across[..., k2]
        l0, l1 = e_along[..., k], e_along[..., k2]
        denom = a1 - a0
        denom_safe = jnp.where(jnp.abs(denom) > _EPS, denom, _EPS)
        t = (across - a0) / denom_safe
        cross_pos = l0 + t * (l1 - l0)  # along-coordinate of the crossing
        seg = along_next - along
        lam = (cross_pos - along) / seg  # seg = 2/W (or 2/H), never 0
        valid = (
            active
            & (jnp.abs(denom) > _EPS)
            & (t >= 0.0) & (t <= 1.0)
            & (lam >= 0.0) & (lam <= 1.0)
        )
        if silhouette is not None:
            valid = valid & silhouette[..., k]
        lam_stack.append(lam)
        valid_stack.append(valid)

    lam3 = jnp.stack(lam_stack, axis=-1)
    valid3 = jnp.stack(valid_stack, axis=-1)
    any_valid = jnp.any(valid3, axis=-1)

    # boundary nearest the fg pixel: min lambda if fg is a (at 0), else max
    lam_min = jnp.min(jnp.where(valid3, lam3, jnp.inf), axis=-1)
    lam_max = jnp.max(jnp.where(valid3, lam3, -jnp.inf), axis=-1)
    lam_sel = jnp.where(fg_is_a, lam_min, lam_max)
    lam_sel = jnp.where(any_valid, lam_sel, 0.5)  # 0.5 => zero blend, safe grads
    lam_sel = jnp.clip(lam_sel, 0.0, 1.0)

    # signed overhang toward the bg pixel
    mu = jnp.where(fg_is_a, lam_sel - 0.5, 0.5 - lam_sel)
    gate = (active & any_valid)[..., None]

    c_fg = jnp.where(fg_is_a[..., None], c_a, c_b)
    c_bg = jnp.where(fg_is_a[..., None], c_b, c_a)
    diff = c_fg - c_bg
    mu = mu[..., None]
    delta_bg = jnp.where(gate, jnp.maximum(mu, 0.0) * diff, 0.0)
    delta_fg = jnp.where(gate, -jnp.maximum(-mu, 0.0) * diff, 0.0)

    delta_a = jnp.where(fg_is_a[..., None], delta_fg, delta_bg)
    delta_b = jnp.where(fg_is_a[..., None], delta_bg, delta_fg)
    return delta_a, delta_b
