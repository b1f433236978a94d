"""Barycentric attribute interpolation (nvdiffrast `interpolate` contract).

Call sites in the reference: diffdope/diffdope.py:147-153, 203, 212-213,
218-219, 230.  Semantics: for every foreground pixel gather the selected
triangle's three vertex attributes and blend with the perspective-correct
barycentrics from `rast`:

    out = a0 * (1 - u - v) + a1 * u + a2 * v

Differentiable w.r.t. both the attributes (gather -> scatter-add backward)
and the barycentric channels of `rast` (and through them the vertex
positions).  With ``diff_attrs`` also returns image-space attribute
derivatives out_da = J_attr . (du/dx, du/dy, dv/dx, dv/dy) used for texture
filtering — inert for filter_mode='linear', provided for contract parity.

Pure jnp: a gather plus elementwise math; XLA fuses it into neighboring ops,
so a dedicated Pallas kernel would add nothing here.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

Array = jax.Array


def interpolate(
    attr: Array,
    rast: Array,
    tri: Array,
    rast_db: Optional[Array] = None,
    diff_attrs: Union[None, str, Sequence[int]] = None,
) -> Tuple[Array, Optional[Array]]:
    """Interpolate vertex attributes at rasterized pixels.

    Args:
        attr: (N, C) or (B, N, C) vertex attributes (differentiable).
        rast: (B, H, W, 4) rasterizer output (u, v, z/w, id).
        tri: (T, 3) int32 triangle indices.
        rast_db: (B, H, W, 4) bary pixel derivatives (needed for diff_attrs).
        diff_attrs: 'all' or list of attribute channel indices for which to
            compute image-space derivatives.

    Returns:
        (out, out_da): out (B,H,W,C); out_da (B,H,W,2*D) with layout
        (dA_0/dx, dA_0/dy, dA_1/dx, ...) or None when diff_attrs is None.
    """
    b, h, w, _ = rast.shape
    if attr.ndim == 2:
        attr = jnp.broadcast_to(attr[None], (b,) + attr.shape)

    ids = jax.lax.stop_gradient(rast[..., 3]).astype(jnp.int32)  # 0 = bg
    fg = (ids > 0)[..., None]
    tri_idx = jnp.maximum(ids - 1, 0)
    corners = tri[tri_idx]  # (B, H, W, 3) int32 vertex indices

    flat = corners.reshape(b, -1)  # (B, H*W*3)
    gathered = jnp.take_along_axis(attr, flat[..., None], axis=1)
    a = gathered.reshape(b, h, w, 3, attr.shape[-1])  # (B,H,W,3,C)

    u = rast[..., 0:1]
    v = rast[..., 1:2]
    w0 = 1.0 - u - v
    out = a[..., 0, :] * w0 + a[..., 1, :] * u + a[..., 2, :] * v
    out = jnp.where(fg, out, 0.0)

    if diff_attrs is None:
        return out, None
    if rast_db is None:
        raise ValueError("diff_attrs requires rast_db")

    if isinstance(diff_attrs, str):
        if diff_attrs != "all":
            raise ValueError("diff_attrs must be 'all' or a channel list")
        sel = list(range(attr.shape[-1]))
    else:
        sel = list(diff_attrs)

    # dA/du = a1 - a0, dA/dv = a2 - a0; chain with (du/dx, du/dy, dv/dx, dv/dy)
    da_du = a[..., 1, :] - a[..., 0, :]
    da_dv = a[..., 2, :] - a[..., 0, :]
    dudx, dudy = rast_db[..., 0:1], rast_db[..., 1:2]
    dvdx, dvdy = rast_db[..., 2:3], rast_db[..., 3:4]
    dadx = da_du * dudx + da_dv * dvdx  # (B,H,W,C)
    dady = da_du * dudy + da_dv * dvdy
    pieces = []
    for c in sel:
        pieces.append(dadx[..., c : c + 1])
        pieces.append(dady[..., c : c + 1])
    out_da = jnp.where(fg, jnp.concatenate(pieces, axis=-1), 0.0)
    return out, out_da
