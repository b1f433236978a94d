"""Texture sampling (nvdiffrast `texture` contract).

Reference call site: diffdope/diffdope.py:221-226 with
``filter_mode="linear"`` — bilinear, no mipmaps (the passed ``uv_da`` is
unused by linear mode, so no mip pyramid is required for parity; see
SURVEY.md section 2.3).  'nearest' is also provided; mipmapped modes can be
layered on later by sampling two pyramid levels selected from uv_da.

Differentiable w.r.t. both ``tex`` (4-texel gather -> scatter-add backward)
and ``uv`` (the bilinear weights are linear in the fractional coordinates).
Pure jnp gathers — XLA lowers these to efficient TPU dynamic-gathers and
fuses the lerps.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _wrap_index(i: Array, n: int, mode: str) -> Array:
    if mode == "wrap":
        return jnp.remainder(i, n)
    if mode == "clamp":
        return jnp.clip(i, 0, n - 1)
    if mode == "zero":
        # out-of-range reads are redirected to texel 0 and zeroed by a mask
        return jnp.clip(i, 0, n - 1)
    raise ValueError(f"unknown boundary_mode {mode!r}")


def texture(
    tex: Array,
    uv: Array,
    uv_da: Optional[Array] = None,
    filter_mode: str = "linear",
    boundary_mode: str = "wrap",
) -> Array:
    """Sample a texture at per-pixel uv coordinates.

    Args:
        tex: (TH, TW, C) or (B, TH, TW, C) texture (differentiable).
        uv: (B, H, W, 2) coordinates in [0,1] (u right, v down in texture
            rows — matching the V-flip applied at mesh load, mesh.py).
        uv_da: accepted for contract parity; unused by 'nearest'/'linear'.
        filter_mode: 'linear' (bilinear) or 'nearest'.
        boundary_mode: 'wrap' | 'clamp' | 'zero'.

    Returns:
        (B, H, W, C) sampled colors.
    """
    if tex.ndim == 3:
        tex = tex[None]
    b, h, w, _ = uv.shape
    tb, th, tw, c = tex.shape

    # texel-space coordinates; texel centers at integer + 0.5
    fx = uv[..., 0] * tw - 0.5
    fy = uv[..., 1] * th - 0.5

    if filter_mode == "nearest":
        ix = jnp.floor(fx + 0.5).astype(jnp.int32)
        iy = jnp.floor(fy + 0.5).astype(jnp.int32)
        out = _gather_texels(tex, ix, iy, boundary_mode)
        if boundary_mode == "zero":
            inside = ((ix >= 0) & (ix < tw) & (iy >= 0) & (iy < th))[..., None]
            out = jnp.where(inside, out, 0.0)
        return out

    if filter_mode != "linear":
        raise NotImplementedError(
            f"filter_mode {filter_mode!r}: only 'linear'/'nearest' are "
            "implemented (the reference pipeline uses 'linear', "
            "diffdope.py:225)"
        )

    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    ax = (fx - x0.astype(fx.dtype))[..., None]
    ay = (fy - y0.astype(fy.dtype))[..., None]

    def tap(ix, iy):
        val = _gather_texels(tex, ix, iy, boundary_mode)
        if boundary_mode == "zero":
            inside = ((ix >= 0) & (ix < tw) & (iy >= 0) & (iy < th))[..., None]
            val = jnp.where(inside, val, 0.0)
        return val

    c00 = tap(x0, y0)
    c10 = tap(x0 + 1, y0)
    c01 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)
    top = c00 * (1.0 - ax) + c10 * ax
    bot = c01 * (1.0 - ax) + c11 * ax
    return top * (1.0 - ay) + bot * ay


def _gather_texels(tex: Array, ix: Array, iy: Array, boundary_mode: str) -> Array:
    """Gather tex[b, iy, ix, :] with boundary handling. tex (B,TH,TW,C)."""
    tb, th, tw, c = tex.shape
    b = ix.shape[0]
    ix = _wrap_index(ix, tw, boundary_mode)
    iy = _wrap_index(iy, th, boundary_mode)
    lin = (iy * tw + ix).reshape(b, -1)  # (B, H*W)
    flat = tex.reshape(tb, th * tw, c)
    if tb == 1 and b > 1:
        flat = jnp.broadcast_to(flat, (b, th * tw, c))
    out = jnp.take_along_axis(flat, lin[..., None], axis=1)
    return out.reshape(ix.shape + (c,))
