"""Texture sampling (nvdiffrast `texture` contract).

Reference call site: diffdope/diffdope.py:221-226 with
``filter_mode="linear"`` — bilinear, no mipmaps (the passed ``uv_da`` is
unused by linear mode, so no mip pyramid is required for parity; see
SURVEY.md section 2.3).  The full nvdiffrast filter set is provided anyway:
'nearest', 'linear', and the mipmapped modes 'linear-mipmap-nearest' /
'linear-mipmap-linear', which consume ``uv_da`` (screen-space uv
derivatives, the `diff_attrs` output of interpolate) to select a level of
a 2x-box-filtered pyramid — level = 0.5*log2(max |d(uv*texsize)/dx|^2,
|d(uv*texsize)/dy|^2), nvdiffrast's footprint formula.

Differentiable w.r.t. both ``tex`` (texel gathers -> scatter-add backward,
through the pyramid construction for the mip modes) and ``uv`` (the
bilinear weights are linear in the fractional coordinates); the level
selection itself is piecewise-constant and non-differentiated, as in
nvdiffrast.  Pure jnp gathers — XLA lowers these to TPU dynamic-gathers
and fuses the lerps.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

FILTER_MODES = (
    "nearest", "linear", "linear-mipmap-nearest", "linear-mipmap-linear",
)


def _wrap_index(i: Array, n, mode: str) -> Array:
    if mode == "wrap":
        return jnp.remainder(i, n)
    if mode == "clamp":
        return jnp.clip(i, 0, n - 1)
    if mode == "zero":
        # out-of-range reads are redirected to texel 0 and zeroed by a mask
        return jnp.clip(i, 0, n - 1)
    raise ValueError(f"unknown boundary_mode {mode!r}")


def build_mip_pyramid(tex: Array, max_level: Optional[int] = None) -> List[Array]:
    """2x box-filtered pyramid [level0, level1, ...] (nvdiffrast's
    texture_construct_mip).  Stops at 1x1, `max_level`, or the first level
    whose dimensions are odd."""
    if tex.ndim == 3:
        tex = tex[None]
    tb, th, tw, c = tex.shape
    levels = [tex]
    while (
        th > 1 and tw > 1 and th % 2 == 0 and tw % 2 == 0
        and (max_level is None or len(levels) <= max_level)
    ):
        t = levels[-1].reshape(tb, th // 2, 2, tw // 2, 2, c).mean(axis=(2, 4))
        levels.append(t)
        th //= 2
        tw //= 2
    return levels


def _mip_lod(uv_da: Array, th: int, tw: int, n_levels: int) -> Array:
    """Per-pixel level of detail from screen-space uv derivatives.

    uv_da (B, H, W, 4) = (du/dx, dv/dx, du/dy, dv/dy); footprint =
    max squared length of the texel-space derivative vectors."""
    dx2 = (uv_da[..., 0] * tw) ** 2 + (uv_da[..., 1] * th) ** 2
    dy2 = (uv_da[..., 2] * tw) ** 2 + (uv_da[..., 3] * th) ** 2
    foot = jnp.maximum(jnp.maximum(dx2, dy2), 1e-20)
    lod = 0.5 * jnp.log2(foot)
    return jnp.clip(lod, 0.0, float(n_levels - 1))


def _bilinear_any_level(
    flat: Array, offsets, ths, tws, level: Array, uv: Array,
    boundary_mode: str,
) -> Array:
    """Bilinear sample at a PER-PIXEL pyramid level.

    flat: (B, sum(th_l*tw_l), C) concatenated levels; offsets/ths/tws are
    (n_levels,) int32 tables indexed by the per-pixel level."""
    th_l = ths[level]   # (B, H, W) int32
    tw_l = tws[level]
    off = offsets[level]
    fx = uv[..., 0] * tw_l.astype(uv.dtype) - 0.5
    fy = uv[..., 1] * th_l.astype(uv.dtype) - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    ax = (fx - x0.astype(fx.dtype))[..., None]
    ay = (fy - y0.astype(fy.dtype))[..., None]

    b = uv.shape[0]

    def tap(ix, iy):
        inside = (ix >= 0) & (ix < tw_l) & (iy >= 0) & (iy < th_l)
        ix_w = _wrap_index(ix, tw_l, boundary_mode)
        iy_w = _wrap_index(iy, th_l, boundary_mode)
        lin = (off + iy_w * tw_l + ix_w).reshape(b, -1)
        val = jnp.take_along_axis(flat, lin[..., None], axis=1)
        val = val.reshape(ix.shape + (flat.shape[-1],))
        if boundary_mode == "zero":
            val = jnp.where(inside[..., None], val, 0.0)
        return val

    c00 = tap(x0, y0)
    c10 = tap(x0 + 1, y0)
    c01 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)
    top = c00 * (1.0 - ax) + c10 * ax
    bot = c01 * (1.0 - ax) + c11 * ax
    return top * (1.0 - ay) + bot * ay


def texture_planar(
    tex: Array,
    u: Array,
    v: Array,
    boundary_mode: str = "wrap",
):
    """Channel-planar bilinear sampling: same math as
    ``texture(filter_mode='linear')`` but with planar (B, H, W) u/v inputs
    and a tuple of C (B, H, W) output planes — no (…, 2)/(…, C) minor dims
    anywhere (channels-last intermediates lane-pad 4-64x on TPU; this is
    the sampler for the semi-fused exact-texture loss path,
    pipeline.make_fused_loss).

    Differentiable w.r.t. u/v (bilinear weights) and tex (gathers).
    """
    th, tw, c = tex.shape
    fx = u * tw - 0.5
    fy = v * th - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    ax = fx - x0.astype(fx.dtype)
    ay = fy - y0.astype(fy.dtype)
    flat = [tex[..., ch].reshape(-1) for ch in range(c)]

    def tap(ix, iy):
        inside = (ix >= 0) & (ix < tw) & (iy >= 0) & (iy < th)
        ixw = _wrap_index(ix, tw, boundary_mode)
        iyw = _wrap_index(iy, th, boundary_mode)
        lin = (iyw * tw + ixw).reshape(-1)
        vals = [jnp.take(fc, lin, axis=0).reshape(ix.shape) for fc in flat]
        if boundary_mode == "zero":
            vals = [jnp.where(inside, vv, 0.0) for vv in vals]
        return vals

    c00 = tap(x0, y0)
    c10 = tap(x0 + 1, y0)
    c01 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)
    out = []
    for ch in range(c):
        top = c00[ch] * (1.0 - ax) + c10[ch] * ax
        bot = c01[ch] * (1.0 - ax) + c11[ch] * ax
        out.append(top * (1.0 - ay) + bot * ay)
    return tuple(out)


def texture(
    tex: Array,
    uv: Array,
    uv_da: Optional[Array] = None,
    filter_mode: str = "linear",
    boundary_mode: str = "wrap",
    mip: Optional[Sequence[Array]] = None,
    max_mip_level: Optional[int] = None,
) -> Array:
    """Sample a texture at per-pixel uv coordinates.

    Args:
        tex: (TH, TW, C) or (B, TH, TW, C) texture (differentiable).
        uv: (B, H, W, 2) coordinates in [0,1] (u right, v down in texture
            rows — matching the V-flip applied at mesh load, mesh.py).
        uv_da: (B, H, W, 4) screen-space uv derivatives — REQUIRED by the
            mipmapped modes (interpolate(..., diff_attrs=...) provides it);
            accepted-and-unused by 'nearest'/'linear' (nvdiffrast parity).
        filter_mode: one of FILTER_MODES.
        boundary_mode: 'wrap' | 'clamp' | 'zero'.
        mip: optional precomputed pyramid (build_mip_pyramid) — pass it when
            sampling repeatedly so the downsampling is not re-traced.
        max_mip_level: cap the coarsest level (when building internally).

    Returns:
        (B, H, W, C) sampled colors.
    """
    if filter_mode not in FILTER_MODES:
        raise ValueError(f"unknown filter_mode {filter_mode!r}")
    if tex.ndim == 3:
        tex = tex[None]
    b, h, w, _ = uv.shape
    tb, th, tw, c = tex.shape

    if filter_mode in ("linear-mipmap-nearest", "linear-mipmap-linear"):
        if uv_da is None:
            raise ValueError(f"filter_mode {filter_mode!r} requires uv_da")
        levels = list(mip) if mip is not None else build_mip_pyramid(
            tex, max_mip_level
        )
        levels = [lv if lv.ndim == 4 else lv[None] for lv in levels]
        n = len(levels)
        ths = jnp.asarray([lv.shape[1] for lv in levels], jnp.int32)
        tws = jnp.asarray([lv.shape[2] for lv in levels], jnp.int32)
        sizes = [lv.shape[1] * lv.shape[2] for lv in levels]
        offsets = jnp.asarray(
            [sum(sizes[:i]) for i in range(n)], jnp.int32
        )
        flat = jnp.concatenate(
            [lv.reshape(tb, -1, c) for lv in levels], axis=1
        )
        if tb == 1 and b > 1:
            flat = jnp.broadcast_to(flat, (b,) + flat.shape[1:])

        lod = _mip_lod(jax.lax.stop_gradient(uv_da), th, tw, n)
        if filter_mode == "linear-mipmap-nearest":
            level = jnp.round(lod).astype(jnp.int32)
            return _bilinear_any_level(
                flat, offsets, ths, tws, level, uv, boundary_mode
            )
        l0 = jnp.floor(lod).astype(jnp.int32)
        l1 = jnp.minimum(l0 + 1, n - 1)
        frac = (lod - l0.astype(lod.dtype))[..., None]
        v0 = _bilinear_any_level(flat, offsets, ths, tws, l0, uv, boundary_mode)
        v1 = _bilinear_any_level(flat, offsets, ths, tws, l1, uv, boundary_mode)
        return v0 * (1.0 - frac) + v1 * frac

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


def pack_bilinear_blocks(tex, boundary_mode: str = "wrap"):
    """Pack each channel's 2x2 bilinear footprint into ONE uint32 table.

    TPU XLA gathers cost ~10-25 cycles per index, and the planar bilinear
    sampler issues 4 taps x C channels of them — measured 95% of the
    semi-fused exact-texture step (12 gathers of B*Hp*Wp indices each).
    For 8-bit-quantized textures (every PNG) the whole 2x2 block of one
    channel fits one uint32:

        table_c[y, x] = t8[y, x] | t8[y, x+1]<<8 | t8[y+1, x]<<16
                        | t8[y+1, x+1]<<24

    with neighbors resolved under `boundary_mode` AT PACK TIME, so one
    gather per channel replaces four.  Unpacking is vector math, and
    u8 -> f32 / 255 reproduces the f32 texture bit-exactly (same ops the
    loader ran).

    Setup-time (numpy, concrete texture).  Returns None when the texture
    is not 8-bit-quantized, or for clamp/zero boundaries (there the tap
    pair is NOT a function of one wrapped index — e.g. clamp at x0 <= -1
    needs the (p0, p0) pair no block position encodes; the caller falls
    back to the f32 taps).  The semi-fused loss path uses wrap, matching
    the reference's dr.texture default.
    """
    import numpy as np

    if boundary_mode != "wrap":
        return None
    t = np.asarray(tex)
    if t.ndim != 3 or t.dtype != np.float32:
        return None
    t255 = t * 255.0
    t8 = np.round(t255)
    if not np.allclose(t255, t8, atol=1e-4) or t8.min() < 0 or t8.max() > 255:
        return None
    t8 = t8.astype(np.uint32)
    th, tw, c = t8.shape

    def nb(i, n):
        return (np.arange(n) + i) % n

    x1 = nb(1, tw)
    y1 = nb(1, th)
    tables = []
    for ch in range(c):
        p = t8[:, :, ch]
        blk = (
            p
            | (p[:, x1] << 8)
            | (p[y1, :] << 16)
            | (p[y1][:, x1] << 24)
        )
        tables.append(blk.reshape(-1))
    return np.stack(tables, axis=0)  # (C, th*tw) uint32


def pack_bilinear_blocks4(tex, boundary_mode: str = "wrap"):
    """pack_bilinear_blocks reorganized as ONE (th*tw, 4) row-major table.

    TPU XLA gathers cost per ROW fetched, almost independent of row width
    up to ~16 bytes (measured: three 1-u32 gathers 85 ms vs one 4-u32-row
    gather 38 ms for 3.4M indices on v5e) — so fetching all channels'
    packed 2x2 blocks as one wide row is ~2.2x faster than a gather per
    channel.  Column c holds channel c's block; columns past C are zero.
    Returns None whenever pack_bilinear_blocks would (non-8-bit texture,
    non-wrap boundary) or for more than 4 channels."""
    import numpy as np

    t = pack_bilinear_blocks(tex, boundary_mode)
    if t is None or t.shape[0] > 4:
        return None
    c, n = t.shape
    out = np.zeros((n, 4), np.uint32)
    out[:, :c] = t.T
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def texture_planar_packed4(table4, u, v, th: int, tw: int, nch: int):
    """Bilinear sampling from a pack_bilinear_blocks4 table: ONE wide-row
    gather for all channels, and a backward with NO regather.

    Bit-identical forward to texture_planar_packed (same unpack and
    interpolation expressions).  The custom VJP saves the two per-channel
    sample-position derivative planes (d out / d ax, d out / d ay) from
    the forward — elementwise functions of the unpacked corners — so the
    backward never touches the texture table (the XLA autodiff backward
    re-gathered every corner: measured ~24 ms/step at bench scale).

    Differentiable w.r.t. u/v only (wrap boundary, like
    texture_planar_packed).  Returns a stacked (C, *u.shape) array."""
    out, _ = _packed4_fwd_impl(table4, u, v, th, tw, nch)
    return out


def _packed4_fwd_impl(table4, u, v, th, tw, nch):
    fx = u * tw - 0.5
    fy = v * th - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    ax = fx - x0.astype(fx.dtype)
    ay = fy - y0.astype(fy.dtype)
    x0w = _wrap_index(x0, tw, "wrap")
    y0w = _wrap_index(y0, th, "wrap")
    lin = (y0w * tw + x0w).reshape(-1)
    blk4 = jnp.take(table4, lin, axis=0)  # (N, 4) u32
    outs, gxs, gys = [], [], []
    for ch in range(nch):
        blk = blk4[:, ch].reshape(x0.shape)
        c00 = (blk & 255).astype(jnp.float32) / 255.0
        c10 = ((blk >> 8) & 255).astype(jnp.float32) / 255.0
        c01 = ((blk >> 16) & 255).astype(jnp.float32) / 255.0
        c11 = ((blk >> 24) & 255).astype(jnp.float32) / 255.0
        top = c00 * (1.0 - ax) + c10 * ax
        bot = c01 * (1.0 - ax) + c11 * ax
        outs.append(top * (1.0 - ay) + bot * ay)
        gxs.append((c10 - c00) * (1.0 - ay) + (c11 - c01) * ay)
        gys.append(bot - top)
    return (
        jnp.stack(outs, axis=0),
        (jnp.stack(gxs, axis=0), jnp.stack(gys, axis=0)),
    )


def _packed4_vjp_fwd(table4, u, v, th, tw, nch):
    out, (gx, gy) = _packed4_fwd_impl(table4, u, v, th, tw, nch)
    return out, (gx, gy, table4.shape)


def _packed4_vjp_bwd(th, tw, nch, res, d_out):
    gx, gy, tshape = res
    d_u = jnp.sum(d_out * gx, axis=0) * jnp.float32(tw)
    d_v = jnp.sum(d_out * gy, axis=0) * jnp.float32(th)
    d_table = np.zeros(tshape, jax.dtypes.float0)
    return (d_table, d_u, d_v)


texture_planar_packed4.defvjp(_packed4_vjp_fwd, _packed4_vjp_bwd)


def texture_planar_packed(
    tables,
    th: int,
    tw: int,
    u,
    v,
    boundary_mode: str = "wrap",
):
    """Bilinear sampling from pack_bilinear_blocks tables: one gather per
    channel instead of four.  Bit-identical to texture_planar on the
    original 8-bit-quantized texture (the unpacked u8 / 255 reproduces the
    loader's f32 values; the interpolation math is unchanged).

    NOT differentiable w.r.t. the texture (integer path) — u/v cotangents
    flow through the bilinear weights as before.  Pose refinement never
    differentiates the texture; appearance-on-texture uses the f32 path.
    """
    fx = u * tw - 0.5
    fy = v * th - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    ax = fx - x0.astype(fx.dtype)
    ay = fy - y0.astype(fy.dtype)
    if boundary_mode != "wrap":
        raise ValueError("texture_planar_packed supports wrap only "
                         "(see pack_bilinear_blocks)")
    x0w = _wrap_index(x0, tw, boundary_mode)
    y0w = _wrap_index(y0, th, boundary_mode)
    lin = (y0w * tw + x0w).reshape(-1)
    out = []
    for ch in range(tables.shape[0]):
        blk = jnp.take(tables[ch], lin, axis=0).reshape(x0.shape)
        c00 = (blk & 255).astype(jnp.float32) / 255.0
        c10 = ((blk >> 8) & 255).astype(jnp.float32) / 255.0
        c01 = ((blk >> 16) & 255).astype(jnp.float32) / 255.0
        c11 = ((blk >> 24) & 255).astype(jnp.float32) / 255.0
        top = c00 * (1.0 - ax) + c10 * ax
        bot = c01 * (1.0 - ax) + c11 * ax
        out.append(top * (1.0 - ay) + bot * ay)
    return tuple(out)
