"""Fused shade + antialias + loss-reduction Pallas kernel.

The unfused pipeline materializes every post-raster intermediate in HBM:
the gathered rows (B, 32, H, W) are read by the XLA shade/antialias fusions,
the antialiased mask / color / depth planes are written back, and the
backward pass assembles an equally wide d_rows — measured ~100 ms/step of
pure layout traffic at bench scale (B=64, 400x400).  But the refinement
loop only ever consumes THREE SCALARS per hypothesis (the per-term L1
means; reference loss semantics diffdope/diffdope.py:534-613) — the images
themselves are only needed for visualization, which re-renders on demand.

This kernel therefore computes the loss partial sums directly from the
raster output, one (slab of rows) at a time, entirely in VMEM:

    forward:  rows slab -> shade -> antialias -> |diff| masked sums
              -> (B, n_slabs, [mask_sum, rgb_sum, depth_sum])
    backward: re-shade the slab and pull the cotangent back with jax.vjp
              *inside the kernel* -> d_rows slab.  The shade/AA/L1 math is
              elementwise, so its VJP is elementwise too — Mosaic compiles
              it like any other kernel body; no hand-written backward and
              no HBM residuals beyond the raster outputs themselves.

Slab halos: antialiasing couples vertically adjacent pixels, so a slab's
loss rows need one neighbor row on each side, and a slab's d_rows needs two
(its rows are touched by loss rows one further out).  Each kernel instance
receives its slab plus the 2 boundary rows of both neighbor slabs (tiny
side arrays; block index maps clamp at the image edges) and computes with
a (hs + 4)-row window; the forward masks the loss sum to exactly its own
rows, the backward masks to [own - 1, own + 1] rows and writes only the
interior d_rows — every (loss row -> d row) contribution lands in exactly
one slab's output.

Padding: inputs stay in the raster kernel's tile-padded (Hp, Wp) layout
(raster_v2 padded=True) — no slice/pad copies at either boundary.  The
`valid` pair gating in shade.antialias_rows reproduces the reference's
no-pair-past-the-image-edge semantics inside the padded window.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffdope_tpu.render.shade import antialias_rows, shade_from_rows

Array = jax.Array

#: lanes of the (B, 3) sums output: per-hypothesis L1 sums of
#: mask (over 3 seg channels), rgb (seg-masked, 3 channels), depth
MASK_LANE, RGB_LANE, DEPTH_LANE = 0, 1, 2


def pick_slab_h(hp: int, target: int = 64, wp: int = 512) -> int:
    """Largest divisor of the padded height that is a multiple of 8 (Mosaic
    block second-minor constraint) and keeps the slab window under the
    scoped-VMEM budget; hp itself when none exists.

    `target` is calibrated for 512 padded columns and scales down with
    wider images — the kernel's VMEM footprint is proportional to
    (hs + 4) * wp, and 32-row backward slabs at wp=512 measured right at
    the 16 MiB ceiling (a 960x540 scene with wp=1024 overflowed it)."""
    target = max(8, (target * 512) // max(wp, 512))
    # leave headroom below the nominal budget: the window also carries the
    # shade/AA temporaries at the same width
    best = 0
    for d in range(8, min(hp, target) + 1, 8):
        if hp % d == 0:
            best = d
    return best if best else hp


def _window_terms(
    rows_w, ids_w, gt_w, dpl_w, x, y, valid, loss_mask, n_attr: int,
    colors_w=None,
):
    """Loss-term partial sums over one (hs+4)-row slab window (pure jnp).

    rows_w (32, hw, Wp), ids_w (hw, Wp) i32, gt_w (6, hw, Wp) planes
    [seg0..2, rgb0..2], dpl_w optional (hw, Wp) = gt_depth + t_z,
    x (1, Wp) / y (hw, 1) NDC, valid/loss_mask (hw, Wp) bool.
    colors_w: optional (3, hw, Wp) PRE-SAMPLED color planes (semi-fused
    exact-texture path) used for the rgb term instead of the rows'
    interpolated attribute planes; must be foreground-masked by the caller.

    Exact reference semantics (diffdope.py:547-613): every term is an L1,
    rgb/depth masked by the gt segmentation; the depth term uses
    |render_depth - gt| * seg0 = |attr_z + t_z + gt| * seg0 (render depth is
    -(attr_z + t_z), diffdope.py:203-209), with t_z folded into dpl_w by the
    caller so the kernel needs no per-hypothesis scalars.
    """
    ids4 = ids_w[None]
    rows4 = rows_w[None]
    res_w = ids_w.shape
    shd = shade_from_rows(
        ids4, rows4, res_w, attr_channels=n_attr, stack_outputs=False,
        xy=(x, y),
    )
    fgm = (ids4 > 0).astype(rows_w.dtype)
    aa = antialias_rows(
        fgm, ids4, shd["zw"], rows4, res_w, xy=(x, y), valid=valid[None]
    )[0]
    lm = loss_mask.astype(rows_w.dtype)
    attrs = shd["attrs_list"]

    m_sum = jnp.float32(0.0)
    r_sum = jnp.float32(0.0)
    for c in range(3):
        m_sum = m_sum + jnp.sum(jnp.abs(aa - gt_w[c]) * lm)
        rc = colors_w[c] if colors_w is not None else attrs[c][0]
        r_sum = r_sum + jnp.sum(jnp.abs(rc - gt_w[3 + c]) * gt_w[c] * lm)
    if dpl_w is not None:
        d_sum = jnp.sum(jnp.abs(attrs[n_attr - 1][0] + dpl_w) * gt_w[0] * lm)
    else:
        d_sum = jnp.float32(0.0)
    return m_sum, r_sum, d_sum


def _window_geometry(si, hs, h, w, wp, roi=None):
    """(x, y, valid, own) for the slab window starting at row si*hs - 2.

    roi=(oy, ox, fh, fw): rows/cols are CROP-local; NDC coordinates come
    from the global pixel index (local + origin) over the full (fh, fw)
    frame — bit-identical to the full-frame values at the same pixels —
    while validity clips to the crop window intersected with the frame
    (a crop edge interior to the image behaves like an image edge, which
    matches the full-frame render exactly as long as no triangle comes
    within 2 px of it; pipeline.make_fused_loss counts violations in the
    `_crop_leak` telemetry)."""
    oy, ox, fh, fw = roi if roi is not None else (0, 0, h, w)
    hw = hs + 4
    row_abs = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) + (si * hs - 2)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    y = (2.0 * (row_abs + oy).astype(jnp.float32) + 1.0) / fh - 1.0
    x = (2.0 * (col + ox).astype(jnp.float32) + 1.0) / fw - 1.0
    valid = (row_abs >= 0) & (row_abs < min(h, fh - oy)) & (col < min(w, fw - ox))
    own = (row_abs >= si * hs) & (row_abs < si * hs + hs)
    return x, y, valid, own


def _assemble(ids_m, ids_t, ids_b, rows_m, rows_t, rows_b, gt_m, gt_t, gt_b,
              dpl=None, cols=None):
    """Concatenate main slab + 2-row halos into (hs+4)-row windows.

    The halo blocks are overlapping BlockSpec windows over the SAME raw
    rows/ids/gt arrays (offsets si*hs -/+ 2 expressed in 2-row block units —
    hs is a multiple of 8, so they are exact block indices; edge slabs clamp
    and read in-image rows whose values are masked out by the window
    geometry).  No halo copies are materialized in HBM.

    gt_t/gt_b (and the halo entries of dpl) may be None: the forward only
    sums loss over its own rows, so the gt values at halo rows are always
    masked out — zero-padding replaces two operand streams per array."""
    ids_w = jnp.concatenate(
        [ids_t[0, 6:8], ids_m[0], ids_b[0, 0:2]], axis=0
    )
    rows_w = jnp.concatenate(
        [rows_t[0, :, 6:8], rows_m[0], rows_b[0, :, 0:2]], axis=1
    )
    wp = ids_m.shape[-1]
    zg = jnp.zeros((gt_m.shape[0], 2, wp), gt_m.dtype)
    gt_w = jnp.concatenate(
        [zg if gt_t is None else gt_t[:, 6:8], gt_m[...],
         zg if gt_b is None else gt_b[:, 0:2]], axis=1
    )
    dpl_w = None
    if dpl is not None:
        dpl_m, dpl_t, dpl_b = dpl
        zd = jnp.zeros((2, wp), jnp.float32)
        dpl_w = jnp.concatenate(
            [zd if dpl_t is None else dpl_t[0, 6:8], dpl_m[0],
             zd if dpl_b is None else dpl_b[0, 0:2]], axis=0
        )
    cols_w = None
    if cols is not None:
        cols_m, cols_t, cols_b = cols
        zc = jnp.zeros((3, 2, wp), jnp.float32)
        cols_w = jnp.concatenate(
            [zc if cols_t is None else cols_t[0][:, 6:8], cols_m[0],
             zc if cols_b is None else cols_b[0][:, 0:2]], axis=1
        )
    return ids_w, rows_w, gt_w, dpl_w, cols_w


def _unpack(refs, with_depth, with_colors, halos):
    """Split the flat ref list per the canonical operand order:
    ids x3, rows x3, gt main [+2 halos], dpl main [+2], colors main [+2]."""
    ids3 = refs[0:3]
    rows3 = refs[3:6]
    i = 6
    gt_m = refs[i]
    i += 1
    gt_t = gt_b = None
    if halos:
        gt_t, gt_b = refs[i], refs[i + 1]
        i += 2
    dpl = None
    if with_depth:
        if halos:
            dpl = (refs[i], refs[i + 1], refs[i + 2])
            i += 3
        else:
            dpl = (refs[i], None, None)
            i += 1
    cols = None
    if with_colors:
        if halos:
            cols = (refs[i], refs[i + 1], refs[i + 2])
            i += 3
        else:
            cols = (refs[i], None, None)
            i += 1
    return ids3, rows3, (gt_m, gt_t, gt_b), dpl, cols, i


def _fwd_kernel(*refs, hs, h, w, wp, n_attr, with_depth, with_colors=False,
                roi=None):
    ids3, rows3, gts, dpl, cols, i = _unpack(
        refs[:-1], with_depth, with_colors, halos=False
    )
    out_ref = refs[-1]
    si = pl.program_id(1)
    ids_w, rows_w, gt_w, dpl_w, cols_w = _assemble(
        *ids3, *rows3, *gts, dpl, cols
    )
    x, y, valid, own = _window_geometry(si, hs, h, w, wp, roi)

    # slabs with no foreground anywhere in the window (incl. halos, which
    # could seed antialias pairs) reduce to gt-only constants: aa == 0 and
    # every attribute == 0 (colors are fg-masked), so |0 - gt| terms remain
    # — computed directly instead of running the full shade+AA (typically
    # ~half the slabs)
    active = jnp.any(ids_w > 0)

    def full(_):
        return _window_terms(
            rows_w, ids_w, gt_w, dpl_w, x, y, valid, valid & own, n_attr,
            cols_w,
        )

    def bg_only(_):
        lm = (valid & own).astype(rows_w.dtype)
        m_sum = jnp.float32(0.0)
        r_sum = jnp.float32(0.0)
        for c in range(3):
            m_sum = m_sum + jnp.sum(gt_w[c] * lm)
            r_sum = r_sum + jnp.sum(gt_w[3 + c] * gt_w[c] * lm)
        if dpl_w is not None:
            d_sum = jnp.sum(jnp.abs(dpl_w) * gt_w[0] * lm)
        else:
            d_sum = jnp.float32(0.0)
        return m_sum, r_sum, d_sum

    m_sum, r_sum, d_sum = jax.lax.cond(active, full, bg_only, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out_ref[0, 0] = (
        jnp.where(lane == MASK_LANE, m_sum, 0.0)
        + jnp.where(lane == RGB_LANE, r_sum, 0.0)
        + jnp.where(lane == DEPTH_LANE, d_sum, 0.0)
    )


def _bwd_kernel(*refs, hs, h, w, wp, n_attr, with_depth, with_colors=False,
                roi=None):
    ids3, rows3, gts, dpl, cols, i = _unpack(
        refs, with_depth, with_colors, halos=True
    )
    dsum = refs[i]
    d_rows_ref = refs[i + 1]
    j = i + 2
    d_dpl_ref = None
    if with_depth:
        d_dpl_ref = refs[j]
        j += 1
    d_cols_ref = None
    if with_colors:
        d_cols_ref = refs[j]
    si = pl.program_id(1)
    ids_w, rows_w, gt_w, dpl_w, cols_w = _assemble(
        *ids3, *rows3, *gts, dpl, cols
    )
    x, y, valid, own = _window_geometry(si, hs, h, w, wp, roi)
    # extended mask: the interior d_rows also receive contributions from the
    # first loss row of each neighbor slab
    hw = hs + 4
    loc = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    ext = (loc >= 1) & (loc < hs + 3)
    lm = valid & ext

    # cotangent scalars extracted lane-safely (masked reduction instead of
    # single-lane scalar loads, which Mosaic cannot lower)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    dvec = dsum[0, 0:1, :]  # (1, 128)

    def _lane(k):
        return jnp.sum(jnp.where(lane1 == k, dvec, 0.0))

    dm, dr, dd = _lane(MASK_LANE), _lane(RGB_LANE), _lane(DEPTH_LANE)

    # no-foreground windows: aa/attrs are identically zero, and the only
    # d_rows a background pixel could carry (through the zero attribute
    # planes) would be discarded by the raster backward's winner indicator
    # anyway (ids == 0 matches nothing) -> skip the vjp entirely.  Colors
    # are fg-masked upstream, so their bg cotangent is irrelevant (killed
    # by the fg factor outside) -> zeros.
    active = jnp.any(ids_w > 0)

    @pl.when(active)
    def _full():
        diff_args = [rows_w]
        if with_depth:
            diff_args.append(dpl_w)
        if with_colors:
            diff_args.append(cols_w)

        def f(rw, *rest):
            k = 0
            dw = None
            cw = None
            if with_depth:
                dw = rest[k]
                k += 1
            if with_colors:
                cw = rest[k]
            return _window_terms(
                rw, ids_w, gt_w, dw, x, y, valid, lm, n_attr, cw
            )

        _, pull = jax.vjp(f, *diff_args)
        grads = pull((dm, dr, dd))
        # bf16 cast (raster_loss_compact's DD_DROWS_BF16 path) happens
        # HERE, once, at the HBM boundary — accumulations stay f32
        d_rows_ref[0] = grads[0][:, 2 : 2 + hs, :].astype(d_rows_ref.dtype)
        k = 1
        if with_depth:
            d_dpl_ref[0] = grads[k][2 : 2 + hs]
            k += 1
        if with_colors:
            d_cols_ref[0] = grads[k][:, 2 : 2 + hs, :]

    @pl.when(jnp.logical_not(active))
    def _bg():
        d_rows_ref[0] = jnp.zeros(d_rows_ref.shape[1:], d_rows_ref.dtype)
        if with_depth:
            # depth term still differentiates w.r.t. dplane on background:
            # d|0 + dpl| = sign(dpl) * seg0 * mask * dd
            lmf = lm.astype(jnp.float32)
            d_dpl_w = dd * jnp.sign(dpl_w) * gt_w[0] * lmf
            d_dpl_ref[0] = d_dpl_w[2 : 2 + hs]
        if with_colors:
            d_cols_ref[0] = jnp.zeros(d_cols_ref.shape[1:], jnp.float32)


def _specs(b, width, hs, wp, ns, with_depth, gt_halos=True,
           with_colors=False):
    """in_specs for [ids x3, rows x3, gt x1|3, dpl x1|3?] (fwd passes
    gt_halos=False: its loss rows never read gt beyond the main slab).

    Halo blocks are (…, 8, wp) windows over the SAME raw arrays (8-row
    blocks are lowering-legal; 2-row blocks are not, and a row-pair reshape
    view measured ~11 ms/step of T(8,128)->T(2,128) tiling relayouts): slab
    si's top halo block starts at row si*hs - 8 = 8-row block si*hs/8 - 1
    (hs is a multiple of 8, exact), its bottom halo at (si+1)*hs.  The
    kernel slices the 2 boundary rows it needs from each 8-row block
    (_assemble).  Edge slabs clamp into the image; the clamped rows are
    masked by the window geometry.  No halo copies are materialized."""
    hb = hs // 8
    nb = (ns * hs) // 8  # total 8-row blocks in the padded height

    def top(si):
        return jnp.maximum(si * hb - 1, 0)

    def bot(si):
        return jnp.minimum((si + 1) * hb, nb - 1)

    specs = [
        pl.BlockSpec((1, hs, wp), lambda bi, si: (bi, si, 0)),
        pl.BlockSpec((1, 8, wp), lambda bi, si: (bi, top(si), 0)),
        pl.BlockSpec((1, 8, wp), lambda bi, si: (bi, bot(si), 0)),
        pl.BlockSpec((1, width, hs, wp), lambda bi, si: (bi, 0, si, 0)),
        pl.BlockSpec((1, width, 8, wp), lambda bi, si: (bi, 0, top(si), 0)),
        pl.BlockSpec((1, width, 8, wp), lambda bi, si: (bi, 0, bot(si), 0)),
        pl.BlockSpec((6, hs, wp), lambda bi, si: (0, si, 0)),
    ]
    if gt_halos:
        specs += [
            pl.BlockSpec((6, 8, wp), lambda bi, si: (0, top(si), 0)),
            pl.BlockSpec((6, 8, wp), lambda bi, si: (0, bot(si), 0)),
        ]
    if with_depth:
        specs += [
            pl.BlockSpec((1, hs, wp), lambda bi, si: (bi, si, 0)),
        ]
        if gt_halos:
            specs += [
                pl.BlockSpec((1, 8, wp), lambda bi, si: (bi, top(si), 0)),
                pl.BlockSpec((1, 8, wp), lambda bi, si: (bi, bot(si), 0)),
            ]
    if with_colors:
        specs += [
            pl.BlockSpec((1, 3, hs, wp), lambda bi, si: (bi, 0, si, 0)),
        ]
        if gt_halos:
            specs += [
                pl.BlockSpec(
                    (1, 3, 8, wp), lambda bi, si: (bi, 0, top(si), 0)
                ),
                pl.BlockSpec(
                    (1, 3, 8, wp), lambda bi, si: (bi, 0, bot(si), 0)
                ),
            ]
    return specs


def _operands(rows, ids, gt6, dplane, colors, hs, gt_halos=True):
    """Operand list: main AND halo blocks are BlockSpec windows over the
    same raw arrays (see _specs) — no halo copies are built."""
    b, width, hp, wp = rows.shape
    ns = hp // hs
    ops = [ids, ids, ids, rows, rows, rows, gt6]
    if gt_halos:
        ops += [gt6, gt6]
    if dplane is not None:
        ops.append(dplane)
        if gt_halos:
            ops += [dplane, dplane]
    if colors is not None:
        ops.append(colors)
        if gt_halos:
            ops += [colors, colors]
    return ops, ns


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_loss_sums(
    rows: Array,
    ids: Array,
    gt6: Array,
    dplane: Optional[Array],
    colors: Optional[Array],
    resolution: Tuple[int, int],
    n_attr: int = 4,
    interpret: bool = False,
    roi: Optional[Tuple[int, int, int, int]] = None,
) -> Array:
    """Per-hypothesis loss partial sums straight from the raster output.

    Args:
        rows: (B, 32, Hp, Wp) planar gathered rows (raster_v2 padded=True).
        ids: (B, Hp, Wp) int32 triangle ids (+1; 0 = background).
        gt6: (6, Hp, Wp) gt planes [seg0, seg1, seg2, rgb0, rgb1, rgb2],
            zero-padded past (H, W).
        dplane: None, or (B, Hp, Wp) = gt_depth + t_z per hypothesis (the
            depth L1 |render - gt| * seg0 equals |attr_z + dplane| * seg0).
        colors: None, or (B, 3, Hp, Wp) pre-sampled color planes (the
            semi-fused exact-texture path) used for the rgb term instead of
            the rows' interpolated color attributes.  MUST be
            foreground-masked (colors * (ids > 0)); background cotangents
            come back as zeros (the fg factor outside kills them anyway).
        resolution: real (H, W) — pixels beyond are excluded exactly.
        n_attr: attribute channels in the packed rows (color 3 + depth 1,
            or uv 2 + depth 1 with `colors`).

    Returns:
        (B, 3) float32: [mask_sum, rgb_sum, depth_sum] — raw L1 sums
        (divide by pixel counts outside; see pipeline.make_fused_loss).

    Differentiable w.r.t. `rows` (and `dplane`/`colors`); `gt6` is treated
    as a CONSTANT — its cotangent is zero by design (ground truth is never
    optimized here).  Use the unfused render_batch + losses path to
    differentiate a loss w.r.t. the target images.
    """
    sums, _ = _fwd(rows, ids, gt6, dplane, colors, resolution, n_attr,
                   interpret, roi)
    return sums


def _fwd(rows, ids, gt6, dplane, colors, resolution, n_attr, interpret,
         roi=None):
    b, width, hp, wp = rows.shape
    h, w = resolution
    hs = pick_slab_h(hp, target=32, wp=wp)
    ops, ns = _operands(rows, ids, gt6, dplane, colors, hs, gt_halos=False)
    with_depth = dplane is not None
    with_colors = colors is not None
    kernel = functools.partial(
        _fwd_kernel, hs=hs, h=h, w=w, wp=wp, n_attr=n_attr,
        with_depth=with_depth, with_colors=with_colors, roi=roi,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, ns, 8, 128), jnp.float32),
        grid=(b, ns),
        in_specs=_specs(b, width, hs, wp, ns, with_depth, gt_halos=False,
                        with_colors=with_colors),
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda bi, si: (bi, si, 0, 0)),
        interpret=interpret,
    )(*ops)
    return jnp.sum(out[:, :, 0, :3], axis=1), None


def _vjp_fwd(rows, ids, gt6, dplane, colors, resolution, n_attr, interpret,
             roi=None):
    sums, _ = _fwd(rows, ids, gt6, dplane, colors, resolution, n_attr,
                   interpret, roi)
    return sums, (rows, ids, gt6, dplane, colors)


def _vjp_bwd(resolution, n_attr, interpret, roi, res, d_sums):
    rows, ids, gt6, dplane, colors = res
    d_rows, d_dpl, d_cols = backward_pass(
        rows, ids, gt6, dplane, colors, resolution, n_attr, interpret,
        d_sums, roi=roi,
    )
    d_ids = np.zeros(ids.shape, jax.dtypes.float0)
    return (d_rows, d_ids, jnp.zeros_like(gt6), d_dpl, d_cols)


def backward_pass(rows, ids, gt6, dplane, colors, resolution, n_attr,
                  interpret, d_sums, d_rows_dtype=jnp.float32, roi=None):
    """The fused-loss backward kernel as a plain function: d_sums (B, 3)
    -> (d_rows, d_dplane, d_colors).  `d_rows_dtype` lets the spanning
    raster_loss_compact emit the 1.7 GB/step d_rows cotangent in bf16
    (halving its HBM write + the raster backward's read); the rounding
    happens once at the HBM boundary, all accumulation stays f32."""
    b, width, hp, wp = rows.shape
    h, w = resolution
    # smaller slabs than the forward: the in-kernel vjp roughly doubles the
    # live window temps, and 32-row slabs measured right at the 16 MiB
    # scoped-vmem ceiling at bench scale (W=512)
    hs = pick_slab_h(hp, target=24, wp=wp)
    ops, ns = _operands(rows, ids, gt6, dplane, colors, hs)
    with_depth = dplane is not None
    with_colors = colors is not None

    d_pad = jnp.zeros((b, 8, 128), jnp.float32)
    d_pad = d_pad.at[:, 0, :3].set(d_sums)

    kernel = functools.partial(
        _bwd_kernel, hs=hs, h=h, w=w, wp=wp, n_attr=n_attr,
        with_depth=with_depth, with_colors=with_colors, roi=roi,
    )
    in_specs = _specs(b, width, hs, wp, ns, with_depth,
                      with_colors=with_colors) + [
        pl.BlockSpec((1, 8, 128), lambda bi, si: (bi, 0, 0)),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, width, hp, wp), d_rows_dtype)]
    out_specs = [
        pl.BlockSpec((1, width, hs, wp), lambda bi, si: (bi, 0, si, 0))
    ]
    if with_depth:
        out_shape.append(jax.ShapeDtypeStruct((b, hp, wp), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, hs, wp), lambda bi, si: (bi, si, 0))
        )
    if with_colors:
        out_shape.append(jax.ShapeDtypeStruct((b, 3, hp, wp), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 3, hs, wp), lambda bi, si: (bi, 0, si, 0))
        )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(b, ns),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*ops, d_pad)
    d_rows = outs[0]
    k = 1
    d_dpl = None
    if with_depth:
        d_dpl = outs[k]
        k += 1
    d_cols = outs[k] if with_colors else None
    return (d_rows, d_dpl, d_cols)


fused_loss_sums.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# spanning op: compact raster + fused loss under ONE custom VJP.
#
# Chaining the two public custom_vjp ops forces the d_rows cotangent across
# an AD boundary whose dtype must match the primal rows (f32) — 1.7 GB/step
# written by this kernel and read back by the raster backward.  Owning the
# whole backward here lets that intermediate live in bf16 (DD_DROWS_BF16,
# default on; numerics: one rounding of the per-pixel cotangents to 8
# mantissa bits before the f32 indicator-dot accumulation).  With
# DD_DROWS_BF16=0 this path is bit-identical to the chained ops (same
# kernels, same inputs — asserted in tests/test_fused_loss.py).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def raster_loss_compact(
    bins_c: Array,
    tile_counts: Array,
    off_c: Array,
    used: Array,
    gt6: Array,
    resolution: Tuple[int, int],
    tile_hw: Tuple[int, int],
    ncmax: int,
    n_attr: int,
    interpret: bool = False,
    roi: Optional[Tuple[int, int, int, int]] = None,
    d_rows_bf16: bool = True,
) -> Array:
    """(B, 3) loss sums from the compact bin table in one differentiable
    op (rgb+mask path: no dplane/colors — the depth/texture variants keep
    the chained ops).  Differentiable w.r.t. bins_c; gt6's cotangent is
    zero by design (see fused_loss_sums).

    roi=(oy, ox, fh, fw): `resolution` is a tile-aligned crop of the
    (fh, fw) frame at origin (oy, ox); tile_counts/off_c/used and gt6 must
    be pre-sliced to the crop (pipeline.make_fused_loss).  Per-pixel math
    is bit-identical to the full frame; the loss sums match exactly as
    long as no triangle renders within 2 px of a crop edge (guarded by the
    `_crop_leak` telemetry).

    d_rows_bf16 selects the dtype of the d_rows cotangent crossing the
    backward kernels (the op's one HBM-boundary rounding; see the module
    comment above).  It is a TRACE-TIME choice baked into the compiled
    program — callers resolve it once at build time
    (pipeline.make_fused_loss reads DD_DROWS_BF16 there)."""
    sums, _ = _rlc_fwd(
        bins_c, tile_counts, off_c, used, gt6, resolution, tile_hw, ncmax,
        n_attr, interpret, roi, d_rows_bf16,
    )
    return sums


def _rlc_fwd(bins_c, tile_counts, off_c, used, gt6, resolution, tile_hw,
             ncmax, n_attr, interpret, roi=None, d_rows_bf16=True):
    from diffdope_tpu.render.raster_v2 import _fwd_from_bins_compact

    ids_cm, idpix, rows, bounds = _fwd_from_bins_compact(
        bins_c, tile_counts, off_c, used, resolution, tile_hw, ncmax,
        interpret, roi=roi,
    )
    sums, _ = _fwd(rows, idpix, gt6, None, None, resolution, n_attr,
                   interpret, roi)
    tot = bins_c.shape[2]
    tids = jnp.broadcast_to(bins_c[0:1, 13:14, :], (1, 8, tot))
    res = (rows, idpix, gt6, tids, tile_counts, off_c, used, ids_cm, bounds)
    return sums, res


def _rlc_bwd(resolution, tile_hw, ncmax, n_attr, interpret, roi,
             d_rows_bf16, res, d_sums):
    from diffdope_tpu.render.raster_v2 import _compact_dbins

    (rows, idpix, gt6, tids, tile_counts, off_c, used, ids_cm,
     bounds) = res
    d_dtype = jnp.bfloat16 if d_rows_bf16 else jnp.float32
    d_rows, _, _ = backward_pass(
        rows, idpix, gt6, None, None, resolution, n_attr, interpret,
        d_sums, d_rows_dtype=d_dtype, roi=roi,
    )
    d_bins = _compact_dbins(
        d_rows, ids_cm, tids, tile_counts, off_c, used, bounds,
        resolution, tile_hw, interpret, padded=True, roi=roi,
    )

    def zero_i(shape):
        return np.zeros(shape, jax.dtypes.float0)

    return (
        d_bins,
        zero_i(tile_counts.shape),
        zero_i(off_c.shape),
        zero_i(used.shape),
        jnp.zeros_like(gt6),
    )


raster_loss_compact.defvjp(_rlc_fwd, _rlc_bwd)
