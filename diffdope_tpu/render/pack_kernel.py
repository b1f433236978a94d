"""Fused Pallas pack kernel: bin-ordered table build in one VMEM pass.

Replaces the XLA lowering of :func:`planar.pack_binned` +
:func:`planar.packed_planar` on the production compact path.  The XLA
version builds each of the ~28 lanes as a separate (B, 1, ntK) fusion in
a T(1,128) layout (1/8 sublane utilization) and then concatenates them
into the (B, 32, ntK) table — measured ~3.5 ms/step of glue at bench
scale (B=64, ntK=25856), plus ~1 ms/step on the backward's slice/reduce
chain and a d_packed relayout copy.  Here the whole multilinear packing
chain — corner clip transform, cross products, det, depth planes,
attribute planes, NDC bounds — runs inside one kernel on (BB, CB)
tiles and writes the table once, and the custom backward reduces the
d_packed cotangent straight to d_mvp / d_mtx (the pose path) in a second
kernel, so no intermediate lane arrays exist in HBM at all.

Semantics match planar.pack_binned exactly (same lane order, same
degenerate/sentinel handling, same stop-gradient control lanes); parity
is asserted lane-by-lane in tests/test_pack_kernel.py.  Gradient support
covers the pose path (mvp, mtx); callers with traced per-corner
attributes or traced vertices (appearance / vertex optimization) fall
back to the XLA path — see pipeline.py.

Reference context: the CUDA reference has no analogue (nvdiffrast builds
no bin tables; reference diffdope.py:198-228 calls dr.rasterize
directly); this kernel exists purely for the TPU binned-raster design.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffdope_tpu.render.shade import PACKED_WIDTH

Array = jax.Array

_EPS = 1e-9
_Y_OPEN = 4.0  # planar._Y_OPEN


def _pick_bb(b: int) -> int:
    for bb in (8, 4, 2):
        if b % bb == 0:
            return bb
    return 1


def _pick_cb(ntk: int) -> int:
    if ntk >= 2048:
        return 2048  # non-divisible tails handled by dropped writes (fwd)
        # and the explicit column mask (bwd)
    return -(-ntk // 128) * 128


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_pack_kernel(
    mvpm_ref,  # scalar prefetch: (B, 20) f32 [mvp rows r-major 0-15, mtx row2 16-18]
    tab_ref,   # (R, CB) static gathered rows
    sil_ref,   # (BB, CB) silhouette bits (f32)
    out_ref,   # (BB, PACKED_WIDTH, CB)
    *, n_ch: int, bb: int,
):
    bi = pl.program_id(0)

    def row(r):
        return tab_ref[r : r + 1, :]  # (1, CB)

    pk = [[row(3 * k + c) for c in range(3)] for k in range(3)]
    att_row = 9
    flat_row = 9 + 3 * n_ch
    degen_row = flat_row + 1

    tri_f = row(flat_row)
    degen = row(degen_row)
    keep = 1.0 - degen

    for s in range(bb):
        b = bi * bb + s

        def coord(r):
            # clip coords per corner: (1, CB) each
            m0 = mvpm_ref[b, 4 * r + 0]
            m1 = mvpm_ref[b, 4 * r + 1]
            m2 = mvpm_ref[b, 4 * r + 2]
            m3 = mvpm_ref[b, 4 * r + 3]
            return [
                m0 * pk[k][0] + m1 * pk[k][1] + m2 * pk[k][2] + m3
                for k in range(3)
            ]

        x, y, z, w = coord(0), coord(1), coord(2), coord(3)
        r0 = mvpm_ref[b, 16]
        r1 = mvpm_ref[b, 17]
        r2 = mvpm_ref[b, 18]
        zr = [r0 * pk[k][0] + r1 * pk[k][1] + r2 * pk[k][2] for k in range(3)]

        def cross(j, k):
            return (
                y[j] * w[k] - w[j] * y[k],
                w[j] * x[k] - x[j] * w[k],
                x[j] * y[k] - y[j] * x[k],
            )

        c0r = cross(1, 2)
        c1r = cross(2, 0)
        c2r = cross(0, 1)
        det = (c0r[0] * x[0] + c0r[1] * y[0] + c0r[2] * w[0]) * keep
        c0 = tuple(c * keep for c in c0r)
        c1 = tuple(c * keep for c in c1r)
        c2 = tuple(c * keep for c in c2r)
        zc = [z[0] * c0[i] + z[1] * c1[i] + z[2] * c2[i] for i in range(3)]

        lanes = [
            c0[0], c0[1], c0[2],
            c1[0], c1[1], c1[2],
            c2[0], c2[1], c2[2],
            zc[0], zc[1], zc[2],
            det, tri_f, sil_ref[s : s + 1, :], jnp.zeros_like(det),
        ]
        for c in range(n_ch):
            a = [row(att_row + k * n_ch + c) for k in range(3)]
            for i in range(3):
                lanes.append(a[0] * c0[i] + a[1] * c1[i] + a[2] * c2[i])
        for i in range(3):
            lanes.append(zr[0] * c0[i] + zr[1] * c1[i] + zr[2] * c2[i])
        while len(lanes) < PACKED_WIDTH - 4:
            lanes.append(jnp.zeros_like(det))

        # conservative NDC bounds (control lanes; stop-grad by construction)
        def bounds(v):
            vn = [
                v[k] / jnp.where(jnp.abs(w[k]) > _EPS, w[k], _EPS)
                for k in range(3)
            ]
            bc = (w[0] <= _EPS) | (w[1] <= _EPS) | (w[2] <= _EPS)
            lo = jnp.minimum(jnp.minimum(vn[0], vn[1]), vn[2])
            hi = jnp.maximum(jnp.maximum(vn[0], vn[1]), vn[2])
            lo = jnp.where(bc, -_Y_OPEN, lo)
            hi = jnp.where(bc, _Y_OPEN, hi)
            dg = degen > 0.5
            return (
                jnp.where(dg, _Y_OPEN, lo), jnp.where(dg, -_Y_OPEN, hi)
            )

        xlo, xhi = bounds(x)
        ylo, yhi = bounds(y)
        lanes.extend([xlo, xhi, ylo, yhi])
        out_ref[s] = jnp.concatenate(lanes, axis=0)  # (32, CB)


# ---------------------------------------------------------------------------
# backward kernel: d_packed -> d_mvp rows + d_mtx row2 (pose path)
# ---------------------------------------------------------------------------


def _bwd_pack_kernel(
    mvpm_ref,   # (BB, 20) VMEM block of per-hypothesis mvp/mtx rows
    tab_ref,    # (R, CB)
    g_ref,      # (BB, PACKED_WIDTH, CB) cotangent
    dout_ref,   # (BB, 24) accumulated [d_mvp 16, d_mtx2 16-18, pad]
    *, n_ch: int, bb: int, cb: int, ntk: int,
):
    ji = pl.program_id(1)

    # mask tail columns of a non-divisible final block: their tab/g reads
    # are out-of-bounds garbage (possibly NaN — a bare multiplicative mask
    # would keep NaN) and must not reach the reductions.  All value arrays
    # are (BB, CB): hypotheses on sublanes, bin slots on lanes.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, cb), 1) + ji * cb
    valid = col < ntk
    lane24 = jax.lax.broadcasted_iota(jnp.int32, (1, 24), 1)

    def row(r):
        return jnp.where(valid, tab_ref[r : r + 1, :], 0.0)  # (1, CB)

    def m(k):
        return mvpm_ref[:, k : k + 1]  # (BB, 1)

    pk = [[row(3 * k + c) for c in range(3)] for k in range(3)]
    att_row = 9
    degen_row = 9 + 3 * n_ch + 1
    keep = 1.0 - row(degen_row)

    @pl.when(ji == 0)
    def _init():
        dout_ref[...] = jnp.zeros_like(dout_ref)

    def coord(r):
        return [
            m(4 * r + 0) * pk[k][0] + m(4 * r + 1) * pk[k][1]
            + m(4 * r + 2) * pk[k][2] + m(4 * r + 3)
            for k in range(3)
        ]

    x, y, z, w = coord(0), coord(1), coord(2), coord(3)

    def cross(j, k):
        return (
            y[j] * w[k] - w[j] * y[k],
            w[j] * x[k] - x[j] * w[k],
            x[j] * y[k] - y[j] * x[k],
        )

    c0r = cross(1, 2)
    c1r = cross(2, 0)
    c2r = cross(0, 1)
    cm = (
        tuple(c * keep for c in c0r),
        tuple(c * keep for c in c1r),
        tuple(c * keep for c in c2r),
    )

    def g(lane):
        return jnp.where(valid, g_ref[:, lane, :], 0.0)  # (BB, CB)

    # adjoints of the masked cross planes C_mi: direct lanes 0-8,
    # zc lanes 9-11, attr lanes, zrot lanes
    g_zc = [g(9 + i) for i in range(3)]
    zr_base = 16 + 3 * n_ch
    g_zr = [g(zr_base + i) for i in range(3)]
    zr = [
        m(16) * pk[k][0] + m(17) * pk[k][1] + m(18) * pk[k][2]
        for k in range(3)
    ]

    dC = []
    for mi in range(3):
        drow = []
        for i in range(3):
            d = g(3 * mi + i) + z[mi] * g_zc[i] + zr[mi] * g_zr[i]
            for c in range(n_ch):
                a_mc = row(att_row + mi * n_ch + c)
                d = d + a_mc * g(16 + 3 * c + i)
            drow.append(d)
        dC.append(drow)
    d_z = [
        cm[mi][0] * g_zc[0] + cm[mi][1] * g_zc[1] + cm[mi][2] * g_zc[2]
        for mi in range(3)
    ]
    d_zr = [
        cm[mi][0] * g_zr[0] + cm[mi][1] * g_zr[1] + cm[mi][2] * g_zr[2]
        for mi in range(3)
    ]

    # det: lane 12.  det = keep * (c0r . (x0, y0, w0))
    g_det = g(12) * keep
    zero = jnp.zeros_like(g_det)
    d_x = [c0r[0] * g_det, zero, zero]
    d_y = [c0r[1] * g_det, zero, zero]
    d_w = [c0r[2] * g_det, zero, zero]

    # raw cross adjoints: d_cmr = keep * dC_m, plus det -> c0r direct
    dcr = [[keep * dC[mi][i] for i in range(3)] for mi in range(3)]
    dcr[0][0] = dcr[0][0] + x[0] * g_det
    dcr[0][1] = dcr[0][1] + y[0] * g_det
    dcr[0][2] = dcr[0][2] + w[0] * g_det

    for mi, (j, k) in enumerate(((1, 2), (2, 0), (0, 1))):
        dX, dY, dZ = dcr[mi]
        # cmX = y_j w_k - w_j y_k
        d_y[j] = d_y[j] + w[k] * dX
        d_w[k] = d_w[k] + y[j] * dX
        d_w[j] = d_w[j] - y[k] * dX
        d_y[k] = d_y[k] - w[j] * dX
        # cmY = w_j x_k - x_j w_k
        d_w[j] = d_w[j] + x[k] * dY
        d_x[k] = d_x[k] + w[j] * dY
        d_x[j] = d_x[j] - w[k] * dY
        d_w[k] = d_w[k] - x[j] * dY
        # cmZ = x_j y_k - y_j x_k
        d_x[j] = d_x[j] + y[k] * dZ
        d_y[k] = d_y[k] + x[j] * dZ
        d_y[j] = d_y[j] - x[k] * dZ
        d_x[k] = d_x[k] - y[j] * dZ

    # reduce to mvp rows: d_M[r, c] = sum_t sum_k d_coord_r[k] pk[k][c];
    # lane reductions give (BB, 1) columns, placed via iota-select
    row_adj = (d_x, d_y, d_z, d_w)
    out = jnp.zeros((bb, 24), jnp.float32)
    idx = 0
    for r in range(4):
        dk = row_adj[r]
        for c in range(3):
            v = jnp.sum(
                dk[0] * pk[0][c] + dk[1] * pk[1][c] + dk[2] * pk[2][c],
                axis=1, keepdims=True,
            )
            out = out + v * (lane24 == idx)
            idx += 1
        v = jnp.sum(dk[0] + dk[1] + dk[2], axis=1, keepdims=True)
        out = out + v * (lane24 == idx)
        idx += 1
    for c in range(3):
        v = jnp.sum(
            d_zr[0] * pk[0][c] + d_zr[1] * pk[1][c] + d_zr[2] * pk[2][c],
            axis=1, keepdims=True,
        )
        out = out + v * (lane24 == idx)
        idx += 1

    dout_ref[...] += out


# ---------------------------------------------------------------------------
# host-side wrapper with custom VJP
# ---------------------------------------------------------------------------


def _static_table(pos_c, corner_attrs, degenerate, flat, t_count):
    """One-gather static row table (R+2, ntK): 9 pos rows, 3*n_ch attr
    rows, tri-index row (unclamped), degenerate row (mesh padding OR
    sentinel slot).  Mirrors pack_binned's static_rows layout."""
    from diffdope_tpu.render.planar import static_pack_rows

    safe = jnp.minimum(flat, t_count - 1)
    pc = pos_c[0] if pos_c.ndim == 3 else pos_c
    rows, n_ch = static_pack_rows(pc, corner_attrs, degenerate)
    tab = jnp.take(jnp.stack(rows, axis=0), safe, axis=1)
    tri_f = flat.astype(jnp.float32)[None, :]
    degen_f = flat >= t_count
    if degenerate is not None:
        degen_f = degen_f | (tab[9 + 3 * n_ch, :] > 0.5)
        tab = tab[: 9 + 3 * n_ch]
    degen_f = degen_f.astype(jnp.float32)[None, :]
    return (
        jnp.concatenate([tab.astype(jnp.float32), tri_f, degen_f], axis=0),
        n_ch,
    )


def _mvpm(mvp, mtx):
    b = mvp.shape[0]
    return jnp.concatenate(
        [
            mvp.reshape(b, 16),
            mtx[:, 2, :3],
            jnp.zeros((b, 1), mvp.dtype),
        ],
        axis=1,
    ).astype(jnp.float32)


def _run_fwd(mvpm, tab, sil, n_ch, interpret):
    b, ntk = sil.shape
    bb = _pick_bb(b)
    cb = _pick_cb(ntk)
    grid = (b // bb, -(-ntk // cb))
    return pl.pallas_call(
        functools.partial(_fwd_pack_kernel, n_ch=n_ch, bb=bb),
        out_shape=jax.ShapeDtypeStruct((b, PACKED_WIDTH, ntk), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (tab.shape[0], cb), lambda bi, ji, *_: (0, ji),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bb, cb), lambda bi, ji, *_: (bi, ji),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (bb, PACKED_WIDTH, cb), lambda bi, ji, *_: (bi, 0, ji),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=interpret,
    )(mvpm, tab, sil)


def _run_bwd(mvpm, tab, g, n_ch, interpret):
    b, _, ntk = g.shape
    bb = _pick_bb(b)
    cb = _pick_cb(ntk)
    grid = (b // bb, -(-ntk // cb))
    return pl.pallas_call(
        functools.partial(
            _bwd_pack_kernel, n_ch=n_ch, bb=bb, cb=cb, ntk=ntk
        ),
        out_shape=jax.ShapeDtypeStruct((b, 24), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (bb, 20), lambda bi, ji: (bi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tab.shape[0], cb), lambda bi, ji: (0, ji),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bb, PACKED_WIDTH, cb), lambda bi, ji: (bi, 0, ji),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bb, 24), lambda bi, ji: (bi, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(mvpm, tab, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def pack_binned_pallas(
    mvp: Array,
    mtx: Array,
    tab: Array,
    sil_b: Array,
    n_ch: int,
    interpret: bool = False,
) -> Array:
    """Pallas pack: (B, 32, ntK) bin-ordered table from the static gathered
    row table.  Differentiable w.r.t. mvp / mtx only (the pose path);
    tab / sil_b are treated as constants (callers with traced attrs or
    vertices use planar.pack_binned instead)."""
    return _run_fwd(_mvpm(mvp, mtx), tab, sil_b, n_ch, interpret)


def _pack_vjp_fwd(mvp, mtx, tab, sil_b, n_ch, interpret):
    out = _run_fwd(_mvpm(mvp, mtx), tab, sil_b, n_ch, interpret)
    return out, (mvp, mtx, tab, sil_b)


def _pack_vjp_bwd(n_ch, interpret, res, g):
    mvp, mtx, tab, sil_b = res
    d = _run_bwd(_mvpm(mvp, mtx), tab, g, n_ch, interpret)
    d_mvp = d[:, :16].reshape(mvp.shape[0], 4, 4).astype(mvp.dtype)
    d_mtx = (
        jnp.zeros_like(mtx)
        .at[:, 2, :3]
        .set(d[:, 16:19].astype(mtx.dtype))
    )
    return (d_mvp, d_mtx, jnp.zeros_like(tab), jnp.zeros_like(sil_b))


pack_binned_pallas.defvjp(_pack_vjp_fwd, _pack_vjp_bwd)


def pack_binned_auto(
    pos_c: Array,
    mvp: Array,
    mtx: Array,
    flat: Array,
    corner_attrs: Optional[Array],
    sil: Array,
    degenerate: Optional[Array],
    t_count: int,
    interpret: bool = False,
) -> Optional[Array]:
    """pack_binned drop-in on the fused Pallas kernel, or None when the
    configuration needs the XLA path (traced per-batch vertices or traced
    per-batch attrs).  `flat` is the slot->triangle map: the 1-D compact
    map or the (num_tiles, K) uniform bin index (flattened here exactly as
    pack_binned does).  Both binned variants MUST share one pack
    implementation: they are bit-equality-tested against each other, and
    a mixed XLA/Pallas pack differs by ~1 ulp of fp reassociation, enough
    to flip z-test winners on silhouette pixels."""
    if flat.ndim != 1:
        flat = flat.reshape(-1)
    if pos_c.ndim == 3 and pos_c.shape[0] != 1:
        return None  # per-batch traced vertices
    if isinstance(pos_c, jax.core.Tracer):
        return None  # vertices are being differentiated / traced as inputs
    if corner_attrs is not None and (
        isinstance(corner_attrs, (list, tuple))
        or corner_attrs.ndim != 3
        or isinstance(corner_attrs, jax.core.Tracer)
    ):
        # traced attrs (appearance optimization): this kernel's VJP only
        # covers the pose path (d_mvp/d_mtx) and would silently return
        # zero attr gradients — keep the XLA pack, whose einsum backward
        # propagates d_attr (caught by test_pack_kernel / code review r4)
        return None
    tab, n_ch = _static_table(pos_c, corner_attrs, degenerate, flat, t_count)
    sil_b = jnp.take(sil, jnp.minimum(flat, t_count - 1), axis=1).astype(
        jnp.float32
    )
    return pack_binned_pallas(mvp, mtx, tab, sil_b, n_ch, interpret)
