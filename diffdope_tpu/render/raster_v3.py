"""Sorted-range raster kernel (v3): tile bins as slices of one sorted table.

v2 materializes an explicit per-tile bin LIST — a (B, 32, num_tiles*K)
gather of the packed table — plus its inverse map for the backward.  At
bench scale that costs ~30 ms/step of gathers, relayout copies and
sort/searchsorted machinery around the kernels, and caps bins at K with
overflow handling.  v3 removes the lists entirely:

* triangles are sorted ONCE per step by (pixel-row band, x_min) — a single
  argsort of T keys.  A tile's candidates are then a CONTIGUOUS RANGE of
  the sorted table: every triangle overlapping the tile's rows lies in
  [lo_ty, hi_ty) (hi bounded via the band key, lo via the first triangle
  whose y_max reaches the tile top);
* the kernel receives the whole sorted packed table as one VMEM-resident
  block per batch element (1.7 MB — fetched once per b, constant block
  index) and walks the tile's chunk range with dynamic 128-aligned lane
  slices.  No gather, no K cap, no overflow;
* per-chunk scalar tables (pixel row range, x range) gate work: the x test
  skips whole chunks (the (band, x) sort makes chunks x-local), the row
  range drives the same quad-row loops as v2;
* the backward accumulates d_packed DIRECTLY into a (1, 32, T) output
  block that stays resident in VMEM across a batch element's tile
  iterations (same-block revisiting) — the inverted-bin map, its argsort/
  searchsorted, the d_bin round trip and the (T, M) gather all disappear.

The sort permutation is applied to the packed table in XLA (a (B, 32, T)
take — ~100 MB, vs ~850 MB of v2 bin gathers) and the backward unpermutes
d_packed with the inverse permutation.  Output semantics are identical to
v2/the dense reference: exact per-pixel coverage tests, smallest-id
z-tie-break.

STATUS — measured at bench scale (B=64, 400x400, AlphabetSoup) and NOT the
default (DD_RASTER=v3 opts in): the global (row-band, x_min) sort cannot
match per-tile bins' work tightness — a sorted chunk straddling tile
boundaries is re-evaluated whole by every overlapping tile (~2.3x the
gated rows: 2300 vs 980 at bench scale, simulated and confirmed on-chip:
17.6s vs 12.3s/refinement end to end) — and the ~30 ms/step of gathers it
eliminates does not pay for that at this triangle density.  Kept as the
simpler, cap-free fallback and for scenes where bin overflow or the
inverted-map width would otherwise bite (T >> tiles, huge meshes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffdope_tpu.render.shade import PACKED_WIDTH
from diffdope_tpu.render.planar import XLO_LANE, XHI_LANE, YLO_LANE, YHI_LANE
from diffdope_tpu.render.raster_v2 import (
    _one_hot_dot,
    _pick_chunk,
    _pick_qrows,
    _untangle_ids,
)

Array = jax.Array

_BIG = 1e9
_INF = jnp.inf
def _band_px() -> int:
    """Sort-key row band height (pixels).  Smaller bands give tighter
    per-chunk row intervals (less evaluated work) but coarser x locality
    within a band; 4 measured best at bench scale (DD_BAND_PX to tune)."""
    import os

    return int(os.environ.get("DD_BAND_PX", "4"))


def _prepare(packed: Array, resolution, tile_hw, k_chunk, t_pad):
    """Sort + gating tables (pure XLA, all stop-gradient control data).

    Returns (order, rank, clo (nty,), chi (nty,), rlo_tc, rhi_tc) with
    rlo_tc/rhi_tc (num_tiles, nc) int32 ABSOLUTE pixel-row bounds per
    (tile, chunk): chunks that do not overlap the tile's x range get an
    empty interval, so the kernel's quad loops run zero trips for them —
    work gating without any per-chunk branch (a lax.cond carrying the
    (tw, th) z/id state measured 2.7x slower than empty-range skipping).
    """
    h, w = resolution
    th, tw = tile_hw
    nty, ntx = -(-h // th), -(-w // tw)
    b, width, t_count = packed.shape

    def px_bounds(lo_lane, hi_lane, extent):
        lo_n = jnp.min(packed[:, lo_lane, :], axis=0)  # union over batch
        hi_n = jnp.max(packed[:, hi_lane, :], axis=0)
        lo = jnp.ceil((lo_n + 1.0) * (extent / 2.0) - 1.0)
        hi = jnp.floor((hi_n + 1.0) * (extent / 2.0))
        lo = jnp.clip(lo, -1, extent).astype(jnp.int32)
        hi = jnp.clip(hi, -1, extent).astype(jnp.int32)
        return lo, hi

    rlo_t, rhi_t = px_bounds(YLO_LANE, YHI_LANE, h)  # (T,) pixel rows
    xlo_t, xhi_t = px_bounds(XLO_LANE, XHI_LANE, w)

    # empty intervals (degenerate padding: lo > hi) sort last and never
    # enter any tile range; behind-camera (open) intervals sort first
    band_px = _band_px()
    empty = rlo_t > rhi_t
    band = jnp.clip(rlo_t // band_px, 0, (h // band_px) + 1)
    key = band * (w + 4) + jnp.clip(xlo_t, -1, w + 1) + 1
    key = jnp.where(empty, jnp.int32(2**30), key)
    order = jnp.argsort(key)
    rank = jnp.argsort(order)

    def padded(a, fill):
        return jnp.pad(a, (0, t_pad - t_count), constant_values=fill)

    rlo_s = padded(rlo_t[order], h)
    rhi_s = padded(rhi_t[order], -1)
    xlo_s = padded(xlo_t[order], w)
    xhi_s = padded(xhi_t[order], -1)
    band_s = padded(jnp.where(empty, jnp.int32(2**30), band)[order], 2**30)

    nc = t_pad // k_chunk
    cs = lambda a, red: red(a.reshape(nc, k_chunk), axis=1)
    rlo_c = cs(rlo_s, jnp.min)
    rhi_c = cs(jnp.where(rlo_s > rhi_s, -1, rhi_s), jnp.max)
    xlo_c = cs(xlo_s, jnp.min)
    xhi_c = cs(jnp.where(xlo_s > xhi_s, -1, xhi_s), jnp.max)

    # per tile row ty: candidates are [lo_ty, hi_ty) of the sorted order.
    # hi: triangles with rlo <= tile_bottom have band <= bottom//BAND_PX,
    # and band_s is ascending -> searchsorted.  lo: first index whose
    # rhi reaches the tile top (exact: anything before it cannot cover).
    ty = jnp.arange(nty, dtype=jnp.int32)
    bottom_band = ((ty + 1) * th - 1) // band_px
    hi_ty = jnp.searchsorted(band_s, bottom_band, side="right")
    reach = rhi_s[None, :] >= (ty[:, None] * th)  # (nty, T)
    any_reach = jnp.any(reach, axis=1)
    lo_ty = jnp.where(
        any_reach,
        jnp.argmax(reach, axis=1),
        hi_ty,
    )
    lo_ty = jnp.minimum(lo_ty, hi_ty)
    clo = (lo_ty // k_chunk).astype(jnp.int32)
    chi = (-(-hi_ty // k_chunk)).astype(jnp.int32)

    # (num_tiles, nc) per-(tile, chunk) row interval; empty when the
    # chunk's x range misses the tile
    tx = jnp.arange(ntx, dtype=jnp.int32)
    x_over = (
        (xlo_c[None, :] <= (tx[:, None] + 1) * tw - 1)
        & (xhi_c[None, :] >= tx[:, None] * tw)
    )  # (ntx, nc)
    x_over = jnp.tile(x_over, (nty, 1))  # tiles are ty-major: t = ty*ntx+tx
    rlo_tc = jnp.where(x_over, rlo_c[None, :], h)
    rhi_tc = jnp.where(x_over, rhi_c[None, :], -1)
    return order, rank, clo, chi, rlo_tc, rhi_tc


def _fwd_kernel_v3(
    clo_ref, chi_ref, rlo_ref, rhi_ref,
    packed_ref, ids_ref, rows_ref,
    *, th, tw, ntx, h, w, k_chunk, q_rows,
):
    """Forward: z-test + one-hot row gather over the tile's sorted range.

    Same math as raster_v2._fwd_kernel_v2 (quad rows, carried (tw, th)
    state, smallest-id tie-break), but chunks come from dynamic 128-aligned
    slices of the resident sorted table.  Gating is branch-free: the
    per-(tile, chunk) row interval (rlo_ref/rhi_ref) is empty both for
    chunks outside the tile's rows and for chunks whose x range misses the
    tile, so their quad loops run zero trips.

    packed_ref: VMEM (1, 32, T) — whole sorted table, block index constant
    in the tile dimension, so it is fetched once per batch element.
    """
    t = pl.program_id(1)
    ty = t // ntx
    tx = t % ntx
    x0 = tx * tw
    y0 = ty * th
    q = q_rows

    iq = jax.lax.broadcasted_iota(jnp.int32, (q * tw, 1), 0)
    jrow_i = iq // tw
    xcol_i = (iq % tw) + x0
    xq = (2.0 * xcol_i.astype(jnp.float32) + 1.0) / w - 1.0
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, th), 1)

    c_lo = clo_ref[ty]
    c_hi = chi_ref[ty]

    def quad_range(ci):
        r_lo = jnp.clip(rlo_ref[t, ci] - y0, 0, th)
        r_hi = jnp.clip(rhi_ref[t, ci] - y0 + 1, 0, th)
        return r_lo // q, (r_hi + q - 1) // q

    def col_get(mat, r):
        return jnp.sum(
            jnp.where(col_iota == r, mat, 0.0), axis=1, keepdims=True
        )

    def chunk_a(ci, carry):
        base = pl.multiple_of(ci * k_chunk, 128)
        c32 = packed_ref[0, :, pl.ds(base, k_chunk)]  # (32, kc)

        def lane(j):
            return c32[j:j + 1, :]

        det = lane(12)
        ids_f = lane(13)
        sgn = jnp.sign(det)
        a0, b0, c0 = lane(0) * sgn, lane(1) * sgn, lane(2) * sgn
        a1, b1, c1 = lane(3) * sgn, lane(4) * sgn, lane(5) * sgn
        a2, b2, c2 = lane(6) * sgn, lane(7) * sgn, lane(8) * sgn
        az, bz, cz = lane(9), lane(10), lane(11)
        inv_det = 1.0 / jnp.where(det != 0.0, det, 1.0)
        slot_ok = det != 0.0  # padding triangles have det == 0
        q_lo, q_hi = quad_range(ci)

        def quad_body(qi, carry2):
            zb_mat, ib_mat = carry2
            r0 = qi * q
            rows_i = jrow_i + (y0 + r0)
            yq = (2.0 * rows_i.astype(jnp.float32) + 1.0) / h - 1.0
            e0 = xq * a0 + (yq * b0 + c0)
            e1 = xq * a1 + (yq * b1 + c1)
            e2 = xq * a2 + (yq * b2 + c2)
            zlin = xq * az + (yq * bz + cz)
            covered = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
            z = zlin * inv_det
            ok = covered & (z >= -1.0) & (z <= 1.0) & slot_ok
            zm = jnp.where(ok, z, _INF)
            z_c = jnp.min(zm, axis=1, keepdims=True)
            id_c = jnp.min(
                jnp.where(zm == z_c, ids_f, _BIG), axis=1, keepdims=True
            )
            for j in range(q):
                zcj = z_c[j * tw : (j + 1) * tw]
                icj = id_c[j * tw : (j + 1) * tw]
                r = r0 + j
                zb_col = col_get(zb_mat, r)
                ib_col = col_get(ib_mat, r)
                better = zcj < zb_col
                same = (zcj == zb_col) & (zcj < _INF)
                new_z = jnp.where(better, zcj, zb_col)
                new_i = jnp.where(
                    better, icj,
                    jnp.where(same, jnp.minimum(icj, ib_col), ib_col),
                )
                sel = col_iota == r
                zb_mat = jnp.where(sel, new_z, zb_mat)
                ib_mat = jnp.where(sel, new_i, ib_mat)
            return zb_mat, ib_mat

        return jax.lax.fori_loop(q_lo, q_hi, quad_body, carry)

    zb_mat, ib_mat = jax.lax.fori_loop(
        c_lo, c_hi, chunk_a,
        (jnp.full((tw, th), _INF, jnp.float32),
         jnp.full((tw, th), _BIG, jnp.float32)),
    )

    rows_ref[0] = jnp.zeros((PACKED_WIDTH, th, tw), jnp.float32)

    def chunk_c(ci, _):
        base = pl.multiple_of(ci * k_chunk, 128)
        c32 = packed_ref[0, :, pl.ds(base, k_chunk)]
        ids_f = c32[13:14, :]
        slot_ok = c32[12:13, :] != 0.0
        q_lo, q_hi = quad_range(ci)

        def quad_body(qi, _):
            r0 = qi * q
            ib4 = jnp.concatenate(
                [col_get(ib_mat, r0 + j) for j in range(q)], axis=0
            )
            indicator = ((ids_f == ib4) & slot_ok).astype(jnp.float32)
            contrib = _one_hot_dot(
                c32, indicator, (((1,), (1,)), ((), ()))
            )  # (32, q*tw)
            for j in range(q):
                rows_ref[0, :, r0 + j, :] = (
                    rows_ref[0, :, r0 + j, :]
                    + contrib[:, j * tw : (j + 1) * tw]
                )
            return 0

        return jax.lax.fori_loop(q_lo, q_hi, quad_body, 0)

    jax.lax.fori_loop(c_lo, c_hi, chunk_c, 0)

    fg = ib_mat < _BIG
    ids_ref[0, 0] = jnp.where(fg, ib_mat.astype(jnp.int32) + 1, 0)


def _bwd_kernel_v3(
    clo_ref, chi_ref, rlo_ref, rhi_ref,
    packed_ref, idscm_ref, drows_ref, out_ref,
    *, th, tw, ntx, k_chunk, q_rows,
):
    """d_packed accumulated in place: the (1, 32, T) output block has a
    constant block index within a batch element, so it stays resident in
    VMEM across all of that element's tile iterations — each chunk's
    d contribution is += directly at its sorted-table slice.  No d_bin
    array, no inverted map.
    """
    t = pl.program_id(1)
    ty = t // ntx
    tx = t % ntx
    x0 = tx * tw
    y0 = ty * th
    q = q_rows

    @pl.when(t == 0)
    def _init():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], jnp.float32)

    ids_mat = idscm_ref[0, 0]  # (tw, th)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, th), 1)

    def ids_col(r):
        return jnp.sum(
            jnp.where(col_iota == r, ids_mat, 0), axis=1, keepdims=True
        )

    def chunk_body(ci, _):
        base = pl.multiple_of(ci * k_chunk, 128)
        ids_f = packed_ref[0, 13:14, pl.ds(base, k_chunk)]
        tri_id = ids_f.astype(jnp.int32) + 1
        slot_ok = packed_ref[0, 12:13, pl.ds(base, k_chunk)] != 0.0

        def quad_body(qi, acc):
            r0 = qi * q
            ids4 = jnp.concatenate(
                [ids_col(r0 + j) for j in range(q)], axis=0
            )
            indicator = ((ids4 == tri_id) & slot_ok).astype(jnp.float32)
            d4 = jnp.concatenate(
                [drows_ref[0, :, r0 + j, :] for j in range(q)], axis=1
            )
            return acc + _one_hot_dot(
                d4, indicator, (((1,), (0,)), ((), ()))
            )

        r_lo = jnp.clip(rlo_ref[t, ci] - y0, 0, th)
        r_hi = jnp.clip(rhi_ref[t, ci] - y0 + 1, 0, th)
        q_lo, q_hi = r_lo // q, (r_hi + q - 1) // q
        acc = jax.lax.fori_loop(
            q_lo, q_hi, quad_body,
            jnp.zeros((PACKED_WIDTH, k_chunk), jnp.float32),
        )

        # accumulate only when the interval was non-empty (the acc is zero
        # otherwise, but the RMW on the resident block is not free)
        @pl.when(q_lo < q_hi)
        def _add():
            out_ref[0, :, pl.ds(base, k_chunk)] = (
                out_ref[0, :, pl.ds(base, k_chunk)] + acc
            )

        return 0

    jax.lax.fori_loop(clo_ref[ty], chi_ref[ty], chunk_body, 0)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def raster_gather_rows_v3(
    packed: Array,
    resolution: Tuple[int, int],
    tile_hw: Tuple[int, int],
    interpret: bool = False,
    padded: bool = False,
) -> Tuple[Array, Array]:
    """Sorted-range rasterize + row gather (see module docstring).

    Args:
        packed: (B, 32, T) planar packed table with the x/y bound lanes
            (render/planar.py packed_planar).  T must be a multiple of 128.

    Returns:
        ids (B, H, W) int32 (0 = background), rows (B, 32, H, W) planar
        (padded=True: tile-rounded (Hp, Wp)).
    """
    ids_cm, rows, _ = _fwd_v3(packed, resolution, tile_hw, interpret)
    ids = _untangle_ids(ids_cm, resolution, padded, q=1, tw=tile_hw[1])
    if not padded:
        rows = rows[:, :, : resolution[0], : resolution[1]]
    ids = jax.ad_checkpoint.checkpoint_name(ids, "raster_ids")
    rows = jax.ad_checkpoint.checkpoint_name(rows, "raster_rows")
    return ids, rows


def _sizes(t_count):
    """(k_chunk, padded T): the sorted table is padded up to a chunk
    multiple (padding columns have det == 0 and empty gating intervals),
    so the chunk width is a free choice (DD_KCHUNK, default 256)."""
    import os

    cap = int(os.environ.get("DD_KCHUNK", "256"))
    k_chunk = cap if cap in (128, 256, 512, 1024) else 256
    t_pad = -(-t_count // k_chunk) * k_chunk
    return k_chunk, t_pad


def _fwd_v3(packed, resolution, tile_hw, interpret):
    b, width, t_count = packed.shape
    assert width == PACKED_WIDTH
    h, w = resolution
    th, tw = tile_hw
    nty, ntx = -(-h // th), -(-w // tw)
    num_tiles = nty * ntx
    k_chunk, t_pad = _sizes(t_count)

    tables = _prepare(packed, resolution, tile_hw, k_chunk, t_pad)
    order, rank, clo, chi, rlo_tc, rhi_tc = tables
    packed_s = jnp.take(packed, order, axis=2)
    if t_pad != t_count:
        packed_s = jnp.pad(packed_s, ((0, 0), (0, 0), (0, t_pad - t_count)))

    kernel = functools.partial(
        _fwd_kernel_v3, th=th, tw=tw, ntx=ntx, h=h, w=w, k_chunk=k_chunk,
        q_rows=_pick_qrows(th),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, PACKED_WIDTH, t_pad),
                lambda bi, ti, *_: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, tw, th),
                lambda bi, ti, *_: (bi, ti // ntx, ti % ntx, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, PACKED_WIDTH, th, tw),
                lambda bi, ti, *_: (bi, 0, ti // ntx, ti % ntx),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    ids_cm, rows = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, nty, ntx * tw, th), jnp.int32),
            jax.ShapeDtypeStruct(
                (b, PACKED_WIDTH, nty * th, ntx * tw), jnp.float32
            ),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(clo, chi, rlo_tc, rhi_tc, packed_s)
    return ids_cm, rows, tables


def _vjp_fwd_v3(packed, resolution, tile_hw, interpret=False, padded=False):
    ids_cm, rows, tables = _fwd_v3(packed, resolution, tile_hw, interpret)
    ids = _untangle_ids(ids_cm, resolution, padded, q=1, tw=tile_hw[1])
    rows_out = rows if padded else rows[:, :, : resolution[0], : resolution[1]]
    res = (packed, ids_cm, tables)
    return (ids, rows_out), res


def _vjp_bwd_v3(resolution, tile_hw, interpret, padded, res, cotangents):
    packed, ids_cm, tables = res
    order, rank, clo, chi, rlo_tc, rhi_tc = tables
    _, d_rows = cotangents
    b, width, t_count = packed.shape
    h, w = resolution
    th, tw = tile_hw
    nty, ntx = -(-h // th), -(-w // tw)
    num_tiles = nty * ntx
    k_chunk, t_pad = _sizes(t_count)

    if padded:
        d_rows_p = d_rows
    else:
        d_rows_p = jnp.pad(
            d_rows, ((0, 0), (0, 0), (0, nty * th - h), (0, ntx * tw - w))
        )
    packed_s = jnp.take(packed, order, axis=2)
    if t_pad != t_count:
        packed_s = jnp.pad(packed_s, ((0, 0), (0, 0), (0, t_pad - t_count)))

    kernel = functools.partial(
        _bwd_kernel_v3, th=th, tw=tw, ntx=ntx, k_chunk=k_chunk,
        q_rows=_pick_qrows(th),
    )
    bwd_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, PACKED_WIDTH, t_pad),
                lambda bi, ti, *_: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tw, th),
                lambda bi, ti, *_: (bi, ti // ntx, ti % ntx, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, PACKED_WIDTH, th, tw),
                lambda bi, ti, *_: (bi, 0, ti // ntx, ti % ntx),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, PACKED_WIDTH, t_pad),
            lambda bi, ti, *_: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    d_packed_s = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (b, PACKED_WIDTH, t_pad), jnp.float32
        ),
        grid_spec=bwd_grid,
        interpret=interpret,
    )(clo, chi, rlo_tc, rhi_tc, packed_s, ids_cm, d_rows_p)

    # unpermute back to the original triangle order
    d_packed = jnp.take(d_packed_s[:, :, :t_count], rank, axis=2)
    return (d_packed,)


raster_gather_rows_v3.defvjp(_vjp_fwd_v3, _vjp_bwd_v3)
