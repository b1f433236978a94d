"""Vectorized planar raster+gather kernel (v2).

The v1 kernel walks each tile's bin list with a scalar per-triangle loop:
~14 scalar VMEM loads + a short-vector update per triangle, measured ~15x
off the VPU bound (268 ms/step at bench scale).  v2 evaluates triangles
VECTORIZED — pixels on sublanes, triangles on lanes:

    per tile row r, per K-chunk:
      e_m(tw, kc) = X(tw,1) * a_m(1,kc) + (y_r * b_m(1,kc) + c_m(1,kc))
      z(tw, kc)   = zlin * inv_det
      zm          = where(covered & slot_ok, z, +inf)
    zbest(tw,1)   = min over lanes+chunks          (depth test)
    idbest(tw,1)  = min over lanes of ids where zm == zbest   (deterministic
                    smallest-id tie break)
    indicator(tw,kc) = (zm == zbest) & (id == idbest)          (exactly one)
    rows(32,tw)  += chunk32(32,kc) @ indicator^T                (MXU gather)

Everything is planar: the packed table is (B, 32, T), bins (B, nt, 32, K),
outputs ids (column-major (B, W, H), transposed once on host) and rows
(B, 32, H, W) — no small minor dims, zero lane padding anywhere.

The backward is the transposed indicator matmul per tile (d_bin(32, kc) =
d_rows(32, tw) @ indicator(tw, kc)) followed by the inverted-bin per-triangle
reduction — no scatter.
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

Array = jax.Array

_BIG = 1e9
_INF = jnp.inf


def _pick_chunk(k: int) -> int:
    """Largest chunk (multiple of 128, <= DD_KCHUNK cap) dividing K."""
    import os

    cap = int(os.environ.get("DD_KCHUNK", "1024"))
    for c in (1024, 512, 384, 256, 128):
        if c <= cap and c <= k and k % c == 0:
            return c
    return min(k, 128)


def _fwd_kernel_v2(
    counts_ref, bins_ref, ids_ref, rows_ref, zm_scratch,
    *, th, tw, ntx, h, w, k_chunk,
):
    """Vectorized forward: see module docstring.

    counts_ref: SMEM (num_tiles,) int32.
    bins_ref:   VMEM (1, 1, 32, K) planar bin rows (lane 13 = tri index).
    ids_ref:    VMEM (1, 1, tw, th) int32 out — column-major per tile
                (array (B, nty, Wp, th); untangled on the host).
    rows_ref:   VMEM (1, 32, th, tw) f32 out.
    zm_scratch: VMEM (tw, K) f32.
    """
    t = pl.program_id(1)
    count = counts_ref[t]
    k_max = bins_ref.shape[3]
    n_chunks = k_max // k_chunk
    used = jnp.minimum((count + k_chunk - 1) // k_chunk, n_chunks)

    # pixel coordinates: X varies along sublanes (tw), y is scalar per row
    # tpu.iota must be integer-typed; cast after
    xcol_i = jax.lax.broadcasted_iota(jnp.int32, (tw, 1), 0) + (t % ntx) * tw
    xcol = (2.0 * xcol_i.astype(jnp.float32) + 1.0) / w - 1.0  # (tw, 1)
    y0 = (t // ntx) * th

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, th), 1)

    def row_body(r, ids_mat):
        y_r = (2.0 * (y0 + r).astype(jnp.float32) + 1.0) / h - 1.0

        # ---- phase A: z-test over all chunks, zm cached in scratch; the
        # winning id is tracked in the same pass (smallest id among the
        # chunk's zmin holders; strict < across chunks keeps ties
        # deterministic toward the smaller chunk = smaller id, matching the
        # reference scan order)
        def chunk_a(ci, carry):
            zbest, idbest = carry
            base = pl.multiple_of(ci * k_chunk, 128)
            c32 = bins_ref[0, 0, :, pl.ds(base, k_chunk)]  # (32, kc)

            def lane(j):
                return c32[j:j + 1, :]  # (1, kc)

            e0 = xcol * lane(0) + (y_r * lane(1) + lane(2))
            e1 = xcol * lane(3) + (y_r * lane(4) + lane(5))
            e2 = xcol * lane(6) + (y_r * lane(7) + lane(8))
            zlin = xcol * lane(9) + (y_r * lane(10) + lane(11))
            det = lane(12)
            sgn = jnp.sign(det)
            # reciprocal once per triangle (1, kc) — a (tw, kc) divide costs
            # ~10x a multiply on the VPU
            inv_det = 1.0 / jnp.where(det != 0.0, det, 1.0)
            covered = (e0 * sgn >= 0) & (e1 * sgn >= 0) & (e2 * sgn >= 0) & (det != 0)
            z = zlin * inv_det
            slot = jax.lax.broadcasted_iota(jnp.int32, (1, k_chunk), 1) + base
            ok = covered & (z >= -1.0) & (z <= 1.0) & (slot < count)
            zm = jnp.where(ok, z, _INF)  # (tw, kc)
            zm_scratch[:, pl.ds(base, k_chunk)] = zm
            z_c = jnp.min(zm, axis=1, keepdims=True)  # (tw, 1)
            ids_f = c32[13:14, :]
            id_c = jnp.min(
                jnp.where(zm == z_c, ids_f, _BIG), axis=1, keepdims=True
            )
            better = z_c < zbest
            same = z_c == zbest
            return (
                jnp.where(better, z_c, zbest),
                jnp.where(
                    better, id_c,
                    jnp.where(same, jnp.minimum(id_c, idbest), idbest),
                ),
            )

        zbest, idbest = jax.lax.fori_loop(
            0, used, chunk_a,
            (jnp.full((tw, 1), _INF, jnp.float32),
             jnp.full((tw, 1), _BIG, jnp.float32)),
        )

        # ---- phase C: one-hot row gather on the MXU
        def chunk_c(ci, acc):
            base = pl.multiple_of(ci * k_chunk, 128)
            c32 = bins_ref[0, 0, :, pl.ds(base, k_chunk)]  # (32, kc)
            ids_f = c32[13:14, :]
            zm = zm_scratch[:, pl.ds(base, k_chunk)]
            indicator = ((zm == zbest) & (ids_f == idbest)).astype(jnp.float32)
            return acc + jax.lax.dot_general(
                c32, indicator, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (32, tw)

        acc = jax.lax.fori_loop(
            0, used, chunk_c, jnp.zeros((PACKED_WIDTH, tw), jnp.float32)
        )

        fgcol = zbest < _INF
        ids_col = jnp.where(fgcol, idbest.astype(jnp.int32) + 1, 0)  # (tw, 1)
        # single-lane-column writes are not lowerable; accumulate in regs
        ids_mat = jnp.where(col_iota == r, ids_col, ids_mat)  # (tw, th)
        rows_ref[0, :, r, :] = acc
        return ids_mat

    ids_mat = jax.lax.fori_loop(
        0, th, row_body, jnp.zeros((tw, th), jnp.int32)
    )
    ids_ref[0, 0] = ids_mat


def _bwd_kernel_v2(
    counts_ref, idscm_ref, tids_ref, drows_ref, out_ref, *, th, tw, k_chunk
):
    """d_bin(32, kc) = sum_rows d_rows(32, tw) @ indicator(tw, kc).

    tids_ref: VMEM (1, 8, K) f32 — bin triangle indices (8x sublane
    broadcast so a (1, kc) row slice is layout-legal).
    """
    t = pl.program_id(1)
    count = counts_ref[t]
    k_max = tids_ref.shape[2]
    n_chunks = k_max // k_chunk
    used = jnp.minimum((count + k_chunk - 1) // k_chunk, n_chunks)

    out_ref[0, 0] = jnp.zeros((PACKED_WIDTH, k_max), jnp.float32)
    ids_mat = idscm_ref[0, 0]  # (tw, th)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, th), 1)

    def chunk_body(ci, _):
        base = pl.multiple_of(ci * k_chunk, 128)
        ids_f = tids_ref[0, 0:1, pl.ds(base, k_chunk)]  # (1, kc)
        tri_id = ids_f.astype(jnp.int32) + 1
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, k_chunk), 1) + base
        slot_ok = slot < count

        def row_body(r, acc):
            # extract lane column r without a single-lane slice
            ids_col = jnp.sum(
                jnp.where(col_iota == r, ids_mat, 0), axis=1, keepdims=True
            )  # (tw, 1)
            indicator = ((ids_col == tri_id) & slot_ok).astype(jnp.float32)
            d_row = drows_ref[0, :, r, :]  # (32, tw)
            return acc + jax.lax.dot_general(
                d_row, indicator, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (32, kc)

        acc = jax.lax.fori_loop(
            0, th, row_body, jnp.zeros((PACKED_WIDTH, k_chunk), jnp.float32)
        )
        out_ref[0, 0, :, pl.ds(base, k_chunk)] = acc
        return 0

    jax.lax.fori_loop(0, used, chunk_body, 0)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def raster_gather_rows_v2(
    packed: Array,
    tile_idx: Array,
    tile_counts: Array,
    inv_pos: Array,
    inv_valid: Array,
    resolution: Tuple[int, int],
    tile_hw: Tuple[int, int],
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Planar vectorized rasterize + row gather.

    Args:
        packed: (B, 32, T) planar packed table (render/planar.py).
        tile_idx/tile_counts: binning output.
        inv_pos/inv_valid: gather_rows.invert_bins output.

    Returns:
        ids (B, H, W) int32 (0 = background), rows (B, 32, H, W) planar.
    """
    ids_cm, rows = _fwd_v2(
        packed, tile_idx, tile_counts, resolution, tile_hw, interpret
    )
    ids = _untangle_ids(ids_cm, resolution)
    rows = rows[:, :, : resolution[0], : resolution[1]]
    ids = jax.ad_checkpoint.checkpoint_name(ids, "raster_ids")
    rows = jax.ad_checkpoint.checkpoint_name(rows, "raster_rows")
    return ids, rows


def _untangle_ids(ids_cm, resolution):
    """(B, nty, Wp, th) column-major tiles -> (B, H, W)."""
    b, nty, wp, th = ids_cm.shape
    ids = jnp.swapaxes(ids_cm, 2, 3).reshape(b, nty * th, wp)
    return ids[:, : resolution[0], : resolution[1]]


def _bins_planar(packed, tile_idx):
    b, width, t_count = packed.shape
    num_tiles, k = tile_idx.shape
    safe = jnp.minimum(tile_idx, t_count - 1)
    bins = jnp.take(packed, safe.reshape(-1), axis=2)
    return jnp.swapaxes(
        bins.reshape(b, width, num_tiles, k), 1, 2
    )  # (B, nt, 32, K)


def _fwd_v2(packed, tile_idx, tile_counts, resolution, tile_hw, interpret):
    b, width, t_count = packed.shape
    assert width == PACKED_WIDTH
    h, w = resolution
    th, tw = tile_hw
    nty, ntx = -(-h // th), -(-w // tw)
    num_tiles, k = tile_idx.shape
    k_chunk = _pick_chunk(k)

    bins = _bins_planar(packed, tile_idx)
    kernel = functools.partial(
        _fwd_kernel_v2, th=th, tw=tw, ntx=ntx, h=h, w=w, k_chunk=k_chunk
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, PACKED_WIDTH, k),
                lambda bi, ti, c: (bi, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, tw, th),
                lambda bi, ti, c: (bi, ti // ntx, ti % ntx, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, PACKED_WIDTH, th, tw),
                lambda bi, ti, c: (bi, 0, ti // ntx, ti % ntx),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[pltpu.VMEM((tw, k), jnp.float32)],
    )
    ids_cm, rows = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, nty, ntx * tw, th), jnp.int32),
            jax.ShapeDtypeStruct((b, PACKED_WIDTH, nty * th, ntx * tw), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_counts, bins)
    return ids_cm, rows


def _vjp_fwd_v2(packed, tile_idx, tile_counts, inv_pos, inv_valid,
                resolution, tile_hw, interpret=False):
    ids_cm, rows = _fwd_v2(
        packed, tile_idx, tile_counts, resolution, tile_hw, interpret
    )
    ids = _untangle_ids(ids_cm, resolution)
    rows_out = rows[:, :, : resolution[0], : resolution[1]]
    res = (packed.shape, tile_idx, tile_counts, ids_cm, inv_pos, inv_valid)
    return (ids, rows_out), res


def _vjp_bwd_v2(resolution, tile_hw, interpret, res, cotangents):
    packed_shape, tile_idx, tile_counts, ids_cm, inv_pos, inv_valid = res
    _, d_rows = cotangents
    b, width, t_count = packed_shape
    h, w = resolution
    th, tw = tile_hw
    nty, ntx = -(-h // th), -(-w // tw)
    num_tiles, k = tile_idx.shape
    k_chunk = _pick_chunk(k)

    d_rows_p = jnp.pad(
        d_rows, ((0, 0), (0, 0), (0, nty * th - h), (0, ntx * tw - w))
    )
    # bin triangle indices as a small float table (shared across batch)
    tri_f = jnp.minimum(tile_idx, t_count - 1).astype(jnp.float32)
    tids = jnp.broadcast_to(tri_f[:, None, :], (num_tiles, 8, k))

    kernel = functools.partial(_bwd_kernel_v2, th=th, tw=tw, k_chunk=k_chunk)
    bwd_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, tw, th),
                lambda bi, ti, c: (bi, ti // ntx, ti % ntx, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, k), lambda bi, ti, c: (ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, PACKED_WIDTH, th, tw),
                lambda bi, ti, c: (bi, 0, ti // ntx, ti % ntx),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, PACKED_WIDTH, k), lambda bi, ti, c: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    d_bin = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (b, num_tiles, PACKED_WIDTH, k), jnp.float32
        ),
        grid_spec=bwd_grid,
        interpret=interpret,
    )(tile_counts, ids_cm, tids, d_rows_p)

    # per-triangle reduction over its <=M tile occurrences (lane gathers)
    d_bin_flat = jnp.swapaxes(d_bin, 1, 2).reshape(b, width, num_tiles * k)
    m = inv_pos.shape[1]
    gathered = jnp.take(d_bin_flat, inv_pos.reshape(-1), axis=2).reshape(
        b, width, t_count, m
    )
    d_packed = jnp.sum(
        jnp.where(inv_valid[None, None, :, :], gathered, 0.0), axis=3
    )

    def zero_i(shape):
        return np.zeros(shape, jax.dtypes.float0)

    return (
        d_packed,
        zero_i(tile_idx.shape),
        zero_i(tile_counts.shape),
        zero_i(inv_pos.shape),
        zero_i(inv_valid.shape),
    )


raster_gather_rows_v2.defvjp(_vjp_fwd_v2, _vjp_bwd_v2)
