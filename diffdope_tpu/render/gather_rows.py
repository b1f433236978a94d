"""Fused triangle-id search + row gather with a matmul-structured backward.

The packed-row pipeline needs, per pixel, the 32-lane row of its winning
triangle.  A plain XLA gather costs ~113ms forward and its transpose
scatter-add ~900ms backward at bench scale (B=64, 400x400, 14k tris) — the
single largest cost in the whole refiner.  TPUs have no hardware
gather/scatter; the native formulation is a *masked matmul over the screen
tiles* that the rasterizer already bins:

forward (one Pallas kernel per (batch, tile)):
  1. z-tested triangle-id search over the tile's bin list (as before);
  2. rows_tile (px, 32) = onehot(ids) (px, K) @ bin_rows (K, 32) — MXU.
     The one-hot is built in VMEM chunk by chunk and never touches HBM.

backward (second Pallas kernel + tiny reduction):
  d_bin_rows (K, 32) = onehot(ids)^T (K, px) @ d_rows_tile (px, 32) — MXU;
  then d_packed[t] = sum over the <=M tiles containing t of d_bin_rows —
  a T-row *gather* (fast) via an inverted bin map, instead of a 13M-row
  scatter.

Exactness: one-hot entries are 0/1, so even the MXU's bf16x3 f32 emulation
reproduces each gathered row bit-exactly (x = hi+mid+lo exactly, times 1.0).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffdope_tpu.render.shade import PACKED_WIDTH
from diffdope_tpu.render.raster_v2 import _one_hot_dot

Array = jax.Array


def invert_bins(tile_idx: Array, t_count: int, max_occ=16):
    """Invert the (num_tiles, K) bin lists into per-triangle occurrence lists.

    Returns (inv_pos (T, M) int32 flat positions into (num_tiles*K),
    inv_valid (T, M) bool).

    max_occ:
      * 'auto' — size M to the ACTUAL maximum tile-occurrence count (exact:
        no triangle ever loses backward contributions; also minimal, which
        matters — the backward gathers B*32*T*M elements).  Requires a
        concrete (non-traced) tile_idx, e.g. render.pipeline.precompute_bins
        outside jit.
      * int — fixed M for jit-traced binning.  A triangle occurring in more
        than M tiles loses those gradient contributions; callers should
        validate against real occupancy (see precompute_bins).
    """
    nt, k = tile_idx.shape
    if isinstance(max_occ, str):
        if max_occ != "auto":
            raise ValueError(f"max_occ must be an int or 'auto': {max_occ!r}")
        from jax.core import Tracer

        if isinstance(tile_idx, Tracer):
            raise ValueError(
                "invert_bins(max_occ='auto') needs a concrete tile_idx — "
                "call it outside jit (precompute_bins) or pass an int"
            )
        flat_np = np.asarray(tile_idx).reshape(-1)
        occ = np.bincount(flat_np[flat_np < t_count], minlength=t_count)
        max_occ = max(4, int(occ.max(initial=0)))
    # sort-then-scatter (no searchsorted: its TPU lowering is a 17-deep
    # while loop, measured 2.2x slower than this unique-index scatter):
    # group ranks come from a cummax over first-occurrence flags, and each
    # (triangle, rank) pair scatters its flat position into the (T, M) map;
    # unwritten slots (rank >= count) keep the -1 sentinel -> inv_valid.
    flat = tile_idx.reshape(-1)  # values in [0, T] (T = sentinel)
    n = nt * k
    order = jnp.argsort(flat).astype(jnp.int32)
    sorted_vals = flat[order]
    iota = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_vals[1:] != sorted_vals[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(first, iota, -1))
    rank = iota - seg_start  # occurrence index within the triangle's group
    ok = (rank < max_occ) & (sorted_vals < t_count)
    # rejects get DISTINCT out-of-bounds targets (t_count*max_occ + iota):
    # mode='drop' discards them, and unique_indices=True stays honest (a
    # shared reject index would put duplicates in the index vector, which
    # the unique_indices contract forbids even when dropped).
    tgt = jnp.where(ok, sorted_vals * max_occ + rank, t_count * max_occ + iota)
    inv = (
        jnp.full((t_count * max_occ,), -1, jnp.int32)
        .at[tgt]
        .set(order, mode="drop", unique_indices=True)
    )
    inv_pos = inv.reshape(t_count, max_occ)
    return jnp.maximum(inv_pos, 0), inv_pos >= 0


def bin_occupancy(tile_idx: Array, t_count: int) -> Array:
    """Maximum number of tile occurrences of any triangle (jit-compatible).

    Callers using a fixed invert_bins max_occ should check (or size against)
    this — occurrences beyond max_occ silently lose backward contributions.
    """
    flat = tile_idx.reshape(-1)
    sorted_vals = jnp.sort(flat)
    ar = jnp.arange(t_count, dtype=flat.dtype)
    counts = (
        jnp.searchsorted(sorted_vals, ar, side="right")
        - jnp.searchsorted(sorted_vals, ar)
    )
    return jnp.max(counts)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(counts_ref, rows_ref, ids_ref, out_ref, *, th, tw, ntx, h, w, k_chunk):
    """Phase 1: z-tested id search.  Phase 2: rows via one-hot matmul.

    counts_ref: SMEM (num_tiles,) int32.
    rows_ref:   VMEM (1, 1, K, 32) packed rows for this tile's bin
                (lane 13 = global triangle index as float).
    ids_ref:    VMEM (1, th, tw) int32 out.
    out_ref:    VMEM (1, 32, th, tw) f32 out (gathered rows, planar).
    """
    t = pl.program_id(1)
    count = counts_ref[t]
    k_max = rows_ref.shape[2]

    rows = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + (t // ntx) * th
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + (t % ntx) * tw
    x = (2.0 * cols.astype(jnp.float32) + 1.0) / w - 1.0
    y = (2.0 * rows.astype(jnp.float32) + 1.0) / h - 1.0

    def body(k, carry):
        zbest, ibest = carry
        c = rows_ref[0, 0, k, :]
        e0 = c[0] * x + c[1] * y + c[2]
        e1 = c[3] * x + c[4] * y + c[5]
        e2 = c[6] * x + c[7] * y + c[8]
        zlin = c[9] * x + c[10] * y + c[11]
        det = c[12]
        sgn = jnp.sign(det)
        covered = (e0 * sgn >= 0) & (e1 * sgn >= 0) & (e2 * sgn >= 0) & (det != 0)
        z = zlin / jnp.where(det != 0.0, det, 1.0)
        ok = covered & (z >= -1.0) & (z <= 1.0) & (z < zbest)
        tri_id = c[13].astype(jnp.int32) + 1
        return jnp.where(ok, z, zbest), jnp.where(ok, tri_id, ibest)

    zinit = jnp.full((th, tw), jnp.inf, jnp.float32)
    iinit = jnp.zeros((th, tw), jnp.int32)
    _, ibest = jax.lax.fori_loop(0, count, body, (zinit, iinit))
    ids_ref[0] = ibest

    # phase 2: rows_tile = onehot @ bin_rows, row-by-row.  Output is
    # channel-planar (32, th, tw): the 32 lanes of a channels-last layout
    # would pad to 128 on TPU (4x memory/bandwidth).
    n_chunks = k_max // k_chunk
    used = jnp.minimum((count + k_chunk - 1) // k_chunk, n_chunks)
    dn = (((0,), (0,)), ((), ()))  # contract the kc dim of both operands

    def row_body(r, _):
        ids_row = ids_ref[0, pl.ds(r, 1), :]  # (1, tw) — reread via ref (Mosaic
        # has no dynamic_slice on values)

        def chunk_body(ci, acc):
            base = ci * k_chunk
            chunk = rows_ref[0, 0, pl.ds(base, k_chunk), :]  # (kc, 32)
            tri_ids = chunk[:, 13:14].astype(jnp.int32) + 1  # (kc, 1)
            # mask bin slots beyond the tile's count (sentinel rows) here
            # instead of poisoning lane 13 host-side (a 436MB update-slice)
            slot = jax.lax.broadcasted_iota(jnp.int32, (k_chunk, 1), 0) + base
            onehot = ((tri_ids == ids_row) & (slot < count)).astype(jnp.float32)
            return acc + _one_hot_dot(chunk, onehot, dn)  # (32, tw)

        acc = jax.lax.fori_loop(
            0, used, chunk_body, jnp.zeros((PACKED_WIDTH, tw), jnp.float32)
        )
        out_ref[0, :, r, :] = acc
        return 0

    jax.lax.fori_loop(0, th, row_body, 0)


def _bwd_kernel(counts_ref, ids_ref, tidx_ref, drows_ref, out_ref, *, th, tw, k_chunk):
    """d_bin_rows (K, 32) = onehot^T (K, px) @ d_rows_tile (px, 32).

    ids_ref:   VMEM (1, th, tw) int32 winning ids (+1).
    tidx_ref:  VMEM (1, 1, K, 32) the tile's packed rows (for lane 13 ids).
    drows_ref: VMEM (1, 32, th, tw) upstream row cotangents (planar).
    out_ref:   VMEM (1, 1, K, 32) per-tile row gradients.
    """
    k_max = tidx_ref.shape[2]
    count = counts_ref[pl.program_id(1)]
    dn = (((1,), (1,)), ((), ()))  # contract the tw (pixel) dim
    n_chunks = k_max // k_chunk
    # like the forward: only walk chunks that can hold valid bin entries
    # (the d_bin output must still be zeroed everywhere first)
    used = jnp.minimum((count + k_chunk - 1) // k_chunk, n_chunks)

    out_ref[0, 0] = jnp.zeros((k_max, PACKED_WIDTH), jnp.float32)

    def chunk_body(ci, _):
        base = ci * k_chunk
        chunk = tidx_ref[0, 0, pl.ds(base, k_chunk), :]  # (kc, 32)
        tri_ids = chunk[:, 13:14].astype(jnp.int32) + 1  # (kc, 1)
        slot = jax.lax.broadcasted_iota(jnp.int32, (k_chunk, 1), 0) + base
        slot_ok = slot < count

        def row_body(r, acc):
            ids_row = ids_ref[0, pl.ds(r, 1), :]  # (1, tw)
            onehot = ((tri_ids == ids_row) & slot_ok).astype(jnp.float32)  # (kc, tw)
            d_row = drows_ref[0, :, r, :]  # (32, tw)
            return acc + _one_hot_dot(
                onehot, d_row, dn, indicator="lhs"
            )  # (kc, 32)

        acc = jax.lax.fori_loop(
            0, th, row_body, jnp.zeros((k_chunk, PACKED_WIDTH), jnp.float32)
        )
        out_ref[0, 0, pl.ds(base, k_chunk), :] = acc
        return 0

    jax.lax.fori_loop(0, used, chunk_body, 0)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7)
)
def raster_gather_rows(
    packed: Array,
    tile_idx: Array,
    tile_counts: Array,
    inv_pos: Array,
    inv_valid: Array,
    resolution: Tuple[int, int],
    tile_hw: Tuple[int, int],
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Rasterize + gather packed rows per pixel.

    Args:
        packed: (B, T, 32) packed rows (differentiable; lane 13 must hold
            the triangle index — shade.pack_rows does this).
        tile_idx/tile_counts: binning output (shared across batch).
        inv_pos/inv_valid: invert_bins output (for the backward reduction).
        resolution, tile_hw: static shapes.

    Returns:
        ids (B, H, W) int32 (0 = background; non-differentiable),
        rows (B, 32, H, W) float32, channel-PLANAR (differentiable w.r.t.
        packed; zero rows at background pixels).
    """
    ids, rows = _fwd_impl(
        packed, tile_idx, tile_counts, resolution, tile_hw, interpret
    )
    # named for remat policies: optimize.refine saves these residuals so the
    # backward pass does not re-run the raster kernel
    ids = jax.ad_checkpoint.checkpoint_name(ids, "raster_ids")
    rows = jax.ad_checkpoint.checkpoint_name(rows, "raster_rows")
    return ids, rows


def _fwd_impl(packed, tile_idx, tile_counts, resolution, tile_hw, interpret):
    b, t_count, width = packed.shape
    assert width == PACKED_WIDTH
    h, w = resolution
    th, tw = tile_hw
    nty, ntx = -(-h // th), -(-w // tw)
    num_tiles, k = tile_idx.shape
    k_chunk = min(128, k)
    assert k % k_chunk == 0

    safe_idx = jnp.minimum(tile_idx, t_count - 1)
    bin_rows = packed[:, safe_idx]  # (B, num_tiles, K, 32)
    # (slots beyond each tile's count — including sentinel rows — are
    # masked inside the kernels by slot index; no host-side poisoning)

    kernel = functools.partial(
        _fwd_kernel, th=th, tw=tw, ntx=ntx, h=h, w=w, k_chunk=k_chunk
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, k, PACKED_WIDTH),
                lambda bi, ti, c: (bi, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, th, tw), lambda bi, ti, c: (bi, ti // ntx, ti % ntx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, PACKED_WIDTH, th, tw),
                lambda bi, ti, c: (bi, 0, ti // ntx, ti % ntx),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    ids_pad, rows_pad = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, nty * th, ntx * tw), jnp.int32),
            jax.ShapeDtypeStruct((b, PACKED_WIDTH, nty * th, ntx * tw), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_counts, bin_rows)

    return ids_pad[:, :h, :w], rows_pad[:, :, :h, :w]


def _vjp_fwd(packed, tile_idx, tile_counts, inv_pos, inv_valid,
             resolution, tile_hw, interpret=False):
    ids, rows = _fwd_impl(
        packed, tile_idx, tile_counts, resolution, tile_hw, interpret
    )
    res = (packed, tile_idx, tile_counts, ids, inv_pos, inv_valid)
    return (ids, rows), res


def _vjp_bwd(resolution, tile_hw, interpret, res, cotangents):
    packed, tile_idx, tile_counts, ids, inv_pos, inv_valid = res
    _, d_rows = cotangents  # d_ids is int cotangent (ignored)
    b, t_count, _ = packed.shape
    h, w = resolution
    th, tw = tile_hw
    nty, ntx = -(-h // th), -(-w // tw)
    num_tiles, k = tile_idx.shape
    k_chunk = min(128, k)

    # pad d_rows/ids back to tile multiples (d_rows is planar (B, 32, H, W))
    d_rows_p = jnp.pad(
        d_rows, ((0, 0), (0, 0), (0, nty * th - h), (0, ntx * tw - w))
    )
    ids_p = jnp.pad(ids, ((0, 0), (0, nty * th - h), (0, ntx * tw - w)))

    safe_idx = jnp.minimum(tile_idx, t_count - 1)
    bin_rows = packed[:, safe_idx]

    kernel = functools.partial(_bwd_kernel, th=th, tw=tw, k_chunk=k_chunk)
    bwd_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, th, tw), lambda bi, ti, c: (bi, ti // ntx, ti % ntx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, k, PACKED_WIDTH), lambda bi, ti, c: (bi, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, PACKED_WIDTH, th, tw),
                lambda bi, ti, c: (bi, 0, ti // ntx, ti % ntx),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, k, PACKED_WIDTH), lambda bi, ti, c: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    d_bin = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (b, num_tiles, k, PACKED_WIDTH), jnp.float32
        ),
        grid_spec=bwd_grid,
        interpret=interpret,
    )(tile_counts, ids_p, bin_rows, d_rows_p)

    # per-triangle reduction over its <=M tile occurrences: T-row gathers
    d_bin_flat = d_bin.reshape(b, num_tiles * k, PACKED_WIDTH)
    m = inv_pos.shape[1]
    d_packed = jnp.zeros_like(packed)
    gathered = d_bin_flat[:, inv_pos.reshape(-1)].reshape(
        b, t_count, m, PACKED_WIDTH
    )
    d_packed = jnp.sum(
        jnp.where(inv_valid[None, :, :, None], gathered, 0.0), axis=2
    )

    def zero_i(shape):
        return np.zeros(shape, jax.dtypes.float0)

    return (
        d_packed,
        zero_i(tile_idx.shape),
        zero_i((num_tiles,)),
        zero_i(inv_pos.shape),
        zero_i(inv_valid.shape),
    )


raster_gather_rows.defvjp(_vjp_fwd, _vjp_bwd)


# NOTE: a fully planar kernel variant ((B, 32, T) table straight into the
# kernel) was tried and removed: Mosaic cannot scalar-index the lane
# dimension dynamically, which the per-triangle id-search loop needs.  The
# pipeline instead builds the packed table planar (render/planar.py) and
# transposes once at this op's boundary — see pipeline.render_batch.
