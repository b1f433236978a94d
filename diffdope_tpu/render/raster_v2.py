"""Vectorized planar raster+gather kernel (v2, y-gated).

The v1 kernel walks each tile's bin list with a scalar per-triangle loop:
~14 scalar VMEM loads + a short-vector update per triangle, measured ~15x
off the VPU bound (268 ms/step at bench scale).  v2 evaluates triangles
VECTORIZED — pixels on sublanes, triangles on lanes:

    per K-chunk (outer), per tile row r in the chunk's y range (inner):
      e_m(tw, kc) = X(tw,1) * a_m(1,kc) + (y_r * b_m(1,kc) + c_m(1,kc))
      z(tw, kc)   = zlin * inv_det
      zm          = where(covered & slot_ok, z, +inf)
    zbest(tw,th)  = min over lanes+chunks          (depth test)
    idbest(tw,th) = min over lanes of ids where zm == zbest   (deterministic
                    smallest-id tie break)
    indicator(tw,kc) = (id == idbest_col) & slot_ok            (exactly one:
                    a triangle appears at most once per bin)
    rows(32,tw)  += chunk32(32,kc) @ indicator^T                (MXU gather)

Work gating: bins are sorted by triangle y_min and each chunk carries a
conservative pixel-row range (lanes 30/31 of the packed table, reduced per
chunk in XLA, prefetched to SMEM), so both loops only touch the
~(triangle-height / tile-height) fraction of (row, chunk) pairs that can
contain coverage — the difference between evaluating every binned triangle
against all 32 rows of its tile and only against its own few rows.

Everything is planar: the packed table is (B, 32, T), bins (B, 32, nt*K),
outputs ids (column-major (B, W, H), transposed once on host) and rows
(B, 32, H, W) — no small minor dims, zero lane padding anywhere.

The backward is the transposed indicator matmul per tile (d_bin(32, kc) =
d_rows(32, tw) @ indicator(tw, kc)) over the same gated row ranges, followed
by the inverted-bin per-triangle reduction — no scatter.
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

Array = jax.Array

_BIG = 1e9
_INF = jnp.inf


def _pick_chunk(k: int) -> int:
    """Largest chunk (multiple of 128, <= DD_KCHUNK cap) dividing K.

    With y-gating, smaller chunks gate tighter (each chunk of a y-sorted
    bin spans fewer rows); 256 measured best at bench scale."""
    import os

    cap = int(os.environ.get("DD_KCHUNK", "256"))
    for c in (1024, 512, 384, 256, 128):
        if c <= cap and c <= k and k % c == 0:
            return c
    return min(k, 128)


def _gather_precision():
    """MXU precision mode for the phase-C one-hot row gather (fwd) and the
    d_bin scatter reduction (bwd).

    "split3" (default) manually splits the f32 value operand into three
    bf16 terms (hi/mid/lo, 8 mantissa bits each — 24 total, every f32
    reconstructs exactly) and runs THREE default-precision MXU passes
    against the indicator.  Because the 0/1 indicator is itself exactly
    bf16-representable, this computes the SAME nonzero products as
    Precision.HIGHEST's six cross passes (the indicator's mid/lo splits
    are zero) at half the MXU time — measured 4.6 ms/step for the five
    extra passes of HIGHEST over single-pass at bench scale.
    "highest" keeps the lax.Precision.HIGHEST path (bit-identical output;
    perf reference).  "default" is single-pass bf16 — rounds the gathered
    rows (measured max abs err 32 on the tri-index lane on v5e;
    tools/onchip_check.py guards this); kept only as a measured perf
    knob.  Mosaic rejects Precision.HIGH, hence the manual split."""
    import os

    return os.environ.get("DD_GATHER_PRECISION", "split3").lower()


def _one_hot_dot(lhs, rhs, dims, indicator="rhs"):
    """dot_general against a 0/1 indicator operand, bit-exactly, fast.

    See _gather_precision.  The f32 VALUE operand (the non-indicator
    side, named by `indicator`) is split into three bf16 terms with
    disjoint magnitude ranges, so their per-output sum is exact in f32
    regardless of addition order; with a one-hot indicator each MXU
    accumulation gathers a single product and is trivially exact, and for
    the bwd's many-hot indicator the pass structure (three f32-accumulated
    partial sums added) is exactly HIGHEST's nonzero-pass structure."""
    mode = _gather_precision()
    if mode not in ("split3", "split3seq"):
        return jax.lax.dot_general(
            lhs, rhs, dims,
            preferred_element_type=jnp.float32,
            precision=getattr(jax.lax.Precision, mode.upper()),
        )
    vals = rhs if indicator == "lhs" else lhs
    hi = vals.astype(jnp.bfloat16)
    r1 = vals - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    ind = (lhs if indicator == "lhs" else rhs).astype(jnp.bfloat16)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32
        )

    if mode == "split3seq":  # three sequential passes (perf reference)
        if indicator == "lhs":
            return dot(ind, hi) + dot(ind, mid) + dot(ind, lo)
        return dot(hi, ind) + dot(mid, ind) + dot(lo, ind)
    # split3 (default): STACK the three bf16 terms along the values
    # operand's free dim and run ONE pass.  The free dim here is always
    # the 32-lane packed width — a bare M (or N) of 32 uses a quarter of
    # the MXU's 128-wide tile, so the stacked (96, kc) operand does the
    # same work in a third of the tile-ops (measured: the five extra
    # passes of HIGHEST over single-pass cost 4.6 ms/step; split3seq
    # halved that; stacking cuts the remaining pass count 3x).  The fold
    # adds the three output slices in (hi + mid) + lo order — identical
    # per-element float math to the sequential form.
    (lhs_c,), (rhs_c,) = dims[0]
    vc = lhs_c if indicator == "rhs" else rhs_c
    vfree = 1 - vc
    stacked = jnp.concatenate([hi, mid, lo], axis=vfree)
    m = vals.shape[vfree]
    if indicator == "lhs":
        out = dot(ind, stacked)  # stacked free dim is out dim 1 (lanes)
        return (
            out[:, 0:m] + out[:, m : 2 * m] + out[:, 2 * m : 3 * m]
        )
    out = dot(stacked, ind)  # stacked free dim is out dim 0 (sublanes)
    return out[0:m] + out[m : 2 * m] + out[2 * m : 3 * m]


def _pick_qrows(th: int) -> int:
    """Rows evaluated per loop iteration (must divide the tile height).

    The per-(row, chunk) iteration is latency-bound, not ALU-bound (measured:
    halving the chunk width RAISED step time ~22% while halving element work)
    — each iteration is a serial eval -> lane-reduce -> merge chain that
    Mosaic does not software-pipeline across fori_loop trips.  Evaluating q
    rows as one (q*tw, kc) window amortizes that chain over q rows."""
    import os

    q = int(os.environ.get("DD_QROWS", "4"))
    while th % q:
        q //= 2
    return max(q, 1)


def _fwd_kernel_v2(
    counts_ref, bounds_ref, qwin_ref, xwin_ref,
    bins_ref, ids_ref, idpix_ref, rows_ref, zb_s, ib_s,
    *, th, tw, ntx, h, w, k_chunk, q_rows, eval_bf16=False, xw=0, cu=1,
    split_eval=False, hoist_eval=False, lean_eval=False, sub=1,
):
    return _fwd_kernel_body(
        counts_ref, bounds_ref, qwin_ref, xwin_ref, bins_ref, ids_ref,
        idpix_ref, rows_ref, zb_s, ib_s, th=th, tw=tw, ntx=ntx, h=h, w=w,
        k_chunk=k_chunk, q_rows=q_rows, eval_bf16=eval_bf16, xw=xw, cu=cu,
        split_eval=split_eval, hoist_eval=hoist_eval, lean_eval=lean_eval,
        sub=sub,
    )


def _fwd_kernel_v2_compact(
    counts_ref, off_ref, used_ref, bounds_ref, qwin_ref, xwin_ref,
    bins_ref, ids_ref, idpix_ref, rows_ref, zb_s, ib_s,
    *, th, tw, ntx, h, w, k_chunk, q_rows, eval_bf16=False, cu=1,
    split_eval=False, hoist_eval=False, lean_eval=False, totc=0, sub=1,
    oy=0, ox=0,
):
    return _fwd_kernel_body(
        counts_ref, bounds_ref, qwin_ref, xwin_ref, bins_ref, ids_ref,
        idpix_ref, rows_ref, zb_s, ib_s, off_ref=off_ref, used_ref=used_ref,
        th=th, tw=tw, ntx=ntx, h=h, w=w, k_chunk=k_chunk, q_rows=q_rows,
        eval_bf16=eval_bf16, xw=0, cu=cu, split_eval=split_eval,
        hoist_eval=hoist_eval, lean_eval=lean_eval, compact=True, totc=totc,
        sub=sub, oy=oy, ox=ox,
    )


def _fwd_kernel_body(
    counts_ref, bounds_ref, qwin_ref, xwin_ref,
    bins_ref, ids_ref, idpix_ref, rows_ref, zb_s, ib_s, off_ref=None,
    used_ref=None,
    *, th, tw, ntx, h, w, k_chunk, q_rows, eval_bf16=False, xw=0, cu=1,
    split_eval=False, hoist_eval=False, lean_eval=False, compact=False,
    totc=0, sub=1, oy=0, ox=0,
):
    """Vectorized forward: see module docstring.

    Work gating: bins are sorted by triangle y_min
    (planar.bin_triangles_planar sort_by_y) and rlo/rhi give each K-chunk's
    conservative absolute pixel-row range (union over the batch).  Both
    phases loop CHUNK-OUTER / QUAD-INNER over just the chunk's contiguous
    active row range, q_rows rows per iteration as one (q_rows*tw, kc)
    window: the per-iteration eval -> lane-reduce -> merge latency chain
    (the measured bottleneck — see _pick_qrows) is amortized over q_rows
    rows, and phase C's one-hot gather becomes a q_rows-wide MXU matmul.
    Coverage is still re-tested exactly per pixel, so gating never changes
    the output — rows evaluated only because of quad rounding find no
    coverage from this chunk and merge as no-ops.

    The per-row best-z / best-id state lives in a carried (tw, th) register
    pair; column r is extracted / merged with lane-iota masks (single-lane
    column reads/writes are not lowerable on TPU).

    counts_ref: SMEM (num_tiles,) int32.
    rlo_ref/rhi_ref: SMEM (num_tiles, n_chunks) int32 absolute pixel-row
                bounds per chunk (inclusive).
    bins_ref:   VMEM (1, 32, K) planar bin rows (lane 13 = tri index) —
                one tile's K columns of the (B, 32, num_tiles*K) gather
                (natural take() layout: no relayout copies at the kernel
                boundary, measured ~8 ms/step at bench scale).
    ids_ref:    VMEM (1, 1, tw, th) int32 out — column-major per tile
                (array (B, nty, Wp, th); untangled on the host).
    rows_ref:   VMEM (1, 32, th, tw) f32 out.

    compact=True: the bins block is the ENTIRE flat chunk-aligned table
    (1, 32, total) — resident in VMEM across the tile loop for each
    hypothesis — plus two extra SMEM prefetch vectors off_ref/used_ref
    (per-tile chunk offset / chunk count, planar.compact_bins).  Chunk ci
    of tile t lives at columns [(off + ci) * k_chunk, ...); its row-bound
    entry is bounds_ref[bi * totc + off + ci].
    """
    bi = pl.program_id(0)
    t = pl.program_id(1)
    count = counts_ref[t]
    if compact:
        cb0 = off_ref[t]
        used = used_ref[t]
        clamp_hi = jnp.maximum(used, 1) - 1  # dynamic
        c_lim = used
    else:
        cb0 = 0
        k_max = bins_ref.shape[2]
        n_chunks = k_max // k_chunk
        used = jnp.minimum((count + k_chunk - 1) // k_chunk, n_chunks)
        clamp_hi = n_chunks - 1
        c_lim = n_chunks
    q = q_rows

    # pixel coordinates for a q-row window: X tiles the tile's columns q
    # times along sublanes; jrow is each sublane group's sub-row index
    # (tpu.iota must be integer-typed; cast after)
    iq = jax.lax.broadcasted_iota(jnp.int32, (q * tw, 1), 0)
    jrow_i = iq // tw  # (q*tw, 1) int: 0..q-1
    xcol_i = (iq % tw) + (t % ntx) * tw + ox
    xq = (2.0 * xcol_i.astype(jnp.float32) + 1.0) / w - 1.0  # (q*tw, 1)
    # single-row-group x coords for the split eval (values identical to
    # each tw-long section of xq)
    x1i = (
        jax.lax.broadcasted_iota(jnp.int32, (tw, 1), 0)
        + (t % ntx) * tw + ox
    )
    x1q = (2.0 * x1i.astype(jnp.float32) + 1.0) / w - 1.0  # (tw, 1)
    x1e = x1q.astype(jnp.bfloat16) if eval_bf16 else x1q
    import os as _os0
    _skip_id = _os0.environ.get("DD_SKIP_ID") == "1"  # profiling only
    # quad-outer merged phase A+C (see _quad_outer_body below): default ON
    # for the plain eval path; the flag variants keep the chunk-outer loop
    _qouter = (
        _os0.environ.get("DD_QOUTER", "1") == "1"
        and xw == 0 and cu == 1
        and not (split_eval or hoist_eval or eval_bf16)
    )
    if sub > 1 and not _qouter:
        raise NotImplementedError(
            "sub-tile binning (tile width < 128) requires the quad-outer "
            "kernel path (DD_QOUTER=1, no DD_XWIN/DD_CUNROLL/DD_EVAL_SPLIT/"
            "DD_EVAL_HOIST/DD_EVAL_BF16)"
        )
    y0 = (t // ntx) * th + oy
    nq = th // q

    # carried per-row state is QUAD-MAJOR: (q*tw, nq), lane column qi
    # holding rows [qi*q, qi*q + q) stacked along sublane groups — one
    # column extract/merge per quad instead of q of them (the per-quad
    # merge was ~20% of the issue-bound iteration)
    colq_iota = jax.lax.broadcasted_iota(jnp.int32, (1, nq), 1)

    def quad_range(ci):
        # bounds_ref is a (1, N) SMEM block holding just THIS hypothesis's
        # row-bound table (streamed per grid row bi — whole-array scalar
        # prefetch scaled as B*N and blew the 1MB SMEM at escalated
        # compact totals; see _fwd_from_bins* in_specs)
        if compact:
            v = bounds_ref[0, 0, cb0 + ci]
        else:
            v = bounds_ref[0, 0, t * n_chunks + ci]
        r_lo = jnp.clip(v // 1024 - 1 - y0, 0, th)
        r_hi = jnp.clip(v % 1024 - 1 - y0 + 1, 0, th)
        return r_lo // q, (r_hi + q - 1) // q

    def colq_get(mat, qi):
        """Column qi of a (q*tw, nq) value as (q*tw, 1)."""
        return jnp.sum(
            jnp.where(colq_iota == qi, mat, 0.0), axis=1, keepdims=True
        )

    # ---- QUAD-OUTER merged phase A+C (default): loop quads outer, chunks
    # inner over the quad's prefetched chunk window (qclo/qchi — the same
    # conservative windows phase C always used; a row's winner necessarily
    # lies in a chunk whose y-range contains the row).  The per-quad winner
    # state is a (q*tw, 1) register PAIR merged with plain wheres — the
    # chunk-outer loop instead carries (q*tw, nq) state and pays a
    # colq_get (lane-masked reduce) plus a lane-masked scatter-merge on
    # EVERY (chunk, quad) visit; quad-outer extracts nothing and merges the
    # winner column into the ids matrix once per quad.  The chunk setup
    # ((1, kc) lane ops) re-runs per (quad, chunk) instead of per chunk —
    # measured net win (the setup is 2-vreg work; the state machinery it
    # replaces is 64-vreg work).  Visit counts are phase C's: window gaps
    # (mid-window chunks whose y-range misses the quad) evaluate as no-ops,
    # exactly as they always did in phase C.
    if _qouter:
        skip_a = _os0.environ.get("DD_SKIP_A") == "1"  # profiling only
        skip_c = _os0.environ.get("DD_SKIP_C") == "1"  # profiling only
        _qpair = _os0.environ.get("DD_QPAIR", "0") == "1"

        # sub-tile loop (static unroll): with tile width tw_bin = tw//sub
        # the bins/counts/windows tables are per SUB-tile (tsub = t*sub + s,
        # planar.bin_triangles_planar pads the x grid so each 128-px
        # super-tile owns exactly `sub` consecutive sub-tiles) while the
        # kernel instance still owns the full 128-wide output block.  Eval
        # tensors shrink to (q*tws, kc) — the x-axis waste that lane-based
        # gating could never cut (ROADMAP: every DD_XWIN config regressed)
        # falls out of the BIN granularity instead.
        tws = tw // sub
        n_sub = pl.num_programs(1) * sub
        idpix_parts = []  # sub > 1: per-sub-tile ids_out.T, written once below
        iq_s = jax.lax.broadcasted_iota(jnp.int32, (q * tws, 1), 0)
        jrow_s = iq_s // tws  # (q*tws, 1): 0..q-1
        if not compact:
            k_sub = bins_ref.shape[2] // sub  # per-sub-tile K
            n_chunks_sub = k_sub // k_chunk
            cap_c = sub * n_chunks_sub  # block-local chunk cap (DD_QPAIR)
        else:
            cap_c = totc  # global chunk cap (DD_QPAIR clamp)

        for s in range(sub):
            tsub = t * sub + s
            count_s = counts_ref[tsub]
            if compact:
                cb0_s = off_ref[tsub]
            else:
                cb0_s = s * n_chunks_sub
            xcol_s = (iq_s % tws) + ((t % ntx) * tw + s * tws) + ox
            xq_s = (2.0 * xcol_s.astype(jnp.float32) + 1.0) / w - 1.0

            def quad_all(qi, ids_mat, tsub=tsub, count=count_s, cb0=cb0_s,
                         xq=xq_s, s=s):
                qv = qwin_ref[0, 0, tsub * nq + qi]
                q_clo = qv // 256
                q_chi = qv % 256
                r0 = qi * q
                rows_i = jrow_s + (y0 + r0)
                yq = (2.0 * rows_i.astype(jnp.float32) + 1.0) / h - 1.0

                def eval_chunk(ci):
                    """(z_c, id_c) winner column of chunk ci for this quad."""
                    base = pl.multiple_of((cb0 + ci) * k_chunk, 128)
                    c32 = bins_ref[0, :, pl.ds(base, k_chunk)]  # (32, kc)

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
                    slot = (
                        jax.lax.broadcasted_iota(jnp.int32, (1, k_chunk), 1)
                        + ci * k_chunk
                    )
                    slot_ok = (slot < count) & (det != 0)
                    if lean_eval:
                        # see the chunk-outer lean block: invalid slots are
                        # poisoned into c0 / inv_det once per chunk
                        bad = jnp.logical_not(slot_ok)
                        c0 = jnp.where(bad, jnp.float32(-jnp.inf), c0)
                        inv_det = jnp.where(bad, 1.0, inv_det)
                    e0 = xq * a0 + (yq * b0 + c0)
                    e1 = xq * a1 + (yq * b1 + c1)
                    e2 = xq * a2 + (yq * b2 + c2)
                    zlin = xq * az + (yq * bz + cz)
                    emin = jnp.minimum(jnp.minimum(e0, e1), e2)
                    covered = emin >= 0
                    z = zlin * inv_det
                    if lean_eval:
                        ok = covered & (jnp.abs(z) <= 1.0)
                    else:
                        ok = covered & (z >= -1.0) & (z <= 1.0) & slot_ok
                    zm = jnp.where(ok, z, _INF)  # (q*tws, kc)
                    z_c = jnp.min(zm, axis=1, keepdims=True)  # (q*tws, 1)
                    if _skip_id:  # profiling only: no id reduction
                        id_c = z_c
                    else:
                        id_c = jnp.min(
                            jnp.where(zm == z_c, ids_f, _BIG),
                            axis=1, keepdims=True,
                        )
                    return z_c, id_c

                def merge(zb, ib, z_c, id_c):
                    # min-z winner, min-id on exact z ties — associative
                    # and commutative, so chunk order never matters
                    better = z_c < zb
                    same = (z_c == zb) & (z_c < _INF)
                    return (
                        jnp.where(better, z_c, zb),
                        jnp.where(
                            better, id_c,
                            jnp.where(same, jnp.minimum(id_c, ib), ib),
                        ),
                    )

                def chunk_a2(ci, carry):
                    z_c, id_c = eval_chunk(ci)
                    return merge(*carry, z_c, id_c)

                def chunk_a2_pair(i, carry):
                    # two independent eval chains per trip: halves the fori
                    # trip count (Mosaic cannot software-pipeline across
                    # trips) and doubles the issue-level parallelism.  The
                    # second chunk is clamped into the table (reads a
                    # neighbor's chunk) and its result poisoned when the
                    # window length is odd.
                    c0i = q_clo + 2 * i
                    c1i = c0i + 1
                    z0, id0 = eval_chunk(c0i)
                    z1, id1 = eval_chunk(jnp.minimum(c1i, cap_c - 1 - cb0))
                    ok1 = c1i < q_chi
                    z1 = jnp.where(ok1, z1, _INF)
                    id1 = jnp.where(ok1, id1, _BIG)
                    zb, ib = merge(*carry, z0, id0)
                    return merge(zb, ib, z1, id1)

                init = (
                    jnp.full((q * tws, 1), _INF, jnp.float32),
                    jnp.full((q * tws, 1), _BIG, jnp.float32),
                )
                if skip_a:
                    _, ib4 = init
                elif _qpair:
                    _, ib4 = jax.lax.fori_loop(
                        0, (q_chi - q_clo + 1) // 2, chunk_a2_pair, init
                    )
                else:
                    _, ib4 = jax.lax.fori_loop(q_clo, q_chi, chunk_a2, init)

                def chunk_c2(ci, acc):
                    base = pl.multiple_of((cb0 + ci) * k_chunk, 128)
                    c32 = bins_ref[0, :, pl.ds(base, k_chunk)]
                    ids_f = c32[13:14, :]
                    if compact:
                        # sentinel ids on non-real slots — id match is exact
                        indicator = (ids_f == ib4).astype(jnp.float32)
                    else:
                        slot = (
                            jax.lax.broadcasted_iota(
                                jnp.int32, (1, k_chunk), 1
                            )
                            + ci * k_chunk
                        )
                        indicator = (
                            (ids_f == ib4) & (slot < count)
                        ).astype(jnp.float32)
                    return acc + _one_hot_dot(
                        c32, indicator, (((1,), (1,)), ((), ()))
                    )  # (32, q*tws)

                acc = jax.lax.fori_loop(
                    q_clo, 0 if skip_c else q_chi, chunk_c2,
                    jnp.zeros((PACKED_WIDTH, q * tws), jnp.float32),
                )
                for j in range(q):
                    if sub == 1:
                        rows_ref[0, :, r0 + j, :] = (
                            acc[:, j * tws : (j + 1) * tws]
                        )
                    else:
                        rows_ref[0, :, r0 + j, s * tws : (s + 1) * tws] = (
                            acc[:, j * tws : (j + 1) * tws]
                        )
                sel = colq_iota == qi
                return jnp.where(sel, ib4, ids_mat)

            ib_mat = jax.lax.fori_loop(
                0, nq, quad_all, jnp.full((q * tws, nq), _BIG, jnp.float32)
            )
            fg = ib_mat < _BIG
            ids_out = jnp.where(fg, ib_mat.astype(jnp.int32) + 1, 0)
            # second copy in PIXEL layout — (th, tws)[qi*q + j, x'] =
            # ids_out[j*tws + x', qi]; one in-VMEM relayout replaces the
            # whole-image untangle transpose XLA otherwise runs per step
            # (~1.15 ms at bench scale), and (B, Hp, Wp) ids become a free
            # reshape of this output
            if sub == 1:
                ids_ref[0, 0] = ids_out
                idpix_ref[0] = ids_out.T.reshape(th, tw)
            else:
                # ids block rows are sub-major: s*q*tws + j*tws + x'
                ids_ref[0, 0, s * q * tws : (s + 1) * q * tws, :] = ids_out
                # the pixel-layout write is deferred to after the sub-tile
                # loop: a direct (nq, q*tws).reshape(th, tws) is a
                # lane->sublane split at tws < 128 lanes, which Mosaic's
                # infer-vector-layout rejects ("unsupported shape cast")
                idpix_parts.append(ids_out.T)  # (nq, q*tws)
        if sub > 1:
            # assemble the full 128-lane pixel block with supported ops:
            # lane-concatenate the q*sub (nq, tws) column slices j-major
            # (lane l = j*tw + s*tws + x'), then one (nq, q*tw) ->
            # (th, tw=128) reshape — the same native-lane-width split the
            # sub == 1 path lowers
            parts = [
                idpix_parts[si][:, jj * tws : (jj + 1) * tws]
                for jj in range(q)
                for si in range(sub)
            ]
            idpix_ref[0] = jnp.concatenate(parts, axis=1).reshape(th, tw)
        return

    # ---- phase A (x-windowed variant, xw > 0): per (chunk, quad), only
    # evaluate the chunk's conservative column range, xw columns at a time.
    # Layout flip vs the full-width path: the eval tensor is
    # (xw sublanes, q*kc lanes), lane l = j*kc + k (row-major groups, so
    # per-j reductions are STATIC lane slices), and the best-z/id state
    # lives in VMEM scratch (q*tw, nq) in the same row-major quad-major
    # layout phase C expects — merged through dynamic 8-aligned sublane
    # windows.  Overlapping windows double-evaluate columns, which the
    # min-merge absorbs; coverage itself is still exact.
    if xw > 0:
        zb_s[...] = jnp.full((q * tw, nq), _INF, jnp.float32)
        ib_s[...] = jnp.full((q * tw, nq), _BIG, jnp.float32)
        nt = pl.num_programs(1)
        n_chunks_s = n_chunks

        def tile_lanes(v):
            return jnp.concatenate([v] * q, axis=1)  # (1, kc) -> (1, q*kc)

        jconst = (
            jax.lax.broadcasted_iota(jnp.int32, (1, q * k_chunk), 1)
            // k_chunk
        )

        def chunk_ax(ci, _):
            base = pl.multiple_of(ci * k_chunk, 128)
            c32 = bins_ref[0, :, pl.ds(base, k_chunk)]  # (32, kc)

            def lane(j):
                return c32[j:j + 1, :]

            det = lane(12)
            ids_f1 = lane(13)
            sgn = jnp.sign(det)
            a0, b0, c0 = lane(0) * sgn, lane(1) * sgn, lane(2) * sgn
            a1, b1, c1 = lane(3) * sgn, lane(4) * sgn, lane(5) * sgn
            a2, b2, c2 = lane(6) * sgn, lane(7) * sgn, lane(8) * sgn
            az, bz, cz = lane(9), lane(10), lane(11)
            inv_det = 1.0 / jnp.where(det != 0.0, det, 1.0)
            slot = jax.lax.broadcasted_iota(jnp.int32, (1, k_chunk), 1) + base
            slot_ok1 = (slot < count) & (det != 0)
            if eval_bf16:
                bf = jnp.bfloat16
                a0, b0, c0 = a0.astype(bf), b0.astype(bf), c0.astype(bf)
                a1, b1, c1 = a1.astype(bf), b1.astype(bf), c1.astype(bf)
                a2, b2, c2 = a2.astype(bf), b2.astype(bf), c2.astype(bf)
            a0t, a1t, a2t, azt = map(tile_lanes, (a0, a1, a2, az))
            b0t, b1t, b2t, bzt = map(tile_lanes, (b0, b1, b2, bz))
            c0t, c1t, c2t, czt = map(tile_lanes, (c0, c1, c2, cz))
            invt = tile_lanes(inv_det)
            okt = tile_lanes(slot_ok1)

            q_lo, q_hi = quad_range(ci)
            xv = xwin_ref[0, 0, t * n_chunks_s + ci]
            clo = xv // 512
            chi = xv % 512
            x0a = jnp.minimum((clo // 8) * 8, tw - xw)
            nw = jnp.maximum(0, (chi - x0a + xw - 1) // xw)

            def quad_body(qi, _):
                r0 = qi * q
                rows_i = jconst + (y0 + r0)
                yv = (2.0 * rows_i.astype(jnp.float32) + 1.0) / h - 1.0
                if eval_bf16:
                    yve = yv.astype(jnp.bfloat16)
                else:
                    yve = yv
                # y-dependent halves hoisted out of the window loop
                ey0 = yve * b0t + c0t
                ey1 = yve * b1t + c1t
                ey2 = yve * b2t + c2t
                eyz = yv * bzt + czt

                def win_body(wi, _):
                    x0 = pl.multiple_of(
                        jnp.minimum(x0a + wi * xw, tw - xw), 8
                    )
                    xi = (
                        jax.lax.broadcasted_iota(jnp.int32, (xw, 1), 0)
                        + (x0 + (t % ntx) * tw + ox)
                    )
                    xq = (2.0 * xi.astype(jnp.float32) + 1.0) / w - 1.0
                    xqe = xq.astype(jnp.bfloat16) if eval_bf16 else xq
                    e0 = xqe * a0t + ey0   # (xw, q*kc)
                    e1 = xqe * a1t + ey1
                    e2 = xqe * a2t + ey2
                    zlin = xq * azt + eyz
                    emin = jnp.minimum(jnp.minimum(e0, e1), e2)
                    if eval_bf16:
                        # Mosaic can't lower a bf16 compare; min in bf16
                        # (the fast part), compare in f32
                        emin = emin.astype(jnp.float32)
                    covered = emin >= 0
                    z = zlin * invt
                    ok = covered & (z >= -1.0) & (z <= 1.0) & okt
                    zm = jnp.where(ok, z, _INF)
                    sel = colq_iota == qi
                    for j in range(q):  # static
                        zm_j = zm[:, j * k_chunk : (j + 1) * k_chunk]
                        z_c = jnp.min(zm_j, axis=1, keepdims=True)
                        id_c = jnp.min(
                            jnp.where(zm_j == z_c, ids_f1, _BIG),
                            axis=1, keepdims=True,
                        )
                        cur_z = zb_s[pl.ds(j * tw + x0, xw), :]
                        cur_i = ib_s[pl.ds(j * tw + x0, xw), :]
                        zb_col = colq_get(cur_z, qi)
                        ib_col = colq_get(cur_i, qi)
                        better = z_c < zb_col
                        same = (z_c == zb_col) & (z_c < _INF)
                        new_z = jnp.where(better, z_c, zb_col)
                        new_i = jnp.where(
                            better, id_c,
                            jnp.where(
                                same, jnp.minimum(id_c, ib_col), ib_col
                            ),
                        )
                        zb_s[pl.ds(j * tw + x0, xw), :] = jnp.where(
                            sel, new_z, cur_z
                        )
                        ib_s[pl.ds(j * tw + x0, xw), :] = jnp.where(
                            sel, new_i, cur_i
                        )
                    return 0

                jax.lax.fori_loop(0, nw, win_body, 0)
                return 0

            jax.lax.fori_loop(q_lo, q_hi, quad_body, 0)
            return 0

        jax.lax.fori_loop(0, used, chunk_ax, 0)
        zb_mat = zb_s[...]
        ib_mat = ib_s[...]

    # ---- phase A: z-test; the winning id is tracked in the same pass
    # (smallest id among the chunk's zmin holders; strict < across chunks
    # keeps ties deterministic toward the smallest id regardless of order).
    #
    # cu > 1 statically unrolls cu CHUNKS per loop trip: the per-trip
    # eval -> lane-reduce chain is the measured bottleneck (serial
    # dependencies Mosaic does not pipeline across fori trips), and cu
    # independent chains in one body give the VLIW scheduler work to
    # interleave.  Each sub-chunk keeps its own row bounds; the quad loop
    # runs over their union (adjacent y-sorted chunks have near-identical
    # ranges, so the union is tight).  The last trip may clamp past the
    # real chunk list — re-evaluating a chunk is safe because the z/tie
    # merge is idempotent.
    def chunk_a(cp, carry):
        subs = []
        for s in range(cu):
            ci = jnp.minimum(cp * cu + s, clamp_hi)
            base = pl.multiple_of((cb0 + ci) * k_chunk, 128)
            c32 = bins_ref[0, :, pl.ds(base, k_chunk)]  # (32, kc)

            def lane(j, c32=c32):
                return c32[j:j + 1, :]  # (1, kc)

            det = lane(12)
            ids_f = lane(13)
            sgn = jnp.sign(det)
            # pre-scale the edge coefficients by sign(det) once per chunk
            # ((1, kc) ops), saving three (tw, kc) multiplies per row:
            # coverage becomes a plain e >= 0 test.  The rows gather
            # (phase C) still reads the ORIGINAL c32, so downstream
            # consumers see unscaled coefficients.
            a0, b0, c0 = lane(0) * sgn, lane(1) * sgn, lane(2) * sgn
            a1, b1, c1 = lane(3) * sgn, lane(4) * sgn, lane(5) * sgn
            a2, b2, c2 = lane(6) * sgn, lane(7) * sgn, lane(8) * sgn
            az, bz, cz = lane(9), lane(10), lane(11)
            if eval_bf16:
                # DD_EVAL_BF16=1: edge tests in bf16 (double VPU rate).
                # The depth plane stays f32 (winner selection quality).
                # Coverage can flip at pixels within ~bf16-eps of an edge
                # — NOT exact vs the reference rasterization; measured
                # behind the flag.
                bf = jnp.bfloat16
                a0, b0, c0 = a0.astype(bf), b0.astype(bf), c0.astype(bf)
                a1, b1, c1 = a1.astype(bf), b1.astype(bf), c1.astype(bf)
                a2, b2, c2 = a2.astype(bf), b2.astype(bf), c2.astype(bf)
            # reciprocal once per triangle (1, kc) — a (tw, kc) divide
            # costs ~10x a multiply on the VPU
            inv_det = 1.0 / jnp.where(det != 0.0, det, 1.0)
            # tile-RELATIVE slot index (base is global in compact mode)
            slot = (
                jax.lax.broadcasted_iota(jnp.int32, (1, k_chunk), 1)
                + ci * k_chunk
            )
            slot_ok = (slot < count) & (det != 0)
            if lean_eval and not (hoist_eval or split_eval or eval_bf16):
                # DD_EVAL_LEAN: invalid slots are POISONED into the lane
                # coefficients once per chunk ((1, kc) ops) instead of a
                # per-pair `& slot_ok`: c0 -> -inf forces emin = -inf so
                # the pixel test fails (NaN coefficients of degenerate
                # rows already fail it — NaN compares false).  inv_det is
                # forced to 1.0 on poisoned slots so z stays finite (an
                # inf * 0 NaN in z would poison the |z| test of VALID
                # lanes? no — lanes are independent; it keeps z's
                # where-free path well-defined).  Combined with the
                # |z| <= 1 fold below this removes 3 of ~15 per-pair ops.
                bad = jnp.logical_not(slot_ok)
                c0 = jnp.where(bad, jnp.float32(-jnp.inf), c0)
                inv_det = jnp.where(bad, 1.0, inv_det)
            q_lo_s, q_hi_s = quad_range(ci)
            xa = None
            if hoist_eval:
                # DD_EVAL_HOIST (default OFF — measured 8.40 vs 8.31 s
                # at bench scale; phase A is issue-bound, and the saved
                # multiply does not pay for the extra resident (tw, kc)
                # products): the x-halves of the edge/z planes are
                # ROW-invariant — computed once per chunk as (tw, kc)
                # products and reused by every quad visit (avg ~3.8/chunk
                # at bench scale), replacing a multiply per plane per row
                # with a cheaper add against the resident product.  Invalid
                # slots are POISONED into the lane coefficients instead of
                # a per-row mask: c -> -inf kills coverage (e = xa + ey =
                # -inf), cz -> +inf sends z to +inf (never wins the depth
                # min); NaN coefficients of degenerate rows stay safe
                # because NaN comparisons are false and `ok` is only used
                # positively.  Values on valid slots are x*a rounded then
                # + ey — bit-equality vs the unhoisted path holds as long
                # as Mosaic does not FMA-contract the unhoisted mul+add
                # (asserted by tests and tools/onchip_check.py).
                bad = jnp.logical_not(slot_ok)
                ninf = jnp.float32(-jnp.inf)
                pinf = jnp.float32(jnp.inf)
                c0 = jnp.where(bad, ninf, c0)
                cz = jnp.where(bad, pinf, cz)
                inv_det = jnp.where(bad, 1.0, inv_det)
                xa = (x1q * a0, x1q * a1, x1q * a2, x1q * az)
            subs.append((
                (a0, b0, c0, a1, b1, c1, a2, b2, c2, az, bz, cz),
                inv_det, slot_ok, ids_f, q_lo_s, q_hi_s, xa,
            ))
        q_lo, q_hi = subs[0][4], subs[0][5]
        for s in range(1, cu):
            q_lo = jnp.minimum(q_lo, subs[s][4])
            q_hi = jnp.maximum(q_hi, subs[s][5])

        def quad_body(qi, carry2):
            zb_mat, ib_mat = carry2
            r0 = qi * q
            # exact pixel_ndc formula per sub-row (integer row index first:
            # an incremental `base + j*2/h` differs in the last ulp and
            # flips edge-crossing pixels vs the reference rasterization)
            rows_i = jrow_i + (y0 + r0)
            yq = (
                2.0 * rows_i.astype(jnp.float32) + 1.0
            ) / h - 1.0  # (q*tw, 1)
            if eval_bf16:
                xqe = xq.astype(jnp.bfloat16)
                yqe = yq.astype(jnp.bfloat16)
            else:
                xqe, yqe = xq, yq
            # cu independent eval chains (interleaved by the scheduler)
            zi = []
            for s in range(cu):
                (a0, b0, c0, a1, b1, c1, a2, b2, c2, az, bz, cz), \
                    inv_det, slot_ok, ids_f, _, _, xa = subs[s]
                if hoist_eval:
                    # per-row-group eval against the chunk's resident x*a
                    # products (see the hoist block in chunk_a): per plane
                    # one (1, kc) lane FMA + one (tw, kc) broadcast add;
                    # slot validity is pre-poisoned into the coefficients
                    xa0, xa1, xa2, xaz = xa
                    z_js, id_js = [], []
                    for j in range(q):
                        row = (r0 + j + y0).astype(jnp.float32)
                        yj = (2.0 * row + 1.0) / h - 1.0
                        ey0 = yj * b0 + c0  # (1, kc)
                        ey1 = yj * b1 + c1
                        ey2 = yj * b2 + c2
                        eyz = yj * bz + cz
                        e0 = xa0 + ey0  # (tw, kc)
                        e1 = xa1 + ey1
                        e2 = xa2 + ey2
                        zlin = xaz + eyz
                        emin = jnp.minimum(jnp.minimum(e0, e1), e2)
                        z = zlin * inv_det
                        ok = (emin >= 0) & (z >= -1.0) & (z <= 1.0)
                        zm = jnp.where(ok, z, _INF)  # (tw, kc)
                        z_j = jnp.min(zm, axis=1, keepdims=True)
                        if _skip_id:  # profiling only: no id reduction
                            id_j = z_j
                        else:
                            id_j = jnp.min(
                                jnp.where(zm == z_j, ids_f, _BIG),
                                axis=1, keepdims=True,
                            )
                        z_js.append(z_j)
                        id_js.append(id_j)
                    zi.append((
                        jnp.concatenate(z_js, axis=0),
                        jnp.concatenate(id_js, axis=0),
                    ))
                    continue
                if split_eval:
                    # Per-ROW-GROUP eval: q separate (tw, kc) chains
                    # instead of one (q*tw, kc) tensor chain.  Two wins:
                    # (1) ~32 vregs live per op instead of ~128, keeping
                    # the working set inside the vector register file
                    # (the wide chain's intermediates spill to VMEM);
                    # (2) y is a SCALAR per row group, so the y-half of
                    # each edge eval is a (1, kc) op, not a (q*tw, kc)
                    # outer product.  Bit-exact vs the wide path: the
                    # per-element FMA sequence is identical.
                    z_js, id_js = [], []
                    for j in range(q):
                        row = (r0 + j + y0).astype(jnp.float32)
                        yj = (2.0 * row + 1.0) / h - 1.0
                        if eval_bf16:
                            yje = yj.astype(jnp.bfloat16)
                        else:
                            yje = yj
                        ey0 = yje * b0 + c0  # (1, kc)
                        ey1 = yje * b1 + c1
                        ey2 = yje * b2 + c2
                        eyz = yj * bz + cz
                        e0 = x1e * a0 + ey0  # (tw, kc)
                        e1 = x1e * a1 + ey1
                        e2 = x1e * a2 + ey2
                        zlin = x1q * az + eyz
                        emin = jnp.minimum(jnp.minimum(e0, e1), e2)
                        if eval_bf16:
                            emin = emin.astype(jnp.float32)
                        covered = emin >= 0
                        z = zlin * inv_det
                        ok = covered & (z >= -1.0) & (z <= 1.0) & slot_ok
                        zm = jnp.where(ok, z, _INF)  # (tw, kc)
                        z_j = jnp.min(zm, axis=1, keepdims=True)  # (tw, 1)
                        if _skip_id:  # profiling only: no id reduction
                            id_j = z_j
                        else:
                            id_j = jnp.min(
                                jnp.where(zm == z_j, ids_f, _BIG),
                                axis=1, keepdims=True,
                            )
                        z_js.append(z_j)
                        id_js.append(id_j)
                    z_s = jnp.concatenate(z_js, axis=0)  # (q*tw, 1)
                    id_s = jnp.concatenate(id_js, axis=0)
                    zi.append((z_s, id_s))
                    continue
                e0 = xqe * a0 + (yqe * b0 + c0)
                e1 = xqe * a1 + (yqe * b1 + c1)
                e2 = xqe * a2 + (yqe * b2 + c2)
                zlin = xq * az + (yq * bz + cz)
                emin = jnp.minimum(jnp.minimum(e0, e1), e2)
                if eval_bf16:
                    # Mosaic can't lower a bf16 compare; min in bf16 (the
                    # fast part), compare in f32
                    emin = emin.astype(jnp.float32)
                covered = emin >= 0
                z = zlin * inv_det
                if lean_eval and not eval_bf16:
                    # slot validity is poisoned into c0 (see chunk_a) and
                    # the two z-range compares fold into one |z| test —
                    # bit-identical: |z| <= 1 iff -1 <= z <= 1 (NaN z
                    # fails both forms)
                    ok = covered & (jnp.abs(z) <= 1.0)
                else:
                    ok = covered & (z >= -1.0) & (z <= 1.0) & slot_ok
                zm = jnp.where(ok, z, _INF)  # (q*tw, kc)
                z_s = jnp.min(zm, axis=1, keepdims=True)  # (q*tw, 1)
                id_s = jnp.min(
                    jnp.where(zm == z_s, ids_f, _BIG), axis=1, keepdims=True
                )
                zi.append((z_s, id_s))
            z_c, id_c = zi[0]
            for s in range(1, cu):
                z_s, id_s = zi[s]
                better = z_s < z_c
                same = (z_s == z_c) & (z_s < _INF)
                z_c = jnp.where(better, z_s, z_c)
                id_c = jnp.where(
                    better, id_s,
                    jnp.where(same, jnp.minimum(id_s, id_c), id_c),
                )
            zb_col = colq_get(zb_mat, qi)
            ib_col = colq_get(ib_mat, qi)
            better = z_c < zb_col
            # the finite-z guard keeps uncovered pixels (z_c == inf, which
            # compares equal to the carried inf) from merging a junk id —
            # so ib stays _BIG for background and phase C gathers nothing
            same = (z_c == zb_col) & (z_c < _INF)
            new_z = jnp.where(better, z_c, zb_col)
            new_i = jnp.where(
                better, id_c,
                jnp.where(same, jnp.minimum(id_c, ib_col), ib_col),
            )
            sel = colq_iota == qi
            return (
                jnp.where(sel, new_z, zb_mat),
                jnp.where(sel, new_i, ib_mat),
            )

        return jax.lax.fori_loop(q_lo, q_hi, quad_body, carry)

    import os as _os

    if xw == 0:
        if _os.environ.get("DD_SKIP_A") == "1":  # profiling only: no z-test
            zb_mat = jnp.full((q * tw, nq), _INF, jnp.float32)
            ib_mat = jnp.full((q * tw, nq), _BIG, jnp.float32)
        else:
            zb_mat, ib_mat = jax.lax.fori_loop(
                0, (used + cu - 1) // cu, chunk_a,
                (jnp.full((q * tw, nq), _INF, jnp.float32),
                 jnp.full((q * tw, nq), _BIG, jnp.float32)),
            )

    # ---- phase C: one-hot row gather on the MXU.  Each triangle appears
    # at most once per bin, so matching the winning id alone (masked to
    # real slots) yields the exactly-one-hot indicator — no z recheck.
    # (The zero-fill must stay unconditional: uninitialized VMEM can hold
    # NaN bit patterns, and a NaN row — even one masked by ids == 0 —
    # poisons the backward's 0 x NaN matmul products.)
    # ---- phase C, QUAD-OUTER: per quad, accumulate the one-hot gather over
    # the quad's chunk window (qclo/qchi, prefetched) in registers and write
    # each row ONCE — no read-modify-write, no upfront zero fill (quads with
    # empty windows write zeros, which also keeps NaN bit patterns from
    # uninitialized VMEM out of the backward's 0 x NaN matmul products), and
    # the winner column is extracted once per quad instead of per
    # (chunk, quad).  Window chunks that do not overlap the quad's rows
    # contribute exactly zero (the winner of a row always lies in a chunk
    # whose range contains it).
    def quad_c(qi, _):
        ib4 = colq_get(ib_mat, qi)  # (q*tw, 1)

        def chunk_c(cp, acc):
            # cu independent indicator+matmul chains per trip (see phase
            # A).  A clamped trailing sub-chunk (raw ci past the chunk
            # list) would re-accumulate a real chunk, so its slots are
            # masked off; in-range chunks outside the quad window
            # contribute exactly zero and need no mask.
            for s in range(cu):
                ci_raw = cp * cu + s
                ci = jnp.minimum(ci_raw, clamp_hi)
                base = pl.multiple_of((cb0 + ci) * k_chunk, 128)
                c32 = bins_ref[0, :, pl.ds(base, k_chunk)]  # (32, kc)
                ids_f = c32[13:14, :]
                if compact and cu == 1:
                    # compact tables carry the sentinel t_count on lane 13
                    # of every non-real slot (pack_binned), which no
                    # winner id can equal — and with cu == 1 no clamped
                    # trailing chunk is ever re-visited — so the id match
                    # alone is the exact indicator
                    indicator = (ids_f == ib4).astype(jnp.float32)
                else:
                    slot = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (1, k_chunk), 1
                        )
                        + ci * k_chunk
                    )
                    slot_ok = slot < jnp.where(ci_raw < c_lim, count, 0)
                    indicator = (
                        (ids_f == ib4) & slot_ok
                    ).astype(jnp.float32)
                # exact one-hot gather by default — see _one_hot_dot
                acc = acc + _one_hot_dot(
                    c32, indicator, (((1,), (1,)), ((), ()))
                )  # (32, q*tw)
            return acc

        qv = qwin_ref[0, 0, t * nq + qi]
        if _os.environ.get("DD_SKIP_C") == "1":  # profiling only: no gather
            qv = 0
        acc = jax.lax.fori_loop(
            (qv // 256) // cu, ((qv % 256) + cu - 1) // cu, chunk_c,
            jnp.zeros((PACKED_WIDTH, q * tw), jnp.float32),
        )
        r0 = qi * q
        for j in range(q):
            rows_ref[0, :, r0 + j, :] = acc[:, j * tw : (j + 1) * tw]
        return 0

    jax.lax.fori_loop(0, nq, quad_c, 0)

    fg = ib_mat < _BIG  # (q*tw, nq): quad-major, decoded by _untangle_ids
    idsv = jnp.where(fg, ib_mat.astype(jnp.int32) + 1, 0)
    ids_ref[0, 0] = idsv
    # second copy in PIXEL layout: (th, tw)[qi*q + j, x'] = idsv[j*tw+x', qi]
    # — one in-VMEM relayout here replaces the whole-image untangle
    # transpose XLA otherwise runs per step (~1.15 ms at bench scale); the
    # (B, Hp, Wp) result is a free reshape of this output
    idpix_ref[0] = idsv.T.reshape(th, tw)


def _bwd_kernel_v2(
    counts_ref, bounds_ref, idscm_ref, tids_ref, drows_ref, out_ref, d4s_ref,
    *, th, tw, ntx, k_chunk, q_rows, zero_tail=False, sub=1,
):
    return _bwd_kernel_body(
        counts_ref, bounds_ref, idscm_ref, tids_ref, drows_ref, out_ref,
        d4s_ref,
        th=th, tw=tw, ntx=ntx, k_chunk=k_chunk, q_rows=q_rows,
        zero_tail=zero_tail, sub=sub,
    )


def _bwd_kernel_v2_compact(
    counts_ref, off_ref, used_ref, grand_ref, bounds_ref,
    idscm_ref, tids_ref, drows_ref, out_ref, d4s_ref,
    *, th, tw, ntx, k_chunk, q_rows, totc=0, sub=1, oy=0,
):
    return _bwd_kernel_body(
        counts_ref, bounds_ref, idscm_ref, tids_ref, drows_ref, out_ref,
        d4s_ref,
        off_ref=off_ref, used_ref=used_ref, grand_ref=grand_ref,
        th=th, tw=tw, ntx=ntx, k_chunk=k_chunk, q_rows=q_rows,
        zero_tail=True, compact=True, totc=totc, sub=sub, oy=oy,
    )


def _bwd_kernel_body(
    counts_ref, bounds_ref, idscm_ref, tids_ref, drows_ref, out_ref,
    d4s_ref=None,
    off_ref=None, used_ref=None, grand_ref=None,
    *, th, tw, ntx, k_chunk, q_rows, zero_tail=False, compact=False, totc=0,
    sub=1, oy=0,
):
    """d_bin(32, kc) = sum_rows d_rows(32, q*tw) @ indicator(q*tw, kc).

    Row gating: a pixel's winner lies in chunk ci only if the pixel row is
    inside the chunk's conservative row range (a covered pixel row is always
    within the triangle's y bounds), so each chunk only walks the contiguous
    row range [rlo - y0, rhi - y0], q_rows rows per iteration (quad rounding
    only adds rows whose indicator is all-zero for this chunk — the winner
    of such a row cannot be one of the chunk's triangles).

    tids_ref: VMEM (1, 8, K) f32 — bin triangle indices (8x sublane
    broadcast so a (1, kc) row slice is layout-legal).

    compact=True (see _fwd_kernel_v2): tids and the output cover the
    ENTIRE flat table (blocks (1, 8, total) / (1, 32, total), constant
    over the tile loop); extra prefetch off_ref/used_ref give per-tile
    chunk offsets/counts and grand_ref[0] the first unused global chunk —
    the global tail [grand, totc) is zeroed by the LAST tile's instance
    (the flat cotangent flows into the packing backward, where
    uninitialized VMEM would poison the pose gradient).
    """
    bi = pl.program_id(0)
    t = pl.program_id(1)
    y0 = (t // ntx) * th + oy
    q = q_rows
    tws = tw // sub

    # NB: chunks >= used are left unwritten — every slot they hold is >=
    # count, and the inverted-bin reduction only ever gathers real slots
    # (< count), so their contents are never read.
    nq = th // q
    colq_iota = jax.lax.broadcasted_iota(jnp.int32, (1, nq), 1)
    if not compact:
        k_sub = tids_ref.shape[2]  # per-sub-tile K (tids block (sub, 8, k))
        n_chunks = k_sub // k_chunk

    # sub-tile loop (static unroll; see the fwd kernel): per-sub-tile bins
    # with the full 128-wide d_rows/ids blocks; sub == 1 is the plain path
    for s in range(sub):
        tsub = t * sub + s
        count = counts_ref[tsub]
        if compact:
            cb0 = off_ref[tsub]
            used = used_ref[tsub]
        else:
            cb0 = s * n_chunks  # chunk units within the (sub*k) block
            used = jnp.minimum((count + k_chunk - 1) // k_chunk, n_chunks)
        if sub == 1:
            ids_mat = idscm_ref[0, 0]  # (q*tw, nq) quad-major
        else:
            # ids block rows are sub-major: s*q*tws + j*tws + x'
            ids_mat = idscm_ref[0, 0, s * q * tws : (s + 1) * q * tws, :]

        def ids_colq(qi, ids_mat=ids_mat):
            return jnp.sum(
                jnp.where(colq_iota == qi, ids_mat, 0), axis=1, keepdims=True
            )  # (q*tws, 1)

        # hoist each quad's d_rows window out of the chunk loop: the (32,
        # q*tws) concat is loop-invariant in ci (the chunk-outer iteration
        # rebuilt it per (chunk, quad) visit — ~6x per quad at bench
        # occupancy); built once per (tile, quad) into VMEM scratch and
        # re-read per visit with a dynamic sublane offset
        @pl.when(used > 0)
        def _build_d4():
            for qi_s in range(nq):
                r0s = qi_s * q
                # the astype upcasts a bf16 d_rows cotangent (spanning
                # raster_loss_compact path) at the VMEM boundary; no-op
                # for the f32 chained path
                # per-slice stores, NOT a concat: slices taken at
                # different sublane indices of drows carry different
                # vector offsets and tpu.concatenate requires them to
                # match on non-concat dims ("result/input offset
                # mismatch"); separate stores let Mosaic relayout each.
                # The astype upcasts a bf16 d_rows cotangent (spanning
                # raster_loss_compact path) at the VMEM boundary; no-op
                # for the f32 chained path.
                r0d = qi_s * PACKED_WIDTH
                if sub == 1:
                    for j in range(q):
                        d4s_ref[
                            r0d : r0d + PACKED_WIDTH,
                            j * tws : (j + 1) * tws,
                        ] = drows_ref[0, :, r0s + j, :].astype(
                            d4s_ref.dtype
                        )
                else:
                    for j in range(q):
                        d4s_ref[
                            r0d : r0d + PACKED_WIDTH,
                            j * tws : (j + 1) * tws,
                        ] = drows_ref[
                            0, :, r0s + j, s * tws : (s + 1) * tws
                        ].astype(d4s_ref.dtype)

        def chunk_body(ci, _, count=count, cb0=cb0, ids_colq=ids_colq,
                       tsub=tsub, s=s):
            base = pl.multiple_of((cb0 + ci) * k_chunk, 128)
            if compact:
                ids_f = tids_ref[0, 0:1, pl.ds(base, k_chunk)]  # (1, kc)
            else:
                ids_f = tids_ref[s, 0:1, pl.ds(ci * k_chunk, k_chunk)]
            tri_id = ids_f.astype(jnp.int32) + 1
            if not compact:
                slot = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, k_chunk), 1)
                    + ci * k_chunk
                )
                slot_ok = slot < count

            def quad_body(qi, acc):
                r0 = qi * q
                ids4 = ids_colq(qi)  # (q*tws, 1)
                if compact:
                    # sentinel ids on non-real slots (see the fwd chunk_c
                    # comment): the id match alone is exact
                    indicator = (ids4 == tri_id).astype(jnp.float32)
                else:
                    indicator = (
                        (ids4 == tri_id) & slot_ok
                    ).astype(jnp.float32)
                d4 = d4s_ref[
                    pl.ds(
                        pl.multiple_of(qi * PACKED_WIDTH, PACKED_WIDTH),
                        PACKED_WIDTH,
                    ),
                    pl.ds(0, q * tws),
                ]  # (32, q*tws), hoisted — see _build_d4
                # each d_bin column sums the (few) pixels the triangle won;
                # single-pass bf16 would round every d_rows contribution to
                # 8 mantissa bits — exact by default, see _one_hot_dot
                return acc + _one_hot_dot(
                    d4, indicator, (((1,), (0,)), ((), ()))
                )  # (32, kc)

            if compact:
                v = bounds_ref[0, 0, cb0 + ci]
            else:
                v = bounds_ref[0, 0, tsub * n_chunks + ci]
            r_lo = jnp.clip(v // 1024 - 1 - y0, 0, th)
            r_hi = jnp.clip(v % 1024 - 1 - y0 + 1, 0, th)
            acc = jax.lax.fori_loop(
                r_lo // q, (r_hi + q - 1) // q, quad_body,
                jnp.zeros((PACKED_WIDTH, k_chunk), jnp.float32),
            )
            out_ref[0, :, pl.ds(base, k_chunk)] = acc
            return 0

        jax.lax.fori_loop(0, used, chunk_body, 0)

        if zero_tail and not compact:
            # the binned path DIFFERENTIATES through this output (it is the
            # packed table's cotangent): unwritten tail chunks would inject
            # uninitialized VMEM (possibly NaN bit patterns) into the
            # packing backward.  The inverted-bin path never reads them, so
            # it skips the fill.
            def tail_body(ci, _, cb0=cb0):
                base = pl.multiple_of((cb0 + ci) * k_chunk, 128)
                out_ref[0, :, pl.ds(base, k_chunk)] = jnp.zeros(
                    (PACKED_WIDTH, k_chunk), jnp.float32
                )
                return 0

            jax.lax.fori_loop(used, n_chunks, tail_body, 0)

    if compact:
        # zero the global tail [grand, totc) once, from the last tile's
        # instance (the out block is constant over the tile loop, so every
        # instance of this hypothesis sees the same resident VMEM block)
        @pl.when(t == pl.num_programs(1) - 1)
        def _zero_tail():
            def tail_body(c, _):
                base = pl.multiple_of(c * k_chunk, 128)
                out_ref[0, :, pl.ds(base, k_chunk)] = jnp.zeros(
                    (PACKED_WIDTH, k_chunk), jnp.float32
                )
                return 0

            jax.lax.fori_loop(grand_ref[0], totc, tail_body, 0)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def raster_gather_rows_v2(
    packed: Array,
    tile_idx: Array,
    tile_counts: Array,
    inv_pos: Array,
    inv_valid: Array,
    resolution: Tuple[int, int],
    tile_hw: Tuple[int, int],
    interpret: bool = False,
    gated: bool = True,
    padded: bool = False,
) -> Tuple[Array, Array]:
    """Planar vectorized rasterize + row gather.

    Args:
        packed: (B, 32, T) planar packed table (render/planar.py).
        tile_idx/tile_counts: binning output.
        inv_pos/inv_valid: gather_rows.invert_bins output.
        gated: per-(row, chunk) work gating from the y-bound lanes 30/31
            written by planar.packed_planar.  Pass False for packed tables
            without those lanes (disables gating; output is identical).
        padded: return the raw tile-padded layout (Hp, Wp) = tile-rounded
            (H, W) instead of slicing to `resolution` — pixels past the
            image edge are background (ids 0, rows 0).  The fused loss
            kernel consumes this directly, so no slice (forward) or pad
            (backward) copies are spent at the kernel boundary.

    Returns:
        ids (B, H, W) int32 (0 = background), rows (B, 32, H, W) planar
        (padded=True: (B, Hp, Wp) / (B, 32, Hp, Wp)).
    """
    _, idpix, rows, _ = _fwd_v2(
        packed, tile_idx, tile_counts, resolution, tile_hw, interpret, gated
    )
    ids = idpix if padded else idpix[:, : resolution[0], : resolution[1]]
    if not padded:
        rows = rows[:, :, : resolution[0], : resolution[1]]
    ids = jax.ad_checkpoint.checkpoint_name(ids, "raster_ids")
    rows = jax.ad_checkpoint.checkpoint_name(rows, "raster_rows")
    return ids, rows


def _untangle_ids(ids_cm, resolution, padded: bool = False, q: int = 1,
                  tw: int = None):
    """Decode the kernels' per-tile ids layout to (B, H, W) (or padded).

    The fwd kernel writes each tile as (q*tw, th//q) quad-major: lane
    column qi holds rows [qi*q, qi*q + q) stacked along sublane groups.
    Array shape (B, nty, ntx*q*tw, th//q); q=1 is plain column-major.
    tw < 128 (sub-tile binning) adds a sub-major level: block sublane
    index = s*q*tws + j*tws + x' (see _fwd_kernel_body)."""
    b, nty, wq, nq = ids_cm.shape
    if tw is None:
        tw = wq // q  # single-x-tile default
    tw_s, sub = _sub_split((0, tw))
    tws = tw_s // sub
    ntx = wq // (q * tw_s)
    # (b, ty, tx, s, j, x', qi) -> rows (ty, qi, j), cols (tx, s, x')
    ids = ids_cm.reshape(b, nty, ntx, sub, q, tws, nq)
    ids = jnp.transpose(ids, (0, 1, 6, 4, 2, 3, 5))
    ids = ids.reshape(b, nty * nq * q, ntx * sub * tws)
    if padded:
        return ids
    return ids[:, : resolution[0], : resolution[1]]


def _quad_windows(rlo, rhi, th, ntx, q, h, oy=0):
    """Per-(b, tile, quad) conservative chunk windows [qclo, qchi) (int32).

    Chunks overlapping quad qi's absolute rows; empty -> [0, 0).  Used by
    the forward's quad-outer phase C.  `oy` is the ROI crop's top row:
    tile 0 starts at absolute row oy, matching the kernels' y0."""
    b, num_tiles, nc = rlo.shape
    nq = th // q
    y0 = (jnp.arange(num_tiles, dtype=jnp.int32) // ntx) * th + oy
    q_top = y0[:, None] + jnp.arange(nq, dtype=jnp.int32)[None, :] * q
    q_bot = q_top + (q - 1)
    over = (
        (rlo[:, :, :, None] <= q_bot[None, :, None, :])
        & (rhi[:, :, :, None] >= q_top[None, :, None, :])
    )  # (b, nt, nc, nq)
    ci = jnp.arange(nc, dtype=jnp.int32)[None, None, :, None]
    any_c = jnp.any(over, axis=2)
    qclo = jnp.min(jnp.where(over, ci, nc), axis=2)
    qchi = jnp.max(jnp.where(over, ci, -1), axis=2) + 1
    qclo = jnp.where(any_c, qclo, 0).astype(jnp.int32)
    qchi = jnp.where(any_c, qchi, 0).astype(jnp.int32)
    return qclo, qchi


def _bins_planar(packed, tile_idx):
    """(B, 32, num_tiles*K) per-tile bin tables — the gather's natural
    output layout; tile t's table is columns [t*K, (t+1)*K)."""
    b, width, t_count = packed.shape
    num_tiles, k = tile_idx.shape
    safe = jnp.minimum(tile_idx, t_count - 1)
    return jnp.take(packed, safe.reshape(-1), axis=2)  # (B, 32, nt*K)


def _chunk_row_bounds(bins, tile_counts, k_chunk, h, gated):
    """Per-chunk conservative absolute pixel-row ranges (B, num_tiles, nc).

    PER HYPOTHESIS (not unioned over the batch): the bins are a shared
    superset, but each hypothesis's pose only covers its own y-interval per
    chunk — once hypotheses diverge during a refinement, per-b bounds gate
    tighter than the union.  Converted to pixel rows with one spare row of
    slack on each side (gating must never cut a covered pixel)."""
    b, width, ntk = bins.shape
    num_tiles = tile_counts.shape[0]
    k = ntk // num_tiles
    nc = k // k_chunk
    if not gated:
        return (
            jnp.zeros((b, num_tiles, nc), jnp.int32),
            jnp.full((b, num_tiles, nc), h, jnp.int32),
        )
    slot_ok = (
        jnp.arange(k, dtype=jnp.int32)[None, :] < tile_counts[:, None]
    ).reshape(1, ntk)  # (1, num_tiles*k)
    big = jnp.float32(4.0)
    ylo = jnp.where(slot_ok, bins[:, PACKED_WIDTH - 2, :], big)
    yhi = jnp.where(slot_ok, bins[:, PACKED_WIDTH - 1, :], -big)
    ylo = jnp.min(ylo.reshape(b, num_tiles, nc, k_chunk), axis=-1)
    yhi = jnp.max(yhi.reshape(b, num_tiles, nc, k_chunk), axis=-1)
    # pixel row r has NDC y = (2r+1)/h - 1, so coverage implies
    # r in [(ylo+1)h/2 - 1/2, (yhi+1)h/2 - 1/2]; half a row of slack absorbs
    # the f32 rounding between this bound and the kernel's edge-sign tests
    rlo = jnp.ceil((ylo + 1.0) * (h / 2.0) - 1.0).astype(jnp.int32)
    rhi = jnp.floor((yhi + 1.0) * (h / 2.0)).astype(jnp.int32)
    return jnp.clip(rlo, -1, h), jnp.clip(rhi, -1, h)


def _chunk_col_bounds(bins, tile_counts, k_chunk, w, tw, ntx, gated):
    """Per-chunk conservative TILE-LOCAL pixel-column ranges [clo, chi)
    (B, num_tiles, nc), from the packed x-bound lanes (28/29) — the column
    twin of _chunk_row_bounds.  Effective only with an x-locality bin sort
    (DD_SORT_BAND); with the pure y sort the per-chunk x union is ~the
    whole tile."""
    b, width, ntk = bins.shape
    num_tiles = tile_counts.shape[0]
    k = ntk // num_tiles
    nc = k // k_chunk
    if not gated:
        return (
            jnp.zeros((b, num_tiles, nc), jnp.int32),
            jnp.full((b, num_tiles, nc), tw, jnp.int32),
        )
    slot_ok = (
        jnp.arange(k, dtype=jnp.int32)[None, :] < tile_counts[:, None]
    ).reshape(1, ntk)
    big = jnp.float32(4.0)
    xlo = jnp.where(slot_ok, bins[:, PACKED_WIDTH - 4, :], big)
    xhi = jnp.where(slot_ok, bins[:, PACKED_WIDTH - 3, :], -big)
    xlo = jnp.min(xlo.reshape(b, num_tiles, nc, k_chunk), axis=-1)
    xhi = jnp.max(xhi.reshape(b, num_tiles, nc, k_chunk), axis=-1)
    # pixel col c has NDC x = (2c+1)/w - 1; coverage implies
    # c in [(xlo+1)w/2 - 1/2, (xhi+1)w/2 - 1/2]; half a column of slack
    # absorbs f32 rounding (mirrors _chunk_row_bounds)
    clo = jnp.ceil((xlo + 1.0) * (w / 2.0) - 1.0).astype(jnp.int32)
    chi = jnp.floor((xhi + 1.0) * (w / 2.0)).astype(jnp.int32) + 1  # excl
    tx0 = (
        jnp.arange(num_tiles, dtype=jnp.int32) % ntx
    )[None, :, None] * tw
    clo = jnp.clip(clo - tx0, 0, tw)
    chi = jnp.clip(chi - tx0, 0, tw)
    return clo, chi


def _pack_xwin(clo, chi):
    """(B, nt, nc) col bounds -> flat (B*nt*nc,) int32, clo*512 + chi
    (tile-local, so both in [0, 128])."""
    return (clo * 512 + chi).reshape(-1).astype(jnp.int32)


def _pick_xwin(tw: int) -> int:
    """Static x-subwindow width for the forward's phase A (0 = disabled).

    Windows narrower than the tile only pay off when chunks have
    x-locality — enable together with DD_SORT_BAND."""
    import os

    xw = int(os.environ.get("DD_XWIN", "0"))
    if xw <= 0 or xw >= tw:
        return 0
    return max(8, (xw // 8) * 8)


def _sub_split(tile_hw):
    """(th, tw_bin) -> (tw_super, sub).

    The kernels always run 128-wide super-tiles; tw_bin < 128 selects
    sub-tile BINNING (sub = 128 // tw_bin sub-tiles statically unrolled per
    kernel instance — see _fwd_kernel_body).  Output arrays stay padded to
    the super width, so nothing downstream changes shape."""
    th, tw = tile_hw
    if tw >= 128:
        return tw, 1
    if 128 % tw != 0:
        raise ValueError(f"sub-tile width must divide 128 (got {tw})")
    return 128, 128 // tw


def padded_hw(resolution, tile_hw):
    """Tile-rounded (Hp, Wp) of the raster outputs — the super-tile grid
    (width rounds to 128 even when binning uses narrower sub-tiles)."""
    h, w = resolution
    th, _ = tile_hw
    tw, _ = _sub_split(tile_hw)
    return -(-h // th) * th, -(-w // tw) * tw


def _pack_bounds(rlo, rhi, h):
    """(B, nt, nc) bounds -> flat (B*nt*nc,) int32, (rlo+1)*1024 + (rhi+1).

    SMEM pads 2-D scalar-prefetch operands' minor dim to 128 lanes — per-b
    tables at (B, nt, nc) blew the 1 MiB SMEM budget 14x; a packed flat
    vector fits (decoded in-kernel with one divmod)."""
    if h > 1022:
        raise ValueError(
            f"raster_v2 packed row bounds support images up to 1022 rows "
            f"(got H={h}); raise the radix in _pack_bounds/the kernels"
        )
    v = (rlo + 1) * 1024 + (rhi + 1)
    return v.reshape(-1).astype(jnp.int32)


def _fwd_v2(packed, tile_idx, tile_counts, resolution, tile_hw, interpret,
            gated=True):
    bins = _bins_planar(packed, tile_idx)
    return _fwd_from_bins(bins, tile_counts, resolution, tile_hw, interpret,
                          gated)


def _fwd_from_bins(bins, tile_counts, resolution, tile_hw, interpret,
                   gated=True):
    b, width, ntk = bins.shape
    assert width == PACKED_WIDTH
    h, w = resolution
    th, tw_bin = tile_hw
    tw, sub = _sub_split(tile_hw)
    nty, ntx = -(-h // th), -(-w // tw)  # SUPER-tile grid
    num_tiles = tile_counts.shape[0]  # sub-tile count (= nty*ntx*sub)
    if num_tiles != nty * ntx * sub:
        raise ValueError(
            f"tile_counts has {num_tiles} tiles; expected "
            f"{nty * ntx * sub} for {resolution} at tile_hw {tile_hw}"
        )
    k = ntk // num_tiles
    k_chunk = _pick_chunk(k)

    rlo, rhi = _chunk_row_bounds(bins, tile_counts, k_chunk, h, gated)
    bounds = _pack_bounds(rlo, rhi, h).reshape(b, 1, -1)
    q_rows = _pick_qrows(th)
    # phase C windows are per hypothesis too, packed the same flat way
    # (qclo*256 + qchi; supports up to 255 chunks per tile)
    if k // k_chunk > 255:
        raise ValueError(
            f"raster_v2 packed quad windows support up to 255 chunks per tile "
            f"(got {k // k_chunk} = K {k} / k_chunk {k_chunk}); raise the "
            f"radix in the qwin packing or lower max_tris_per_tile"
        )
    qclo, qchi = _quad_windows(rlo, rhi, th, ntx * sub, q_rows, h)
    qwin = (qclo * 256 + qchi).reshape(b, 1, -1).astype(jnp.int32)
    import os

    xw = _pick_xwin(tw) if sub == 1 else 0
    if xw > 0:
        clo, chi = _chunk_col_bounds(
            bins, tile_counts, k_chunk, w, tw, ntx, gated
        )
        xwin = _pack_xwin(clo, chi).reshape(b, 1, -1)
    else:
        # placeholder (operand must exist; unused when xw == 0)
        xwin = jnp.zeros((b, 1, 1), jnp.int32)
    _bf16 = os.environ.get("DD_EVAL_BF16", "0") == "1"
    kernel = functools.partial(
        _fwd_kernel_v2, th=th, tw=tw, ntx=ntx, h=h, w=w, k_chunk=k_chunk,
        q_rows=q_rows,
        eval_bf16=_bf16,
        xw=xw,
        cu=max(1, int(os.environ.get("DD_CUNROLL", "1"))),
        split_eval=os.environ.get("DD_EVAL_SPLIT", "0") == "1",
        hoist_eval=(
            os.environ.get("DD_EVAL_HOIST", "0") == "1" and not _bf16
        ),
        lean_eval=os.environ.get("DD_EVAL_LEAN", "1") == "1",
        sub=sub,
    )
    nq = th // q_rows
    # bounds/qwin/xwin scale with B: streamed per-hypothesis as (1, N)
    # SMEM blocks (whole-array scalar prefetch would be B*N in SMEM and
    # overflows its 1MB at escalated compact totals / large frames)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_tiles // sub),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bounds.shape[2]),
                lambda bi, ti, *_: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, qwin.shape[2]),
                lambda bi, ti, *_: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, xwin.shape[2]),
                lambda bi, ti, *_: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, PACKED_WIDTH, sub * k),
                lambda bi, ti, *_: (bi, 0, ti),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, q_rows * tw, th // q_rows),
                lambda bi, ti, *_: (bi, ti // ntx, ti % ntx, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, tw),
                lambda bi, ti, *_: (bi, ti // ntx, ti % ntx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, PACKED_WIDTH, th, tw),
                lambda bi, ti, *_: (bi, 0, ti // ntx, ti % ntx),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_rows * tw, nq), jnp.float32),
            pltpu.VMEM((q_rows * tw, nq), jnp.float32),
        ],
    )
    ids_cm, idpix, rows = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct(
                (b, nty, ntx * q_rows * tw, th // q_rows), jnp.int32
            ),
            jax.ShapeDtypeStruct((b, nty * th, ntx * tw), jnp.int32),
            jax.ShapeDtypeStruct((b, PACKED_WIDTH, nty * th, ntx * tw), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_counts, bounds, qwin, xwin, bins)
    return ids_cm, idpix, rows, bounds


def _vjp_fwd_v2(packed, tile_idx, tile_counts, inv_pos, inv_valid,
                resolution, tile_hw, interpret=False, gated=True,
                padded=False):
    ids_cm, idpix, rows, bounds = _fwd_v2(
        packed, tile_idx, tile_counts, resolution, tile_hw, interpret, gated
    )
    ids = idpix if padded else idpix[:, : resolution[0], : resolution[1]]
    rows_out = rows if padded else rows[:, :, : resolution[0], : resolution[1]]
    res = (packed.shape, tile_idx, tile_counts, ids_cm, inv_pos, inv_valid,
           bounds)
    return (ids, rows_out), res


def _dbin_flat(d_rows, ids_cm, tids, tile_counts, bounds, num_tiles, k,
               resolution, tile_hw, interpret, padded, zero_tail=False):
    """Run the backward kernel: cotangent rows -> flat (B, 32, nt*K) d_bin.

    tids: (num_tiles, 8, k) float bin triangle indices (8x sublane
    broadcast so a (1, kc) row slice is layout-legal)."""
    b = d_rows.shape[0]
    h, w = resolution
    th, tw_bin = tile_hw
    tw, sub = _sub_split(tile_hw)
    nty, ntx = -(-h // th), -(-w // tw)  # SUPER-tile grid
    k_chunk = _pick_chunk(k)

    if padded:
        d_rows_p = d_rows
    else:
        d_rows_p = jnp.pad(
            d_rows, ((0, 0), (0, 0), (0, nty * th - h), (0, ntx * tw - w))
        )

    q_rows = _pick_qrows(th)
    kernel = functools.partial(
        _bwd_kernel_v2, th=th, tw=tw, ntx=ntx, k_chunk=k_chunk,
        q_rows=q_rows, zero_tail=zero_tail, sub=sub,
    )
    bwd_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_tiles // sub),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bounds.shape[2]),
                lambda bi, ti, *_: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, q_rows * tw, th // q_rows),
                lambda bi, ti, *_: (bi, ti // ntx, ti % ntx, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (sub, 8, k), lambda bi, ti, *_: (ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, PACKED_WIDTH, th, tw),
                lambda bi, ti, *_: (bi, 0, ti // ntx, ti % ntx),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, PACKED_WIDTH, sub * k), lambda bi, ti, *_: (bi, 0, ti),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                ((th // q_rows) * PACKED_WIDTH, q_rows * (tw // sub)),
                jnp.float32,
            ),
        ],
    )
    # d_bin comes out directly in the flat (B, 32, num_tiles*K) layout
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (b, PACKED_WIDTH, num_tiles * k), jnp.float32
        ),
        grid_spec=bwd_grid,
        interpret=interpret,
    )(tile_counts, bounds, ids_cm, tids, d_rows_p)


def _vjp_bwd_v2(resolution, tile_hw, interpret, gated, padded, res,
                cotangents):
    (packed_shape, tile_idx, tile_counts, ids_cm, inv_pos, inv_valid,
     bounds) = res
    _, d_rows = cotangents
    b, width, t_count = packed_shape
    num_tiles, k = tile_idx.shape

    # bin triangle indices as a small float table (shared across batch)
    tri_f = jnp.minimum(tile_idx, t_count - 1).astype(jnp.float32)
    tids = jnp.broadcast_to(tri_f[:, None, :], (num_tiles, 8, k))
    d_bin_flat = _dbin_flat(
        d_rows, ids_cm, tids, tile_counts, bounds, num_tiles, k,
        resolution, tile_hw, interpret, padded,
    )

    # per-triangle reduction over its <=M tile occurrences (lane gathers)
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


# ---------------------------------------------------------------------------
# bin-ordered variant: the packed table arrives ALREADY in per-tile bin
# layout (planar.pack_binned), so the forward needs no lane gather and the
# backward's d_bin IS the packed cotangent — no inverted-bin reduction.
# The pose gradient flows through the packing math (an MXU einsum) instead.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def raster_gather_rows_binned(
    bins: Array,
    tile_counts: Array,
    resolution: Tuple[int, int],
    tile_hw: Tuple[int, int],
    interpret: bool = False,
    gated: bool = True,
    padded: bool = False,
) -> Tuple[Array, Array]:
    """Rasterize + row gather from a bin-ordered packed table.

    Args:
        bins: (B, 32, num_tiles*K) packed table in bin-slot order
            (planar.pack_binned); lane 13 = global triangle index.
        tile_counts: (num_tiles,) int32 bin occupancies.

    Returns: same contract as raster_gather_rows_v2.
    """
    _, idpix, rows, _ = _fwd_from_bins(
        bins, tile_counts, resolution, tile_hw, interpret, gated
    )
    ids = idpix if padded else idpix[:, : resolution[0], : resolution[1]]
    if not padded:
        rows = rows[:, :, : resolution[0], : resolution[1]]
    ids = jax.ad_checkpoint.checkpoint_name(ids, "raster_ids")
    rows = jax.ad_checkpoint.checkpoint_name(rows, "raster_rows")
    return ids, rows


def _vjp_fwd_binned(bins, tile_counts, resolution, tile_hw, interpret=False,
                    gated=True, padded=False):
    ids_cm, idpix, rows, bounds = _fwd_from_bins(
        bins, tile_counts, resolution, tile_hw, interpret, gated
    )
    ids = idpix if padded else idpix[:, : resolution[0], : resolution[1]]
    rows_out = rows if padded else rows[:, :, : resolution[0], : resolution[1]]
    num_tiles = tile_counts.shape[0]
    k = bins.shape[2] // num_tiles
    # lane 13 (global tri index) is identical across hypotheses; one copy
    # is enough for the backward's indicator tables
    tids = jnp.broadcast_to(
        bins[0, 13, :].reshape(num_tiles, 1, k), (num_tiles, 8, k)
    )
    res = (tids, tile_counts, ids_cm, bounds)
    return (ids, rows_out), res


def _vjp_bwd_binned(resolution, tile_hw, interpret, gated, padded, res,
                    cotangents):
    tids, tile_counts, ids_cm, bounds = res
    _, d_rows = cotangents
    num_tiles, _, k = tids.shape
    d_bins = _dbin_flat(
        d_rows, ids_cm, tids, tile_counts, bounds, num_tiles, k,
        resolution, tile_hw, interpret, padded, zero_tail=True,
    )
    return (d_bins, np.zeros(tile_counts.shape, jax.dtypes.float0))


raster_gather_rows_binned.defvjp(_vjp_fwd_binned, _vjp_bwd_binned)


# ---------------------------------------------------------------------------
# compact variant: the bin-ordered table is chunk-aligned COMPACT
# (planar.compact_bins) — per-tile regions at dynamic offsets instead of a
# uniform K, shrinking the table ~6x at bench scale (uniform K pads every
# tile to the worst tile's occupancy).  Everything that scales with the
# table width shrinks with it: the pack_binned math, the kernel input DMA
# (one resident block per hypothesis), and the backward's flat cotangent.
# ---------------------------------------------------------------------------

def _chunk_row_bounds_flat(bins_c, k_chunk, h, gated):
    """Per-chunk conservative absolute pixel-row ranges (B, totc) for the
    compact table.  No slot mask: compact sentinel/padding slots are
    packed as degenerate (planar.pack_binned degen_b), so their y-bound
    lanes already carry the empty interval."""
    b, width, tot = bins_c.shape
    totc = tot // k_chunk
    if not gated:
        return (
            jnp.zeros((b, totc), jnp.int32),
            jnp.full((b, totc), h, jnp.int32),
        )
    ylo = jnp.min(
        bins_c[:, PACKED_WIDTH - 2, :].reshape(b, totc, k_chunk), axis=-1
    )
    yhi = jnp.max(
        bins_c[:, PACKED_WIDTH - 1, :].reshape(b, totc, k_chunk), axis=-1
    )
    rlo = jnp.ceil((ylo + 1.0) * (h / 2.0) - 1.0).astype(jnp.int32)
    rhi = jnp.floor((yhi + 1.0) * (h / 2.0)).astype(jnp.int32)
    return jnp.clip(rlo, -1, h), jnp.clip(rhi, -1, h)


def _fwd_from_bins_compact(bins_c, tile_counts, off_c, used, resolution,
                           tile_hw, ncmax, interpret, gated=True, roi=None):
    """`roi=(oy, ox, full_h, full_w)` rasterizes only the tile-aligned
    crop window whose top-left pixel is (oy, ox), with `resolution` the
    crop's (multiple-of-tile) size: the per-pixel NDC math stays in GLOBAL
    frame coordinates (bit-identical values to the full-frame render at
    the same pixels), only the kernel grid and the ids/rows outputs shrink
    to the crop.  tile_counts/off_c/used must already be sliced to the
    crop's tiles (pipeline.make_fused_loss)."""
    b, width, tot = bins_c.shape
    assert width == PACKED_WIDTH
    h, w = resolution
    oy, ox, fh, fw = roi if roi is not None else (0, 0, h, w)
    th, tw_bin = tile_hw
    tw, sub = _sub_split(tile_hw)
    nty, ntx = -(-h // th), -(-w // tw)  # SUPER-tile grid (crop-local)
    if roi is not None and (oy % th or ox % tw or h % th or w % tw):
        raise ValueError(f"roi {roi} / {resolution} not tile-aligned")
    num_tiles = tile_counts.shape[0]  # sub-tile count
    if num_tiles != nty * ntx * sub:
        raise ValueError(
            f"tile_counts has {num_tiles} tiles; expected "
            f"{nty * ntx * sub} for {resolution} at tile_hw {tile_hw}"
        )
    k_chunk = _pick_chunk(tot)
    totc = tot // k_chunk
    q_rows = _pick_qrows(th)
    nq = th // q_rows

    rlo_f, rhi_f = _chunk_row_bounds_flat(bins_c, k_chunk, fh, gated)
    bounds = ((rlo_f + 1) * 1024 + (rhi_f + 1)).reshape(b, 1, -1).astype(jnp.int32)
    if fh > 1022:
        raise ValueError(
            f"packed row bounds support images up to 1022 rows (got H={fh})"
        )

    # densify per-tile chunk ranges (b, nt, ncmax) for the quad windows
    ci = jnp.arange(ncmax, dtype=jnp.int32)
    didx = jnp.minimum(off_c[:, None] + ci[None, :], totc - 1)  # (nt, ncmax)
    in_tile = ci[None, :] < used[:, None]
    rlo_d = jnp.where(in_tile[None], rlo_f[:, didx], fh)
    rhi_d = jnp.where(in_tile[None], rhi_f[:, didx], -1)
    qclo, qchi = _quad_windows(rlo_d, rhi_d, th, ntx * sub, q_rows, fh, oy)
    if ncmax > 255:
        raise ValueError(
            f"packed quad windows support up to 255 chunks per tile "
            f"(ncmax={ncmax})"
        )
    qwin = (qclo * 256 + qchi).reshape(b, 1, -1).astype(jnp.int32)
    xwin = jnp.zeros((b, 1, 1), jnp.int32)  # placeholder (compact has no x path)

    import os

    _bf16 = os.environ.get("DD_EVAL_BF16", "0") == "1"
    kernel = functools.partial(
        _fwd_kernel_v2_compact, th=th, tw=tw, ntx=ntx, h=fh, w=fw,
        oy=oy, ox=ox,
        k_chunk=k_chunk, q_rows=q_rows,
        eval_bf16=_bf16,
        cu=max(1, int(os.environ.get("DD_CUNROLL", "1"))),
        split_eval=os.environ.get("DD_EVAL_SPLIT", "0") == "1",
        hoist_eval=(
            os.environ.get("DD_EVAL_HOIST", "0") == "1" and not _bf16
        ),
        lean_eval=os.environ.get("DD_EVAL_LEAN", "1") == "1",
        totc=totc, sub=sub,
    )
    # bounds (b, totc) / qwin (b, nt*nq) stream per-hypothesis as (1, N)
    # SMEM blocks: whole-array prefetch is B*N ints in SMEM and overflowed
    # its 1MB when leak-recovery escalated the compact total (B=64 full
    # frame -> 5.6MB "prefetched SMEM operand" compile failure)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, num_tiles // sub),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bounds.shape[2]),
                lambda bi, ti, *_: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, qwin.shape[2]),
                lambda bi, ti, *_: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, xwin.shape[2]),
                lambda bi, ti, *_: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, PACKED_WIDTH, tot),
                lambda bi, ti, *_: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, q_rows * tw, th // q_rows),
                lambda bi, ti, *_: (bi, ti // ntx, ti % ntx, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, tw),
                lambda bi, ti, *_: (bi, ti // ntx, ti % ntx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, PACKED_WIDTH, th, tw),
                lambda bi, ti, *_: (bi, 0, ti // ntx, ti % ntx),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_rows * tw, nq), jnp.float32),
            pltpu.VMEM((q_rows * tw, nq), jnp.float32),
        ],
    )
    ids_cm, idpix, rows = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct(
                (b, nty, ntx * q_rows * tw, th // q_rows), jnp.int32
            ),
            jax.ShapeDtypeStruct((b, nty * th, ntx * tw), jnp.int32),
            jax.ShapeDtypeStruct(
                (b, PACKED_WIDTH, nty * th, ntx * tw), jnp.float32
            ),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_counts, off_c, used, bounds, qwin, xwin, bins_c)
    return ids_cm, idpix, rows, bounds


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def raster_gather_rows_compact(
    bins_c: Array,
    tile_counts: Array,
    off_c: Array,
    used: Array,
    resolution: Tuple[int, int],
    tile_hw: Tuple[int, int],
    ncmax: int,
    interpret: bool = False,
    padded: bool = False,
    roi: Optional[Tuple[int, int, int, int]] = None,
) -> Tuple[Array, Array]:
    """Rasterize + row gather from a COMPACT bin-ordered packed table.

    Args:
        bins_c: (B, 32, total) chunk-aligned compact table
            (planar.pack_binned over planar.compact_bins' flat map).
        tile_counts: (num_tiles,) int32 real occupancies.
        off_c / used: per-tile chunk offset / count (planar.compact_bins).
        ncmax: static max chunks per tile (binning K // k_chunk).

    Returns: same contract as raster_gather_rows_v2.
    """
    _, idpix, rows, _ = _fwd_from_bins_compact(
        bins_c, tile_counts, off_c, used, resolution, tile_hw, ncmax,
        interpret, roi=roi,
    )
    ids = idpix if padded else idpix[:, : resolution[0], : resolution[1]]
    if not padded:
        rows = rows[:, :, : resolution[0], : resolution[1]]
    ids = jax.ad_checkpoint.checkpoint_name(ids, "raster_ids")
    rows = jax.ad_checkpoint.checkpoint_name(rows, "raster_rows")
    return ids, rows


def _vjp_fwd_compact(bins_c, tile_counts, off_c, used, resolution,
                     tile_hw, ncmax, interpret=False, padded=False,
                     roi=None):
    ids_cm, idpix, rows, bounds = _fwd_from_bins_compact(
        bins_c, tile_counts, off_c, used, resolution, tile_hw, ncmax,
        interpret, roi=roi,
    )
    ids = idpix if padded else idpix[:, : resolution[0], : resolution[1]]
    rows_out = rows if padded else rows[:, :, : resolution[0], : resolution[1]]
    tot = bins_c.shape[2]
    tids = jnp.broadcast_to(bins_c[0:1, 13:14, :], (1, 8, tot))
    res = (tids, tile_counts, off_c, used, ids_cm, bounds)
    return (ids, rows_out), res


def _vjp_bwd_compact(resolution, tile_hw, ncmax, interpret, padded, roi,
                     res, cotangents):
    tids, tile_counts, off_c, used, ids_cm, bounds = res
    _, d_rows = cotangents
    d_bins = _compact_dbins(
        d_rows, ids_cm, tids, tile_counts, off_c, used, bounds,
        resolution, tile_hw, interpret, padded, roi=roi,
    )

    def zero_i(shape):
        return np.zeros(shape, jax.dtypes.float0)

    return (
        d_bins,
        zero_i(tile_counts.shape),
        zero_i(off_c.shape),
        zero_i(used.shape),
    )


def _compact_dbins(d_rows, ids_cm, tids, tile_counts, off_c, used, bounds,
                   resolution, tile_hw, interpret, padded, roi=None):
    """Compact backward kernel invocation: cotangent rows image (f32 or
    bf16 — the kernel upcasts at its read) -> (B, 32, tot) d_bins.
    `roi=(oy, ox, fh, fw)`: resolution is the crop size and the row
    gating runs against global row bounds offset by oy (see
    _fwd_from_bins_compact)."""
    b = d_rows.shape[0]
    tot = tids.shape[2]
    h, w = resolution
    oy = roi[0] if roi is not None else 0
    th, tw_bin = tile_hw
    tw, sub = _sub_split(tile_hw)
    nty, ntx = -(-h // th), -(-w // tw)  # SUPER-tile grid
    num_tiles = tile_counts.shape[0]
    k_chunk = _pick_chunk(tot)
    totc = tot // k_chunk
    q_rows = _pick_qrows(th)

    if padded:
        d_rows_p = d_rows
    else:
        d_rows_p = jnp.pad(
            d_rows, ((0, 0), (0, 0), (0, nty * th - h), (0, ntx * tw - w))
        )
    grand = jnp.max(off_c + used).reshape(1).astype(jnp.int32)

    kernel = functools.partial(
        _bwd_kernel_v2_compact, th=th, tw=tw, ntx=ntx, k_chunk=k_chunk,
        q_rows=q_rows, totc=totc, sub=sub, oy=oy,
    )
    bwd_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, num_tiles // sub),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bounds.shape[2]),
                lambda bi, ti, *_: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, q_rows * tw, th // q_rows),
                lambda bi, ti, *_: (bi, ti // ntx, ti % ntx, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, tot), lambda bi, ti, *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, PACKED_WIDTH, th, tw),
                lambda bi, ti, *_: (bi, 0, ti // ntx, ti % ntx),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, PACKED_WIDTH, tot), lambda bi, ti, *_: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                ((th // q_rows) * PACKED_WIDTH, q_rows * (tw // sub)),
                jnp.float32,
            ),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, PACKED_WIDTH, tot), jnp.float32),
        grid_spec=bwd_grid,
        interpret=interpret,
    )(tile_counts, off_c, used, grand, bounds, ids_cm, tids, d_rows_p)


raster_gather_rows_compact.defvjp(_vjp_fwd_compact, _vjp_bwd_compact)
