"""Triangle setup and screen-tile binning (pure jnp, differentiable).

Homogeneous rasterization (Olano & Greer): for a triangle with clip-space
vertices p_k = (x_k, y_k, z_k, w_k) define a_k = (x_k, y_k, w_k) and the
barycentric coefficient vectors

    c_0 = a_1 x a_2,   c_1 = a_2 x a_0,   c_2 = a_0 x a_1

so that chat_k(X, Y) = c_k . (X, Y, 1) evaluated at NDC pixel position
(X, Y) gives unnormalized perspective-correct barycentrics:

    alpha_k = chat_k / sum_j chat_j          (attribute weights)
    z/w     = (sum_k z_k c_k) . (X,Y,1) / det,   det = a_0 . (a_1 x a_2)

Coverage is "all chat_k of equal sign" (both windings accepted, like
nvdiffrast with culling disabled) and det == 0 rejects degenerates — which
also makes the zero-index padding triangles from mesh.py free.

Everything here is differentiable jnp; the Pallas id-search kernel consumes a
``stop_gradient`` copy of the same coefficients, and the differentiable
re-evaluation in rasterize.py reuses them with gradients intact — that split
is what replaces nvdiffrast's hand-written CUDA backward.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# layout of a packed setup row (padded to 16 lanes for the kernel):
#   [0:3]  c0 (coeffs of X, Y, 1)
#   [3:6]  c1
#   [6:9]  c2
#   [9:12] zc = z0*c0 + z1*c1 + z2*c2
#   [12]   det
#   [13:16] padding
SETUP_WIDTH = 16


class TriangleSetup(NamedTuple):
    """Per-triangle rasterization coefficients.

    coef: (B, T, 16) float32 packed rows (layout above).
    """

    coef: Array

    @property
    def c0(self) -> Array:
        return self.coef[..., 0:3]

    @property
    def c1(self) -> Array:
        return self.coef[..., 3:6]

    @property
    def c2(self) -> Array:
        return self.coef[..., 6:9]

    @property
    def zc(self) -> Array:
        return self.coef[..., 9:12]

    @property
    def det(self) -> Array:
        return self.coef[..., 12]


def triangle_setup(pos_clip: Array, tri: Array) -> TriangleSetup:
    """Compute packed per-triangle coefficients from indexed vertices.

    Args:
        pos_clip: (B, N, 4) float32 clip-space vertex positions.
        tri: (T, 3) int32 triangle vertex indices.

    Returns:
        TriangleSetup with coef (B, T, 16).

    Note: this entry performs a (T,3)-indexed gather of *traced* data, which
    is slow to compile and run on TPU.  The production pipeline avoids it by
    corner-expanding object-space vertices at compile time and transforming
    the expansion (a matmul) — see :func:`triangle_setup_from_corners` and
    pipeline.render_batch.
    """
    corners = pos_clip[:, tri]  # (B, T, 3, 4)
    degenerate = (
        (tri[..., 0] == tri[..., 1])
        | (tri[..., 1] == tri[..., 2])
        | (tri[..., 2] == tri[..., 0])
    )
    return triangle_setup_from_corners(corners, degenerate)


def triangle_setup_from_corners(
    corners: Array, degenerate: Optional[Array] = None
) -> TriangleSetup:
    """Packed coefficients from corner-expanded clip positions (B, T, 3, 4).

    Gather-free: on TPU the corner expansion of the *object-space* vertices
    is a compile-time constant, so the per-step cost is just the transform
    matmul plus these cross products.

    Args:
        corners: (B, T, 3, 4) per-corner clip positions.
        degenerate: optional (T,) bool marking degenerate (padding)
            triangles; they are exactly rejected (zeroed coefficients).
    """
    v = corners
    a = v[..., jnp.array([0, 1, 3])]  # (B, T, 3, 3): (x, y, w) per corner
    z = v[..., 2]  # (B, T, 3)

    a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    c0 = jnp.cross(a1, a2)
    c1 = jnp.cross(a2, a0)
    c2 = jnp.cross(a0, a1)
    det = jnp.sum(c0 * a0, axis=-1)  # (B, T)
    zc = z[..., 0:1] * c0 + z[..., 1:2] * c1 + z[..., 2:3] * c2

    # Degenerate triangles (repeated vertex indices — including the zero-index
    # padding rows from mesh.py) must be *exactly* rejected.  Algebraically
    # their cross products vanish, but XLA's FMA contraction leaves ~1e-7
    # residues whose identical coefficient rows pass the same-sign coverage
    # test along a whole half-plane (renders as a stray line).  Zero them.
    if degenerate is None:
        # detect duplicated corners positionally (works for padding rows,
        # whose three corners are bit-identical)
        degenerate = (
            jnp.all(v[..., 0, :] == v[..., 1, :], axis=-1)
            | jnp.all(v[..., 1, :] == v[..., 2, :], axis=-1)
            | jnp.all(v[..., 2, :] == v[..., 0, :], axis=-1)
        )
    keep = ~degenerate  # (T,) or (B, T)
    keepf = keep.astype(det.dtype)[..., None]
    keepf = jnp.broadcast_to(keepf, det.shape + (1,))
    c0, c1, c2, zc = c0 * keepf, c1 * keepf, c2 * keepf, zc * keepf
    det = jnp.where(jnp.broadcast_to(keep, det.shape), det, 0.0)

    pad = jnp.zeros(det.shape + (3,), det.dtype)
    coef = jnp.concatenate([c0, c1, c2, zc, det[..., None], pad], axis=-1)
    return TriangleSetup(coef=coef)


def pixel_ndc(resolution: Tuple[int, int], dtype=jnp.float32) -> Tuple[Array, Array]:
    """NDC coordinates of pixel centers.

    Returns (X, Y), each (H, W): X = (2j+1)/W - 1, Y = (2i+1)/H - 1.
    Row 0 is NDC bottom (y = -1 side) — consistent with images being
    vertically flipped at load (reference diffdope.py:1131-1132).
    """
    h, w = resolution
    # broadcasted_iota (not arange+broadcast): generated inside consumer
    # fusions, so no 1-D coordinate buffers get materialized and copied
    # around (measured ~50 ms/step of small-array copy stalls at bench scale)
    jx = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    jy = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    return (2.0 * jx + 1.0) / w - 1.0, (2.0 * jy + 1.0) / h - 1.0


def bin_triangles(
    corners: Array,
    det: Array,
    resolution: Tuple[int, int],
    tile_hw: Tuple[int, int],
    max_tris_per_tile: int,
    margin_px: float = 0.0,
) -> Tuple[Array, Array, Array]:
    """Conservative screen-tile binning, shared across the hypothesis batch.

    Pose hypotheses are perturbations of one pose, so a single binning that
    covers the *union* of every hypothesis's triangle bounding boxes is both
    correct (the kernel re-tests coverage exactly) and much cheaper than
    per-hypothesis binning: one O(T x tiles) pass instead of B of them, and
    one shared index list so the per-tile setup gather broadcasts over B.

    Args:
        corners: (B, T, 3, 4) corner-expanded clip positions (bboxes only;
            no grads).
        det: (B, T) triangle determinants (0 = degenerate).
        resolution: (H, W) in pixels.
        tile_hw: (th, tw) tile size in pixels.
        max_tris_per_tile: K — lists are truncated to this many triangles.
        margin_px: expand every bbox by this many pixels.  Lets one binning
            serve a whole refinement (poses drift only a few px per run) —
            re-binning per optimization step costs ~15ms at bench scale.

    Returns:
        idx: (num_tiles, K) int32 triangle indices (row-major tile order),
             padded with T (an out-of-range sentinel).
        counts: (num_tiles,) int32 number of valid entries per tile.
        overflow: () int32 total number of dropped (tile, tri) pairs.
    """
    h, w = resolution
    th, tw = tile_hw
    nty = -(-h // th)
    ntx = -(-w // tw)

    v = jax.lax.stop_gradient(corners)  # (B, T, 3, 4)
    x, y, wc = v[..., 0], v[..., 1], v[..., 3]
    eps = 1e-9
    safe_w = jnp.where(jnp.abs(wc) > eps, wc, eps)
    sx = x / safe_w  # (B, T, 3) NDC
    sy = y / safe_w

    # A vertex behind the camera (w <= 0) invalidates the NDC bbox; such
    # triangles are conservatively routed to every tile.
    behind = jnp.any(wc <= eps, axis=-1)  # (B, T)
    valid = jnp.any(det != 0.0, axis=0) if det.ndim == 2 else det != 0.0  # (T,)
    if det.ndim == 2:
        behind = jnp.any(behind, axis=0)
    else:
        pass

    # pixel-space bbox, union over batch
    px = (sx + 1.0) * (w / 2.0) - 0.5
    py = (sy + 1.0) * (h / 2.0) - 0.5
    px_min = jnp.min(jnp.min(px, axis=-1), axis=0) - margin_px  # (T,)
    px_max = jnp.max(jnp.max(px, axis=-1), axis=0) + margin_px
    py_min = jnp.min(jnp.min(py, axis=-1), axis=0) - margin_px
    py_max = jnp.max(jnp.max(py, axis=-1), axis=0) + margin_px

    tx_min = jnp.clip(jnp.floor(px_min / tw), 0, ntx - 1).astype(jnp.int32)
    tx_max = jnp.clip(jnp.floor(px_max / tw), 0, ntx - 1).astype(jnp.int32)
    ty_min = jnp.clip(jnp.floor(py_min / th), 0, nty - 1).astype(jnp.int32)
    ty_max = jnp.clip(jnp.floor(py_max / th), 0, nty - 1).astype(jnp.int32)

    # off-screen rejection (bbox entirely outside)
    onscreen = (px_max >= 0) & (px_min <= w - 1) & (py_max >= 0) & (py_min <= h - 1)

    tx_min = jnp.where(behind, 0, tx_min)
    tx_max = jnp.where(behind, ntx - 1, tx_max)
    ty_min = jnp.where(behind, 0, ty_min)
    ty_max = jnp.where(behind, nty - 1, ty_max)
    keep = valid & (onscreen | behind)

    t_count = corners.shape[1]
    num_tiles = nty * ntx
    tiles_y = jnp.arange(nty, dtype=jnp.int32)
    tiles_x = jnp.arange(ntx, dtype=jnp.int32)
    # overlap masks (nty, T) and (ntx, T)
    oy = (tiles_y[:, None] >= ty_min[None, :]) & (tiles_y[:, None] <= ty_max[None, :])
    ox = (tiles_x[:, None] >= tx_min[None, :]) & (tiles_x[:, None] <= tx_max[None, :])
    mask = (oy[:, None, :] & ox[None, :, :] & keep[None, None, :]).reshape(num_tiles, t_count)

    # first-K compaction by ascending triangle index: sentinel-sort
    sentinel = jnp.int32(t_count)
    vals = jnp.where(mask, jnp.arange(t_count, dtype=jnp.int32)[None, :], sentinel)
    k = min(max_tris_per_tile, t_count)
    # top_k on negated values selects the K smallest indices
    neg_topk, _ = jax.lax.top_k(-vals, k)
    idx = -neg_topk  # (num_tiles, K), ascending
    counts_full = jnp.sum(mask, axis=-1).astype(jnp.int32)
    counts = jnp.minimum(counts_full, k)
    overflow = jnp.sum(jnp.maximum(counts_full - k, 0))
    # pad K to a multiple of the kernel chunk (sentinel columns, never read)
    k_pad = -(-k // 128) * 128
    if k_pad != k:
        idx = jnp.pad(idx, ((0, 0), (0, k_pad - k)), constant_values=t_count)
    return idx, counts, overflow
