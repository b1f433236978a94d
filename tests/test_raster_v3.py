"""raster_v3 (sorted-range, bin-list-free) vs raster_v2 equivalence.

v3 must produce bit-identical ids/rows (same exact coverage tests, same
smallest-id tie-break) and matching gradients (up to matmul contraction
grouping) — it is the cap-free fallback selected with DD_RASTER=v3."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffdope_tpu import geometry as geo
from diffdope_tpu.mesh import build_edge_adjacency
from diffdope_tpu.optimize import pose_matrix, pose_params
from diffdope_tpu.render.planar import (
    bin_triangles_planar,
    corner_planes,
    packed_planar,
)
from diffdope_tpu.render.gather_rows import invert_bins
from diffdope_tpu.render.raster_v2 import raster_gather_rows_v2
from diffdope_tpu.render.raster_v3 import raster_gather_rows_v3
from diffdope_tpu.testing import icosphere

RES = (64, 96)
B = 2


@pytest.fixture(scope="module")
def packed_scene():
    v, fc = icosphere(2)  # 320 tris -> pad to 384 (multiple of 128)
    pad = 384 - fc.shape[0]
    fc = np.concatenate([fc, np.zeros((pad, 3), fc.dtype)])
    pos = jnp.asarray(v.astype(np.float32) * 0.4)
    tri = jnp.asarray(fc.astype(np.int32))
    edge_adj = jnp.asarray(np.concatenate(
        [build_edge_adjacency(np.asarray(fc[:320])), -np.ones((pad, 3), np.int32)]
    ))
    vtx_color = jnp.asarray((v * 0.5 + 0.5).astype(np.float32))

    h, w = RES
    f = 1.2 * max(h, w)
    proj = jnp.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )
    q = geo.quat_from_axis_angle(np.array([0.2, 1.0, 0.1]), 0.8)
    t = np.array([0.0, 0.0, -2.0], np.float32)
    params = pose_params(np.asarray(q, np.float32), t, B)
    params = {k: val + jnp.arange(B) * 0.01 for k, val in params.items()}
    mtx, _, _ = pose_matrix(params)
    mvp = jnp.einsum("ij,bjk->bik", proj, mtx, precision="highest")
    pos_c = pos[tri.reshape(-1)][None]
    cp = corner_planes(pos_c, mvp)
    degen = (tri[:, 0] == tri[:, 1]) | (tri[:, 1] == tri[:, 2]) | (tri[:, 2] == tri[:, 0])
    zrot = jnp.einsum(
        "bj,bnj->bn", mtx[:, 2, :3],
        jnp.broadcast_to(pos_c, (B,) + pos_c.shape[1:]),
        precision="highest",
    )
    attrs = vtx_color[tri.reshape(-1)].reshape(384, 3, 3)
    packed, det = packed_planar(cp, attrs, zrot, edge_adj, degen)
    return packed, cp, det


def _run_v2(packed, cp, det):
    idx, counts, _ = bin_triangles_planar(cp, det, RES, (32, 128), 384)
    inv_pos, inv_valid = invert_bins(idx, packed.shape[2], 8)
    return raster_gather_rows_v2(
        packed, idx, counts, inv_pos, inv_valid, RES, (32, 128), True, True,
        False,
    )


def _run_v3(packed):
    return raster_gather_rows_v3(packed, RES, (32, 128), True, False)


def test_v3_matches_v2_outputs(packed_scene):
    packed, cp, det = packed_scene
    ids2, rows2 = jax.jit(lambda p: _run_v2(p, cp, det))(packed)
    ids3, rows3 = jax.jit(_run_v3)(packed)
    assert int((ids2 > 0).sum()) > 500  # scene actually covers pixels
    np.testing.assert_array_equal(np.asarray(ids2), np.asarray(ids3))
    np.testing.assert_array_equal(np.asarray(rows2), np.asarray(rows3))


def test_v3_matches_v2_gradients(packed_scene):
    packed, cp, det = packed_scene

    def loss2(p):
        _, r = _run_v2(p, cp, det)
        return jnp.sum(jnp.sin(r * 3.0))

    def loss3(p):
        _, r = _run_v3(p)
        return jnp.sum(jnp.sin(r * 3.0))

    g2 = jax.jit(jax.grad(loss2))(packed)
    g3 = jax.jit(jax.grad(loss3))(packed)
    mag = float(jnp.abs(g2).max())
    np.testing.assert_allclose(
        np.asarray(g2), np.asarray(g3), atol=2e-6 * max(mag, 1.0)
    )


@pytest.mark.parametrize("q", ["1", "2", "8"])
def test_v2_qrows_variants_match(packed_scene, q, monkeypatch):
    """DD_QROWS is a tuning knob: every setting must produce identical
    rasterization (quad rounding only adds no-op evaluations)."""
    packed, cp, det = packed_scene
    ids_ref, rows_ref = jax.jit(lambda p: _run_v2(p, cp, det))(packed)
    monkeypatch.setenv("DD_QROWS", q)
    ids_q, rows_q = jax.jit(lambda p: _run_v2(p, cp, det))(packed)
    np.testing.assert_array_equal(np.asarray(ids_ref), np.asarray(ids_q))
    np.testing.assert_array_equal(np.asarray(rows_ref), np.asarray(rows_q))


def test_v2_lean_eval_matches(packed_scene, monkeypatch):
    """DD_EVAL_LEAN (default on: poisoned invalid-slot coefficients + the
    |z| <= 1 fold) must be bit-identical to the explicit per-pair
    slot_ok/z-range tests."""
    packed, cp, det = packed_scene
    monkeypatch.setenv("DD_EVAL_LEAN", "0")
    ids_ref, rows_ref = jax.jit(lambda p: _run_v2(p, cp, det))(packed)
    monkeypatch.setenv("DD_EVAL_LEAN", "1")
    ids_v, rows_v = jax.jit(lambda p: _run_v2(p, cp, det))(packed)
    np.testing.assert_array_equal(np.asarray(ids_ref), np.asarray(ids_v))
    np.testing.assert_array_equal(np.asarray(rows_ref), np.asarray(rows_v))


@pytest.mark.parametrize("flag", ["DD_EVAL_HOIST", "DD_EVAL_SPLIT"])
def test_v2_eval_variants_match(packed_scene, flag, monkeypatch):
    """DD_EVAL_HOIST / DD_EVAL_SPLIT restructure the phase-A evaluation
    (resident x*a products / per-row-group chains); both are default-off
    tuning flags that must be bit-identical to the baseline eval —
    hoisting in particular relies on poisoned coefficients (-inf/+inf on
    invalid slots) reproducing the per-row masked compare exactly."""
    packed, cp, det = packed_scene
    ids_ref, rows_ref = jax.jit(lambda p: _run_v2(p, cp, det))(packed)
    monkeypatch.setenv(flag, "1")
    ids_v, rows_v = jax.jit(lambda p: _run_v2(p, cp, det))(packed)
    np.testing.assert_array_equal(np.asarray(ids_ref), np.asarray(ids_v))
    np.testing.assert_array_equal(np.asarray(rows_ref), np.asarray(rows_v))
