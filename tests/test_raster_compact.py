"""Compact bin-table raster (raster_gather_rows_compact) equality tests.

The compact path must be BIT-identical to the uniform-K binned path: same
kernels, same per-chunk math, only the table addressing changes
(planar.compact_bins offsets instead of t*K).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffdope_tpu import geometry as geo
from diffdope_tpu.optimize import pose_matrix, pose_params
from diffdope_tpu.render.pipeline import render_batch
from diffdope_tpu.testing import icosphere
from diffdope_tpu.mesh import build_edge_adjacency

RES = (64, 128)
B = 3


def _problem():
    v, f = icosphere(2)
    pos = jnp.asarray(v * 0.45)
    tri = jnp.asarray(f)
    edge_adj = jnp.asarray(build_edge_adjacency(f))
    colors = jnp.asarray((v * 0.5 + 0.5).astype(np.float32))
    h, w = RES
    fl = 1.1 * max(h, w)
    proj = jnp.asarray(
        geo.projection_from_intrinsics(fl, fl, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )
    rng = np.random.default_rng(3)
    q = geo.quat_from_axis_angle(rng.normal(size=3), 0.7)
    mtx, _, _ = pose_matrix(
        pose_params(np.asarray(q, np.float32), np.array([0.02, -0.01, -1.6], np.float32), B)
    )
    # distinct poses per hypothesis
    dq = geo.quat_from_axis_angle(rng.normal(size=3), 0.1)
    mtx = mtx.at[1].set(
        pose_matrix(pose_params(np.asarray(geo.quat_multiply(jnp.asarray(dq), jnp.asarray(q))), np.array([0.0, 0.03, -1.7], np.float32), 1))[0][0]
    )
    return proj, mtx, pos, tri, edge_adj, colors


def _render(proj, mtx, pos, tri, edge_adj, colors, **kw):
    return render_batch(
        proj, mtx, pos, tri, RES, vtx_color=colors, edge_adj=edge_adj,
        raster_impl="pallas", tile_hw=(32, 128), max_tris_per_tile=512,
        layout="channels", **kw,
    )


def test_compact_matches_binned():
    args = _problem()
    a = jax.jit(lambda m: _render(*((args[0], m) + args[2:])))(args[1])
    b = jax.jit(
        lambda m: _render(*((args[0], m) + args[2:]), compact_total=1024)
    )(args[1])
    for k in ("depth", "mask"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    for ca, cb in zip(a["rgb"], b["rgb"]):
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


def test_compact_gradients_match():
    proj, mtx, pos, tri, edge_adj, colors = _problem()

    def loss(m, ct):
        r = _render(proj, m, pos, tri, edge_adj, colors, compact_total=ct)
        return (
            sum(jnp.sum(c**2) for c in r["rgb"])
            + jnp.sum(r["mask"] * 1.7)
            + jnp.sum(jnp.abs(r["depth"]))
        )

    g_ref = jax.jit(jax.grad(lambda m: loss(m, None)))(mtx)
    g_c = jax.jit(jax.grad(lambda m: loss(m, 1024)))(mtx)
    np.testing.assert_allclose(
        np.asarray(g_c), np.asarray(g_ref), rtol=1e-6, atol=1e-6
    )


def test_compact_overflow_degrades_gracefully():
    proj, mtx, pos, tri, edge_adj, colors = _problem()
    # absurdly small capacity: must still run (clamped), coverage degrades
    out = jax.jit(
        lambda m: _render(
            proj, m, pos, tri, edge_adj, colors, compact_total=256
        )
    )(mtx)
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_compact_bins_exhaustive():
    from diffdope_tpu.render.planar import compact_bins

    rng = np.random.default_rng(0)
    nt, k, t_count, kc = 5, 16, 40, 4
    counts = rng.integers(0, k + 1, size=nt).astype(np.int32)
    idx = np.full((nt, k), t_count, np.int32)
    for t in range(nt):
        idx[t, : counts[t]] = rng.integers(0, t_count, size=counts[t])
    total = 32
    flat, off_c, used, ovf = jax.jit(
        lambda i, c: compact_bins(i, c, t_count, kc, total)
    )(jnp.asarray(idx), jnp.asarray(counts))
    flat, off_c, used = map(np.asarray, (flat, off_c, used))
    dropped = 0
    for t in range(nt):
        want = idx[t, : -(-counts[t] // kc) * kc] if counts[t] else idx[t, :0]
        got = flat[off_c[t] * kc : off_c[t] * kc + used[t] * kc]
        fit = len(got)
        np.testing.assert_array_equal(got, want[:fit])
        dropped += max(int(counts[t]) - fit, 0)
    assert int(ovf) == dropped
