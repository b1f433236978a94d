"""Antialias tests: analytic blend values, coverage gradients, no-op cases.

The key property under test: `antialias` turns discrete pixel coverage into
a continuous, differentiable function of vertex positions — sum(mask) must
change at the analytic rate d(area)/d(translation) = H*W/2 per unit NDC.
"""

import numpy as np
import jax
import jax.numpy as jnp

from diffdope_tpu.render.antialias import antialias
from diffdope_tpu.render.rasterize import rasterize

from tests.test_rasterize import clip_verts


def _halfplane_scene(edge_x, res=(16, 16)):
    """Big triangle covering x < edge_x with a vertical silhouette edge
    spanning the whole image; its other edges lie off-screen."""
    v = [(edge_x, -3.0), (edge_x, 3.0), (-3.0, 0.0)]
    pos = clip_verts(v)
    tri = jnp.asarray(np.array([[0, 1, 2]], np.int32))
    return pos, tri


from functools import partial


@partial(jax.jit, static_argnums=(2,))
def _mask_render(pos, tri, res):
    rast, _ = rasterize(pos, tri, res, impl="reference", with_db=False)
    coverage = jnp.clip(rast[..., 3:4], 0.0, 1.0)
    mask = jnp.broadcast_to(coverage, coverage.shape[:-1] + (3,))
    return antialias(mask, rast, pos, tri), rast


class TestAnalyticBlend:
    def test_vertical_edge_blend_value(self):
        res = (16, 16)
        # place the edge 30% of the way between two pixel centers
        xl = (2 * 7 + 1) / 16 - 1  # center of column 7
        px = 2 / 16
        edge_x = xl + 0.3 * px
        pos, tri = _halfplane_scene(edge_x, res)
        mask, rast = _mask_render(pos, tri, res)
        m = np.asarray(mask[0, :, :, 0])
        ids = np.asarray(rast[0, :, :, 3])
        # column 7 is the last covered column; lambda = 0.3 < 0.5 so the fg
        # pixel loses (0.5 - 0.3) of coverage; bg pixel unchanged.
        assert (ids[:, 7] > 0).all() and (ids[:, 8] == 0).all()
        np.testing.assert_allclose(m[:, 7], 0.8, atol=1e-5)
        np.testing.assert_allclose(m[:, 8], 0.0, atol=1e-5)
        np.testing.assert_allclose(m[:, :7], 1.0, atol=1e-6)

    def test_vertical_edge_blend_value_overhang(self):
        res = (16, 16)
        xl = (2 * 7 + 1) / 16 - 1
        px = 2 / 16
        edge_x = xl + 0.7 * px  # lambda = 0.7 > 0.5: fg overhangs into bg
        pos, tri = _halfplane_scene(edge_x, res)
        mask, rast = _mask_render(pos, tri, res)
        m = np.asarray(mask[0, :, :, 0])
        np.testing.assert_allclose(m[:, 7], 1.0, atol=1e-5)
        np.testing.assert_allclose(m[:, 8], 0.2, atol=1e-5)


class TestCoverageGradient:
    def test_area_rate_matches_analytic(self):
        """d(sum mask)/d(edge translation) == H * W / 2 (one channel)."""
        res = (16, 16)
        h, w = res
        xl = (2 * 7 + 1) / 16 - 1
        edge_x = xl + 0.4 * (2 / 16)

        @jax.jit
        def total_mask(dx):
            v = jnp.asarray(
                np.array([[edge_x, -3.0, 0, 1], [edge_x, 3.0, 0, 1], [-3.0, 0.0, 0, 1]], np.float32)
            )[None]
            v = v.at[..., 0].add(dx * v[..., 3])
            tri = jnp.asarray(np.array([[0, 1, 2]], np.int32))
            rast, _ = rasterize(v, tri, res, impl="reference", with_db=False)
            cov = jnp.clip(rast[..., 3:4], 0.0, 1.0)
            mask = jnp.broadcast_to(cov, cov.shape[:-1] + (3,))
            return jnp.sum(antialias(mask, rast, v, tri)[..., 0])

        g = float(jax.jit(jax.grad(total_mask))(jnp.float32(0.0)))
        np.testing.assert_allclose(g, h * w / 2.0, rtol=1e-4)

    def test_gradient_matches_fd(self):
        res = (12, 12)
        edge_x = 0.123

        @jax.jit
        def total_mask(dx):
            v = jnp.asarray(
                np.array([[edge_x, -3.0, 0, 1], [edge_x, 3.0, 0, 1], [-3.0, 0.0, 0, 1]], np.float32)
            )[None]
            v = v.at[..., 0].add(dx)
            tri = jnp.asarray(np.array([[0, 1, 2]], np.int32))
            rast, _ = rasterize(v, tri, res, impl="reference", with_db=False)
            cov = jnp.clip(rast[..., 3:4], 0.0, 1.0)
            mask = jnp.broadcast_to(cov, cov.shape[:-1] + (3,))
            return jnp.sum(antialias(mask, rast, v, tri))

        g = float(jax.jit(jax.grad(total_mask))(jnp.float32(0.0)))
        # eps: large enough to beat f32 summation noise, small enough that
        # no pixel center flips coverage (nearest center is 0.04 NDC away)
        eps = 2e-3
        fd = (float(total_mask(jnp.float32(eps))) - float(total_mask(jnp.float32(-eps)))) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=5e-3)


class TestNoOpCases:
    def test_interior_shared_edge_is_noop(self):
        """Two triangles forming a quad, same color: AA must not change the
        interior.  Quad slightly off-grid so no pixel center sits exactly on
        the shared diagonal (f32 ties there are measure-zero but real)."""
        from diffdope_tpu.mesh import build_edge_adjacency

        res = (16, 16)
        v = np.array(
            [(-0.613, -0.587), (0.611, -0.613), (0.587, 0.589), (-0.589, 0.613)],
            np.float32,
        )
        pos = clip_verts(v)
        tri_np = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        tri = jnp.asarray(tri_np)
        adj = jnp.asarray(build_edge_adjacency(tri_np))
        rast, _ = rasterize(pos, tri, res, impl="reference", with_db=False)
        color = jnp.ones(rast.shape[:-1] + (3,)) * jnp.clip(rast[..., 3:4], 0, 1)
        out = jax.jit(antialias)(color, rast, pos, tri, edge_adj=adj)
        ids = np.asarray(rast[0, ..., 3])
        assert len(np.unique(ids[ids > 0])) == 2  # both triangles visible
        interior = ids > 0
        # every covered pixel keeps full coverage except true silhouette
        # pixels (outer boundary); with the topology map the shared diagonal
        # contributes nothing anywhere, including the corners.
        d = np.asarray(out[0]) - np.asarray(color[0])
        # interior-adjacent pixels along the diagonal: unchanged
        diag = np.array([[i, i] for i in range(4, 12)])
        for i, j in diag:
            if interior[i, j]:
                np.testing.assert_allclose(d[i, j], 0.0, atol=1e-6)
        # corner blends are bounded by a half pixel per pass (no doubled
        # interior-edge blend)
        assert np.abs(d).max() <= 0.5 + 1e-6

    def test_empty_image_is_noop(self):
        res = (8, 8)
        pos = clip_verts([(5.0, 5.0), (6.0, 5.0), (5.0, 6.0)])  # off-screen
        tri = jnp.asarray(np.array([[0, 1, 2]], np.int32))
        rast, _ = rasterize(pos, tri, res, impl="reference", with_db=False)
        color = jnp.zeros(rast.shape[:-1] + (3,))
        out = jax.jit(antialias)(color, rast, pos, tri)
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_gradients_finite_everywhere(self):
        res = (8, 8)
        pos0 = clip_verts([(-0.51, -0.53), (0.57, -0.49), (-0.47, 0.55)])
        tri = jnp.asarray(np.array([[0, 1, 2]], np.int32))

        def f(pos):
            rast, _ = rasterize(pos, tri, res, impl="reference", with_db=False)
            cov = jnp.clip(rast[..., 3:4], 0, 1)
            mask = jnp.broadcast_to(cov, cov.shape[:-1] + (3,))
            return jnp.sum(antialias(mask, rast, pos, tri) ** 2)

        g = np.asarray(jax.jit(jax.grad(f))(pos0))
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0
