"""Rasterizer unit tests: analytic scenes, impl equivalence, gradient checks.

Mirrors the reference's dual-path validation discipline (`use_python=True`
in reference ops.py) — every op is checked against an independent numpy
formulation, and the Pallas kernel against the pure-jnp twin.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffdope_tpu.render.rasterize import (
    rasterize,
    raster_ids_reference,
    raster_ids_pallas,
    rast_from_ids,
)
from diffdope_tpu.render.setup_tris import triangle_setup, bin_triangles, pixel_ndc
from diffdope_tpu.render.interpolate import interpolate
from diffdope_tpu.render.texture import texture


def clip_verts(v2d, z=0.0, w=1.0):
    """(N,2) screen NDC verts -> (1,N,4) clip positions with given z/w."""
    v2d = np.asarray(v2d, np.float32)
    n = len(v2d)
    z = np.broadcast_to(np.asarray(z, np.float32), (n,))
    w = np.broadcast_to(np.asarray(w, np.float32), (n,))
    out = np.stack([v2d[:, 0] * w, v2d[:, 1] * w, z * w, w], axis=1)
    return jnp.asarray(out[None])


TRI1 = jnp.asarray(np.array([[0, 1, 2]], np.int32))


class TestSingleTriangle:
    # right triangle with legs 1.0 in NDC
    V = [(-0.5, -0.5), (0.5, -0.5), (-0.5, 0.5)]

    def _rast(self, res=(8, 8), impl="reference"):
        pos = clip_verts(self.V)
        return rasterize(pos, TRI1, res, impl=impl)

    def test_coverage(self):
        rast, _ = self._rast()
        ids = np.asarray(rast[0, :, :, 3])
        # pixel centers at NDC (2k+1)/8-1; inside the tri iff
        # x >= -0.5, y >= -0.5, x + y <= 0
        expected = np.zeros((8, 8), bool)
        for i in range(8):
            for j in range(8):
                x = (2 * j + 1) / 8 - 1
                y = (2 * i + 1) / 8 - 1
                expected[i, j] = (x >= -0.5) and (y >= -0.5) and (x + y <= 0)
        np.testing.assert_array_equal(ids > 0, expected)

    def test_barycentrics_analytic(self):
        rast, _ = self._rast()
        r = np.asarray(rast[0])
        # with w=1 the barycentrics are affine: u (weight of vertex 1)
        # = x + 0.5, v (weight of vertex 2) = y + 0.5
        for (i, j) in [(1, 1), (2, 1), (1, 2), (3, 0)]:
            x = (2 * j + 1) / 8 - 1
            y = (2 * i + 1) / 8 - 1
            if r[i, j, 3] > 0:
                np.testing.assert_allclose(r[i, j, 0], x + 0.5, atol=1e-5)
                np.testing.assert_allclose(r[i, j, 1], y + 0.5, atol=1e-5)

    def test_background_zero(self):
        rast, db = self._rast()
        r = np.asarray(rast[0])
        bg = r[..., 3] == 0
        assert bg.any()
        np.testing.assert_array_equal(r[bg], 0.0)
        np.testing.assert_array_equal(np.asarray(db[0])[bg], 0.0)

    def test_zw_channel(self):
        pos = clip_verts(self.V, z=0.25)
        rast, _ = rasterize(pos, TRI1, (8, 8), impl="reference")
        r = np.asarray(rast[0])
        fg = r[..., 3] > 0
        np.testing.assert_allclose(r[fg][:, 2], 0.25, atol=1e-5)

    def test_both_windings_rasterize(self):
        pos = clip_verts(self.V)
        tri_rev = jnp.asarray(np.array([[0, 2, 1]], np.int32))
        rast_fwd, _ = rasterize(pos, TRI1, (8, 8), impl="reference")
        rast_rev, _ = rasterize(pos, tri_rev, (8, 8), impl="reference")
        np.testing.assert_array_equal(
            np.asarray(rast_fwd[..., 3] > 0), np.asarray(rast_rev[..., 3] > 0)
        )


class TestDepthTest:
    def test_nearer_triangle_wins(self):
        # two stacked triangles, second closer (smaller z/w)
        v = np.array(
            [[-0.8, -0.8], [0.8, -0.8], [-0.8, 0.8],
             [-0.8, -0.8], [0.8, -0.8], [-0.8, 0.8]], np.float32
        )
        pos = clip_verts(v, z=np.array([0.5] * 3 + [-0.5] * 3, np.float32))
        tri = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5]], np.int32))
        rast, _ = rasterize(pos, tri, (8, 8), impl="reference")
        ids = np.asarray(rast[0, :, :, 3])
        assert (ids[ids > 0] == 2).all()

    def test_out_of_range_z_clipped(self):
        pos = clip_verts(TestSingleTriangle.V, z=1.5)  # beyond far plane
        rast, _ = rasterize(pos, TRI1, (8, 8), impl="reference")
        assert (np.asarray(rast[..., 3]) == 0).all()


class TestPerspective:
    def test_perspective_correct_interpolation(self):
        rng = np.random.default_rng(0)
        v2d = np.array([(-0.6, -0.6), (0.7, -0.5), (-0.4, 0.7)], np.float32)
        w = np.array([1.0, 2.0, 4.0], np.float32)
        pos = clip_verts(v2d, z=0.0, w=w)
        attr = jnp.asarray(np.array([[0.0], [1.0], [2.0]], np.float32))
        res = (16, 16)
        rast, _ = rasterize(pos, TRI1, res, impl="reference")
        out, _ = interpolate(attr, rast, TRI1)
        r = np.asarray(rast[0])
        o = np.asarray(out[0, ..., 0])

        # independent numpy check via screen-space barycentrics
        def screen_bary(px, py):
            s = v2d  # screen NDC verts (w divides out since we built them so)
            d = (s[1, 1] - s[2, 1]) * (s[0, 0] - s[2, 0]) + (s[2, 0] - s[1, 0]) * (s[0, 1] - s[2, 1])
            b0 = ((s[1, 1] - s[2, 1]) * (px - s[2, 0]) + (s[2, 0] - s[1, 0]) * (py - s[2, 1])) / d
            b1 = ((s[2, 1] - s[0, 1]) * (px - s[2, 0]) + (s[0, 0] - s[2, 0]) * (py - s[2, 1])) / d
            return b0, b1, 1 - b0 - b1

        checked = 0
        for i in range(16):
            for j in range(16):
                if r[i, j, 3] > 0:
                    px = (2 * j + 1) / 16 - 1
                    py = (2 * i + 1) / 16 - 1
                    b0, b1, b2 = screen_bary(px, py)
                    pw = np.array([b0 / w[0], b1 / w[1], b2 / w[2]])
                    alpha = pw / pw.sum()
                    expected = alpha @ np.array([0.0, 1.0, 2.0])
                    np.testing.assert_allclose(o[i, j], expected, atol=1e-4)
                    checked += 1
        assert checked > 10


def _random_scene(rng, n_tri=40, spread=0.9):
    """Random small triangles across the screen with varied depth, w>0."""
    base = rng.uniform(-spread, spread, size=(n_tri, 1, 2))
    offs = rng.uniform(-0.25, 0.25, size=(n_tri, 3, 2))
    v2d = (base + offs).reshape(-1, 2).astype(np.float32)
    z = rng.uniform(-0.8, 0.8, size=(3 * n_tri,)).astype(np.float32)
    w = rng.uniform(0.5, 2.0, size=(3 * n_tri,)).astype(np.float32)
    pos = clip_verts(v2d, z=z, w=w)
    tri = jnp.asarray(np.arange(3 * n_tri, dtype=np.int32).reshape(n_tri, 3))
    return pos, tri


class TestPallasEquivalence:
    @pytest.mark.parametrize("res,tile", [((32, 128), (8, 128)), ((48, 256), (16, 128))])
    def test_ids_match_reference(self, res, tile):
        rng = np.random.default_rng(42)
        pos, tri = _random_scene(rng)
        setup = triangle_setup(pos, tri)
        ids_ref = raster_ids_reference(setup.coef, res)
        idx, counts, overflow = bin_triangles(pos[:, tri], setup.det, res, tile, 64)
        assert int(overflow) == 0
        ids_pal = raster_ids_pallas(setup.coef, idx, counts, res, tile, interpret=True)
        np.testing.assert_array_equal(np.asarray(ids_ref), np.asarray(ids_pal))

    def test_batched_poses_differ(self):
        rng = np.random.default_rng(1)
        pos, tri = _random_scene(rng, n_tri=10)
        pos2 = jnp.concatenate([pos, pos + jnp.asarray([0.3, 0, 0, 0])], axis=0)
        res, tile = (32, 128), (8, 128)
        setup = triangle_setup(pos2, tri)
        idx, counts, _ = bin_triangles(pos2[:, tri], setup.det, res, tile, 64)
        ids = raster_ids_pallas(setup.coef, idx, counts, res, tile, interpret=True)
        ids_ref = raster_ids_reference(setup.coef, res)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
        assert (np.asarray(ids[0]) != np.asarray(ids[1])).any()


class TestGradients:
    def test_bary_gradients_match_fd(self):
        """Finite-difference check of d(sum u+v)/d(pos_clip).

        The triangle is chosen so no pixel center lies exactly on an edge:
        coverage then stays constant under the FD perturbation and the
        finite difference probes the same smooth function autodiff sees
        (coverage changes are non-differentiable by contract — they are
        handled by `antialias`)."""
        pos0 = clip_verts([(-0.51, -0.53), (0.57, -0.49), (-0.47, 0.55)])
        res = (8, 8)

        def f(pos):
            rast, _ = rasterize(pos, TRI1, res, impl="reference", with_db=False)
            return jnp.sum(rast[..., 0] + rast[..., 1] * 0.7 + rast[..., 2] * 0.3)

        g = np.asarray(jax.grad(f)(pos0))
        eps = 1e-3
        pos_np = np.asarray(pos0)
        for (n, c) in [(0, 0), (1, 0), (2, 1), (0, 3), (1, 3)]:
            dp = np.zeros_like(pos_np)
            dp[0, n, c] = eps
            fp = float(f(jnp.asarray(pos_np + dp)))
            fm = float(f(jnp.asarray(pos_np - dp)))
            fd = (fp - fm) / (2 * eps)
            np.testing.assert_allclose(g[0, n, c], fd, rtol=2e-2, atol=1e-3)

    def test_interpolate_gradients(self):
        pos = clip_verts(TestSingleTriangle.V)
        attr0 = jnp.asarray(np.array([[0.1], [0.9], [0.4]], np.float32))
        rast, _ = rasterize(pos, TRI1, (8, 8), impl="reference")

        def f(attr):
            out, _ = interpolate(attr, rast, TRI1)
            return jnp.sum(out ** 2)

        g = np.asarray(jax.grad(f)(attr0))
        eps = 1e-3
        a = np.asarray(attr0)
        for n in range(3):
            dp = np.zeros_like(a)
            dp[n, 0] = eps
            fd = (float(f(jnp.asarray(a + dp))) - float(f(jnp.asarray(a - dp)))) / (2 * eps)
            np.testing.assert_allclose(g[n, 0], fd, rtol=1e-3, atol=1e-5)


class TestTexture:
    def test_bilinear_matches_manual(self):
        rng = np.random.default_rng(3)
        tex = jnp.asarray(rng.uniform(size=(8, 8, 3)).astype(np.float32))
        uv = jnp.asarray(rng.uniform(0.1, 0.9, size=(1, 4, 4, 2)).astype(np.float32))
        out = np.asarray(texture(tex, uv))
        t = np.asarray(tex)
        u = np.asarray(uv)[0]
        for i in range(4):
            for j in range(4):
                fx = u[i, j, 0] * 8 - 0.5
                fy = u[i, j, 1] * 8 - 0.5
                x0, y0 = int(np.floor(fx)), int(np.floor(fy))
                ax, ay = fx - x0, fy - y0
                manual = (
                    t[y0 % 8, x0 % 8] * (1 - ax) * (1 - ay)
                    + t[y0 % 8, (x0 + 1) % 8] * ax * (1 - ay)
                    + t[(y0 + 1) % 8, x0 % 8] * (1 - ax) * ay
                    + t[(y0 + 1) % 8, (x0 + 1) % 8] * ax * ay
                )
                np.testing.assert_allclose(out[0, i, j], manual, atol=1e-5)

    def test_uv_gradients(self):
        tex = jnp.asarray(np.arange(64, dtype=np.float32).reshape(8, 8, 1) / 64)
        uv0 = jnp.asarray(np.full((1, 2, 2, 2), 0.4, np.float32))

        def f(uv):
            return jnp.sum(texture(tex, uv))

        g = np.asarray(jax.grad(f)(uv0))
        assert np.isfinite(g).all()
        eps = 1e-3
        u = np.asarray(uv0)
        dp = np.zeros_like(u)
        dp[0, 0, 0, 1] = eps
        fd = (float(f(jnp.asarray(u + dp))) - float(f(jnp.asarray(u - dp)))) / (2 * eps)
        np.testing.assert_allclose(g[0, 0, 0, 1], fd, rtol=1e-2, atol=1e-4)

    def test_nearest_mode(self):
        tex = jnp.asarray(np.eye(4, dtype=np.float32)[..., None])
        uv = jnp.asarray(np.array([[[[0.13, 0.13], [0.63, 0.63]]]], np.float32))
        out = np.asarray(texture(tex, uv, filter_mode="nearest"))
        np.testing.assert_allclose(out[0, 0, 0, 0], 1.0)
        np.testing.assert_allclose(out[0, 0, 1, 0], 1.0)


# ---------------------------------------------------------------------------
# mipmapped texture sampling (nvdiffrast filter_mode contract)
# ---------------------------------------------------------------------------

class TestTextureMips:
    def _tex(self, n=16, c=3, seed=0):
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.uniform(size=(n, n, c)).astype(np.float32))

    def _uv_grid(self, b, h, w):
        u = (np.arange(w) + 0.5) / w
        v = (np.arange(h) + 0.5) / h
        uu, vv = np.meshgrid(u, v)
        uv = np.stack([uu, vv], -1).astype(np.float32)
        return jnp.asarray(np.broadcast_to(uv, (b, h, w, 2)))

    def _uv_da(self, b, h, w, du_dx):
        """Uniform derivatives: du/dx = dv/dy = du_dx, cross terms 0."""
        da = np.zeros((b, h, w, 4), np.float32)
        da[..., 0] = du_dx
        da[..., 3] = du_dx
        return jnp.asarray(da)

    def test_pyramid_is_box_filter(self):
        from diffdope_tpu.render.texture import build_mip_pyramid

        tex = self._tex(8)
        levels = build_mip_pyramid(tex)
        assert [lv.shape[1] for lv in levels] == [8, 4, 2, 1]
        expect = np.asarray(tex).reshape(4, 2, 4, 2, 3).mean(axis=(1, 3))
        np.testing.assert_allclose(np.asarray(levels[1][0]), expect, rtol=1e-6)

    @pytest.mark.parametrize("level", [0, 1, 2])
    def test_exact_level_matches_direct_bilinear(self, level):
        """uv_da sized for lod == level -> sampling equals bilinear of that
        pyramid level."""
        from diffdope_tpu.render.texture import build_mip_pyramid, texture

        tex = self._tex(16)
        levels = build_mip_pyramid(tex)
        b, h, w = 2, 5, 7
        uv = self._uv_grid(b, h, w)
        # footprint (du*tw)^2 == (2^level)^2  ->  lod == level
        da = self._uv_da(b, h, w, (2.0 ** level) / 16.0)
        out = texture(tex, uv, da, filter_mode="linear-mipmap-nearest")
        direct = texture(levels[level], uv, filter_mode="linear")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(direct), rtol=1e-5, atol=1e-6
        )

    def test_trilinear_blends_adjacent_levels(self):
        from diffdope_tpu.render.texture import texture

        tex = self._tex(16)
        b, h, w = 1, 4, 4
        uv = self._uv_grid(b, h, w)
        # lod = 0.5 exactly: halfway between levels 0 and 1
        da = self._uv_da(b, h, w, (2.0 ** 0.5) / 16.0)
        out = texture(tex, uv, da, filter_mode="linear-mipmap-linear")
        v0 = texture(tex, uv, self._uv_da(b, h, w, 1.0 / 16.0),
                     filter_mode="linear-mipmap-linear")
        v1 = texture(tex, uv, self._uv_da(b, h, w, 2.0 / 16.0),
                     filter_mode="linear-mipmap-linear")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(0.5 * (v0 + v1)), rtol=1e-5, atol=1e-6
        )

    def test_constant_texture_any_lod(self):
        from diffdope_tpu.render.texture import texture

        tex = jnp.full((8, 8, 3), 0.625, jnp.float32)
        b, h, w = 1, 3, 3
        uv = self._uv_grid(b, h, w)
        for du in (0.5 / 8, 1.0 / 8, 3.7 / 8, 64.0 / 8):
            out = texture(tex, uv, self._uv_da(b, h, w, du),
                          filter_mode="linear-mipmap-linear")
            np.testing.assert_allclose(np.asarray(out), 0.625, rtol=1e-6)

    def test_mip_gradients_flow(self):
        from diffdope_tpu.render.texture import texture

        tex = self._tex(8)
        b, h, w = 1, 4, 4
        uv = self._uv_grid(b, h, w)
        da = self._uv_da(b, h, w, 1.5 / 8.0)

        def loss_tex(t):
            return jnp.sum(texture(t, uv, da, filter_mode="linear-mipmap-linear") ** 2)

        def loss_uv(u):
            return jnp.sum(texture(tex, u, da, filter_mode="linear-mipmap-linear") ** 2)

        gt = jax.grad(loss_tex)(tex)
        gu = jax.grad(loss_uv)(uv)
        assert np.isfinite(np.asarray(gt)).all() and np.abs(np.asarray(gt)).sum() > 0
        assert np.isfinite(np.asarray(gu)).all()

    def test_mip_requires_uv_da(self):
        from diffdope_tpu.render.texture import texture

        tex = self._tex(8)
        uv = self._uv_grid(1, 2, 2)
        with pytest.raises(ValueError):
            texture(tex, uv, filter_mode="linear-mipmap-linear")


def test_texture_planar_packed_bit_exact():
    """pack_bilinear_blocks + texture_planar_packed == texture_planar on
    an 8-bit-quantized texture (every PNG): identical tap values, lerp
    equal to a few ulp (XLA fuses the unpack into the lerp with different
    FMA groupings than the f32-gather version)."""
    from diffdope_tpu.render.texture import (
        pack_bilinear_blocks,
        texture_planar,
        texture_planar_packed,
    )

    rng = np.random.default_rng(7)
    tex = (rng.integers(0, 256, size=(64, 48, 3)).astype(np.float32) / 255.0)
    u = rng.uniform(-0.2, 1.2, size=(2, 33, 40)).astype(np.float32)
    v = rng.uniform(-0.2, 1.2, size=(2, 33, 40)).astype(np.float32)
    for mode in ("wrap",):
        tables = pack_bilinear_blocks(tex, boundary_mode=mode)
        assert tables is not None
        ref = jax.jit(
            lambda uu, vv: texture_planar(
                jnp.asarray(tex), uu, vv, boundary_mode=mode
            )
        )(jnp.asarray(u), jnp.asarray(v))
        got = jax.jit(
            lambda uu, vv: texture_planar_packed(
                jnp.asarray(tables), 64, 48, uu, vv, boundary_mode=mode
            )
        )(jnp.asarray(u), jnp.asarray(v))
        for r, g in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(r), np.asarray(g), rtol=0, atol=4e-7
            )
    # non-quantized texture / unsupported boundary: packing must refuse
    assert pack_bilinear_blocks(tex + 1e-3 * rng.standard_normal(tex.shape).astype(np.float32)) is None
    assert pack_bilinear_blocks(tex, boundary_mode="clamp") is None
