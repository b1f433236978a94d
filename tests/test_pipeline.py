"""End-to-end render pipeline tests with a real camera projection."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from diffdope_tpu import geometry as geo
from diffdope_tpu.render.pipeline import render_batch


def _camera(res=(64, 64)):
    h, w = res
    f = 64.0
    return geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0)


def _square_mesh(size=0.5, z=0.0):
    """Two-triangle square in the z=`z` object plane, vertex-colored."""
    v = np.array(
        [[-size, -size, z], [size, -size, z], [size, size, z], [-size, size, z]],
        np.float32,
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    col = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32)
    return jnp.asarray(v), jnp.asarray(f), jnp.asarray(col)


@partial(jax.jit, static_argnums=(4,))
def _render(proj, mtx, pos, tri_col, res):
    tri, col = tri_col
    return render_batch(
        proj, mtx, pos, tri, res, vtx_color=col, raster_impl="reference",
        return_rast_out=True,
    )


class TestRenderBatch:
    def test_depth_equals_camera_distance(self):
        res = (64, 64)
        proj = jnp.asarray(_camera(res), jnp.float32)
        pos, tri, col = _square_mesh()
        dist = 3.0
        mtx = jnp.asarray(np.diag([1, 1, 1, 1.0]).astype(np.float32))[None]
        mtx = mtx.at[0, 2, 3].set(-dist)  # OpenGL camera looks down -z
        out = _render(proj, mtx, pos, (tri, col), res)
        depth = np.asarray(out["depth"][0])
        mask = np.asarray(out["mask"][0, ..., 0])
        inside = mask > 0.99
        assert inside.sum() > 50
        np.testing.assert_allclose(depth[inside], dist, atol=1e-4)
        # reference background-depth artifact: bg = -t_z (diffdope.py:203-209)
        outside = mask < 0.01
        np.testing.assert_allclose(depth[outside], dist, atol=1e-4)

    def test_rgb_background_black_and_fg_colored(self):
        res = (64, 64)
        proj = jnp.asarray(_camera(res), jnp.float32)
        pos, tri, col = _square_mesh()
        mtx = jnp.eye(4, dtype=jnp.float32)[None].at[0, 2, 3].set(-2.0)
        out = _render(proj, mtx, pos, (tri, col), res)
        rgb = np.asarray(out["rgb"][0])
        ids = np.asarray(out["rast_out"][0, ..., 3])
        assert rgb[ids == 0].max() == 0.0
        assert rgb[ids > 0].mean() > 0.1

    def test_batched_hypotheses_shift(self):
        """Two hypotheses with different x offsets render shifted masks."""
        res = (64, 64)
        proj = jnp.asarray(_camera(res), jnp.float32)
        pos, tri, col = _square_mesh()
        m0 = np.eye(4, dtype=np.float32); m0[2, 3] = -3.0
        m1 = m0.copy(); m1[0, 3] = 0.5
        mtx = jnp.asarray(np.stack([m0, m1]))
        out = _render(proj, mtx, pos, (tri, col), res)
        mask = np.asarray(out["mask"][..., 0])
        c0 = np.argwhere(mask[0] > 0.5).mean(0)
        c1 = np.argwhere(mask[1] > 0.5).mean(0)
        assert c1[1] > c0[1] + 2  # hypothesis 1 shifted right in pixels
        np.testing.assert_allclose(c0[0], c1[0], atol=1.0)

    def test_pose_gradients_nonzero(self):
        res = (32, 32)
        proj = jnp.asarray(_camera(res), jnp.float32)
        pos, tri, col = _square_mesh()

        target_mask = None

        def loss(tx):
            mtx = jnp.eye(4, dtype=jnp.float32)[None]
            mtx = mtx.at[0, 0, 3].set(tx).at[0, 2, 3].set(-3.0)
            out = render_batch(proj, mtx, pos, tri, res, vtx_color=col, raster_impl="reference")
            return jnp.sum(out["mask"][..., 0])

        g = float(jax.jit(jax.grad(loss))(jnp.float32(0.13)))
        # translating in +x moves the square but (fully visible) area constant;
        # gradient should be ~0 for area... use an off-center crop instead:
        def loss2(tx):
            mtx = jnp.eye(4, dtype=jnp.float32)[None]
            mtx = mtx.at[0, 0, 3].set(tx).at[0, 2, 3].set(-3.0)
            out = render_batch(proj, mtx, pos, tri, res, vtx_color=col, raster_impl="reference")
            return jnp.sum(out["mask"][:, :, :16, 0])  # left half only

        g2 = float(jax.jit(jax.grad(loss2))(jnp.float32(0.0)))
        assert g2 < 0  # moving right reduces mask in the left half


class TestPlanarEquivalence:
    """The planar pallas fast path must match the reference path exactly."""

    def _render_both(self, b=2):
        import numpy as np
        from diffdope_tpu.mesh import build_edge_adjacency
        from diffdope_tpu.testing import icosphere

        res = (32, 128)
        h, w = res
        f = 40.0
        proj = jnp.asarray(
            geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
            jnp.float32,
        )
        verts, faces = icosphere(2)  # 320 tris
        pos = jnp.asarray(verts * 0.4)
        tri = jnp.asarray(faces)
        col = jnp.asarray((verts * 0.5 + 0.5).astype(np.float32))
        adj = jnp.asarray(build_edge_adjacency(faces))
        m0 = np.eye(4, dtype=np.float32); m0[2, 3] = -2.0
        m1 = m0.copy(); m1[0, 3] = 0.15
        mtx = jnp.asarray(np.stack([m0, m1])[:b])

        outs = {}
        for impl in ("reference", "pallas"):
            outs[impl] = jax.jit(
                lambda mm, impl=impl: render_batch(
                    proj, mm, pos, tri, res, vtx_color=col, edge_adj=adj,
                    raster_impl=impl, tile_hw=(8, 128), max_tris_per_tile=320,
                    return_rast_out=True,
                )
            )(mtx)
        return outs

    def test_outputs_match(self):
        """The two paths derive edge coefficients with different FMA
        orderings, so +-1ulp coverage flips on triangle-boundary pixels are
        expected; everything else must agree."""
        import numpy as np

        outs = self._render_both()
        ref, pal = outs["reference"], outs["pallas"]
        ids_r = np.asarray(ref["rast_out"][..., 3])
        ids_p = np.asarray(pal["rast_out"][..., 3])
        agree = ids_r == ids_p
        assert agree.mean() > 0.97, agree.mean()
        np.testing.assert_allclose(
            np.asarray(ref["rgb"])[agree], np.asarray(pal["rgb"])[agree], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(ref["depth"])[agree], np.asarray(pal["depth"])[agree],
            atol=1e-4,
        )
        # aggregate mask difference small (AA boundary pixels only)
        md = np.abs(np.asarray(ref["mask"]) - np.asarray(pal["mask"]))
        assert md.mean() < 2e-2, md.mean()

    def test_planar_kernel_exact_on_shared_coefficients(self):
        """With identical coefficients the planar kernel ids must equal the
        brute-force reference exactly (validates binning + kernel logic)."""
        import numpy as np
        from diffdope_tpu.render.gather_rows import (
            invert_bins,
            raster_gather_rows,
        )
        from diffdope_tpu.render.planar import bin_triangles_planar, corner_planes, packed_planar
        from diffdope_tpu.render.rasterize import raster_ids_reference
        from diffdope_tpu.mesh import build_edge_adjacency
        from diffdope_tpu.testing import icosphere

        res, tile = (32, 128), (8, 128)
        verts, faces = icosphere(2)
        f = 40.0
        proj = jnp.asarray(
            geo.projection_from_intrinsics(f, f, 64, 16, 128, 32, 0.01, 100.0),
            jnp.float32,
        )
        m0 = np.eye(4, dtype=np.float32); m0[2, 3] = -2.0
        m0[0, 3] = 0.0137  # avoid pixel centers sitting exactly on edges
        m0[1, 3] = -0.0093
        mvp = jnp.einsum("ij,bjk->bik", proj, jnp.asarray(m0)[None], precision="highest")
        pos_c = jnp.asarray(verts * 0.4)[faces.reshape(-1)]
        cp = corner_planes(pos_c, mvp)
        packed, det = packed_planar(cp, None, None, None)
        idx, counts, overflow = bin_triangles_planar(cp, det, res, tile, 320)
        assert int(overflow) == 0
        inv_pos, inv_valid = invert_bins(idx, faces.shape[0])
        ids, rows = raster_gather_rows(
            jnp.moveaxis(packed, 1, -1), idx, counts, inv_pos, inv_valid,
            res, tile, True,
        )
        coef = jnp.moveaxis(packed, 1, -1)[..., :16]
        ids_ref = raster_ids_reference(coef, res)
        # interpret-mode (no FMA) vs XLA CPU (FMA contraction) can flip
        # pixels whose centers are within ~1ulp of an edge
        agree = np.asarray(ids) == np.asarray(ids_ref)
        assert agree.mean() > 0.995, agree.mean()
        # rows match a plain gather
        gi = jnp.maximum(ids - 1, 0)
        rows_ref = jnp.take_along_axis(
            jnp.moveaxis(packed, 1, -1), gi.reshape(1, -1, 1), axis=1
        ).reshape(ids.shape + (32,))
        rows_cl = np.moveaxis(np.asarray(rows), 1, -1)
        fg = (np.asarray(ids) > 0) & agree
        np.testing.assert_allclose(rows_cl[fg], np.asarray(rows_ref)[fg], atol=0)
