"""Fused raster+gather op: equivalence with the reference path and a
custom-VJP gradient check against the plain gather/scatter formulation."""

import numpy as np
import jax
import jax.numpy as jnp

from diffdope_tpu.render.gather_rows import invert_bins, raster_gather_rows
from diffdope_tpu.render.rasterize import raster_ids_reference
from diffdope_tpu.render.setup_tris import bin_triangles, triangle_setup
from diffdope_tpu.render.shade import pack_rows, silhouette_bits, TriangleSetup

from tests.test_rasterize import _random_scene

RES = (32, 128)
TILE = (8, 128)


def _setup_scene(seed=0, n_tri=30, b_extra=False):
    rng = np.random.default_rng(seed)
    pos, tri = _random_scene(rng, n_tri=n_tri)
    if b_extra:
        pos = jnp.concatenate([pos, pos + jnp.asarray([0.2, -0.1, 0, 0])], 0)
    setup = triangle_setup(pos, tri)
    corners = pos[:, tri]
    idx, counts, _ = bin_triangles(corners, setup.det, RES, TILE, 64)
    inv_pos, inv_valid = invert_bins(idx, tri.shape[0])
    planes = jnp.zeros(setup.det.shape + (4, 3))
    packed = pack_rows(setup, silhouette_bits(setup.det, None), planes)
    return pos, tri, setup, packed, idx, counts, inv_pos, inv_valid


class TestFusedForward:
    def test_ids_and_rows_match_reference(self):
        pos, tri, setup, packed, idx, counts, inv_pos, inv_valid = _setup_scene()
        ids, rows = raster_gather_rows(
            packed, idx, counts, inv_pos, inv_valid, RES, TILE, True
        )
        ids_ref = raster_ids_reference(setup.coef, RES)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
        # rows are channel-planar (B, 32, H, W); must equal a plain gather
        # for fg pixels, zeros at background
        gi = jnp.maximum(ids - 1, 0)
        rows_ref = jnp.take_along_axis(
            packed, gi.reshape(ids.shape[0], -1, 1), axis=1
        ).reshape(ids.shape + (32,))
        rows_cl = np.moveaxis(np.asarray(rows), 1, -1)  # -> (B, H, W, 32)
        fg = np.asarray(ids) > 0
        np.testing.assert_allclose(rows_cl[fg], np.asarray(rows_ref)[fg], atol=0)
        np.testing.assert_array_equal(rows_cl[~fg], 0.0)

    def test_batched(self):
        pos, tri, setup, packed, idx, counts, inv_pos, inv_valid = _setup_scene(
            seed=1, b_extra=True
        )
        ids, rows = raster_gather_rows(
            packed, idx, counts, inv_pos, inv_valid, RES, TILE, True
        )
        assert ids.shape[0] == 2
        assert (np.asarray(ids[0]) != np.asarray(ids[1])).any()


class TestInvertBins:
    def test_inversion_covers_all_occurrences(self):
        _, tri, _, _, idx, counts, inv_pos, inv_valid = _setup_scene(seed=2)
        idx_np = np.asarray(idx)
        pos_np = np.asarray(inv_pos)
        val_np = np.asarray(inv_valid)
        flat = idx_np.reshape(-1)
        for t in range(tri.shape[0]):
            expected = set(np.nonzero(flat == t)[0].tolist())
            got = set(pos_np[t][val_np[t]].tolist())
            assert got == expected, t


class TestCustomVJP:
    def test_grad_matches_plain_gather(self):
        pos, tri, setup, packed, idx, counts, inv_pos, inv_valid = _setup_scene(seed=3)

        def loss_fused(p):
            ids, rows = raster_gather_rows(
                p, idx, counts, inv_pos, inv_valid, RES, TILE, True
            )
            return jnp.sum(rows * rows * 0.5)

        def loss_plain(p):
            ids = raster_ids_reference(
                TriangleSetup(jax.lax.stop_gradient(p)).coef
                if False else jax.lax.stop_gradient(p)[..., :16],
                RES,
            )
            gi = jnp.maximum(ids - 1, 0)
            rows = jnp.take_along_axis(
                p, gi.reshape(ids.shape[0], -1, 1), axis=1
            ).reshape(ids.shape + (32,))
            rows = jnp.where((ids > 0)[..., None], rows, 0.0)
            return jnp.sum(rows * rows * 0.5)

        g_fused = np.asarray(jax.grad(loss_fused)(packed))
        g_plain = np.asarray(jax.grad(loss_plain)(packed))
        # matmul-accumulated backward vs scatter: f32 ordering noise only
        np.testing.assert_allclose(g_fused, g_plain, atol=1e-4)


class TestInvertBinsSizing:
    """VERDICT r1 item 7: occurrences beyond max_occ silently truncate
    gradients; 'auto' must size to the exact occupancy."""

    def _many_tile_scene(self):
        """One triangle spanning every tile (4 x 4 grid > default slack)."""
        import jax.numpy as jnp

        # clip-space corners covering the full screen, w = 1
        pos = jnp.asarray(
            [[-3.0, -3.0, 0.2, 1.0], [3.0, -1.0, 0.2, 1.0], [0.0, 3.0, 0.2, 1.0]],
            jnp.float32,
        )[None]
        tri = jnp.asarray([[0, 1, 2]], jnp.int32)
        return pos, tri

    def test_auto_sizes_to_exact_occupancy(self):
        from diffdope_tpu.render.gather_rows import bin_occupancy

        pos, tri = self._many_tile_scene()
        setup = triangle_setup(pos, tri)
        corners = pos[:, tri]
        res, tile = (32, 512), (8, 128)
        idx, counts, _ = bin_triangles(corners, setup.det, res, tile, 8)
        occ = int(bin_occupancy(idx, 1))
        assert occ == 16  # 4 tile rows x 4 tile cols
        inv_pos, inv_valid = invert_bins(idx, 1, "auto")
        assert inv_pos.shape[1] == occ
        assert int(inv_valid.sum()) == occ

    def test_gradient_not_truncated_with_auto(self):
        """d(sum rows)/d(packed) over a 16-tile triangle: every tile's
        contribution must arrive (fixed max_occ=8 would drop half)."""
        pos, tri = self._many_tile_scene()
        setup = triangle_setup(pos, tri)
        corners = pos[:, tri]
        res, tile = (32, 512), (8, 128)
        idx, counts, _ = bin_triangles(corners, setup.det, res, tile, 8)
        planes = jnp.zeros(setup.det.shape + (4, 3))
        packed = pack_rows(setup, silhouette_bits(setup.det, None), planes)

        def total(p, m):
            inv_pos, inv_valid = invert_bins(idx, tri.shape[0], m)
            _, rows = raster_gather_rows(
                p, idx, counts, inv_pos, inv_valid, res, tile, True
            )
            return jnp.sum(rows[:, 12])  # det lane (planar rows (B,32,H,W))

        g_full = jax.grad(lambda p: total(p, "auto"))(packed)
        g_trunc = jax.grad(lambda p: total(p, 4))(packed)
        # full gradient = covered pixel count on the det lane
        ids, _ = raster_gather_rows(
            packed, idx, counts, *invert_bins(idx, 1, "auto"), res, tile, True
        )
        n_fg = float((np.asarray(ids) > 0).sum())
        assert n_fg > 0
        np.testing.assert_allclose(float(g_full[0, 0, 12]), n_fg)
        # the fixed-M path demonstrably loses contributions on this scene
        assert float(g_trunc[0, 0, 12]) < n_fg
