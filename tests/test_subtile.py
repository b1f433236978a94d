"""Sub-tile binning (tile width < 128) bit-equality.

raster_v2 always runs 128-wide super-tiles; tile_hw = (th, 64) / (th, 32)
selects sub-tile BINNING (planar.bin_triangles_planar pads the x grid so
each super-tile owns 128//tw consecutive sub-tiles; the kernels statically
unroll them).  Output must be bit-identical to the 128-wide path — gating
granularity never changes coverage/z/ids (nvdiffrast exact-coverage
contract, reference diffdope.py:198-200).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffdope_tpu import geometry as geo
from diffdope_tpu.mesh import build_edge_adjacency
from diffdope_tpu.optimize import pose_matrix, pose_params
from diffdope_tpu.render.pipeline import make_fused_loss, render_batch
from diffdope_tpu.testing import icosphere

RES = (64, 256)


@pytest.fixture(scope="module")
def scene():
    h, w = RES
    f = 80.0
    proj = jnp.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )
    v, fc = icosphere(2)
    pos = jnp.asarray(v.astype(np.float32) * 0.4)
    tri = jnp.asarray(fc.astype(np.int32))
    edge_adj = jnp.asarray(build_edge_adjacency(np.asarray(fc)))
    col = (v * 0.5 + 0.5).astype(np.float32)
    m0 = np.eye(4, dtype=np.float32)
    m0[2, 3] = -2.0
    m1 = m0.copy()
    m1[0, 3] = 0.35
    mtx = jnp.asarray(np.stack([m0, m1]))
    return dict(
        proj=proj, pos=pos, tri=tri, edge_adj=edge_adj,
        vtx_color=jnp.asarray(col), corner_colors=jnp.asarray(col[fc]),
        mtx=mtx,
    )


@pytest.mark.parametrize("tw", [64, 32])
@pytest.mark.parametrize("compact_total", [None, 1536],
                         ids=["uniform", "compact"])
def test_render_bit_equal(scene, tw, compact_total):
    outs = {}
    for w_ in (128, tw):
        outs[w_] = jax.jit(
            lambda mm, w_=w_: render_batch(
                scene["proj"], mm, scene["pos"], scene["tri"], RES,
                corner_colors=scene["corner_colors"],
                edge_adj=scene["edge_adj"], raster_impl="pallas",
                tile_hw=(32, w_), max_tris_per_tile=384,
                layout="channels", compact_total=compact_total,
            )
        )(scene["mtx"])
    np.testing.assert_array_equal(
        np.asarray(outs[128]["ids"]), np.asarray(outs[tw]["ids"])
    )
    for a, b in zip(outs[128]["rgb"], outs[tw]["rgb"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(outs[128]["depth"]), np.asarray(outs[tw]["depth"])
    )
    assert int((np.asarray(outs[128]["ids"]) > 0).sum()) > 500


def test_pose_gradients_match(scene):
    def loss(mm, tw):
        r = render_batch(
            scene["proj"], mm, scene["pos"], scene["tri"], RES,
            corner_colors=scene["corner_colors"],
            edge_adj=scene["edge_adj"], raster_impl="pallas",
            tile_hw=(32, tw), max_tris_per_tile=384, layout="channels",
            compact_total=1536,
        )
        return (sum(jnp.sum(c ** 2) for c in r["rgb"])
                + jnp.sum(r["depth"] ** 2) + jnp.sum(r["mask"] ** 2))

    grads = {
        tw: np.asarray(
            jax.jit(jax.grad(lambda m, tw=tw: loss(m, tw)))(scene["mtx"])
        )
        for tw in (128, 64)
    }
    # same gathered contributions, different chunk summation order
    np.testing.assert_allclose(grads[64], grads[128], rtol=1e-4, atol=1e-4)


def test_fused_loss_matches(scene):
    lrs = jnp.asarray([1.0, 0.5], jnp.float32)
    weights = {"mask": 1.0, "rgb": 0.7}
    gt_r = jax.jit(
        lambda mm: render_batch(
            scene["proj"], mm, scene["pos"], scene["tri"], RES,
            corner_colors=scene["corner_colors"],
            edge_adj=scene["edge_adj"], raster_impl="pallas",
            tile_hw=(32, 128), max_tris_per_tile=384, layout="stacked",
        )
    )(scene["mtx"][:1])
    gt = {"rgb": gt_r["rgb"][0], "segmentation": gt_r["mask"][0],
          "depth": gt_r["depth"][0]}

    vals = {}
    for tw in (128, 64):
        fn = make_fused_loss(
            scene["proj"], scene["pos"], scene["tri"], RES, gt, lrs, weights,
            use_rgb=True, use_mask=True, edge_adj=scene["edge_adj"],
            corner_colors=scene["corner_colors"], tile_hw=(32, tw),
            max_tris_per_tile=384,
        )
        v, g = jax.jit(
            jax.value_and_grad(lambda m, fn=fn: fn(m)[0])
        )(scene["mtx"])
        vals[tw] = (np.asarray(v), np.asarray(g))
    np.testing.assert_allclose(vals[64][0], vals[128][0],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(vals[64][1], vals[128][1],
                               rtol=1e-4, atol=1e-5)
