"""Parity tests: fused Pallas pack kernel vs planar.pack_binned.

The Pallas pack (render/pack_kernel.py) must reproduce the XLA pack's
(B, 32, ntK) table bit-for-bit in structure (same lane order, sentinel,
degenerate and bounds semantics) and its pose-path VJP (d_mvp, d_mtx)
numerically.  Run in interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffdope_tpu.render.pack_kernel import pack_binned_auto
from diffdope_tpu.render.planar import _silhouette_planar, det_planar
from diffdope_tpu.render import planar


def _problem(b=4, t=37, ntk=300, n_ch=3, seed=0, degen_frac=0.2):
    rng = np.random.default_rng(seed)
    pos_c = rng.normal(size=(3 * t, 3)).astype(np.float32)
    # well-conditioned camera: points pushed in front, some behind
    mvp = np.stack(
        [np.eye(4, dtype=np.float32) + 0.1 * rng.normal(size=(4, 4))
         for _ in range(b)]
    ).astype(np.float32)
    mvp[:, 3, 3] += 3.0
    mtx = np.stack(
        [np.eye(4, dtype=np.float32) + 0.1 * rng.normal(size=(4, 4))
         for _ in range(b)]
    ).astype(np.float32)
    flat = rng.integers(0, t + 1, size=ntk).astype(np.int32)  # incl sentinel
    attrs = (
        rng.uniform(size=(t, 3, n_ch)).astype(np.float32) if n_ch else None
    )
    degen = (rng.uniform(size=t) < degen_frac).astype(bool)
    return (
        jnp.asarray(pos_c), jnp.asarray(mvp), jnp.asarray(mtx),
        jnp.asarray(flat),
        None if attrs is None else jnp.asarray(attrs),
        jnp.asarray(degen),
        t,
    )


def _sil(pos_c, mvp, degen):
    cp = planar.corner_planes(pos_c, mvp)
    det = det_planar(cp, degen)
    return _silhouette_planar(det, None)


@pytest.mark.parametrize("n_ch", [3, 0])
def test_fwd_matches_pack_binned(n_ch):
    pos_c, mvp, mtx, flat, attrs, degen, t = _problem(n_ch=n_ch)
    sil = _sil(pos_c, mvp, degen)
    ref = planar.pack_binned(pos_c, mvp, mtx, flat, attrs, sil, degen, t)
    got = pack_binned_auto(
        pos_c, mvp, mtx, flat, attrs, sil, degen, t, interpret=True
    )
    assert got is not None
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_fwd_no_degenerate_mask():
    pos_c, mvp, mtx, flat, attrs, _, t = _problem(degen_frac=0.0)
    sil = _sil(pos_c, mvp, None)
    ref = planar.pack_binned(pos_c, mvp, mtx, flat, attrs, sil, None, t)
    got = pack_binned_auto(
        pos_c, mvp, mtx, flat, attrs, sil, None, t, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_fwd_nondivisible_tail():
    # ntk chosen so the 128-padded block has a masked tail
    pos_c, mvp, mtx, flat, attrs, degen, t = _problem(ntk=293)
    sil = _sil(pos_c, mvp, degen)
    ref = planar.pack_binned(pos_c, mvp, mtx, flat, attrs, sil, degen, t)
    got = pack_binned_auto(
        pos_c, mvp, mtx, flat, attrs, sil, degen, t, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("n_ch", [3, 0])
def test_vjp_matches_pack_binned(n_ch):
    pos_c, mvp, mtx, flat, attrs, degen, t = _problem(n_ch=n_ch)
    sil = _sil(pos_c, mvp, degen)
    rng = np.random.default_rng(7)
    g = jnp.asarray(
        rng.normal(size=(mvp.shape[0], 32, flat.shape[0])).astype(np.float32)
    )

    def ref_fn(mvp_, mtx_):
        return planar.pack_binned(
            pos_c, mvp_, mtx_, flat, attrs, sil, degen, t
        )

    def pal_fn(mvp_, mtx_):
        return pack_binned_auto(
            pos_c, mvp_, mtx_, flat, attrs, sil, degen, t, interpret=True
        )

    _, ref_vjp = jax.vjp(ref_fn, mvp, mtx)
    _, pal_vjp = jax.vjp(pal_fn, mvp, mtx)
    d_mvp_ref, d_mtx_ref = ref_vjp(g)
    d_mvp_pal, d_mtx_pal = pal_vjp(g)
    scale = max(1.0, float(jnp.max(jnp.abs(d_mvp_ref))))
    np.testing.assert_allclose(
        np.asarray(d_mvp_pal) / scale, np.asarray(d_mvp_ref) / scale,
        rtol=1e-4, atol=1e-4,
    )
    # pack contributes only to mtx row 2 cols 0-2 (the zrot depth channel);
    # the XLA path agrees because mtx enters pack_binned nowhere else
    scale = max(1.0, float(jnp.max(jnp.abs(d_mtx_ref))))
    np.testing.assert_allclose(
        np.asarray(d_mtx_pal) / scale, np.asarray(d_mtx_ref) / scale,
        rtol=1e-4, atol=1e-4,
    )


def test_multi_block_grid_fwd_and_vjp():
    """ntk > 2048: multiple column blocks per hypothesis with a masked,
    non-divisible tail — the regime production runs (bench ntK=25856) but
    the small tests above never enter (single 128-padded block)."""
    pos_c, mvp, mtx, flat, attrs, degen, t = _problem(ntk=2432)  # 2048+384
    sil = _sil(pos_c, mvp, degen)
    ref = planar.pack_binned(pos_c, mvp, mtx, flat, attrs, sil, degen, t)
    got = pack_binned_auto(
        pos_c, mvp, mtx, flat, attrs, sil, degen, t, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.normal(size=(4, 32, 2432)).astype(np.float32))
    _, ref_vjp = jax.vjp(
        lambda m: planar.pack_binned(pos_c, m, mtx, flat, attrs, sil,
                                     degen, t), mvp)
    _, pal_vjp = jax.vjp(
        lambda m: pack_binned_auto(pos_c, m, mtx, flat, attrs, sil, degen,
                                   t, interpret=True), mvp)
    (d_ref,), (d_pal,) = ref_vjp(g), pal_vjp(g)
    scale = max(1.0, float(jnp.max(jnp.abs(d_ref))))
    np.testing.assert_allclose(
        np.asarray(d_pal) / scale, np.asarray(d_ref) / scale,
        rtol=1e-4, atol=1e-4,
    )


def test_traced_attrs_keep_gradients():
    """Appearance optimization traces the shared (T, 3, C) attrs; the
    Pallas pack's VJP covers only the pose path, so the dispatch MUST
    fall back to the XLA pack there — otherwise attr gradients silently
    zero (code-review r4 finding, executed repro)."""
    from diffdope_tpu.render.pipeline import _pack_dispatch

    pos_c, mvp, mtx, flat, attrs, degen, t = _problem()
    sil = _sil(pos_c, mvp, degen)

    def loss_via_dispatch(a):
        packed = _pack_dispatch(
            pos_c, mvp, mtx, flat, a, sil, degen, t, True
        )
        return jnp.sum(packed**2)

    def loss_via_xla(a):
        packed = planar.pack_binned(pos_c, mvp, mtx, flat, a, sil, degen, t)
        return jnp.sum(packed**2)

    g_dispatch = jax.grad(loss_via_dispatch)(attrs)
    g_xla = jax.grad(loss_via_xla)(attrs)
    assert float(jnp.max(jnp.abs(g_xla))) > 0.0
    np.testing.assert_allclose(
        np.asarray(g_dispatch), np.asarray(g_xla), rtol=1e-5, atol=1e-5
    )


def test_fallbacks_and_2d_index():
    pos_c, mvp, mtx, flat, attrs, degen, t = _problem()
    sil = _sil(pos_c, mvp, degen)
    # (num_tiles, K) uniform bin index is flattened exactly as pack_binned
    # does — the uniform and compact binned paths must share one pack
    # implementation (bit-equality contract, test_raster_compact)
    idx2 = flat.reshape(10, 30)
    got = pack_binned_auto(
        pos_c, mvp, mtx, idx2, attrs, sil, degen, t, interpret=True
    )
    ref = planar.pack_binned(pos_c, mvp, mtx, idx2, attrs, sil, degen, t)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    # traced per-batch attrs -> None (appearance path keeps XLA pack)
    attrs_b = jnp.broadcast_to(attrs[None], (4,) + attrs.shape)
    assert (
        pack_binned_auto(
            pos_c, mvp, mtx, flat, attrs_b, sil, degen, t, interpret=True
        )
        is None
    )
