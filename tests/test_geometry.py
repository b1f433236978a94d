"""Unit tests for the pose/quaternion/projection core.

Strategy follows the reference's own dual-path validation idea
(``xfm_points(..., use_python=True)``, reference diffdope/ops.py:137-141):
every jnp function is checked against an independent numpy formulation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffdope_tpu import geometry as geo


def _np_quat_to_mat(q):
    """Independent reference: rotate basis vectors via quaternion sandwich."""
    x, y, z, w = q

    def rot(v):
        u = np.array([x, y, z])
        return v + 2.0 * w * np.cross(u, v) + 2.0 * np.cross(u, np.cross(u, v))

    return np.stack([rot(np.eye(3)[i]) for i in range(3)], axis=1)


def _rand_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


class TestQuaternions:
    def test_matrix33_matches_sandwich_product(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            q = _rand_quat(rng)
            m = np.asarray(geo.matrix33_from_quat(jnp.asarray(q)))
            np.testing.assert_allclose(m, _np_quat_to_mat(q), atol=1e-6)

    def test_multiply_composes_rotations(self):
        rng = np.random.default_rng(1)
        q1, q2 = _rand_quat(rng), _rand_quat(rng)
        q12 = geo.quat_multiply(jnp.asarray(q1), jnp.asarray(q2))
        m12 = np.asarray(geo.matrix33_from_quat(q12))
        expected = _np_quat_to_mat(q1) @ _np_quat_to_mat(q2)
        np.testing.assert_allclose(m12, expected, atol=1e-6)

    def test_rotate_matches_matrix(self):
        rng = np.random.default_rng(2)
        q = _rand_quat(rng)
        v = rng.normal(size=(5, 3))
        out = np.asarray(geo.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
        np.testing.assert_allclose(out, v @ _np_quat_to_mat(q).T, atol=1e-5)

    def test_from_matrix_roundtrip(self):
        rng = np.random.default_rng(3)
        for _ in range(50):
            q = _rand_quat(rng)
            m = _np_quat_to_mat(q)
            q2 = geo.quat_from_matrix33(m)
            # q and -q are the same rotation
            assert min(np.abs(q - q2).max(), np.abs(q + q2).max()) < 1e-6

    def test_normalize(self):
        q = jnp.array([[2.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]])
        n = geo.quat_normalize(q)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=-1), 1.0, atol=1e-6)

    def test_axis_angle(self):
        q = geo.quat_from_axis_angle(np.array([0, 0, 1.0]), np.pi / 2)
        m = _np_quat_to_mat(q)
        np.testing.assert_allclose(m, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-12)


class TestMatrix44:
    def test_batched_shape_and_value(self):
        rng = np.random.default_rng(4)
        B = 7
        qs = np.stack([_rand_quat(rng) for _ in range(B)])
        ts = rng.normal(size=(B, 3))
        m = np.asarray(geo.matrix44_from_quat_trans(jnp.asarray(qs), jnp.asarray(ts)))
        assert m.shape == (B, 4, 4)
        for i in range(B):
            np.testing.assert_allclose(m[i, :3, :3], _np_quat_to_mat(qs[i]), atol=1e-6)
            np.testing.assert_allclose(m[i, :3, 3], ts[i], atol=1e-6)
            np.testing.assert_allclose(m[i, 3], [0, 0, 0, 1], atol=0)

    def test_gradients_flow(self):
        q = jnp.array([0.1, -0.2, 0.3, 0.9])
        t = jnp.array([1.0, 2.0, 3.0])

        def f(q, t):
            return jnp.sum(geo.matrix44_from_quat_trans(geo.quat_normalize(q), t) ** 2)

        gq, gt = jax.grad(f, argnums=(0, 1))(q, t)
        assert np.isfinite(np.asarray(gq)).all() and np.isfinite(np.asarray(gt)).all()
        assert np.abs(np.asarray(gq)).max() > 0


class TestCvGl:
    def test_flip_is_involution(self):
        rng = np.random.default_rng(5)
        r = _np_quat_to_mat(_rand_quat(rng))
        p = rng.normal(size=3)
        p_gl, q_gl = geo.opencv_to_opengl(p, r)
        m_gl = np.eye(4)
        m_gl[:3, :3] = _np_quat_to_mat(q_gl)
        m_gl[:3, 3] = p_gl
        m_cv = geo.opengl_to_opencv(m_gl)
        np.testing.assert_allclose(m_cv[:3, :3], r, atol=1e-6)
        np.testing.assert_allclose(m_cv[:3, 3], p, atol=1e-6)

    def test_rotation_inputs_equivalent(self):
        rng = np.random.default_rng(6)
        q = _rand_quat(rng)
        r = _np_quat_to_mat(q)
        p = rng.normal(size=3)
        out_q = geo.opencv_to_opengl(p, q)
        out_flat = geo.opencv_to_opengl(p, r.reshape(-1))
        out_m = geo.opencv_to_opengl(p, r)
        np.testing.assert_allclose(out_q[0], out_m[0], atol=1e-9)
        for a, b in ((out_q[1], out_m[1]), (out_flat[1], out_m[1])):
            assert min(np.abs(a - b).max(), np.abs(a + b).max()) < 1e-6

    def test_conjugation_preserves_determinant_and_orthogonality(self):
        rng = np.random.default_rng(7)
        r = _np_quat_to_mat(_rand_quat(rng))
        _, q_gl = geo.opencv_to_opengl(np.zeros(3), r)
        m = _np_quat_to_mat(q_gl)
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-9)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-9)


class TestProjection:
    FX, FY, CX, CY, W, H = 1390.53, 1386.99, 964.957, 522.586, 1920, 1080

    def test_projects_principal_point_to_center(self):
        proj = geo.projection_from_intrinsics(self.FX, self.FY, self.CX, self.CY, self.W, self.H)
        # A point on the optical axis (OpenGL camera looks down -z) must land
        # at NDC offset corresponding to the principal point.
        p = np.array([0.0, 0.0, -1.0, 1.0])
        clip = proj @ p
        ndc = clip[:3] / clip[3]
        # ndc_x = 2*cx/W - 1; ndc_y = 1 - 2*cy/H (y flipped: the pipeline
        # works on vertically flipped images, reference diffdope.py:1131-1132)
        np.testing.assert_allclose(ndc[0], 2 * self.CX / self.W - 1, atol=1e-9)
        np.testing.assert_allclose(ndc[1], 1 - 2 * self.CY / self.H, atol=1e-9)

    def test_depth_range(self):
        znear, zfar = 0.01, 200.0
        proj = geo.projection_from_intrinsics(
            self.FX, self.FY, self.CX, self.CY, self.W, self.H, znear, zfar
        )
        for z, expected in ((-znear, -1.0), (-zfar, 1.0)):
            clip = proj @ np.array([0.0, 0.0, z, 1.0])
            np.testing.assert_allclose(clip[2] / clip[3], expected, atol=1e-6)

    def test_pixel_mapping(self):
        """A point projecting to pixel (u,v) by the pinhole model must land at
        the NDC coords of that pixel under the y_down convention."""
        proj = geo.projection_from_intrinsics(self.FX, self.FY, self.CX, self.CY, self.W, self.H)
        rng = np.random.default_rng(8)
        for _ in range(10):
            pt_cv = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3), rng.uniform(0.5, 3)])
            u = self.FX * pt_cv[0] / pt_cv[2] + self.CX
            v = self.FY * pt_cv[1] / pt_cv[2] + self.CY
            # OpenGL frame: y,z negated
            p_gl = np.array([pt_cv[0], -pt_cv[1], -pt_cv[2], 1.0])
            clip = proj @ p_gl
            ndc = clip[:3] / clip[3]
            # y_down: ndc_x = 2u/W - 1 (x unflipped), ndc_y = 1 - 2v/H (the
            # vertical flip that matches flipped-at-load images).
            np.testing.assert_allclose(ndc[0], 2 * u / self.W - 1, atol=1e-6)
            np.testing.assert_allclose(ndc[1], 1 - 2 * v / self.H, atol=1e-6)


class TestXfm:
    def test_points_matches_numpy(self):
        rng = np.random.default_rng(9)
        B, N = 4, 17
        pts = rng.normal(size=(B, N, 3)).astype(np.float32)
        mats = rng.normal(size=(B, 4, 4)).astype(np.float32)
        out = np.asarray(geo.xfm_points(jnp.asarray(pts), jnp.asarray(mats)))
        homo = np.concatenate([pts, np.ones((B, N, 1), np.float32)], axis=-1)
        expected = np.einsum("bij,bnj->bni", mats, homo)
        np.testing.assert_allclose(out, expected, atol=1e-4)

    def test_vectors_matches_numpy(self):
        rng = np.random.default_rng(10)
        B, N = 3, 11
        vecs = rng.normal(size=(B, N, 3)).astype(np.float32)
        mats = rng.normal(size=(B, 4, 4)).astype(np.float32)
        out = np.asarray(geo.xfm_vectors(jnp.asarray(vecs), jnp.asarray(mats)))
        expected = np.einsum("bij,bnj->bni", mats[:, :3, :3], vecs)
        np.testing.assert_allclose(out, expected, atol=1e-4)

    def test_gradients_match_reference_backward(self):
        """grad_points must equal M^T g — the analytic backward the reference
        hand-writes in CUDA (mesh.cu:56-94)."""
        rng = np.random.default_rng(11)
        pts = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
        mats = jnp.asarray(rng.normal(size=(2, 4, 4)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(2, 5, 4)).astype(np.float32))

        _, vjp = jax.vjp(geo.xfm_points, pts, mats)
        gp, gm = vjp(g)
        expected_gp = np.einsum("bij,bni->bnj", np.asarray(mats)[:, :, :3], np.asarray(g))
        np.testing.assert_allclose(np.asarray(gp), expected_gp, atol=1e-4)
        homo = np.concatenate([np.asarray(pts), np.ones((2, 5, 1), np.float32)], -1)
        expected_gm = np.einsum("bni,bnj->bij", np.asarray(g), homo)
        np.testing.assert_allclose(np.asarray(gm), expected_gm, atol=1e-4)
