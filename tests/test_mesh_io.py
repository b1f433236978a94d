"""Tests for the dependency-free PLY/OBJ mesh loaders."""

import struct

import numpy as np
import pytest

from diffdope_tpu import mesh as mesh_mod


VERTS = np.array(
    [
        [0.0, 0.0, 0.0],
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)
FACES = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 1], [1, 3, 2]], dtype=np.int32)


def _write_ascii_ply(path, colors=False, uv=False):
    props = ["property float x", "property float y", "property float z"]
    if uv:
        props += ["property float texture_u", "property float texture_v"]
    if colors:
        props += ["property uchar red", "property uchar green", "property uchar blue"]
    header = (
        ["ply", "format ascii 1.0", f"element vertex {len(VERTS)}"]
        + props
        + [f"element face {len(FACES)}", "property list uchar int vertex_indices", "end_header"]
    )
    lines = list(header)
    for i, v in enumerate(VERTS):
        row = [f"{x:.6f}" for x in v]
        if uv:
            row += [f"{0.1 * i:.4f}", f"{0.2 * i:.4f}"]
        if colors:
            row += [str(10 * i), str(20 * i), str(30 * i)]
        lines.append(" ".join(row))
    for f_ in FACES:
        lines.append("3 " + " ".join(map(str, f_)))
    path.write_text("\n".join(lines) + "\n")


def _write_binary_ply(path):
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(VERTS)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(FACES)}\n"
        "property list uchar int vertex_indices\nend_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        for v in VERTS:
            f.write(struct.pack("<3f", *v))
        for face in FACES:
            f.write(struct.pack("<B3i", 3, *face))


class TestPly:
    def test_ascii_roundtrip(self, tmp_path):
        p = tmp_path / "tet.ply"
        _write_ascii_ply(p)
        data = mesh_mod.load_ply(p)
        np.testing.assert_allclose(data["vertices"], VERTS, atol=1e-6)
        np.testing.assert_array_equal(data["faces"], FACES)

    def test_ascii_with_colors_and_uv(self, tmp_path):
        p = tmp_path / "tet.ply"
        _write_ascii_ply(p, colors=True, uv=True)
        data = mesh_mod.load_ply(p)
        assert data["colors"].shape == (4, 3)
        np.testing.assert_allclose(data["colors"][1], [10 / 255, 20 / 255, 30 / 255], atol=1e-6)
        np.testing.assert_allclose(data["uv"][2], [0.2, 0.4], atol=1e-6)

    def test_binary_roundtrip(self, tmp_path):
        p = tmp_path / "tet_bin.ply"
        _write_binary_ply(p)
        data = mesh_mod.load_ply(p)
        np.testing.assert_allclose(data["vertices"], VERTS, atol=1e-6)
        np.testing.assert_array_equal(data["faces"], FACES)


class TestObj:
    def test_basic_obj(self, tmp_path):
        p = tmp_path / "tet.obj"
        lines = [f"v {v[0]} {v[1]} {v[2]}" for v in VERTS]
        lines += [f"f {f[0]+1} {f[1]+1} {f[2]+1}" for f in FACES]
        p.write_text("\n".join(lines) + "\n")
        data = mesh_mod.load_obj(p)
        assert data["faces"].shape == (4, 3)
        # vertex splitting may reorder; check the set of triangles' coordinates
        tris = data["vertices"][data["faces"]]
        expected = VERTS[FACES]
        assert np.allclose(np.sort(tris.reshape(-1, 3), axis=0), np.sort(expected.reshape(-1, 3), axis=0))

    def test_quad_triangulation(self, tmp_path):
        p = tmp_path / "quad.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
        data = mesh_mod.load_obj(p)
        assert data["faces"].shape == (2, 3)


class TestLoadMesh:
    def test_scale_padding_and_metadata(self, tmp_path):
        p = tmp_path / "tet.ply"
        _write_ascii_ply(p, colors=True)
        m = mesh_mod.load_mesh(p, scale=2.0, vertex_pad=8, triangle_pad=16)
        assert m.pos.shape == (8, 3)
        assert m.pos_idx.shape == (16, 3)
        assert m.num_vertices == 4 and m.num_triangles == 4
        np.testing.assert_allclose(m.pos[:4], VERTS * 2.0, atol=1e-6)
        # padded triangles are degenerate (index 0,0,0)
        assert (m.pos_idx[4:] == 0).all()
        np.testing.assert_allclose(m.dimensions, [2, 2, 2], atol=1e-6)
        np.testing.assert_allclose(m.center_point, [1, 1, 1], atol=1e-6)
        assert not m.has_textured_map
        assert m.vtx_color is not None and m.vtx_color.shape == (8, 3)

    def test_normals_computed_when_missing(self, tmp_path):
        p = tmp_path / "tet.ply"
        _write_ascii_ply(p)
        m = mesh_mod.load_mesh(p)
        lens = np.linalg.norm(m.vtx_normals[: m.num_vertices], axis=1)
        np.testing.assert_allclose(lens, 1.0, atol=1e-5)

    def test_texture_loading(self, tmp_path):
        import cv2

        tex = (np.arange(16 * 16 * 3).reshape(16, 16, 3) % 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "tex.png"), tex)
        p = tmp_path / "tet.ply"
        _write_ascii_ply(p, uv=True)
        # patch in a texture comment by rewriting header
        content = p.read_text().replace(
            "format ascii 1.0", "format ascii 1.0\ncomment TextureFile tex.png"
        )
        p.write_text(content)
        m = mesh_mod.load_mesh(p)
        assert m.has_textured_map
        assert m.tex.shape == (16, 16, 3)
        assert m.uv is not None and m.uv_idx is not None
        # V flip applied
        np.testing.assert_allclose(m.uv[2], [0.2, 1 - 0.4], atol=1e-6)
