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


def _make_glb(tmp_path, with_texture=False, nodes=None, sparse_pos=False):
    """Author a minimal valid GLB (two triangles, uv, vertex colors,
    optional embedded PNG baseColorTexture) without external tooling.
    ``nodes`` overrides the node list (scene roots = [0]); ``sparse_pos``
    marks the POSITION accessor sparse (to test the unsupported-raise)."""
    import json
    import struct

    import cv2

    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
    )
    uv = np.array(
        [[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]], np.float32
    )
    col = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32
    )
    idx = np.array([0, 1, 2, 2, 1, 3], np.uint16)

    def pad4(b, fill=b"\0"):
        return b + fill * (-len(b) % 4)

    bin_parts, views, accessors = [], [], []
    offset = 0

    def add(data, target, acc=None):
        nonlocal offset
        raw = pad4(data.tobytes() if hasattr(data, "tobytes") else data)
        views.append({"buffer": 0, "byteOffset": offset,
                      "byteLength": len(raw), "target": target})
        bin_parts.append(raw)
        offset += len(raw)
        if acc:
            acc["bufferView"] = len(views) - 1
            accessors.append(acc)
        return len(accessors) - 1

    a_pos = add(pos, 34962, {"componentType": 5126, "count": 4,
                             "type": "VEC3",
                             "min": pos.min(0).tolist(),
                             "max": pos.max(0).tolist()})
    a_uv = add(uv, 34962, {"componentType": 5126, "count": 4, "type": "VEC2"})
    a_col = add(col, 34962, {"componentType": 5126, "count": 4, "type": "VEC3"})
    a_idx = add(idx, 34963, {"componentType": 5123, "count": 6,
                             "type": "SCALAR"})
    prim = {"attributes": {"POSITION": a_pos, "TEXCOORD_0": a_uv,
                           "COLOR_0": a_col}, "indices": a_idx, "mode": 4}
    if sparse_pos:
        accessors[a_pos]["sparse"] = {"count": 1}
    gltf = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": nodes if nodes is not None else [{"mesh": 0}],
        "meshes": [{"primitives": [prim]}],
        "bufferViews": views,
        "accessors": accessors,
    }
    if with_texture:
        teximg = np.zeros((8, 8, 3), np.uint8)
        teximg[:4] = (255, 0, 0)  # top rows red (BGR-written below as RGB)
        teximg[4:] = (0, 0, 255)
        ok, png = cv2.imencode(".png", cv2.cvtColor(teximg, cv2.COLOR_RGB2BGR))
        assert ok
        add(png.tobytes(), 0)  # image bufferView (no accessor)
        gltf["images"] = [{"bufferView": len(views) - 1, "mimeType": "image/png"}]
        gltf["samplers"] = [{}]
        gltf["textures"] = [{"source": 0, "sampler": 0}]
        gltf["materials"] = [
            {"pbrMetallicRoughness": {"baseColorTexture": {"index": 0}}}
        ]
        prim["material"] = 0
    gltf["buffers"] = [{"byteLength": offset}]

    js = pad4(json.dumps(gltf).encode(), b" ")
    bi = b"".join(bin_parts)
    total = 12 + 8 + len(js) + 8 + len(bi)
    glb = (
        struct.pack("<4sII", b"glTF", 2, total)
        + struct.pack("<II", len(js), 0x4E4F534A) + js
        + struct.pack("<II", len(bi), 0x004E4942) + bi
    )
    p = tmp_path / ("tex.glb" if with_texture else "plain.glb")
    p.write_bytes(glb)
    return p, pos, col


def test_glb_roundtrip(tmp_path):
    """GLB loading (reference gets this free from trimesh.load,
    diffdope.py:784): vertices/faces/colors survive."""
    from diffdope_tpu.mesh import load_glb, load_mesh

    p, pos, col = _make_glb(tmp_path)
    data = load_glb(p)
    np.testing.assert_allclose(data["vertices"], pos)
    assert data["faces"].shape == (2, 3)
    np.testing.assert_allclose(data["colors"], col)

    m = load_mesh(p, scale=2.0, fix_winding=False)
    assert m.num_vertices == 4 and m.num_triangles == 2
    np.testing.assert_allclose(m.pos[:4], pos * 2.0)
    assert m.vtx_color is not None


def test_glb_embedded_texture(tmp_path):
    """Embedded PNG baseColorTexture decodes; glTF uv needs NO V flip (v=0
    = image top), so uv (0,0) must sample the top-left texel."""
    from diffdope_tpu.mesh import load_mesh

    p, _, _ = _make_glb(tmp_path, with_texture=True)
    m = load_mesh(p, scale=1.0, fix_winding=False)
    assert m.tex is not None and m.tex.shape == (8, 8, 3)
    # top rows red in the authored image
    np.testing.assert_allclose(m.tex[0, 0], [1, 0, 0], atol=0.02)
    # vertex 0 (uv v=0.25, upper half) samples RED, vertex 2 (v=0.75,
    # lower half) BLUE — a V flip would swap them
    assert m.corner_colors is not None
    np.testing.assert_allclose(m.corner_colors[0, 0], [1, 0, 0], atol=0.05)
    np.testing.assert_allclose(m.corner_colors[0, 2], [0, 0, 1], atol=0.05)


def test_glb_node_transforms(tmp_path):
    """Node world transforms are APPLIED (trimesh-backed reference parity):
    a TRS child under a matrix parent lands the vertices at
    parent @ child @ pos."""
    from diffdope_tpu.mesh import load_glb

    # parent: column-major matrix = translate +10 in x; child: TRS with
    # 90-degree rotation about z (quat) and uniform scale 2
    parent_matrix = [1, 0, 0, 0,
                     0, 1, 0, 0,
                     0, 0, 1, 0,
                     10, 0, 0, 1]
    s = np.sqrt(0.5)
    nodes = [
        {"matrix": parent_matrix, "children": [1]},
        {"mesh": 0, "rotation": [0, 0, float(s), float(s)],
         "scale": [2, 2, 2]},
    ]
    p, pos, _ = _make_glb(tmp_path, nodes=nodes)
    data = load_glb(p)
    rot = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    expect = (pos * 2.0) @ rot.T + np.array([10, 0, 0])
    np.testing.assert_allclose(data["vertices"], expect, atol=1e-5)


def test_glb_sparse_accessor_raises(tmp_path):
    """Sparse accessors would silently load wrong geometry — must raise."""
    import pytest

    from diffdope_tpu.mesh import load_glb

    p, _, _ = _make_glb(tmp_path, sparse_pos=True)
    with pytest.raises(ValueError, match="sparse"):
        load_glb(p)


def test_ply_quad_faces(tmp_path):
    """Quad-faced PLY fan-triangulates (ascii + binary)."""
    from diffdope_tpu.mesh import load_ply

    # ascii, uniform quads
    p = tmp_path / "quads.ply"
    p.write_text("\n".join([
        "ply", "format ascii 1.0",
        "element vertex 4",
        "property float x", "property float y", "property float z",
        "element face 1",
        "property list uchar int vertex_indices",
        "end_header",
        "0 0 0", "1 0 0", "1 1 0", "0 1 0",
        "4 0 1 2 3",
    ]) + "\n")
    d = load_ply(p)
    assert d["faces"].shape == (2, 3)
    np.testing.assert_array_equal(d["faces"], [[0, 1, 2], [0, 2, 3]])

    # ascii, MIXED tri + quad (ragged rows)
    p2 = tmp_path / "mixed.ply"
    p2.write_text("\n".join([
        "ply", "format ascii 1.0",
        "element vertex 5",
        "property float x", "property float y", "property float z",
        "element face 2",
        "property list uchar int vertex_indices",
        "end_header",
        "0 0 0", "1 0 0", "1 1 0", "0 1 0", "2 2 0",
        "3 0 1 4",
        "4 0 1 2 3",
    ]) + "\n")
    d2 = load_ply(p2)
    assert d2["faces"].shape == (3, 3)

    # binary little endian, uniform quads
    import struct as _st

    header = ("ply\nformat binary_little_endian 1.0\n"
              "element vertex 4\n"
              "property float x\nproperty float y\nproperty float z\n"
              "element face 1\n"
              "property list uchar int vertex_indices\nend_header\n")
    body = b"".join(
        _st.pack("<3f", *v) for v in [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]
    ) + _st.pack("<B4i", 4, 0, 1, 2, 3)
    p3 = tmp_path / "quads_bin.ply"
    p3.write_bytes(header.encode() + body)
    d3 = load_ply(p3)
    assert d3["faces"].shape == (2, 3)


def test_ply_no_normals(tmp_path):
    """Normal-less PLY: vertex normals are computed at load."""
    from diffdope_tpu.mesh import load_mesh

    p = tmp_path / "nonormals.ply"
    p.write_text("\n".join([
        "ply", "format ascii 1.0",
        "element vertex 3",
        "property float x", "property float y", "property float z",
        "element face 1",
        "property list uchar int vertex_indices",
        "end_header",
        "0 0 0", "1 0 0", "0 1 0",
        "3 0 1 2",
    ]) + "\n")
    m = load_mesh(p, fix_winding=False)
    nrm = m.vtx_normals[:3]
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(nrm[:, 2]), 1.0, atol=1e-5)


def _stl_tetra():
    """4 vertices / 4 faces of a tetrahedron, as independent STL facets."""
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
    return v, f


def test_stl_binary_roundtrip(tmp_path):
    """Binary STL: facets weld back to shared vertices; Mesh loads."""
    import struct

    from diffdope_tpu.mesh import load_mesh, load_stl

    v, f = _stl_tetra()
    buf = b"B" * 80 + struct.pack("<I", len(f))
    for tri in f:
        buf += struct.pack("<3f", 0, 0, 0)
        for i in tri:
            buf += struct.pack("<3f", *v[i])
        buf += struct.pack("<H", 0)
    p = tmp_path / "tetra.stl"
    p.write_bytes(buf)

    data = load_stl(p)
    assert data["vertices"].shape == (4, 3)
    assert data["faces"].shape == (4, 3)
    # welding preserves the triangle point sets
    got = {frozenset(map(tuple, data["vertices"][tri])) for tri in data["faces"]}
    want = {frozenset(map(tuple, v[tri])) for tri in f}
    assert got == want

    m = load_mesh(p, scale=2.0)
    assert m.num_vertices == 4 and m.num_triangles == 4
    assert m.is_closed  # tetra is watertight -> culling-eligible


def test_stl_ascii_roundtrip(tmp_path):
    from diffdope_tpu.mesh import load_stl

    v, f = _stl_tetra()
    lines = ["solid tetra"]
    for tri in f:
        lines += ["facet normal 0 0 0", "outer loop"]
        lines += [f"vertex {v[i][0]} {v[i][1]} {v[i][2]}" for i in tri]
        lines += ["endloop", "endfacet"]
    lines.append("endsolid tetra")
    p = tmp_path / "tetra_ascii.stl"
    p.write_text("\n".join(lines))

    data = load_stl(p)
    assert data["vertices"].shape == (4, 3)
    assert data["faces"].shape == (4, 3)
