"""Mesh loading and static-shape preparation.

Replaces the reference's trimesh-backed ``Mesh`` wrapper (reference
diffdope/diffdope.py:746-935) with a dependency-free loader (trimesh is not
available in this image) plus TPU-specific preparation:

* PLY (ascii + binary little/big endian) and OBJ parsing in numpy;
* the same data contract: ``pos``, ``pos_idx``, ``vtx_normals`` and either
  (``tex``, ``uv``, ``uv_idx``) or ``vtx_color``; uv V-flip at load
  (reference diffdope.py:822); vertex scaling (reference diffdope.py:793);
  bounding volume / dimensions / center point (reference diffdope.py:795-817);
* padding of vertex/triangle arrays to static, lane-aligned shapes so every
  downstream jit trace sees fixed shapes (XLA requirement) — padded triangles
  are degenerate (all-zero index, zero area) and never rasterize.

Unlike the reference (``set_batchsize`` stacks every array B times,
diffdope.py:864-896) mesh tensors are **never** replicated per pose
hypothesis: the renderer broadcasts a single copy across the batch, saving
O(B) HBM.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field, replace
from pathlib import Path
from typing import Dict, Optional

import numpy as np

log = logging.getLogger(__name__)

__all__ = ["Mesh", "load_mesh", "load_ply", "load_obj", "pad_to_multiple"]


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


# ---------------------------------------------------------------------------
# PLY parsing
# ---------------------------------------------------------------------------

_PLY_DTYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def _parse_ply_header(f):
    """Parse a PLY header; returns (format, elements, comments, header_len)."""
    magic = f.readline().strip()
    if magic != b"ply":
        raise ValueError("not a PLY file")
    fmt = None
    elements = []  # list of (name, count, [(prop_kind, ...)...])
    comments = []
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unterminated PLY header")
        tokens = line.strip().split()
        if not tokens:
            continue
        key = tokens[0].decode()
        if key == "format":
            fmt = tokens[1].decode()
        elif key == "comment":
            comments.append(line.strip().decode(errors="replace"))
        elif key == "element":
            elements.append((tokens[1].decode(), int(tokens[2]), []))
        elif key == "property":
            if tokens[1] == b"list":
                count_t = _PLY_DTYPES[tokens[2].decode()]
                item_t = _PLY_DTYPES[tokens[3].decode()]
                elements[-1][2].append(("list", tokens[4].decode(), count_t, item_t))
            else:
                elements[-1][2].append(("scalar", tokens[2].decode(), _PLY_DTYPES[tokens[1].decode()]))
        elif key == "end_header":
            break
    return fmt, elements, comments


def load_ply(path) -> Dict[str, np.ndarray]:
    """Load a PLY mesh into a dict of numpy arrays.

    Keys (when present in the file): ``vertices`` (N,3) f32, ``faces`` (T,3)
    i32, ``normals`` (N,3) f32, ``uv`` (N,2) f32, ``colors`` (N,3) f32 in
    [0,1], ``texture_file`` (str from the comment header).
    """
    path = Path(path)
    with open(path, "rb") as f:
        fmt, elements, comments = _parse_ply_header(f)
        body = f.read()

    out: Dict[str, np.ndarray] = {}
    for c in comments:
        # e.g. "comment TextureFile AlphabetSoup.png"
        parts = c.split()
        if len(parts) >= 3 and parts[1].lower() in ("texturefile", "texture_file"):
            out["texture_file"] = parts[2]

    if fmt == "ascii":
        _load_ply_ascii(body, elements, out)
    elif fmt in ("binary_little_endian", "binary_big_endian"):
        _load_ply_binary(body, elements, fmt, out)
    else:
        raise ValueError(f"unsupported PLY format {fmt}")
    return out


def _vertex_fields_to_arrays(names, table, out):
    cols = {n: i for i, n in enumerate(names)}

    def grab(*fields):
        if all(f in cols for f in fields):
            return np.stack([table[:, cols[f]] for f in fields], axis=1)
        return None

    v = grab("x", "y", "z")
    if v is None:
        raise ValueError("PLY vertex element missing x/y/z")
    out["vertices"] = v.astype(np.float32)
    n = grab("nx", "ny", "nz")
    if n is not None:
        out["normals"] = n.astype(np.float32)
    for cand in (("texture_u", "texture_v"), ("s", "t"), ("u", "v")):
        uv = grab(*cand)
        if uv is not None:
            out["uv"] = uv.astype(np.float32)
            break
    col = grab("red", "green", "blue")
    if col is not None:
        col = col.astype(np.float32)
        if col.max() > 1.0 + 1e-6:
            col = col / 255.0
        out["colors"] = col


def _load_ply_ascii(body: bytes, elements, out):
    lines = body.decode().splitlines()
    pos = 0
    for name, count, props in elements:
        chunk = lines[pos:pos + count]
        pos += count
        if name == "vertex":
            scalar_names = [p[1] for p in props if p[0] == "scalar"]
            table = np.loadtxt(chunk, dtype=np.float64, ndmin=2)
            if table.shape[1] < len(scalar_names):
                raise ValueError("PLY vertex rows shorter than property list")
            _vertex_fields_to_arrays(scalar_names, table, out)
        elif name == "face":
            try:
                rows = np.loadtxt(chunk, dtype=np.int64, ndmin=2)
            except ValueError:
                # ragged polygon counts (mixed tris/quads): per-line parse
                rows = [
                    np.array(ln.split(), dtype=np.int64) for ln in chunk
                ]
                faces = []
                for row in rows:
                    k = int(row[0])
                    for j in range(1, k - 1):
                        faces.append((row[1], row[1 + j], row[2 + j]))
                out["faces"] = np.asarray(faces, np.int32)
                continue
            counts = rows[:, 0]
            if np.all(counts == 3):
                out["faces"] = rows[:, 1:4].astype(np.int32)
            else:
                # polygon faces (quads etc): fan-triangulate, like
                # trimesh does for the reference's loader
                # (reference diffdope.py:784)
                faces = []
                for row in rows:
                    k = int(row[0])
                    for j in range(1, k - 1):
                        faces.append((row[1], row[1 + j], row[2 + j]))
                out["faces"] = np.asarray(faces, np.int32)


def _load_ply_binary(body: bytes, elements, fmt, out):
    endian = "<" if fmt == "binary_little_endian" else ">"
    offset = 0
    for name, count, props in elements:
        if all(p[0] == "scalar" for p in props):
            dtype = np.dtype([(p[1], endian + p[2]) for p in props])
            arr = np.frombuffer(body, dtype=dtype, count=count, offset=offset)
            offset += dtype.itemsize * count
            if name == "vertex":
                names = [p[1] for p in props]
                table = np.stack([arr[n].astype(np.float64) for n in names], axis=1)
                _vertex_fields_to_arrays(names, table, out)
        else:
            # element with a list property (faces). Assume uniform triangles:
            # probe the first count byte(s).
            if name != "face" or len(props) != 1:
                # skip conservatively by scanning per-row (rare path)
                arr, offset = _scan_list_element(body, offset, count, props, endian)
                continue
            _, _, count_t, item_t = props[0]
            cdt = np.dtype(endian + count_t)
            idt = np.dtype(endian + item_t)
            first_n = int(np.frombuffer(body, dtype=cdt, count=1, offset=offset)[0])
            if first_n < 3:
                raise ValueError(f"degenerate PLY face (count {first_n})")
            row = np.dtype(
                [("n", endian + count_t), ("v", endian + item_t, (first_n,))]
            )
            try:
                arr = np.frombuffer(body, dtype=row, count=count, offset=offset)
            except ValueError:  # mixed sizes shorter than assumed: scan
                arr = None
            if arr is not None and np.all(arr["n"] == first_n):
                offset += row.itemsize * count
                poly = arr["v"].astype(np.int32)
                # uniform k-gons: fan-triangulate (k=3 is the common case)
                tris = [
                    poly[:, [0, j, j + 1]] for j in range(1, first_n - 1)
                ]
                out["faces"] = np.concatenate(tris, axis=0) if len(tris) > 1 else tris[0]
            else:
                # mixed polygon sizes: per-row scan with fan triangulation
                faces = []
                for _ in range(count):
                    k = int(np.frombuffer(body, dtype=cdt, count=1, offset=offset)[0])
                    offset += cdt.itemsize
                    idxs = np.frombuffer(body, dtype=idt, count=k, offset=offset)
                    offset += idt.itemsize * k
                    for j in range(1, k - 1):
                        faces.append((idxs[0], idxs[j], idxs[j + 1]))
                out["faces"] = np.asarray(faces, np.int32)


def _scan_list_element(body, offset, count, props, endian):
    for _ in range(count):
        for p in props:
            if p[0] == "scalar":
                offset += np.dtype(p[2]).itemsize
            else:
                _, _, count_t, item_t = p
                n = int(np.frombuffer(body, dtype=endian + count_t, count=1, offset=offset)[0])
                offset += np.dtype(count_t).itemsize + n * np.dtype(item_t).itemsize
    return None, offset


# ---------------------------------------------------------------------------
# OBJ parsing (positions / texcoords / normals, triangulated)
# ---------------------------------------------------------------------------

def load_obj(path) -> Dict[str, np.ndarray]:
    """Minimal OBJ loader: v / vt / vn / f (fan-triangulated).

    OBJ indexes positions and texcoords independently; vertices are split so
    that each output vertex has a single (pos, uv, normal) triple — the same
    per-vertex-attribute contract the PLY path provides.
    """
    positions, texcoords, normals, faces = [], [], [], []
    with open(path, "r", errors="replace") as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                positions.append([float(x) for x in t[1:4]])
            elif t[0] == "vt":
                texcoords.append([float(t[1]), float(t[2])])
            elif t[0] == "vn":
                normals.append([float(x) for x in t[1:4]])
            elif t[0] == "f":
                corner = []
                for spec in t[1:]:
                    ids = (spec.split("/") + ["", ""])[:3]
                    vi = int(ids[0])
                    ti = int(ids[1]) if ids[1] else 0
                    ni = int(ids[2]) if ids[2] else 0
                    corner.append((vi, ti, ni))
                for k in range(1, len(corner) - 1):  # fan triangulation
                    faces.append((corner[0], corner[k], corner[k + 1]))

    positions = np.asarray(positions, dtype=np.float32)
    texcoords = np.asarray(texcoords, dtype=np.float32) if texcoords else None
    normals_arr = np.asarray(normals, dtype=np.float32) if normals else None

    # split vertices by unique (v, vt, vn) triple
    key_to_new = {}
    new_pos, new_uv, new_nrm, tri = [], [], [], []
    nv = len(positions)
    nt = len(texcoords) if texcoords is not None else 0
    nn = len(normals_arr) if normals_arr is not None else 0

    def resolve(idx, n):
        return idx - 1 if idx > 0 else n + idx

    for tri_corners in faces:
        ids = []
        for (vi, ti, ni) in tri_corners:
            key = (vi, ti, ni)
            if key not in key_to_new:
                key_to_new[key] = len(new_pos)
                new_pos.append(positions[resolve(vi, nv)])
                if texcoords is not None and ti != 0:
                    new_uv.append(texcoords[resolve(ti, nt)])
                if normals_arr is not None and ni != 0:
                    new_nrm.append(normals_arr[resolve(ni, nn)])
            ids.append(key_to_new[key])
        tri.append(ids)

    out: Dict[str, np.ndarray] = {
        "vertices": np.asarray(new_pos, dtype=np.float32),
        "faces": np.asarray(tri, dtype=np.int32),
    }
    if new_uv and len(new_uv) == len(new_pos):
        out["uv"] = np.asarray(new_uv, dtype=np.float32)
    if new_nrm and len(new_nrm) == len(new_pos):
        out["normals"] = np.asarray(new_nrm, dtype=np.float32)
    return out


def load_stl(path) -> Dict[str, np.ndarray]:
    """STL loader (binary + ascii), same dict contract as :func:`load_ply`.

    STL stores independent triangles (no shared-vertex topology or
    attributes); exact-duplicate vertices are welded back so silhouette
    edge adjacency and winding repair work.  Per-facet normals are
    dropped (recomputed downstream when needed).  Closes the practical
    remainder of the reference's trimesh.load format breadth
    (reference diffdope.py:784).
    """
    path = Path(path)
    raw = path.read_bytes()

    # ascii STLs start with 'solid', but some binary exporters write that
    # too — trust the binary triangle-count arithmetic over the prefix
    is_binary = len(raw) >= 84
    if is_binary:
        (ntri,) = np.frombuffer(raw[80:84], "<u4")
        is_binary = len(raw) >= 84 + int(ntri) * 50
    if is_binary:
        rec = np.frombuffer(
            raw, dtype=np.dtype([("n", "<f4", 3), ("v", "<f4", (3, 3)),
                                 ("attr", "<u2")]),
            count=int(ntri), offset=84,
        )
        tri_pts = rec["v"].astype(np.float32).reshape(-1, 3)
    else:
        pts = []
        for line in raw.decode("ascii", "replace").splitlines():
            parts = line.split()
            if parts[:1] == ["vertex"]:
                pts.append([float(parts[1]), float(parts[2]),
                            float(parts[3])])
        if len(pts) % 3:
            raise ValueError(f"{path}: ascii STL vertex count not a "
                             f"multiple of 3 ({len(pts)})")
        tri_pts = np.asarray(pts, np.float32).reshape(-1, 3)
    if len(tri_pts) == 0:
        raise ValueError(f"{path}: no triangles")

    verts, inverse = np.unique(tri_pts, axis=0, return_inverse=True)
    return {
        "vertices": verts.astype(np.float32),
        "faces": inverse.reshape(-1, 3).astype(np.int32),
    }


# ---------------------------------------------------------------------------
# glTF / GLB parsing (the reference loads any trimesh-readable format,
# reference diffdope.py:784; .glb is the common interchange one beyond
# PLY/OBJ)
# ---------------------------------------------------------------------------

_GLTF_CTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_GLTF_NCOMP = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4}


def _gltf_read_accessor(gltf, buffers, idx):
    """Accessor -> (count, n_comp) numpy array (tightly packed or strided)."""
    acc = gltf["accessors"][idx]
    if "sparse" in acc:
        # loading a sparse accessor as its (possibly zero) base view would
        # silently produce wrong geometry — fail loudly instead
        raise ValueError(
            "glTF sparse accessors are not supported (accessor "
            f"{idx}); re-export the asset with dense buffers"
        )
    n_comp = _GLTF_NCOMP[acc["type"]]
    dtype = np.dtype(_GLTF_CTYPES[acc["componentType"]]).newbyteorder("<")
    count = acc["count"]
    bv = gltf["bufferViews"][acc["bufferView"]]
    buf = buffers[bv.get("buffer", 0)]
    start = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = bv.get("byteStride") or dtype.itemsize * n_comp
    if stride == dtype.itemsize * n_comp:
        arr = np.frombuffer(buf, dtype=dtype, count=count * n_comp,
                            offset=start).reshape(count, n_comp)
    else:  # interleaved vertex buffer
        rows = np.frombuffer(buf, dtype=np.uint8, count=count * stride,
                             offset=start).reshape(count, stride)
        arr = rows[:, : dtype.itemsize * n_comp].copy().view(dtype).reshape(
            count, n_comp
        )
    if acc.get("normalized") and arr.dtype != np.float32:
        arr = arr.astype(np.float32) / np.iinfo(arr.dtype).max
    return arr


def _gltf_decode_image(gltf, buffers, image_idx):
    import cv2

    img_def = gltf["images"][image_idx]
    if "bufferView" in img_def:
        bv = gltf["bufferViews"][img_def["bufferView"]]
        raw = buffers[bv.get("buffer", 0)][
            bv.get("byteOffset", 0): bv.get("byteOffset", 0) + bv["byteLength"]
        ]
        data = np.frombuffer(raw, np.uint8)
    elif img_def.get("uri", "").startswith("data:"):
        import base64

        data = np.frombuffer(
            base64.b64decode(img_def["uri"].split(",", 1)[1]), np.uint8
        )
    else:
        return None  # external file URI resolved by the caller
    img = cv2.imdecode(data, cv2.IMREAD_COLOR)
    if img is None:
        return None
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def load_glb(path) -> Dict[str, np.ndarray]:
    """Minimal glTF 2.0 binary (.glb) / JSON (.gltf) loader.

    Returns the same dict contract as :func:`load_ply`: ``vertices``,
    ``faces``, and when present ``normals``, ``uv``, ``colors``, plus
    ``texture_image`` (decoded (H,W,3) float RGB from the material's
    baseColorTexture) and ``uv_origin`` = 'top' (glTF uv v=0 is the image
    TOP row, already matching texture storage — no V flip needed, unlike
    the PLY convention).

    All primitives of all mesh instances are concatenated with their node
    world transforms APPLIED (positions by the 4x4, normals by its
    inverse-transpose) — matching what the trimesh-backed reference loads
    (reference diffdope.py:784).  A mesh referenced by several nodes is
    emitted once per instance.  Sparse accessors raise (unsupported).
    """
    import json as _json
    import struct

    path = Path(path)
    raw = path.read_bytes()
    buffers = []
    if raw[:4] == b"glTF":
        _, _, total_len = struct.unpack("<4sII", raw[:12])
        off = 12
        gltf = None
        while off < min(total_len, len(raw)):
            clen, ctype = struct.unpack("<II", raw[off:off + 8])
            chunk = raw[off + 8: off + 8 + clen]
            if ctype == 0x4E4F534A:  # 'JSON'
                gltf = _json.loads(chunk)
            elif ctype == 0x004E4942:  # 'BIN\0'
                buffers.append(chunk)
            off += 8 + clen
        if gltf is None:
            raise ValueError(f"{path}: GLB without a JSON chunk")
    else:
        gltf = _json.loads(raw)
        for b in gltf.get("buffers", []):
            uri = b.get("uri", "")
            if uri.startswith("data:"):
                import base64

                buffers.append(base64.b64decode(uri.split(",", 1)[1]))
            else:
                buffers.append((path.parent / uri).read_bytes())

    # mesh instances = (mesh index, node world matrix) from the scene graph;
    # assets with no nodes fall back to identity-placed meshes
    def _node_local(nd):
        if "matrix" in nd:  # column-major 16 floats
            return np.asarray(nd["matrix"], np.float64).reshape(4, 4).T
        m = np.eye(4)
        if "scale" in nd:
            m[:3, :3] = np.diag(np.asarray(nd["scale"], np.float64))
        if "rotation" in nd:  # quat x,y,z,w
            x, y, z, w = (float(v) for v in nd["rotation"])
            r = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ])
            m[:3, :3] = r @ m[:3, :3]
        if "translation" in nd:
            m[:3, 3] = np.asarray(nd["translation"], np.float64)
        return m

    nodes = gltf.get("nodes", [])
    instances = []  # (mesh_idx, (4,4) world)
    if nodes:
        scenes = gltf.get("scenes", [])
        roots = (
            scenes[gltf.get("scene", 0)].get("nodes", range(len(nodes)))
            if scenes else range(len(nodes))
        )

        def _walk(i, parent):
            nd = nodes[i]
            world = parent @ _node_local(nd)
            if "mesh" in nd:
                instances.append((nd["mesh"], world))
            for c in nd.get("children", []):
                _walk(c, world)

        for r in roots:
            _walk(r, np.eye(4))
    if not instances:
        instances = [(i, np.eye(4)) for i in range(len(gltf.get("meshes", [])))]

    verts, faces, normals, uvs, colors = [], [], [], [], []
    tex_image = None
    base = 0
    for mesh_idx, world in instances:
        mesh_def = gltf["meshes"][mesh_idx]
        is_identity = np.allclose(world, np.eye(4))
        if not is_identity:
            nrm_mat = np.linalg.inv(world[:3, :3]).T
        for prim in mesh_def.get("primitives", []):
            if prim.get("mode", 4) != 4:  # TRIANGLES only
                continue
            attrs = prim["attributes"]
            pos = _gltf_read_accessor(gltf, buffers, attrs["POSITION"])
            pos = pos.astype(np.float32)
            if not is_identity:
                pos = (
                    pos.astype(np.float64) @ world[:3, :3].T + world[:3, 3]
                ).astype(np.float32)
            npts = len(pos)
            if "indices" in prim:
                idx = _gltf_read_accessor(
                    gltf, buffers, prim["indices"]
                ).reshape(-1).astype(np.int64)
            else:
                idx = np.arange(npts, dtype=np.int64)
            verts.append(pos)
            faces.append(idx.reshape(-1, 3) + base)
            nrm = (
                _gltf_read_accessor(gltf, buffers, attrs["NORMAL"])
                .astype(np.float32)
                if "NORMAL" in attrs else np.zeros((npts, 3), np.float32)
            )
            if not is_identity and np.abs(nrm).max() > 0:
                nrm = nrm.astype(np.float64) @ nrm_mat.T
                nrm = (
                    nrm / np.maximum(
                        np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12
                    )
                ).astype(np.float32)
            normals.append(nrm)
            uvs.append(
                _gltf_read_accessor(gltf, buffers, attrs["TEXCOORD_0"])
                .astype(np.float32)
                if "TEXCOORD_0" in attrs else np.zeros((npts, 2), np.float32)
            )
            colors.append(
                _gltf_read_accessor(gltf, buffers, attrs["COLOR_0"])
                .astype(np.float32)[:, :3]
                if "COLOR_0" in attrs else np.full((npts, 3), 0.7, np.float32)
            )
            if tex_image is None and "material" in prim:
                mat = gltf["materials"][prim["material"]]
                bct = mat.get("pbrMetallicRoughness", {}).get(
                    "baseColorTexture"
                )
                if bct is not None:
                    src = gltf["textures"][bct["index"]].get("source")
                    if src is not None:
                        tex_image = _gltf_decode_image(gltf, buffers, src)
                        if tex_image is None:
                            uri = gltf["images"][src].get("uri")
                            if uri and not uri.startswith("data:"):
                                tex_image = _load_texture(path.parent / uri)
            base += npts
    if not verts:
        raise ValueError(f"{path}: no triangle primitives found")

    out: Dict[str, np.ndarray] = {
        "vertices": np.concatenate(verts, 0),
        "faces": np.concatenate(faces, 0).astype(np.int32),
    }
    nrm = np.concatenate(normals, 0)
    if np.abs(nrm).max() > 0:
        out["normals"] = nrm
    uv = np.concatenate(uvs, 0)
    has_uv = np.ptp(uv, axis=0).max() > 0
    if has_uv:
        out["uv"] = uv
        out["uv_origin"] = "top"
    col = np.concatenate(colors, 0)
    if not np.allclose(col, 0.7):
        out["colors"] = col
    if tex_image is not None and has_uv:
        out["texture_image"] = tex_image
    return out


# ---------------------------------------------------------------------------
# Mesh container
# ---------------------------------------------------------------------------

def build_edge_adjacency(faces: np.ndarray) -> np.ndarray:
    """Per-edge neighbor triangle map for silhouette classification.

    Returns (T, 3) int32: entry [t, k] is the index of the triangle sharing
    edge (faces[t,k], faces[t,(k+1)%3]) with triangle t, or -1 for boundary
    (or non-manifold) edges.  Consumed by render.antialias to restrict edge
    blending to true silhouettes (boundary edges and front/back transitions)
    — the role of nvdiffrast's topology hash.

    Uses the C++ kernel (native/meshproc.cpp) when available; numpy/dict
    fallback otherwise.
    """
    from diffdope_tpu import native

    native_adj = native.build_edge_adjacency(np.asarray(faces, np.int32))
    if native_adj is not None:
        return native_adj

    t = len(faces)
    adj = np.full((t, 3), -1, dtype=np.int32)
    edge_map: dict = {}
    for ti in range(t):
        f = faces[ti]
        for k in range(3):
            key = (min(f[k], f[(k + 1) % 3]), max(f[k], f[(k + 1) % 3]))
            edge_map.setdefault(key, []).append((ti, k))
    for users in edge_map.values():
        if len(users) == 2:
            (t0, k0), (t1, k1) = users
            adj[t0, k0] = t1
            adj[t1, k1] = t0
    return adj


def orient_faces_consistently(pos: np.ndarray, faces: np.ndarray):
    """Rewind faces so the whole mesh has consistent outward orientation.

    Scan/export meshes often carry mixed winding (AlphabetSoup: ~8% of
    visible faces disagree with their neighbors), which breaks two things
    downstream: the silhouette facing bits (planar._silhouette_planar
    classifies front/back by the screen-space determinant sign) and
    backface culling (planar.bin_triangles_planar cull_backfaces).  The
    reference never needs this because nvdiffrast rasterizes both windings
    (reference diffdope.py:198-200) and hashes topology for antialiasing;
    on TPU a consistent winding is what makes the 2x cull lever valid.

    Coverage, depth, and attribute interpolation are winding-invariant
    (flipping a face permutes its barycentrics together with its indices),
    so rewinding never changes rendered images — only the facing
    classification.

    Returns (faces_out, info) where info is a dict with:
      ``closed``      every edge is shared by exactly 2 faces,
      ``orientable``  orientation propagation met no conflict,
      ``n_flipped``   number of faces whose winding was reversed.
    faces_out is a new array (input untouched); if the mesh is
    non-orientable the input winding is returned unchanged.

    Method: BFS over the face-adjacency graph flipping faces so every
    shared edge is traversed in opposite directions by its two faces, then
    a per-component global flip so the signed volume is positive (outward
    winding for a closed mesh under the right-handed convention the
    pipeline's facing test assumes).
    """
    faces = np.asarray(faces, np.int32)
    t = len(faces)
    info = {"closed": t > 0, "orientable": True, "n_flipped": 0}
    if t == 0:
        return faces.copy(), info

    from diffdope_tpu import native

    native_out = native.orient_faces(np.asarray(pos, np.float32), faces)
    if native_out is not None:
        return native_out

    # undirected edge -> up to 2 (face, direction) users
    edge_map: dict = {}
    manifold = True
    for ti in range(t):
        f = faces[ti]
        for k in range(3):
            a, b = int(f[k]), int(f[(k + 1) % 3])
            key = (a, b) if a < b else (b, a)
            users = edge_map.setdefault(key, [])
            users.append((ti, a < b))
            if len(users) > 2:
                manifold = False
    if not manifold:
        info["closed"] = False
        info["orientable"] = False
        return faces.copy(), info

    # face adjacency with relative-flip parity
    nbrs = [[] for _ in range(t)]
    for users in edge_map.values():
        if len(users) != 2:
            info["closed"] = False
            continue
        (t0, d0), (t1, d1) = users
        # consistent orientation: the two faces traverse the shared edge in
        # OPPOSITE directions, i.e. eff_dir differs; same recorded dir means
        # the neighbor needs the opposite flip state
        same_dir = d0 == d1
        nbrs[t0].append((t1, same_dir))
        nbrs[t1].append((t0, same_dir))

    flip = np.zeros(t, bool)
    seen = np.zeros(t, bool)
    comp = np.full(t, -1, np.int32)
    n_comp = 0
    from collections import deque

    for start in range(t):
        if seen[start]:
            continue
        seen[start] = True
        comp[start] = n_comp
        queue = deque([start])
        while queue:
            cur = queue.popleft()
            for nxt, same_dir in nbrs[cur]:
                want = flip[cur] ^ same_dir
                if seen[nxt]:
                    if flip[nxt] != want:
                        info["orientable"] = False
                        return faces.copy(), info
                else:
                    seen[nxt] = True
                    flip[nxt] = want
                    comp[nxt] = n_comp
                    queue.append(nxt)
        n_comp += 1

    out = faces.copy()
    out[flip] = out[flip][:, [0, 2, 1]]

    # per-component outward sign via signed volume
    v0, v1, v2 = pos[out[:, 0]], pos[out[:, 1]], pos[out[:, 2]]
    vol_f = np.einsum("ij,ij->i", v0.astype(np.float64),
                      np.cross(v1.astype(np.float64), v2.astype(np.float64)))
    for c in range(n_comp):
        sel = comp == c
        if vol_f[sel].sum() < 0:
            out[sel] = out[sel][:, [0, 2, 1]]
            flip[sel] = ~flip[sel]
    info["n_flipped"] = int(flip.sum())
    return out, info


def _compute_vertex_normals(pos: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (trimesh fallback equivalent)."""
    from diffdope_tpu import native

    out = native.vertex_normals(pos, faces)
    if out is not None:
        return out

    fn = np.cross(
        pos[faces[:, 1]] - pos[faces[:, 0]],
        pos[faces[:, 2]] - pos[faces[:, 0]],
    )
    normals = np.zeros_like(pos)
    for i in range(3):
        np.add.at(normals, faces[:, i], fn)
    lens = np.linalg.norm(normals, axis=1, keepdims=True)
    return (normals / np.maximum(lens, 1e-20)).astype(np.float32)


@dataclass
class Mesh:
    """Static-shape mesh ready for the TPU render path.

    Mirrors the reference ``Mesh`` attributes (diffdope.py:746-935):
    ``pos`` (N,3) f32 (scaled), ``pos_idx`` (T,3) i32, ``vtx_normals``,
    ``uv``/``uv_idx``/``tex`` or ``vtx_color``, ``bounding_volume``,
    ``dimensions``, ``center_point``, ``has_textured_map``.  Arrays include
    padding: ``num_vertices``/``num_triangles`` give true counts, and padded
    triangles are degenerate (zero area).
    """

    pos: np.ndarray
    pos_idx: np.ndarray
    vtx_normals: np.ndarray
    num_vertices: int
    num_triangles: int
    uv: Optional[np.ndarray] = None
    uv_idx: Optional[np.ndarray] = None
    tex: Optional[np.ndarray] = None
    vtx_color: Optional[np.ndarray] = None
    path_model: Optional[str] = None
    bounding_volume: Optional[np.ndarray] = None
    dimensions: Optional[list] = None
    center_point: Optional[list] = None
    edge_adj: Optional[np.ndarray] = None  # (T,3) silhouette adjacency
    # Winding diagnosis from orient_faces_consistently: a closed orientable
    # mesh (every edge shared by exactly 2 faces, no orientation conflict)
    # is eligible for backface culling in the raster path.
    is_closed: bool = False
    is_oriented: bool = False
    n_rewound: int = 0
    # (T,3,3) texture baked to per-corner colors (bilinear at corner uvs).
    # At typical scan-mesh density (a few screen px per triangle) Gouraud
    # interpolation of these is visually identical to per-pixel texture
    # sampling, and on TPU it folds into the per-triangle attribute planes
    # (render/shade.py) — zero texture gathers per step.
    corner_colors: Optional[np.ndarray] = None

    @property
    def has_textured_map(self) -> bool:
        return self.tex is not None

    def enable_gradients_texture(self):
        """API parity with reference diffdope.py:909-920.

        In the functional TPU pipeline appearance optimization is selected by
        passing ``optimize_appearance=True`` to the refiner, which lifts
        ``tex``/``vtx_color`` into the optimized parameter pytree; this method
        exists so reference code ports cleanly and simply marks the intent.
        """
        self.optimize_appearance = True

    def scaled(self, scale: float) -> "Mesh":
        bv = np.stack([self.pos[: self.num_vertices].min(0), self.pos[: self.num_vertices].max(0)])
        return replace(self, pos=self.pos * scale, bounding_volume=bv * scale)


def load_mesh(
    path,
    scale: float = 1.0,
    vertex_pad: int = 8,
    triangle_pad: int = 8,
    texture_path=None,
    fix_winding: bool = True,
) -> Mesh:
    """Load a PLY/OBJ mesh with the reference's conventions.

    Args:
        path: mesh file (.ply, .obj, .glb/.gltf, or .stl).
        scale: vertex scale factor (reference diffdope.py:793).
        vertex_pad / triangle_pad: pad counts to multiples of these so XLA
            sees static, aligned shapes.
        texture_path: override texture image path; defaults to the PLY
            TextureFile comment resolved next to the mesh.
        fix_winding: rewind faces to a consistent outward orientation when
            the mesh is orientable (see orient_faces_consistently).  Images
            are winding-invariant; this corrects silhouette facing bits and
            enables backface culling for closed meshes.
    """
    path = Path(path)
    if path.suffix.lower() == ".ply":
        data = load_ply(path)
    elif path.suffix.lower() == ".obj":
        data = load_obj(path)
    elif path.suffix.lower() in (".glb", ".gltf"):
        data = load_glb(path)
    elif path.suffix.lower() == ".stl":
        data = load_stl(path)
    else:
        raise ValueError(f"unsupported mesh format: {path.suffix}")

    pos = data["vertices"].astype(np.float32) * float(scale)
    faces = data["faces"].astype(np.int32)
    n, t = len(pos), len(faces)

    wind_info = {"closed": False, "orientable": False, "n_flipped": 0}
    if fix_winding:
        faces, wind_info = orient_faces_consistently(pos, faces)
        if wind_info["n_flipped"]:
            log.info(
                "rewound %d/%d faces to consistent orientation (closed=%s)",
                wind_info["n_flipped"], t, wind_info["closed"],
            )

    normals = data.get("normals")
    if normals is None:
        normals = _compute_vertex_normals(pos, faces)

    bv = np.stack([pos.min(axis=0), pos.max(axis=0)])
    dims = (bv[1] - bv[0]).tolist()
    center = ((bv[0] + bv[1]) / 2.0).tolist()

    # texture
    tex = None
    uv = data.get("uv")
    if texture_path is None and "texture_file" in data:
        cand = path.parent / data["texture_file"]
        if cand.exists():
            texture_path = cand
    if texture_path is not None and uv is not None:
        tex = _load_texture(texture_path)
        uv = uv.copy()
        uv[:, 1] = 1.0 - uv[:, 1]  # V flip (reference diffdope.py:822)
    elif data.get("texture_image") is not None and uv is not None:
        # glTF embeds the texture; its uv origin is already the image top
        # row (uv_origin='top'), so no V flip
        tex = data["texture_image"]

    vtx_color = None
    if tex is None:
        vtx_color = data.get("colors")
        if vtx_color is None:
            # flat gray fallback (reference requires one of the two; be lenient)
            vtx_color = np.full((n, 3), 0.7, dtype=np.float32)
        uv = None

    # pad to static shapes
    n_pad = pad_to_multiple(max(n, 1), vertex_pad)
    t_pad = pad_to_multiple(max(t, 1), triangle_pad)

    def pad_rows(a, total, fill=0):
        if a is None:
            return None
        pad = np.full((total - len(a),) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, pad], axis=0)

    adj = build_edge_adjacency(faces)

    corner_colors = None
    if tex is not None and uv is not None:
        corner_colors = bake_corner_colors(tex, uv, faces)

    mesh = Mesh(
        pos=pad_rows(pos, n_pad),
        pos_idx=pad_rows(faces, t_pad),  # zero-index padding = degenerate tris
        vtx_normals=pad_rows(normals.astype(np.float32), n_pad),
        num_vertices=n,
        num_triangles=t,
        uv=pad_rows(uv, n_pad) if uv is not None else None,
        uv_idx=pad_rows(faces, t_pad) if uv is not None else None,
        tex=tex,
        vtx_color=pad_rows(vtx_color, n_pad) if vtx_color is not None else None,
        path_model=str(path),
        bounding_volume=bv,
        dimensions=dims,
        center_point=center,
        edge_adj=pad_rows(adj, t_pad, fill=-1),
        is_closed=wind_info["closed"],
        is_oriented=wind_info["orientable"],
        n_rewound=wind_info["n_flipped"],
        corner_colors=pad_rows(corner_colors, t_pad) if corner_colors is not None else None,
    )
    log.info(
        "loaded mesh %s: %d verts (pad %d), %d tris (pad %d), textured=%s",
        path, n, n_pad, t, t_pad, mesh.has_textured_map,
    )
    return mesh


def save_ply(
    path,
    vertices: np.ndarray,
    faces: np.ndarray,
    colors: Optional[np.ndarray] = None,
    normals: Optional[np.ndarray] = None,
) -> None:
    """Write an ascii PLY (vertices/faces, optional per-vertex colors/normals)."""
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces, np.int64)
    n, t = len(vertices), len(faces)
    props = ["property float x", "property float y", "property float z"]
    cols = [vertices]
    if normals is not None:
        props += ["property float nx", "property float ny", "property float nz"]
        cols.append(np.asarray(normals, np.float32))
    header = ["ply", "format ascii 1.0", f"element vertex {n}", *props]
    if colors is not None:
        header += ["property uchar red", "property uchar green", "property uchar blue"]
    header += [f"element face {t}", "property list uchar int vertex_indices", "end_header"]
    with open(path, "w") as f:
        f.write("\n".join(header) + "\n")
        data = np.concatenate(cols, axis=1)
        for i in range(n):
            row = " ".join(f"{x:.6f}" for x in data[i])
            if colors is not None:
                c = np.clip(np.asarray(colors[i]) * 255, 0, 255).astype(int)
                row += f" {c[0]} {c[1]} {c[2]}"
            f.write(row + "\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def bake_corner_colors(tex: np.ndarray, uv: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Bilinear-sample the texture at each triangle corner's uv -> (T,3,3).

    Host-side, once per mesh.  uv is expected already V-flipped (texture row
    0 at v=0), matching the load convention above.
    """
    th, tw = tex.shape[:2]
    uv_c = uv[faces]  # (T, 3, 2)
    fx = uv_c[..., 0] * tw - 0.5
    fy = uv_c[..., 1] * th - 0.5
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    ax = (fx - x0)[..., None]
    ay = (fy - y0)[..., None]

    def tap(ix, iy):
        return tex[np.remainder(iy, th), np.remainder(ix, tw)]

    c00 = tap(x0, y0)
    c10 = tap(x0 + 1, y0)
    c01 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)
    top = c00 * (1 - ax) + c10 * ax
    bot = c01 * (1 - ax) + c11 * ax
    return (top * (1 - ay) + bot * ay).astype(np.float32)


def _load_texture(texture_path) -> np.ndarray:
    import cv2

    img = cv2.imread(str(texture_path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"cannot read texture {texture_path}")
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return (img.astype(np.float32) / 255.0)
