"""Native (C++) mesh-preprocessing kernels, loaded via ctypes.

Compiled on first use with g++ into a cached shared library; every entry
point has a pure-numpy fallback in mesh.py, so the package works without a
toolchain.  See meshproc.cpp for the rationale (this replaces the role of
the reference's JIT-compiled CUDA extension, reference diffdope/ops.py:65-97,
for the host-side mesh path).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_SRC = Path(__file__).resolve().parent / "meshproc.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_library() -> Optional[Path]:
    cache_dir = Path(tempfile.gettempdir()) / "diffdope_tpu_native"
    cache_dir.mkdir(exist_ok=True)
    src_stamp = f"{_SRC.stat().st_mtime_ns:x}"
    lib_path = cache_dir / f"meshproc_{src_stamp}.so"
    if lib_path.exists():
        return lib_path
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(lib_path)],
            check=True, capture_output=True, timeout=120,
        )
        return lib_path
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.info("native meshproc build unavailable (%s); using numpy fallback", e)
        return None


def get_library() -> Optional[ctypes.CDLL]:
    """The compiled library, or None when no toolchain is available."""
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build_library()
        if path is not None:
            lib = ctypes.CDLL(str(path))
            lib.dd_build_edge_adjacency.restype = ctypes.c_int
            lib.dd_build_edge_adjacency.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ]
            lib.dd_vertex_normals.restype = ctypes.c_int
            lib.dd_vertex_normals.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ]
            lib.dd_parse_ply_f32_body.restype = ctypes.c_int
            lib.dd_parse_ply_f32_body.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.dd_orient_faces.restype = ctypes.c_int
            lib.dd_orient_faces.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            _LIB = lib
    return _LIB


def build_edge_adjacency(faces: np.ndarray) -> Optional[np.ndarray]:
    """(T,3) int32 faces -> (T,3) int32 neighbor map, or None if the native
    library is unavailable."""
    lib = get_library()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, dtype=np.int32)
    adj = np.empty_like(faces)
    rc = lib.dd_build_edge_adjacency(
        faces.ctypes.data, faces.shape[0], adj.ctypes.data
    )
    return adj if rc == 0 else None


def vertex_normals(pos: np.ndarray, faces: np.ndarray) -> Optional[np.ndarray]:
    """Area-weighted vertex normals, or None if unavailable."""
    lib = get_library()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.float32)
    faces = np.ascontiguousarray(faces, dtype=np.int32)
    out = np.empty_like(pos)
    rc = lib.dd_vertex_normals(
        pos.ctypes.data, pos.shape[0], faces.ctypes.data, faces.shape[0],
        out.ctypes.data,
    )
    return out if rc == 0 else None


def orient_faces(pos: np.ndarray, faces: np.ndarray) -> Optional[tuple]:
    """Consistent-winding repair (mesh.orient_faces_consistently contract).

    Returns (faces_out, info_dict) or None if the native library is
    unavailable."""
    lib = get_library()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.float32)
    faces = np.ascontiguousarray(faces, dtype=np.int32)
    out = np.empty_like(faces)
    info = np.zeros(3, np.int64)
    rc = lib.dd_orient_faces(
        pos.ctypes.data, pos.shape[0], faces.ctypes.data, faces.shape[0],
        out.ctypes.data, info.ctypes.data,
    )
    if rc != 0:
        return None
    return out, {
        "closed": bool(info[0]),
        "orientable": bool(info[1]),
        "n_flipped": int(info[2]),
    }


def parse_ply_f32_body(
    body: bytes, num_verts: int, stride: int, num_faces: int
) -> Optional[tuple]:
    """Fast path for all-float32 binary PLY bodies with triangle faces."""
    lib = get_library()
    if lib is None:
        return None
    verts = np.empty((num_verts, stride), np.float32)
    faces = np.empty((num_faces, 3), np.int32)
    buf = np.frombuffer(body, np.uint8)
    rc = lib.dd_parse_ply_f32_body(
        buf.ctypes.data, len(body), num_verts, stride, num_faces,
        verts.ctypes.data, faces.ctypes.data,
    )
    return (verts, faces) if rc == 0 else None
