"""Generate stand-in meshes for the synthesized BOP perturbation sweep.

The bundled reference data ships exactly ONE example mesh (AlphabetSoup, a
near-symmetric can) — using it as the stand-in for every obj_id confounds
the ADD metric: rotation error about its symmetry axis is invisible to any
silhouette loss, so ADD stays large while ADD-S saturates (docs/ROADMAP.md
round-3 findings).  To deconfound the metric, the sweep matrix adds:

* ``standin_asym.ply`` — a lumpy deformed icosphere with a high-contrast
  asymmetric vertex-color pattern: NO symmetry in geometry or appearance,
  so ADD and ADD-S should agree (any ADD/ADD-S split is an optimizer
  failure, not a metric artifact).
* ``standin_sym.ply`` — a rotationally symmetric capped cylinder with
  rotation-invariant color bands: ADD is unidentifiable about the axis by
  construction (ADD-S is the honest score — the BOP convention for such
  objects).

Meshes are authored in BOP millimetre units (~100 mm across, matching the
dataset models the JSONs describe) and written as ascii PLY with per-vertex
uint8 colors — the loader path `load_mesh` already parses
(diffdope_tpu/mesh.py).  Deterministic (fixed PRNG seed).

Usage:  python tools/make_standins.py [outdir=data/standins]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def write_ply_ascii(path, verts_mm, faces, colors01):
    """Minimal ascii PLY writer: xyz + uint8 rgb vertices, triangle faces."""
    v = np.asarray(verts_mm, np.float64)
    f = np.asarray(faces, np.int64)
    c = np.clip(np.asarray(colors01, np.float64) * 255.0, 0, 255).astype(np.uint8)
    lines = [
        "ply",
        "format ascii 1.0",
        "comment diffdope_tpu stand-in mesh (tools/make_standins.py)",
        f"element vertex {len(v)}",
        "property float x",
        "property float y",
        "property float z",
        "property uchar red",
        "property uchar green",
        "property uchar blue",
        f"element face {len(f)}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    for p, col in zip(v, c):
        lines.append(
            f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {col[0]} {col[1]} {col[2]}"
        )
    for tri in f:
        lines.append(f"3 {tri[0]} {tri[1]} {tri[2]}")
    Path(path).write_text("\n".join(lines) + "\n")


def make_asym(subdiv: int = 4, radius_mm: float = 50.0, seed: int = 11):
    """Lumpy icosphere: radial bumps from fixed random 3-D gaussians plus a
    high-contrast color pattern keyed to different fixed directions."""
    from diffdope_tpu.testing import icosphere

    v, f = icosphere(subdiv)
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(6, 3))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    amps = rng.uniform(0.15, 0.45, size=6) * np.sign(rng.normal(size=6))
    widths = rng.uniform(0.35, 0.8, size=6)
    r = np.ones(len(v))
    for cdir, a, wdt in zip(centers, amps, widths):
        d = v @ cdir
        r += a * np.exp(-((1.0 - d) / wdt) ** 2)
    verts = v * (r[:, None] * radius_mm)

    ccenters = rng.normal(size=(5, 3))
    ccenters /= np.linalg.norm(ccenters, axis=1, keepdims=True)
    palette = np.array(
        [[0.95, 0.15, 0.1], [0.1, 0.8, 0.2], [0.15, 0.25, 0.95],
         [0.95, 0.85, 0.1], [0.85, 0.15, 0.9]]
    )
    w = np.stack([np.exp(-((1.0 - v @ c) / 0.5) ** 2) for c in ccenters], 1)
    w = w / np.maximum(w.sum(1, keepdims=True), 1e-9)
    colors = w @ palette
    return verts, f, colors


def make_sym(n_seg: int = 64, n_rings: int = 17, radius_mm: float = 35.0,
             height_mm: float = 100.0):
    """Capped cylinder with height-banded colors: rotationally symmetric in
    geometry AND appearance (ADD about the axis is unidentifiable)."""
    ang = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
    zs = np.linspace(-height_mm / 2, height_mm / 2, n_rings)
    verts, colors = [], []
    for z in zs:
        for a in ang:
            verts.append([radius_mm * np.cos(a), radius_mm * np.sin(a), z])
    # height bands: 5 alternating colors, constant around the axis
    band_cols = np.array(
        [[0.9, 0.2, 0.2], [0.95, 0.95, 0.9], [0.2, 0.3, 0.9],
         [0.95, 0.95, 0.9], [0.2, 0.8, 0.3]]
    )
    for z in zs:
        band = int((z / height_mm + 0.5) * 4.999)
        colors.extend([band_cols[band]] * n_seg)
    faces = []
    for ring in range(n_rings - 1):
        for s in range(n_seg):
            a = ring * n_seg + s
            b = ring * n_seg + (s + 1) % n_seg
            c = (ring + 1) * n_seg + s
            d = (ring + 1) * n_seg + (s + 1) % n_seg
            faces += [[a, b, d], [a, d, c]]
    # caps: center fans
    verts.append([0, 0, -height_mm / 2]); colors.append(band_cols[0])
    verts.append([0, 0, height_mm / 2]); colors.append(band_cols[-1])
    lo, hi = len(verts) - 2, len(verts) - 1
    for s in range(n_seg):
        faces.append([lo, (s + 1) % n_seg, s])
        top0 = (n_rings - 1) * n_seg
        faces.append([hi, top0 + s, top0 + (s + 1) % n_seg])
    return np.asarray(verts), np.asarray(faces), np.asarray(colors)


def write_ply_textured(path, verts_mm, faces, uv, texture_file):
    """Ascii PLY with texture_u/texture_v vertex properties + a TextureFile
    comment — the layout `load_ply` resolves to (tex, uv, uv_idx)."""
    v = np.asarray(verts_mm, np.float64)
    f = np.asarray(faces, np.int64)
    t = np.asarray(uv, np.float64)
    lines = [
        "ply",
        "format ascii 1.0",
        f"comment TextureFile {texture_file}",
        f"element vertex {len(v)}",
        "property float x",
        "property float y",
        "property float z",
        "property float texture_u",
        "property float texture_v",
        f"element face {len(f)}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    for p, st in zip(v, t):
        lines.append(
            f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {st[0]:.6f} {st[1]:.6f}"
        )
    for tri in f:
        lines.append(f"3 {tri[0]} {tri[1]} {tri[2]}")
    Path(path).write_text("\n".join(lines) + "\n")


def make_texture(kind: str, size: int = 1024, seed: int = 3) -> np.ndarray:
    """Synthetic RGB textures with controlled frequency content."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size] / size
    if kind == "checker":
        # high-frequency: 32-px checker + per-cell random tint (the worst
        # case for the per-corner bake, which low-passes inside triangles)
        cells = 32
        cx = (xx * cells).astype(int)
        cy = (yy * cells).astype(int)
        base = ((cx + cy) % 2).astype(np.float64)
        tint = rng.uniform(0.2, 1.0, size=(cells, cells, 3))
        img = base[..., None] * tint[cy, cx] + (1 - base[..., None]) * 0.08
    elif kind == "smooth":
        # low-frequency: a few broad gaussian color blobs (the best case)
        img = np.full((size, size, 3), 0.25)
        for _ in range(6):
            cx0, cy0 = rng.uniform(0, 1, 2)
            sig = rng.uniform(0.15, 0.4)
            col = rng.uniform(0, 1, 3)
            g = np.exp(-(((xx - cx0) ** 2 + (yy - cy0) ** 2) / (2 * sig**2)))
            img = img + g[..., None] * col * 0.6
        img = img / img.max()
    else:
        raise ValueError(kind)
    return np.clip(img, 0, 1).astype(np.float32)


def make_asym_uv(subdiv: int = 4, radius_mm: float = 50.0, seed: int = 11):
    """The lumpy asym geometry with seam-free planar uv (u,v from x,y)."""
    v, f, _ = make_asym(subdiv, radius_mm, seed)
    lo, hi = v[:, :2].min(0), v[:, :2].max(0)
    uv = (v[:, :2] - lo) / (hi - lo)
    return v, f, uv


def main(outdir="data/standins"):
    import cv2

    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    v, f, c = make_asym()
    write_ply_ascii(out / "standin_asym.ply", v, f, c)
    print(f"standin_asym.ply: {len(v)} verts, {len(f)} tris, "
          f"extent {np.ptp(v, 0).round(1)} mm")
    v, f, c = make_sym()
    write_ply_ascii(out / "standin_sym.ply", v, f, c)
    print(f"standin_sym.ply: {len(v)} verts, {len(f)} tris, "
          f"extent {np.ptp(v, 0).round(1)} mm")
    v, f, uv = make_asym_uv()
    for kind in ("checker", "smooth"):
        tex = make_texture(kind)
        png = f"standin_{kind}.png"
        cv2.imwrite(
            str(out / png),
            cv2.cvtColor((tex * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
        )
        write_ply_textured(out / f"standin_tex_{kind}.ply", v, f, uv, png)
        print(f"standin_tex_{kind}.ply + {png}: {len(v)} verts, "
              f"{len(f)} tris, 1024^2 texture")


if __name__ == "__main__":
    main(*sys.argv[1:])
