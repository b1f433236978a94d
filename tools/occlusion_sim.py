"""Estimate the win of an occlusion (front-to-back) early-out in phase A.

The quad-outer raster kernel visits, for every quad (q rows x 128 lanes),
the chunks of its y-window (docs/ROADMAP.md).  An early-out would stop
visiting once (a) every lane has a winner and (b) no remaining chunk can
beat them: min over remaining chunks of zmin >= current winner zmax.  This
script simulates that exit rule EXACTLY from one real render of the bench
problem (winner ids + winner depth per pixel, per-chunk member triangles +
vertex-depth zmin) and reports total (quad, chunk) visit counts under:

  A. current y-order, per-quad y-windows (the shipped kernel) — baseline
  B. A + early-exit (suffix-min z over the window; no re-sorting)
  C. (y-band, zmin) composite sort, band-granularity windows + early-exit
  D. full zmin sort (no y-windows: every used chunk) + early-exit

The exit rule only fires for quads whose 512 pixels are ALL foreground
(an uncovered lane keeps z=+inf, so zmax stays +inf) — exactly the
kernel's conservative condition.  Visits are what phase A's cost scales
with (each visit = one (q*tw, kc) eval at the VPU issue ceiling), so the
visit ratio bounds the achievable phase-A speedup.

Run on the TPU chip (default env):  python tools/occlusion_sim.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from diffdope_tpu import geometry as geo
    from diffdope_tpu.mesh import load_mesh
    from diffdope_tpu.optimize import pose_matrix, pose_params
    from diffdope_tpu.render.pipeline import render_batch
    from diffdope_tpu.render.planar import (
        bin_triangles_planar,
        corner_planes,
        det_planar,
        packed_planar,
    )

    RES = (400, 400)
    h, w = RES
    f = 1.2 * max(h, w)
    proj = jnp.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )
    mesh_path = Path("/root/reference/data/example/mesh/AlphabetSoup.ply")
    m = load_mesh(mesh_path, scale=0.01, vertex_pad=128, triangle_pad=128)
    pos = jnp.asarray(m.pos)
    tri = jnp.asarray(m.pos_idx)
    edge_adj = jnp.asarray(m.edge_adj)

    th, tw = 32, 128
    max_k = 2048
    kc = 256  # _pick_chunk(2048) at the default DD_KCHUNK cap
    q = 4     # DD_QROWS default
    nty, ntx = -(-h // th), -(-w // tw)
    nq = th // q

    # bench poses: gt + the bench's perturbation (bench.py build_problem)
    rng = np.random.default_rng(0)
    q_gt = geo.quat_from_axis_angle(np.array([0.2, 1.0, 0.1]), 0.8)
    t_gt = np.array([0.0, 0.0, -2.0])
    dq = geo.quat_from_axis_angle(rng.normal(size=3), np.deg2rad(8.0))
    q0 = np.asarray(geo.quat_multiply(jnp.asarray(dq), jnp.asarray(q_gt)))
    t0 = t_gt + np.array([0.02, -0.015, 0.04])

    @jax.jit
    def problem(qq, tt):
        mtx, _, _ = pose_matrix(pose_params(qq, tt, 1))
        r = render_batch(
            proj, mtx, pos, tri, RES, edge_adj=edge_adj,
            corner_colors=jnp.asarray(m.corner_colors),
            raster_impl="pallas", tile_hw=(th, tw),
            max_tris_per_tile=max_k, layout="stacked",
        )
        mvp = jnp.einsum("ij,bjk->bik", proj, mtx, precision="highest")
        pc = pos[tri.reshape(-1)][None]
        cp = corner_planes(pc[0], mvp)
        _, det = packed_planar(cp, None, None, None)
        dt = det_planar(cp)
        idx, counts, ovf = bin_triangles_planar(
            cp, dt, RES, (th, tw), max_k
        )
        # vertex view-space depth (camera looks down -z): per-triangle
        # conservative nearest point = min over the 3 corners
        vview = jnp.einsum(
            "bij,nj->bni", mtx[:, :3, :],
            jnp.concatenate([pos, jnp.ones((pos.shape[0], 1))], axis=1),
            precision="highest",
        )
        vdepth = -vview[0, :, 2]                     # (V,)
        tridepth = vdepth[tri]                       # (T, 3)
        tzmin = tridepth.min(axis=1)                 # (T,)
        return r["mask"][0], r["depth"][0], idx, counts, ovf, tzmin

    for name, (qq, tt) in {
        "initial(8deg)": (q0, t0),
        "gt": (np.asarray(q_gt), t_gt),
    }.items():
        mask, depth, idx, counts, ovf, tzmin = map(
            np.asarray,
            problem(jnp.asarray(qq, jnp.float32), jnp.asarray(tt, jnp.float32)),
        )
        fg = mask[..., 0] > 0.5
        # depth channel: fg pixels carry the winner's (signed) view z
        d_fg = depth[fg]
        pixdepth = np.where(fg, -depth[..., 0] if d_fg.mean() < 0 else depth[..., 0], np.inf)
        print(f"== pose {name}: fg px {fg.sum()}, overflow {int(ovf)}, "
              f"max count {counts.max()}", file=sys.stderr)

        visits = {"A_ywin": 0, "B_ywin_exit": 0, "C_bandz_exit": 0,
                  "D_zsort_exit": 0}
        nfull = 0
        nquads = 0
        ytri = None
        # per-triangle y bounds in pixel rows (for chunk y-ranges):
        # reuse binning's result implicitly via membership; compute rows
        # from vertex NDC here for window simulation
        for t in range(nty * ntx):
            cnt = int(counts[t])
            if cnt == 0:
                continue
            ty, tx = divmod(t, ntx)
            used = -(-cnt // kc)
            chunks = []
            for ci in range(used):
                members = idx[t, ci * kc: min((ci + 1) * kc, cnt)]
                members = members[members >= 0]
                if members.size == 0:
                    continue
                chunks.append(members)
            if not chunks:
                continue
            # per-chunk pixel-row span: winners only tell part; use the
            # triangles' vertex y NDC -> rows (same as binning's span)
            if ytri is None:
                # vertex NDC y per triangle corner (recompute on host once
                # per pose): y_pix = (ndc_y + 1) * h / 2 - 0.5
                import jax.numpy as _j
                mtx_, _, _ = pose_matrix(pose_params(
                    jnp.asarray(qq, jnp.float32),
                    jnp.asarray(tt, jnp.float32), 1))
                mvp_ = np.asarray(jnp.einsum(
                    "ij,bjk->bik", proj, mtx_, precision="highest"))[0]
                vh = np.concatenate(
                    [np.asarray(pos), np.ones((pos.shape[0], 1))], axis=1)
                clip = vh @ mvp_.T
                ndc_y = clip[:, 1] / np.maximum(np.abs(clip[:, 3]), 1e-9) * np.sign(clip[:, 3])
                ypix = (ndc_y + 1.0) * h / 2.0 - 0.5
                ytri = ypix[np.asarray(tri)]  # (T, 3)
            rows_of = lambda mem: (
                int(np.clip(np.floor(ytri[mem].min()), 0, h - 1)),
                int(np.clip(np.ceil(ytri[mem].max()), 0, h - 1)),
            )
            spans = [rows_of(c) for c in chunks]
            zmins = [float(tzmin[c].min()) for c in chunks]

            y0 = ty * th
            x0 = tx * tw
            for qi in range(nq):
                r_lo = y0 + qi * q
                r_hi = min(r_lo + q, h)
                quad_fg = fg[r_lo:r_hi, x0:min(x0 + tw, w)]
                full = bool(quad_fg.all()) and quad_fg.size == q * tw
                qmax = float(pixdepth[r_lo:r_hi, x0:min(x0 + tw, w)].max())
                nquads += 1
                nfull += int(full)
                # which chunks are useful for this quad (y-span intersects)
                inter = [i for i, (lo, hi) in enumerate(spans)
                         if not (hi < r_lo or lo > r_hi - 1)]
                if not inter:
                    continue

                def walk(window):
                    """Visits walking `window` (a list of chunk indices)
                    with the exit rule: stop once no remaining chunk's
                    zmin can beat the quad's final winner max depth.
                    Exact for the kernel's conservative exit (a remaining
                    chunk containing any winner would have zmin <= qmax,
                    so rem_zmin >= qmax implies all winners visited and
                    the running winner zmax equals qmax)."""
                    v = 0
                    for j in range(len(window)):
                        v += 1
                        if full:
                            rem = window[j + 1:]
                            rem_zmin = (min(zmins[i2] for i2 in rem)
                                        if rem else np.inf)
                            if rem_zmin >= qmax:
                                break
                    return v

                # A: y-window (contiguous range over useful chunks), all
                # visited, no exit
                wlo, whi = min(inter), max(inter) + 1
                win_y = list(range(wlo, whi))
                visits["A_ywin"] += len(win_y)
                # B: same window + exit
                visits["B_ywin_exit"] += walk(win_y)
                # C: sort by (band of span-lo, zmin), band = th rows
                # (tile-height bands keep windows whole-tile here since
                # chunks of one tile share the band unless spans differ);
                # use band = 8 rows on the chunk's lo row
                band = 8
                order_c = sorted(
                    range(len(chunks)),
                    key=lambda i: (spans[i][0] // band, zmins[i]),
                )
                pos_in_c = {ci: p for p, ci in enumerate(order_c)}
                lo_c = min(pos_in_c[i] for i in inter)
                hi_c = max(pos_in_c[i] for i in inter) + 1
                win_c = [order_c[p] for p in range(lo_c, hi_c)]
                visits["C_bandz_exit"] += walk(win_c)
                # D: pure z sort, whole tile visited
                order_d = sorted(range(len(chunks)), key=lambda i: zmins[i])
                visits["D_zsort_exit"] += walk(order_d)

        base = visits["A_ywin"]
        print(f"pose {name}: quads {nquads} (fully-fg {nfull}), "
              f"visits A={base}", file=sys.stderr)
        for k in ("B_ywin_exit", "C_bandz_exit", "D_zsort_exit"):
            print(f"  {k}: {visits[k]}  ({visits[k]/max(base,1):.3f}x of A)",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
