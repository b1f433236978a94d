"""Headline benchmark: pose refinements per second on one TPU chip.

North-star target (BASELINE.md): 64 pose hypotheses, 100 Adam steps at
400x400, one BOP-scale object, in under 1 second on a single v5e chip.
The reference publishes no numbers (BASELINE.md) — the baseline is the
driver-set 1.0 refinement/s target, so vs_baseline = refinements/sec.

Prints exactly ONE JSON line on stdout.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


# The headline protocol is fixed (BASELINE.md); the env overrides exist so
# the SAME script can prove flags (e.g. --mesh-axis on the virtual CPU
# mesh) at reduced scale without a second code path.
BATCH = int(os.environ.get("DD_BATCH", "64"))
STEPS = int(os.environ.get("DD_STEPS", "100"))  # nb_iterations=99 -> 100 steps
RES = tuple(
    int(x) for x in os.environ.get("DD_RES", "400x400").split("x")
)


def _mesh_axis() -> int:
    """--mesh-axis N / DD_MESH_AXIS=N: shard the hypothesis batch over the
    first N devices (jax.shard_map, diffdope_tpu/parallel.py).  N=1 (the
    default) is the plain single-chip bench; on a pod slice the SAME
    protocol produces the multi-chip headline number with no other change.
    Proven on the 8-device virtual CPU mesh (docs/ROADMAP.md)."""
    import os

    n = int(os.environ.get("DD_MESH_AXIS", "1"))
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--mesh-axis" and i + 1 < len(argv):
            n = int(argv[i + 1])
        elif a.startswith("--mesh-axis="):
            n = int(a.split("=", 1)[1])
    return n


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_problem():
    """AlphabetSoup (real BOP-scale mesh, 13.8k tris) when available;
    otherwise a synthetic icosphere of comparable complexity.

    All mesh/camera constants stay HOST (numpy): jit closure constants
    that live on device are fetched back to host at lowering, and the
    first device->host read of a process pays a 15-400s tunnel channel
    init (diffdope_tpu/devices.py) — this was the round-4 '250s gt render
    compile' mystery."""
    import jax.numpy as jnp

    from diffdope_tpu import geometry as geo
    from diffdope_tpu.mesh import load_mesh
    from diffdope_tpu.optimize import pose_matrix, pose_params
    from diffdope_tpu.render.pipeline import render_batch

    h, w = RES
    f = 1.2 * max(h, w)
    proj = np.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        np.float32,
    )

    import os as _os

    mesh_path = Path("/root/reference/data/example/mesh/AlphabetSoup.ply")
    if _os.environ.get("DD_MESH", "") == "icosphere":
        mesh_path = Path("/nonexistent")  # force the closed synthetic mesh
    if mesh_path.exists():
        m = load_mesh(mesh_path, scale=0.01, vertex_pad=128, triangle_pad=128)
        pos = np.asarray(m.pos)
        tri = np.asarray(m.pos_idx)
        edge_adj = np.asarray(m.edge_adj)
        # DD_TEXTURE=exact: per-pixel bilinear sampling (the reference's
        # dr.texture(filter_mode='linear') contract) instead of the default
        # per-corner bake — unfused path, measured for the baked-vs-exact
        # speed/accuracy tradeoff (docs/ROADMAP.md)
        if _os.environ.get("DD_TEXTURE", "baked") == "exact" and m.tex is not None:
            kw = dict(
                tex=np.asarray(m.tex), uv=np.asarray(m.uv),
                uv_idx=np.asarray(m.uv_idx),
            )
            log(f"mesh: AlphabetSoup {m.num_triangles} tris (exact bilinear texture)")
        else:
            kw = dict(corner_colors=np.asarray(m.corner_colors))
            log(f"mesh: AlphabetSoup {m.num_triangles} tris (texture baked to corners)")
    else:
        from diffdope_tpu.mesh import build_edge_adjacency
        from diffdope_tpu.testing import icosphere

        v, fc = icosphere(5)  # 20480 tris
        pos = (v * 0.4).astype(np.float32)
        tri = np.asarray(fc)
        edge_adj = np.asarray(build_edge_adjacency(fc))
        kw = dict(vtx_color=(v * 0.5 + 0.5).astype(np.float32))
        log("mesh: synthetic icosphere 20480 tris")

    import os
    tile_h = int(os.environ.get("DD_TILE_H", "32"))
    # tile width < 128 selects sub-tile binning (raster_v2._sub_split):
    # narrower bins cut the raster kernels' evaluated (pixel, triangle)
    # pairs ~in half per halving (6-px triangles vs the bin width).
    # 64 default: measured 4.64 -> 4.17 s at bench scale (round 5; the
    # pre-round-5 'measured dead' verdict was at full frame, where the
    # extra per-tile base cost ate the win — post-ROI-crop it doesn't;
    # DD_TILE_H=16 on top adds nothing, 4.178 vs 4.166)
    tile_w = int(os.environ.get("DD_TILE_W", "64"))
    max_k = int(os.environ.get("DD_MAX_K", "2048"))
    # NB: AlphabetSoup has ~8% inconsistently-wound visible faces — culling
    # is wrong for it (validated); only enable for known-consistent meshes
    cull = os.environ.get("DD_CULL", "0") == "1"

    def render_fn(mtx, layout="channels", bins=None, max_occ=16,
                  compact_total=None, tile=None):
        return render_batch(
            proj, mtx, pos, tri, RES, edge_adj=edge_adj,
            raster_impl="pallas", tile_hw=tile or (tile_h, tile_w),
            max_tris_per_tile=max_k,
            layout=layout, cull_backfaces=cull, bins=bins, max_occ=max_occ,
            compact_total=compact_total, **kw,
        )

    import jax

    rng = np.random.default_rng(0)
    q_gt = geo.quat_from_axis_angle(np.array([0.2, 1.0, 0.1]), 0.8)
    t_gt = np.array([0.0, 0.0, -2.0])  # object ~200px diameter at 400x400

    # everything on-device must be jitted: under the axon backend each
    # *distinct* eager primitive triggers a remote compile (~0.5s each)
    # gt renders at the full 128-wide tile regardless of DD_TILE_W: tile
    # shape never changes the rendered image (bit-exact, tests/
    # test_subtile.py), but the UNFUSED stacked path at sub-tile widths
    # costs ~270s of Mosaic compile (vs ~10s at 128) — only the fused
    # refinement path benefits from sub-tile binning, so only it pays
    # for the sub=2 kernel body
    @jax.jit
    def make_gt(q, t):
        mtx_gt, _, _ = pose_matrix(pose_params(q, t, 1))
        r = render_fn(mtx_gt, layout="stacked", tile=(tile_h, 128))
        return {"rgb": r["rgb"][0], "segmentation": r["mask"][0], "depth": r["depth"][0]}

    t0 = time.perf_counter()
    gt = make_gt(jnp.asarray(q_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32))
    jax.block_until_ready(gt["rgb"])
    log(f"gt render (compile+run): {time.perf_counter() - t0:.2f}s")
    log(f"gt mask px: {float(np.asarray(gt['segmentation'][...,0]).sum()):.0f}")

    # one-time overflow check: dropped (tile, tri) pairs mean degraded renders
    from diffdope_tpu.render.planar import bin_triangles_planar, corner_planes, packed_planar

    @jax.jit
    def _ovf(q, t):
        mtx_gt, _, _ = pose_matrix(pose_params(q, t, 1))
        mvp = jnp.einsum("ij,bjk->bik", proj, mtx_gt, precision="highest")
        pc = pos[tri.reshape(-1)][None]
        cp = corner_planes(pc[0], mvp)
        _, det = packed_planar(cp, None, None, None)
        _, counts, ov = bin_triangles_planar(cp, det, RES, (tile_h, tile_w), max_k)
        return ov, counts.max()

    ov, cmax = _ovf(jnp.asarray(q_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32))
    log(f"bin overflow: {int(ov)} (max tile count {int(cmax)} / K={max_k})")

    dq = geo.quat_from_axis_angle(rng.normal(size=3), np.deg2rad(8.0))
    q0 = np.asarray(geo.quat_multiply(jnp.asarray(dq), jnp.asarray(q_gt)))
    t0 = t_gt + np.array([0.02, -0.015, 0.04])
    params0 = pose_params(q0.astype(np.float32), t0.astype(np.float32), BATCH)

    # Per-step binning stays (it is cheap and margin-free: binning with a
    # pose-drift margin inflates per-tile occupancy ~3x, which costs more in
    # the kernels and the inverted-bin reduction than re-binning saves).
    # The inverted-bin map width M is sized from the measured occupancy at
    # the gt pose plus slack — the backward gather scales with B*32*T*M, so
    # M=16 wastes ~3x when the real max is ~4.
    from diffdope_tpu.render.gather_rows import bin_occupancy

    @jax.jit
    def _occ(q, t):
        mtx_gt, _, _ = pose_matrix(pose_params(q, t, 1))
        mvp = jnp.einsum("ij,bjk->bik", proj, mtx_gt, precision="highest")
        pc = pos[tri.reshape(-1)][None]
        cp = corner_planes(pc, mvp)
        _, det = packed_planar(cp, None, None, None)
        idx, _, _ = bin_triangles_planar(
            cp, det, RES, (tile_h, tile_w), max_k, cull_backfaces=cull
        )
        return bin_occupancy(idx, tri.shape[0])

    occ = int(_occ(jnp.asarray(q_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32)))
    max_occ = int(os.environ.get("DD_MAX_OCC", str(max(4, occ + 2))))
    log(f"bin occupancy: max {occ} -> inverted-map M={max_occ}")

    # compact bin table (planar.compact_bins): size the static capacity
    # from the probe pose's per-tile chunk counts plus slack; the uniform-K
    # table pads every tile to the worst occupancy (~6.5x at bench scale)
    compact_total = None
    if os.environ.get("DD_COMPACT", "1") == "1":
        from diffdope_tpu.render.raster_v2 import _pick_chunk

        kc_c = _pick_chunk(max_k)

        @jax.jit
        def _tot(q, t):
            mtx_gt, _, _ = pose_matrix(pose_params(q, t, 1))
            mvp = jnp.einsum("ij,bjk->bik", proj, mtx_gt, precision="highest")
            pc = pos[tri.reshape(-1)][None]
            cp = corner_planes(pc, mvp)
            _, det = packed_planar(cp, None, None, None)
            _, counts, _ = bin_triangles_planar(
                cp, det, RES, (tile_h, tile_w), max_k, cull_backfaces=cull
            )
            return jnp.sum(-(-counts // kc_c) * kc_c)

        tot0 = int(_tot(jnp.asarray(q_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32)))
        compact_total = int(os.environ.get(
            "DD_COMPACT_TOT",
            str(-(-int(tot0 * 1.35 + kc_c) // kc_c) * kc_c),
        ))
        nt_all = -(-RES[0] // tile_h) * max(-(-RES[1] // 128) * (128 // tile_w), -(-RES[1] // tile_w))
        log(f"compact table: {tot0} probe slots -> capacity {compact_total} "
            f"(uniform K would be {nt_all * max_k})")

    # DD_BINS=pre: one conservative binning (margin DD_BIN_MARGIN px) for
    # the whole refinement — per-step binning/top_k disappear from the
    # step, and with the bin-ordered packing the static-table gather
    # becomes loop-invariant too
    bins = None
    if os.environ.get("DD_BINS", "step") == "pre":
        from diffdope_tpu.render.pipeline import precompute_bins

        margin = float(os.environ.get("DD_BIN_MARGIN", "24"))
        mtx0, _, _ = jax.jit(
            lambda q, t: pose_matrix(pose_params(q, t, 1))
        )(jnp.asarray(q_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32))
        k_pre = max_k
        for attempt in range(4):
            try:
                bins = precompute_bins(
                    proj, mtx0, pos, tri, RES, (tile_h, tile_w), k_pre, margin,
                    max_occ="auto",
                )
                break
            except ValueError as e:  # margin overflowed K: widen and retry
                log(str(e))
                if attempt == 3:
                    raise
                k_pre = -(-(k_pre * 3 // 2) // 128) * 128
        log(f"bins: precomputed (margin {margin}px, K={k_pre}, "
            f"max count {int(np.asarray(bins[1]).max())}, "
            f"M={bins[2].shape[1]})")

    base_render = render_fn

    def render_fn(mtx, layout="channels"):
        return base_render(mtx, layout=layout, max_occ=max_occ, bins=bins,
                           compact_total=compact_total)

    fused_ctx = dict(
        proj=proj, pos=pos, tri=tri, edge_adj=edge_adj,
        tile_hw=(tile_h, tile_w), max_k=max_k, cull=cull, max_occ=max_occ,
        corner_colors=kw.get("corner_colors"), vtx_color=kw.get("vtx_color"),
        tex=kw.get("tex"), uv=kw.get("uv"), uv_idx=kw.get("uv_idx"),
        bins=bins, compact_total=compact_total,
    )
    return render_fn, gt, params0, fused_ctx


def main():
    import jax

    import os as _os
    if _os.environ.get("DD_ONCHIP_CHECK") == "1":
        # on-hardware exactness assertions for the production kernels
        # (tools/onchip_check.py); runs before the timing so a FAIL is
        # visible even if the bench then proceeds
        sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
        from onchip_check import check

        rc = check(log)
        if rc != 0:
            log("onchip check FAILED (continuing to bench)")

    from diffdope_tpu.losses import select_losses
    import functools

    from diffdope_tpu.optimize import draw_learning_rates, refine, refine_segmented

    log(f"devices: {jax.devices()}")
    # kick off the tunnel's device->host channel init NOW, on a thread —
    # the first fetch of a process costs 15-400s (devices.py) and would
    # otherwise serialize into the first diagnostic scalar read below
    from diffdope_tpu.devices import warm_transfers_async

    warm_join = warm_transfers_async()
    render_fn, gt, params0, fused_ctx = build_problem()
    warm_join(log)
    loss_fns, weights = select_losses(
        {"l1_mask": True, "weight_mask": 1.0, "l1_rgb_with_mask": True, "weight_rgb": 0.7}
    )
    lrs = draw_learning_rates(jax.random.PRNGKey(0), BATCH, (0.5, 4.0))

    # fused shade+AA+loss kernel path (default): per-pixel images never
    # touch HBM; DD_FUSED=0 falls back to render_batch + losses
    import os
    fused_fn = None
    has_appearance = (
        fused_ctx["corner_colors"] is not None
        or fused_ctx["vtx_color"] is not None
        or fused_ctx["tex"] is not None
    )
    if os.environ.get("DD_FUSED", "1") == "1" and has_appearance:
        from diffdope_tpu.render.pipeline import make_fused_loss

        fused_fn = make_fused_loss(
            fused_ctx["proj"], fused_ctx["pos"], fused_ctx["tri"], RES,
            gt, lrs, weights, use_rgb=True, use_depth=False, use_mask=True,
            edge_adj=fused_ctx["edge_adj"],
            corner_colors=fused_ctx["corner_colors"],
            vtx_color=fused_ctx["vtx_color"],
            tex=fused_ctx["tex"], uv=fused_ctx["uv"],
            uv_idx=fused_ctx["uv_idx"],
            tile_hw=fused_ctx["tile_hw"],
            max_tris_per_tile=fused_ctx["max_k"],
            cull_backfaces=fused_ctx["cull"], max_occ=fused_ctx["max_occ"],
            bins=fused_ctx["bins"],
            compact_total=fused_ctx["compact_total"],
        )
        log(
            "loss path: fused kernel"
            + (" (semi-fused exact texture)" if fused_ctx["tex"] is not None
               else "")
        )

    jit_refine = jax.jit(
        functools.partial(
            refine, render_fn=render_fn, loss_fns=tuple(loss_fns),
            weights=weights, nb_iterations=STEPS - 1,
            base_lr=0.02, lr_decay=0.1, optimizer="adam",
            fused_loss_fn=fused_fn,
        ),
        static_argnames=("num_steps",),
    )

    # one device dispatch for all 100 steps: ~12s execution is comfortably
    # under the ~60s single-execution watchdog, and each extra segment costs
    # ~0.9s of tunnel dispatch overhead
    segment = int(os.environ.get("DD_SEGMENT", "100"))

    mesh_axis = _mesh_axis()
    if mesh_axis > 1:
        from diffdope_tpu.parallel import hypothesis_mesh, refine_sharded

        if len(jax.devices()) < mesh_axis:
            log(f"mesh-axis {mesh_axis} > {len(jax.devices())} devices; abort")
            raise SystemExit(2)
        mesh = hypothesis_mesh(mesh_axis)
        log(f"mesh: {mesh_axis} devices over the hypothesis axis "
            f"({BATCH // mesh_axis} hypotheses/device)")

        def run(p):
            res = refine_sharded(
                p, render_fn, loss_fns, gt, lrs, weights, mesh,
                nb_iterations=STEPS - 1, base_lr=0.02, lr_decay=0.1,
                optimizer="adam", fused_loss_fn=fused_fn,
            )
            return res
    else:
        def run(p):
            return refine_segmented(
                p, render_fn, loss_fns, gt, lrs, weights,
                nb_iterations=STEPS - 1, segment_steps=segment,
                jit_refine=jit_refine,
            )

    # compile + warm up
    t0 = time.perf_counter()
    result = run(params0)
    jax.block_until_ready(result.mtx_history)
    log(f"first run (incl. compile): {time.perf_counter() - t0:.2f}s")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        result = run(params0)
        jax.block_until_ready(result.mtx_history)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    log(f"steady-state refinement times: {[f'{t:.3f}' for t in times]}")
    log(f"final loss: {float(np.asarray(result.total_loss)[-1]):.5f}")
    # scan telemetry: nonzero counts mean degraded renders this bench run
    # (bin overflow drops (tile,tri) pairs; crop leak = silhouette pixels
    # escaping the ROI crop — pipeline.make_fused_loss)
    for tk in ("_bin_overflow", "_crop_leak"):
        v = (result.telemetry or {}).get(tk)
        if v is not None and int(np.asarray(v).max(initial=0)) > 0:
            log(f"WARNING {tk}: up to {int(np.asarray(v).max())}/step")

    value = 1.0 / dt  # refinements per second (64 hyps, 100 steps, 400x400)
    mesh_note = f", mesh-axis {mesh_axis}" if mesh_axis > 1 else ""
    print(json.dumps({
        "metric": "pose_refinements_per_sec",
        "value": round(value, 3),
        "unit": (
            f"refinements/s (B={BATCH}, {STEPS} adam steps, "
            f"{RES[0]}x{RES[1]}{mesh_note})"
        ),
        "vs_baseline": round(value / 1.0, 3),
    }))


if __name__ == "__main__":
    main()
