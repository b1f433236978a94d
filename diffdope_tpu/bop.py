"""BOP dataset sweep: refine every object of a scene frame.

Library form of the reference's examples/run_bop_scene.py flow
(reference run_bop_scene.py:13-93): given a BOP-format scene directory
(rgb/, depth/, mask_visib/, scene_camera.json), a models directory
(obj_XXXXXX.ply) and per-frame perturbed poses ({frame: [{cam_R_m2c(9),
cam_t_m2c(3), obj_id}]}), run the refiner per object and return/record the
refined poses in the OpenCV/BOP frame.

Scene-level parallelism is embarrassingly parallel (one process per host /
scene — SURVEY.md section 2.4); within a frame, meshes are cached across
objects like the reference (run_bop_scene.py:52-56).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from diffdope_tpu.camera import Camera
from diffdope_tpu.config import ConfigNode
from diffdope_tpu.diffdope import DiffDope
from diffdope_tpu.image import Image, Scene
from diffdope_tpu.mesh import Mesh, load_mesh
from diffdope_tpu.metrics import add_metric, adds_metric, object_diameter
from diffdope_tpu.object3d import Object3D

log = logging.getLogger(__name__)


PERTURBATION_LEVELS = (
    "deg_001_trans_001", "deg_010_trans_004", "deg_040_trans_016",
)


def parse_level(level: str):
    """'deg_010_trans_004' -> (10.0, 4.0): rotation error in degrees and
    translation error magnitude in the perturbation JSONs' native unit
    (the Diff-DOPE paper's 1/4/16 cm levels).  The synthesized protocol
    applies it as ``value * obj_scale`` working units — e.g. 0.04 at the
    default obj_scale=0.01, i.e. 4 cm at the sweep's metre-ish frame
    (camera 2.0 units from the object)."""
    parts = level.split("_")
    return float(parts[1]), float(parts[3])


def find_error_scenes(data_root, dataset: str):
    """[(scene_id, {level: json_path})] under the bundled perturbation data
    (reference data/{hope,ycbv,tless}/**/scene_error_*.json)."""
    root = Path(data_root) / dataset
    out = []
    for split_dir in sorted(root.iterdir()):
        if not split_dir.is_dir():
            continue
        for scene_dir in sorted(split_dir.iterdir()):
            levels = {}
            for lv in PERTURBATION_LEVELS:
                p = scene_dir / f"scene_error_{lv}.json"
                if p.exists():
                    levels[lv] = p
            if levels:
                out.append((f"{split_dir.name}/{scene_dir.name}", levels))
    return out


def sweep_perturbation_levels(
    data_root="/root/reference/data",
    dataset: str = "hope",
    levels=None,
    max_scenes: int = 1,
    max_frames: int = 1,
    max_objects: int = 3,
    batchsize: int = 16,
    nb_iterations: int = 40,
    resolution=(160, 160),
    obj_scale: float = 0.01,
    mesh_path: str = "/root/reference/data/example/mesh/AlphabetSoup.ply",
    bop_root=None,
    models_dir=None,
    cfg: Optional[ConfigNode] = None,
    seed: int = 0,
    shard=(0, 1),
    log_fn=print,
    optimizer: str = "adam",
    base_lr: float = 0.02,
    lr_bounds=(0.5, 4.0),
    loss_weights=(0.7, 0.0, 1.0),
    init_jitter=(0.0, 0.0),
    restarts: int = 0,
    restart_jitter=(10.0, 0.02),
    argmin_rule: str = "best_step",
) -> Dict[str, dict]:
    """Sweep the bundled perturbation JSONs and aggregate ADD(-S)/AUC.

    The reference's eval protocol (SURVEY.md section 6): 3 perturbation
    levels x {HOPE val, YCB-V test, T-LESS primesense} scenes, per-frame
    perturbed poses {cam_R_m2c, cam_t_m2c, obj_id}
    (data/copy_data_here.py:8-17).  Two modes:

    * bop_root given: real BOP images/masks/meshes; the JSON pose is the
      refinement INIT and scene_gt.json provides the ground truth (the
      reference's run_bop_scene.py flow + metrics).
    * bop_root None (the repo ships only the JSONs): SYNTHESIZED protocol —
      the JSON pose is treated as ground truth, its image is rendered with
      the stand-in mesh, and the init is drawn by perturbing with the
      level's own magnitudes (deg_010_trans_004 -> 10 deg, 4 cm).  Results
      are honest refinement accuracy for the level's error scale, with the
      caveat that geometry is the stand-in mesh, and are labeled
      'synthesized'.

    Multi-host: shard=(i, n) processes every n-th scene starting at i —
    scene-level sweeps are embarrassingly parallel (SURVEY.md section 2.4);
    merge the per-host JSON outputs to aggregate.

    Returns {level: {'n', 'add_mean', 'add_med', 'acc_01d', 'auc_01d',
                     'mode', 'per_object': [...]}}.
    """
    from diffdope_tpu.devices import warm_transfers_async
    from diffdope_tpu.metrics import add_auc

    # overlap the tunnel's one-time device->host channel init (15-400s on
    # the axon backend, devices.py) with the sweep's first trace/compile
    warm_transfers_async()

    levels = list(levels or PERTURBATION_LEVELS)
    scenes = find_error_scenes(data_root, dataset)
    scenes = scenes[shard[0] :: shard[1]][:max_scenes]
    if not scenes:
        raise FileNotFoundError(f"no perturbation JSONs under {data_root}/{dataset}")

    results: Dict[str, dict] = {}
    mesh_cache: Dict[int, Mesh] = {}
    for level in levels:
        per_object = []
        for scene_id, level_paths in scenes:
            if level not in level_paths:
                continue
            with open(level_paths[level]) as f:
                frames = json.load(f)
            for frame in sorted(frames, key=lambda s: int(s))[:max_frames]:
                objs = frames[frame][:max_objects] if max_objects else frames[frame]
                if bop_root is not None:
                    per_object.extend(_sweep_real_frame(
                        cfg, bop_root, models_dir, dataset, scene_id, frame,
                        objs, obj_scale, mesh_cache,
                    ))
                else:
                    per_object.extend(_sweep_synth_objects(
                        objs, level, scene_id, frame, mesh_path, obj_scale,
                        resolution, batchsize, nb_iterations, seed, log_fn,
                        optimizer, base_lr, lr_bounds, loss_weights,
                        init_jitter, restarts, restart_jitter, argmin_rule,
                    ))
        adds = np.asarray([o["add"] for o in per_object], float)
        adds_s = np.asarray(
            [o.get("adds", o["add"]) for o in per_object], float
        )
        dias = np.asarray([o["diameter"] for o in per_object], float)
        norm = adds / np.maximum(dias, 1e-9)
        norm_s = adds_s / np.maximum(dias, 1e-9)
        # zero-iteration CONTROL column: the init pose scored by the same
        # metric — the refiner must not lose cases the init already had
        # (acc_01d >= acc_01d_init per cell is the regression guard)
        add_i = np.asarray(
            [o["add_init"] for o in per_object if "add_init" in o], float
        )
        norm_i = add_i / np.maximum(dias[: len(add_i)], 1e-9)
        results[level] = {
            "n": len(per_object),
            "mode": "real" if bop_root is not None else "synthesized",
            "add_mean": float(adds.mean()) if len(adds) else float("nan"),
            "add_med": float(np.median(adds)) if len(adds) else float("nan"),
            "acc_01d": float((norm < 0.1).mean()) if len(adds) else float("nan"),
            "auc_01d": add_auc(norm, 0.1) if len(adds) else float("nan"),
            # symmetric-aware twin (closest-point ADD-S): the honest metric
            # for near-symmetric meshes, where a silhouette-perfect pose can
            # have large ADD (BOP handles such objects with ADD-S/MSSD)
            "adds_acc_01d": (
                float((norm_s < 0.1).mean()) if len(adds_s) else float("nan")
            ),
            "adds_auc_01d": (
                add_auc(norm_s, 0.1) if len(adds_s) else float("nan")
            ),
            "add_init_mean": float(add_i.mean()) if len(add_i) else None,
            "acc_01d_init": (
                float((norm_i < 0.1).mean()) if len(add_i) else None
            ),
            "per_object": per_object,
        }
        init_note = (
            f" (init control acc@0.1d={results[level]['acc_01d_init']:.3f})"
            if results[level]["acc_01d_init"] is not None else ""
        )
        log_fn(
            f"[{level}] n={results[level]['n']} "
            f"ADD mean={results[level]['add_mean']:.4f} "
            f"med={results[level]['add_med']:.4f} "
            f"acc@0.1d={results[level]['acc_01d']:.3f} "
            f"AUC@0.1d={results[level]['auc_01d']:.3f} "
            f"ADD-S acc@0.1d={results[level]['adds_acc_01d']:.3f}"
            + init_note
        )
    return results


def _sweep_real_frame(cfg, bop_root, models_dir, dataset, scene_id, frame,
                      objs, obj_scale, mesh_cache):
    """Real-BOP branch: refine against dataset images, score vs scene_gt."""
    scene_dir = Path(bop_root) / scene_id
    with open(scene_dir / "scene_gt.json") as f:
        gt_objs = json.load(f)[str(int(frame))]
    # scene_id is 'split/scene', so bop_root is the DATASET root — BOP
    # checkouts keep models at <dataset>/models
    res = refine_bop_frame(
        cfg if cfg is not None else ConfigNode(),
        scene_dir,
        Path(models_dir) if models_dir else Path(bop_root) / "models",
        objs, frame=frame, obj_scale=obj_scale, mesh_cache=mesh_cache,
        gt_objs=gt_objs,
    )
    out = []
    for i_obj, entry in res.items():
        entry = dict(entry)
        entry.update(scene=scene_id, frame=frame, i_obj=int(i_obj))
        out.append(entry)
    return out


def _synth_context(mesh_path, resolution, batchsize, nb_iterations,
                   obj_scale, seed, optimizer="adam", base_lr=0.02,
                   lr_bounds=(0.5, 4.0), loss_weights=(0.7, 0.0, 1.0),
                   init_jitter=(0.0, 0.0), capacity_boost=1.0,
                   roi_crop="auto", probe_dz=0.2):
    """Jitted sweep machinery, built once per configuration.

    loss_weights = (rgb, depth, mask); 0 disables a term (the reference's
    default protocol is mask-only — configs/diffdope.yaml losses block).

    capacity_boost scales the compact bin-table capacity and roi_crop is
    forwarded to make_fused_loss — both are escalated by the overflow /
    crop-leak recovery loop in _sweep_synth_objects (mirroring
    DiffDope.run_optimization).  probe_dz is the closest-approach margin
    the capacity probe assumes (worst-case translation perturbation of
    the hardest sweep level, 0.16 * obj_scale, rounded up).

    Every device function takes the scene-varying values (poses, gt images)
    as TRACED arguments, so one compilation serves the whole sweep — under
    the axon backend each retrace costs ~30s of remote compiles.
    """
    key = (str(mesh_path), tuple(resolution), batchsize, nb_iterations,
           obj_scale, seed, optimizer, base_lr, tuple(lr_bounds),
           tuple(loss_weights), tuple(init_jitter), capacity_boost,
           roi_crop, probe_dz)
    if key in _synth_ctx_cache:
        return _synth_ctx_cache[key]

    import functools

    import jax
    import jax.numpy as jnp

    from diffdope_tpu import geometry as geo
    from diffdope_tpu.losses import select_losses
    from diffdope_tpu.metrics import add_metric, adds_metric, object_diameter
    from diffdope_tpu.optimize import (
        argmin_hypothesis, draw_learning_rates, jitter_pose_params,
        pose_matrix, pose_params, refine,
    )
    from diffdope_tpu.render.pipeline import make_fused_loss, render_batch

    h, w = resolution
    f = 1.2 * max(h, w)
    # HOST (numpy) constants on purpose: jit closure constants that live on
    # device are fetched back to host at lowering — minutes on the tunnel
    # backend (see DiffDope._mesh_arrays / docs/ROADMAP.md)
    proj = np.asarray(
        geo.projection_from_intrinsics(f, f, w / 2, h / 2, w, h, 0.01, 100.0),
        np.float32,
    )
    mesh = load_mesh(mesh_path, scale=obj_scale, vertex_pad=128,
                     triangle_pad=128)
    pos = np.asarray(mesh.pos)
    tri = np.asarray(mesh.pos_idx)
    edge_adj = np.asarray(mesh.edge_adj)
    cc = np.asarray(mesh.corner_colors) if mesh.corner_colors is not None else None
    vc = np.asarray(mesh.vtx_color) if cc is None else None
    color_kw = dict(corner_colors=cc) if cc is not None else dict(vtx_color=vc)

    # auto backface culling: provably output-preserving for closed
    # consistently-wound meshes (real BOP models are watertight), ~2x
    # lighter bins — see DiffDope._resolve_cull / tools/cull_ab.py
    cull = bool(mesh.is_closed and mesh.is_oriented)

    def render_fn(mtx, layout="channels"):
        return render_batch(
            proj, mtx, pos, tri, resolution, edge_adj=edge_adj,
            raster_impl="pallas", layout=layout, cull_backfaces=cull,
            **color_kw,
        )

    w_rgb, w_depth, w_mask = loss_weights
    loss_fns, weights = select_losses(
        {"l1_mask": w_mask > 0, "weight_mask": w_mask,
         "l1_rgb_with_mask": w_rgb > 0, "weight_rgb": w_rgb,
         "l1_depth_with_mask": w_depth > 0, "weight_depth": w_depth})
    # NB under adam the per-hypothesis loss scales are a no-op (adam is
    # invariant to gradient scale); the reference's basin-hopping diversity
    # needs sgd + wide bounds (its defaults: sgd, base_lr=20, [0.01, 100])
    lrs = draw_learning_rates(jax.random.PRNGKey(seed), batchsize, lr_bounds)

    # compact bin table capacity from a probe batch: the chunked per-tile
    # sum varies strongly with ROTATION (tile occupancy redistributes) and
    # grows ~1/z^2 as the object nears the camera, so a single canonical
    # pose under-sizes the table (SWEEP_r05 saw up to 273k dropped
    # (tile, triangle) pairs/step through the old identity-pose probe).
    # Probe 16 random rotations at both the protocol distance and the
    # closest approach the levels can perturb to, and size from the max.
    from diffdope_tpu.render.planar import (
        bin_triangles_planar, corner_planes, packed_planar,
    )
    from diffdope_tpu.render.raster_v2 import _pick_chunk

    t_count = int(tri.shape[0])
    # chunk size must match what the pipeline derives from the capacity
    # (_pick_chunk caps at DD_KCHUNK, so any kc-multiple capacity maps back
    # to the same kc)
    kc_c = _pick_chunk(1024)

    @jax.jit
    def _tot_probe(qs, ts):
        def one(q, t):
            mtx, _, _ = pose_matrix(pose_params(q, t, 1))
            mvp = jnp.einsum("ij,bjk->bik", proj, mtx, precision="highest")
            cp = corner_planes(pos[tri.reshape(-1)][None][0], mvp)
            _, det = packed_planar(cp, None, None, None)
            _, counts, _ = bin_triangles_planar(
                cp, det, resolution, (32, 128), t_count
            )
            return jnp.sum(-(-counts // kc_c) * kc_c)

        return jnp.max(jax.vmap(one)(qs, ts))

    import numpy as _np

    prng = _np.random.default_rng(0)
    qs = prng.normal(size=(16, 4)).astype(_np.float32)
    qs /= _np.linalg.norm(qs, axis=1, keepdims=True)
    qs[0] = (0.0, 0.0, 0.0, 1.0)
    zs = _np.full((16,), -2.0, _np.float32)
    zs[8:] = -2.0 + probe_dz  # closest approach across the sweep levels
    ts = _np.zeros((16, 3), _np.float32)
    ts[:, 2] = zs
    tot0 = int(_tot_probe(jnp.asarray(qs), jnp.asarray(ts)))
    compact_total = -(
        -int(tot0 * 1.3 * capacity_boost + kc_c) // kc_c
    ) * kc_c
    if jax.default_backend() not in ("tpu", "axon"):
        # interpret-mode pallas copies the whole resident table per tile
        # instance; the compact layout only pays on real hardware
        compact_total = None

    # the per-tile slot cap is the OTHER overflow source (planar.
    # bin_triangles_planar drops pairs past max_tris_per_tile before the
    # compact table even sees them) — and on CPU, where compact is
    # disabled, it is the ONLY one the boost can reach.  Scale it with the
    # boost, chunk-aligned so _pick_chunk keeps dividing it.
    max_tris_per_tile = -(-int(1024 * capacity_boost) // kc_c) * kc_c

    # gt deferred (None): fn(mtx, gt) — one trace serves every object
    fused = make_fused_loss(
        proj, pos, tri, resolution, None, lrs, weights,
        use_rgb=w_rgb > 0, use_depth=w_depth > 0, use_mask=w_mask > 0,
        edge_adj=edge_adj, compact_total=compact_total, cull_backfaces=cull,
        roi_crop=roi_crop, max_tris_per_tile=max_tris_per_tile, **color_kw,
    )

    @jax.jit
    def gt_render(q, t):
        mtx, _, _ = pose_matrix(pose_params(q, t, 1))
        r = render_fn(mtx, layout="stacked")
        return {"rgb": r["rgb"][0], "segmentation": r["mask"][0],
                "depth": r["depth"][0]}, mtx[0]

    jit_refine = jax.jit(
        functools.partial(
            refine, render_fn=render_fn, loss_fns=tuple(loss_fns),
            weights=weights, nb_iterations=nb_iterations, base_lr=base_lr,
            lr_decay=0.1, optimizer=optimizer, fused_loss_fn=fused,
        ),
        static_argnames=("num_steps",),
    )

    from diffdope_tpu.metrics import subsample_points

    pts = subsample_points(np.asarray(mesh.pos[: mesh.num_vertices]))
    pts_j = pts  # host constant (device constants stall lowering — above)

    @jax.jit
    def score(mtx_est, mtx_gt):
        return (
            add_metric(pts_j, mtx_est[:3, :3], mtx_est[:3, 3],
                       mtx_gt[:3, :3], mtx_gt[:3, 3]),
            adds_metric(pts_j[:500], mtx_est[:3, :3], mtx_est[:3, 3],
                        mtx_gt[:3, :3], mtx_gt[:3, 3]),
        )

    @jax.jit
    def init_mtx(q, t):
        mtx, _, _ = pose_matrix(pose_params(q, t, 1))
        return mtx[0]

    jd, jt = init_jitter
    jitter = (
        jax.jit(lambda p, k: jitter_pose_params(p, k, jd, jt))
        if (jd > 0 or jt > 0) else None
    )
    from diffdope_tpu.optimize import argmin_step_hypothesis

    ctx = dict(
        gt_render=gt_render, jit_refine=jit_refine, score=score, lrs=lrs,
        argmin=argmin_hypothesis, argmin_sb=argmin_step_hypothesis,
        init_mtx=init_mtx, pose_params=pose_params,
        diameter=object_diameter(pts), geo=geo, jitter=jitter,
        weights=weights,
    )
    _synth_ctx_cache[key] = ctx
    return ctx


def _sweep_synth_objects(objs, level, scene_id, frame, mesh_path, obj_scale,
                         resolution, batchsize, nb_iterations, seed, log_fn,
                         optimizer="adam", base_lr=0.02,
                         lr_bounds=(0.5, 4.0), loss_weights=(0.7, 0.0, 1.0),
                         init_jitter=(0.0, 0.0), restarts=0,
                         restart_jitter=(10.0, 0.02),
                         argmin_rule="best_step"):
    """Synthesized branch: JSON pose = gt, init = gt + level perturbation.

    init_jitter=(deg, trans) spreads the hypothesis batch around the
    perturbed init (optimize.jitter_pose_params); restarts > 0 re-seeds
    all hypotheses at the running argmin between equal segments
    (optimize.refine_with_restarts).  Defaults preserve the reference
    protocol exactly (all hypotheses identical, one continuous run),
    except pose selection: argmin_rule='best_step' (default) picks the
    best (step, hypothesis) over the whole loss history — last-step
    selection returns diverged poses on up to 46% of EASY (1 degree)
    inits when the trajectory overshoots late (docs/SWEEP_r04.md);
    'last_step' restores the reference rule.  Every entry also records
    the zero-iteration init score (add_init/adds_init) as the control."""
    import zlib

    import jax
    import jax.numpy as jnp

    # Overflow / crop-leak recovery state, persisted per configuration so
    # later objects at an escalated level skip the degraded first attempt
    # (each escalation retraces: ~30s on the tunnel backend)
    esc_key = (str(mesh_path), tuple(resolution), batchsize, nb_iterations,
               obj_scale, seed, optimizer, base_lr, tuple(lr_bounds),
               tuple(loss_weights), tuple(init_jitter))
    esc = _synth_escalation.setdefault(
        esc_key, {"boost": 1.0, "roi_crop": "auto"}
    )

    def _ctx():
        return _synth_context(
            mesh_path, resolution, batchsize, nb_iterations, obj_scale,
            seed, optimizer, base_lr, lr_bounds, loss_weights, init_jitter,
            capacity_boost=esc["boost"], roi_crop=esc["roi_crop"],
        )

    ctx = _ctx()
    geo = ctx["geo"]
    deg, trans_mag = parse_level(level)
    rng = np.random.default_rng(
        seed + zlib.crc32(f"{level}/{scene_id}/{frame}".encode())
    )
    out = []
    for i_obj, obj in enumerate(objs):
        # gt pose: the JSON rotation (CV -> GL), normalized to a fixed
        # camera distance so the stand-in mesh is fully in frame at every
        # dataset's scale
        r_cv = np.asarray(obj["cam_R_m2c"], float).reshape(3, 3)
        _, q_gl = geo.opencv_to_opengl(np.zeros(3), r_cv)
        q_gt = np.asarray(q_gl, np.float32)
        t_gt = np.array([0.0, 0.0, -2.0], np.float32)
        gt, mtx_gt = ctx["gt_render"](jnp.asarray(q_gt), jnp.asarray(t_gt))

        # init: gt perturbed by the level's magnitudes; the level value
        # scales by obj_scale into working units (parse_level docstring) —
        # the same scaling applied to cam_t_m2c
        dq = geo.quat_from_axis_angle(rng.normal(size=3), np.deg2rad(deg))
        q0 = np.asarray(geo.quat_multiply(jnp.asarray(dq), jnp.asarray(q_gt)),
                        np.float32)
        dt = rng.normal(size=3)
        dt = dt / np.linalg.norm(dt) * trans_mag * obj_scale
        t0 = (t_gt + dt).astype(np.float32)

        p0 = ctx["pose_params"](q0, t0, batchsize)
        if ctx["jitter"] is not None:
            p0 = ctx["jitter"](
                p0, jax.random.PRNGKey(int(rng.integers(2 ** 31)))
            )
        restart_key = jax.random.PRNGKey(int(rng.integers(2 ** 31)))

        def _run(ctx):
            if restarts > 0:
                from diffdope_tpu.optimize import refine_with_restarts

                return refine_with_restarts(
                    p0, None, (), gt, ctx["lrs"], ctx["weights"],
                    nb_iterations=nb_iterations, restarts=restarts,
                    restart_jitter_deg=restart_jitter[0],
                    restart_jitter_trans=restart_jitter[1],
                    key=restart_key,
                    jit_refine=ctx["jit_refine"],
                )
            return ctx["jit_refine"](p0, gt=gt, learning_rates=ctx["lrs"])

        # Bin-overflow / crop-leak auto-recovery (the sweep-path analogue of
        # DiffDope.run_optimization's loop, diffdope.py): a degraded run is
        # discarded and re-run from the SAME init with a grown bin table /
        # full-frame loss.  Escalation persists in `esc` for later objects.
        for attempt in range(3):
            result = _run(ctx)
            telem = result.telemetry or {}
            overflow = int(
                np.asarray(telem.get("_bin_overflow", 0)).max(initial=0)
            )
            leak = int(
                np.asarray(telem.get("_crop_leak", 0)).max(initial=0)
            )
            if (overflow == 0 and leak == 0) or attempt == 2:
                break
            if overflow > 0:
                # overflow counts DROPPED (tile, triangle) pairs — growing
                # the per-tile cap by at least that many slots guarantees
                # the identical re-run fits (same init, same key), so size
                # the boost from the measurement instead of guessing
                esc["boost"] *= max(1.5, 1.0 + overflow / (1024 * esc["boost"]))
                log_fn(f"  recovery {level} {scene_id}/{frame}#{i_obj}: "
                       f"bin overflow up to {overflow}/step — capacity "
                       f"x{esc['boost']:.2f}, re-running")
            if leak > 0:
                esc["roi_crop"] = "off"
                log_fn(f"  recovery {level} {scene_id}/{frame}#{i_obj}: "
                       f"ROI crop leak up to {leak}/step — full-frame, "
                       f"re-running")
            ctx = _ctx()
        s_best, b_best = ctx["argmin_sb"](
            {k: jnp.asarray(v) for k, v in result.losses_values.items()},
            argmin_rule,
        )
        s_best, b_best = int(s_best), int(b_best)
        add, adds = ctx["score"](result.mtx_history[s_best][b_best], mtx_gt)
        add_i, adds_i = ctx["score"](
            ctx["init_mtx"](jnp.asarray(q0), jnp.asarray(t0)), mtx_gt
        )
        entry = {
            "scene": scene_id, "frame": frame, "i_obj": i_obj,
            "obj_id": int(obj.get("obj_id", -1)),
            "add": float(add), "adds": float(adds),
            "add_init": float(add_i), "adds_init": float(adds_i),
            "best_step": s_best, "best_hyp": b_best,
            "diameter": ctx["diameter"],
            "final_loss": float(np.asarray(result.total_loss)[-1]),
        }
        # scan telemetry (bin overflow / ROI crop leak): record the worst
        # per-step counts so degraded cells are visible in the sweep JSON
        # instead of silently lowering accuracy
        telem = result.telemetry or {}
        for tk in ("_bin_overflow", "_crop_leak"):
            if tk in telem:
                worst = int(np.asarray(telem[tk]).max(initial=0))
                if worst > 0:
                    entry[tk.lstrip("_") + "_max"] = worst
                    log_fn(f"  WARNING {level} {scene_id}/{frame}#{i_obj}: "
                           f"{tk} up to {worst}/step — renders degraded")
        out.append(entry)
        log_fn(f"  {level} {scene_id}/{frame}#{i_obj}: add={entry['add']:.4f} "
               f"adds={entry['adds']:.4f} d={entry['diameter']:.3f} "
               f"(init add={entry['add_init']:.4f}, "
               f"best step {s_best}/hyp {b_best})")
    return out


_synth_ctx_cache: Dict[tuple, dict] = {}
# per-configuration recovery escalation (capacity boost / roi_crop) so a
# level that overflowed once doesn't re-run degraded for every later object
_synth_escalation: Dict[tuple, dict] = {}


def load_bop_camera(scene_dir: Path, frame: str, image_hw, resize: float = 1.0) -> Optional[Camera]:
    """Camera from scene_camera.json (cam_K), or None when absent."""
    cam_json = Path(scene_dir) / "scene_camera.json"
    if not cam_json.exists():
        return None
    with open(cam_json) as f:
        k = np.asarray(json.load(f)[str(int(frame))]["cam_K"], float).reshape(3, 3)
    h, w = image_hw
    return Camera(
        fx=k[0, 0], fy=k[1, 1], cx=k[0, 2], cy=k[1, 2],
        im_width=int(w / resize) if resize else w, im_height=int(h / resize) if resize else h,
    )


def refine_bop_frame(
    cfg: ConfigNode,
    scene_dir,
    models_dir,
    frame_objs,
    frame: str = "0",
    obj_scale: float = 0.01,
    camera: Optional[Camera] = None,
    mesh_cache: Optional[Dict[int, Mesh]] = None,
    gt_objs=None,
) -> Dict[str, dict]:
    """Refine every object of one frame.

    Args:
        cfg: full config (hyperparameters/losses/tpu groups).
        scene_dir: BOP scene directory (rgb/, depth/, mask_visib/).
        models_dir: directory with obj_XXXXXX.ply meshes.
        frame_objs: list of {'cam_R_m2c': 9 floats, 'cam_t_m2c': 3 floats,
            'obj_id': int} initial (perturbed) poses.
        frame: frame id string.
        obj_scale: mesh/translation scale (BOP mm -> working units).
        camera: override camera; defaults to scene_camera.json, then
            cfg.camera.
        mesh_cache: optional dict reused across frames.
        gt_objs: optional same-format list of ground-truth poses; when given,
            ADD and ADD-S are computed per object.

    Returns:
        {object_index: {'obj_id', 'cam_R_m2c', 'cam_t_m2c', 'argmin',
                        'final_loss' [, 'add', 'adds', 'diameter']}}
    """
    scene_dir = Path(scene_dir)
    models_dir = Path(models_dir)
    mesh_cache = mesh_cache if mesh_cache is not None else {}
    resize = float(
        cfg.get("scene", ConfigNode()).get("image_resize", 1.0) or 1.0
    )
    fr = str(int(frame)).zfill(6)

    # BOP depth PNGs are png * depth_scale millimetres (scene_camera.json);
    # working units are mm * obj_scale, so the Image divisor is
    # 1 / (depth_scale * obj_scale).  (The reference loads BOP depth with
    # its generic /100 default — only correct for depth_scale=1, cm units.)
    cam_ds = 1.0
    cam_json = scene_dir / "scene_camera.json"
    if cam_json.exists():
        with open(cam_json) as f:
            cam_ds = float(
                json.load(f)[str(int(frame))].get("depth_scale", 1.0)
            )
    depth_path = scene_dir / "depth" / f"{fr}.png"
    scene = Scene(
        path_img=str(scene_dir / "rgb" / f"{fr}.png"),
        # placeholder only (mirrors reference run_bop_scene.py:42); the real
        # per-object mask is REQUIRED and swapped in below — a missing mask
        # raises instead of silently fitting the photo as the segmentation
        path_segmentation=str(scene_dir / "rgb" / f"{fr}.png"),
        image_resize=resize,
    )
    if depth_path.exists():
        scene.tensor_depth = Image(
            img_path=str(depth_path), img_resize=resize, depth=True,
            depth_scale=1.0 / (cam_ds * obj_scale),
        )
    if camera is None:
        camera = load_bop_camera(scene_dir, frame, scene.get_resolution(), resize)
    if camera is None:
        camera = Camera(**cfg.camera)
    if resize and resize < 1.0:
        camera.resize(resize)

    results: Dict[str, dict] = {}
    ddope: Optional[DiffDope] = None

    for i_obj, obj in enumerate(frame_objs):
        obj_id = int(obj["obj_id"])
        if obj_id not in mesh_cache:
            mesh_cache[obj_id] = load_mesh(
                models_dir / f"obj_{str(obj_id).zfill(6)}.ply", scale=obj_scale
            )
        mesh = mesh_cache[obj_id]

        pose = Object3D(
            position=obj["cam_t_m2c"],
            rotation=obj["cam_R_m2c"],
            scale=obj_scale,
            batchsize=int(
                cfg.get("hyperparameters", ConfigNode()).get("batchsize", 16)
            ),
            mesh=mesh,
        )
        # mask index = enumeration order, matching the reference
        # (run_bop_scene.py:75) and the error-JSON extraction order
        # (data/copy_data_here.py); the reference crashes on a missing file,
        # so a hard error here preserves that contract
        mask_path = scene_dir / "mask_visib" / f"{fr}_{str(i_obj).zfill(6)}.png"
        if not mask_path.exists():
            raise FileNotFoundError(
                f"per-object visible mask missing: {mask_path} — refusing to "
                "refine against the RGB placeholder segmentation"
            )
        scene.tensor_segmentation = Image(
            img_path=str(mask_path), img_resize=resize
        )

        if ddope is None:
            ddope = DiffDope(cfg=cfg, camera=camera, object3d=pose, scene=scene)
        else:
            ddope.set_object3d(pose)
            ddope.set_scene(scene)

        ddope.run_optimization()
        pose_cv = ddope.get_pose_opencv()
        entry = {
            "obj_id": obj_id,
            "cam_R_m2c": pose_cv[:3, :3].reshape(-1).tolist(),
            "cam_t_m2c": (pose_cv[:3, 3] / obj_scale).tolist(),
            "argmin": int(ddope.get_argmin()),
            "final_loss": float(ddope.last_run_stats["final_loss"]),
        }

        if gt_objs is not None:
            import jax.numpy as jnp

            gt = gt_objs[i_obj]
            from diffdope_tpu.metrics import subsample_points

            pts = subsample_points(mesh.pos[: mesh.num_vertices])
            r_gt = np.asarray(gt["cam_R_m2c"], float).reshape(3, 3)
            t_gt = np.asarray(gt["cam_t_m2c"], float) * obj_scale
            r_est = pose_cv[:3, :3]
            t_est = pose_cv[:3, 3]
            entry["add"] = float(add_metric(
                jnp.asarray(pts), jnp.asarray(r_est, jnp.float32),
                jnp.asarray(t_est, jnp.float32), jnp.asarray(r_gt, jnp.float32),
                jnp.asarray(t_gt, jnp.float32),
            ))
            entry["adds"] = float(adds_metric(
                jnp.asarray(pts[:500]), jnp.asarray(r_est, jnp.float32),
                jnp.asarray(t_est, jnp.float32), jnp.asarray(r_gt, jnp.float32),
                jnp.asarray(t_gt, jnp.float32),
            ))
            entry["diameter"] = object_diameter(pts)
        results[str(i_obj)] = entry
        log.info("object %d: %s", i_obj, {k: entry[k] for k in ("obj_id", "argmin", "final_loss")})

    return results
