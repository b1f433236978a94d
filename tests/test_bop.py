"""End-to-end BOP sweep on a synthesized mini-dataset.

Builds a BOP-format scene on disk (rgb/depth/mask_visib pngs, a PLY model
with vertex colors, scene_camera.json), perturbs the ground-truth pose, and
checks that refine_bop_frame reduces the ADD error — the full
run_bop_scene.py flow (reference examples/run_bop_scene.py) minus the CLI.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import diffdope_tpu as dd
from diffdope_tpu import geometry as geo
from diffdope_tpu.bop import refine_bop_frame
from diffdope_tpu.mesh import save_ply
from diffdope_tpu.metrics import add_metric
from diffdope_tpu.render.pipeline import render_batch
from diffdope_tpu.testing import icosphere

RES = (64, 64)
F = 70.0


def _make_dataset(tmp_path, scene_rel="scene/000001", models_rel="models"):
    """Synth scene: a vertex-colored sphere at a known OpenCV pose."""
    import cv2

    h, w = RES
    verts, faces = icosphere(1)
    colors = (verts * 0.5 + 0.5).astype(np.float32)
    models = tmp_path / models_rel
    models.mkdir(parents=True)
    # BOP meshes are in mm (loaded with scale=0.01)
    save_ply(models / "obj_000001.ply", verts * 0.4 * 100.0, faces, colors=colors)

    # gt pose in the OpenCV frame (object in front: +z), mm translation
    r_gt = np.asarray(geo.matrix33_from_quat(
        jnp.asarray(geo.quat_from_axis_angle(np.array([0.2, 1, 0.1]), 0.6))
    ))
    t_gt_cv = np.array([0.05, -0.03, 2.5])  # working units

    # render gt with the same machinery (cv->gl conversion included)
    p_gl, q_gl = geo.opencv_to_opengl(t_gt_cv, r_gt)
    from diffdope_tpu.optimize import pose_matrix, pose_params

    mtx, _, _ = pose_matrix(pose_params(q_gl, p_gl, 1))
    proj = jnp.asarray(
        geo.projection_from_intrinsics(F, F, w / 2, h / 2, w, h, 0.01, 100.0),
        jnp.float32,
    )
    out = jax.jit(
        lambda m: render_batch(
            proj, m, jnp.asarray(verts * 0.4), jnp.asarray(faces), RES,
            vtx_color=jnp.asarray(colors), raster_impl="reference",
        )
    )(mtx)

    scene_dir = tmp_path / scene_rel
    for sub in ("rgb", "depth", "mask_visib"):
        (scene_dir / sub).mkdir(parents=True)
    rgb = (np.asarray(out["rgb"][0])[::-1] * 255).clip(0, 255).astype(np.uint8)
    cv2.imwrite(str(scene_dir / "rgb" / "000000.png"), rgb[..., ::-1])
    depth = np.asarray(out["depth"][0])[::-1]
    cv2.imwrite(
        str(scene_dir / "depth" / "000000.png"),
        (depth * 100.0).clip(0, 65535).astype(np.uint16),
    )
    mask = (np.asarray(out["mask"][0, ..., 0])[::-1] > 0.5).astype(np.uint8) * 255
    cv2.imwrite(str(scene_dir / "mask_visib" / "000000_000000.png"), mask)
    with open(scene_dir / "scene_camera.json", "w") as f:
        json.dump({"0": {"cam_K": [F, 0, w / 2, 0, F, h / 2, 0, 0, 1]}}, f)

    gt_obj = {
        "obj_id": 1,
        "cam_R_m2c": r_gt.reshape(-1).tolist(),
        "cam_t_m2c": (t_gt_cv / 0.01).tolist(),  # back to mm
    }
    return scene_dir, models, gt_obj, verts * 0.4


def test_refine_bop_frame(tmp_path):
    scene_dir, models, gt_obj, pts = _make_dataset(tmp_path)

    # perturbed initial pose
    r_gt = np.asarray(gt_obj["cam_R_m2c"], float).reshape(3, 3)
    dq = geo.quat_from_axis_angle(np.array([1.0, 0.2, 0.1]), np.deg2rad(10))
    r0 = np.asarray(geo.matrix33_from_quat(jnp.asarray(dq))) @ r_gt
    t0_mm = np.asarray(gt_obj["cam_t_m2c"], float) + np.array([12.0, -9.0, 20.0])
    init_obj = {
        "obj_id": 1,
        "cam_R_m2c": r0.reshape(-1).tolist(),
        "cam_t_m2c": t0_mm.tolist(),
    }

    cfg = dd.ConfigNode(
        {
            "scene": {"image_resize": 1.0},
            "losses": {
                "l1_mask": True, "weight_mask": 1.0,
                "l1_rgb_with_mask": True, "weight_rgb": 1.0,
            },
            "hyperparameters": {
                "batchsize": 2, "nb_iterations": 40, "base_lr": 0.15,
                "lr_decay": 0.3, "learning_rates_bound": [0.8, 1.5],
            },
            "tpu": {"seed": 0, "optimizer": "adam", "raster_impl": "reference"},
        }
    )

    results = refine_bop_frame(
        cfg, scene_dir, models, [init_obj], frame="0",
        obj_scale=0.01, gt_objs=[gt_obj],
    )
    entry = results["0"]
    assert entry["obj_id"] == 1
    assert np.isfinite(entry["final_loss"])

    # ADD must improve substantially vs the initial perturbed pose
    t_gt = np.asarray(gt_obj["cam_t_m2c"], float) * 0.01
    add_init = float(
        add_metric(
            jnp.asarray(pts.astype(np.float32)),
            jnp.asarray(r0, jnp.float32), jnp.asarray(t0_mm * 0.01, jnp.float32),
            jnp.asarray(r_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32),
        )
    )
    assert entry["add"] < add_init * 0.5, (add_init, entry["add"])
    # within 15% of the object's diameter counts as a good refinement here
    assert entry["add"] < 0.15 * entry["diameter"], (entry["add"], entry["diameter"])


def _perturbed_init(gt_obj, seed=0):
    r_gt = np.asarray(gt_obj["cam_R_m2c"], float).reshape(3, 3)
    dq = geo.quat_from_axis_angle(np.array([1.0, 0.2, 0.1]), np.deg2rad(8))
    r0 = np.asarray(geo.matrix33_from_quat(jnp.asarray(dq))) @ r_gt
    t0_mm = np.asarray(gt_obj["cam_t_m2c"], float) + np.array([10.0, -8.0, 15.0])
    return {
        "obj_id": 1,
        "cam_R_m2c": r0.reshape(-1).tolist(),
        "cam_t_m2c": t0_mm.tolist(),
    }


def test_sweep_real_mode(tmp_path):
    """sweep_perturbation_levels(bop_root=...) end to end: walks the
    perturbation error JSONs (init poses), loads the real scene images and
    scene_gt.json, refines and scores — the reference run_bop_scene.py flow
    (run_bop_scene.py:13-93) at dataset-sweep level."""
    from diffdope_tpu import bop

    scene_dir, models, gt_obj, pts = _make_dataset(
        tmp_path, scene_rel="bop/val/000001", models_rel="bop/models"
    )
    bop_root = tmp_path / "bop"
    with open(scene_dir / "scene_gt.json", "w") as f:
        json.dump({"0": [gt_obj]}, f)

    init_obj = _perturbed_init(gt_obj)
    err_dir = tmp_path / "data" / "hope" / "val" / "000001"
    err_dir.mkdir(parents=True)
    with open(err_dir / "scene_error_deg_001_trans_001.json", "w") as f:
        json.dump({"0": [init_obj]}, f)

    cfg = dd.ConfigNode(
        {
            "scene": {"image_resize": 1.0},
            "losses": {
                "l1_mask": True, "weight_mask": 1.0,
                "l1_rgb_with_mask": True, "weight_rgb": 1.0,
            },
            "hyperparameters": {
                "batchsize": 2, "nb_iterations": 30, "base_lr": 0.15,
                "lr_decay": 0.3, "learning_rates_bound": [0.8, 1.5],
            },
            "tpu": {"seed": 0, "optimizer": "adam", "raster_impl": "reference"},
        }
    )
    results = bop.sweep_perturbation_levels(
        data_root=str(tmp_path / "data"), dataset="hope",
        levels=["deg_001_trans_001"], max_scenes=1, max_frames=1,
        max_objects=1, bop_root=str(bop_root), cfg=cfg, obj_scale=0.01,
        log_fn=lambda *a: None,
    )
    r = results["deg_001_trans_001"]
    assert r["mode"] == "real"
    assert r["n"] == 1
    entry = r["per_object"][0]
    assert entry["scene"] == "val/000001" and entry["obj_id"] == 1
    assert np.isfinite(entry["add"]) and np.isfinite(r["auc_01d"])
    # refined well below the initial ~2cm/8deg perturbation
    assert entry["add"] < 0.2 * entry["diameter"], (entry["add"], entry["diameter"])
