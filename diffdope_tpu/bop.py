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
    resize = float(cfg.scene.get("image_resize", 1.0) or 1.0)
    fr = str(int(frame)).zfill(6)

    scene = Scene(
        path_img=str(scene_dir / "rgb" / f"{fr}.png"),
        path_depth=str(scene_dir / "depth" / f"{fr}.png")
        if (scene_dir / "depth" / f"{fr}.png").exists() else None,
        # placeholder only (mirrors reference run_bop_scene.py:42); the real
        # per-object mask is REQUIRED and swapped in below — a missing mask
        # raises instead of silently fitting the photo as the segmentation
        path_segmentation=str(scene_dir / "rgb" / f"{fr}.png"),
        image_resize=resize,
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
            batchsize=int(cfg.hyperparameters.batchsize),
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
            ddope.object3d = pose
            ddope.scene = scene
            ddope._render_jit = None
            ddope._refine_jit = None

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
            pts = mesh.pos[: mesh.num_vertices]
            if len(pts) > 1000:
                pts = pts[:: len(pts) // 1000]
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
