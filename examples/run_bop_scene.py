"""Refine every object in a BOP scene frame from perturbed-pose JSONs.

TPU-native port of the reference BOP sweep (reference examples/
run_bop_scene.py): loads the per-frame perturbed poses
({frame: [{cam_R_m2c(9), cam_t_m2c(3), obj_id}]}), refines each object
against the frame's rgb/depth/mask images, and reports the refined poses in
the OpenCV/BOP frame for ADD(-S) evaluation.

Paths come from the config/CLI instead of hard-coded developer paths:

    python examples/run_bop_scene.py \
        bop.scene_dir=/data/hope/val/000001 \
        bop.models_dir=/data/hope/models \
        bop.error_json=/root/reference/data/hope/val/000001/scene_error_deg_040_trans_016.json \
        bop.frame=0

Multi-host sweeps are embarrassingly parallel: run one process per host
with different `bop.scene_dir` values (no cross-scene communication, see
parallel.py).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import cv2  # noqa: E402
import numpy as np  # noqa: E402

import diffdope_tpu as dd  # noqa: E402
from diffdope_tpu.config import cli_overrides  # noqa: E402


def main():
    cfg = dd.load_config(overrides=cli_overrides(sys.argv[1:]))
    bop = cfg.get("bop", dd.ConfigNode())
    scene_dir = Path(bop.get("scene_dir", ""))
    models_dir = Path(bop.get("models_dir", ""))
    error_json = Path(bop.get("error_json", ""))
    frame = str(bop.get("frame", "0"))
    out_dir = Path(bop.get("out_dir", "."))
    obj_scale = float(bop.get("scale", 0.01))

    if not error_json.exists():
        sys.exit(f"bop.error_json not found: {error_json}")
    if not scene_dir.exists():
        sys.exit(f"bop.scene_dir not found: {scene_dir}")

    with open(error_json) as f:
        data_scene = json.load(f)
    frame_objs = data_scene[frame]

    # one scene's images, shared by all its objects
    scene = dd.Scene(
        path_img=str(scene_dir / "rgb" / f"{frame.zfill(6)}.png"),
        path_depth=str(scene_dir / "depth" / f"{frame.zfill(6)}.png"),
        path_segmentation=str(scene_dir / "rgb" / f"{frame.zfill(6)}.png"),
        image_resize=cfg.scene.image_resize,
    )

    # camera intrinsics: from scene_camera.json when present, else config
    cam_json = scene_dir / "scene_camera.json"
    if cam_json.exists():
        with open(cam_json) as f:
            k = np.asarray(json.load(f)[frame]["cam_K"], float).reshape(3, 3)
        h, w = cv2.imread(str(scene_dir / "rgb" / f"{frame.zfill(6)}.png")).shape[:2]
        camera = dd.Camera(
            fx=k[0, 0], fy=k[1, 1], cx=k[0, 2], cy=k[1, 2], im_width=w, im_height=h
        )
    else:
        camera = dd.Camera(**cfg.camera)

    loaded_models = {}
    results = {}
    ddope = None

    for i_obj, obj in enumerate(frame_objs):
        obj_id = obj["obj_id"]
        if obj_id not in loaded_models:
            loaded_models[obj_id] = dd.load_mesh(
                models_dir / f"obj_{str(obj_id).zfill(6)}.ply", scale=obj_scale
            )

        pose = dd.Object3D(
            position=obj["cam_t_m2c"],
            rotation=obj["cam_R_m2c"],
            scale=obj_scale,
            batchsize=cfg.hyperparameters.batchsize,
            mesh=loaded_models[obj_id],
        )

        mask_path = scene_dir / "mask_visib" / f"{frame.zfill(6)}_{str(i_obj).zfill(6)}.png"
        scene.tensor_segmentation = dd.Image(
            img_path=str(mask_path), img_resize=cfg.scene.image_resize
        )

        if ddope is None:
            ddope = dd.DiffDope(cfg=cfg, camera=camera, object3d=pose, scene=scene)
        else:
            # swap object/scene in place (reference run_bop_scene.py:82-83);
            # re-jit happens automatically on shape change
            ddope.object3d = pose
            ddope.scene = scene
            ddope._render_jit = None
            ddope._refine_jit = None

        ddope.run_optimization()

        pose_cv = ddope.get_pose_opencv()
        results[str(i_obj)] = {
            "obj_id": obj_id,
            "cam_R_m2c": (pose_cv[:3, :3]).reshape(-1).tolist(),
            "cam_t_m2c": (pose_cv[:3, 3] / obj_scale).tolist(),
            "argmin": int(ddope.get_argmin()),
            "final_loss": ddope.last_run_stats["final_loss"],
        }
        print(f"object {i_obj} (obj_id {obj_id}): argmin={ddope.get_argmin()}, "
              f"{ddope.last_run_stats}")

        img = ddope.render_img()
        cv2.imwrite(str(out_dir / f"{str(i_obj).zfill(2)}.png"), img)

    with open(out_dir / "refined_poses.json", "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_dir / 'refined_poses.json'}")


if __name__ == "__main__":
    main()
