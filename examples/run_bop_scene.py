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
from diffdope_tpu.bop import refine_bop_frame  # noqa: E402
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

    gt_objs = None
    gt_json = Path(bop.get("gt_json", ""))
    if gt_json.exists():
        with open(gt_json) as f:
            gt_objs = json.load(f)[frame]

    results = refine_bop_frame(
        cfg, scene_dir, models_dir, frame_objs, frame=frame,
        obj_scale=obj_scale, gt_objs=gt_objs,
    )

    with open(out_dir / "refined_poses.json", "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_dir / 'refined_poses.json'}")
    for k, v in results.items():
        line = f"object {k} (obj_id {v['obj_id']}): loss {v['final_loss']:.5f}"
        if "add" in v:
            line += f", ADD {v['add']:.4f} ({100*v['add']/v['diameter']:.1f}% of diameter)"
        print(line)


if __name__ == "__main__":
    main()
