#!/usr/bin/env python3
"""Calibrate the OpenCV->OpenGL rotation convention against a real scene.

The reference's `opencv_2_opengl` (reference diffdope/diffdope.py:92-140)
composes a Y/Z axis flip with four pyrr quaternion rotations whose net
effect depends on pyrr's matrix/angle conventions.  The four candidate
readings differ only in orientation, so projected bounding boxes cannot
discriminate them — rendered silhouette IoU against the scene's ground-truth
segmentation can.  Result on the bundled example scene: F·R·F (the
conjugation) wins decisively (IoU 0.785 vs <=0.1 for the others), which is
what geometry.opencv_to_opengl(conjugate_flip=True) implements.

Usage (CPU is fine):
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/calibrate_convention.py \
        [config.yaml] [scale=0.25]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import diffdope_tpu as dd
from diffdope_tpu.image import Scene
from diffdope_tpu.mesh import load_mesh
from diffdope_tpu.render.pipeline import render_batch


def main():
    args = [a for a in sys.argv[1:] if "=" not in a]
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    cfg = dd.load_config(args[0] if args else None)
    scale = float(kv.get("scale", 0.25))

    mesh = load_mesh(cfg.object3d.model_path, scale=cfg.object3d.scale)
    scene = Scene(
        path_img=cfg.scene.path_img,
        path_segmentation=cfg.scene.path_segmentation,
        image_resize=scale,
    )
    arrays = scene.gt_arrays()
    seg = arrays["segmentation"]
    photo = arrays["rgb"]
    h, w = seg.shape[:2]
    gt = seg[..., 0] > 0.5

    cam = dict(cfg.camera)
    for k in ("fx", "fy", "cx", "cy"):
        cam[k] *= scale
    cam["im_width"], cam["im_height"] = w, h
    proj = jnp.asarray(dd.projection_from_intrinsics(**cam), jnp.float32)

    r_cv = np.asarray(cfg.object3d.rotation, float).reshape(3, 3)
    f = np.diag([1.0, -1.0, -1.0])
    p_gl = jnp.asarray(
        f @ (np.asarray(cfg.object3d.position) * cfg.object3d.scale), jnp.float32
    )

    candidates = {
        "F@R@F (conjugate_flip=True)": f @ r_cv @ f,
        "F@R": f @ r_cv,
        "F@R.T@F": f @ r_cv.T @ f,
        "F@R.T": f @ r_cv.T,
    }
    render = jax.jit(
        lambda m: render_batch(
            proj, m, jnp.asarray(mesh.pos), jnp.asarray(mesh.pos_idx), (h, w),
            corner_colors=jnp.asarray(mesh.corner_colors)
            if mesh.corner_colors is not None else None,
            vtx_color=jnp.asarray(mesh.vtx_color)
            if mesh.corner_colors is None else None,
            raster_impl="reference",
        )
    )
    for name, r_gl in candidates.items():
        q = jnp.asarray(dd.quat_from_matrix33(r_gl), jnp.float32)
        mtx = dd.matrix44_from_quat_trans(q[None], p_gl[None])
        out = render(mtx)
        mask = np.asarray(out["mask"][0, ..., 0]) > 0.5
        iou = (mask & gt).sum() / max((mask | gt).sum(), 1)
        # silhouette alone cannot discriminate orientations of rotationally
        # symmetric objects (the example can!) — compare the texture too
        both = mask & gt
        rgb = np.asarray(out["rgb"][0])
        l1 = np.abs(rgb - photo)[both].mean() if both.any() else np.inf
        print(f"{name:30s} IoU {iou:.3f}   masked rgb L1 {l1:.4f}")


if __name__ == "__main__":
    main()
