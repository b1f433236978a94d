"""Object3D: the optimized pose variable + its mesh.

Reference: diffdope/diffdope.py:938-1098.  Holds an initial pose (converted
OpenCV->OpenGL at load unless disabled), the mesh, and the hypothesis batch
size.  The actual optimized state lives in a functional parameter pytree
(optimize.pose_params) built fresh for each `run_optimization` — `reset_pose`
is therefore implicit, and `forward()` exists for API familiarity.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from diffdope_tpu.geometry import opencv_to_opengl, quat_from_matrix33, matrix33_from_quat
from diffdope_tpu.mesh import Mesh, load_mesh
from diffdope_tpu.optimize import pose_params

log = logging.getLogger(__name__)


class Object3D:
    """Pose + mesh container (reference Object3D, diffdope.py:938-1098).

    Args:
        position: 3-list object position.
        rotation: quat (x,y,z,w) / flat 3x3 / nested 3x3 (reference
            diffdope.py:1000-1004).
        batchsize: number of pose hypotheses.
        opencv2opengl: convert pose from OpenCV to OpenGL frame at load
            (reference diffdope.py:1006-1007).
        model_path: mesh file (PLY/OBJ); optional — a Mesh can be attached
            later (BOP sweep pattern, reference run_bop_scene.py:62-83).
        scale: applied to both mesh vertices and position.
    """

    def __init__(
        self,
        position,
        rotation,
        batchsize: int = 32,
        opencv2opengl: bool = True,
        model_path: Optional[str] = None,
        scale: float = 1,
        mesh: Optional[Mesh] = None,
    ):
        self.mesh: Optional[Mesh] = mesh
        if model_path is not None and mesh is None:
            self.mesh = load_mesh(model_path, scale=scale)
        self.batchsize = batchsize
        self.set_pose(position, rotation, batchsize, opencv2opengl=opencv2opengl, scale=scale)

    def set_pose(
        self,
        position,
        rotation,
        batchsize: Optional[int] = None,
        opencv2opengl: bool = True,
        scale: float = 1,
    ) -> None:
        """Set a new initial pose (reference diffdope.py:978-1030)."""
        if batchsize is not None:
            self.batchsize = batchsize
        position = np.asarray(position, dtype=np.float64) * scale
        if opencv2opengl:
            position, quat = opencv_to_opengl(position, rotation)
        else:
            rot = np.asarray(rotation, dtype=np.float64)
            if rot.shape == (4,):
                quat = rot / np.linalg.norm(rot)
            else:
                quat = quat_from_matrix33(rot.reshape(3, 3))
        self._position = np.asarray(position, np.float64)
        self._rotation = np.asarray(quat, np.float64)
        log.info("translation loaded: %s", self._position)
        log.info("rotation loaded as quaternion: %s", self._rotation)

    # -- functional bridge ------------------------------------------------
    def initial_params(self, batchsize: Optional[int] = None):
        """Fresh (B,)-shaped parameter pytree at the stored initial pose."""
        b = batchsize if batchsize is not None else self.batchsize
        return pose_params(self._rotation, self._position, b)

    def initial_matrix(self) -> np.ndarray:
        m = np.eye(4, dtype=np.float64)
        m[:3, :3] = np.asarray(matrix33_from_quat(self._rotation))
        m[:3, 3] = self._position
        return m

    # -- reference API compatibility --------------------------------------
    def set_batchsize(self, batchsize: int) -> None:
        self.batchsize = batchsize

    def reset_pose(self) -> None:
        """No-op: parameters are rebuilt from the stored pose on every
        `run_optimization` (reference reset_pose, diffdope.py:1068-1083)."""

    def cuda(self) -> None:
        """No-op: placement handled by jit/sharding."""

    def forward(self) -> dict:
        """Mesh arrays + initial quat/trans (reference forward,
        diffdope.py:1085-1098), for user code that introspects the object."""
        out = {}
        if self.mesh is not None:
            for key in ("pos", "pos_idx", "vtx_color", "tex", "uv", "uv_idx", "vtx_normals"):
                val = getattr(self.mesh, key, None)
                if val is not None:
                    out[key] = val
        out["quat"] = self._rotation.copy()
        out["trans"] = self._position.copy()
        return out

    __call__ = forward

    def __repr__(self):
        return (
            f"Object3D(pos={self._position}, quat={self._rotation}, "
            f"batch={self.batchsize}, mesh={getattr(self.mesh, 'path_model', None)})"
        )
