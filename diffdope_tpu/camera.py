"""Camera model (reference diffdope/diffdope.py:621-742).

Stores pinhole intrinsics and produces the OpenGL projection matrix via
:func:`diffdope_tpu.geometry.projection_from_intrinsics`.  TPU-native
difference: the projection is a single (4,4) numpy array broadcast across
the hypothesis batch — `set_batchsize`/`cuda` exist for API compatibility
but no per-hypothesis stacking or device pinning happens (the reference
stacks B copies and hard-codes `.cuda()`, diffdope.py:650-663).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from diffdope_tpu.geometry import projection_from_intrinsics


@dataclass
class Camera:
    """Pinhole intrinsics -> OpenGL projection.

    Args mirror the reference Camera dataclass (diffdope.py:638-645).
    """

    fx: float
    fy: float
    cx: float
    cy: float
    im_width: int
    im_height: int
    znear: float = 0.01
    zfar: float = 200.0

    def __post_init__(self):
        self.cam_proj = self.get_projection_matrix()

    def get_projection_matrix(self) -> np.ndarray:
        """(4,4) float32 OpenGL projection (y_down convention)."""
        return projection_from_intrinsics(
            self.fx, self.fy, self.cx, self.cy,
            self.im_width, self.im_height, self.znear, self.zfar,
        ).astype(np.float32)

    def resize(self, percentage: float) -> None:
        """Scale intrinsics for resized optimization images (reference
        diffdope.py:665-677 — including its int truncation of cx/cy/w/h)."""
        self.fx *= percentage
        self.fy *= percentage
        self.cx = int(percentage * self.cx)
        self.cy = int(percentage * self.cy)
        self.im_width = int(percentage * self.im_width)
        self.im_height = int(percentage * self.im_height)
        self.cam_proj = self.get_projection_matrix()

    # --- API compatibility no-ops (broadcasting replaces stacking) -------
    def set_batchsize(self, batchsize: int) -> None:  # noqa: ARG002
        """No-op: the projection broadcasts over the hypothesis batch."""

    def cuda(self) -> None:
        """No-op: device placement is handled by jit/sharding."""
