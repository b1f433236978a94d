"""Image and Scene containers (host-side loading, numpy/cv2).

Mirrors the reference's ``Image`` (diffdope/diffdope.py:1101-1180) and
``Scene`` (diffdope.py:1183-1264) semantics:

* RGB loaded BGR->RGB, normalized to [0,1] (reference diffdope.py:1127-1130);
* depth loaded IMREAD_UNCHANGED and divided by ``depth_scale`` (default 100,
  reference diffdope.py:1120, 1125);
* vertical flip at load — the render path works on upside-down images
  (reference diffdope.py:1131-1132);
* fractional resize, NEAREST for depth (reference diffdope.py:1134-1151);
* segmentation exposed as a 3-channel float mask to multiply RGB losses
  directly (reference gt_tensors usage diffdope.py:553-556).

TPU-specific difference: images are **not** stacked per pose hypothesis
(reference ``set_batchsize`` diffdope.py:1168-1180).  A single (H,W,C) array
is kept and broadcast against the hypothesis batch inside the jitted loss —
identical math, O(batch) less HBM.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

__all__ = ["Image", "Scene"]


def _require_cv2():
    import cv2

    return cv2


@dataclass
class Image:
    """A single image (rgb / depth / segmentation) as a numpy array.

    Args mirror the reference Image dataclass (diffdope.py:1101-1180).
    ``img_tensor`` is (H,W,3) float32 for color, (H,W) float32 for depth.
    """

    img_path: Optional[str] = None
    img_tensor: Optional[np.ndarray] = None
    img_resize: float = 1.0
    flip_img: bool = True
    depth: bool = False
    depth_scale: float = 100.0

    def __post_init__(self):
        if self.img_path is not None:
            cv2 = _require_cv2()
            if self.depth:
                im = cv2.imread(str(self.img_path), cv2.IMREAD_UNCHANGED)
                if im is None:
                    raise FileNotFoundError(self.img_path)
                im = im.astype(np.float64) / self.depth_scale
            else:
                im = cv2.imread(str(self.img_path))
                if im is None:
                    raise FileNotFoundError(self.img_path)
                im = cv2.cvtColor(im[:, :, :3], cv2.COLOR_BGR2RGB) / 255.0
            if self.flip_img:
                im = cv2.flip(im, 0)
            if self.img_resize is not None and self.img_resize < 1.0:
                new_size = (
                    int(im.shape[1] * self.img_resize),
                    int(im.shape[0] * self.img_resize),
                )
                interp = cv2.INTER_NEAREST if self.depth else cv2.INTER_LINEAR
                im = cv2.resize(im, new_size, interpolation=interp)
            self.img_tensor = im.astype(np.float32)
            log.info("Loaded image %s, shape %s", self.img_path, self.img_tensor.shape)
        elif self.img_tensor is not None:
            self.img_tensor = np.asarray(self.img_tensor, dtype=np.float32)

    @property
    def shape(self):
        return self.img_tensor.shape

    def __repr__(self):
        shape = None if self.img_tensor is None else self.img_tensor.shape
        return f"Image({shape} @ {self.img_path})"


@dataclass
class Scene:
    """Bundle of rgb / depth / segmentation images for one optimization.

    Same construction surface as the reference Scene (diffdope.py:1183-1264).
    """

    path_img: Optional[str] = None
    path_depth: Optional[str] = None
    path_segmentation: Optional[str] = None
    image_resize: Optional[float] = 1.0

    tensor_rgb: Optional[Image] = None
    tensor_depth: Optional[Image] = None
    tensor_segmentation: Optional[Image] = None

    def __post_init__(self):
        resize = 1.0 if self.image_resize is None else self.image_resize
        if self.path_img is not None and self.tensor_rgb is None:
            self.tensor_rgb = Image(self.path_img, img_resize=resize)
        if self.path_depth is not None and self.tensor_depth is None:
            self.tensor_depth = Image(self.path_depth, img_resize=resize, depth=True)
        if self.path_segmentation is not None and self.tensor_segmentation is None:
            self.tensor_segmentation = Image(self.path_segmentation, img_resize=resize)

    def get_resolution(self):
        """[H, W] of the optimization images (reference diffdope.py:1231-1252)."""
        for img in (self.tensor_rgb, self.tensor_segmentation):
            if img is not None and img.img_tensor is not None:
                return [img.img_tensor.shape[0], img.img_tensor.shape[1]]
        if self.tensor_depth is not None and self.tensor_depth.img_tensor is not None:
            return [
                self.tensor_depth.img_tensor.shape[0],
                self.tensor_depth.img_tensor.shape[1],
            ]
        raise ValueError("Scene has no images")

    def gt_arrays(self) -> dict:
        """Ground-truth arrays for the jitted loss: {'rgb','depth','segmentation'}.

        Segmentation passes through as the normalized float mask (NOT
        binarized), matching the reference, which loads the seg PNG as a
        normalized color image and multiplies with it (diffdope.py:553-556);
        a 2-channel gray mask is repeated to 3 channels."""
        out = {}
        if self.tensor_rgb is not None:
            out["rgb"] = self.tensor_rgb.img_tensor
        if self.tensor_depth is not None:
            out["depth"] = self.tensor_depth.img_tensor
        if self.tensor_segmentation is not None:
            seg = self.tensor_segmentation.img_tensor
            if seg.ndim == 2:
                seg = np.repeat(seg[..., None], 3, axis=-1)
            out["segmentation"] = seg
        return out
