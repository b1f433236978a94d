"""diffdope_tpu — a TPU-native differentiable 6-DoF pose refinement framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of NVlabs/diff-dope:
given an RGB(+depth+mask) image, a textured 3D mesh, and an initial pose
guess, refine a batch of pose hypotheses by gradient descent through a
differentiable rasterizer.

Design (TPU-first, not a port):
  * the whole optimization loop is one ``jit(lax.scan)`` — zero host round
    trips per step (the reference crosses Python<->CUDA 61 times,
    reference diffdope/diffdope.py:1656-1714);
  * rasterization = a Pallas tile kernel for the discrete triangle-id search
    + a differentiable pure-jnp re-evaluation, so XLA autodiff provides exact
    geometry gradients with no hand-written CUDA backward;
  * the hypothesis batch is a sharded axis over a ``jax.sharding.Mesh``
    (multi-chip via ICI) instead of hard-coded ``.cuda()`` placement.
"""

from diffdope_tpu.config import ConfigNode, load_config
from diffdope_tpu.camera import Camera
from diffdope_tpu.image import Image, Scene
from diffdope_tpu.mesh import Mesh, load_mesh
from diffdope_tpu.object3d import Object3D
from diffdope_tpu.diffdope import DiffDope
from diffdope_tpu.losses import (
    LOSS_REGISTRY,
    dist_batch_lr,
    l1_depth_with_mask,
    l1_mask,
    l1_rgb_with_mask,
    register_loss,
)
from diffdope_tpu.render import antialias, interpolate, rasterize, render_batch, texture
from diffdope_tpu.render.pipeline import make_fused_loss
from diffdope_tpu.metrics import add_auc, add_metric, adds_metric, object_diameter
from diffdope_tpu.geometry import (
    matrix33_from_quat,
    matrix44_from_quat_trans,
    opencv_to_opengl,
    opengl_to_opencv,
    projection_from_intrinsics,
    quat_from_matrix33,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    xfm_points,
    xfm_vectors,
)

__version__ = "0.1.0"
