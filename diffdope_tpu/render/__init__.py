"""Differentiable rendering primitives (TPU-native nvdiffrast equivalents).

The reference delegates rendering to nvdiffrast's four CUDA/OpenGL primitives
(rasterize / interpolate / texture / antialias — call sites reference
diffdope/diffdope.py:198-231, contract in SURVEY.md section 2.3).  This package
reimplements those contracts TPU-first:

* ``rasterize`` — a *non-differentiable* triangle-id search (Pallas tile
  kernel with z-test; pure-jnp twin for tests/CPU) followed by a
  *differentiable* pure-jnp re-evaluation of barycentrics and depth from the
  selected ids.  XLA autodiff then yields exactly the analytic vertex
  gradients nvdiffrast hand-writes in CUDA.
* ``interpolate`` — barycentric attribute interpolation (gather + blend).
* ``texture`` — bilinear texture sampling.
* ``antialias`` — analytic edge-crossing blend; the only source of
  coverage->position gradients, as in nvdiffrast.
"""

from diffdope_tpu.render.rasterize import rasterize
from diffdope_tpu.render.interpolate import interpolate
from diffdope_tpu.render.texture import texture
from diffdope_tpu.render.antialias import antialias
from diffdope_tpu.render.pipeline import render_batch
