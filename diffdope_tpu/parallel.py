"""Multi-chip scaling: shard the hypothesis batch over a device mesh.

The reference is single-GPU with hard-coded `.cuda()` placement and no
distributed support at all (SURVEY.md section 2.4).  Its one parallelism axis
— the pose-hypothesis batch — maps directly onto a `jax.sharding.Mesh`:

* pose parameters, per-hypothesis loss scales, and every rendered tensor
  carry the batch as leading axis -> sharded over the ``hyp`` mesh axis
  (ICI on a TPU slice);
* ground-truth images, mesh tensors, and the projection are replicated;
* the only collectives are the loss-mean over B (an implicit psum inserted
  by GSPMD) and the final argmin over B scalars — both tiny, both riding
  ICI.

Multi-host BOP sweeps (many scenes) are embarrassingly parallel: run one
process per host over DCN with different scene assignments
(examples/run_bop_scene.py takes scene lists) — matching the reference's
semantics with zero cross-scene communication.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffdope_tpu.optimize import refine

__all__ = ["hypothesis_mesh", "shard_params", "replicate", "refine_sharded"]


def hypothesis_mesh(n_devices: Optional[int] = None, axis_name: str = "hyp") -> Mesh:
    """1-D device mesh over the hypothesis axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_params(params: Dict[str, jax.Array], mesh: Mesh, axis_name: str = "hyp"):
    """Place (B,)-leading arrays sharded over the mesh axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), params)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sharding), tree)


def refine_sharded(
    params0: Dict[str, jax.Array],
    render_fn,
    loss_fns: Sequence,
    gt: Dict[str, jax.Array],
    learning_rates: jax.Array,
    weights: Dict[str, float],
    mesh: Mesh,
    axis_name: str = "hyp",
    extra_params: Optional[Dict[str, jax.Array]] = None,
    **refine_kwargs,
):
    """Run optimize.refine with the hypothesis batch sharded over `mesh`.

    The batch size must be divisible by the mesh size.  All refine outputs
    come back with the batch axis sharded; history/loss logs are tiny and
    can be pulled to host with np.asarray as usual.

    ``extra_params`` (appearance leaves from enable_gradients_texture,
    reference diffdope.py:909-920) are shared across hypotheses, hence
    replicated over the mesh; their gradients are reduced across shards by
    the implicit GSPMD psum.
    """
    b = params0["qx"].shape[0]
    n = mesh.devices.size
    if b % n != 0:
        raise ValueError(f"batchsize {b} not divisible by mesh size {n}")

    params0 = shard_params(params0, mesh, axis_name)
    learning_rates = jax.device_put(
        jnp.asarray(learning_rates), NamedSharding(mesh, P(axis_name))
    )
    gt = replicate(gt, mesh)
    if extra_params is not None:
        extra_params = replicate(extra_params, mesh)

    fn = jax.jit(
        partial(
            refine,
            render_fn=render_fn,
            loss_fns=tuple(loss_fns),
            weights=weights,
            **refine_kwargs,
        )
    )
    return fn(
        params0, gt=gt, learning_rates=learning_rates, extra_params=extra_params
    )
