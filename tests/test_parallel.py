"""Multi-chip sharding: sharded refinement must equal the unsharded run.

conftest forces 8 virtual CPU devices, so this exercises the real
jax.sharding.Mesh path (GSPMD partitioning of the hypothesis batch + the
implicit loss-mean collective) without TPU hardware.
"""

import numpy as np
import jax
import pytest

from diffdope_tpu.losses import select_losses
from diffdope_tpu.optimize import draw_learning_rates, refine
from diffdope_tpu.parallel import hypothesis_mesh, refine_sharded
from diffdope_tpu.testing import synthetic_scene


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_matches_unsharded():
    b = 8
    scene = synthetic_scene(
        subdiv=1, resolution=(32, 32), batchsize=b, seed=3,
        raster_impl="reference",
    )
    loss_fns, weights = select_losses({"l1_mask": True, "weight_mask": 1.0})
    lrs = draw_learning_rates(jax.random.PRNGKey(1), b, (0.5, 2.0))
    kwargs = dict(
        nb_iterations=3, base_lr=0.1, lr_decay=0.1, optimizer="adam",
    )

    ref = jax.jit(
        lambda p: refine(
            p, scene["render_fn"], loss_fns, scene["gt"], lrs, weights, **kwargs
        )
    )(scene["params0"])

    mesh = hypothesis_mesh(8)
    shard = refine_sharded(
        scene["params0"], scene["render_fn"], loss_fns, scene["gt"], lrs,
        weights, mesh, **kwargs
    )

    # per-hypothesis trajectories must agree (independent except for the
    # scalar loss mean, which only enters through logging)
    np.testing.assert_allclose(
        np.asarray(ref.mtx_history), np.asarray(shard.mtx_history),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ref.total_loss), np.asarray(shard.total_loss),
        rtol=2e-4, atol=1e-6,
    )
    # outputs actually carried a sharded layout
    hist_shard = shard.mtx_history
    assert len(hist_shard.sharding.device_set) == 8
