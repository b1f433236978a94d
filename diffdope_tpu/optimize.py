"""Pose-hypothesis refinement loop: one jitted `lax.scan` over all steps.

The reference drives 61 optimization steps from Python, crossing the
host<->device boundary every step and copying every render back to CPU
(reference diffdope/diffdope.py:1656-1714, D2H copies at 1698-1703).  Here
the entire refinement — forward render, losses, backward, optimizer update,
LR schedule — is a single compiled `lax.scan`: zero host round trips, and
the only outputs are the tiny per-step pose matrices and loss logs (renders
are re-created on demand from the pose history; see diffdope.py
RenderHistory).

Reference quirks preserved for numerical parity (SURVEY.md section 7):
  * LR schedule ``lr = base_lr * lr_decay ** (step/nb + 1)`` with the
    exponent running over [1, 2] (reference diffdope.py:1657-1661);
  * quaternion normalized in the forward pass, gradients intact
    (reference diffdope.py:1090-1091);
  * the 7 raw pose scalars (qx,qy,qz,qw,x,y,z) are the optimized
    parameters (reference diffdope.py:1019-1026);
  * nb_iterations + 1 steps (reference diffdope.py:1654-1656);
  * per-hypothesis random loss scales drawn uniform in
    ``learning_rates_bound`` — but *seeded* (the reference leaves this
    unseeded with a TODO, diffdope.py:1367-1375).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from diffdope_tpu.geometry import matrix44_from_quat_trans, quat_normalize

Array = jax.Array


class RefineResult(NamedTuple):
    """Outputs of a refinement run (all stacked over steps on device)."""

    params: Dict[str, Array]          # final pose params, each (B,)
    mtx_history: Array                # (steps, B, 4, 4) pose per step (pre-update)
    losses_values: Dict[str, Array]   # per-term logs, each (steps, B)
    total_loss: Array                 # (steps,)
    opt_state: Any = None             # optax state (for segmented runs)
    segment_times: Any = None         # [(steps, wall_s), ...] per dispatched
                                      # segment (refine_segmented only) —
                                      # lets callers split compile from
                                      # steady-state throughput
    telemetry: Any = None             # per-step diagnostics dict (underscore
                                      # log keys, e.g. _bin_overflow), each
                                      # (steps,) or (steps, ...)


def pose_params(quat, trans, batchsize: int) -> Dict[str, Array]:
    """Initial parameter pytree: 7 arrays of shape (B,), every hypothesis
    starting at the same pose (reference Object3D.set_pose,
    diffdope.py:1019-1026)."""
    q = jnp.asarray(quat, jnp.float32)
    t = jnp.asarray(trans, jnp.float32)
    ones = jnp.ones((batchsize,), jnp.float32)
    return {
        "qx": ones * q[0], "qy": ones * q[1], "qz": ones * q[2], "qw": ones * q[3],
        "x": ones * t[0], "y": ones * t[1], "z": ones * t[2],
    }


def pose_matrix(params: Dict[str, Array]) -> Tuple[Array, Array, Array]:
    """params -> ((B,4,4) matrix, (B,4) unit quat, (B,3) trans).

    Quaternion is normalized in-graph so gradients flow through the
    normalization (reference Object3D.forward, diffdope.py:1085-1098)."""
    q = jnp.stack([params["qx"], params["qy"], params["qz"], params["qw"]], axis=-1)
    q = quat_normalize(q)
    t = jnp.stack([params["x"], params["y"], params["z"]], axis=-1)
    return matrix44_from_quat_trans(q, t), q, t


def draw_learning_rates(key: Array, batchsize: int, bounds: Sequence[float]) -> Array:
    """Seeded per-hypothesis loss scales (fixes the reference's unseeded
    TODO at diffdope.py:1367)."""
    return jax.random.uniform(
        key, (batchsize,), jnp.float32, minval=bounds[0], maxval=bounds[1]
    )


def make_lr_schedule(base_lr: float, lr_decay: float, nb_iterations: int):
    """lr(step) = base_lr * lr_decay ** (step/nb + 1)  — itf in [1, 2]."""

    def schedule(step):
        itf = step / nb_iterations + 1.0
        return base_lr * lr_decay ** itf

    return schedule


def make_optimizer(name: str, base_lr: float, lr_decay: float, nb_iterations: int):
    sched = make_lr_schedule(base_lr, lr_decay, nb_iterations)
    if name == "sgd":
        return optax.sgd(learning_rate=sched)
    if name == "adam":
        return optax.adam(learning_rate=sched)
    raise ValueError(f"unknown optimizer {name!r} (sgd | adam)")


def refine(
    params0: Dict[str, Array],
    render_fn: Callable[[Array], Dict[str, Array]],
    loss_fns: Sequence[Callable],
    gt: Dict[str, Array],
    learning_rates: Array,
    weights: Dict[str, float],
    nb_iterations: int = 60,
    base_lr: float = 20.0,
    lr_decay: float = 0.1,
    optimizer: str = "sgd",
    extra_params: Optional[Dict[str, Array]] = None,
    opt_state: Any = None,
    num_steps: Optional[int] = None,
    fused_loss_fn: Optional[Callable] = None,
    loss_scale: float = 1.0,
    axis_name: Optional[str] = None,
) -> RefineResult:
    """Run the full refinement as one scan.  Jit-compatible; call under jit.

    Args:
        params0: initial pose params ({'qx',...,'z'}, each (B,)).
        render_fn: mtx (B,4,4) [, extra params] -> renders dict
            ({'rgb','depth','mask'}).  Closes over mesh/camera tensors.
        loss_fns: active loss callables (see losses.py signature).
        gt: ground-truth arrays {'rgb','depth','segmentation'} (unbatched).
        learning_rates: (B,) per-hypothesis loss scales.
        weights: loss weights {'rgb','depth','mask'}.
        nb_iterations: the scan runs nb_iterations + 1 steps (reference
            semantics).
        extra_params: additional optimized leaves (e.g. texture for
            appearance refinement, reference Mesh.enable_gradients_texture
            diffdope.py:909-920); passed to render_fn as kwargs.
        opt_state: resume from a previous segment's optimizer state (the LR
            schedule continues from its step count).
        num_steps: run exactly this many steps instead of nb_iterations+1
            (for segmented execution; nb_iterations still shapes the LR
            schedule).
        fused_loss_fn: optional ``fn(mtx) -> (total, logs)`` that replaces
            render_fn + loss_fns with the fused render+loss kernel path
            (pipeline.make_fused_loss) — same semantics, no per-pixel
            images in HBM.  Mutually exclusive with extra_params.
        loss_scale: multiply the scalar objective by this (parallel.py's
            shard_map path passes 1/n so each shard's per-local-B mean
            becomes its share of the GLOBAL-batch mean — updates bitwise
            match the unsharded run).
        axis_name: when running inside shard_map over a hypothesis mesh
            axis, the name of that axis: the logged total and the scalar
            telemetry are psum'd (pmax for *_max keys) so they report
            global values, and gradients of replicated ``extra_params``
            leaves are psum-reduced across shards.

    Returns:
        RefineResult with per-step pose history and loss logs.
    """
    opt = make_optimizer(optimizer, base_lr, lr_decay, nb_iterations)
    all_params = dict(params0)
    if extra_params:
        all_params.update(extra_params)
    if opt_state is None:
        opt_state = opt.init(all_params)
    extra_keys = tuple(extra_params.keys()) if extra_params else ()
    length = (nb_iterations + 1) if num_steps is None else num_steps

    # The post-kernel shading is rematerialized inside render_batch itself
    # (pipeline.py): its AD residuals are the memory hogs, while the raster
    # kernel must NOT be re-run in the backward.

    if fused_loss_fn is not None and extra_params:
        raise ValueError("fused_loss_fn does not support extra_params")
    fused_takes_gt = False
    fused_takes_lrs = False
    if fused_loss_fn is not None:
        import inspect

        fused_sig = inspect.signature(fused_loss_fn).parameters
        fused_takes_gt = len(fused_sig) >= 2
        # sharded runs pass the shard-local learning-rate slice through
        # (the closure-baked vector has the GLOBAL batch length)
        fused_takes_lrs = "learning_rates" in fused_sig

    def loss_fn(params):
        mtx, _, _ = pose_matrix(params)
        if fused_loss_fn is not None:
            # gt passed traced when the fused fn defers it (one trace serves
            # many scenes, e.g. the BOP sweep); baked closures take mtx only
            kw = {"learning_rates": learning_rates} if fused_takes_lrs else {}
            total, logs = (
                fused_loss_fn(mtx, gt, **kw) if fused_takes_gt
                else fused_loss_fn(mtx, **kw)
            )
            return total * loss_scale, (logs, mtx)
        extra = {k: params[k] for k in extra_keys}
        renders = render_fn(mtx, **extra)
        total = jnp.float32(0.0)
        logs = {k: v for k, v in renders.items() if k.startswith("_")}
        for fn in loss_fns:
            term, (key, values) = fn(renders, gt, learning_rates, weights)
            total = total + term
            logs[key] = values
        return total * loss_scale, (logs, mtx)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(carry, _):
        params, opt_state = carry
        (total, (logs, mtx)), grads = grad_fn(params)
        if axis_name is not None:
            # the hypotheses are independent, so pose gradients need no
            # collective; only the replicated appearance leaves reduce
            # across shards, and the logged scalars report global values
            for k in extra_keys:
                grads[k] = jax.lax.psum(grads[k], axis_name)
            total = jax.lax.psum(total, axis_name)
            logs = {
                k: (
                    (jax.lax.pmax(v, axis_name) if k.endswith("_max")
                     else jax.lax.psum(v, axis_name))
                    if k.startswith("_") else v
                )
                for k, v in logs.items()
            }
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), {"logs": logs, "mtx": mtx, "total": total}

    (final_params, final_opt_state), ys = jax.lax.scan(
        step, (all_params, opt_state), None, length=length
    )
    # underscore keys are per-step telemetry (e.g. _bin_overflow), not loss
    # curves: keep them out of losses_values so argmin_hypothesis and the
    # logged curves see only real loss terms
    losses = {k: v for k, v in ys["logs"].items() if not k.startswith("_")}
    telemetry = {k: v for k, v in ys["logs"].items() if k.startswith("_")}
    return RefineResult(
        params=final_params,
        mtx_history=ys["mtx"],
        losses_values=losses,
        total_loss=ys["total"],
        opt_state=final_opt_state,
        telemetry=telemetry or None,
    )


def refine_segmented(
    params0: Dict[str, Array],
    render_fn,
    loss_fns,
    gt,
    learning_rates,
    weights,
    nb_iterations: int = 60,
    segment_steps: int = 40,
    jit_refine=None,
    **refine_kwargs,
) -> RefineResult:
    """Run the refinement as several jitted scan segments.

    A single device program has a bounded execution time in some
    environments (the axon tunnel kills executions past ~60s), and chunking
    also bounds peak history memory.  Optimizer state and the LR-schedule
    step count carry across segments, so the result is numerically identical
    to one long scan.  Host-side cost: one dispatch per segment.
    """
    import numpy as np

    total = nb_iterations + 1
    if jit_refine is None:
        jit_refine = jax.jit(
            functools.partial(
                refine,
                render_fn=render_fn,
                loss_fns=tuple(loss_fns),
                weights=weights,
                nb_iterations=nb_iterations,
                **refine_kwargs,
            ),
            static_argnames=("num_steps",),
        )

    import time

    params = params0
    opt_state = None
    mtx_chunks, total_chunks = [], []
    logs_chunks: Dict[str, list] = {}
    telem_chunks: Dict[str, list] = {}
    segment_times = []
    done = 0
    while done < total:
        n = min(segment_steps, total - done)
        t0 = time.perf_counter()
        res = jit_refine(
            params, gt=gt, learning_rates=learning_rates,
            opt_state=opt_state, num_steps=n,
        )
        jax.block_until_ready(res.mtx_history)
        segment_times.append((n, time.perf_counter() - t0))
        params, opt_state = res.params, res.opt_state
        mtx_chunks.append(res.mtx_history)
        total_chunks.append(res.total_loss)
        for k, v in res.losses_values.items():
            logs_chunks.setdefault(k, []).append(v)
        for k, v in (res.telemetry or {}).items():
            telem_chunks.setdefault(k, []).append(v)
        done += n

    return RefineResult(
        params=params,
        mtx_history=jnp.concatenate(mtx_chunks, axis=0),
        losses_values={k: jnp.concatenate(v, axis=0) for k, v in logs_chunks.items()},
        total_loss=jnp.concatenate(total_chunks, axis=0),
        opt_state=opt_state,
        segment_times=segment_times,
        telemetry=(
            {k: jnp.concatenate(v, axis=0) for k, v in telem_chunks.items()}
            or None
        ),
    )


def argmin_hypothesis(losses_values: Dict[str, Array]) -> Array:
    """Best hypothesis = argmin over B of the mean of every logged term at
    the last step (reference get_argmin, diffdope.py:1488-1513)."""
    last = jnp.stack([v[-1] for v in losses_values.values()], axis=0)  # (terms, B)
    return jnp.argmin(jnp.mean(last, axis=0), axis=-1)
