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
import numpy as np
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


def jitter_pose_params(
    params: Dict[str, Array],
    key: Array,
    jitter_deg: float = 0.0,
    jitter_trans: float = 0.0,
    keep_first: bool = True,
) -> Dict[str, Array]:
    """Seeded per-hypothesis pose jitter: diversify the initial hypotheses.

    The reference's ONLY hypothesis-diversity mechanism is the random
    per-hypothesis loss scaling (reference diffdope.py:534-544, 1368-1375)
    — every hypothesis starts at the SAME pose.  Large sharded batches make
    explicit init diversity natural: each hypothesis gets an extra random
    rotation (random axis, angle uniform in [0, jitter_deg]) and a random
    translation offset (uniform direction, magnitude uniform in
    [0, jitter_trans], working units).  ``keep_first`` pins hypothesis 0 at
    the unjittered init so the original basin is always explored.  Default
    magnitudes of 0 reproduce reference behavior exactly.
    """
    if jitter_deg <= 0.0 and jitter_trans <= 0.0:
        return params
    b = params["qx"].shape[0]
    k_ax, k_ang, k_dir, k_mag = jax.random.split(jnp.asarray(key), 4)

    axis = jax.random.normal(k_ax, (b, 3), jnp.float32)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-9)
    ang = jax.random.uniform(
        k_ang, (b,), jnp.float32, 0.0, float(np.deg2rad(jitter_deg))
    )
    dq = jnp.concatenate(
        [axis * jnp.sin(0.5 * ang)[:, None], jnp.cos(0.5 * ang)[:, None]], -1
    )
    q = jnp.stack(
        [params["qx"], params["qy"], params["qz"], params["qw"]], axis=-1
    )
    from diffdope_tpu.geometry import quat_multiply, quat_normalize

    qj = quat_normalize(quat_multiply(dq, quat_normalize(q)))

    direc = jax.random.normal(k_dir, (b, 3), jnp.float32)
    direc = direc / jnp.maximum(jnp.linalg.norm(direc, axis=-1, keepdims=True), 1e-9)
    mag = jax.random.uniform(k_mag, (b,), jnp.float32, 0.0, float(jitter_trans))
    t = jnp.stack([params["x"], params["y"], params["z"]], axis=-1)
    tj = t + direc * mag[:, None]

    if keep_first:
        qj = qj.at[0].set(quat_normalize(q)[0])
        tj = tj.at[0].set(t[0])
    return {
        "qx": qj[:, 0], "qy": qj[:, 1], "qz": qj[:, 2], "qw": qj[:, 3],
        "x": tj[:, 0], "y": tj[:, 1], "z": tj[:, 2],
    }


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
    step_callback: Optional[Callable] = None,
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
        step_callback: optional host fn ``(step_index, total_loss)`` fired
            from INSIDE the scan via ``jax.debug.callback`` — per-STEP live
            loss, matching the reference's tqdm bar granularity (reference
            diffdope.py:1654, 1712).  Each firing is a device->host
            round trip; on remote-tunnel backends prefer the per-segment
            ``progress_fn`` of :func:`refine_segmented` (the default).

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

    def step(carry, step_idx):
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
        if step_callback is not None:
            jax.debug.callback(step_callback, step_idx, total)
        return (params, opt_state), {"logs": logs, "mtx": mtx, "total": total}

    (final_params, final_opt_state), ys = jax.lax.scan(
        step, (all_params, opt_state), jnp.arange(length, dtype=jnp.int32)
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
    progress_fn=None,
    **refine_kwargs,
) -> RefineResult:
    """Run the refinement as several jitted scan segments.

    A single device program has a bounded execution time in some
    environments (the axon tunnel kills executions past ~60s), and chunking
    also bounds peak history memory.  Optimizer state and the LR-schedule
    step count carry across segments, so the result is numerically identical
    to one long scan.  Host-side cost: one dispatch per segment.

    ``progress_fn(done_steps, total_steps, last_total_loss)`` is called
    after every segment — the live-progress equivalent of the reference's
    per-step tqdm loss bar (reference diffdope.py:1654, 1712), at segment
    granularity because the scan dispatches whole segments.
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
        if progress_fn is not None:
            import numpy as _np

            progress_fn(done, total, float(_np.asarray(res.total_loss)[-1]))

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


def refine_with_restarts(
    params0: Dict[str, Array],
    render_fn,
    loss_fns,
    gt,
    learning_rates,
    weights,
    nb_iterations: int = 60,
    restarts: int = 1,
    restart_jitter_deg: float = 10.0,
    restart_jitter_trans: float = 0.02,
    key: Optional[Array] = None,
    jit_refine=None,
    segment_steps: Optional[int] = None,
    **refine_kwargs,
) -> RefineResult:
    """Basin-hopping refinement: restart all hypotheses around the argmin.

    Runs the refinement in ``restarts + 1`` equal segments.  After each
    segment the best hypothesis (argmin of the logged loss means, the
    reference's get_argmin rule, diffdope.py:1488-1513) becomes the new
    shared init; every hypothesis re-seeds at that pose plus a fresh
    seeded jitter (hypothesis 0 exactly at the winner), and the optimizer
    state resets — a wider basin search early, a focused ensemble late.
    This is a TPU-batch-native capability the reference lacks (its only
    diversity is random loss scales); ``restarts=0`` is plain
    :func:`refine`.

    History/log outputs are the concatenation over segments (same total
    step count as one refine run with the same nb_iterations).

    ``segment_steps`` caps the steps per device dispatch (like
    refine_segmented — some environments kill single executions past
    ~60s): each restart segment is itself chunked, carrying optimizer
    state across chunks, so results are numerically identical to
    one-dispatch-per-restart.
    """
    total = nb_iterations + 1
    n_seg = restarts + 1
    if key is None:
        key = jax.random.PRNGKey(0)
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

    @jax.jit
    def reseed(params, losses_last, k):
        """All hypotheses <- argmin pose (+ jitter on all but #0)."""
        best = jnp.argmin(
            jnp.mean(jnp.stack(list(losses_last.values()), 0), axis=0), -1
        )
        shared = {kk: jnp.broadcast_to(v[best], v.shape) for kk, v in params.items()}
        return jitter_pose_params(
            shared, k, restart_jitter_deg, restart_jitter_trans
        )

    params = params0
    mtx_chunks, total_chunks = [], []
    logs_chunks: Dict[str, list] = {}
    telem_chunks: Dict[str, list] = {}
    done = 0
    for seg in range(n_seg):
        n = (total - done) // (n_seg - seg)
        # chunked dispatch within the restart segment (see segment_steps)
        seg_done, opt_state = 0, None
        while seg_done < n:
            m = n if segment_steps is None else min(segment_steps, n - seg_done)
            res = jit_refine(
                params if seg_done == 0 else res.params,
                gt=gt, learning_rates=learning_rates, num_steps=m,
                opt_state=opt_state,
            )
            opt_state = res.opt_state
            seg_done += m
            mtx_chunks.append(res.mtx_history)
            total_chunks.append(res.total_loss)
            for k2, v in res.losses_values.items():
                logs_chunks.setdefault(k2, []).append(v)
            for k2, v in (res.telemetry or {}).items():
                telem_chunks.setdefault(k2, []).append(v)
        done += n
        if seg < n_seg - 1:
            key, sub = jax.random.split(key)
            pose_only = {
                k2: res.params[k2]
                for k2 in ("qx", "qy", "qz", "qw", "x", "y", "z")
            }
            last = {k2: v[-1] for k2, v in res.losses_values.items()}
            params = reseed(pose_only, last, sub)
        else:
            params = res.params

    return RefineResult(
        params=params,
        mtx_history=jnp.concatenate(mtx_chunks, axis=0),
        losses_values={
            k2: jnp.concatenate(v, axis=0) for k2, v in logs_chunks.items()
        },
        total_loss=jnp.concatenate(total_chunks, axis=0),
        opt_state=None,
        telemetry=(
            {k2: jnp.concatenate(v, axis=0) for k2, v in telem_chunks.items()}
            or None
        ),
    )


def argmin_hypothesis(losses_values: Dict[str, Array]) -> Array:
    """Best hypothesis = argmin over B of the mean of every logged term at
    the last step (reference get_argmin, diffdope.py:1488-1513)."""
    last = jnp.stack([v[-1] for v in losses_values.values()], axis=0)  # (terms, B)
    return jnp.argmin(jnp.mean(last, axis=0), axis=-1)


def argmin_step_hypothesis(
    losses_values: Dict[str, Array], rule: str = "best_step"
) -> Tuple[Array, Array]:
    """Best (step, hypothesis) under the selection rule.

    The logged loss at step s is evaluated at the PRE-update pose
    ``mtx_history[s]`` (refine's scan emits mtx before applying the
    update), so a (step, hypothesis) argmin over the whole history selects
    the best pose the optimizer ever *visited* — and because step 0 scores
    the initial pose itself, the winner can never have a higher logged
    loss than the init.  The reference's rule (get_argmin, reference
    diffdope.py:1488-1513) only looks at the LAST step, which returns a
    diverged pose whenever the end of the trajectory overshoots a
    basin it passed through (measured: up to 46% of already-correct
    1-degree inits score worse than they started under last-step
    selection — docs/SWEEP_r04.md); ``rule='last_step'`` preserves that
    reference behavior exactly.

    Returns (step, hypothesis) int arrays; index ``mtx_history[step, hyp]``.
    """
    stacked = jnp.stack(list(losses_values.values()), axis=0)  # (terms, S, B)
    mean = jnp.mean(stacked, axis=0)  # (S, B)
    if rule == "last_step":
        s = mean.shape[0] - 1
        return jnp.asarray(s), jnp.argmin(mean[-1], axis=-1)
    if rule != "best_step":
        raise ValueError(f"unknown argmin rule {rule!r} (best_step | last_step)")
    flat = jnp.argmin(mean.reshape(-1), axis=-1)
    return flat // mean.shape[1], flat % mean.shape[1]
