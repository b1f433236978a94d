#!/usr/bin/env python3
"""Trace a short bench-scale refinement and print the per-op breakdown.

Usage: python tools/profile_bench.py [steps] [outdir]
Runs on the default backend (TPU under axon); keep steps small (<=10) so the
single execution stays under the ~60s tunnel watchdog.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jaxtrace"


def main():
    import functools

    import jax

    import bench
    from diffdope_tpu.losses import select_losses
    from diffdope_tpu.optimize import draw_learning_rates, refine

    print(f"devices: {jax.devices()}", file=sys.stderr)
    render_fn, gt, params0, fused_ctx = bench.build_problem()
    loss_fns, weights = select_losses(
        {"l1_mask": True, "weight_mask": 1.0, "l1_rgb_with_mask": True, "weight_rgb": 0.7}
    )
    lrs = draw_learning_rates(jax.random.PRNGKey(0), bench.BATCH, (0.5, 4.0))

    import os
    fused_fn = None
    if os.environ.get("DD_FUSED", "1") == "1":
        from diffdope_tpu.render.pipeline import make_fused_loss

        fused_fn = make_fused_loss(
            fused_ctx["proj"], fused_ctx["pos"], fused_ctx["tri"], bench.RES,
            gt, lrs, weights, use_rgb=True, use_depth=False, use_mask=True,
            edge_adj=fused_ctx["edge_adj"],
            corner_colors=fused_ctx["corner_colors"],
            vtx_color=fused_ctx["vtx_color"],
            tex=fused_ctx["tex"], uv=fused_ctx["uv"],
            uv_idx=fused_ctx["uv_idx"],
            tile_hw=fused_ctx["tile_hw"],
            max_tris_per_tile=fused_ctx["max_k"],
            cull_backfaces=fused_ctx["cull"], max_occ=fused_ctx["max_occ"],
            bins=fused_ctx["bins"],
            compact_total=fused_ctx["compact_total"],
        )
        print("loss path: fused kernel", file=sys.stderr)

    jit_refine = jax.jit(
        functools.partial(
            refine, render_fn=render_fn, loss_fns=tuple(loss_fns),
            weights=weights, nb_iterations=bench.STEPS - 1,
            base_lr=0.02, lr_decay=0.1, optimizer="adam",
            fused_loss_fn=fused_fn,
        ),
        static_argnames=("num_steps",),
    )

    # compile + warm up
    t0 = time.perf_counter()
    r = jit_refine(params0, gt=gt, learning_rates=lrs, opt_state=None, num_steps=STEPS)
    jax.block_until_ready(r.mtx_history)
    print(f"compile+run({STEPS} steps): {time.perf_counter()-t0:.2f}s", file=sys.stderr)

    with jax.profiler.trace(OUTDIR):
        t0 = time.perf_counter()
        r = jit_refine(params0, gt=gt, learning_rates=lrs, opt_state=None, num_steps=STEPS)
        jax.block_until_ready(r.mtx_history)
        dt = time.perf_counter() - t0
    print(f"steady: {dt:.3f}s total, {dt/STEPS*1000:.1f} ms/step", file=sys.stderr)
    print(f"trace written to {OUTDIR}", file=sys.stderr)


if __name__ == "__main__":
    main()
