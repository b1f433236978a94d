"""BOP perturbation-level sweep with aggregate ADD(-S)/AUC reporting.

Walks the bundled perturbed-pose JSONs (reference data/{hope,ycbv,tless},
3 levels per scene — the reference's eval protocol, SURVEY.md section 6)
and prints a per-level accuracy table.

Without --bop-root (the repo ships only the JSONs, data/copy_data_here.py),
the protocol is SYNTHESIZED: the JSON pose is the ground truth, its image
is rendered with a stand-in mesh, and the init is perturbed by the level's
own magnitudes.  With --bop-root pointing at a real BOP split (rgb/,
mask_visib/, scene_gt.json + models/), the JSON pose is the init and
scene_gt.json scores the result — the reference run_bop_scene.py flow.

Multi-host sweeps: run one process per host with --shard i/n (scene-level
parallelism is embarrassingly parallel, SURVEY.md section 2.4) and merge
the per-host JSON outputs.

Examples:
    python examples/run_bop_sweep.py --dataset hope --max-objects 2
    python examples/run_bop_sweep.py --dataset ycbv --shard 1/4 \
        --out sweep_ycbv_1.json
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--data-root", default="/root/reference/data")
    ap.add_argument("--dataset", default="hope",
                    choices=["hope", "ycbv", "tless"])
    ap.add_argument("--levels", default="all",
                    help="comma list, e.g. deg_010_trans_004 (default all 3)")
    ap.add_argument("--max-scenes", type=int, default=1)
    ap.add_argument("--max-frames", type=int, default=1)
    ap.add_argument("--max-objects", type=int, default=3)
    ap.add_argument("--batchsize", type=int, default=16)
    ap.add_argument("--iterations", type=int, default=40)
    ap.add_argument("--resolution", default="160x160")
    ap.add_argument("--bop-root", default=None,
                    help="real BOP split dir (enables the real protocol)")
    ap.add_argument("--models-dir", default=None)
    ap.add_argument("--mesh", dest="mesh_path",
                    default="/root/reference/data/example/mesh/AlphabetSoup.ply",
                    help="stand-in mesh for the synthesized protocol")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--optimizer", default="adam", choices=["adam", "sgd"])
    ap.add_argument("--base-lr", type=float, default=0.02)
    ap.add_argument("--lr-bounds", default="0.5,4.0",
                    help="per-hypothesis loss-scale bounds (sgd only: adam "
                         "is invariant to gradient scale)")
    ap.add_argument("--loss-weights", default="0.7,0,1",
                    help="rgb,depth,mask term weights; 0 disables a term "
                         "(the reference default protocol is mask-only: "
                         "0,0,1 — configs/diffdope.yaml losses block)")
    ap.add_argument("--init-jitter", default="0,0",
                    help="deg,trans per-hypothesis init jitter (seeded; "
                         "hypothesis 0 stays at the unjittered init — "
                         "optimize.jitter_pose_params). Default 0,0 = "
                         "reference parity (all hypotheses identical)")
    ap.add_argument("--restarts", type=int, default=0,
                    help="re-seed all hypotheses at the running argmin "
                         "between N+1 equal segments "
                         "(optimize.refine_with_restarts)")
    ap.add_argument("--restart-jitter", default="10,0.02",
                    help="deg,trans jitter applied at each restart")
    ap.add_argument("--argmin-rule", default="best_step",
                    choices=["best_step", "last_step"],
                    help="pose selection: best (step, hypothesis) over the "
                         "whole loss history (default; never worse in loss "
                         "than the init) or the reference's last-step rule")
    ap.add_argument("--shard", default="0/1", help="i/n per-host scene shard")
    ap.add_argument("--out", default=None, help="write full results JSON here")
    args = ap.parse_args()

    from diffdope_tpu.bop import PERTURBATION_LEVELS, sweep_perturbation_levels

    levels = (
        list(PERTURBATION_LEVELS)
        if args.levels == "all" else args.levels.split(",")
    )
    h, w = (int(v) for v in args.resolution.split("x"))
    i, n = (int(v) for v in args.shard.split("/"))

    results = sweep_perturbation_levels(
        data_root=args.data_root,
        dataset=args.dataset,
        levels=levels,
        max_scenes=args.max_scenes,
        max_frames=args.max_frames,
        max_objects=args.max_objects,
        batchsize=args.batchsize,
        nb_iterations=args.iterations,
        resolution=(h, w),
        mesh_path=args.mesh_path,
        bop_root=args.bop_root,
        models_dir=args.models_dir,
        seed=args.seed,
        shard=(i, n),
        optimizer=args.optimizer,
        base_lr=args.base_lr,
        lr_bounds=tuple(float(v) for v in args.lr_bounds.split(",")),
        loss_weights=tuple(float(v) for v in args.loss_weights.split(",")),
        init_jitter=tuple(float(v) for v in args.init_jitter.split(",")),
        restarts=args.restarts,
        restart_jitter=tuple(
            float(v) for v in args.restart_jitter.split(",")
        ),
        argmin_rule=args.argmin_rule,
    )

    print()
    print(f"{'level':24s} {'n':>4s} {'ADD mean':>10s} {'ADD med':>10s} "
          f"{'acc@0.1d':>9s} {'AUC@0.1d':>9s} {'S-acc@0.1d':>10s} "
          f"{'init-acc':>9s}  mode")
    for level, r in results.items():
        init_acc = r.get("acc_01d_init")
        print(f"{level:24s} {r['n']:4d} {r['add_mean']:10.4f} "
              f"{r['add_med']:10.4f} {r['acc_01d']:9.3f} {r['auc_01d']:9.3f}"
              f" {r.get('adds_acc_01d', float('nan')):10.3f}"
              f" {init_acc if init_acc is None else format(init_acc, '9.3f')}"
              f"  {r['mode']}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
