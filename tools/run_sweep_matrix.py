"""Full synthesized accuracy matrix: datasets x levels x stand-in meshes.

Runs the reference-protocol perturbation sweep (examples/run_bop_sweep.py
machinery, diffdope_tpu/bop.py) over ALL THREE bundled datasets
(/root/reference/data/{hope,ycbv,tless}, data/copy_data_here.py:8-17), all
three perturbation levels, and three stand-in meshes:

* AlphabetSoup (the reference's example mesh: textured, NEAR-SYMMETRIC can
  — ADD about its axis is weakly identified; ADD-S is the honest score)
* standin_asym (tools/make_standins.py: asymmetric geometry + colors —
  ADD and ADD-S must agree; a split is an optimizer failure)
* standin_sym (rotationally symmetric by construction — ADD is
  unidentifiable about the axis; only ADD-S is meaningful)

Operating point = the reference's basin-hopping configuration transferred
to the synth frame (docs/ROADMAP.md round-3 campaign): SGD, base_lr 5,
per-hypothesis loss scales in the reference bounds [0.01, 100]
(/root/reference/configs/diffdope.yaml:29-34), rgb+mask losses, 60
iterations, B=64 at 400x400 (B=64 is the measured-best operating point —
the round-4 A/B showed it dominates B=32 on the hard 40-degree cells).

Each cell also records the zero-iteration CONTROL column (the init pose
scored by the same metric): the refiner must not lose cases the init
already had (acc_01d >= acc_01d_init per cell), and the worst scan
telemetry (bin overflow / ROI crop leak) so degraded renders are visible
in the JSON rather than silently lowering accuracy.

Writes SWEEP_r05.json at the repo root and docs/SWEEP_r05.md.

Usage:  python tools/run_sweep_matrix.py [--fast] [--out SWEEP_r05.json]
        (--fast: tiny smoke configuration for CPU/CI)
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "SWEEP_r05.json"))
    ap.add_argument("--md", default=str(REPO / "docs" / "SWEEP_r05.md"))
    ap.add_argument("--fast", action="store_true",
                    help="smoke config: 1 scene, 2 objects, 8 iters, 96x96")
    ap.add_argument("--datasets", default="hope,ycbv,tless")
    ap.add_argument("--meshes", default="alphabetsoup,asym,sym")
    ap.add_argument("--batchsize", type=int, default=64)
    ap.add_argument("--iterations", type=int, default=60)
    ap.add_argument("--resolution", default="400x400")
    ap.add_argument("--max-scenes", type=int, default=8)
    ap.add_argument("--max-objects", type=int, default=3)
    ap.add_argument("--init-jitter", default="0,0")
    ap.add_argument("--restarts", type=int, default=0)
    ap.add_argument("--argmin-rule", default="best_step",
                    choices=("best_step", "last_step"),
                    help="pose selection: argmin over the full (step, "
                         "hypothesis) loss history (default) or the "
                         "reference's last-step rule")
    ap.add_argument("--levels", default=None,
                    help="comma-separated level subset (default: all three)")
    args = ap.parse_args()

    from diffdope_tpu.bop import sweep_perturbation_levels

    standins = REPO / "data" / "standins"
    if not (standins / "standin_asym.ply").exists():
        import subprocess

        subprocess.run(
            [sys.executable, str(REPO / "tools" / "make_standins.py"),
             str(standins)],
            check=True,
        )

    mesh_paths = {
        "alphabetsoup": "/root/reference/data/example/mesh/AlphabetSoup.ply",
        "asym": str(standins / "standin_asym.ply"),
        "sym": str(standins / "standin_sym.ply"),
    }

    if args.fast:
        proto = dict(batchsize=8, nb_iterations=8, resolution=(96, 96),
                     max_scenes=1, max_objects=2)
    else:
        h, w = (int(v) for v in args.resolution.split("x"))
        proto = dict(batchsize=args.batchsize,
                     nb_iterations=args.iterations, resolution=(h, w),
                     max_scenes=args.max_scenes, max_objects=args.max_objects)

    config = dict(
        optimizer="sgd", base_lr=5.0, lr_bounds=(0.01, 100.0),
        loss_weights=(0.7, 0.0, 1.0), seed=0,
        init_jitter=tuple(float(v) for v in args.init_jitter.split(",")),
        restarts=args.restarts, argmin_rule=args.argmin_rule,
        **proto,
    )
    if args.levels:
        config["levels"] = args.levels.split(",")

    results = {}
    t_start = time.time()
    for dataset in args.datasets.split(","):
        results[dataset] = {}
        for mesh_name in args.meshes.split(","):
            print(f"=== {dataset} / {mesh_name} ===", flush=True)
            t0 = time.time()
            r = sweep_perturbation_levels(
                dataset=dataset, mesh_path=mesh_paths[mesh_name],
                # line-flushed so redirected logs show live progress (the
                # sweep runs tens of minutes; block buffering hides it)
                log_fn=lambda *a: print(*a, flush=True),
                **config
            )
            cell = {}
            for level, v in r.items():
                cell[level] = {
                    k: v[k] for k in (
                        "n", "add_mean", "add_med", "acc_01d", "auc_01d",
                        "adds_acc_01d", "adds_auc_01d", "mode",
                        "add_init_mean", "acc_01d_init",
                    )
                }
                # worst scan telemetry across the cell's refinements
                # (0/absent = clean renders)
                for tk in ("bin_overflow_max", "crop_leak_max"):
                    worst = max(
                        (o.get(tk, 0) for o in v["per_object"]), default=0
                    )
                    if worst:
                        cell[level][tk] = int(worst)
            results[dataset][mesh_name] = cell
            print(f"    ({time.time() - t0:.0f}s)", flush=True)

    payload = {
        "protocol": {
            **{k: (list(v) if isinstance(v, tuple) else v)
               for k, v in config.items()},
            "note": (
                "synthesized protocol: JSON pose = gt rendered with the "
                "stand-in mesh; init = gt perturbed by the level's own "
                "magnitudes (diffdope_tpu/bop.py docstring)"
            ),
        },
        "wall_s": round(time.time() - t_start, 1),
        "results": results,
    }
    Path(args.out).write_text(json.dumps(payload, indent=1))
    print(f"wrote {args.out}")

    lines = [
        "# SWEEP_r05 — synthesized accuracy matrix",
        "",
        f"Protocol: sgd base_lr=5, loss scales [0.01,100] (reference "
        f"bounds), rgb+mask (0.7/1.0), {proto['nb_iterations']} iterations, "
        f"B={proto['batchsize']}, {proto['resolution'][0]}x"
        f"{proto['resolution'][1]}, init_jitter={config['init_jitter']}, "
        f"restarts={config['restarts']}, "
        f"argmin_rule={config['argmin_rule']}. Generated by "
        f"tools/run_sweep_matrix.py ({payload['wall_s']}s on-device).",
        "",
        "'init acc' is the zero-iteration CONTROL column (the init pose "
        "scored by the same metric): the refiner must not lose cases the "
        "init already had — per-cell ADD acc >= init acc is the "
        "regression guard.",
        "",
        "| dataset | mesh | level | n | ADD mean | ADD acc@0.1d | "
        "init acc | ADD AUC | ADD-S acc@0.1d | ADD-S AUC |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for ds, per_mesh in results.items():
        for mesh_name, cell in per_mesh.items():
            for level, v in cell.items():
                init_acc = (
                    f"{v['acc_01d_init']:.3f}"
                    if v.get("acc_01d_init") is not None else "-"
                )
                lines.append(
                    f"| {ds} | {mesh_name} | {level} | {v['n']} | "
                    f"{v['add_mean']:.4f} | {v['acc_01d']:.3f} | "
                    f"{init_acc} | "
                    f"{v['auc_01d']:.3f} | {v['adds_acc_01d']:.3f} | "
                    f"{v['adds_auc_01d']:.3f} |"
                )
    Path(args.md).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.md}")


if __name__ == "__main__":
    main()
