"""BOP perturbation-sweep driver scaffolding (bundled-JSON walking,
level parsing, per-level aggregation).  The device-side refinement inside
the sweep is exercised by tests/test_bop.py and the fused-loss tests; here
the per-object worker is stubbed so the sweep logic runs host-only."""

import numpy as np
import pytest

from diffdope_tpu import bop


def test_parse_level():
    assert bop.parse_level("deg_001_trans_001") == (1.0, 1.0)
    assert bop.parse_level("deg_040_trans_016") == (40.0, 16.0)


def test_find_error_scenes_bundled():
    scenes = bop.find_error_scenes("/root/reference/data", "hope")
    assert len(scenes) >= 1
    scene_id, levels = scenes[0]
    assert scene_id.startswith("val/")
    assert set(levels) <= set(bop.PERTURBATION_LEVELS)
    for p in levels.values():
        assert p.exists()


def test_sweep_aggregation(monkeypatch):
    calls = []

    def fake_synth(objs, level, scene_id, frame, *a, **k):
        calls.append((level, scene_id, frame, len(objs)))
        rng = np.random.default_rng(len(calls))
        return [
            {
                "scene": scene_id, "frame": frame, "i_obj": i,
                "obj_id": int(o.get("obj_id", -1)),
                "add": float(rng.uniform(0.001, 0.05)),
                "adds": float(rng.uniform(0.001, 0.05)),
                "diameter": 1.0, "final_loss": 0.1,
            }
            for i, o in enumerate(objs)
        ]

    monkeypatch.setattr(bop, "_sweep_synth_objects", fake_synth)
    results = bop.sweep_perturbation_levels(
        dataset="hope",
        levels=["deg_001_trans_001", "deg_040_trans_016"],
        max_scenes=2, max_frames=1, max_objects=2,
        log_fn=lambda *a: None,
    )
    assert set(results) == {"deg_001_trans_001", "deg_040_trans_016"}
    for r in results.values():
        assert r["mode"] == "synthesized"
        assert r["n"] == sum(c[3] for c in calls) / 2
        assert 0.0 <= r["auc_01d"] <= 1.0
        assert 0.0 <= r["acc_01d"] <= 1.0
        assert r["add_mean"] > 0
        assert len(r["per_object"]) == r["n"]


def test_sweep_shard_partition():
    all_scenes = bop.find_error_scenes("/root/reference/data", "ycbv")
    s0 = all_scenes[0::2]
    s1 = all_scenes[1::2]
    ids = {s for s, _ in s0} | {s for s, _ in s1}
    assert len(ids) == len(all_scenes)
    assert not ({s for s, _ in s0} & {s for s, _ in s1})


def test_sweep_overflow_recovery(monkeypatch):
    """On scan-carried _bin_overflow, the sweep worker must escalate the
    compact bin capacity, re-run the SAME object, and persist the
    escalation so the next object starts at the boosted capacity — the
    sweep-path analogue of DiffDope.run_optimization's recovery loop.
    A crop leak must force roi_crop='off' the same way."""
    import numpy as np

    from diffdope_tpu import geometry as geo
    from diffdope_tpu.optimize import RefineResult

    boosts_used = []

    def fake_ctx(mesh_path, resolution, batchsize, nb_iterations, obj_scale,
                 seed, optimizer="adam", base_lr=0.02, lr_bounds=(0.5, 4.0),
                 loss_weights=(0.7, 0.0, 1.0), init_jitter=(0.0, 0.0),
                 capacity_boost=1.0, roi_crop="auto", probe_dz=0.2):
        steps = nb_iterations + 1

        def jit_refine(p0, gt=None, learning_rates=None):
            boosts_used.append((capacity_boost, roi_crop))
            # capacity 1.0 overflows; the boosted re-run is clean
            over = np.zeros(steps, np.int32)
            leak = np.zeros(steps, np.int32)
            if capacity_boost == 1.0:
                over[-1] = 123
            if roi_crop != "off":
                leak[0] = 7
            return RefineResult(
                params={k: np.asarray(v) for k, v in p0.items()},
                mtx_history=np.tile(np.eye(4, dtype=np.float32),
                                    (steps, batchsize, 1, 1)),
                losses_values={"total": np.ones((steps, batchsize),
                                                np.float32)},
                total_loss=np.ones(steps, np.float32),
                telemetry={"_bin_overflow": over, "_crop_leak": leak},
            )

        return dict(
            geo=geo,
            gt_render=lambda q, t: (
                {"rgb": np.zeros((4, 4, 3), np.float32),
                 "segmentation": np.zeros((4, 4), np.float32),
                 "depth": np.zeros((4, 4), np.float32)},
                np.eye(4, dtype=np.float32),
            ),
            pose_params=lambda q, t, b: {"q": np.tile(q, (b, 1)),
                                         "t": np.tile(t, (b, 1))},
            jitter=None, jit_refine=jit_refine,
            argmin_sb=lambda losses, rule: (0, 0),
            score=lambda m_est, m_gt: (0.01, 0.01),
            init_mtx=lambda q, t: np.eye(4, dtype=np.float32),
            diameter=1.0, lrs=np.ones(batchsize, np.float32),
            weights={"total": 1.0},
        )

    monkeypatch.setattr(bop, "_synth_context", fake_ctx)
    bop._synth_escalation.clear()
    objs = [{"cam_R_m2c": np.eye(3).ravel().tolist(), "obj_id": 1},
            {"cam_R_m2c": np.eye(3).ravel().tolist(), "obj_id": 2}]
    out = bop._sweep_synth_objects(
        objs, "deg_040_trans_016", "s", "0", "fake.ply", 0.01,
        (4, 4), 2, 3, 0, lambda *a: None,
    )
    assert len(out) == 2
    # object 0: degraded attempt at boost 1.0, then escalated re-run(s);
    # object 1: starts directly at the persisted escalation, no overflow
    assert boosts_used[0] == (1.0, "auto")
    assert boosts_used[-1][0] > 1.0 and boosts_used[-1][1] == "off"
    esc = next(iter(bop._synth_escalation.values()))
    assert esc["boost"] > 1.0 and esc["roi_crop"] == "off"
    # the clean (escalated) runs must carry no residual telemetry flags
    assert all(not any(k.endswith("_max") for k in e) for e in out)
    bop._synth_escalation.clear()
