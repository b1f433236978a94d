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
