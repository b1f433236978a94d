"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(hypothesis batch over a jax.sharding.Mesh) are exercised without TPU
hardware.  The env vars must be in force before jax initializes.

This image's sitecustomize (``/root/.axon_site`` on PYTHONPATH) imports jax
and registers the TPU tunnel plugin at *interpreter startup* — before this
conftest runs — so from a default shell the flags below would be set too
late and the "CPU" suite would silently run through the TPU tunnel (slow,
and spuriously failing).  When that is detected, pytest re-execs itself in a
scrubbed environment (from pytest_configure, after suspending output
capture so the child's report streams through); if the scrub somehow fails
to take, abort loudly with the manual incantation instead of running on the
wrong backend.
"""

import os
import sys

_SCRUBBED_ENV = {
    "PYTHONPATH": "",
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}
_MANUAL_FIX = (
    "run the suite as: env PYTHONPATH= JAX_PLATFORMS=cpu "
    "XLA_FLAGS=--xla_force_host_platform_device_count=8 python -m pytest tests/"
)

_NEEDS_REEXEC = "jax" in sys.modules

if _NEEDS_REEXEC:
    if os.environ.get("_DD_CONFTEST_REEXEC"):
        raise RuntimeError(
            "conftest: jax is pre-imported even after a scrubbed re-exec; " + _MANUAL_FIX
        )
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _xla_flags:
        os.environ["XLA_FLAGS"] = (
            _xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_enable_x64", False)

    if jax.default_backend() != "cpu":
        raise RuntimeError(
            f"conftest: suite initialized on backend {jax.default_backend()!r}, "
            "not 'cpu' — refusing to run on the wrong backend; " + _MANUAL_FIX
        )


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    # Release pytest's fd-level capture so the re-exec'd run's output
    # reaches the terminal instead of a doomed capture tempfile.
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    env = {**os.environ, **_SCRUBBED_ENV, "_DD_CONFTEST_REEXEC": "1"}
    argv = [sys.executable, "-m", "pytest", *config.invocation_params.args]
    sys.stderr.write(
        "conftest: jax pre-imported by sitecustomize — re-exec'ing pytest with "
        f"a scrubbed env ({' '.join(f'{k}={v}' for k, v in _SCRUBBED_ENV.items())})\n"
    )
    sys.stderr.flush()
    os.execve(sys.executable, argv, env)


# ---------------------------------------------------------------------------
# slow-test marking: the full suite takes ~20 min on CPU (pallas interpret
# mode); `-m "not slow"` keeps a <3 min fast pass for iteration while CI
# runs everything.  Centralized here (by test name, parametrizations
# included) so heavy additions only need a one-line entry.
# ---------------------------------------------------------------------------

_SLOW_TESTS = {
    # >= ~10s call time on the 8-device CPU mesh (pytest --durations)
    "test_cropped_loss_matches_fullframe",
    "test_spanning_op_matches_chained",
    "test_restarts_segmented_identical",
    "test_multi_block_grid_fwd_and_vjp",
    "test_cropped_raster_bit_equals_fullframe_slice",
    "test_compact_gradients_match",
    "test_sharded_fused_loss_matches_unsharded",
    "test_fused_texture_matches_unfused",
    "test_refine_with_fused_loss",
    "test_fused_loss_path_matches_unfused",
    "test_shard_map_runs_local_batch",
    "test_texture_crop_matches_full",
    "test_fused_loss_matches",
    "test_fused_matches_unfused",
    "test_refine_bop_frame",
    "test_compact_matches_binned",
    "test_pose_gradients_match",
    "test_sharded_matches_unsharded",
    "test_bin_overflow_telemetry",
    "test_outputs_match",
    "test_texture_map_refinement",
    "test_v3_matches_v2_gradients",
    "test_vertex_color_refinement",
    "test_texture_appearance_writeback",
    "test_appearance_writeback",
    "test_planar_kernel_exact_on_shared_coefficients",
    "test_render_bit_equal",
    "test_gradient_matches_fd",
    "test_pose_recovery_translation",
    "test_sharded_appearance_matches_unsharded",
    "test_sweep_real_mode",
    "test_pose_gradients_nonzero",
    "test_compact_overflow_degrades_gracefully",
    "test_refine_with_restarts",
    "test_closed_mesh_cull_is_exact",
    "test_gradients_finite_everywhere",
    "test_v3_matches_v2_outputs",
    "test_pose_recovery_rotation",
    "test_area_rate_matches_analytic",
    "test_interior_shared_edge_is_noop",
    "test_overflow_auto_recovery",
    "test_overflow_recovery_disabled_warns_only",
    # 3-10s tier (second pruning pass)
    "test_history_shapes_and_argmin",
    "test_gradient_not_truncated_with_auto",
    "test_bary_gradients_match_fd",
    "test_ids_and_rows_match_reference",
    "test_v2_eval_variants_match",
    "test_batched_poses_differ",
    "test_ids_match_reference",
    "test_v2_lean_eval_matches",
    "test_grad_matches_plain_gather",
    "test_v2_qrows_variants_match",
    "test_validated_reading_equals_ours",
    "test_mip_gradients_flow",
    "test_empty_image_is_noop",
    "test_exact_level_matches_direct_bilinear",
    "test_uv_gradients",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(_pytest.mark.slow)
