"""Test configuration: run on a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated with
xla_force_host_platform_device_count (SURVEY.md §4). Note: the axon TPU plugin in this
image overrides the JAX_PLATFORMS env var, so we must force CPU through jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent compile cache keyed by the HOST CPU (utils/cache.py): XLA:CPU
# AOT artifacts record the compile machine's features, and loading an entry
# produced on a different host SIGILLs mid-suite (observed as random
# segfaults in backend_compile_and_load when /tmp survived a host change).
import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pointnerf_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# ---------------------------------------------------------------- fast/slow
# The FULL suite runs ~17 min SERIAL on this host and does NOT fit a
# 10-minute window; run it in parts, and never as parallel pytest batches —
# they starve each other on the shared virtual 8-device mesh. `pytest -m
# fast` covers everything but the multi-second driver/parity tests in
# < 5 min. Names measured with --durations (>= ~7 s marked slow).
_SLOW_TESTS = {
    "test_macro_driver_recorded_psnr",
    "test_train_ft_multichip_matches_single_chip",
    "test_gen_points_probnet_mode",
    "test_editing_driver_composite",
    "test_depth_consistency_with_gen_points",
    "test_render_image_stacked_matches_map",
    "test_train_ft_end_to_end",
    "test_train_ft_superset_query_quality",
    "test_train_ft_on_scannet_depth_init",
    "test_nn_neg1_driver_end_to_end",
    "test_ray_chunked_grads_match_unchunked",
    "test_gen_points_filter_embeddings_e2e",
    "test_feedforward_inference",
    "test_generalizable_training_steps",
    "test_fused_shade_parity",
    "test_fused_trunk_forward_and_grad_parity",
    "test_feedforward_inference_frustum",
    "test_generalizable_training_frustum",
    "test_fused_trunk_order1_parity",
    "test_render_forward_frustum_mode",
    "test_ray_chunked_depth_bg_losses_match_unchunked",
    "test_render_image_overflow_retry_is_exact",
    "test_train_ft_plane_bg_e2e",
    "test_sr_budget_compaction_batched_matches_per_camera",
    "test_render_image_mesh_serving_matches_single_chip",
    "test_dp_train_step_matches_single_chip",
    "test_sr_budget_compaction_matches_full",
    "test_recorded_psnr_regression",
    "test_points_sharded_step_matches_single_chip",
    "test_official_mvsnet_ckpt_roundtrip_parity",
    "test_mvsnet_forward_shapes",
    "test_render_vid",
    "test_gen_points_mode0_lands_on_plate",
    "test_superset_adoption_above_surface",
    "test_superset_query_matches_direct_when_capacity_suffices",
    "test_refine_ray_generation",
    "test_frustum_prebuilt_grid_fast_path_exact",
    "test_fused_trunk_bf16_close_to_f32",
    "test_gen_points_multi_depth_view",
    "test_overfit_decreases_loss",
    "test_comp_groups_matches_global_compaction",
    "test_comp_groups_shards_shade_phase",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)
