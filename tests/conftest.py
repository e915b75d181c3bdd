"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a fake 8-device CPU mesh
(``xla_force_host_platform_device_count``), the standard JAX substitute for
multi-chip hardware. The environment pins ``JAX_PLATFORMS=axon`` (the real
TPU tunnel) via sitecustomize, so we must override through
``jax.config.update`` — env vars alone are not honored — and XLA flags must
be set before the CPU backend initializes (it is lazy, so doing both here is
safe as long as no test imports jax before conftest runs).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: tiny-model jits dominate test wall time;
# caching them across runs cuts the suite from tens of minutes to ~1.
jax.config.update("jax_compilation_cache_dir", "/tmp/dbsr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# ---------------------------------------------------------------------------
# Two-tier suite (VERDICT r3 #6): `pytest -m "not slow"` is the fast inner
# loop (~5 min); the full sweep (everything, ~15-20 min standalone) remains
# the round gate. Slow tests (>=~8 s standalone, mostly full-model compiles
# and e2e drives) are marked centrally here by nodeid suffix so the tier
# assignment lives in one reviewable place. No test is ever skipped by
# default — only by explicit `-m "not slow"`.
import pytest  # noqa: E402

SLOW_TESTS = {
    "test_flow_pretrain.py::test_burst_flow_net_shape_and_actor",
    "test_flow_pretrain.py::test_graft_alignment_params",
    "test_flow_pretrain.py::test_graft_rejects_incompatible",
    "test_flow_pretrain.py::test_probe_params_artifact_roundtrip",
    "test_flow_pretrain.py::test_flow_target_sign_aligns_frames",
    "test_parallel.py::test_dbsr_frame_sharded_matches_dense",
    "test_parallel.py::test_dbsr_frame_sharded_even_split",
    "test_parallel.py::test_dbsr_frame_sharded_two_axis_data_x_frame",
    "test_parallel.py::test_multihost_two_process_cpu",
    "test_training.py::test_val_loader_epoch_interval",
    "test_training.py::test_trainer_with_mesh",
    "test_training.py::test_training_decreases_loss",
    "test_training.py::test_cli_main_smoke_tiny",
    "test_training.py::test_training_resume",
    "test_training.py::test_checkpoint_roundtrip_with_dtype",
    "test_training.py::test_mid_epoch_divergence_aborts_cycle",
    "test_training.py::test_masked_adam_drops_frozen_moments",
    "test_models.py::test_dbsr_train_alignment_grads_flow",
    "test_models.py::test_dbsr_tiny_grad_flows_but_not_into_frozen_flownet",
    "test_models.py::test_dbsr_tiny_forward_shapes",
    "test_models.py::test_ref_offset_noise",
    "test_models.py::test_fused_s2d_decoder_exactness",
    "test_eval.py::test_batched_scores_independent_of_batch_size",
    "test_eval.py::test_trajectory_matches_per_epoch_scores",
    "test_eval.py::test_compute_score_runs",
    "test_eval.py::test_saved_results_match_recomputed",
    "test_eval.py::test_visualize_writes_panels_and_viewer",
    "test_eval.py::test_burst_size_override",
    "test_full_network_parity.py::test_dbsrnet_end_to_end_parity",
    "test_full_network_parity.py::test_pwcnet_end_to_end_parity",
    "test_burstsr.py::test_burstsr_eval_end_to_end",
    "test_burstsr.py::test_default_realworld_config_end_to_end",
    "test_interp.py::test_backwarp_matmul_matches_gather_f32",
    "test_interp.py::test_backwarp_matmul_grad_matches_gather",
    "test_procedural.py::test_pool_refresh_and_reuse",
    "test_procedural.py::test_pool_prepare_fn_synthesizes",
    "test_procedural.py::test_trainer_runs_on_pool",
    "test_procedural.py::test_generator_family_valid_images",
    "test_convert_pwcnet.py::test_converted_tree_matches_flax_init_shapes",
    "test_synthetic.py::test_shapes",
    "test_align_lite.py::test_graft_lite_into_dbsrnet",
    "test_align_lite.py::test_shapes_pyramid_and_actor",
    "test_align_lite.py::test_learns_fixed_batch_fast",
    "test_procedural.py::test_mixed_pool_refresh",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = "::".join(item.nodeid.split("/")[-1].split("::")[:2])
        if key in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
