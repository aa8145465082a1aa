"""Test configuration: hermetic 8-device CPU mesh.

Multi-chip sharding tests run the same pjit programs on a virtual CPU mesh
(XLA_FLAGS host platform device count), per SURVEY.md §4.  Benchmarks
(bench.py) run on the real TPU chip instead.

Note: the TPU platform plugin in this environment ignores JAX_PLATFORMS from
the environment, so the CPU backend is forced via jax.config before any
device use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# Modules dominated by 8-device-mesh jits or end-to-end generation; everything
# here is `-m slow`, so `pytest -m "not slow"` is the ~2-min unit tier.
_SLOW_MODULES = {
    "test_parallel", "test_train_loop", "test_engine", "test_server",
    "test_golden", "test_longform", "test_apps", "test_checkpoint",
    "test_checkpoint_rehearsal", "test_semantic_e2e",
}

# Individual compile-heavy tests (>6 s on a 1-CPU host) from otherwise-fast
# modules; test_import.py::test_imported_model_runs stays in the fast tier as
# the integration smoke test (full model forward off a converted checkpoint).
_SLOW_TESTS = {
    "test_generate_long_prompt_uses_chunked_prefill",
    "test_parity_with_hf_qwen2_bf16",
    "test_quantized_conv_kernels_decode_parity",
    "test_prefill_chunked_matches_single_shot",
    "test_generate_runs_and_shapes",
    "test_max_steps_per_sample_ragged_batch",
    "test_int4_sharding_specs_cover_leaves",
    "test_streaming_decode_equals_batch",
    "test_encode_unaligned_length",
    "test_int4_pallas_kernel_matches_xla_interpret",
    "test_int4c_pallas_kernel_matches_xla_interpret",
    "test_zero_init_output_is_zero",
    "test_quantized_lm_forward_close_to_dense",
    "test_vae_sampling_modes",
    "test_quantized_diffusion_head_error_bounded",
    "test_flash_matches_reference_causal",
    "test_parity_with_hf_qwen2_gqa_geometries",
    "test_parity_with_hf_qwen2",
    "test_decode_matches_full_forward",
    "test_left_padding_equivalence",
    "test_write_pointer_cache_semantics",
    "test_bf16_generate_with_quantized_tokenizer_keeps_carry_dtype",
    "test_quantized_tokenizer_error_bounded",
    "test_external_stream_end_aborts_one_sample",
    "test_generate_batch_and_determinism",
    "test_negative_prompt_ids_change_cfg",
    "test_negative_prompt_ragged_batch",
    "test_int4_diffusion_head_error_bounded",
    "test_int4_lm_forward_close_to_dense",
    "test_prefill_pallas_matches_xla",
    "test_semantic_encoder",
    "test_quantize_lm_params_per_layer_gate",
    "test_precomputed_modulations_match_apply",
    "test_top_k_sampling",
    "test_save_pretrained_roundtrip",
    "test_generate_with_voice_prompt",
    "test_encode_decode_shapes",
    "test_streaming_encode_equals_batch",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__ in _SLOW_MODULES
                or item.originalname in _SLOW_TESTS):
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
