"""Long-form generation: bucketed KV-cache growth (SURVEY.md §5.7 path)."""

import numpy as np

import jax
import jax.numpy as jnp

from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.generation import VibeVoiceGenerator
from vibevoice_tpu.models import vibevoice

CFG = VibeVoiceConfig.named("tiny")


class TinyTokenizer:
    eos_id = 3
    speech_start_id = 10
    speech_end_id = 11
    speech_diffusion_id = 12
    pad_id = 4


def test_cache_growth_long_run():
    params = vibevoice.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    gen = VibeVoiceGenerator(params, CFG, TinyTokenizer(),
                             ddpm_inference_steps=3, lm_dtype=jnp.float32)
    tk = TinyTokenizer()
    # force every sampled token to be a diffusion frame so the run spans
    # multiple cache buckets (random weights would hit EOS immediately)
    gen.valid_ids = jnp.full_like(gen.valid_ids, tk.speech_diffusion_id)
    ids = np.random.RandomState(0).randint(20, 200, (1, 16))
    ids[:, -1] = tk.speech_start_id

    out = gen.generate(ids, cfg_scale=1.2, max_new_tokens=700,
                       max_length_times=1000.0, chunk_steps=32, seed=1)
    # every budgeted step vocoded a frame (max_new_tokens=700; the tail of the
    # last chunk is past the per-sample budget and emits forced EOS)
    assert out.speech_outputs[0] is not None
    assert len(out.speech_outputs[0]) == 700 * CFG.acoustic_tokenizer.total_stride
    # multiple cache buckets were compiled (initial + >=1 growth)
    cache_lens = {key[-1] for key in gen._chunk_jit.keys()}
    assert len(cache_lens) >= 2, cache_lens
    assert out.sequences.shape[1] == 704  # 700 rounded up to chunk multiple
    assert set(np.unique(out.sequences)) <= {tk.speech_diffusion_id, tk.eos_id}
    assert int((out.sequences == tk.speech_diffusion_id).sum()) == 700


def test_growth_preserves_prefix_behavior():
    """First-chunk outputs must match between a short run (no growth) and a
    long run (with growth) — padding is fully masked out of attention."""
    params = vibevoice.init_params(jax.random.PRNGKey(1), CFG, jnp.float32)
    tk = TinyTokenizer()
    ids = np.random.RandomState(1).randint(20, 200, (1, 16))
    ids[:, -1] = tk.speech_start_id

    gen1 = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=3,
                              lm_dtype=jnp.float32)
    out_short = gen1.generate(ids, cfg_scale=1.2, max_new_tokens=32,
                              max_length_times=1000.0, chunk_steps=16, seed=9)
    gen2 = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=3,
                              lm_dtype=jnp.float32)
    out_long = gen2.generate(ids, cfg_scale=1.2, max_new_tokens=400,
                             max_length_times=1000.0, chunk_steps=16, seed=9)
    n = out_short.sequences.shape[1]
    np.testing.assert_array_equal(out_short.sequences[:, :16],
                                  out_long.sequences[:, :16])


def test_cache_growth_kv_quant():
    """Cache growth with an int8 cache: the rank-5 [L,B,Hkv,1,S] scale
    leaves grow on their LAST axis (slot), not axis 3 — and the grown run's
    prefix equals the ungrown run's."""
    params = vibevoice.init_params(jax.random.PRNGKey(2), CFG, jnp.float32)
    tk = TinyTokenizer()
    ids = np.random.RandomState(2).randint(20, 200, (1, 16))
    ids[:, -1] = tk.speech_start_id
    kw = dict(cfg_scale=1.2, max_length_times=1000.0, chunk_steps=16, seed=4)

    gen1 = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=3,
                              lm_dtype=jnp.float32, kv_quant=True)
    # force diffusion frames on BOTH runs so the long run spans cache buckets
    # and the prefix comparison is apples-to-apples
    gen1.valid_ids = jnp.full_like(gen1.valid_ids, tk.speech_diffusion_id)
    out_short = gen1.generate(ids, max_new_tokens=16, **kw)
    gen2 = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=3,
                              lm_dtype=jnp.float32, kv_quant=True)
    gen2.valid_ids = jnp.full_like(gen2.valid_ids, tk.speech_diffusion_id)
    out_long = gen2.generate(ids, max_new_tokens=400, **kw)

    # growth actually happened, with consistent quantized-cache geometry
    cache_lens = {key[-1] for key in gen2._chunk_jit.keys()}
    assert len(cache_lens) >= 2, cache_lens
    np.testing.assert_array_equal(out_short.sequences[:, :16],
                                  out_long.sequences[:, :16])


def test_auto_w8a8_prefill_token_parity():
    """The long-prompt serving default (AUTO quantized-compute prefill,
    generate.py _use_w8a8_prefill) must produce the same tokens as the
    bf16-prefill escape hatch on a quantized stack — the accuracy gate for
    promoting W8A8 prefill from env-flag to default (r4 VERDICT #2)."""
    from vibevoice_tpu.ops.quant import quantize_lm_params

    params = vibevoice.init_params(jax.random.PRNGKey(3), CFG, jnp.bfloat16)
    params = dict(params)
    params["lm"] = quantize_lm_params(params["lm"])
    tk = TinyTokenizer()
    ids = np.random.RandomState(3).randint(20, 200, (1, 96))
    ids[:, -1] = tk.speech_start_id
    kw = dict(cfg_scale=1.2, max_new_tokens=24, max_length_times=1000.0,
              chunk_steps=8, seed=7)

    outs = {}
    for name, flag in (("auto", None), ("off", False)):
        gen = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=3,
                                 prefill_w8a8=flag)
        gen.prefill_chunk = 32          # 96-token prompt counts as "long"
        if name == "auto":
            assert gen._use_w8a8_prefill(96) and not gen._use_w8a8_prefill(16)
        outs[name] = gen.generate(ids, **kw)
    np.testing.assert_array_equal(outs["auto"].sequences,
                                  outs["off"].sequences)

    # dense stacks never auto-enable (on-the-fly weight quantization would
    # be slower AND lossy)
    dense = vibevoice.init_params(jax.random.PRNGKey(3), CFG, jnp.bfloat16)
    gden = VibeVoiceGenerator(dense, CFG, tk, ddpm_inference_steps=3)
    gden.prefill_chunk = 32
    assert not gden._use_w8a8_prefill(96)
