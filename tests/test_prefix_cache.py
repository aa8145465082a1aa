"""Voice-prompt prefix cache (generation/prefix_cache.py).

Serving deployments reuse the same voices across many scripts; the cache
stores the voice section's finished K/V so repeat requests skip the acoustic
encode and prefix LM forward.  Contract under test:

  * a HIT is bitwise identical to the MISS that populated it (tokens + audio);
  * with deterministic latents the prefix path equals the FULL prefill path
    token-for-token (the transplant + suffix prefill is numerically exact);
  * int8-KV caches transplant correctly too;
  * ineligible prompts (no voice section, batched rows) fall back silently;
  * the LRU store evicts beyond capacity and keys on audio content.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.generation import VibeVoiceGenerator
from vibevoice_tpu.generation.prefix_cache import PrefixCache
from vibevoice_tpu.models import vibevoice

CFG = VibeVoiceConfig.named("tiny")
FRAME = CFG.acoustic_tokenizer.total_stride


class TinyTokenizer:
    eos_id = 3
    speech_start_id = 10
    speech_end_id = 11
    speech_diffusion_id = 12
    pad_id = 4

    def encode(self, text, add_special_tokens=False):
        return [ord(c) % 200 + 20 for c in text]


def _voice_prompt(t=16, seed=0, n_slots=3):
    """Prompt with the processor's voice-section layout: speech_start,
    diffusion pads, speech_end, a trailing text token, then the script."""
    tk = TinyTokenizer()
    rs = np.random.RandomState(seed)
    ids = rs.randint(20, 200, (1, t))
    ids[0, 2] = tk.speech_start_id
    ids[0, 3:3 + n_slots] = tk.speech_diffusion_id
    ids[0, 3 + n_slots] = tk.speech_end_id
    ids[0, -1] = tk.speech_start_id
    smask = np.zeros((1, t), bool)
    smask[0, 3:3 + n_slots] = True
    speech = rs.randn(1, n_slots * FRAME).astype(np.float32) * 0.1
    sp_masks = np.ones((1, n_slots), bool)
    return ids, smask, speech, sp_masks


def _gen_kwargs(smask, speech, sp_masks, seed=3):
    return dict(speech_tensors=speech, speech_masks=sp_masks,
                speech_input_mask=smask, cfg_scale=1.5,
                max_new_tokens=12, chunk_steps=4, seed=seed)


@pytest.fixture(scope="module")
def params():
    return vibevoice.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)


@pytest.mark.slow
def test_hit_matches_miss_bitwise(params):
    gen = VibeVoiceGenerator(params, CFG, TinyTokenizer(),
                             ddpm_inference_steps=4, lm_dtype=jnp.float32,
                             prefix_cache=2)
    ids, smask, speech, sp_masks = _voice_prompt()
    kw = _gen_kwargs(smask, speech, sp_masks)
    out_miss = gen.generate(ids, **kw)
    assert gen.prefix_cache.misses == 1 and gen.prefix_cache.hits == 0
    assert gen.last_metrics["prefix_cache_hit"]["total_s"] == 0.0
    out_hit = gen.generate(ids, **kw)
    assert gen.prefix_cache.hits == 1
    assert gen.last_metrics["prefix_cache_hit"]["total_s"] == 1.0
    assert "prefix_prefill" not in gen.last_metrics

    np.testing.assert_array_equal(out_miss.sequences, out_hit.sequences)
    a, b = out_miss.speech_outputs[0], out_hit.speech_outputs[0]
    assert (a is None) == (b is None)
    if a is not None:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_prefix_path_matches_full_prefill(params):
    """With deterministic latents (std_dist_type='none') the transplant +
    suffix prefill must reproduce the full prefill token-for-token."""
    cfg = dataclasses.replace(
        CFG, acoustic_tokenizer=dataclasses.replace(
            CFG.acoustic_tokenizer, std_dist_type="none"))
    plain = VibeVoiceGenerator(params, cfg, TinyTokenizer(),
                               ddpm_inference_steps=4, lm_dtype=jnp.float32)
    pfx = VibeVoiceGenerator(params, cfg, TinyTokenizer(),
                             ddpm_inference_steps=4, lm_dtype=jnp.float32,
                             prefix_cache=2)
    ids, smask, speech, sp_masks = _voice_prompt()
    kw = _gen_kwargs(smask, speech, sp_masks)
    out_plain = plain.generate(ids, **kw)
    out_pfx = pfx.generate(ids, **kw)
    assert pfx.prefix_cache.misses == 1
    np.testing.assert_array_equal(out_plain.sequences, out_pfx.sequences)


@pytest.mark.slow
def test_kv_quant_hit_matches_miss(params):
    gen = VibeVoiceGenerator(params, CFG, TinyTokenizer(),
                             ddpm_inference_steps=4, lm_dtype=jnp.float32,
                             prefix_cache=2, kv_quant=True)
    ids, smask, speech, sp_masks = _voice_prompt()
    kw = _gen_kwargs(smask, speech, sp_masks)
    out1 = gen.generate(ids, **kw)
    out2 = gen.generate(ids, **kw)
    assert gen.prefix_cache.hits == 1 and gen.prefix_cache.misses == 1
    np.testing.assert_array_equal(out1.sequences, out2.sequences)


@pytest.mark.slow
def test_ineligible_prompts_fall_back(params):
    gen = VibeVoiceGenerator(params, CFG, TinyTokenizer(),
                             ddpm_inference_steps=4, lm_dtype=jnp.float32,
                             prefix_cache=2)
    tk = TinyTokenizer()
    # no voice section -> full prefill, store untouched
    rs = np.random.RandomState(7)
    ids = rs.randint(20, 200, (1, 12))
    ids[0, -1] = tk.speech_start_id
    out = gen.generate(ids, cfg_scale=1.3, max_new_tokens=8, chunk_steps=4,
                       seed=0)
    assert out.sequences.shape[0] == 1
    assert gen.prefix_cache.misses == 0 and len(gen.prefix_cache) == 0

    # batched rows -> full prefill (the cache serves b=1 requests)
    ids1, smask1, speech1, sp1 = _voice_prompt(seed=1)
    ids_b = np.concatenate([ids1, ids1], axis=0)
    smask_b = np.concatenate([smask1, smask1], axis=0)
    speech_b = np.concatenate([speech1, speech1], axis=0)
    sp_b = np.concatenate([sp1, sp1], axis=0)
    out_b = gen.generate(ids_b, speech_tensors=speech_b, speech_masks=sp_b,
                         speech_input_mask=smask_b, cfg_scale=1.5,
                         max_new_tokens=8, chunk_steps=4, seed=0)
    assert out_b.sequences.shape[0] == 2
    assert len(gen.prefix_cache) == 0


def test_lru_eviction_and_key_content():
    pc = PrefixCache(capacity=2)
    ids = np.arange(4, dtype=np.int64)
    sp = np.zeros((1, 8), np.float32)
    sm = np.ones((1, 2), bool)
    k1 = pc.key(ids, sp, sm, False)
    k2 = pc.key(ids, sp + 1e-3, sm, False)      # audio bytes matter
    k3 = pc.key(ids + 1, sp, sm, False)         # token ids matter
    kq = pc.key(ids, sp, sm, True)              # kv dtype matters
    assert len({k1, k2, k3, kq}) == 4
    pc.put(k1, {"p_len": 1})
    pc.put(k2, {"p_len": 2})
    pc.put(k3, {"p_len": 3})
    assert len(pc) == 2
    assert pc.get(k1) is None                   # evicted (LRU)
    assert pc.get(k3)["p_len"] == 3

    # latent key is deterministic and content-derived
    assert np.array_equal(PrefixCache.latent_rng_key(k1),
                          PrefixCache.latent_rng_key(k1))
    assert not np.array_equal(PrefixCache.latent_rng_key(k1),
                              PrefixCache.latent_rng_key(k2))


def test_capacity_validation():
    with pytest.raises(ValueError):
        PrefixCache(capacity=0)


@pytest.mark.slow
def test_engine_requests_share_prefix(params):
    """Two engine requests with the same voice: the second is a store hit and
    both produce identical tokens/audio for the same seed (the prefix cache
    is keyed on content, not request identity)."""
    from vibevoice_tpu.generation.engine import ContinuousEngine

    gen = VibeVoiceGenerator(params, CFG, TinyTokenizer(),
                             ddpm_inference_steps=4, lm_dtype=jnp.float32,
                             prefix_cache=2)
    ids, smask, speech, sp_masks = _voice_prompt()
    inputs = {"input_ids": ids, "speech_tensors": speech,
              "speech_masks": sp_masks, "speech_input_mask": smask}
    eng = ContinuousEngine(gen, slots=2, cache_len=512, chunk_steps=4,
                           cfg_scale=1.3)
    r1 = eng.submit(dict(inputs), max_new_tokens=12, max_length_times=1000.0,
                    seed=4)
    eng.drain()
    assert r1.error is None
    assert gen.prefix_cache.misses == 1 and gen.prefix_cache.hits == 0
    r2 = eng.submit(dict(inputs), max_new_tokens=12, max_length_times=1000.0,
                    seed=4)
    eng.drain()
    assert r2.error is None
    assert gen.prefix_cache.hits == 1
    assert r1.tokens == r2.tokens
    if r1.audio is not None or r2.audio is not None:
        np.testing.assert_array_equal(np.asarray(r1.audio),
                                      np.asarray(r2.audio))
