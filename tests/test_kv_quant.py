"""int8 KV-cache tests (opt-in long-context tier).

The cache stores one symmetric int8 vector + f32 scale per (layer, sample,
head, slot); dequantization happens inside the attention math (scores scale
per key row, v scales fold into the probability rows), so KV HBM traffic and
cache memory halve without materializing a dequantized cache.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.ops.flash_decode import (decode_attend_xla,
                                            dequantize_kv,
                                            flash_decode_attention_q8,
                                            quantize_kv)

CFG = VibeVoiceConfig.named("tiny")


class TinyTokenizer:
    eos_id = 3
    speech_start_id = 10
    speech_end_id = 11
    speech_diffusion_id = 12
    pad_id = 4


def test_quantize_kv_roundtrip():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 4, 37, 16) * 3.0, jnp.float32)
    q8, s = quantize_kv(x)
    assert q8.dtype == jnp.int8 and s.shape == (2, 4, 37)
    back = dequantize_kv({"q": q8, "s": s}, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(x))
    bound = np.asarray(s)[..., None] / 2 + 1e-6
    assert (err <= bound).all()
    # relative error per vector is sub-1%
    rel = np.linalg.norm(err.reshape(-1, 16), axis=-1) / (
        np.linalg.norm(np.asarray(x).reshape(-1, 16), axis=-1) + 1e-9)
    assert np.median(rel) < 0.01


def test_flash_decode_q8_matches_xla_dequant():
    """The int8 Pallas decode kernel (interpret mode on CPU) must equal the
    XLA fallback reading the same quantized cache."""
    rs = np.random.RandomState(1)
    b, hq, hkv, s, d = 3, 8, 2, 64, 32
    q = jnp.asarray(rs.randn(b, hq, d), jnp.float32)
    k = jnp.asarray(rs.randn(b, hkv, s, d), jnp.float32)
    v = jnp.asarray(rs.randn(b, hkv, s, d), jnp.float32)
    k8, ks = quantize_kv(k)
    v8, vs = quantize_kv(v)
    kv_start = jnp.asarray([0, 5, 12], jnp.int32)
    kv_len = jnp.asarray([64, 40, 13], jnp.int32)

    out = flash_decode_attention_q8(q, k8, ks, v8, vs, kv_start, kv_len,
                                    block_k=16, interpret=True)
    ref = decode_attend_xla(q, {"q": k8, "s": ks}, {"q": v8, "s": vs},
                            kv_start, kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # and the quantized result tracks the bf16 attention closely
    full = decode_attend_xla(q, k.astype(jnp.float32), v.astype(jnp.float32),
                             kv_start, kv_len)
    rel = (np.abs(np.asarray(out) - np.asarray(full)).max()
           / np.abs(np.asarray(full)).max())
    assert rel < 0.05, rel


def test_flash_cached_q8_matches_dequant_reference():
    """Chunked-prefill int8 kernel vs an explicit dequant + causal softmax."""
    from vibevoice_tpu.ops.flash_attention import flash_attention_cached_q8

    rs = np.random.RandomState(2)
    b, c, hq, hkv, s_len, d = 2, 16, 4, 2, 64, 32
    off = 32
    q = jnp.asarray(rs.randn(b, c, hq, d), jnp.float32)
    cache = jnp.asarray(rs.randn(b, hkv, s_len, d), jnp.float32)
    vcache = jnp.asarray(rs.randn(b, hkv, s_len, d), jnp.float32)
    k8, ks = quantize_kv(cache)
    v8, vs = quantize_kv(vcache)
    kv_start = jnp.asarray([0, 3], jnp.int32)

    out = flash_attention_cached_q8(q, k8, ks, v8, vs, kv_start,
                                    jnp.int32(off), block_q=8, block_k=16,
                                    interpret=True)

    kd = np.asarray(dequantize_kv({"q": k8, "s": ks}, jnp.float32))
    vd = np.asarray(dequantize_kv({"q": v8, "s": vs}, jnp.float32))
    qn = np.asarray(q)
    ref = np.zeros_like(qn)
    for bi in range(b):
        for h in range(hq):
            kh = kd[bi, h // (hq // hkv)]
            vh = vd[bi, h // (hq // hkv)]
            logits = qn[bi, :, h] @ kh.T * (d ** -0.5)
            jpos = np.arange(s_len)[None, :]
            qpos = off + np.arange(c)[:, None]
            mask = (jpos >= int(kv_start[bi])) & (jpos <= qpos)
            logits = np.where(mask, logits, -1e30)
            p = np.exp(logits - logits.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            ref[bi, :, h] = p @ vh
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_generate_kv_quant_close_to_bf16_cache():
    """End-to-end tiny generation with the int8 cache: same control-token
    stream as the bf16-cache run and audio within quantization tolerance
    (CPU path: XLA fallbacks read the quantized cache)."""
    from vibevoice_tpu.generation import VibeVoiceGenerator
    from vibevoice_tpu.models import vibevoice

    params = vibevoice.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    tk = TinyTokenizer()
    rs = np.random.RandomState(3)
    ids = rs.randint(20, 200, (1, 12))
    ids[:, -1] = tk.speech_start_id
    kw = dict(cfg_scale=1.3, max_new_tokens=12, chunk_steps=4,
              do_sample=False, seed=7, max_length_times=1000.0)

    ref = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=4,
                             lm_dtype=jnp.float32).generate(ids, **kw)
    q = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=4,
                           lm_dtype=jnp.float32,
                           kv_quant=True).generate(ids, **kw)
    np.testing.assert_array_equal(ref.sequences, q.sequences)
    a_ref, a_q = ref.speech_outputs[0], q.speech_outputs[0]
    assert (a_ref is None) == (a_q is None)
    if a_ref is not None:
        n = min(len(a_ref), len(a_q))
        denom = np.abs(a_ref[:n]).max() + 1e-9
        assert np.abs(a_q[:n] - a_ref[:n]).max() / denom < 0.1


@pytest.mark.slow
def test_generate_kv_quant_long_prompt_chunked_prefill():
    """kv_quant + a prompt long enough to take the segmented-prefill path:
    the quantized chunked-prefill writes/reads stay consistent with the
    bf16-cache run's token stream."""
    import os

    from vibevoice_tpu.generation import VibeVoiceGenerator
    from vibevoice_tpu.models import vibevoice

    params = vibevoice.init_params(jax.random.PRNGKey(1), CFG, jnp.float32)
    tk = TinyTokenizer()
    rs = np.random.RandomState(5)
    ids = rs.randint(20, 200, (1, 200))
    ids[:, -1] = tk.speech_start_id
    kw = dict(cfg_scale=1.3, max_new_tokens=6, chunk_steps=3,
              do_sample=False, seed=2, max_length_times=1000.0)

    os.environ["VIBEVOICE_PREFILL_CHUNK"] = "64"
    try:
        ref = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=2,
                                 lm_dtype=jnp.float32).generate(ids, **kw)
        q = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=2,
                               lm_dtype=jnp.float32,
                               kv_quant=True).generate(ids, **kw)
    finally:
        del os.environ["VIBEVOICE_PREFILL_CHUNK"]
    np.testing.assert_array_equal(ref.sequences, q.sequences)


@pytest.mark.slow
def test_sharded_kv_quant_matches_single_device():
    """TP/DP-sharded generation over an int8 cache == single-device int8:
    the shard_map decode wrapper carries the per-vector scales on the same
    (dp, tp) axes as the data, so shard-local attention sees the exact same
    quantized vectors."""
    from vibevoice_tpu.generation import VibeVoiceGenerator
    from vibevoice_tpu.models import vibevoice
    from vibevoice_tpu.parallel import make_mesh

    params = vibevoice.init_params(jax.random.PRNGKey(4), CFG, jnp.float32)
    tk = TinyTokenizer()
    rs = np.random.RandomState(7)
    ids = rs.randint(20, 200, (2, 24))
    ids[:, -1] = tk.speech_start_id
    kw = dict(cfg_scale=1.3, max_new_tokens=8, chunk_steps=4,
              do_sample=False, seed=3, max_length_times=1000.0)

    out1 = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=3,
                              lm_dtype=jnp.float32,
                              kv_quant=True).generate(ids, **kw)
    mesh = make_mesh(8, tp=2)
    gen2 = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=3,
                              lm_dtype=jnp.float32, mesh=mesh, kv_quant=True)
    assert gen2.kv_tp, "tiny config (2 kv heads) should shard kv on tp=2"
    out2 = gen2.generate(ids, **kw)

    np.testing.assert_array_equal(out1.sequences, out2.sequences)
    for a, bw in zip(out1.speech_outputs, out2.speech_outputs):
        if a is None:
            assert bw is None
        else:
            np.testing.assert_allclose(a, bw, atol=2e-4)


@pytest.mark.slow
def test_engine_kv_quant_matches_solo():
    """Continuous batching over an int8 cache: each request's token stream
    equals its solo kv_quant run (the determinism contract — quantization is
    deterministic and row-local, so splices preserve it)."""
    from vibevoice_tpu.generation import VibeVoiceGenerator
    from vibevoice_tpu.generation.engine import ContinuousEngine
    from vibevoice_tpu.models import vibevoice

    params = vibevoice.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    tk = TinyTokenizer()
    gen = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=2,
                             lm_dtype=jnp.float32, kv_quant=True)
    rs = np.random.RandomState(9)
    prompts = []
    for i in range(3):
        ids = rs.randint(20, 200, (1, 10 + 3 * i))
        ids[:, -1] = tk.speech_start_id
        prompts.append(ids)

    solo = [gen.generate(ids, cfg_scale=1.3, max_new_tokens=8, chunk_steps=4,
                         do_sample=False, seed=11 + i, max_length_times=1000.0)
            for i, ids in enumerate(prompts)]

    eng = ContinuousEngine(gen, slots=2, cache_len=128, chunk_steps=4,
                           cfg_scale=1.3, do_sample=False)
    reqs = [eng.submit({"input_ids": ids}, max_new_tokens=8,
                       max_length_times=1000.0, seed=11 + i)
            for i, ids in enumerate(prompts)]
    eng.drain()

    def trim(toks):
        # engine stops at eos; generate() pads the dispatched chunk with eos
        return (toks[:toks.index(tk.eos_id) + 1] if tk.eos_id in toks
                else toks)

    for i, (req, ref) in enumerate(zip(reqs, solo)):
        assert req.error is None, req.error
        solo_t = trim(ref.sequences[0].tolist())
        n = min(len(req.tokens), len(solo_t))
        assert n > 0 and req.tokens[:n] == solo_t[:n], f"request {i}"


def test_flash_cached_q8_split_chains_match_reference():
    """8k int8 cache -> splits=2 in the q8 chunked-prefill kernel; the split
    merge plus lane-major scale slicing must equal the dequant reference."""
    from vibevoice_tpu.ops.flash_attention import (DEFAULT_BLOCK_K_CACHED,
                                                   flash_attention_cached_q8)
    from vibevoice_tpu.ops.flash_decode import _pick_block

    s_len = 8192
    assert _pick_block(s_len, DEFAULT_BLOCK_K_CACHED)[1] > 1
    rs = np.random.RandomState(6)
    b, c, hq, hkv, d = 2, 16, 4, 2, 32
    off = 1990
    q = jnp.asarray(rs.randn(b, c, hq, d), jnp.float32)
    k = jnp.asarray(rs.randn(b, hkv, s_len, d), jnp.float32)
    v = jnp.asarray(rs.randn(b, hkv, s_len, d), jnp.float32)
    k8, ks = quantize_kv(k)
    v8, vs = quantize_kv(v)
    kv_start = jnp.asarray([0, 7], jnp.int32)

    out = flash_attention_cached_q8(q, k8, ks, v8, vs, kv_start,
                                    jnp.int32(off), interpret=True)
    kd = dequantize_kv({"q": k8, "s": ks}, jnp.float32)
    vd = dequantize_kv({"q": v8, "s": vs}, jnp.float32)
    for i in range(0, c, 5):
        ref = decode_attend_xla(q[:, i], kd, vd, kv_start,
                                jnp.full((b,), off + i + 1, jnp.int32))
        np.testing.assert_allclose(np.asarray(out[:, i]), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)
