"""Pallas flash-attention prefill kernel vs the XLA reference path.

Runs in interpreter mode on the CPU test mesh; the same kernel compiles for
TPU (exercised by bench/e2e on the real chip when enabled).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibevoice_tpu.ops.attention import NEG_INF, attend, causal_mask
from vibevoice_tpu.ops.flash_attention import flash_attention


def _ref(q, k, v, kv_start, causal=True):
    b, tq, hq, d = q.shape
    tk = k.shape[1]
    mask = jnp.ones((tq, tk), bool)
    if causal:
        mask = causal_mask(tq, tk)
    mask = mask[None] & (jnp.arange(tk)[None, None, :] >= kv_start[:, None, None])
    return attend(q, k, v, mask=mask)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (4, 2), (8, 2)])
def test_flash_matches_reference_causal(hq, hkv):
    rs = np.random.RandomState(0)
    b, tq, d = 2, 256, 64
    q = jnp.asarray(rs.randn(b, tq, hq, d), jnp.float32) * 0.3
    k = jnp.asarray(rs.randn(b, tq, hkv, d), jnp.float32) * 0.3
    v = jnp.asarray(rs.randn(b, tq, hkv, d), jnp.float32)
    kv_start = jnp.asarray([0, 37], jnp.int32)

    out = flash_attention(q, k, v, kv_start, causal=True, interpret=True)
    ref = _ref(q, k, v, kv_start, causal=True)
    # rows before kv_start attend nothing in the kernel (output 0) and are
    # never used downstream; compare only valid query rows
    for i, s in enumerate([0, 37]):
        np.testing.assert_allclose(np.asarray(out[i, s:]), np.asarray(ref[i, s:]),
                                   rtol=2e-3, atol=2e-3)


def test_flash_noncausal():
    rs = np.random.RandomState(1)
    b, t, h, d = 1, 128, 2, 32
    q = jnp.asarray(rs.randn(b, t, h, d), jnp.float32) * 0.3
    k = jnp.asarray(rs.randn(b, t, h, d), jnp.float32) * 0.3
    v = jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
    out = flash_attention(q, k, v, causal=False, interpret=True)
    ref = _ref(q, k, v, jnp.zeros((b,), jnp.int32), causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_prefill_pallas_matches_xla():
    """Full prefill with the Pallas kernel == XLA path, left-padded batch."""
    from vibevoice_tpu.config import Qwen2DecoderConfig
    from vibevoice_tpu.models import qwen2

    cfg = Qwen2DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256)
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    b, t = 2, 64
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, 64)
    x = qwen2.embed_tokens(params, ids)
    mask = np.ones((b, t), bool)
    mask[1, :9] = False  # left padding
    mask = jnp.asarray(mask)

    c1 = qwen2.init_kv_cache(cfg, b, t, jnp.float32)
    h_xla, cache_xla = qwen2.prefill(params, cfg, x, mask, c1, impl="xla")
    c2 = qwen2.init_kv_cache(cfg, b, t, jnp.float32)
    h_pls, cache_pls = qwen2.prefill(params, cfg, x, mask, c2, impl="pallas")

    np.testing.assert_allclose(np.asarray(h_pls[0]), np.asarray(h_xla[0]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(h_pls[1, 9:]), np.asarray(h_xla[1, 9:]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cache_pls.k), np.asarray(cache_xla.k),
                               atol=1e-5)


def test_prefill_chunked_matches_single_shot():
    """Segmented prefill (fori_loop over fixed segments + cache-aware flash
    kernel) == one-shot prefill: last hidden and whole cache, left-padded
    batch, cache longer than the prompt (decode slots beyond T untouched)."""
    from vibevoice_tpu.config import Qwen2DecoderConfig
    from vibevoice_tpu.models import qwen2

    cfg = Qwen2DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256)
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    b, t, cache_len = 2, 64, 96
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, 64)
    x = qwen2.embed_tokens(params, ids)
    mask = np.ones((b, t), bool)
    mask[1, :23] = False                   # left padding crossing a segment
    mask = jnp.asarray(mask)

    c1 = qwen2.init_kv_cache(cfg, b, cache_len, jnp.float32)
    h_ref, cache_ref = qwen2.prefill(params, cfg, x, mask, c1, impl="xla")
    for chunk in (16, 32):
        c2 = qwen2.init_kv_cache(cfg, b, cache_len, jnp.float32)
        last, cache_ch = qwen2.prefill_chunked(params, cfg, x, mask, c2, chunk)
        np.testing.assert_allclose(np.asarray(last),
                                   np.asarray(h_ref[:, -1, :]),
                                   rtol=2e-3, atol=2e-3)
        # compare LIVE slots only: pad slots (k < kv_start) hold
        # garbage-by-design in both paths (fully-masked queries resolve
        # differently: kernel -> zeros, XLA -> uniform) and are masked out of
        # every later attention read
        np.testing.assert_allclose(np.asarray(cache_ch.k[:, 0, :, :t]),
                                   np.asarray(cache_ref.k[:, 0, :, :t]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(cache_ch.k[:, 1, :, 23:t]),
                                   np.asarray(cache_ref.k[:, 1, :, 23:t]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(cache_ch.v[:, 0, :, :t]),
                                   np.asarray(cache_ref.v[:, 0, :, :t]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(cache_ch.v[:, 1, :, 23:t]),
                                   np.asarray(cache_ref.v[:, 1, :, 23:t]),
                                   atol=1e-5)


def test_generate_long_prompt_uses_chunked_prefill(monkeypatch):
    """End-to-end: a prompt past the chunk threshold generates the same
    tokens/audio as with single-shot prefill."""
    from vibevoice_tpu.config import VibeVoiceConfig
    from vibevoice_tpu.generation import VibeVoiceGenerator
    from vibevoice_tpu.models import vibevoice
    from vibevoice_tpu.processor.text_tokenizer import ByteFallbackTokenizer

    cfg = VibeVoiceConfig.named("tiny")
    params = vibevoice.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tk = ByteFallbackTokenizer()
    ids = np.full((1, 70), 65, np.int64)
    ids[:, -1] = tk.speech_start_id

    def run(chunk_env):
        monkeypatch.setenv("VIBEVOICE_PREFILL_CHUNK", chunk_env)
        gen = VibeVoiceGenerator(params, cfg, tk, ddpm_inference_steps=2,
                                 lm_dtype=jnp.float32)
        assert gen.prefill_chunk == int(chunk_env)
        return gen.generate(ids, cfg_scale=1.3, max_new_tokens=6,
                            chunk_steps=3, max_length_times=1000.0,
                            refresh_negative=False, seed=7)

    out_chunked = run("32")                # 70 -> bucket 96 = 3 segments
    out_single = run("4096")
    np.testing.assert_array_equal(np.asarray(out_chunked.sequences),
                                  np.asarray(out_single.sequences))
    for a, b_ in zip(out_chunked.speech_outputs, out_single.speech_outputs):
        if a is None or b_ is None:
            assert a is None and b_ is None
        else:
            np.testing.assert_allclose(a, b_, atol=2e-4)


def test_cached_prefill_split_chains_match_reference():
    """An 8k cache makes _pick_block return splits=2 for the cached-prefill
    kernel; the in-body partial-softmax merge must equal plain attention."""
    from vibevoice_tpu.ops.flash_decode import _pick_block, decode_attend_xla
    from vibevoice_tpu.ops.flash_attention import (DEFAULT_BLOCK_K_CACHED,
                                                   flash_attention_cached)

    s_len = 8192
    assert _pick_block(s_len, DEFAULT_BLOCK_K_CACHED)[1] > 1
    rs = np.random.RandomState(5)
    b, c, hq, hkv, d = 2, 16, 4, 2, 32
    off = 1990                                 # live range crosses sub-blocks
    q = jnp.asarray(rs.randn(b, c, hq, d), jnp.float32)
    k = jnp.zeros((b, hkv, s_len, d), jnp.float32)
    v = jnp.zeros((b, hkv, s_len, d), jnp.float32)
    k = k.at[:, :, :off + c].set(jnp.asarray(
        rs.randn(b, hkv, off + c, d), jnp.float32))
    v = v.at[:, :, :off + c].set(jnp.asarray(
        rs.randn(b, hkv, off + c, d), jnp.float32))
    kv_start = jnp.asarray([0, 7], jnp.int32)

    out = flash_attention_cached(q, k, v, kv_start, jnp.int32(off),
                                 interpret=True)
    for i in range(0, c, 5):
        ref = decode_attend_xla(q[:, i], k, v, kv_start,
                                jnp.full((b,), off + i + 1, jnp.int32))
        np.testing.assert_allclose(np.asarray(out[:, i]), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)


class TestFlashDecode:
    """ops/flash_decode.py: single-query attention against the head-major
    cache (SURVEY §2.3 FlashAttention2 decode row)."""

    def _setup(self, b=3, hq=4, hkv=2, d=32, s=256, seed=0):
        rs = np.random.RandomState(seed)
        q = jnp.asarray(rs.randn(b, hq, d), jnp.float32)
        k = jnp.asarray(rs.randn(b, hkv, s, d), jnp.float32)
        v = jnp.asarray(rs.randn(b, hkv, s, d), jnp.float32)
        kv_start = jnp.asarray([0, 17, 100], jnp.int32)[:b]
        kv_len = jnp.asarray([s, 200, 131], jnp.int32)[:b]
        return q, k, v, kv_start, kv_len

    def test_matches_xla_reference(self):
        from vibevoice_tpu.ops.flash_decode import (decode_attend_xla,
                                                    flash_decode_attention)
        q, k, v, kv_start, kv_len = self._setup()
        ref = decode_attend_xla(q, k, v, kv_start, kv_len)
        out = flash_decode_attention(q, k, v, kv_start, kv_len, block_k=64,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_token_major_attend(self):
        """Equivalence with the original token-major attend path."""
        from vibevoice_tpu.ops.attention import attend
        from vibevoice_tpu.ops.flash_decode import flash_decode_attention
        q, k, v, kv_start, kv_len = self._setup(b=2, s=128)
        out = flash_decode_attention(q, k, v, kv_start, kv_len, block_k=32,
                                     interpret=True)
        s = k.shape[2]
        j = np.arange(s)[None, :]
        mask = (j >= np.asarray(kv_start)[:, None]) & (j < np.asarray(kv_len)[:, None])
        ref = attend(q[:, None], k.swapaxes(1, 2), v.swapaxes(1, 2),
                     mask=jnp.asarray(mask[:, None, :]))[:, 0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_split_chain_blocks_match_reference(self):
        """Big caches sweep in multi-split blocks (_pick_block -> splits>1);
        the split merge must equal the single-chain math exactly."""
        from vibevoice_tpu.ops.flash_decode import (_pick_block,
                                                    decode_attend_xla,
                                                    flash_decode_attention)
        s = 16384
        bk, splits = _pick_block(s, 4096)
        assert bk == 2048 and splits == 4, (bk, splits)
        rs = np.random.RandomState(3)
        b, hq, hkv, d = 2, 4, 2, 64
        q = jnp.asarray(rs.randn(b, hq, d), jnp.float32)
        k = jnp.asarray(rs.randn(b, hkv, s, d), jnp.float32)
        v = jnp.asarray(rs.randn(b, hkv, s, d), jnp.float32)
        kv_start = jnp.asarray([0, 700], jnp.int32)
        kv_len = jnp.asarray([3000, 2500], jnp.int32)
        ref = decode_attend_xla(q, k, v, kv_start, kv_len)
        out = flash_decode_attention(q, k, v, kv_start, kv_len,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_pick_block_properties(self):
        from vibevoice_tpu.ops.flash_decode import _pick_block
        for s in (64, 256, 2048, 4096, 8192, 16384, 36864, 65536):
            bk, splits = _pick_block(s, 4096)
            assert s % bk == 0, (s, bk)
            assert bk // max(splits, 1) <= 512
            assert bk <= max(s // 8, 256) or s <= 2048, (s, bk)

    def test_single_block_and_edge_ranges(self):
        from vibevoice_tpu.ops.flash_decode import (decode_attend_xla,
                                                    flash_decode_attention)
        # range inside one block; range ending exactly at a block boundary
        q, k, v, _, _ = self._setup(b=2, s=128)
        for kv_start, kv_len in ([5, 64], [60, 70]), ([0, 64], [64, 128]):
            st = jnp.asarray(kv_start, jnp.int32)
            ln = jnp.asarray(kv_len, jnp.int32)
            ref = decode_attend_xla(q, k, v, st, ln)
            out = flash_decode_attention(q, k, v, st, ln, block_k=64,
                                         interpret=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)
