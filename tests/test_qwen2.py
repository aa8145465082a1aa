"""Qwen2 parity and KV-cache tests.

Logit parity vs HuggingFace transformers' Qwen2 (torch CPU) on a tiny config,
per SURVEY.md §7 stage 4; plus decode-with-cache == full-forward equivalence
(the seam the generate loop depends on).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibevoice_tpu.config import Qwen2DecoderConfig
from vibevoice_tpu.models import qwen2

TINY = Qwen2DecoderConfig(
    vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
    rope_theta=1e6, tie_word_embeddings=True)


def _random_params(seed=0, dtype=jnp.float32):
    return qwen2.init_params(jax.random.PRNGKey(seed), TINY, dtype)


def test_forward_shapes():
    params = _random_params()
    ids = jnp.array([[1, 2, 3, 4], [5, 6, 7, 8]])
    x = qwen2.embed_tokens(params, ids)
    b, t = ids.shape
    mask = jnp.ones((b, t), bool)
    cache = qwen2.init_kv_cache(TINY, b, 16, jnp.float32)
    hidden, cache = qwen2.prefill(params, TINY, x, mask, cache)
    assert hidden.shape == (b, t, TINY.hidden_size)
    logits = hidden @ qwen2.lm_head_weight(params)
    assert logits.shape == (b, t, TINY.vocab_size)


def test_decode_matches_full_forward():
    """Prefill T tokens then decode one-by-one == single full forward."""
    params = _random_params(1)
    b, t_pre, t_total = 2, 5, 9
    ids = jax.random.randint(jax.random.PRNGKey(2), (b, t_total), 0, TINY.vocab_size)
    x_all = qwen2.embed_tokens(params, ids)
    mask_all = jnp.ones((b, t_total), bool)

    # full forward, no cache
    causal = jnp.arange(t_total)[None, :, None] >= jnp.arange(t_total)[None, None, :]
    full_hidden, _ = qwen2.forward(
        params, TINY, x_all,
        positions=jnp.broadcast_to(jnp.arange(t_total), (b, t_total)),
        cache=None, attn_mask=causal & mask_all[:, None, :])

    # prefill + stepwise decode
    cache = qwen2.init_kv_cache(TINY, b, 16, jnp.float32)
    hidden, cache = qwen2.prefill(params, TINY, x_all[:, :t_pre], mask_all[:, :t_pre], cache)
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(full_hidden[:, :t_pre]),
                               rtol=2e-4, atol=2e-4)

    for i in range(t_pre, t_total):
        pos = jnp.full((b,), i)
        h_i, cache = qwen2.decode_step(
            params, TINY, x_all[:, i:i + 1], positions=pos,
            write_idx=jnp.full((b,), i), kv_start=jnp.zeros((b,), jnp.int32),
            kv_len=jnp.full((b,), i + 1), cache=cache)
        np.testing.assert_allclose(np.asarray(h_i[:, 0]), np.asarray(full_hidden[:, i]),
                                   rtol=3e-4, atol=3e-4)


def test_left_padding_equivalence():
    """A left-padded sample must produce the same last-token hidden state as
    the unpadded sequence (processor left-pads batches,
    reference vibevoice_processor.py:333-338)."""
    params = _random_params(3)
    t, pad = 6, 3
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, t), 0, TINY.vocab_size)
    x = qwen2.embed_tokens(params, ids)

    cache = qwen2.init_kv_cache(TINY, 1, 16, jnp.float32)
    mask = jnp.ones((1, t), bool)
    h_ref, _ = qwen2.prefill(params, TINY, x, mask, cache)

    ids_pad = jnp.concatenate([jnp.zeros((1, pad), ids.dtype), ids], axis=1)
    x_pad = qwen2.embed_tokens(params, ids_pad)
    mask_pad = jnp.concatenate([jnp.zeros((1, pad), bool), mask], axis=1)
    cache2 = qwen2.init_kv_cache(TINY, 1, 16, jnp.float32)
    h_pad, _ = qwen2.prefill(params, TINY, x_pad, mask_pad, cache2)

    np.testing.assert_allclose(np.asarray(h_pad[:, -1]), np.asarray(h_ref[:, -1]),
                               rtol=2e-4, atol=2e-4)


def test_parity_with_hf_qwen2():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFQwen2Config
    from transformers.models.qwen2 import Qwen2ForCausalLM

    hf_cfg = HFQwen2Config(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        num_key_value_heads=TINY.num_key_value_heads,
        max_position_embeddings=TINY.max_position_embeddings,
        rope_theta=TINY.rope_theta, rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=True, attn_implementation="eager",
        use_cache=False)
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(hf_cfg).eval().float()

    # import HF weights into our pytree layout ([out,in] -> [in,out])
    sd = hf.state_dict()
    t2j = lambda t: jnp.asarray(t.detach().numpy())
    L = TINY.num_hidden_layers

    def stack(fmt, transpose=False):
        ws = [t2j(sd[fmt.format(i)]) for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return jnp.stack(ws)

    params = {
        "embed": t2j(sd["model.embed_tokens.weight"]),
        "layers": {
            "ln1": stack("model.layers.{}.input_layernorm.weight"),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight", True),
            "bq": stack("model.layers.{}.self_attn.q_proj.bias"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight", True),
            "bk": stack("model.layers.{}.self_attn.k_proj.bias"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight", True),
            "bv": stack("model.layers.{}.self_attn.v_proj.bias"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight", True),
            "ln2": stack("model.layers.{}.post_attention_layernorm.weight"),
            "wg": stack("model.layers.{}.mlp.gate_proj.weight", True),
            "wu": stack("model.layers.{}.mlp.up_proj.weight", True),
            "wd": stack("model.layers.{}.mlp.down_proj.weight", True),
        },
        "norm": t2j(sd["model.norm.weight"]),
    }

    b, t = 2, 7
    rng = np.random.RandomState(0)
    ids_np = rng.randint(0, TINY.vocab_size, (b, t))
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids_np)).logits.numpy()

    x = qwen2.embed_tokens(params, jnp.asarray(ids_np))
    causal = jnp.arange(t)[None, :, None] >= jnp.arange(t)[None, None, :]
    hidden, _ = qwen2.forward(params, TINY, x,
                              positions=jnp.broadcast_to(jnp.arange(t), (b, t)),
                              cache=None, attn_mask=causal)
    logits = np.asarray(hidden @ qwen2.lm_head_weight(params))

    np.testing.assert_allclose(logits, hf_logits, rtol=2e-4, atol=2e-4)


def test_parity_with_hf_qwen2_bf16():
    """bf16 parity bound vs HF torch bf16 (VERDICT weak #7: round-1 parity
    stopped at fp32).  Both sides compute in bf16 with different op orders,
    so the contract is a bound + argmax agreement, not exactness."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFQwen2Config
    from transformers.models.qwen2 import Qwen2ForCausalLM

    hf_cfg = HFQwen2Config(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        num_key_value_heads=TINY.num_key_value_heads,
        max_position_embeddings=TINY.max_position_embeddings,
        rope_theta=TINY.rope_theta, rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=True, attn_implementation="eager",
        use_cache=False)
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(hf_cfg).eval().float()
    sd = hf.state_dict()
    t2j = lambda t: jnp.asarray(t.detach().float().numpy(), jnp.bfloat16)
    L = TINY.num_hidden_layers

    def stack(fmt, transpose=False):
        ws = [t2j(sd[fmt.format(i)]) for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return jnp.stack(ws)

    params = {
        "embed": t2j(sd["model.embed_tokens.weight"]),
        "layers": {
            "ln1": stack("model.layers.{}.input_layernorm.weight"),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight", True),
            "bq": stack("model.layers.{}.self_attn.q_proj.bias"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight", True),
            "bk": stack("model.layers.{}.self_attn.k_proj.bias"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight", True),
            "bv": stack("model.layers.{}.self_attn.v_proj.bias"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight", True),
            "ln2": stack("model.layers.{}.post_attention_layernorm.weight"),
            "wg": stack("model.layers.{}.mlp.gate_proj.weight", True),
            "wu": stack("model.layers.{}.mlp.up_proj.weight", True),
            "wd": stack("model.layers.{}.mlp.down_proj.weight", True),
        },
        "norm": t2j(sd["model.norm.weight"]),
    }

    b, t = 2, 9
    rng = np.random.RandomState(1)
    ids_np = rng.randint(0, TINY.vocab_size, (b, t))
    with torch.no_grad():
        hf_logits = hf.bfloat16()(torch.tensor(ids_np)).logits.float().numpy()

    x = qwen2.embed_tokens(params, jnp.asarray(ids_np))
    causal = jnp.arange(t)[None, :, None] >= jnp.arange(t)[None, None, :]
    hidden, _ = qwen2.forward(params, TINY, x,
                              positions=jnp.broadcast_to(jnp.arange(t), (b, t)),
                              cache=None, attn_mask=causal)
    logits = np.asarray((hidden @ qwen2.lm_head_weight(params)).astype(jnp.float32))

    scale = np.abs(hf_logits).max()
    max_err = np.abs(logits - hf_logits).max()
    assert max_err <= 0.05 * scale, (max_err, scale)
    # the decisions that drive generation must agree
    agree = (logits[:, -1].argmax(-1) == hf_logits[:, -1].argmax(-1)).mean()
    assert agree == 1.0


@pytest.mark.parametrize("hq,hkv,dh", [(12, 2, 16), (28, 4, 8)])
def test_parity_with_hf_qwen2_gqa_geometries(hq, hkv, dh):
    """HF logit parity at the REAL model GQA geometries: 12q/2kv (1.5B,
    group 6) and 28q/4kv (7B, group 7) — the tiny test only covers group 2,
    and the grouped-attention einsum is geometry-sensitive."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFQwen2Config
    from transformers.models.qwen2 import Qwen2ForCausalLM

    h = hq * dh
    cfg = Qwen2DecoderConfig(
        vocab_size=160, hidden_size=h, intermediate_size=2 * h,
        num_hidden_layers=2, num_attention_heads=hq, num_key_value_heads=hkv,
        max_position_embeddings=256, rope_theta=1e6, tie_word_embeddings=True)
    hf_cfg = HFQwen2Config(
        vocab_size=cfg.vocab_size, hidden_size=h, intermediate_size=2 * h,
        num_hidden_layers=2, num_attention_heads=hq, num_key_value_heads=hkv,
        max_position_embeddings=256, rope_theta=1e6, rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=True, attn_implementation="eager", use_cache=False)
    torch.manual_seed(1)
    hf = Qwen2ForCausalLM(hf_cfg).eval().float()
    sd = hf.state_dict()
    t2j = lambda t: jnp.asarray(t.detach().numpy())

    def stack(fmt, transpose=False):
        ws = [t2j(sd[fmt.format(i)]) for i in range(2)]
        return jnp.stack([w.T if transpose else w for w in ws])

    params = {
        "embed": t2j(sd["model.embed_tokens.weight"]),
        "layers": {
            "ln1": stack("model.layers.{}.input_layernorm.weight"),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight", True),
            "bq": stack("model.layers.{}.self_attn.q_proj.bias"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight", True),
            "bk": stack("model.layers.{}.self_attn.k_proj.bias"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight", True),
            "bv": stack("model.layers.{}.self_attn.v_proj.bias"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight", True),
            "ln2": stack("model.layers.{}.post_attention_layernorm.weight"),
            "wg": stack("model.layers.{}.mlp.gate_proj.weight", True),
            "wu": stack("model.layers.{}.mlp.up_proj.weight", True),
            "wd": stack("model.layers.{}.mlp.down_proj.weight", True),
        },
        "norm": t2j(sd["model.norm.weight"]),
    }

    ids_np = np.random.RandomState(2).randint(0, cfg.vocab_size, (2, 11))
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids_np)).logits.numpy()
    x = qwen2.embed_tokens(params, jnp.asarray(ids_np))
    t = ids_np.shape[1]
    causal = jnp.arange(t)[None, :, None] >= jnp.arange(t)[None, None, :]
    hidden, _ = qwen2.forward(params, cfg, x,
                              positions=jnp.broadcast_to(jnp.arange(t), (2, t)),
                              cache=None, attn_mask=causal)
    logits = np.asarray(hidden @ qwen2.lm_head_weight(params))
    np.testing.assert_allclose(logits, hf_logits, rtol=3e-4, atol=3e-4)

    # flash-decode at the same geometry: one decode step against the cache
    # must match the full-forward last position (pallas interpret on CPU)
    cache = qwen2.init_kv_cache(cfg, 2, 16, jnp.float32)
    emb = qwen2.embed_tokens(params, jnp.asarray(ids_np))
    cache_state = cache
    for i in range(t):
        hdec, cache_state = qwen2.decode_step(
            params, cfg, emb[:, i:i + 1],
            positions=jnp.full((2,), i, jnp.int32),
            write_idx=jnp.full((2,), i, jnp.int32),
            kv_start=jnp.zeros((2,), jnp.int32),
            kv_len=jnp.full((2,), i + 1, jnp.int32),
            cache=cache_state, impl="pallas")
    np.testing.assert_allclose(np.asarray(hdec[:, 0]), np.asarray(hidden[:, -1]),
                               rtol=3e-4, atol=3e-4)
