"""Weight-only int8 quantization tests."""

import numpy as np

import jax
import jax.numpy as jnp

from vibevoice_tpu.config import Qwen2DecoderConfig
from vibevoice_tpu.models import qwen2
from vibevoice_tpu.ops.quant import (
    dequantize_weight,
    qmatmul,
    quantize_lm_params,
    quantize_weight,
)

TINY = Qwen2DecoderConfig(
    vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256)


def test_quantize_roundtrip_error():
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(16, 24), jnp.float32)
    qw = quantize_weight(w)
    assert qw["q"].dtype == jnp.int8
    back = dequantize_weight(qw, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w)).max()
    scale = np.abs(np.asarray(w)).max(axis=0)
    assert err <= (scale / 127).max() * 1.01


def test_qmatmul_matches_dense():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(4, 16), jnp.float32)
    w = jnp.asarray(rs.randn(16, 24), jnp.float32)
    y_q = qmatmul(x, quantize_weight(w))
    y_d = x @ w
    rel = np.abs(np.asarray(y_q) - np.asarray(y_d)).max() / np.abs(np.asarray(y_d)).max()
    assert rel < 0.05


def test_quantized_lm_forward_close_to_dense():
    params = qwen2.init_params(jax.random.PRNGKey(0), TINY, jnp.float32)
    qparams = dict(params)
    qparams = {**params, "layers": params["layers"]}
    qlm = quantize_lm_params(params)

    ids = jnp.asarray(np.random.RandomState(2).randint(0, 128, (2, 6)))
    x = qwen2.embed_tokens(params, ids)
    causal = jnp.arange(6)[None, :, None] >= jnp.arange(6)[None, None, :]
    pos = jnp.broadcast_to(jnp.arange(6), (2, 6))
    h_dense, _ = qwen2.forward(params, TINY, x, pos, None, causal)
    h_quant, _ = qwen2.forward(qlm, TINY, x, pos, None, causal)
    # int8 weight-only keeps activations close
    denom = np.abs(np.asarray(h_dense)).max()
    rel = np.abs(np.asarray(h_quant) - np.asarray(h_dense)).max() / denom
    assert rel < 0.1, rel


def test_quantized_diffusion_head_error_bounded():
    """int8 weight-only AdaLN head: output error bounded relative to fp32
    (ops/quant.py quantize_diffusion_head_params)."""
    import jax
    import jax.numpy as jnp
    from vibevoice_tpu.config import DiffusionHeadConfig
    from vibevoice_tpu.models import diffusion_head
    from vibevoice_tpu.ops.quant import quantize_diffusion_head_params

    cfg = DiffusionHeadConfig(hidden_size=64, head_layers=2, latent_size=16,
                              freq_embed_size=32)
    rs = np.random.RandomState(0)
    params = diffusion_head.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    # non-zero AdaLN/output so quantization has signal to distort
    params = jax.tree.map(
        lambda x: jnp.asarray(rs.randn(*x.shape).astype(np.float32) * 0.05),
        params)
    qparams = quantize_diffusion_head_params(params)

    noisy = jnp.asarray(rs.randn(4, 16), jnp.float32)
    t = jnp.asarray([10., 500., 900., 40.])
    cond = jnp.asarray(rs.randn(4, 64), jnp.float32)
    ref = diffusion_head.apply(params, cfg, noisy, t, cond)
    out = diffusion_head.apply(qparams, cfg, noisy, t, cond)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err <= 0.05 * scale, (err, scale)


def test_quantized_tokenizer_error_bounded():
    """int8 FFN tokenizer: decode output error bounded vs dense, and the
    streaming step still matches batch decoding."""
    import jax
    import jax.numpy as jnp
    from vibevoice_tpu.config import VibeVoiceConfig
    from vibevoice_tpu.models import acoustic_tokenizer as tok
    from vibevoice_tpu.ops.quant import quantize_tokenizer_params

    cfg = VibeVoiceConfig.named("tiny").acoustic_tokenizer
    params = tok.init_acoustic_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = quantize_tokenizer_params(params)

    rs = np.random.RandomState(0)
    lat = jnp.asarray(rs.randn(2, 3, cfg.vae_dim), jnp.float32)
    ref, _ = tok.decode(params["decoder"], cfg, lat, None)
    out, _ = tok.decode(qparams["decoder"], cfg, lat, None)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    assert float(jnp.max(jnp.abs(out - ref))) <= 0.1 * scale

    # streaming == batch must still hold with quantized weights
    state = tok.init_decoder_state(cfg, 2)
    chunks = []
    for i in range(lat.shape[1]):
        y, state = tok.decode(qparams["decoder"], cfg, lat[:, i:i + 1], state)
        chunks.append(y)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(chunks, axis=1)),
                               np.asarray(out), rtol=2e-4, atol=2e-5)
