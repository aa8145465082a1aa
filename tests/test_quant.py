"""Weight-only int8/int4 quantization tests."""

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


def test_quantized_conv_kernels_decode_parity():
    """convs=True additionally int8-quantizes the strided resampling kernels
    (the 67 MB upsample/downsample weights read every frame); decode output
    stays within the per-channel quantization error bound and streaming ==
    batch still holds."""
    from vibevoice_tpu.config import VibeVoiceConfig
    from vibevoice_tpu.models import acoustic_tokenizer as tok
    from vibevoice_tpu.ops.quant import quantize_tokenizer_params

    cfg = VibeVoiceConfig.named("tiny").acoustic_tokenizer
    params = tok.init_acoustic_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    qparams = quantize_tokenizer_params(params, convs=True)

    # conv leaves >= 128ch quantized (tiny config may have none; force-check
    # the quantizer math on a synthetic conv weight too)
    from vibevoice_tpu.ops.quant import quantize_conv_weight
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(16, 256, 128), jnp.float32)     # transposed conv
    qw = quantize_conv_weight(w, out_axis=1)
    assert qw["q"].dtype == jnp.int8 and qw["s"].shape == (256,)
    back = qw["q"].astype(jnp.float32) * qw["s"][None, :, None]
    assert float(jnp.max(jnp.abs(back - w))) <= float(jnp.max(qw["s"])) / 2 + 1e-6

    lat = jnp.asarray(rs.randn(2, 3, cfg.vae_dim), jnp.float32)
    ref, _ = tok.decode(params["decoder"], cfg, lat, None)
    out, _ = tok.decode(qparams["decoder"], cfg, lat, None)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    assert float(jnp.max(jnp.abs(out - ref))) <= 0.1 * scale

    state = tok.init_decoder_state(cfg, 2)
    chunks = []
    for i in range(lat.shape[1]):
        y, state = tok.decode(qparams["decoder"], cfg, lat[:, i:i + 1], state)
        chunks.append(y)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(chunks, axis=1)),
                               np.asarray(out), rtol=2e-4, atol=2e-5)


def test_bf16_generate_with_quantized_tokenizer_keeps_carry_dtype():
    """Regression: with bf16 params + int8 tokenizer FFNs, the generation
    step's conv-state carry must stay bf16 end to end.  (The fp32 speech_end
    zeroing mask used to promote the carry, making lax.scan retrace and feed
    fp32 states into bf16 convs — a TypeError at trace time.)"""
    from vibevoice_tpu.config import VibeVoiceConfig
    from vibevoice_tpu.generation import VibeVoiceGenerator
    from vibevoice_tpu.models import vibevoice
    from vibevoice_tpu.ops.quant import quantize_tokenizer_params

    class TK:
        eos_id = 3
        speech_start_id = 10
        speech_end_id = 11
        speech_diffusion_id = 12
        pad_id = 4

    cfg = VibeVoiceConfig.named("tiny")
    params = dict(vibevoice.init_params(jax.random.PRNGKey(0), cfg,
                                        jnp.bfloat16))
    params["acoustic"] = quantize_tokenizer_params(params["acoustic"])
    params["semantic"] = quantize_tokenizer_params(params["semantic"])
    gen = VibeVoiceGenerator(params, cfg, TK(), ddpm_inference_steps=3,
                             lm_dtype=jnp.bfloat16)
    assert gen.tok_dtype == jnp.bfloat16
    ids = np.random.RandomState(0).randint(20, 200, (1, 12))
    ids[:, -1] = TK.speech_start_id
    out = gen.generate(ids, cfg_scale=1.3, max_new_tokens=6, chunk_steps=3,
                       max_length_times=1000.0)
    assert out.sequences.shape[1] >= 6


# ---------------------------------------------------------------------------
# int4 tier (ops/int4.py)
# ---------------------------------------------------------------------------

def test_int4_roundtrip_error_within_half_step():
    from vibevoice_tpu.ops.int4 import (dequantize_weight_int4,
                                        quantize_weight_int4)
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(512, 128), jnp.float32)
    qw = quantize_weight_int4(w)                  # default group 16
    assert qw["q4"].shape == (256, 128) and qw["q4"].dtype == jnp.int8
    assert qw["s4"].shape == (32, 128) and qw["s4"].dtype == jnp.bfloat16
    back = np.asarray(dequantize_weight_int4(qw, jnp.float32))
    # max error <= half a quantization step per group (+ bf16 scale rounding)
    wg = np.asarray(w).reshape(32, 16, 128)
    step = np.abs(wg).max(axis=1, keepdims=True) / 7.0
    err = np.abs(back.reshape(32, 16, 128) - wg)
    assert (err <= step * (0.5 + 2 ** -8) + 1e-6).all()


def test_int4_pack_layout_split_half():
    """Packed row j = orig row j (low nibble) | orig row j + in/2 (high)."""
    from vibevoice_tpu.ops.int4 import quantize_weight_int4
    rs = np.random.RandomState(1)
    w = jnp.asarray(rs.randn(256, 128), jnp.float32)
    qw = quantize_weight_int4(w, group_size=128)
    p = np.asarray(qw["q4"]).astype(np.int32)
    lo = ((p & 15) ^ 8) - 8
    hi = p >> 4
    s = np.asarray(qw["s4"]).astype(np.float32)   # [2, 128]
    wq = np.concatenate([lo, hi], axis=0).astype(np.float32)
    wq = wq.reshape(2, 128, 128) * s[:, None, :]
    np.testing.assert_allclose(wq.reshape(256, 128),
                               np.asarray(w), atol=float(s.max()) * 0.51 + 1e-6)


def test_int4_matmul_xla_matches_dense():
    from vibevoice_tpu.ops.int4 import int4_matmul, quantize_weight_int4
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(4, 512), jnp.float32)
    w = jnp.asarray(rs.randn(512, 128), jnp.float32)
    y = int4_matmul(x, quantize_weight_int4(w))     # CPU -> XLA path
    ref = x @ w
    # 4-bit on normal weights: per-element step ~ amax/7, error accumulates
    # as sqrt(in) — an RMS-relative bound is the meaningful contract
    err = np.asarray(y - ref)
    rms_rel = float(np.sqrt((err ** 2).mean()) / np.sqrt((np.asarray(ref) ** 2).mean()))
    assert rms_rel < 0.15, rms_rel
    # and int4 must be strictly more accurate than... a zero weight ;) plus
    # sanity: dequantized matmul equals the fallback exactly
    from vibevoice_tpu.ops.int4 import dequantize_weight_int4
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(x @ dequantize_weight_int4(
                                   quantize_weight_int4(w), jnp.float32)),
                               rtol=1e-5, atol=1e-5)


def test_int4_pallas_kernel_matches_xla_interpret():
    """The Pallas kernel (interpret mode) computes the same numbers as the
    XLA dequant path — per-block unpack/scale/accumulate is exact math."""
    from vibevoice_tpu.ops.int4 import (_int4_matmul_2d,
                                        dequantize_weight_int4,
                                        quantize_weight_int4)
    rs = np.random.RandomState(3)
    for m, inn, out in [(2, 512, 256), (8, 1024, 384), (300, 512, 128)]:
        x = jnp.asarray(rs.randn(m, inn), jnp.float32)
        qw = quantize_weight_int4(jnp.asarray(rs.randn(inn, out), jnp.float32))
        pad = (-m) % 256 if m > 256 else 0
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        y = _int4_matmul_2d(xp, qw["q4"], qw["s4"], interpret=True)[:m]
        ref = x @ dequantize_weight_int4(qw, jnp.float32)
        # same math, different f32 accumulation order (blockwise vs XLA dot)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)


def test_int4c_roundtrip_and_dispatch():
    """Per-column-scale int4 (speed tier): roundtrip error bounded by half a
    quantization step of the column amax, and qmatmul dispatches on the
    {'q4c','s4c'} leaf."""
    from vibevoice_tpu.ops.int4 import (dequantize_weight_int4c,
                                        quantize_weight_int4c)
    from vibevoice_tpu.ops.quant import qmatmul

    rs = np.random.RandomState(5)
    w = jnp.asarray(rs.randn(256, 128), jnp.float32)
    qw = quantize_weight_int4c(w)
    assert qw["q4c"].shape == (128, 128) and qw["s4c"].shape == (1, 128)
    back = np.asarray(dequantize_weight_int4c(qw, jnp.float32))
    step = np.asarray(qw["s4c"])[0]
    assert np.all(np.abs(back - np.asarray(w)) <= step / 2 + 1e-6)

    x = jnp.asarray(rs.randn(3, 256), jnp.float32)
    y = qmatmul(x, qw)                       # xla path on CPU
    ref = x @ jnp.asarray(back)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_int4c_pallas_kernel_matches_xla_interpret():
    """int4c kernel (interpret): unpack -> bf16 MXU dot -> column scale at
    flush equals the explicit bf16 dequant dot."""
    from vibevoice_tpu.ops.int4 import (_int4c_matmul_2d, _unpack_c,
                                        quantize_weight_int4c)
    rs = np.random.RandomState(7)
    for m, inn, out in [(2, 512, 256), (8, 1024, 384), (300, 512, 128)]:
        x = jnp.asarray(rs.randn(m, inn), jnp.float32)
        qw = quantize_weight_int4c(jnp.asarray(rs.randn(inn, out), jnp.float32))
        pad = (-m) % 256 if m > 256 else 0
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        y = _int4c_matmul_2d(xp, qw["q4c"], qw["s4c"], interpret=True)[:m]
        lo, hi = _unpack_c(qw["q4c"])
        q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.bfloat16)
        ref = (jnp.dot(x.astype(jnp.bfloat16), q,
                       preferred_element_type=jnp.float32)
               * qw["s4c"].astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)


def test_int4_stacked_kernels_match_sliced(monkeypatch):
    """Stacked-weight kernels (layer index via scalar prefetch) produce the
    same result as slicing the layer and running the 2D kernel — for the
    int4c W4A16, int4c W4A8, and group-16 tiers (interpret mode).  These are
    the scan-body paths: a pallas operand cannot fuse a dynamic-slice, so the
    scan closes over the [L, in/2, out] stack and routes via "_lyr"."""
    from vibevoice_tpu.ops.int4 import (_int4_matmul_2d, _int4_matmul_stacked,
                                        _int4c_matmul_2d,
                                        _int4c_matmul_stacked,
                                        _int4c_w4a8_matmul_2d,
                                        _int4c_w4a8_matmul_stacked,
                                        quantize_weight_int4,
                                        quantize_weight_int4c)
    rs = np.random.RandomState(11)
    L, inn, out, m = 3, 512, 256, 4
    w = jnp.asarray(rs.randn(L, inn, out), jnp.float32)
    x = jnp.asarray(rs.randn(m, inn), jnp.float32)
    qc = quantize_weight_int4c(w)
    qg = quantize_weight_int4(w)
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0,
                     1e-12)
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    for lyr in (0, 2):
        ref = _int4c_matmul_2d(x, qc["q4c"][lyr], qc["s4c"][lyr],
                               interpret=True)
        got = _int4c_matmul_stacked(x, qc["q4c"], qc["s4c"],
                                    jnp.int32(lyr), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

        ref8 = _int4c_w4a8_matmul_2d(xq, sx, qc["q4c"][lyr], qc["s4c"][lyr],
                                     interpret=True)
        got8 = _int4c_w4a8_matmul_stacked(xq, sx, qc["q4c"], qc["s4c"],
                                          jnp.int32(lyr), interpret=True)
        np.testing.assert_allclose(np.asarray(got8), np.asarray(ref8),
                                   rtol=1e-5, atol=1e-5)

        refg = _int4_matmul_2d(x, qg["q4"][lyr], qg["s4"][lyr],
                               interpret=True)
        gotg = _int4_matmul_stacked(x, qg["q4"], qg["s4"],
                                    jnp.int32(lyr), interpret=True)
        np.testing.assert_allclose(np.asarray(gotg), np.asarray(refg),
                                   rtol=1e-5, atol=1e-5)


def test_lm_head_rows_int4_leaf():
    """Untied lm_head quantized at the int4 tiers: lm_head_rows gathers the
    packed token columns and dequantizes only those (the 7B constrained-
    decode path; regression: dict indexing crashed before int4 support)."""
    from vibevoice_tpu.ops.int4 import (quantize_weight_int4,
                                        quantize_weight_int4c)
    rs = np.random.RandomState(17)
    H, V = 256, 512
    w = jnp.asarray(rs.randn(H, V), jnp.float32)
    ids = np.asarray([3, 100, 511], np.int32)
    for quant, keys in ((quantize_weight_int4c, ("q4c", "s4c")),
                        (quantize_weight_int4, ("q4", "s4"))):
        qw = quant(w)
        got = qwen2.lm_head_rows({"lm_head": qw, "embed": w.T}, ids)
        from vibevoice_tpu.ops.quant import dequantize_any
        ref = np.asarray(dequantize_any(qw, jnp.float32))[:, ids].T
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_int4_layer_view_routing():
    """qmatmul on a "_lyr"-wrapped stacked leaf equals qmatmul on the sliced
    leaf (XLA fallback path on CPU) — the contract the layer scans rely on."""
    from vibevoice_tpu.ops.int4 import quantize_weight_int4c
    from vibevoice_tpu.ops.quant import layer_view, split_stacked_quant

    rs = np.random.RandomState(13)
    w = jnp.asarray(rs.randn(2, 64, 32), jnp.float32)
    layers = {"wq": quantize_weight_int4c(w), "b": jnp.zeros((2, 32))}
    xs, stacked = split_stacked_quant(layers)
    assert set(stacked) == {"wq"} and set(xs) == {"b"}
    x = jnp.asarray(rs.randn(3, 64), jnp.float32)
    for lyr in (0, 1):
        lp = layer_view({"b": layers["b"][lyr]}, stacked, jnp.int32(lyr))
        got = qmatmul(x, lp["wq"])
        ref = qmatmul(x, {"q4c": layers["wq"]["q4c"][lyr],
                          "s4c": layers["wq"]["s4c"][lyr]})
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


def test_int4c_w4a8_kernel_matches_explicit_math():
    """W4A8 int4c kernel (interpret): s8 x s8 MXU dot with scales applied to
    the accumulator equals the explicit int32 math."""
    from vibevoice_tpu.ops.int4 import (_int4c_w4a8_matmul_2d, _unpack_c,
                                        quantize_weight_int4c)
    rs = np.random.RandomState(9)
    m, inn, out = 4, 512, 256
    x = jnp.asarray(rs.randn(m, inn), jnp.float32)
    qw = quantize_weight_int4c(jnp.asarray(rs.randn(inn, out), jnp.float32))
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    y = _int4c_w4a8_matmul_2d(xq, sx, qw["q4c"], qw["s4c"], interpret=True)
    lo, hi = _unpack_c(qw["q4c"])
    q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.int32)
    ref = (jnp.dot(xq.astype(jnp.int32), q).astype(jnp.float32)
           * sx * qw["s4c"].astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int4_lm_forward_close_to_dense():
    cfg = Qwen2DecoderConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256)
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qlm = quantize_lm_params(params, bits=4)
    from vibevoice_tpu.ops.int4 import is_quantized_int4
    assert is_quantized_int4(qlm["layers"]["wq"])

    ids = jnp.asarray(np.random.RandomState(2).randint(0, 128, (2, 6)))
    x = qwen2.embed_tokens(params, ids)
    causal = jnp.arange(6)[None, :, None] >= jnp.arange(6)[None, None, :]
    pos = jnp.broadcast_to(jnp.arange(6), (2, 6))
    h_dense, _ = qwen2.forward(params, cfg, x, pos, None, causal)
    h_q, _ = qwen2.forward(qlm, cfg, x, pos, None, causal)
    # 4-bit error compounds across 2 residual layers; this documents the
    # closeness contract rather than asserting production quality (which is
    # a real-weights validation, see ops/int4.py docstring)
    denom = np.abs(np.asarray(h_dense)).max()
    rel = np.abs(np.asarray(h_q) - np.asarray(h_dense)).max() / denom
    assert rel < 0.35, rel


def test_int4_fallback_to_int8_on_odd_shapes():
    from vibevoice_tpu.ops.int4 import is_quantized_int4
    from vibevoice_tpu.ops.quant import quantize_any
    rs = np.random.RandomState(4)
    qa = quantize_any(jnp.asarray(rs.randn(96, 64), jnp.float32), bits=4)
    assert set(qa.keys()) == {"q", "s"}          # 96 < 2*128 -> int8
    qb = quantize_any(jnp.asarray(rs.randn(256, 64), jnp.float32), bits=4)
    assert is_quantized_int4(qb)


def test_int4_diffusion_head_error_bounded():
    from vibevoice_tpu.config import DiffusionHeadConfig
    from vibevoice_tpu.models import diffusion_head
    from vibevoice_tpu.ops.quant import quantize_diffusion_head_params

    cfg = DiffusionHeadConfig(hidden_size=256, head_layers=2, latent_size=16,
                              freq_embed_size=32)
    rs = np.random.RandomState(0)
    params = diffusion_head.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    params = jax.tree.map(
        lambda x: jnp.asarray(rs.randn(*x.shape).astype(np.float32) * 0.05),
        params)
    qparams = quantize_diffusion_head_params(params, bits=4)

    noisy = jnp.asarray(rs.randn(4, 16), jnp.float32)
    t = jnp.asarray([10., 500., 900., 40.])
    cond = jnp.asarray(rs.randn(4, 256), jnp.float32)
    ref = diffusion_head.apply(params, cfg, noisy, t, cond)
    out = diffusion_head.apply(qparams, cfg, noisy, t, cond)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err <= 0.15 * scale, (err, scale)


def test_int4_sharding_specs_cover_leaves():
    """param_pspecs yields a spec for every int4 sub-leaf (structure match)."""
    from vibevoice_tpu.parallel.sharding import param_pspecs
    cfg = Qwen2DecoderConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256)
    lm = quantize_lm_params(
        qwen2.init_params(jax.random.PRNGKey(0), cfg, jnp.float32), bits=4)
    params = {"lm": lm}
    specs = param_pspecs(params, kv_tp=True, fsdp=True)
    jax.tree.map(lambda a, b: None, params, specs)  # raises on mismatch


def test_w8a8_matches_weight_only_closely():
    """W8A8 (native s8 x s8 MXU dots) stays close to the W8A16 weight-only
    path — the extra error is the activation quantization step."""
    from vibevoice_tpu.ops import quant
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(4, 256), jnp.float32)
    w = jnp.asarray(rs.randn(256, 128), jnp.float32)
    qw = quantize_weight(w)
    y_ref = qmatmul(x, qw)
    quant.set_w8a8(True)
    try:
        y_a8 = qmatmul(x, qw)
    finally:
        quant.set_w8a8(False)
    err = np.abs(np.asarray(y_a8) - np.asarray(y_ref))
    rms_rel = float(np.sqrt((err ** 2).mean())
                    / np.sqrt((np.asarray(y_ref) ** 2).mean()))
    assert rms_rel < 0.02, rms_rel
    # dense weights are untouched by the flag
    quant.set_w8a8(True)
    try:
        np.testing.assert_array_equal(np.asarray(qmatmul(x, w)),
                                      np.asarray(x @ w))
    finally:
        quant.set_w8a8(False)


# ---------------------------------------------------------------------------
# Accuracy gates: outlier-channel fixtures + per-layer auto-fallback policy
# (the known quantization failure mode: one hot input channel inflates every
# per-output-column scale, crushing the resolution of ordinary weights)
# ---------------------------------------------------------------------------

def _gaussian_w(rs, rows=256, cols=128):
    return jnp.asarray(rs.randn(rows, cols), jnp.float32)


def _outlier_w(rs, rows=256, cols=128, hot=100.0):
    w = rs.randn(rows, cols)
    w[rows // 3, :] *= hot                    # one hot input channel
    return jnp.asarray(w, jnp.float32)


def _heavy_tailed_w(rs, rows=256, cols=128):
    return jnp.asarray(rs.standard_t(df=2, size=(rows, cols)), jnp.float32)


def _tier_rel_err(x, w, qw) -> float:
    y = np.asarray(qmatmul(x, qw), np.float32)
    y_ref = np.asarray(x @ w, np.float32)
    return float(np.sqrt(((y - y_ref) ** 2).mean())
                 / (np.sqrt((y_ref ** 2).mean()) + 1e-12))


def test_tier_error_bounds_gaussian_vs_outlier():
    """Measured matmul-output error of every tier on well-behaved vs
    outlier-channel weights.  The outlier fixture must blow up the
    per-column-scale tiers (int8, int4c) — this test fails if a regression
    ever makes outlier damage invisible to the gate metric."""
    from vibevoice_tpu.ops.int4 import (quantize_weight_int4,
                                        quantize_weight_int4c)
    from vibevoice_tpu.ops.quant import weight_rel_error

    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(8, 256), jnp.float32)

    w_good = _gaussian_w(rs)
    w_bad = _outlier_w(rs)

    # well-behaved: every tier within its documented bound
    assert _tier_rel_err(x, w_good, quantize_weight(w_good)) < 0.02
    assert _tier_rel_err(x, w_good, quantize_weight_int4(w_good)) < 0.12
    assert _tier_rel_err(x, w_good, quantize_weight_int4c(w_good)) < 0.25

    # outlier channel: the weight-error gate metric detects the damage
    # (errors concentrate on the ordinary weights, which dominate the output)
    assert weight_rel_error(w_good, quantize_weight(w_good)) < 0.01
    assert weight_rel_error(w_bad, quantize_weight(w_bad)) > 0.02
    assert (weight_rel_error(w_bad, quantize_weight_int4c(w_bad))
            > weight_rel_error(w_bad, quantize_weight(w_bad)))


def test_quantize_any_gate_falls_back_per_tier():
    """The tier ladder demotes until the bound holds: int4c fails the 0.1
    gate on gaussian weights -> int4 group-16 passes; the outlier fixture
    fails even int8 at 0.02 -> dense."""
    from vibevoice_tpu.ops.int4 import is_quantized_int4, is_quantized_int4c
    from vibevoice_tpu.ops.quant import is_quantized, quantize_any

    rs = np.random.RandomState(8)
    w_good = _gaussian_w(rs)
    w_bad = _outlier_w(rs)

    # ungated keeps historical behavior
    assert is_quantized_int4c(quantize_any(w_good, 4, colscale=True))
    assert is_quantized_int4(quantize_any(w_good, 4, colscale=False))

    # gaussian @ 0.1: per-column 4-bit is too coarse, group-16 passes
    q = quantize_any(w_good, 4, colscale=True, max_rel_err=0.1)
    assert is_quantized_int4(q) and not is_quantized_int4c(q)
    # gaussian @ 0.02: both 4-bit tiers fail -> int8
    assert is_quantized(quantize_any(w_good, 4, colscale=True,
                                     max_rel_err=0.02))
    # outlier @ 0.02: every tier fails -> dense passthrough
    out = quantize_any(w_bad, 8, max_rel_err=0.02)
    assert not isinstance(out, dict)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(w_bad))
    # heavy-tailed @ 0.1: 4-bit tiers fail, int8 absorbs the tails
    assert is_quantized(quantize_any(_heavy_tailed_w(rs), 4, colscale=True,
                                     max_rel_err=0.1))


def test_quantize_lm_params_per_layer_gate():
    """One outlier layer demotes only ITS weight stack (wq); the other
    projections keep the int8 tier, and the gated model tracks dense."""
    from vibevoice_tpu.ops.quant import is_quantized

    # wider than TINY: one hot row's error saturates at sqrt(rows)/(127*V12)
    # of the weight RMS, so the gate needs rows >> (127*V12*bound)^2
    cfg = Qwen2DecoderConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256)
    params = qwen2.init_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    wq = np.array(params["layers"]["wq"], np.float32)
    wq[1, 7, :] *= 300.0                     # hot input channel, layer 1 only
    params["layers"]["wq"] = jnp.asarray(wq)

    qlm = quantize_lm_params(params, bits=8, max_rel_err=0.02)
    assert not is_quantized(qlm["layers"]["wq"])          # demoted to dense
    for k in ("wk", "wv", "wo", "wg", "wu", "wd"):
        assert is_quantized(qlm["layers"][k]), k          # others keep int8

    ids = jnp.asarray(np.random.RandomState(4).randint(0, 128, (2, 6)))
    x = qwen2.embed_tokens(params, ids)
    causal = jnp.arange(6)[None, :, None] >= jnp.arange(6)[None, None, :]
    pos = jnp.broadcast_to(jnp.arange(6), (2, 6))
    h_dense, _ = qwen2.forward(params, cfg, x, pos, None, causal)
    h_gated, _ = qwen2.forward(qlm, cfg, x, pos, None, causal)
    rel = (np.abs(np.asarray(h_gated) - np.asarray(h_dense)).max()
           / np.abs(np.asarray(h_dense)).max())
    assert rel < 0.1, rel

    # ungated comparison: the outlier layer poisons the whole wq stack
    q_ungated = quantize_lm_params(params, bits=8)
    h_bad, _ = qwen2.forward(q_ungated, cfg, x, pos, None, causal)
    rel_bad = (np.abs(np.asarray(h_bad) - np.asarray(h_dense)).max()
               / np.abs(np.asarray(h_dense)).max())
    assert rel < rel_bad, (rel, rel_bad)


def test_w8a8_outlier_activation_degrades_documented():
    """W8A8's known failure mode: an outlier ACTIVATION channel inflates the
    per-row dynamic scale.  Measure it against W8A16 on the same weights —
    the degradation must be visible (this is why W8A8 stays opt-in) and the
    well-behaved bound must hold."""
    from vibevoice_tpu.ops import quant

    rs = np.random.RandomState(9)
    w = _gaussian_w(rs)
    qw = quantize_weight(w)

    x_good = np.asarray(rs.randn(8, 256), np.float32)
    x_bad = x_good.copy()
    x_bad[:, 11] *= 100.0                    # hot activation channel

    def err(x):
        x = jnp.asarray(x)
        y16 = np.asarray(qmatmul(x, qw), np.float32)
        quant.set_w8a8(True)
        try:
            y8 = np.asarray(qmatmul(x, qw), np.float32)
        finally:
            quant.set_w8a8(False)
        return float(np.sqrt(((y8 - y16) ** 2).mean())
                     / (np.sqrt((y16 ** 2).mean()) + 1e-12))

    e_good, e_bad = err(x_good), err(x_bad)
    assert e_good < 0.02, e_good             # well-behaved bound
    assert e_bad > 3 * e_good, (e_good, e_bad)   # outlier damage is real


# ---------------------------------------------------------------------------
# NF4-grid comparison (VERDICT r2 missing #3 / next #7): the reference's
# 4-bit tier is bitsandbytes NF4 (main.py:349-354 — quantile grid, blocksize
# 64).  The fidelity tier here is a LINEAR grid at group 16: finer scale
# granularity at the same 0.625 B/param budget.  This test pins the claim
# that justified the design on heavy-tailed (student-t) and outlier-channel
# weight fixtures, not just gaussians.
# ---------------------------------------------------------------------------

_NF4_LEVELS = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0], np.float32)   # QLoRA appendix E / bitsandbytes


def _nf4_roundtrip(w: np.ndarray, block: int = 64) -> np.ndarray:
    """Reference-faithful NF4 quantize->dequantize: per-block absmax
    normalization, nearest quantile level (bitsandbytes default block 64)."""
    flat = w.reshape(-1)
    assert flat.size % block == 0
    blocks = flat.reshape(-1, block)
    absmax = np.maximum(np.abs(blocks).max(axis=1, keepdims=True), 1e-12)
    idx = np.abs((blocks / absmax)[..., None] - _NF4_LEVELS).argmin(-1)
    return (_NF4_LEVELS[idx] * absmax).reshape(w.shape).astype(np.float32)


def test_int4_linear_grid_vs_nf4_on_heavy_tails():
    from vibevoice_tpu.ops.int4 import (dequantize_weight_int4,
                                        quantize_weight_int4)

    rng = np.random.default_rng(0)
    rows, cols = 512, 256
    fixtures = {
        "gauss": rng.normal(0, 0.02, (rows, cols)),
        "t5": rng.standard_t(5, (rows, cols)) * 0.02,
        "t3": rng.standard_t(3, (rows, cols)) * 0.02,
        "t2.5": rng.standard_t(2.5, (rows, cols)) * 0.02,
        "t2": rng.standard_t(2, (rows, cols)) * 0.02,
    }
    out = rng.standard_t(3, (rows, cols)) * 0.02
    out[rows // 3, :] *= 20.0               # hot input channel on heavy tails
    fixtures["t3+outlier"] = out

    for name, w in fixtures.items():
        w = np.asarray(w, np.float32)
        lin = np.asarray(dequantize_weight_int4(
            quantize_weight_int4(jnp.asarray(w)), jnp.float32))
        e_lin = np.linalg.norm(lin - w) / np.linalg.norm(w)
        e_nf4 = np.linalg.norm(_nf4_roundtrip(w) - w) / np.linalg.norm(w)
        # measured (see commit): lin16 beats nf4-64 outright on every
        # distribution; keep 5% slack against rng drift
        assert e_lin <= e_nf4 * 1.05, (name, e_lin, e_nf4)
