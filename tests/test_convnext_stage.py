"""Fused ConvNeXt-stage streaming kernel parity (ops/convnext_stage.py).

The kernel must reproduce the per-block reference path — same stacked
int4c weights, same streaming-state semantics — in interpret mode on CPU
(the exact kernel math, minus Mosaic codegen).  Three layers of evidence:
op-level parity on a mid-size stage, tokenizer-level streaming parity on a
full decoder whose big stage is stacked, and batch-mode fallback parity
(the stacked layout must not change non-streaming results).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibevoice_tpu.models import acoustic_tokenizer as tokm
from vibevoice_tpu.ops import int4
from vibevoice_tpu.ops.convnext_stage import convnext_stage_step_int4c


def _mk_blocks(rs, depth, dim, ffn, k=7, dtype=jnp.float32):
    blocks = []
    for _ in range(depth):
        w1 = jnp.asarray(rs.randn(dim, ffn).astype(np.float32) * 0.05)
        w2 = jnp.asarray(rs.randn(ffn, dim).astype(np.float32) * 0.05)
        blocks.append({
            "norm": jnp.asarray(rs.rand(dim).astype(np.float32) + 0.5),
            "mix": {"w": jnp.asarray(rs.randn(k, 1, dim).astype(np.float32) * 0.1),
                    "b": jnp.asarray(rs.randn(dim).astype(np.float32) * 0.01)},
            "gamma": jnp.asarray(rs.rand(dim).astype(np.float32)),
            "ffn_norm": jnp.asarray(rs.rand(dim).astype(np.float32) + 0.5),
            "ffn_w1": int4.quantize_weight_int4c(w1),
            "ffn_b1": jnp.asarray(rs.randn(ffn).astype(np.float32) * 0.01),
            "ffn_w2": int4.quantize_weight_int4c(w2),
            "ffn_b2": jnp.asarray(rs.randn(dim).astype(np.float32) * 0.01),
            "ffn_gamma": jnp.asarray(rs.rand(dim).astype(np.float32)),
        })
    return blocks


class _Cfg:
    layernorm_eps = 1e-5
    kernel_size = 7


def test_fused_stage_matches_per_block_loop():
    rs = np.random.RandomState(0)
    depth, b, dim, ffn, k = 3, 2, 256, 1024, 7
    blocks = _mk_blocks(rs, depth, dim, ffn, k)
    sp = tokm.stack_stage(blocks)
    assert sp is not None

    x = jnp.asarray(rs.randn(b, 1, dim).astype(np.float32) * 0.5)
    state = jnp.asarray(rs.randn(depth, b, k - 1, dim).astype(np.float32) * 0.3)

    # reference: the per-block path on the SAME weights (xla int4c matmuls)
    xr = x
    ref_states = []
    with int4.impl_scope("xla"):
        for j in range(depth):
            xr, s = tokm._block(xr, blocks[j], _Cfg, state[j])
            ref_states.append(s)
    ref_state = jnp.stack(ref_states)

    y, new_state = convnext_stage_step_int4c(x[:, 0], state, sp,
                                             eps=_Cfg.layernorm_eps,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(xr[:, 0]),
                               rtol=2e-4, atol=2e-4)
    # the state rows are normed activations whose upstream matmuls use the
    # algebraic p/u recombination vs XLA's dequant-dot — ~1e-5 float drift
    np.testing.assert_allclose(np.asarray(new_state), np.asarray(ref_state),
                               rtol=1e-3, atol=1e-4)


def _quantize_tiny_int4c(params, monkeypatch):
    from vibevoice_tpu.ops import quant
    monkeypatch.setattr(quant, "_INT4_MIN_PARAMS", 0)
    return quant.quantize_tokenizer_params(params, bits=4, colscale=True,
                                           convs=True)


def test_stacked_decoder_streaming_matches_unstacked(monkeypatch):
    from vibevoice_tpu.config import VibeVoiceConfig

    cfg = VibeVoiceConfig.named("tiny").acoustic_tokenizer
    rs = np.random.RandomState(1)
    params = tokm.init_decoder_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    qp = _quantize_tiny_int4c(params, monkeypatch)
    sp = tokm.stack_tokenizer_stages(qp)
    assert any(tokm.is_stacked_stage(st) for st in sp["stages"])

    lat = jnp.asarray(rs.randn(1, 4, cfg.vae_dim).astype(np.float32) * 0.5)

    st_u = tokm.init_decoder_state(cfg, 1, jnp.float32, params=qp)
    st_s = tokm.init_decoder_state(cfg, 1, jnp.float32, params=sp)
    outs_u, outs_s = [], []
    for t in range(lat.shape[1]):
        with int4.impl_scope("xla"):
            yu, st_u = tokm.decode(qp, cfg, lat[:, t:t + 1], st_u)
        with int4.impl_scope("interpret"):
            ys, st_s = tokm.decode(sp, cfg, lat[:, t:t + 1], st_s)
        outs_u.append(np.asarray(yu))
        outs_s.append(np.asarray(ys))
    np.testing.assert_allclose(np.concatenate(outs_s, axis=1),
                               np.concatenate(outs_u, axis=1),
                               rtol=2e-4, atol=2e-4)


def test_stacked_batch_mode_matches_unstacked(monkeypatch):
    """Batch (non-streaming) mode takes the per-block fallback through the
    stacked views — results must equal the plain list layout exactly."""
    from vibevoice_tpu.config import VibeVoiceConfig

    cfg = VibeVoiceConfig.named("tiny").acoustic_tokenizer
    rs = np.random.RandomState(3)
    params = tokm.init_decoder_params(jax.random.PRNGKey(4), cfg, jnp.float32)
    qp = _quantize_tiny_int4c(params, monkeypatch)
    sp = tokm.stack_tokenizer_stages(qp)

    lat = jnp.asarray(rs.randn(2, 3, cfg.vae_dim).astype(np.float32) * 0.5)
    with int4.impl_scope("xla"):
        yu, _ = tokm.decode(qp, cfg, lat)
        ys, _ = tokm.decode(sp, cfg, lat)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yu), atol=1e-6)

def test_bench_full_quant_tiers_restacks_stages(monkeypatch):
    """r4 regression: bench quantizes tokenizer stacks AFTER generator
    construction (full_quant_tiers mutates gen.params in place), which
    bypasses the construction-time stacking — the int4 bench tier then
    silently ran 2*depth per-block matmul calls per step instead of the
    fused stage kernel (caught by on-chip profiling).  full_quant_tiers
    must leave eligible stages stacked."""
    import bench
    from vibevoice_tpu.config import VibeVoiceConfig
    from vibevoice_tpu.ops import quant

    monkeypatch.setattr(quant, "_INT4_MIN_PARAMS", 0)
    monkeypatch.setenv("VIBEVOICE_FUSE_STAGE", "1")
    cfg = VibeVoiceConfig.named("tiny")
    gp = {
        "acoustic": {"decoder": tokm.init_decoder_params(
            jax.random.PRNGKey(0), cfg.acoustic_tokenizer, jnp.float32)},
        "semantic": tokm.init_encoder_params(
            jax.random.PRNGKey(1), cfg.semantic_tokenizer, jnp.float32),
    }
    bench.full_quant_tiers(gp, 4, True)
    assert any(tokm.is_stacked_stage(st)
               for st in gp["acoustic"]["decoder"]["stages"])
    assert any(tokm.is_stacked_stage(st) for st in gp["semantic"]["stages"])

def test_fused_stage_multiblock_w1_matches_per_block(monkeypatch):
    """Multi-phase w1 blocking (the real 2048-channel stages run n1 > 1 w1
    phases per block).  Force it on the CPU-sized stage by shrinking the
    block width."""
    from vibevoice_tpu.ops import convnext_stage as cs

    monkeypatch.setattr(cs, "_BO1", 256)   # ffn 1024 -> n1 = 4
    rs = np.random.RandomState(7)
    depth, b, dim, ffn, k = 3, 2, 256, 1024, 7
    blocks = _mk_blocks(rs, depth, dim, ffn, k)
    sp = tokm.stack_stage(blocks)
    x = jnp.asarray(rs.randn(b, 1, dim).astype(np.float32) * 0.5)
    state = jnp.asarray(rs.randn(depth, b, k - 1, dim).astype(np.float32) * 0.3)

    xr = x
    ref_states = []
    with int4.impl_scope("xla"):
        for j in range(depth):
            xr, s = tokm._block(xr, blocks[j], _Cfg, state[j])
            ref_states.append(s)
    ref_state = jnp.stack(ref_states)

    y, new_state = cs.convnext_stage_step_int4c(
        x[:, 0], state, sp, eps=_Cfg.layernorm_eps, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(xr[:, 0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(new_state), np.asarray(ref_state),
                               rtol=1e-3, atol=1e-4)

def test_fused_stage_a8_mode_close_to_w4a16(monkeypatch):
    """The a8 serving mode (int8 activations, s8xs8->s32 MXU dots — the
    convert-free speed path) must track the exact W4A16 result within
    per-row int8 quantization error.  Gate: relative L2 error under 2%
    and the carried conv state close (downstream blocks see a8-perturbed
    inputs, so the state drifts by the same quantization-error order)."""
    from vibevoice_tpu.ops import convnext_stage as cs

    monkeypatch.setattr(cs, "_BO1", 256)   # ffn 1024 -> n1 = 4, nk2 = 2
    rs = np.random.RandomState(11)
    depth, b, dim, ffn, k = 3, 2, 256, 1024, 7
    blocks = _mk_blocks(rs, depth, dim, ffn, k)
    sp = tokm.stack_stage(blocks)
    x = jnp.asarray(rs.randn(b, 1, dim).astype(np.float32) * 0.5)
    state = jnp.asarray(rs.randn(depth, b, k - 1, dim).astype(np.float32) * 0.3)

    y16, st16 = cs.convnext_stage_step_int4c(
        x[:, 0], state, sp, eps=_Cfg.layernorm_eps, interpret=True, a8=False)
    y8, st8 = cs.convnext_stage_step_int4c(
        x[:, 0], state, sp, eps=_Cfg.layernorm_eps, interpret=True, a8=True)
    rel = (np.linalg.norm(np.asarray(y8 - y16))
           / max(np.linalg.norm(np.asarray(y16)), 1e-9))
    assert rel < 0.02, rel
    rel_st = (np.linalg.norm(np.asarray(st8 - st16))
              / max(np.linalg.norm(np.asarray(st16)), 1e-9))
    assert rel_st < 0.02, rel_st
