"""Full-shape checkpoint rehearsal: real-1.5B-shape interop with the
reference converter's artifact layout.

Writes a reference-named random checkpoint at REAL 1.5B shapes to disk —
sharded safetensors (<=2 GB shards), ``model.safetensors.index.json``,
``config.json``, ``preprocessor_config.json``, exactly the layout the
reference converter emits (reference convert_nnscaler_checkpoint_to_
transformers.py:92-124) — then ``load_pretrained`` -> 2 generate steps ->
``export_state_dict`` -> byte-compare.  Catches the name/layout/dtype drift
that tiny-shape fixtures cannot (shard splitting, bf16 preservation, 7B
untied lm_head, head_dim defaults).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.convert.import_torch import (_SD, _import_lm, _lin,
                                                export_state_dict,
                                                load_pretrained,
                                                write_hf_checkpoint)
from vibevoice_tpu.models import vibevoice


def _ramp_tree(shapes):
    """Deterministic cheap fill: last-axis ramp + per-leaf offset + axis-0
    layer offset, so transpose/stack mistakes change bytes."""
    counter = [0]

    def fill(s):
        i = counter[0]
        counter[0] += 1
        dt = np.dtype(s.dtype)
        if not s.shape:
            return np.asarray(0.5 + i * 0.001, dt)
        last = s.shape[-1]
        base = (np.arange(last, dtype=np.float32) / last) + (i % 31) * 0.03125
        arr = np.broadcast_to(base, s.shape)
        if len(s.shape) >= 2:
            lead = np.arange(s.shape[0], dtype=np.float32) * (1.0 / 512)
            arr = arr + lead.reshape((-1,) + (1,) * (len(s.shape) - 1))
        return np.ascontiguousarray(arr.astype(dt))

    return jax.tree.map(fill, shapes)


class _Tok:
    from vibevoice_tpu.processor.text_tokenizer import (EOS_ID, PAD_ID,
                                                        SPEECH_DIFFUSION_ID,
                                                        SPEECH_END_ID,
                                                        SPEECH_START_ID)
    eos_id = EOS_ID
    bos_id = EOS_ID
    speech_start_id = SPEECH_START_ID
    speech_end_id = SPEECH_END_ID
    speech_diffusion_id = SPEECH_DIFFUSION_ID
    pad_id = PAD_ID


@pytest.mark.slow
def test_full_shape_1p5b_checkpoint_roundtrip(tmp_path):
    cfg = VibeVoiceConfig.named("1.5b")
    shapes = jax.eval_shape(
        lambda k: vibevoice.init_params(k, cfg, jnp.bfloat16),
        jax.random.PRNGKey(0))
    tree = _ramp_tree(shapes)

    outdir = str(tmp_path / "ckpt")
    wmap = write_hf_checkpoint(tree, cfg, outdir, dtype=None)

    # --- artifact layout: the converter's exact file set -------------------
    files = sorted(os.listdir(outdir))
    assert "config.json" in files and "preprocessor_config.json" in files
    shard_files = [f for f in files if f.endswith(".safetensors")]
    assert len(shard_files) >= 2, "1.5B bf16 must split into >=2 2GB shards"
    assert "model.safetensors.index.json" in files
    with open(os.path.join(outdir, "model.safetensors.index.json")) as f:
        index = json.load(f)
    assert set(index["weight_map"]) == set(wmap)
    total = sum(os.path.getsize(os.path.join(outdir, s)) for s in shard_files)
    assert index["metadata"]["total_size"] <= total  # headers add bytes
    for s in shard_files:
        assert os.path.getsize(os.path.join(outdir, s)) <= 2 * 1024 ** 3 + 1024
    with open(os.path.join(outdir, "preprocessor_config.json")) as f:
        pc = json.load(f)
    assert pc["speech_tok_compress_ratio"] == 3200
    assert pc["audio_processor"]["sampling_rate"] == 24000

    # canonical reference names present (drift tripwire)
    for name in ("model.language_model.embed_tokens.weight",
                 "model.language_model.layers.27.mlp.down_proj.weight",
                 "model.acoustic_tokenizer.decoder.upsample_layers.1.0"
                 ".convtr.convtr.weight",
                 "model.prediction_head.final_layer.linear.weight",
                 "model.speech_scaling_factor"):
        assert name in wmap, name
    # tied 1.5B: save_pretrained drops the aliased head
    assert "lm_head.weight" not in wmap

    # --- load -> generate 2 steps -> export -> byte-compare ----------------
    params, cfg2 = load_pretrained(outdir)
    assert cfg2.decoder.num_hidden_layers == cfg.decoder.num_hidden_layers

    from vibevoice_tpu.generation import VibeVoiceGenerator
    gen = VibeVoiceGenerator(params, cfg2, _Tok(), ddpm_inference_steps=2,
                             lm_dtype=jnp.bfloat16)
    ids = np.full((1, 8), 99, np.int64)
    ids[:, -1] = _Tok.speech_start_id
    out = gen.generate(ids, cfg_scale=1.3, max_new_tokens=2, chunk_steps=2,
                       max_length_times=1000.0, refresh_negative=False)
    assert out.sequences.shape[1] == 2

    sd_back = export_state_dict(params, cfg2, dtype=None)
    if cfg2.decoder.tie_word_embeddings:
        sd_back.pop("lm_head.weight", None)
    from safetensors import safe_open
    seen = set()
    for s in shard_files:
        with safe_open(os.path.join(outdir, s), framework="np") as f:
            for k in f.keys():
                ref = f.get_tensor(k)
                got = np.ascontiguousarray(sd_back[k])
                assert got.dtype == ref.dtype, k
                assert got.shape == ref.shape, k
                assert got.tobytes() == ref.tobytes(), f"byte drift in {k}"
                seen.add(k)
    assert seen == set(sd_back)


@pytest.mark.slow
def test_7b_untied_lm_head_real_shapes():
    """The 7B config unties lm_head; exercise the import path at REAL 7B LM
    shapes (broadcast-backed source tensors keep RAM bounded) and the full
    tree via eval_shape."""
    cfg = VibeVoiceConfig.named("7b")
    assert not cfg.decoder.tie_word_embeddings
    shapes = jax.eval_shape(
        lambda k: vibevoice.init_params(k, cfg, jnp.bfloat16),
        jax.random.PRNGKey(0))
    assert "lm_head" in shapes["lm"]
    d = cfg.decoder
    assert shapes["lm"]["lm_head"].shape == (d.hidden_size, d.vocab_size)
    assert shapes["lm"]["layers"]["wq"].shape == (
        d.num_hidden_layers, d.hidden_size,
        d.num_attention_heads * d.resolved_head_dim)

    # reference-named torch-layout source at real shapes; ramp on the torch
    # "in" axis so the transpose into our [in, out] layout is observable
    L, H = d.num_hidden_layers, d.hidden_size
    kvh = d.num_key_value_heads * d.resolved_head_dim
    qh = d.num_attention_heads * d.resolved_head_dim
    inter, vocab = d.intermediate_size, d.vocab_size

    def t_lin(out_f, in_f):            # torch [out, in], ramp along in
        return np.broadcast_to(
            (np.arange(in_f, dtype=np.float32) % 509).astype(
                np.dtype(jnp.bfloat16)), (out_f, in_f))

    sd = {"model.language_model.embed_tokens.weight": t_lin(vocab, H),
          "model.language_model.norm.weight": t_lin(1, H)[0],
          "lm_head.weight": t_lin(vocab, H)}
    for i in range(L):
        p = f"model.language_model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = t_lin(1, H)[0]
        sd[f"{p}.post_attention_layernorm.weight"] = t_lin(1, H)[0]
        sd[f"{p}.self_attn.q_proj.weight"] = t_lin(qh, H)
        sd[f"{p}.self_attn.q_proj.bias"] = t_lin(1, qh)[0]
        sd[f"{p}.self_attn.k_proj.weight"] = t_lin(kvh, H)
        sd[f"{p}.self_attn.k_proj.bias"] = t_lin(1, kvh)[0]
        sd[f"{p}.self_attn.v_proj.weight"] = t_lin(kvh, H)
        sd[f"{p}.self_attn.v_proj.bias"] = t_lin(1, kvh)[0]
        sd[f"{p}.self_attn.o_proj.weight"] = t_lin(H, qh)
        sd[f"{p}.mlp.gate_proj.weight"] = t_lin(inter, H)
        sd[f"{p}.mlp.up_proj.weight"] = t_lin(inter, H)
        sd[f"{p}.mlp.down_proj.weight"] = t_lin(H, inter)

    lm = _import_lm(_SD(sd), d, jnp.bfloat16)
    assert lm["lm_head"].shape == (H, vocab)
    assert lm["layers"]["wd"].shape == (L, inter, H)
    # transpose check: source ramp ran along torch "in"; ours runs along
    # axis 0 of [in, out]
    col = np.asarray(lm["lm_head"][:8, 0], np.float32)
    np.testing.assert_array_equal(col, np.arange(8, dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(_lin(np.asarray(sd["lm_head.weight"]))[:8, 0], np.float32),
        col)
