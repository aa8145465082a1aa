"""Reference-in-the-loop parity for the full CFG generate loop.

Runs the reference's own `VibeVoiceForConditionalGenerationInference.generate`
(modeling_vibevoice_inference.py:326-708) on tiny shared weights against
`VibeVoiceGenerator.generate`, with identical diffusion noise injected into
the reference via a monkeypatched `torch.randn` (the per-step initial latents
are reconstructed from this framework's documented per-row key derivation).

Determinism knobs:
  * greedy decoding (`do_sample=False`)
  * fix_std=0 so the σ-VAE voice-prompt sample degenerates to the mean
  * algorithm dpmsolver++ (deterministic solver; the SDE variant's step math
    is covered by test_reference_parity.py with injected noise)

Asserted: token sequences match exactly; vocoded audio matches to fp32
accumulation tolerance.  With batch=2 and naturally mixed token patterns this
also exercises the reference's negative-cache shift corrections
(inference:588-622) against the write-pointer reformulation.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import refshim
from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.convert.import_torch import export_state_dict
from vibevoice_tpu.generation import VibeVoiceGenerator
from vibevoice_tpu.generation.generate import _bucket_len, _round_up
from vibevoice_tpu.models import vibevoice
from vibevoice_tpu.schedule.dpm_solver import DPMSolverConfig

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not refshim.reference_available(),
                       reason="reference checkout not present"),
]


class TinyTok:
    """Token ids small enough for the tiny 512 vocab, on both stacks."""
    bos_token_id = None
    eos_token_id = 3
    pad_token_id = 4
    speech_start_id = 10
    speech_end_id = 11
    speech_diffusion_id = 12
    # this framework's attribute spelling
    eos_id = 3
    pad_id = 4


@pytest.fixture(scope="module", params=["tiny", "7b_geometry"])
def cfg(request):
    """Two geometries: the default tiny (12q/2kv-style grouping, tied
    lm_head) and a tiny-LAYER config with the 7B's attention geometry —
    28q/4kv GQA ratio and an UNTIED lm_head
    (reference configs/qwen2.5_7b_32k.json:43-64) — so the head-grouping
    and untied-head generate paths are pinned against the reference's own
    modules, not just HF logit checks (r4 VERDICT #7)."""
    base = VibeVoiceConfig.named("tiny")
    if request.param == "7b_geometry":
        base = dataclasses.replace(
            base,
            decoder=dataclasses.replace(
                base.decoder, hidden_size=224, num_attention_heads=28,
                num_key_value_heads=4, intermediate_size=448,
                tie_word_embeddings=False),
            # head hidden follows the LM hidden (as in the real configs —
            # the LM hidden state is the head's conditioning input)
            diffusion_head=dataclasses.replace(
                base.diffusion_head, hidden_size=224))
    return dataclasses.replace(
        base, acoustic_tokenizer=dataclasses.replace(base.acoustic_tokenizer,
                                                     fix_std=0.0))


@pytest.fixture(scope="module")
def params(cfg):
    p = vibevoice.init_params(jax.random.PRNGKey(21), cfg,
                              dtype=jnp.float32, tok_dtype=jnp.float32)
    # perturb so zero-init tensors (AdaLN, FFN biases, final proj) carry signal
    leaves, treedef = jax.tree_util.tree_flatten(p)
    rng = np.random.default_rng(22)
    leaves = [jnp.asarray(np.asarray(l) + rng.normal(0, 0.05, l.shape), l.dtype)
              if getattr(l, "ndim", 0) > 0 else l for l in leaves]
    p = jax.tree_util.tree_unflatten(treedef, leaves)
    # choreography: alias the diffusion/end token (tied) embedding rows to
    # scaled copies of speech_start's so greedy decoding actually emits
    # diffusion tokens (probed: yields per-row ragged runs of diffusion
    # followed by eos; pure-random rows emit only speech_start forever)
    emb = np.asarray(p["lm"]["embed"]).copy()
    emb[TinyTok.speech_diffusion_id] = emb[TinyTok.speech_start_id] * 1.15
    emb[TinyTok.speech_end_id] = emb[TinyTok.speech_start_id] * 0.9
    # eos stays proportional too: a RANDOM eos row sits within fp32-tie
    # distance of the 0.9x end row whenever h . start_emb is small, and the
    # two stacks then legitimately pick different winners (hit at the 7B
    # geometry); a negative multiple keeps every margin proportional to
    # |h . start_emb| — decisive in either sign
    emb[TinyTok.eos_id] = emb[TinyTok.speech_start_id] * -0.5
    p["lm"] = dict(p["lm"])
    p["lm"]["embed"] = jnp.asarray(emb)
    if "lm_head" in p["lm"]:
        # untied head (7B geometry): logits come from lm_head COLUMNS, so
        # the choreography must alias those too
        lh = np.asarray(p["lm"]["lm_head"]).copy()
        lh[:, TinyTok.speech_diffusion_id] = lh[:, TinyTok.speech_start_id] * 1.15
        lh[:, TinyTok.speech_end_id] = lh[:, TinyTok.speech_start_id] * 0.9
        lh[:, TinyTok.eos_id] = lh[:, TinyTok.speech_start_id] * -0.5
        p["lm"]["lm_head"] = jnp.asarray(lh)
    p["speech_scaling_factor"] = jnp.float32(1.3)
    p["speech_bias_factor"] = jnp.float32(-0.05)
    return p


@pytest.fixture(scope="module")
def ref_infer(cfg, params):
    import torch

    ref = refshim.load_reference()
    if ref.inference is None:
        pytest.skip(f"inference import failed: {ref.inference_error}")
    from test_reference_parity import (_hf_qwen2_config, _ref_acoustic_config,
                                       _ref_semantic_config)

    h = cfg.diffusion_head
    vcfg = ref.configuration.VibeVoiceConfig(
        acoustic_tokenizer_config=_ref_acoustic_config(ref, cfg.acoustic_tokenizer),
        semantic_tokenizer_config=_ref_semantic_config(ref, cfg.semantic_tokenizer),
        decoder_config=_hf_qwen2_config(cfg.decoder),
        diffusion_head_config=ref.configuration.VibeVoiceDiffusionHeadConfig(
            hidden_size=h.hidden_size, head_layers=h.head_layers,
            head_ffn_ratio=h.head_ffn_ratio, rms_norm_eps=h.rms_norm_eps,
            latent_size=h.latent_size, prediction_type=h.prediction_type,
            ddpm_num_steps=h.ddpm_num_steps,
            ddpm_num_inference_steps=h.ddpm_num_inference_steps,
            ddpm_beta_schedule=h.ddpm_beta_schedule,
            ddpm_batch_mul=h.ddpm_batch_mul),
    )
    # transformers 4.57 cache initialization reads decoder geometry off the
    # TOP-level config (4.51, the reference's target, resolved it through the
    # model); mirror the decoder attrs (env compat, not a semantic change)
    qcfg = vcfg.decoder_config
    for attr in ("num_hidden_layers", "num_attention_heads",
                 "num_key_value_heads", "hidden_size", "head_dim",
                 "max_position_embeddings", "vocab_size", "sliding_window",
                 # transformers ties lm_head off the TOP config's flag: the
                 # 7B-geometry (untied) variant silently aliased
                 # embed/lm_head storage without this
                 "tie_word_embeddings"):
        if hasattr(qcfg, attr):
            setattr(vcfg, attr, getattr(qcfg, attr))
    model = ref.inference.VibeVoiceForConditionalGenerationInference(vcfg)
    sd = export_state_dict(params, cfg, dtype=np.float32)
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    missing, unexpected = model.load_state_dict(sd_t, strict=False)
    assert not unexpected, f"extra tensors: {unexpected}"
    assert not missing, f"missing tensors: {missing}"
    return model.eval()


@pytest.fixture(scope="module")
def my_gen(cfg, params):
    solver = DPMSolverConfig(
        num_train_timesteps=cfg.diffusion_head.ddpm_num_steps,
        beta_schedule=cfg.diffusion_head.ddpm_beta_schedule,
        prediction_type=cfg.diffusion_head.prediction_type,
        algorithm_type="dpmsolver++", solver_order=2)
    return VibeVoiceGenerator(params, cfg, TinyTok(), solver=solver,
                              lm_dtype=jnp.float32)


def _expected_t_bucket(gen, t0, cfg):
    """Mirror of generate()'s bucketing so the per-step key fold can be
    reconstructed on the host (generate.py: t_bucket derivation)."""
    t_bucket = min(_bucket_len(t0, 64), cfg.decoder.max_position_embeddings)
    t_bucket = max(t_bucket, t0)
    if t_bucket > gen.prefill_chunk:
        t_bucket = _round_up(t_bucket, gen.prefill_chunk)
    return t_bucket


def _my_initial_latents(seed, b, t_bucket, n_steps, vae_dim):
    """Reconstruct the per-step diffusion initial latents exactly as
    _make_step derives them: fold_in(row key, pos_len) stream 2."""
    rng = jax.random.PRNGKey(seed)
    rng, _k_pre = jax.random.split(rng)
    row_rng = jax.vmap(jax.random.fold_in)(
        jnp.broadcast_to(jnp.asarray(rng, jnp.uint32), (b, 2)),
        jnp.arange(b, dtype=jnp.uint32))
    out = []
    for s in range(n_steps):
        pos = jnp.full((b,), t_bucket + s, jnp.int32)
        step_keys = jax.vmap(jax.random.fold_in)(row_rng, pos)
        k_lat = jax.vmap(jax.random.fold_in)(step_keys,
                                             jnp.full((b,), 2, jnp.uint32))
        out.append(np.asarray(jax.vmap(
            lambda k: jax.random.normal(k, (vae_dim,), jnp.float32))(k_lat)))
    return np.stack(out)  # [S, B, D]


def _run_parity(cfg, params, my_gen, ref_infer, monkeypatch, b, seed=5,
                steps=10, cfg_scale=1.3, audio_atol=2e-4):
    import torch

    tk = TinyTok()
    t0 = 16
    frame = cfg.acoustic_tokenizer.total_stride
    rs = np.random.RandomState(seed)
    ids = rs.randint(20, 200, (b, t0))
    # voice prompt: 3 diffusion slots per row
    ids[:, 2] = tk.speech_start_id
    ids[:, 3:6] = tk.speech_diffusion_id
    ids[:, 6] = tk.speech_end_id
    ids[:, -1] = tk.speech_start_id
    smask = np.zeros((b, t0), bool)
    smask[:, 3:6] = True
    speech = (rs.randn(b, 3 * frame) * 0.1).astype(np.float32)
    sp_masks = np.ones((b, 3), bool)

    # ---- mine ----------------------------------------------------------
    out = my_gen.generate(ids, speech_tensors=speech, speech_masks=sp_masks,
                          speech_input_mask=smask, cfg_scale=cfg_scale,
                          max_new_tokens=steps, chunk_steps=5, seed=0,
                          refresh_negative=True)
    # this framework's sequences are generated-only (reference's include
    # the prompt; sliced off below)
    my_tokens = np.asarray(out.sequences)

    # reconstruct the injected latents for each step where a row diffused
    t_bucket = _expected_t_bucket(my_gen, t0, cfg)
    x_t = _my_initial_latents(0, b, t_bucket,
                              my_tokens.shape[1], cfg.acoustic_vae_dim)
    diffusion_calls = []
    for s in range(my_tokens.shape[1]):
        rows = np.where(my_tokens[:, s] == tk.speech_diffusion_id)[0]
        if rows.size:
            diffusion_calls.append(x_t[s][rows])

    # ---- reference with injected latents --------------------------------
    call_iter = iter(diffusion_calls)
    real_randn = torch.randn

    def fake_randn(*shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list, torch.Size)):
            shape = tuple(shape[0])
        kw2 = {k: v for k, v in kw.items() if k in ("dtype", "device")}
        if len(shape) == 2 and shape[1] == cfg.acoustic_vae_dim:
            rows = next(call_iter)
            assert shape[0] == 2 * rows.shape[0], \
                f"reference diffused {shape[0] // 2} rows, mine {rows.shape[0]}"
            full = np.zeros(shape, np.float32)
            full[:rows.shape[0]] = rows
            return torch.from_numpy(full).to(**kw2) if kw2 else torch.from_numpy(full)
        return torch.zeros(shape, **kw2)

    monkeypatch.setattr(torch, "randn", fake_randn)
    try:
        with torch.no_grad():
            ref_out = ref_infer.generate(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.ones(b, t0, dtype=torch.long),
                tokenizer=tk,
                speech_tensors=torch.from_numpy(speech),
                speech_masks=torch.from_numpy(sp_masks),
                speech_input_mask=torch.from_numpy(smask),
                cfg_scale=cfg_scale, max_new_tokens=steps,
                refresh_negative=True, show_progress_bar=False,
                return_speech=True, do_sample=False)
    finally:
        monkeypatch.setattr(torch, "randn", real_randn)

    ref_tokens = ref_out.sequences.numpy()[:, t0:]

    # reference stops the whole batch early when all rows finish; mine pads
    # the overhang with eos — compare the common prefix + overhang-is-eos
    n = ref_tokens.shape[1]
    np.testing.assert_array_equal(my_tokens[:, :n], ref_tokens)
    assert (my_tokens[:, n:] == tk.eos_id).all()

    for i in range(b):
        ref_audio = ref_out.speech_outputs[i]
        mine_audio = out.speech_outputs[i]
        if ref_audio is None:
            assert mine_audio is None or len(mine_audio) == 0
            continue
        ref_a = ref_audio.numpy().reshape(-1)
        my_a = np.asarray(mine_audio, np.float32).reshape(-1)
        assert my_a.shape == ref_a.shape
        np.testing.assert_allclose(my_a, ref_a, rtol=2e-3, atol=audio_atol)
    # the run must actually exercise the diffusion path to prove anything
    assert any(len(c) for c in diffusion_calls), "no diffusion steps occurred"
    return my_tokens


def _audio_atol(cfg):
    """fp32 accumulation-order drift through the CFG+solver+vocode chain
    scales with the hidden width; 2e-4 holds at hidden 64, the 224-wide 7B
    geometry accumulates ~1e-3 on ~5e-2-magnitude audio (tokens still match
    exactly — the drift is below every decision margin)."""
    return 2e-4 if cfg.decoder.hidden_size <= 64 else 2e-3


def test_generate_microrun_parity_b1(cfg, params, my_gen, ref_infer, monkeypatch):
    _run_parity(cfg, params, my_gen, ref_infer, monkeypatch, b=1, seed=5,
                audio_atol=_audio_atol(cfg))


def test_generate_microrun_parity_b2(cfg, params, my_gen, ref_infer, monkeypatch):
    """batch=2: mixed per-row token patterns exercise the reference's
    negative-cache shift corrections (inference:588-622) vs the
    write-pointer negative context."""
    _run_parity(cfg, params, my_gen, ref_infer, monkeypatch, b=2, seed=6,
                audio_atol=_audio_atol(cfg))
