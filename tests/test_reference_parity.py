"""Reference-in-the-loop parity: the reference's *running torch code* is the
oracle for every layer below the Qwen2 LM (the LM itself is HF-parity tested
in test_qwen2.py).

Shared random weights are exported from the JAX pytree with
`convert.import_torch.export_state_dict` (reference naming) and loaded into
the reference's own modules (via tests/refshim.py), then both stacks run the
same inputs in fp32:

  * acoustic σ-VAE encode/decode, batch AND streaming-cache mode
    (reference modular_vibevoice_tokenizer.py:1002-1115, streaming :327-549)
  * semantic encode (:1118-1186)
  * diffusion head forward (modular_vibevoice_diffusion_head.py:254-280)
  * DPM-Solver set_timesteps/step chains, deterministic + SDE with injected
    noise, and add_noise/get_velocity (schedule/dpm_solver.py)

Tolerances: fp32, identical math orders differ only by reduction order;
1e-4-relative is the documented bound.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import refshim
from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.convert.import_torch import export_state_dict
from vibevoice_tpu.models import acoustic_tokenizer as tok
from vibevoice_tpu.models import diffusion_head, vibevoice
from vibevoice_tpu.schedule import dpm_solver as my_solver

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not refshim.reference_available(),
                       reason="reference checkout not present"),
]

RTOL, ATOL = 1e-4, 1e-5


@pytest.fixture(scope="module")
def ref():
    return refshim.load_reference()


@pytest.fixture(scope="module")
def cfg():
    return VibeVoiceConfig.named("tiny")


def _randomize(params, seed=0, std=0.05):
    """Perturb every array leaf around its init so zero-init tensors (AdaLN,
    output proj, FFN biases) carry signal — a dropped/mis-mapped tensor then
    shows up as a numeric mismatch instead of silently comparing 0 == 0."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    out = []
    for leaf in leaves:
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) > 0:
            out.append(jnp.asarray(
                np.asarray(leaf) + rng.normal(0.0, std, leaf.shape),
                leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.fixture(scope="module")
def params(cfg):
    p = vibevoice.init_params(jax.random.PRNGKey(7), cfg,
                              dtype=jnp.float32, tok_dtype=jnp.float32)
    p = _randomize(p)
    # concrete calibration scalars so the scaled paths are exercised
    p["speech_scaling_factor"] = jnp.float32(1.3)
    p["speech_bias_factor"] = jnp.float32(-0.05)
    return p


@pytest.fixture(scope="module")
def state_dict(params, cfg):
    return export_state_dict(params, cfg, dtype=np.float32)


def _ref_acoustic_config(ref, c):
    return ref.configuration.VibeVoiceAcousticTokenizerConfig(
        channels=c.channels, vae_dim=c.vae_dim, fix_std=c.fix_std,
        std_dist_type=c.std_dist_type,
        encoder_n_filters=c.encoder_n_filters,
        decoder_n_filters=c.decoder_n_filters,
        encoder_ratios=list(c.encoder_ratios),
        decoder_ratios=list(c.decoder_ratios),
        encoder_depths="-".join(map(str, c.encoder_depths)),
        decoder_depths=None if c.decoder_depths is None
        else "-".join(map(str, c.decoder_depths)),
        causal=c.causal, conv_bias=c.conv_bias, conv_norm=c.conv_norm,
        pad_mode=c.pad_mode, layernorm=c.layernorm,
        layernorm_eps=c.layernorm_eps,
        layernorm_elementwise_affine=c.layernorm_elementwise_affine,
        mixer_layer=c.mixer_layer,
        layer_scale_init_value=c.layer_scale_init_value,
        disable_last_norm=c.disable_last_norm,
        weight_init_value=c.weight_init_value)


def _ref_semantic_config(ref, c):
    return ref.configuration.VibeVoiceSemanticTokenizerConfig(
        channels=c.channels, vae_dim=c.vae_dim, fix_std=c.fix_std,
        std_dist_type=c.std_dist_type,
        encoder_n_filters=c.encoder_n_filters,
        encoder_ratios=list(c.encoder_ratios),
        encoder_depths="-".join(map(str, c.encoder_depths)),
        causal=c.causal, conv_bias=c.conv_bias, conv_norm=c.conv_norm,
        pad_mode=c.pad_mode, layernorm=c.layernorm,
        layernorm_eps=c.layernorm_eps,
        layernorm_elementwise_affine=c.layernorm_elementwise_affine,
        mixer_layer=c.mixer_layer,
        layer_scale_init_value=c.layer_scale_init_value,
        disable_last_norm=c.disable_last_norm,
        weight_init_value=c.weight_init_value)


def _load_strict(module, sd):
    missing, unexpected = module.load_state_dict(sd, strict=False)
    assert not missing, f"reference module misses tensors: {missing}"
    assert not unexpected, f"export produced extra tensors: {unexpected}"
    return module.eval()


@pytest.fixture(scope="module")
def ref_acoustic(ref, cfg, state_dict):
    model = ref.tokenizer.VibeVoiceAcousticTokenizerModel(
        _ref_acoustic_config(ref, cfg.acoustic_tokenizer))
    return _load_strict(model, refshim.torch_subtree(
        state_dict, "model.acoustic_tokenizer."))


@pytest.fixture(scope="module")
def ref_semantic(ref, cfg, state_dict):
    model = ref.tokenizer.VibeVoiceSemanticTokenizerModel(
        _ref_semantic_config(ref, cfg.semantic_tokenizer))
    return _load_strict(model, refshim.torch_subtree(
        state_dict, "model.semantic_tokenizer."))


# ---------------------------------------------------------------------------
# Acoustic / semantic tokenizers
# ---------------------------------------------------------------------------

def test_acoustic_encode_batch_parity(ref_acoustic, params, cfg):
    import torch

    acfg = cfg.acoustic_tokenizer
    stride = acfg.total_stride
    audio = np.random.default_rng(1).normal(0, 0.3, (2, 20 * stride)).astype(np.float32)

    mine, _ = tok.encode(params["acoustic"]["encoder"], acfg,
                         jnp.asarray(audio)[..., None])
    with torch.no_grad():
        theirs = ref_acoustic.encode(torch.from_numpy(audio)[:, None, :]).mean

    np.testing.assert_allclose(np.asarray(mine), theirs.numpy(),
                               rtol=RTOL, atol=ATOL)


def test_acoustic_decode_batch_parity(ref_acoustic, params, cfg):
    import torch

    acfg = cfg.acoustic_tokenizer
    lat = np.random.default_rng(2).normal(0, 1.0, (2, 12, acfg.vae_dim)).astype(np.float32)

    mine, _ = tok.decode(params["acoustic"]["decoder"], acfg, jnp.asarray(lat))
    with torch.no_grad():
        theirs = ref_acoustic.decode(torch.from_numpy(lat))

    np.testing.assert_allclose(np.asarray(mine)[..., 0],
                               theirs.numpy()[:, 0, :], rtol=RTOL, atol=ATOL)


def test_acoustic_streaming_decode_parity(ref, ref_acoustic, params, cfg):
    """Frame-by-frame decode with the reference's streaming cache vs the
    functional state pytree: outputs must agree frame-for-frame (and with the
    reference's own batch mode, which the reference defines as the contract —
    tokenizer.py:478-549)."""
    import torch

    acfg = cfg.acoustic_tokenizer
    frames = 6
    lat = np.random.default_rng(3).normal(0, 1.0, (2, frames, acfg.vae_dim)).astype(np.float32)

    cache = ref.tokenizer.VibeVoiceTokenizerStreamingCache()
    idx = torch.arange(2)
    ref_chunks = []
    with torch.no_grad():
        for i in range(frames):
            chunk = ref_acoustic.decode(torch.from_numpy(lat[:, i:i + 1, :]),
                                        cache=cache, sample_indices=idx,
                                        use_cache=True)
            ref_chunks.append(chunk.numpy()[:, 0, :])
    ref_stream = np.concatenate(ref_chunks, axis=-1)

    state = tok.init_decoder_state(acfg, 2, jnp.float32)
    my_chunks = []
    for i in range(frames):
        y, state = tok.decode(params["acoustic"]["decoder"], acfg,
                              jnp.asarray(lat[:, i:i + 1, :]), state)
        my_chunks.append(np.asarray(y)[..., 0])
    my_stream = np.concatenate(my_chunks, axis=1)

    with torch.no_grad():
        ref_batch = ref_acoustic.decode(torch.from_numpy(lat)).numpy()[:, 0, :]

    np.testing.assert_allclose(ref_stream, ref_batch, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(my_stream, ref_stream, rtol=RTOL, atol=ATOL)


def test_acoustic_streaming_encode_parity(ref, ref_acoustic, params, cfg):
    import torch

    acfg = cfg.acoustic_tokenizer
    stride = acfg.total_stride
    chunks = 5
    audio = np.random.default_rng(4).normal(
        0, 0.3, (2, chunks * 4 * stride)).astype(np.float32)

    cache = ref.tokenizer.VibeVoiceTokenizerStreamingCache()
    idx = torch.arange(2)
    ref_parts = []
    with torch.no_grad():
        for i in range(chunks):
            seg = torch.from_numpy(
                audio[:, i * 4 * stride:(i + 1) * 4 * stride])[:, None, :]
            ref_parts.append(ref_acoustic.encode(
                seg, cache=cache, sample_indices=idx, use_cache=True).mean.numpy())
    ref_stream = np.concatenate(ref_parts, axis=1)

    state = tok.init_encoder_state(acfg, 2, jnp.float32)
    my_parts = []
    for i in range(chunks):
        seg = jnp.asarray(audio[:, i * 4 * stride:(i + 1) * 4 * stride])[..., None]
        y, state = tok.encode(params["acoustic"]["encoder"], acfg, seg, state)
        my_parts.append(np.asarray(y))
    my_stream = np.concatenate(my_parts, axis=1)

    np.testing.assert_allclose(my_stream, ref_stream, rtol=RTOL, atol=ATOL)


def test_semantic_encode_parity(ref_semantic, params, cfg):
    import torch

    scfg = cfg.semantic_tokenizer
    stride = scfg.total_stride
    audio = np.random.default_rng(5).normal(0, 0.3, (2, 16 * stride)).astype(np.float32)

    mine, _ = tok.encode(params["semantic"], scfg, jnp.asarray(audio)[..., None])
    with torch.no_grad():
        theirs = ref_semantic.encode(torch.from_numpy(audio)[:, None, :]).mean

    np.testing.assert_allclose(np.asarray(mine), theirs.numpy(),
                               rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# Diffusion head
# ---------------------------------------------------------------------------

def test_diffusion_head_parity(ref, params, cfg, state_dict):
    import torch

    hcfg = cfg.diffusion_head
    ref_cfg = ref.configuration.VibeVoiceDiffusionHeadConfig(
        hidden_size=hcfg.hidden_size, head_layers=hcfg.head_layers,
        head_ffn_ratio=hcfg.head_ffn_ratio, rms_norm_eps=hcfg.rms_norm_eps,
        latent_size=hcfg.latent_size, prediction_type=hcfg.prediction_type,
        diffusion_type=hcfg.diffusion_type, ddpm_num_steps=hcfg.ddpm_num_steps,
        ddpm_num_inference_steps=hcfg.ddpm_num_inference_steps,
        ddpm_beta_schedule=hcfg.ddpm_beta_schedule,
        ddpm_batch_mul=hcfg.ddpm_batch_mul)
    model = _load_strict(ref.head.VibeVoiceDiffusionHead(ref_cfg),
                         refshim.torch_subtree(state_dict, "model.prediction_head."))

    rng = np.random.default_rng(6)
    n = 6
    noisy = rng.normal(0, 1, (n, hcfg.latent_size)).astype(np.float32)
    t = np.array([999.0, 500.0, 250.5, 17.0, 3.0, 0.0], np.float32)
    cond = rng.normal(0, 0.5, (n, hcfg.hidden_size)).astype(np.float32)

    mine = diffusion_head.apply(params["diffusion_head"], hcfg,
                                jnp.asarray(noisy), jnp.asarray(t),
                                jnp.asarray(cond))
    with torch.no_grad():
        theirs = model(torch.from_numpy(noisy), torch.from_numpy(t),
                       torch.from_numpy(cond))

    np.testing.assert_allclose(np.asarray(mine), theirs.numpy(),
                               rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# DPM-Solver scheduler
# ---------------------------------------------------------------------------

_SOLVER_CASES = [
    # (algorithm, beta_schedule, prediction_type, order, steps)
    ("dpmsolver++", "cosine", "v_prediction", 2, 10),
    ("dpmsolver++", "cosine", "v_prediction", 2, 5),
    ("dpmsolver++", "linear", "epsilon", 2, 8),
    ("dpmsolver++", "cauchy", "v_prediction", 2, 10),
    ("dpmsolver++", "laplace", "v_prediction", 3, 10),
    ("dpmsolver", "scaled_linear", "epsilon", 2, 10),
]


@pytest.mark.parametrize("algo,betas,pred,order,steps", _SOLVER_CASES)
def test_solver_chain_parity(ref, algo, betas, pred, order, steps):
    import torch

    # the non-++ algorithms reject final_sigmas_type='zero'
    # (reference dpm_solver.py:281-284)
    fst = "zero" if algo.endswith("++") else "sigma_min"
    ref_sched = ref.dpm_solver.DPMSolverMultistepScheduler(
        num_train_timesteps=1000, beta_schedule=betas, prediction_type=pred,
        algorithm_type=algo, solver_order=order, final_sigmas_type=fst)
    ref_sched.set_timesteps(num_inference_steps=steps)

    cfg = my_solver.DPMSolverConfig(
        num_train_timesteps=1000, beta_schedule=betas, prediction_type=pred,
        algorithm_type=algo, solver_order=order, final_sigmas_type=fst)
    sched = my_solver.make_schedule(cfg, steps)

    np.testing.assert_allclose(
        np.asarray(sched.timesteps),
        ref_sched.timesteps.numpy().astype(np.float32), atol=0)

    rng = np.random.default_rng(8)
    x_ref = torch.from_numpy(rng.normal(0, 1, (3, 8)).astype(np.float32))
    model_outs = rng.normal(0, 1, (steps, 3, 8)).astype(np.float32)

    x_mine = jnp.asarray(x_ref.numpy())
    m_prev = jnp.zeros_like(x_mine)
    m_prev2 = jnp.zeros_like(x_mine)
    for i, t in enumerate(ref_sched.timesteps):
        with torch.no_grad():
            x_ref = ref_sched.step(torch.from_numpy(model_outs[i]), t,
                                   x_ref).prev_sample
        x_next, m = my_solver.solver_step(sched, i, x_mine, m_prev,
                                          jnp.asarray(model_outs[i]),
                                          m_prev2=m_prev2)
        x_mine, m_prev2, m_prev = x_next, m_prev, m

    np.testing.assert_allclose(np.asarray(x_mine), x_ref.numpy(),
                               rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize("algo", ["sde-dpmsolver++"])
def test_solver_sde_chain_parity_injected_noise(ref, algo):
    """SDE variant with identical noise injected into both stacks (the shim's
    randn_tensor hook feeds the reference; solver_step takes noise directly)."""
    import torch

    steps = 10
    rng = np.random.default_rng(9)
    noises = rng.normal(0, 1, (steps, 3, 8)).astype(np.float32)
    model_outs = rng.normal(0, 1, (steps, 3, 8)).astype(np.float32)

    ref_sched = ref.dpm_solver.DPMSolverMultistepScheduler(
        num_train_timesteps=1000, beta_schedule="cosine",
        prediction_type="v_prediction", algorithm_type=algo, solver_order=2)
    ref_sched.set_timesteps(num_inference_steps=steps)

    consumed = []

    def hook(shape):
        t = torch.from_numpy(noises[len(consumed)])
        consumed.append(shape)
        return t

    x0 = rng.normal(0, 1, (3, 8)).astype(np.float32)
    x_ref = torch.from_numpy(x0.copy())
    refshim.NOISE_HOOK = hook
    try:
        with torch.no_grad():
            for i, t in enumerate(ref_sched.timesteps):
                x_ref = ref_sched.step(torch.from_numpy(model_outs[i]), t,
                                       x_ref).prev_sample
    finally:
        refshim.NOISE_HOOK = None
    assert len(consumed) == steps

    cfg = my_solver.DPMSolverConfig(
        num_train_timesteps=1000, beta_schedule="cosine",
        prediction_type="v_prediction", algorithm_type=algo, solver_order=2)
    sched = my_solver.make_schedule(cfg, steps)
    x_mine = jnp.asarray(x0)
    m_prev = jnp.zeros_like(x_mine)
    m_prev2 = jnp.zeros_like(x_mine)
    for i in range(steps):
        x_next, m = my_solver.solver_step(sched, i, x_mine, m_prev,
                                          jnp.asarray(model_outs[i]),
                                          noise=jnp.asarray(noises[i]),
                                          m_prev2=m_prev2)
        x_mine, m_prev2, m_prev = x_next, m_prev, m

    np.testing.assert_allclose(np.asarray(x_mine), x_ref.numpy(),
                               rtol=5e-4, atol=1e-5)


def test_add_noise_get_velocity_parity(ref):
    import torch

    ref_sched = ref.dpm_solver.DPMSolverMultistepScheduler(
        num_train_timesteps=1000, beta_schedule="cosine",
        prediction_type="v_prediction")
    rng = np.random.default_rng(10)
    x = rng.normal(0, 1, (4, 8)).astype(np.float32)
    z = rng.normal(0, 1, (4, 8)).astype(np.float32)
    t = np.array([0, 1, 500, 999], np.int64)

    abar = jnp.asarray(my_solver.make_alphas_cumprod("cosine", 1000), jnp.float32)
    mine_noisy = my_solver.add_noise(abar, jnp.asarray(x), jnp.asarray(z),
                                     jnp.asarray(t))
    mine_v = my_solver.get_velocity(abar, jnp.asarray(x), jnp.asarray(z),
                                    jnp.asarray(t))
    with torch.no_grad():
        ref_noisy = ref_sched.add_noise(torch.from_numpy(x),
                                        torch.from_numpy(z),
                                        torch.from_numpy(t))
        ref_v = ref_sched.get_velocity(torch.from_numpy(x),
                                       torch.from_numpy(z),
                                       torch.from_numpy(t))

    np.testing.assert_allclose(np.asarray(mine_noisy), ref_noisy.numpy(),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(mine_v), ref_v.numpy(),
                               rtol=RTOL, atol=ATOL)



# ---------------------------------------------------------------------------
# Composite training forward (modeling_vibevoice.py:332-477)
# ---------------------------------------------------------------------------

def _hf_qwen2_config(dec):
    from transformers import Qwen2Config

    return Qwen2Config(
        vocab_size=dec.vocab_size, hidden_size=dec.hidden_size,
        intermediate_size=dec.intermediate_size,
        num_hidden_layers=dec.num_hidden_layers,
        num_attention_heads=dec.num_attention_heads,
        num_key_value_heads=dec.num_key_value_heads,
        max_position_embeddings=dec.max_position_embeddings,
        rms_norm_eps=dec.rms_norm_eps, rope_theta=dec.rope_theta,
        tie_word_embeddings=dec.tie_word_embeddings,
        hidden_act=dec.hidden_act, use_cache=False,
        attn_implementation="eager")


@pytest.fixture(scope="module")
def cfg_det(cfg):
    """Tiny config with fix_std=0: the σ-VAE 'gaussian' sample degenerates to
    the mean on both stacks, making the composite forward deterministic."""
    import dataclasses

    return dataclasses.replace(
        cfg, acoustic_tokenizer=dataclasses.replace(cfg.acoustic_tokenizer,
                                                    fix_std=0.0))


@pytest.fixture(scope="module")
def ref_composite(ref, cfg_det, state_dict):
    import torch

    if ref.modeling is None:
        pytest.skip(f"composite import failed: {ref.modeling_error}")
    h = cfg_det.diffusion_head
    vcfg = ref.configuration.VibeVoiceConfig(
        acoustic_tokenizer_config=_ref_acoustic_config(
            ref, cfg_det.acoustic_tokenizer),
        semantic_tokenizer_config=_ref_semantic_config(
            ref, cfg_det.semantic_tokenizer),
        decoder_config=_hf_qwen2_config(cfg_det.decoder),
        diffusion_head_config=ref.configuration.VibeVoiceDiffusionHeadConfig(
            hidden_size=h.hidden_size, head_layers=h.head_layers,
            head_ffn_ratio=h.head_ffn_ratio, rms_norm_eps=h.rms_norm_eps,
            latent_size=h.latent_size, prediction_type=h.prediction_type,
            ddpm_num_steps=h.ddpm_num_steps,
            ddpm_beta_schedule=h.ddpm_beta_schedule,
            ddpm_batch_mul=h.ddpm_batch_mul),
    )
    model = ref.modeling.VibeVoiceForConditionalGeneration(vcfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in state_dict.items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, f"export produced extra tensors: {unexpected}"
    assert not missing, f"reference composite misses tensors: {missing}"
    model.eval()

    # The reference's forward_speech_features has dead glue from the
    # out-of-repo nnscaler trainer: `encode(...)[0][0]` subscripts a plain
    # dataclass (modeling_vibevoice.py:289-291 vs tokenizer.py:954) and
    # raises TypeError as written.  Wrap encode so the subscripts land on the
    # distribution object; every numeric op stays the reference's own code.
    tokenizer = model.model.acoustic_tokenizer
    orig_encode = tokenizer.encode
    tokenizer.encode = lambda x, **kw: ((orig_encode(x, **kw),),)
    return model


def _composite_inputs(cfg, seed=11, loss_rows=None):
    """Shared fixture data for composite-forward parity.

    Returns dict with dense (mine) and reference tensors; `loss_rows` selects
    the speeches_loss_input per-sample flags (None -> all frames diffuse)."""
    rng = np.random.default_rng(seed)
    dec = cfg.decoder
    B, T, F = 2, 24, 4
    stride = cfg.acoustic_tokenizer.total_stride
    mul = 2

    input_ids = rng.integers(0, dec.vocab_size, (B, T), dtype=np.int64)
    speech = rng.normal(0, 0.3, (B, F * stride)).astype(np.float32)
    speech_masks = np.ones((B, F), bool)
    sem_lat = rng.normal(0, 0.5, (B, F, cfg.semantic_vae_dim)).astype(np.float32)

    acoustic_input_mask = np.zeros((B, T), bool)
    acoustic_input_mask[0, 3:3 + F] = True
    acoustic_input_mask[1, 6:6 + F] = True

    if loss_rows is None:
        loss_frames = speech_masks
        acoustic_loss_mask = acoustic_input_mask
    else:
        loss_frames = speech_masks & np.asarray(loss_rows, bool)[:, None]
        acoustic_loss_mask = acoustic_input_mask.copy()
        for b in range(B):
            if not loss_rows[b]:
                acoustic_loss_mask[b] = False

    n_dense = B * T * mul
    lat_size = cfg.diffusion_head.latent_size
    noise_dense = rng.normal(0, 1, (n_dense, lat_size)).astype(np.float32)
    t_dense = rng.integers(0, cfg.diffusion_head.ddpm_num_steps, n_dense,
                           dtype=np.int64)
    mask_rep = np.repeat(acoustic_loss_mask.reshape(-1), mul)
    return dict(B=B, T=T, F=F, mul=mul, input_ids=input_ids, speech=speech,
                speech_masks=speech_masks, sem_lat=sem_lat,
                acoustic_input_mask=acoustic_input_mask,
                acoustic_loss_mask=acoustic_loss_mask,
                noise_dense=noise_dense, t_dense=t_dense,
                ref_noise=noise_dense[mask_rep], ref_t=t_dense[mask_rep],
                loss_rows=loss_rows)


def _run_ref_composite(ref_composite, d, monkeypatch, with_semantic):
    import torch

    injected_noise = torch.from_numpy(d["ref_noise"])
    injected_t = torch.from_numpy(d["ref_t"])
    real_randn = torch.randn

    def fake_randn(*shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list, torch.Size)):
            shape = tuple(shape[0])
        if tuple(shape) == tuple(injected_noise.shape):
            return injected_noise.clone()
        # σ-VAE per-batch std draw — multiplied by fix_std=0, value irrelevant
        return torch.zeros(shape, **{k: v for k, v in kw.items()
                                     if k in ("dtype", "device")})

    def fake_multinomial(weights, n, replacement=False, **kw):
        assert n == injected_t.shape[0]
        return injected_t.clone()

    monkeypatch.setattr(torch, "randn", fake_randn)
    monkeypatch.setattr(torch, "multinomial", fake_multinomial)
    try:
        with torch.no_grad():
            out = ref_composite(
                input_ids=torch.from_numpy(d["input_ids"]),
                attention_mask=torch.ones(d["B"], d["T"], dtype=torch.long),
                speech_tensors=torch.from_numpy(d["speech"]),
                speech_masks=torch.from_numpy(d["speech_masks"]),
                speech_semantic_tensors=torch.from_numpy(d["sem_lat"]),
                acoustic_input_mask=torch.from_numpy(d["acoustic_input_mask"]),
                acoustic_loss_mask=torch.from_numpy(d["acoustic_loss_mask"]),
                speeches_loss_input=None if d["loss_rows"] is None
                else torch.from_numpy(np.asarray(d["loss_rows"], bool)),
                ddpm_batch_mul=d["mul"])
    finally:
        monkeypatch.setattr(torch, "randn", real_randn)
    return out


def _run_mine_composite(params, cfg, d, with_semantic):
    return vibevoice.training_forward(
        params, cfg, jax.random.PRNGKey(0),
        jnp.asarray(d["input_ids"]), jnp.ones((d["B"], d["T"]), jnp.int32),
        jnp.asarray(d["speech"]), jnp.asarray(d["speech_masks"]),
        jnp.asarray(d["acoustic_input_mask"]),
        jnp.asarray(d["acoustic_loss_mask"]),
        speech_semantic_tensors=jnp.asarray(d["sem_lat"])
        if with_semantic else None,
        ddpm_batch_mul=d["mul"],
        speeches_loss_input=None if d["loss_rows"] is None
        else jnp.asarray(np.asarray(d["loss_rows"], bool)),
        diffusion_timesteps=jnp.asarray(d["t_dense"]),
        diffusion_noise=jnp.asarray(d["noise_dense"]))


def test_composite_training_forward_parity(ref_composite, params, cfg_det,
                                           monkeypatch):
    """All-frames-diffuse path (speeches_loss_input=None).  NOTE the reference
    computes-but-ignores semantic features on this path
    (modeling_vibevoice.py:360 vs :377-383), so mine runs without them."""
    d = _composite_inputs(cfg_det, seed=11, loss_rows=None)
    ref_out = _run_ref_composite(ref_composite, d, monkeypatch,
                                 with_semantic=False)
    mine = _run_mine_composite(params, cfg_det, d, with_semantic=False)

    np.testing.assert_allclose(np.asarray(mine["logits"]),
                               ref_out.logits.numpy(), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(float(mine["diffusion_loss"]),
                               float(ref_out.diffusion_loss), rtol=5e-4)


def test_composite_training_forward_parity_loss_subset(ref_composite, params,
                                                       cfg_det, monkeypatch):
    """speeches_loss_input branch: only sample 0's frames diffuse; semantic
    features ARE spliced on this branch (modeling_vibevoice.py:369-373)."""
    d = _composite_inputs(cfg_det, seed=12, loss_rows=[True, False])
    ref_out = _run_ref_composite(ref_composite, d, monkeypatch,
                                 with_semantic=True)
    mine = _run_mine_composite(params, cfg_det, d, with_semantic=True)

    np.testing.assert_allclose(np.asarray(mine["logits"]),
                               ref_out.logits.numpy(), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(float(mine["diffusion_loss"]),
                               float(ref_out.diffusion_loss), rtol=5e-4)


def test_calibration_parity(ref_composite, params, cfg_det, monkeypatch):
    """First-batch scaling/bias calibration: the reference computes
    1/std and -mean over masked latents in-forward when the buffers are NaN
    (modeling_vibevoice.py:307-323); calibrate_scaling must agree."""
    import torch

    d = _composite_inputs(cfg_det, seed=13, loss_rows=None)
    ref_composite.model.speech_scaling_factor.fill_(float("nan"))
    ref_composite.model.speech_bias_factor.fill_(float("nan"))
    try:
        _run_ref_composite(ref_composite, d, monkeypatch, with_semantic=False)
        ref_scale = float(ref_composite.model.speech_scaling_factor)
        ref_bias = float(ref_composite.model.speech_bias_factor)
    finally:
        ref_composite.model.speech_scaling_factor.fill_(1.3)
        ref_composite.model.speech_bias_factor.fill_(-0.05)

    lat, _ = tok.encode(params["acoustic"]["encoder"], cfg_det.acoustic_tokenizer,
                        jnp.asarray(d["speech"])[..., None])
    scale, bias = vibevoice.calibrate_scaling(lat, jnp.asarray(d["speech_masks"]))
    np.testing.assert_allclose(float(scale), ref_scale, rtol=1e-4)
    np.testing.assert_allclose(float(bias), ref_bias, rtol=1e-4)
