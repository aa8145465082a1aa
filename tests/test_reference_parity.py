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
