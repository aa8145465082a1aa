"""Composite VibeVoice model: parameter assembly + training forward.

Mirrors the reference composite (reference: modeling_vibevoice.py:107-477):
Qwen2 decoder + acoustic σ-VAE tokenizer + semantic tokenizer + two speech
connectors + diffusion head + scalar speech scaling/bias factors.

The inference generate loop lives in ``vibevoice_tpu.generation``; this module
owns parameter construction and the training-time forward (LM logits +
per-token diffusion loss with ``ddpm_batch_mul`` noise replication,
modeling_vibevoice.py:408-463).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import VibeVoiceConfig
from ..schedule.dpm_solver import add_noise, get_velocity, make_alphas_cumprod
from . import acoustic_tokenizer as tok
from . import connectors
from . import diffusion_head
from . import qwen2


def init_params(rng: jax.Array, cfg: VibeVoiceConfig, dtype=jnp.bfloat16,
                tok_dtype=None) -> dict:
    """tok_dtype: conv tokenizer weight dtype; defaults to `dtype` (the
    reference ships bf16 checkpoints end to end — norm internals stay fp32
    regardless).  The vocode step is HBM-bandwidth-bound, so bf16 tokenizer
    weights halve its cost."""
    tok_dtype = tok_dtype or dtype
    ks = jax.random.split(rng, 6)
    params = {
        "lm": qwen2.init_params(ks[0], cfg.decoder, dtype),
        "acoustic": tok.init_acoustic_params(ks[1], cfg.acoustic_tokenizer, tok_dtype),
        "semantic": tok.init_encoder_params(ks[2], cfg.semantic_tokenizer, tok_dtype),
        "acoustic_connector": connectors.init_params(
            ks[3], cfg.acoustic_vae_dim, cfg.decoder.hidden_size, dtype),
        "semantic_connector": connectors.init_params(
            ks[4], cfg.semantic_vae_dim, cfg.decoder.hidden_size, dtype),
        "diffusion_head": diffusion_head.init_params(ks[5], cfg.diffusion_head, dtype),
        # NaN until calibrated on the first training batch (modeling_vibevoice.py:130-132)
        "speech_scaling_factor": jnp.float32(jnp.nan),
        "speech_bias_factor": jnp.float32(jnp.nan),
    }
    return params


def encode_voice_prompt(params: dict, cfg: VibeVoiceConfig, rng: jax.Array,
                        speech: jax.Array) -> jax.Array:
    """Waveform [N, T] -> scaled acoustic latents [N, T/3200, vae_dim].

    Applies σ-VAE sampling and the (bias, scale) normalization
    (modeling_vibevoice_inference.py:149-163).
    """
    mean, _ = tok.encode(params["acoustic"]["encoder"], cfg.acoustic_tokenizer,
                         speech[..., None].astype(jnp.float32))
    lat = tok.sample_latents(rng, mean, cfg.acoustic_tokenizer.fix_std,
                             cfg.acoustic_tokenizer.std_dist_type)
    scale = params["speech_scaling_factor"]
    bias = params["speech_bias_factor"]
    # identity when uncalibrated (NaN buffers -> treat as scale=1, bias=0)
    scale = jnp.where(jnp.isnan(scale), 1.0, scale)
    bias = jnp.where(jnp.isnan(bias), 0.0, bias)
    return (lat + bias) * scale


def training_forward(params: dict, cfg: VibeVoiceConfig, rng: jax.Array,
                     input_ids: jax.Array, attn_mask: jax.Array,
                     speech_tensors: Optional[jax.Array],
                     speech_masks: Optional[jax.Array],
                     acoustic_input_mask: Optional[jax.Array],
                     acoustic_loss_mask: Optional[jax.Array],
                     speech_semantic_tensors: Optional[jax.Array] = None,
                     ddpm_batch_mul: int = 1,
                     speeches_loss_input: Optional[jax.Array] = None,
                     diffusion_timesteps: Optional[jax.Array] = None,
                     diffusion_noise: Optional[jax.Array] = None) -> dict:
    """Training forward: returns dict(logits, diffusion_loss).

    Contract of VibeVoiceForConditionalGeneration.forward
    (modeling_vibevoice.py:332-477): CE over logits is left to the training
    driver; diffusion loss is MSE(sum)/latent/ddpm_batch_mul over noised
    latents conditioned on the LM hidden states at ``acoustic_loss_mask``.

    For fixed-shape XLA the boolean gathers of the reference become masked
    dense ops: speech positions are scattered with `jnp.where`, and the
    diffusion loss is averaged with the loss mask folded into the MSE.
    """
    rng_samp, rng_t, rng_noise = jax.random.split(rng, 3)
    x = qwen2.embed_tokens(params["lm"], input_ids)  # [B, T, H]
    b, t, h = x.shape

    speech_features = None
    if speech_tensors is not None:
        # the acoustic encoder is frozen during LM training (reference wraps
        # encoding in no_grad, modeling_vibevoice.py:287-291)
        mean, _ = tok.encode(jax.lax.stop_gradient(params["acoustic"]["encoder"]),
                             cfg.acoustic_tokenizer,
                             speech_tensors[..., None].astype(jnp.float32))
        lat = jax.lax.stop_gradient(
            tok.sample_latents(rng_samp, mean, cfg.acoustic_tokenizer.fix_std,
                               cfg.acoustic_tokenizer.std_dist_type))
        scale = params["speech_scaling_factor"]
        bias = params["speech_bias_factor"]
        scale = jnp.where(jnp.isnan(scale), 1.0, scale)
        bias = jnp.where(jnp.isnan(bias), 0.0, bias)
        speech_features = (lat + bias) * scale                      # [N, F, D]
        connected = connectors.apply(params["acoustic_connector"],
                                     speech_features.astype(x.dtype))  # [N, F, H]
        if speech_semantic_tensors is not None:
            # precomputed semantic latents joined into the splice
            # (modeling_vibevoice.py:360-373)
            connected = connected + connectors.apply(
                params["semantic_connector"],
                speech_semantic_tensors.astype(x.dtype))

        # scatter masked speech frames into the token stream:
        # acoustic_input_mask [B, T] selects as many positions as
        # speech_masks [N, F] has True frames, in order.
        flat_feats = connected.reshape(-1, h)
        frame_valid = speech_masks.reshape(-1)
        # positions of valid frames, compacted to the front
        order = jnp.argsort(~frame_valid, stable=True)
        compacted = flat_feats[order]                                # valid first
        tok_pos = jnp.cumsum(acoustic_input_mask.reshape(-1)) - 1    # index into compacted
        gathered = compacted[jnp.clip(tok_pos, 0, compacted.shape[0] - 1)]
        x = jnp.where(acoustic_input_mask.reshape(-1)[:, None], gathered,
                      x.reshape(-1, h)).reshape(b, t, h)

    hidden, _ = qwen2.forward(params["lm"], cfg.decoder, x,
                              positions=jnp.broadcast_to(jnp.arange(t), (b, t)),
                              cache=None,
                              attn_mask=(jnp.arange(t)[None, :, None] >= jnp.arange(t)[None, None, :])
                                        & attn_mask[:, None, :].astype(bool))
    logits = hidden @ qwen2.lm_head_weight(params["lm"])

    out = {"logits": logits, "diffusion_loss": jnp.float32(0.0)}

    if speech_features is not None and acoustic_loss_mask is not None:
        # dense masked diffusion loss
        cond = hidden.reshape(-1, h)                                 # [B*T, H]
        loss_mask = acoustic_loss_mask.reshape(-1)                   # [B*T]
        # latents aligned to token positions, same compaction as above
        flat_lat = speech_features.reshape(-1, speech_features.shape[-1])
        if speeches_loss_input is not None:
            # only flagged samples' frames get diffusion loss; every valid
            # frame is still spliced into the stream
            # (modeling_vibevoice.py:361-377: speeches_loss_input & speech_masks)
            loss_frames = (speeches_loss_input[:, None].astype(bool)
                           & speech_masks.astype(bool)).reshape(-1)
            order = jnp.argsort(~loss_frames, stable=True)
        lat_compact = flat_lat[order]
        lat_at_tok = lat_compact[jnp.clip(jnp.cumsum(loss_mask) - 1, 0,
                                          lat_compact.shape[0] - 1)]

        mul = ddpm_batch_mul
        n = cond.shape[0] * mul
        lat_rep = jnp.repeat(lat_at_tok, mul, axis=0).astype(jnp.float32)
        cond_rep = jnp.repeat(cond, mul, axis=0)
        mask_rep = jnp.repeat(loss_mask, mul, axis=0)

        abar = jnp.asarray(make_alphas_cumprod(
            cfg.diffusion_head.ddpm_beta_schedule, cfg.diffusion_head.ddpm_num_steps),
            jnp.float32)
        # injection hooks (dense [B*T*mul] layout) let parity tests feed both
        # stacks identical randomness; production callers leave them None
        if diffusion_timesteps is None:
            diffusion_timesteps = jax.random.randint(
                rng_t, (n,), 0, cfg.diffusion_head.ddpm_num_steps)
        if diffusion_noise is None:
            diffusion_noise = jax.random.normal(rng_noise, lat_rep.shape, jnp.float32)
        timesteps = diffusion_timesteps
        noise = diffusion_noise
        noisy = add_noise(abar, lat_rep, noise, timesteps)
        pred = diffusion_head.apply(params["diffusion_head"], cfg.diffusion_head,
                                    noisy.astype(cond.dtype),
                                    timesteps.astype(jnp.float32), cond_rep)
        if cfg.diffusion_head.prediction_type == "epsilon":
            target = noise
        elif cfg.diffusion_head.prediction_type == "v_prediction":
            target = get_velocity(abar, lat_rep, noise, timesteps)
        else:
            raise NotImplementedError(cfg.diffusion_head.prediction_type)
        se = jnp.sum(jnp.square(pred.astype(jnp.float32) - target), axis=-1)
        se = jnp.where(mask_rep, se, 0.0)
        # reference reduction: MSE(sum) / latent_size / ddpm_batch_mul
        # (modeling_vibevoice.py:451-453)
        out["diffusion_loss"] = jnp.sum(se) / cfg.diffusion_head.latent_size / mul
        out["num_speech_tokens"] = jnp.sum(loss_mask)

    return out


def calibrate_scaling(latents: jax.Array, masks: jax.Array,
                      axis_name: Optional[str] = None) -> Tuple[jax.Array, jax.Array]:
    """First-batch latent normalization stats (modeling_vibevoice.py:307-323).

    scaling = 1/std, bias = -mean over masked latents; with ``axis_name`` set,
    stats are pmean'ed over the data-parallel mesh axis (the reference's only
    collective, a torch.distributed all_reduce, becomes a jax.lax.pmean).
    """
    m = masks[..., None].astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(m) * latents.shape[-1], 1.0)
    mean = jnp.sum(latents * m) / cnt
    # torch.Tensor.std() applies Bessel's correction (unbiased, n-1); the
    # reference's scaling factor bakes that into the checkpoint contract
    var = jnp.sum(jnp.square(latents - mean) * m) / jnp.maximum(cnt - 1.0, 1.0)
    scaling = 1.0 / jnp.sqrt(var)
    bias = -mean
    if axis_name is not None:
        scaling = jax.lax.pmean(scaling, axis_name)
        bias = jax.lax.pmean(bias, axis_name)
    return scaling, bias
