"""Training step: CE + diffusion loss, pjit-able over a ("dp", "tp") mesh.

The reference repo defines only the training *forward* (its driver lived in
nnscaler, out-of-repo — SURVEY.md §3.2); here the full step is provided:
loss = masked CE over logits (the part the reference leaves to "the training
script", modeling_vibevoice.py:402-406) + the diffusion MSE
(modeling_vibevoice.py:408-463), optimized with optax, differentiated and
sharded via jax.sharding annotations (dp batch axis, tp parameter axes).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import VibeVoiceConfig
from ..models import acoustic_tokenizer as tok
from ..models import vibevoice

IGNORE_INDEX = -100


def train_loss(params: dict, cfg: VibeVoiceConfig, rng: jax.Array,
               batch: Dict[str, jax.Array], ddpm_batch_mul: int = 1,
               ce_weight: float = 1.0, diffusion_weight: float = 1.0):
    """batch keys: input_ids, attention_mask, labels, speech_tensors,
    speech_masks, acoustic_input_mask, acoustic_loss_mask."""
    out = vibevoice.training_forward(
        params, cfg, rng,
        input_ids=batch["input_ids"],
        attn_mask=batch["attention_mask"],
        speech_tensors=batch.get("speech_tensors"),
        speech_masks=batch.get("speech_masks"),
        acoustic_input_mask=batch.get("acoustic_input_mask"),
        acoustic_loss_mask=batch.get("acoustic_loss_mask"),
        speech_semantic_tensors=batch.get("speech_semantic_tensors"),
        ddpm_batch_mul=ddpm_batch_mul)

    logits = out["logits"].astype(jnp.float32)
    labels = batch["labels"]
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    mask = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(mask, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    tok_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    ce = -jnp.sum(jnp.where(mask, tok_ll, 0.0)) / jnp.maximum(jnp.sum(mask), 1)

    diff = out["diffusion_loss"].astype(jnp.float32)
    total = ce_weight * ce + diffusion_weight * diff
    return total, {"loss": total, "ce_loss": ce, "diffusion_loss": diff}


def make_optimizer(peak_lr: float = 1e-4, total_steps: int = 10_000,
                   warmup_steps: int = 100, end_lr_ratio: float = 0.1,
                   weight_decay: float = 0.01, clip_norm: float = 1.0,
                   accum_steps: int = 1) -> optax.GradientTransformation:
    """Production recipe: linear warmup → cosine decay AdamW with global-norm
    clipping, and optional gradient accumulation (`accum_steps` micro-batches
    per optimizer update, via ``optax.MultiSteps``).  Pass the result as
    ``train_loop(optimizer=...)``; the default there stays plain AdamW."""
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=peak_lr, warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=peak_lr * end_lr_ratio)
    tx = optax.chain(optax.clip_by_global_norm(clip_norm),
                     optax.adamw(sched, weight_decay=weight_decay))
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


class TrainState(NamedTuple):
    params: dict
    opt_state: Any
    step: jax.Array


def make_train_step(cfg: VibeVoiceConfig, optimizer: Optional[optax.GradientTransformation] = None,
                    ddpm_batch_mul: Optional[int] = None) -> Tuple[Callable, Callable]:
    """Returns (init_state, train_step).

    train_step(state, batch, rng) -> (state, metrics); pure, jit/pjit it with
    params sharded per `parallel.sharding.param_shardings` and batches sharded
    on dp.
    """
    optimizer = optimizer or optax.adamw(1e-4, weight_decay=0.01)
    mul = ddpm_batch_mul or cfg.diffusion_head.ddpm_batch_mul

    def init_state(params: dict) -> TrainState:
        return TrainState(params=params, opt_state=optimizer.init(params),
                          step=jnp.int32(0))

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        params = state.params

        # First-batch latent calibration (reference modeling_vibevoice.py:
        # 307-323): while the scale/bias buffers are NaN, set
        # scaling = 1/std, bias = -mean of the masked batch latents.  Under
        # jit+GSPMD the batch is dp-sharded, so the sums inside
        # calibrate_scaling are already global — XLA inserts the collective
        # the reference spells as dist.all_reduce.
        if batch.get("speech_tensors") is not None:
            rng, rng_cal = jax.random.split(rng)
            acfg = cfg.acoustic_tokenizer
            mean, _ = tok.encode(
                jax.lax.stop_gradient(params["acoustic"]["encoder"]), acfg,
                batch["speech_tensors"][..., None].astype(jnp.float32))
            lat = tok.sample_latents(rng_cal, mean, acfg.fix_std,
                                     acfg.std_dist_type)
            scaling, bias = vibevoice.calibrate_scaling(lat, batch["speech_masks"])
            s0, b0 = params["speech_scaling_factor"], params["speech_bias_factor"]
            new_s = jax.lax.stop_gradient(jnp.where(jnp.isnan(s0), scaling, s0))
            new_b = jax.lax.stop_gradient(jnp.where(jnp.isnan(b0), bias, b0))
            params = {**params, "speech_scaling_factor": new_s,
                      "speech_bias_factor": new_b}

        (_, metrics), grads = jax.value_and_grad(train_loss, has_aux=True)(
            params, cfg, rng, batch, ddpm_batch_mul=mul)
        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        new_params = dict(optax.apply_updates(params, updates))
        # the factors are buffers, not trainables (reference registers them
        # with register_buffer) — pin them to the calibrated values
        new_params["speech_scaling_factor"] = params["speech_scaling_factor"]
        new_params["speech_bias_factor"] = params["speech_bias_factor"]
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["speech_scaling_factor"] = new_params["speech_scaling_factor"]
        metrics["speech_bias_factor"] = new_params["speech_bias_factor"]
        return TrainState(params=new_params, opt_state=opt_state,
                          step=state.step + 1), metrics

    return init_state, train_step
