"""Training data collation + loop driver (the subsystem the reference leaves
to out-of-repo nnscaler; contract from modeling_vibevoice.py:332-477)."""

import numpy as np

import jax
import jax.numpy as jnp

from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.models import vibevoice
from vibevoice_tpu.train import TrainingCollator, batch_iterator, train_loop

CFG = VibeVoiceConfig.named("tiny")
FRAME = CFG.acoustic_tokenizer.total_stride


class TinyTokenizer:
    eos_id = 3
    speech_start_id = 10
    speech_end_id = 11
    speech_diffusion_id = 12
    pad_id = 4

    def encode(self, text, add_special_tokens=False):
        return [ord(c) % 200 + 20 for c in text]


def _examples(n=4, seed=0):
    rs = np.random.RandomState(seed)
    out = []
    for i in range(n):
        out.append({
            "text": f"Speaker 1: example number {i}",
            "target_audio": rs.randn(FRAME * (2 + i % 2)).astype(np.float32) * 0.1,
            "voice_prompt": (rs.randn(FRAME).astype(np.float32) * 0.1
                             if i % 2 else None),
        })
    return out


def test_collator_layout():
    col = TrainingCollator(TinyTokenizer(), frame_samples=FRAME)
    batch = col(_examples(2))
    ids, in_m, loss_m = (batch["input_ids"], batch["acoustic_input_mask"],
                         batch["acoustic_loss_mask"])
    assert ids.shape == in_m.shape == loss_m.shape
    # loss slots are a subset of input slots
    assert not (loss_m & ~in_m).any()
    # number of valid speech frames == number of input-mask slots
    assert batch["speech_masks"].sum() == in_m.sum()
    # diffusion tokens sit exactly at the masked slots
    assert (ids[in_m] == TinyTokenizer.speech_diffusion_id).all()
    # labels: voice-prompt slots ignored, target slots kept for CE
    lab = batch["labels"]
    assert (lab[loss_m] == TinyTokenizer.speech_diffusion_id).all()
    vp_slots = in_m & ~loss_m
    if vp_slots.any():
        assert (lab[vp_slots] == -100).all()
    # padding ignored in CE
    assert (lab[batch["attention_mask"] == 0] == -100).all()


def test_collator_batch_feeds_forward():
    """Collated batches run through the real training forward and produce a
    finite loss with speech tokens counted."""
    col = TrainingCollator(TinyTokenizer(), frame_samples=FRAME)
    batch = col(_examples(2, seed=1))
    params = vibevoice.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    out = vibevoice.training_forward(
        params, CFG, jax.random.PRNGKey(1),
        input_ids=jnp.asarray(batch["input_ids"]),
        attn_mask=jnp.asarray(batch["attention_mask"]),
        speech_tensors=jnp.asarray(batch["speech_tensors"]),
        speech_masks=jnp.asarray(batch["speech_masks"]),
        acoustic_input_mask=jnp.asarray(batch["acoustic_input_mask"]),
        acoustic_loss_mask=jnp.asarray(batch["acoustic_loss_mask"]))
    assert np.isfinite(float(out["diffusion_loss"]))
    assert int(out["num_speech_tokens"]) == int(batch["acoustic_loss_mask"].sum())


def test_train_loop_runs_and_resumes(tmp_path):
    import dataclasses
    cfg = dataclasses.replace(CFG, dtype="float32")
    col = TrainingCollator(TinyTokenizer(), frame_samples=FRAME)
    logs = []

    def batches():
        return batch_iterator(_examples(4), col, batch_size=2, shuffle_seed=0)

    state = train_loop(cfg, batches(), num_steps=2, log_every=1,
                       ckpt_dir=str(tmp_path), ckpt_every=100,
                       log_fn=logs.append, dtype=jnp.float32)
    assert int(state.step) == 2
    assert any("loss=" in l for l in logs)
    # calibration happened on step 1
    assert np.isfinite(float(state.params["speech_scaling_factor"]))

    # resume picks up the saved step counter and keeps training
    logs2 = []
    state2 = train_loop(cfg, batches(), num_steps=1, log_every=1,
                        ckpt_dir=str(tmp_path), ckpt_every=100,
                        log_fn=logs2.append, dtype=jnp.float32)
    assert any("resumed" in l for l in logs2)
    assert int(state2.step) == 3


def test_make_optimizer_schedule_and_accumulation():
    """Warmup+cosine AdamW with clipping and gradient accumulation: params
    only move every `accum_steps` micro-batches, and the warmup keeps the
    first real update small."""
    import dataclasses
    import jax
    from vibevoice_tpu.train import make_optimizer, make_train_step

    cfg = dataclasses.replace(CFG, dtype="float32")
    tx = make_optimizer(peak_lr=1e-3, total_steps=100, warmup_steps=10,
                        clip_norm=1.0, accum_steps=2)
    init_state, train_step = make_train_step(cfg, optimizer=tx)
    col = TrainingCollator(TinyTokenizer(), frame_samples=FRAME)
    batch = next(iter(batch_iterator(_examples(2), col, batch_size=2)))

    from vibevoice_tpu.models import vibevoice
    params = vibevoice.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    state = init_state(params)
    jitted = jax.jit(train_step, donate_argnums=(0,))

    p0_norm = jax.device_get(params["lm"]["norm"])   # before donation
    state, m1 = jitted(state, batch, jax.random.PRNGKey(1))
    lm1 = jax.device_get(state.params["lm"]["norm"])
    state, m2 = jitted(state, batch, jax.random.PRNGKey(2))
    # first micro-batch accumulates (no update applied yet)
    np.testing.assert_array_equal(lm1, p0_norm)
    assert np.isfinite(float(m2["loss"]))
