"""Semantic end-to-end: the calibration -> teacher-forcing -> diffusion ->
vocode chain LEARNS, not just runs.

Trains the tiny config on a synthetic tone with ``train/loop.py`` until the
diffusion loss clearly drops, then generates from the training prompt prefix
and asserts the vocoded audio matches the trained tone family through the
decoder — i.e. the generated latents approximate the teacher latents, so the
generated audio's spectrum matches the oracle render ``decode(encode(tone))``
and beats a held-out control tone's render.  This is the in-repo substitute
for real-weights audio validation (air-gapped image; see PARITY.md "Known
deltas").

Setup note: a randomly-initialized ConvNeXt VAE collapses amplitudes (the
1e-6 layer-scale init), leaving latents ~1e-4 — far below the sigma-VAE
sampling noise, which would make the diffusion target pure noise.  The test
therefore boosts the layer-scale gammas to 1, rescales the encoder head to
O(1) latents, and uses a small fixed posterior std, so the synthetic-weights
pipeline has the same signal-above-noise structure as trained weights.
"""

import dataclasses
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.models import acoustic_tokenizer as tokm
from vibevoice_tpu.models import vibevoice
from vibevoice_tpu.train import TrainingCollator, make_optimizer, train_loop

CFG = dataclasses.replace(
    VibeVoiceConfig.named("tiny"), dtype="float32",
    acoustic_tokenizer=dataclasses.replace(
        VibeVoiceConfig.named("tiny").acoustic_tokenizer,
        fix_std=0.05, std_dist_type="fix"))
FRAME = CFG.acoustic_tokenizer.total_stride          # 16 samples / frame
N_FRAMES = 8


class TinyTok:
    eos_id = 3
    speech_start_id = 10
    speech_end_id = 11
    speech_diffusion_id = 12
    pad_id = 4
    bos_id = 3

    def encode(self, text, add_special_tokens=False):
        return [ord(c) % 200 + 20 for c in text]


def _tone(freq_period: int, n: int, amp: float = 0.3) -> np.ndarray:
    t = np.arange(n, dtype=np.float32)
    return (amp * np.sin(2 * np.pi * t / freq_period)).astype(np.float32)


def _spec_cos(a: np.ndarray, b: np.ndarray) -> float:
    """Cosine of magnitude spectra, DC removed (a random decoder's constant
    bias would otherwise dominate both renders)."""
    n = min(len(a), len(b))
    fa = np.abs(np.fft.rfft(a[:n] - a[:n].mean()))[1:]
    fb = np.abs(np.fft.rfft(b[:n] - b[:n].mean()))[1:]
    return float(fa @ fb / (np.linalg.norm(fa) * np.linalg.norm(fb) + 1e-9))


def _boost_gammas(tree: dict) -> None:
    for stage in tree["stages"]:
        for blk in stage:
            if blk.get("gamma") is not None:
                blk["gamma"] = jnp.ones_like(blk["gamma"])
            if blk.get("ffn_gamma") is not None:
                blk["ffn_gamma"] = jnp.ones_like(blk["ffn_gamma"])


@pytest.mark.slow
def test_train_then_generate_learns_tone():
    tk = TinyTok()
    acfg = CFG.acoustic_tokenizer
    target = _tone(FRAME, N_FRAMES * FRAME)          # period == frame stride

    params = vibevoice.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    _boost_gammas(params["acoustic"]["encoder"])
    _boost_gammas(params["acoustic"]["decoder"])
    _boost_gammas(params["semantic"])
    mean, _ = tokm.encode(params["acoustic"]["encoder"], acfg,
                          jnp.asarray(target)[None, :, None])
    scale = 2.0 / float(jnp.sqrt((mean ** 2).mean()))
    params["acoustic"]["encoder"]["head"]["w"] = \
        params["acoustic"]["encoder"]["head"]["w"] * scale
    params["acoustic"]["encoder"]["head"]["b"] = \
        params["acoustic"]["encoder"]["head"]["b"] * scale

    col = TrainingCollator(tk, frame_samples=FRAME)
    example = {"text": "Speaker 1: tone", "target_audio": target,
               "voice_prompt": None}
    batch = col([example, example])

    def batches():
        while True:
            yield batch

    logs = []
    steps = 600
    state = train_loop(
        CFG, batches(), params=params, num_steps=steps, log_every=50,
        log_fn=logs.append,
        optimizer=make_optimizer(peak_lr=2e-3, total_steps=steps,
                                 warmup_steps=20, clip_norm=1.0),
        dtype=jnp.float32)

    diffs = [float(m.group(1)) for l in logs
             for m in [re.search(r"diff=([0-9.]+)", l)] if m]
    ces = [float(m.group(1)) for l in logs
           for m in [re.search(r"ce=([0-9.]+)", l)] if m]
    # the chain learns: both losses clearly drop (measured run: diff 8.6 ->
    # 0.65, ce 1.02 -> 0.007)
    assert diffs[-1] < 0.2 * diffs[0], (diffs[0], diffs[-1])
    assert ces[-1] < 0.1 * ces[0], (ces[0], ces[-1])
    assert np.isfinite(float(state.params["speech_scaling_factor"]))

    # --- generate from the training prompt PREFIX (text + speech_start) ----
    ids_row = np.asarray(batch["input_ids"][0])
    in_mask = np.asarray(batch["acoustic_input_mask"][0])
    cut = int(np.argmax(in_mask))                    # first diffusion slot
    assert ids_row[cut - 1] == tk.speech_start_id
    prompt = ids_row[:cut][None, :]

    from vibevoice_tpu.generation import VibeVoiceGenerator
    gen = VibeVoiceGenerator(jax.device_get(state.params), CFG, tk,
                             ddpm_inference_steps=8, lm_dtype=jnp.float32)
    out = gen.generate(prompt, cfg_scale=1.0, max_new_tokens=N_FRAMES + 4,
                       chunk_steps=4, max_length_times=1000.0,
                       refresh_negative=False, seed=11)
    # CE training taught the LM to emit diffusion tokens after speech_start
    toks = np.asarray(out.sequences[0])
    assert (toks == tk.speech_diffusion_id).sum() >= N_FRAMES // 2, toks
    audio = out.speech_outputs[0]
    assert audio is not None and len(audio) >= (N_FRAMES // 2) * FRAME

    # --- oracle renders through the same decoder ---------------------------
    fp = jax.device_get(state.params)

    def render(wave: np.ndarray) -> np.ndarray:
        m, _ = tokm.encode(fp["acoustic"]["encoder"], acfg,
                           jnp.asarray(wave)[None, :, None])
        audio_r, _ = tokm.decode(fp["acoustic"]["decoder"], acfg, m)
        return np.asarray(audio_r[0, :, 0])

    oracle = render(target)                          # trained tone family
    control = render(_tone(4 * FRAME, N_FRAMES * FRAME))  # held-out tone

    sim_oracle = _spec_cos(audio, oracle)
    sim_control = _spec_cos(audio, control)
    # measured run: 0.80 vs 0.40 (waveform corr 0.56)
    assert sim_oracle > sim_control + 0.15, (sim_oracle, sim_control)
    assert sim_oracle > 0.65, sim_oracle
    n = min(len(audio), len(oracle))
    assert np.corrcoef(audio[:n], oracle[:n])[0, 1] > 0.3

    # --- quantized serving tiers preserve the LEARNED audio ----------------
    # (the random-weight error bounds in test_quant.py cannot say this: here
    # the weights carry actual structure and the whole constrained-decode ->
    # diffusion -> vocode chain must still land in the trained tone family)
    from vibevoice_tpu.ops.quant import (quantize_diffusion_head_params,
                                         quantize_lm_params)
    for bits, colscale, tag in ((8, False, "int8"), (4, True, "int4c")):
        qp = dict(fp)
        qp["lm"] = quantize_lm_params(fp["lm"], bits=bits, colscale=colscale)
        qp["diffusion_head"] = quantize_diffusion_head_params(
            fp["diffusion_head"], bits=bits, colscale=colscale)
        genq = VibeVoiceGenerator(qp, CFG, tk, ddpm_inference_steps=8,
                                  lm_dtype=jnp.float32)
        outq = genq.generate(prompt, cfg_scale=1.0,
                             max_new_tokens=N_FRAMES + 4, chunk_steps=4,
                             max_length_times=1000.0, refresh_negative=False,
                             seed=11)
        toks_q = np.asarray(outq.sequences[0])
        assert (toks_q == tk.speech_diffusion_id).sum() >= N_FRAMES // 2, \
            (tag, toks_q)
        audio_q = outq.speech_outputs[0]
        assert audio_q is not None, tag
        sim_q = _spec_cos(audio_q, oracle)
        assert sim_q > _spec_cos(audio_q, control) + 0.1, (tag, sim_q)
        assert sim_q > 0.6, (tag, sim_q)
