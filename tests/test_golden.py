"""Golden end-to-end regression fixtures (SURVEY.md §4: "end-to-end golden
audio latents with a fixed seed" — the seam the reference never tests).

The committed fixture (tests/golden/generate_tiny.npz) pins the tokens and
vocoded audio of a fixed-seed tiny-config generation with a voice prompt,
CFG, sampling, and the full diffusion+vocode+semantic loop.  ANY numerics
change in the LM, solver, tokenizer, connectors, or generation state machine
fails this test.  Regenerate deliberately with tests/golden/README applied
only when a numerics change is intended.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.generation.generate import VibeVoiceGenerator
from vibevoice_tpu.models import vibevoice

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "generate_tiny.npz")
CFG = VibeVoiceConfig.named("tiny")


class TinyTokenizer:
    eos_id = 3
    speech_start_id = 10
    speech_end_id = 11
    speech_diffusion_id = 12
    pad_id = 4


def _golden_params():
    params = dict(vibevoice.init_params(jax.random.PRNGKey(42), CFG, jnp.float32))
    rs = np.random.RandomState(7)
    params["diffusion_head"] = jax.tree.map(
        lambda x: jnp.asarray(rs.randn(*x.shape) * 0.05, x.dtype),
        params["diffusion_head"])
    return params


def test_golden_generation():
    g = np.load(GOLDEN)
    gen = VibeVoiceGenerator(_golden_params(), CFG, TinyTokenizer(),
                             ddpm_inference_steps=4, lm_dtype=jnp.float32)
    out = gen.generate(g["input_ids"], speech_tensors=g["speech"],
                       speech_masks=g["speech_masks"],
                       speech_input_mask=g["speech_input_mask"],
                       cfg_scale=1.7, max_new_tokens=12, chunk_steps=4,
                       do_sample=True, temperature=6.0, top_p=1.0,
                       seed=13, max_length_times=1000.0)
    np.testing.assert_array_equal(out.sequences, g["tokens"])
    audio = out.speech_outputs[0]
    assert int(g["audio_len"]) == (0 if audio is None else len(audio))
    if audio is not None:
        head = g["audio_head"]
        np.testing.assert_allclose(audio[:len(head)], head,
                                   rtol=2e-4, atol=1e-11)
        np.testing.assert_allclose(audio.mean(), float(g["audio_mean"]),
                                   rtol=2e-4, atol=1e-11)
        np.testing.assert_allclose(audio.std(), float(g["audio_std"]),
                                   rtol=2e-4, atol=1e-11)


def test_golden_chunking_invariance():
    """The committed outputs must not depend on host chunking (chunk_steps is
    a scheduling knob, not a semantic one)."""
    g = np.load(GOLDEN)
    gen = VibeVoiceGenerator(_golden_params(), CFG, TinyTokenizer(),
                             ddpm_inference_steps=4, lm_dtype=jnp.float32)
    out = gen.generate(g["input_ids"], speech_tensors=g["speech"],
                       speech_masks=g["speech_masks"],
                       speech_input_mask=g["speech_input_mask"],
                       cfg_scale=1.7, max_new_tokens=12, chunk_steps=2,
                       do_sample=True, temperature=6.0, top_p=1.0,
                       seed=13, max_length_times=1000.0)
    np.testing.assert_array_equal(out.sequences[:, :g["tokens"].shape[1]],
                                  g["tokens"])
