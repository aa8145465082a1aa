"""Regenerate the golden generation fixture (see README.md)."""
import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from test_golden import CFG, TinyTokenizer, _golden_params
from vibevoice_tpu.generation.generate import VibeVoiceGenerator

gen = VibeVoiceGenerator(_golden_params(), CFG, TinyTokenizer(),
                         ddpm_inference_steps=4, lm_dtype=jnp.float32)
ids = np.random.RandomState(3).randint(20, 200, (1, 16)); ids[:, -1] = 10
frame = CFG.acoustic_tokenizer.total_stride
sp = np.random.RandomState(4).randn(1, 3 * frame).astype(np.float32) * 0.1
smask = np.ones((1, 3), bool)
sim = np.zeros((1, 16), bool); sim[:, 5:8] = True
out = gen.generate(ids, speech_tensors=sp, speech_masks=smask,
                   speech_input_mask=sim, cfg_scale=1.7, max_new_tokens=12,
                   chunk_steps=4, do_sample=True, temperature=6.0, top_p=1.0,
                   seed=13, max_length_times=1000.0)
audio = out.speech_outputs[0]
np.savez(os.path.join(os.path.dirname(__file__), "generate_tiny.npz"),
         input_ids=ids, speech=sp, speech_masks=smask, speech_input_mask=sim,
         tokens=out.sequences,
         audio_head=(audio[:256] if audio is not None else np.zeros(0, np.float32)),
         audio_mean=(audio.mean() if audio is not None else 0.0),
         audio_std=(audio.std() if audio is not None else 0.0),
         audio_len=(len(audio) if audio is not None else 0))
print("rewrote generate_tiny.npz; tokens:", out.sequences.tolist())
