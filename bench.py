"""Benchmark: VibeVoice-1.5B steady-state generation RTF on one TPU chip.

Measures the full fused token step (CFG-paired LM decode + constrained
sampling + DPM diffusion scan + streaming vocode + semantic re-encode) in the
real serving configuration: batch 1, bf16, 5 diffusion steps (BASELINE config
1), chunked device scan with host sync per chunk.

RTF = generated audio seconds per wall second; every generation step emits one
7.5 Hz acoustic frame (3200 samples at 24 kHz).  Target: RTF >= 0.3 ("3x
realtime" reading: >= 3.0 audio-sec/wall-sec — both derive from the same
measurement; we report audio-sec/wall-sec).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vibevoice_tpu.config import VibeVoiceConfig
    from vibevoice_tpu.generation import VibeVoiceGenerator
    from vibevoice_tpu.models import vibevoice
    from vibevoice_tpu.processor.text_tokenizer import ByteFallbackTokenizer

    model_name = os.environ.get("BENCH_MODEL", "1.5b")
    ddpm_steps = int(os.environ.get("BENCH_DDPM_STEPS", "5"))
    bench_steps = int(os.environ.get("BENCH_STEPS", "192"))
    chunk = int(os.environ.get("BENCH_CHUNK", "64"))
    t0 = 64

    cfg = VibeVoiceConfig.named(model_name)
    dtype = jnp.bfloat16

    # cheap deterministic params (values don't affect timing)
    shapes = jax.eval_shape(lambda k: vibevoice.init_params(k, cfg, dtype),
                            jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
    params = dict(params)

    tk = ByteFallbackTokenizer()
    gen = VibeVoiceGenerator(params, cfg, tk, ddpm_inference_steps=ddpm_steps,
                             lm_dtype=dtype)

    rs = np.random.RandomState(0)
    ids = rs.randint(20, 200, (1, t0))
    ids[:, -1] = tk.speech_start_id

    # warmup / compile with the EXACT shape buckets of the measured runs
    t_compile0 = time.perf_counter()
    gen.generate(ids, cfg_scale=1.3, max_new_tokens=bench_steps, chunk_steps=chunk,
                 max_length_times=1000.0)
    gen.generate(ids, cfg_scale=1.3, max_new_tokens=1, chunk_steps=1,
                 max_length_times=1000.0)
    compile_s = time.perf_counter() - t_compile0

    # time-to-first-audio: prefill + one 1-step chunk (compiled)
    t_ttfa0 = time.perf_counter()
    gen.generate(ids, cfg_scale=1.3, max_new_tokens=1, chunk_steps=1,
                 max_length_times=1000.0)
    ttfa_s = time.perf_counter() - t_ttfa0

    # steady-state: run bench_steps and time the whole serving path
    t0_run = time.perf_counter()
    out = gen.generate(ids, cfg_scale=1.3, max_new_tokens=bench_steps,
                       chunk_steps=chunk, max_length_times=1000.0)
    wall = time.perf_counter() - t0_run

    steps = out.sequences.shape[1]
    frame_sec = cfg.acoustic_tokenizer.total_stride / 24000.0
    audio_sec = steps * frame_sec
    rtf = audio_sec / wall

    print(json.dumps({
        "metric": f"rtf_{model_name}_b1_cfg_ddpm{ddpm_steps}",
        "value": round(rtf, 4),
        "unit": "audio_sec_per_wall_sec",
        "vs_baseline": round(rtf / 0.3, 3),
        "steps": int(steps),
        "wall_s": round(wall, 3),
        "ms_per_step": round(1000 * wall / max(steps, 1), 2),
        "ttfa_s": round(ttfa_s, 3),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
