"""Batch file-inference CLI.

Behavioral equivalent of the reference CLI (reference:
demo/inference_from_file.py:166-446): parse a txt/json script, map speaker
names to voice wavs, run generation, report RTF/token metrics, save wavs.

Usage:
    python -m vibevoice_tpu.apps.inference_from_file \
        --model_path /ckpts/VibeVoice-1.5B --txt_path script.txt \
        --speaker_names Alice Bob --output_dir ./outputs
"""

from __future__ import annotations

import argparse
import os
import re
import time
from typing import Dict, List

import numpy as np


class VoiceMapper:
    """Map speaker names to voice-prompt files (reference
    inference_from_file.py:44-117): scans a voices directory, matches by
    (normalized) name with prefix/substring fallbacks."""

    def __init__(self, voices_dir: str):
        self.voices_dir = voices_dir
        self.voice_presets: Dict[str, str] = {}
        if os.path.isdir(voices_dir):
            for f in sorted(os.listdir(voices_dir)):
                if f.lower().endswith((".wav", ".mp3", ".flac", ".m4a", ".ogg",
                                       ".npy", ".pt")):
                    name = os.path.splitext(f)[0]
                    # strip locale/gender suffixes like "en-Alice_woman"
                    if "_" in name:
                        name = name.split("_")[0]
                    if "-" in name:
                        name = name.split("-")[-1]
                    self.voice_presets[name.lower()] = os.path.join(voices_dir, f)

    def get_voice_path(self, speaker_name: str) -> str:
        key = speaker_name.lower().strip()
        if key in self.voice_presets:
            return self.voice_presets[key]
        for name, path in self.voice_presets.items():
            if key in name or name in key:
                return path
        if self.voice_presets:
            first = next(iter(self.voice_presets.values()))
            print(f"Warning: no voice preset for '{speaker_name}', using {first}")
            return first
        raise FileNotFoundError(f"No voice presets found in {self.voices_dir}")


def parse_txt_script(txt_content: str, speaker_names: List[str]):
    """Replace 'Speaker NAME:' with canonical 'Speaker N:' lines
    (reference inference_from_file.py:120-163)."""
    lines = []
    actors: List[str] = []
    for line in txt_content.strip().split("\n"):
        line = line.strip()
        if not line:
            continue
        m = re.match(r"^Speaker\s+(\d+)\s*:\s*(.*)$", line, re.IGNORECASE)
        if m:
            lines.append(line)
            continue
        m = re.match(r"^([A-Za-z0-9_ .\-]+?)\s*:\s*(.*)$", line)
        if m:
            name = m.group(1).strip()
            if name not in actors:
                actors.append(name)
            sid = actors.index(name) + 1
            lines.append(f"Speaker {sid}: {m.group(2).strip()}")
        else:
            lines.append(f"Speaker 1: {line}")
    return "\n".join(lines), actors or list(speaker_names)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="VibeVoice-TPU batch inference")
    p.add_argument("--model_path", type=str, required=False, default=None,
                   help="checkpoint directory (HF-format); omit for random-weights smoke run")
    p.add_argument("--model_size", type=str, default="1.5b", choices=["1.5b", "7b", "tiny"])
    p.add_argument("--txt_path", "--txt-path", type=str, required=True)
    p.add_argument("--speaker_names", "--speaker-names", nargs="+", default=["Speaker"])
    p.add_argument("--voices_dir", type=str, default=None)
    p.add_argument("--output_dir", "--output-dir", type=str, default="./outputs")
    p.add_argument("--cfg_scale", type=float, default=1.3)
    p.add_argument("--ddpm_steps", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--do_sample", action="store_true")
    p.add_argument("--temperature", type=float, default=0.95)
    p.add_argument("--top_p", type=float, default=0.95)
    p.add_argument("--max_length_times", type=float, default=2.0)
    p.add_argument("--chunk_steps", type=int, default=32)
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--quantize", nargs="?", const="int8", default="",
                   choices=["int8", "int4", "int4g"],
                   help="weight-only LM tier (fits 7B on one chip): bare "
                        "flag or 'int8' (quality default), 'int4' "
                        "(per-column speed tier), 'int4g' (group-16)")
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel size (>0 builds a ('dp','tp') mesh "
                        "over all visible devices; the TP serving path)")
    p.add_argument("--dp", type=int, default=0, help="data-parallel size")
    return p


def main(argv=None):
    import jax.numpy as jnp

    from ..config import VibeVoiceConfig
    from ..generation import VibeVoiceGenerator
    from ..processor import VibeVoiceProcessor

    args = build_argparser().parse_args(argv)

    if args.model_path:
        from ..convert import load_pretrained
        params, cfg = load_pretrained(args.model_path)
        proc = VibeVoiceProcessor.from_pretrained(args.model_path)
    else:
        import jax
        from ..models import vibevoice
        print("No --model_path: running with random weights (smoke mode)")
        cfg = VibeVoiceConfig.named(args.model_size)
        params = vibevoice.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
        proc = VibeVoiceProcessor()

    if args.quantize:
        from ..ops.quant import quantize_lm_params
        bits = 8 if args.quantize == "int8" else 4
        colscale = args.quantize == "int4"
        params = dict(params)
        params["lm"] = quantize_lm_params(params["lm"], bits=bits,
                                          colscale=colscale)

    mesh = None
    if args.tp or args.dp:
        from ..parallel import make_mesh
        mesh = make_mesh(tp=args.tp or None, dp=args.dp or None)
        print(f"Serving on mesh {dict(mesh.shape)}")

    gen = VibeVoiceGenerator(params, cfg, proc.tokenizer,
                             ddpm_inference_steps=args.ddpm_steps, mesh=mesh)

    with open(args.txt_path, encoding="utf-8") as f:
        txt = f.read()
    script, actors = parse_txt_script(txt, args.speaker_names)

    voice_samples = None
    if args.voices_dir:
        mapper = VoiceMapper(args.voices_dir)
        names = args.speaker_names if args.speaker_names != ["Speaker"] else actors
        voice_samples = [mapper.get_voice_path(n) for n in names]

    inputs = proc(script, voice_samples=voice_samples)
    n_prompt = int(inputs["attention_mask"].sum())

    print(f"Starting generation with cfg_scale: {args.cfg_scale}")
    t0 = time.time()
    out = gen.generate(
        inputs["input_ids"], attention_mask=inputs["attention_mask"],
        speech_tensors=inputs["speech_tensors"], speech_masks=inputs["speech_masks"],
        speech_input_mask=inputs["speech_input_mask"], cfg_scale=args.cfg_scale,
        do_sample=args.do_sample, temperature=args.temperature, top_p=args.top_p,
        top_k=args.top_k,
        negative_prompt_ids=(np.asarray([proc.tokenizer.encode(args.negative_prompt)])
                             if args.negative_prompt else None),
        max_length_times=args.max_length_times, seed=args.seed,
        chunk_steps=args.chunk_steps)
    gen_time = time.time() - t0

    os.makedirs(args.output_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.txt_path))[0]
    wav = out.speech_outputs[0]
    out_path = os.path.join(args.output_dir, f"{base}_generated.wav")
    audio_dur = 0.0
    if wav is not None:
        proc.save_audio(wav, out_path)
        audio_dur = len(wav) / 24000.0
        print(f"Saved output to {out_path}")
    else:
        print("No speech generated")

    n_gen = out.sequences.shape[1]
    rtf = gen_time / audio_dur if audio_dur > 0 else float("inf")
    print(f"Generation time: {gen_time:.2f}s")
    print(f"Audio duration: {audio_dur:.2f}s")
    print(f"RTF (real-time factor): {rtf:.2f}")
    print(f"Prefill tokens: {n_prompt}  Generated tokens: {n_gen}")
    return out


if __name__ == "__main__":
    main()
