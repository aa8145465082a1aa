"""VibeVoiceProcessor: scripts + voice samples -> model inputs.

Host-side re-implementation of the reference processor's prompt contract
(reference: vibevoice/processor/vibevoice_processor.py:148-494).  The prompt
layout (per §3.3 of SURVEY.md) is:

    system prompt
    [" Voice input:\n"  per speaker: " Speaker k:" <start> <diff>*ceil(len/3200) <end> "\n"]
    " Text input:\n"    per line: " Speaker k: ...\n"
    " Speech output:\n" <start>

with a boolean ``speech_input_mask`` marking the diffusion-pad slots where
voice-prompt acoustic embeddings get scattered in
(modeling_vibevoice_inference.py:221-224).  Batches are LEFT-padded
(vibevoice_processor.py:333-338).  Outputs are numpy arrays (host) ready to be
device_put.
"""

from __future__ import annotations

import json
import math
import os
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .audio import AudioNormalizer, VibeVoiceAudioProcessor
from .text_tokenizer import load_text_tokenizer

SYSTEM_PROMPT = (" Transform the text provided by various speakers into speech output, "
                 "utilizing the distinct voice of each respective speaker.\n")

_SPEAKER_RE = re.compile(r"^Speaker\s+(\d+)\s*:\s*(.*)$", re.IGNORECASE)


class VibeVoiceProcessor:
    """Wraps a text tokenizer and audio processor into one front-end."""

    def __init__(self, tokenizer=None, audio_processor=None,
                 speech_tok_compress_ratio: int = 3200, db_normalize: bool = True,
                 **kwargs):
        self.tokenizer = tokenizer or load_text_tokenizer()
        self.audio_processor = audio_processor or VibeVoiceAudioProcessor()
        self.speech_tok_compress_ratio = speech_tok_compress_ratio
        self.db_normalize = db_normalize
        self.audio_normalizer = AudioNormalizer() if db_normalize else None
        self.system_prompt = SYSTEM_PROMPT

    # -- persistence (preprocessor_config.json contract, reference :43-146) --
    @classmethod
    def from_pretrained(cls, path: str, **kwargs) -> "VibeVoiceProcessor":
        cfg_path = os.path.join(path, "preprocessor_config.json")
        cfg = {}
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
        audio_cfg = cfg.get("audio_processor", {})
        tok_path = cfg.get("language_model_pretrained_name") or kwargs.pop(
            "language_model_pretrained_name", None) or path
        return cls(
            tokenizer=load_text_tokenizer(tok_path),
            audio_processor=VibeVoiceAudioProcessor(
                sampling_rate=audio_cfg.get("sampling_rate", 24000),
                normalize_audio=audio_cfg.get("normalize_audio", True),
                target_dB_FS=audio_cfg.get("target_dB_FS", -25),
                eps=audio_cfg.get("eps", 1e-6)),
            speech_tok_compress_ratio=cfg.get("speech_tok_compress_ratio", 3200),
            db_normalize=cfg.get("db_normalize", True),
        )

    def save_pretrained(self, save_directory: str, **kwargs) -> None:
        os.makedirs(save_directory, exist_ok=True)
        cfg = {
            "processor_class": "VibeVoiceProcessor",
            "speech_tok_compress_ratio": self.speech_tok_compress_ratio,
            "db_normalize": self.db_normalize,
            "audio_processor": {
                "feature_extractor_type": "VibeVoiceAudioProcessor",
                "sampling_rate": self.audio_processor.sampling_rate,
                "normalize_audio": self.audio_processor.normalize_audio,
                "target_dB_FS": self.audio_processor.target_dB_FS,
                "eps": self.audio_processor.eps,
            },
        }
        with open(os.path.join(save_directory, "preprocessor_config.json"), "w") as f:
            json.dump(cfg, f, indent=2)

    # -- main entry ------------------------------------------------------------
    def __call__(self, text=None, voice_samples=None, padding: bool = True,
                 truncation: bool = False, max_length: Optional[int] = None,
                 return_tensors: Optional[str] = "np",
                 return_attention_mask: bool = True, **kwargs) -> Dict[str, Any]:
        if isinstance(text, str):
            texts, batched = [text], False
        else:
            texts, batched = list(text), True

        if voice_samples is not None:
            if not batched or isinstance(voice_samples[0], (str, np.ndarray)):
                voices = [voice_samples]
            else:
                voices = list(voice_samples)
        else:
            voices = [None] * len(texts)

        encodings = [self._process_single(t, v) for t, v in zip(texts, voices)]
        return self._batch_encode(encodings, padding, truncation, max_length,
                                  return_tensors, return_attention_mask)

    # -- single-script pipeline --------------------------------------------------
    def _process_single(self, text: str, voice_samples) -> Dict[str, Any]:
        script = text
        if isinstance(text, str) and text.endswith(".json") and os.path.exists(text):
            script = self._convert_json_to_script(text)
        elif isinstance(text, str) and text.endswith(".txt") and os.path.exists(text):
            script = self._convert_text_to_script(text)

        parsed = self._parse_script(script)
        speakers = sorted({sid for sid, _ in parsed})

        enc = lambda s: self.tokenizer.encode(s, add_special_tokens=False)
        tokens: List[int] = enc(self.system_prompt)
        mask: List[bool] = [False] * len(tokens)

        speech_inputs: List[np.ndarray] = []
        if voice_samples:
            vtoks, vwavs, vmask = self._create_voice_prompt(voice_samples[:len(speakers)])
            tokens += vtoks
            mask += vmask
            speech_inputs = vwavs

        head = enc(" Text input:\n")
        tokens += head
        mask += [False] * len(head)
        for sid, line in parsed:
            lt = enc(f" Speaker {sid}:{line}\n")
            tokens += lt
            mask += [False] * len(lt)

        tail = enc(" Speech output:\n")
        tokens += tail + [self.tokenizer.speech_start_id]
        mask += [False] * (len(tail) + 1)

        return {"input_ids": tokens, "speech_inputs": speech_inputs or None,
                "speech_input_mask": mask, "parsed_script": parsed,
                "all_speakers": speakers}

    def _create_voice_prompt(self, speaker_samples) -> Tuple[List[int], List[np.ndarray], List[bool]]:
        enc = lambda s: self.tokenizer.encode(s, add_special_tokens=False)
        diff_id = self.tokenizer.speech_diffusion_id
        tokens = enc(" Voice input:\n")
        mask = [False] * len(tokens)
        wavs: List[np.ndarray] = []

        for sid, sample in enumerate(speaker_samples):
            prefix = enc(f" Speaker {sid}:")
            if isinstance(sample, str):
                wav = self.audio_processor._load_audio_from_path(sample)
            else:
                wav = np.asarray(sample, np.float32)
            if self.db_normalize and self.audio_normalizer is not None:
                wav = self.audio_normalizer(wav)
            n_frames = math.ceil(wav.shape[0] / self.speech_tok_compress_ratio)
            tokens += (prefix + [self.tokenizer.speech_start_id]
                       + [diff_id] * n_frames
                       + [self.tokenizer.speech_end_id] + enc("\n"))
            mask += ([False] * len(prefix) + [False] + [True] * n_frames
                     + [False, False])
            wavs.append(wav)
        return tokens, wavs, mask

    # -- batching (left pad) ------------------------------------------------------
    def _batch_encode(self, encodings, padding, truncation, max_length,
                      return_tensors, return_attention_mask) -> Dict[str, Any]:
        ids_list = [e["input_ids"] for e in encodings]
        mask_list = [e["speech_input_mask"] for e in encodings]
        max_len = max(len(i) for i in ids_list)
        if padding == "max_length" and max_length:
            max_len = max_length

        pad_id = self.tokenizer.pad_id
        padded_ids, attn, padded_smask = [], [], []
        for ids, smask in zip(ids_list, mask_list):
            if truncation and max_length and len(ids) > max_length:
                ids, smask = ids[:max_length], smask[:max_length]
            n_pad = max_len - len(ids)
            padded_ids.append([pad_id] * n_pad + ids)
            attn.append([0] * n_pad + [1] * len(ids))
            padded_smask.append([False] * n_pad + smask)

        speech_inputs = []
        for e in encodings:
            if e["speech_inputs"]:
                speech_inputs.extend(e["speech_inputs"])

        out: Dict[str, Any] = {
            "input_ids": np.asarray(padded_ids, np.int64),
            "speech_input_mask": np.asarray(padded_smask, bool),
            "parsed_scripts": [e["parsed_script"] for e in encodings],
            "all_speakers_list": [e["all_speakers"] for e in encodings],
        }
        if return_attention_mask:
            out["attention_mask"] = np.asarray(attn, np.int64)
        if speech_inputs:
            sp = self.prepare_speech_inputs(speech_inputs)
            out["speech_tensors"] = sp["padded_speeches"]
            out["speech_masks"] = sp["speech_masks"]
        else:
            out["speech_tensors"] = None
            out["speech_masks"] = None
        return out

    def prepare_speech_inputs(self, speech_inputs: Sequence[np.ndarray],
                              pad_to_multiple: Optional[int] = None) -> Dict[str, Any]:
        """Pad raw waveforms + per-frame masks (reference :446-494)."""
        ratio = self.speech_tok_compress_ratio
        frame_lens = [math.ceil(len(s) / ratio) for s in speech_inputs]
        max_samples = max(len(s) for s in speech_inputs)
        # keep waveform length frame-aligned so the conv encoder output length
        # equals max(frame_lens)
        max_samples = math.ceil(max_samples / ratio) * ratio
        if pad_to_multiple:
            max_samples = math.ceil(max_samples / (ratio * pad_to_multiple)) * ratio * pad_to_multiple
        padded = np.zeros((len(speech_inputs), max_samples), np.float32)
        masks = np.zeros((len(speech_inputs), max_samples // ratio), bool)
        for i, (s, fl) in enumerate(zip(speech_inputs, frame_lens)):
            padded[i, :len(s)] = s
            masks[i, :fl] = True
        return {"padded_speeches": padded, "speech_masks": masks}

    # -- script ingestion (reference :496-616) -------------------------------------
    def _convert_json_to_script(self, json_file: str) -> str:
        with open(json_file, encoding="utf-8") as f:
            data = json.load(f)
        if not isinstance(data, list):
            raise ValueError("JSON script must be a list of {speaker, text} entries")
        lines = []
        for item in data:
            if not isinstance(item, dict):
                continue
            spk, txt = item.get("speaker"), item.get("text")
            if spk is None or txt is None:
                continue
            try:
                sid = int(spk)
            except (TypeError, ValueError):
                continue
            txt = txt.strip()
            if txt:
                lines.append(f"Speaker {sid}: {txt}")
        if not lines:
            raise ValueError("No valid entries in JSON script")
        return "\n".join(lines)

    def _convert_text_to_script(self, text_file: str) -> str:
        with open(text_file, encoding="utf-8") as f:
            raw = f.readlines()
        lines = []
        for line in raw:
            line = line.strip()
            if not line:
                continue
            m = _SPEAKER_RE.match(line)
            if m:
                if m.group(2).strip():
                    lines.append(f"Speaker {int(m.group(1))}: {m.group(2).strip()}")
            else:
                lines.append(f"Speaker 1: {line}")
        if not lines:
            raise ValueError("No valid content in text script")
        return "\n".join(lines)

    def _parse_script(self, script: str) -> List[Tuple[int, str]]:
        parsed = []
        for line in script.strip().split("\n"):
            line = line.strip()
            if not line:
                continue
            m = _SPEAKER_RE.match(line)
            if m:
                parsed.append((int(m.group(1)), " " + m.group(2).strip()))
        if not parsed:
            raise ValueError("No valid speaker lines found in script")
        # normalize 1-based speaker ids to 0-based (reference :606-616)
        if min(sid for sid, _ in parsed) > 0:
            parsed = [(sid - 1, txt) for sid, txt in parsed]
        return parsed

    # -- misc -----------------------------------------------------------------------
    def batch_decode(self, *args, **kwargs):
        return self.tokenizer.batch_decode(*args, **kwargs)

    def decode(self, *args, **kwargs):
        return self.tokenizer.decode(*args, **kwargs)

    def save_audio(self, audio, output_path: str = "output.wav",
                   sampling_rate: Optional[int] = None, normalize: bool = False,
                   batch_prefix: str = "audio_") -> str:
        return self.audio_processor.save_audio(
            audio, output_path=output_path, sampling_rate=sampling_rate,
            normalize=normalize, batch_prefix=batch_prefix)

    @property
    def model_input_names(self):
        return ["input_ids", "attention_mask", "speech_inputs", "speech_input_mask"]
