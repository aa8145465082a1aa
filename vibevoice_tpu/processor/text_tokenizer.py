"""Text tokenizer: Qwen2 BPE + VibeVoice speech-control tokens.

The reference subclasses Qwen2Tokenizer(Fast) and repurposes three vision
tokens as speech controls (reference:
modular_vibevoice_text_tokenizer.py:68-80, 165-181):

    <|vision_start|> -> speech_start      (id 151652 in Qwen2.5 vocab)
    <|vision_end|>   -> speech_end        (id 151653)
    <|vision_pad|>   -> speech_diffusion  (id 151654)
    <|image_pad|>    -> pad               (id 151655, fast tokenizer)
    <|endoftext|>    -> eos               (id 151643)

Two backends share one interface:
  * ``VibeVoiceTextTokenizer`` wraps a HF Qwen2 tokenizer loaded from local
    files (host-side; tokenization is not a device concern).
  * ``ByteFallbackTokenizer`` is a deterministic offline byte-level stand-in
    (UTF-8 byte -> id) with the same special-token ids, used when no vocab
    files are available (hermetic tests, air-gapped machines).
"""

from __future__ import annotations

import os
from typing import List, Optional

# Qwen2.5 special-token ids (shared by 1.5B and 7B vocabularies)
EOS_ID = 151643
SPEECH_START_ID = 151652   # <|vision_start|>
SPEECH_END_ID = 151653     # <|vision_end|>
SPEECH_DIFFUSION_ID = 151654  # <|vision_pad|>
PAD_ID = 151655            # <|image_pad|>


class _SpeechTokenMixin:
    @property
    def eos_id(self) -> int:
        return EOS_ID

    @property
    def bos_id(self) -> int:
        # Qwen2.5 sets bos_token_id == eos_token_id (<|endoftext|>); kept as a
        # distinct accessor because the constrained-decode set names bos
        # explicitly (reference modeling_vibevoice_inference.py:403-418)
        return EOS_ID

    @property
    def speech_start_id(self) -> int:
        return SPEECH_START_ID

    @property
    def speech_end_id(self) -> int:
        return SPEECH_END_ID

    @property
    def speech_diffusion_id(self) -> int:
        return SPEECH_DIFFUSION_ID

    @property
    def pad_id(self) -> int:
        return PAD_ID


class VibeVoiceTextTokenizer(_SpeechTokenMixin):
    """HF-backed tokenizer (requires local Qwen2 tokenizer files)."""

    def __init__(self, hf_tokenizer):
        self._tok = hf_tokenizer
        added = self._tok.add_special_tokens({
            "additional_special_tokens": [
                "<|vision_start|>", "<|vision_end|>", "<|vision_pad|>"]
        })
        # Resolve actual ids from the vocab (they exist already in Qwen2.5)
        self._ids = {
            "start": self._tok.convert_tokens_to_ids("<|vision_start|>"),
            "end": self._tok.convert_tokens_to_ids("<|vision_end|>"),
            "diff": self._tok.convert_tokens_to_ids("<|vision_pad|>"),
        }

    @classmethod
    def from_pretrained(cls, path: str, **kwargs) -> "VibeVoiceTextTokenizer":
        from transformers import AutoTokenizer
        return cls(AutoTokenizer.from_pretrained(path, **kwargs))

    @property
    def speech_start_id(self) -> int:
        return self._ids["start"]

    @property
    def speech_end_id(self) -> int:
        return self._ids["end"]

    @property
    def speech_diffusion_id(self) -> int:
        return self._ids["diff"]

    @property
    def eos_id(self) -> int:
        return self._tok.eos_token_id

    @property
    def pad_id(self) -> int:
        pid = self._tok.convert_tokens_to_ids("<|image_pad|>")
        return pid if pid is not None else PAD_ID

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        return self._tok.encode(text, add_special_tokens=add_special_tokens)

    def decode(self, ids, **kwargs) -> str:
        return self._tok.decode(ids, **kwargs)

    def batch_decode(self, batch, **kwargs):
        return [self.decode(ids, **kwargs) for ids in batch]


class ByteFallbackTokenizer(_SpeechTokenMixin):
    """Deterministic UTF-8 byte tokenizer with Qwen2.5 special-token ids.

    Token id == byte value (0..255); ids >= 151643 are special tokens.
    Keeps prompt-layout logic fully testable without vocab files.
    """

    vocab_size = 151936

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        return list(text.encode("utf-8"))

    def decode(self, ids, skip_special_tokens: bool = True, **kwargs) -> str:
        by = bytes(i for i in ids if 0 <= i < 256)
        out = by.decode("utf-8", errors="replace")
        if not skip_special_tokens:
            specials = {EOS_ID: "<|endoftext|>", SPEECH_START_ID: "<|vision_start|>",
                        SPEECH_END_ID: "<|vision_end|>",
                        SPEECH_DIFFUSION_ID: "<|vision_pad|>", PAD_ID: "<|image_pad|>"}
            out = "".join(specials.get(i, chr(i) if i < 256 else "") for i in ids)
        return out

    def batch_decode(self, batch, **kwargs):
        return [self.decode(ids, **kwargs) for ids in batch]


def load_text_tokenizer(path: Optional[str] = None) -> _SpeechTokenMixin:
    """Load the HF tokenizer if local files exist; otherwise the byte fallback."""
    if path and (os.path.isdir(path) or os.path.isfile(path)):
        try:
            return VibeVoiceTextTokenizer.from_pretrained(path)
        except Exception:  # noqa: BLE001 - fall through to offline stand-in
            pass
    return ByteFallbackTokenizer()
