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


def _bytes_to_unicode():
    """GPT-2 byte<->unicode table (the encoding Qwen2's BPE vocab is written
    in): printable bytes map to themselves, the rest to U+0100+offset."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


# Qwen2 pre-tokenization pattern (HF Qwen2Tokenizer PRETOKENIZE_REGEX)
_QWEN2_PRETOKENIZE = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}|"
    r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+")


def _compile_special_splitter(specials: dict):
    """Alternation over the added special-token literals, longest first —
    HF splits text on added tokens BEFORE the BPE pre-tokenizer runs
    (reference modular_vibevoice_text_tokenizer.py:68-80 registers
    <|vision_start|> etc. as additional_special_tokens), so a literal
    control marker inside a script must resolve to its id, not get BPE'd."""
    if not specials:
        return None
    import re
    alts = sorted(specials, key=len, reverse=True)
    return re.compile("(" + "|".join(re.escape(t) for t in alts) + ")")


class Qwen2BPETokenizer(_SpeechTokenMixin):
    """Standalone Qwen2-style byte-level BPE (no transformers dependency).

    Loads the standard HF artifacts — vocab.json + merges.txt, or a combined
    tokenizer.json — and implements GPT-2 byte-level BPE with Qwen2's
    pre-tokenization regex (reference modular_vibevoice_text_tokenizer.py
    wraps HF's Qwen2Tokenizer; this is the from-scratch equivalent so the
    framework tokenizes without the transformers runtime).
    """

    def __init__(self, vocab: dict, merges: list, specials: Optional[dict] = None):
        import regex
        self._re = regex.compile(_QWEN2_PRETOKENIZE)
        self.vocab = vocab                              # token str -> id
        self.inv_vocab = {v: k for k, v in vocab.items()}
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_enc = _bytes_to_unicode()
        self.byte_dec = {v: k for k, v in self.byte_enc.items()}
        self._specials = specials or {}                 # token str -> id
        self._special_re = _compile_special_splitter(self._specials)
        self._cache: dict = {}

    # -- loading -----------------------------------------------------------
    @classmethod
    def from_pretrained(cls, path: str) -> "Qwen2BPETokenizer":
        import json
        tok_json = os.path.join(path, "tokenizer.json")
        vocab_json = os.path.join(path, "vocab.json")
        merges_txt = os.path.join(path, "merges.txt")
        specials = {}
        if os.path.isfile(tok_json):
            with open(tok_json, encoding="utf-8") as f:
                data = json.load(f)
            vocab = data["model"]["vocab"]
            merges = [tuple(m.split(" ") if isinstance(m, str) else m)
                      for m in data["model"]["merges"]]
            for t in data.get("added_tokens", []):
                specials[t["content"]] = t["id"]
        elif os.path.isfile(vocab_json) and os.path.isfile(merges_txt):
            with open(vocab_json, encoding="utf-8") as f:
                vocab = json.load(f)
            merges = []
            with open(merges_txt, encoding="utf-8") as f:
                for line in f:
                    line = line.rstrip("\n")
                    if not line or line.startswith("#version"):
                        continue
                    merges.append(tuple(line.split(" ")))
            cfg_json = os.path.join(path, "tokenizer_config.json")
            if os.path.isfile(cfg_json):
                with open(cfg_json, encoding="utf-8") as f:
                    cfg = json.load(f)
                for tid, t in (cfg.get("added_tokens_decoder") or {}).items():
                    specials[t["content"]] = int(tid)
        else:
            raise FileNotFoundError(f"no tokenizer files under {path}")
        return cls(vocab, merges, specials)

    # -- BPE ---------------------------------------------------------------
    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = list(token)
        while len(word) > 1:
            pairs = [(self.ranks.get((word[i], word[i + 1]), 1 << 60), i)
                     for i in range(len(word) - 1)]
            rank, i = min(pairs)
            if rank >= 1 << 60:
                break
            word = word[:i] + [word[i] + word[i + 1]] + word[i + 2:]
        self._cache[token] = word
        return word

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        if self._special_re is not None:
            ids: List[int] = []
            for seg in self._special_re.split(text):
                if not seg:
                    continue
                sid = self._specials.get(seg)
                if sid is not None:
                    ids.append(sid)
                else:
                    ids.extend(self._encode_ordinary(seg))
            return ids
        return self._encode_ordinary(text)

    def _encode_ordinary(self, text: str) -> List[int]:
        ids: List[int] = []
        for piece in self._re.findall(text):
            enc = "".join(self.byte_enc[b] for b in piece.encode("utf-8"))
            for sub in self._bpe(enc):
                tid = self.vocab.get(sub)
                if tid is not None:
                    ids.append(tid)
                else:
                    # unknown merge result: fall back to per-character byte
                    # tokens, silently dropping bytes absent from the vocab
                    # (complete byte-level vocabs like Qwen2's cover all 256)
                    ids.extend(t for t in (self.vocab.get(c) for c in sub)
                               if t is not None)
        return ids

    def decode(self, ids, skip_special_tokens: bool = True, **kwargs) -> str:
        inv_special = {v: k for k, v in self._specials.items()}
        parts: List[str] = []
        buf: List[str] = []

        def flush():
            if buf:
                text = "".join(buf)
                parts.append(bytes(self.byte_dec[c] for c in text)
                             .decode("utf-8", errors="replace"))
                buf.clear()

        for i in ids:
            i = int(i)
            if i in inv_special:
                flush()
                if not skip_special_tokens:
                    parts.append(inv_special[i])
            else:
                tok = self.inv_vocab.get(i)
                if tok is not None:
                    buf.append(tok)
        flush()
        return "".join(parts)

    def batch_decode(self, batch, **kwargs):
        return [self.decode(ids, **kwargs) for ids in batch]

    @property
    def vocab_size(self) -> int:
        return max(len(self.vocab),
                   max(self._specials.values(), default=0) + 1)

    def _special_id(self, token: str, default: int) -> int:
        return self._specials.get(token, self.vocab.get(token, default))

    @property
    def eos_id(self) -> int:
        return self._special_id("<|endoftext|>", EOS_ID)

    @property
    def bos_id(self) -> int:
        return self.eos_id

    @property
    def speech_start_id(self) -> int:
        return self._special_id("<|vision_start|>", SPEECH_START_ID)

    @property
    def speech_end_id(self) -> int:
        return self._special_id("<|vision_end|>", SPEECH_END_ID)

    @property
    def speech_diffusion_id(self) -> int:
        return self._special_id("<|vision_pad|>", SPEECH_DIFFUSION_ID)

    @property
    def pad_id(self) -> int:
        return self._special_id("<|image_pad|>", PAD_ID)


class ByteFallbackTokenizer(_SpeechTokenMixin):
    """Deterministic UTF-8 byte tokenizer with Qwen2.5 special-token ids.

    Token id == byte value (0..255); ids >= 151643 are special tokens.
    Keeps prompt-layout logic fully testable without vocab files.
    """

    vocab_size = 151936

    _SPECIAL_STRINGS = {"<|endoftext|>": EOS_ID, "<|vision_start|>": SPEECH_START_ID,
                        "<|vision_end|>": SPEECH_END_ID,
                        "<|vision_pad|>": SPEECH_DIFFUSION_ID,
                        "<|image_pad|>": PAD_ID}

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        splitter = _compile_special_splitter(self._SPECIAL_STRINGS)
        ids: List[int] = []
        for seg in splitter.split(text):
            sid = self._SPECIAL_STRINGS.get(seg)
            if sid is not None:
                ids.append(sid)
            elif seg:
                ids.extend(seg.encode("utf-8"))
        return ids

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
    """Tokenizer fallback chain: standalone Qwen2 BPE (no transformers
    runtime) -> HF wrapper -> offline byte stand-in."""
    if path and (os.path.isdir(path) or os.path.isfile(path)):
        try:
            return Qwen2BPETokenizer.from_pretrained(path)
        except Exception:  # noqa: BLE001
            pass
        try:
            return VibeVoiceTextTokenizer.from_pretrained(path)
        except Exception:  # noqa: BLE001 - fall through to offline stand-in
            pass
    return ByteFallbackTokenizer()
