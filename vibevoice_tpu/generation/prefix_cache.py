"""Voice-prompt prefix cache: reuse a prefilled KV block across requests.

A VibeVoice prompt is ``system prompt -> voice-prompt section -> script ->
" Speech output:" tail`` (reference vibevoice_processor.py:231-289).  A
serving deployment renders many scripts with the same voices (a podcast's
hosts do not change between episodes), yet the voice section dominates the
prompt: each second of prompt audio is 7.5 diffusion-pad tokens PLUS a full
sigma-VAE encode of the waveform.  This module caches the finished K/V of
that prefix, keyed by its exact tokens and audio bytes, so a repeat request
skips both the acoustic encode and the prefix LM forward and prefills only
the script suffix.

Why the transplant is exact:
  * RoPE positions count valid tokens from zero (models/qwen2.py prefill),
    so a prefix's K/V are independent of how much suffix follows it — a
    block copy into any buffer offset is numerically the SAME values the
    full prefill would have produced there.
  * Voice-latent sampling is keyed on the prefix content hash (not the
    request seed), so the stored K/V are request-independent and a hit is
    bitwise identical to the miss that populated it (both run the same
    transplant + suffix-prefill programs).

The store holds device arrays ([L, 1, Hkv, P, Dh] per k/v, or the {"q","s"}
pair for int8 KV caches) under an LRU bound; eviction frees device HBM.
Thread-safe: the continuous-batching engine prefills on submitter threads.
"""

from __future__ import annotations

import hashlib
import threading
from collections import OrderedDict
from typing import Any, Dict, Optional

import numpy as np


class PrefixCache:
    """LRU store of prefilled voice-prompt KV blocks (device arrays)."""

    def __init__(self, capacity: int = 4):
        if capacity < 1:
            raise ValueError(f"capacity must be >= 1, got {capacity}")
        self.capacity = int(capacity)
        self._entries: "OrderedDict[str, Dict[str, Any]]" = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def key(prefix_ids: np.ndarray, speech_tensors, speech_masks,
            kv_quant: bool) -> str:
        """Content hash of everything that determines the prefix K/V."""
        h = hashlib.sha256()
        h.update(np.ascontiguousarray(prefix_ids, np.int64).tobytes())
        h.update(np.ascontiguousarray(speech_tensors, np.float32).tobytes())
        h.update(np.ascontiguousarray(speech_masks, bool).tobytes())
        h.update(b"q8" if kv_quant else b"bf16")
        return h.hexdigest()

    @staticmethod
    def latent_rng_key(key: str) -> np.ndarray:
        """Deterministic PRNG key for sigma-VAE voice-latent sampling,
        derived from the prefix content so the stored K/V do not depend on
        the request seed (same voice -> same latents -> cache hits are
        bitwise identical to misses)."""
        d = hashlib.sha256(b"latent:" + key.encode()).digest()
        return np.frombuffer(d[:8], np.uint32).copy()

    def get(self, key: str) -> Optional[Dict[str, Any]]:
        with self._lock:
            entry = self._entries.get(key)
            if entry is None:
                self.misses += 1
                return None
            self._entries.move_to_end(key)
            self.hits += 1
            return entry

    def put(self, key: str, entry: Dict[str, Any]) -> None:
        with self._lock:
            self._entries[key] = entry
            self._entries.move_to_end(key)
            while len(self._entries) > self.capacity:
                self._entries.popitem(last=False)

    def __len__(self) -> int:
        return len(self._entries)

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()
