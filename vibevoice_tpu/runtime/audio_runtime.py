"""ctypes bindings for the native C++ audio runtime.

Builds libvibevoice_audio.so on first use (make, ~1s); every consumer has a
pure-Python fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from fractions import Fraction
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvibevoice_audio.so")
_lib = None
_build_lock = threading.Lock()
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:  # noqa: BLE001 - toolchain optional
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_size_t]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_push.restype = ctypes.c_int
        lib.ring_push.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_size_t]
        lib.ring_pop.restype = ctypes.c_long
        lib.ring_pop.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_size_t, ctypes.c_long]
        lib.ring_close.argtypes = [ctypes.c_void_p]
        lib.ring_size.restype = ctypes.c_size_t
        lib.ring_size.argtypes = [ctypes.c_void_p]
        lib.f32_to_i16.argtypes = [ctypes.POINTER(ctypes.c_float),
                                   ctypes.POINTER(ctypes.c_int16), ctypes.c_size_t]
        lib.normalize_dbfs.argtypes = [ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_size_t, ctypes.c_float, ctypes.c_float]
        lib.resample_len.restype = ctypes.c_size_t
        lib.resample_len.argtypes = [ctypes.c_size_t, ctypes.c_long, ctypes.c_long]
        lib.resample_sinc.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
                                      ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
                                      ctypes.c_long, ctypes.c_long, ctypes.c_int]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeAudioRing:
    """Bounded SPSC float32 chunk queue backed by the C++ ring buffer."""

    def __init__(self, max_chunks: int = 1024):
        lib = _load()
        if lib is None:
            raise RuntimeError("native audio runtime not available")
        self._lib = lib
        self._h = lib.ring_create(max_chunks)

    def push(self, chunk: np.ndarray) -> bool:
        chunk = np.ascontiguousarray(chunk, np.float32).reshape(-1)
        return bool(self._lib.ring_push(self._h, _fptr(chunk), chunk.size))

    def pop(self, max_samples: int = 48000, timeout_ms: int = -1) -> Optional[np.ndarray]:
        """None on timeout; empty array when closed and drained."""
        out = np.empty(max_samples, np.float32)
        n = self._lib.ring_pop(self._h, _fptr(out), max_samples, timeout_ms)
        if n == 0:
            return None
        if n < 0:
            return np.empty(0, np.float32)
        return out[:n].copy()

    def close(self) -> None:
        self._lib.ring_close(self._h)

    def __len__(self) -> int:
        return int(self._lib.ring_size(self._h))

    def __del__(self):
        try:
            self._lib.ring_destroy(self._h)
        except Exception:  # noqa: BLE001
            pass


def native_f32_to_i16(audio: np.ndarray) -> np.ndarray:
    lib = _load()
    audio = np.ascontiguousarray(audio, np.float32).reshape(-1)
    if lib is None:
        return (np.clip(audio, -1, 1) * 32767.0).round().astype(np.int16)
    out = np.empty(audio.size, np.int16)
    lib.f32_to_i16(_fptr(audio), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                   audio.size)
    return out


def native_normalize_dbfs(audio: np.ndarray, target_db: float = -25.0,
                          eps: float = 1e-6) -> np.ndarray:
    lib = _load()
    audio = np.ascontiguousarray(audio, np.float32).reshape(-1).copy()
    if lib is None:
        return audio  # caller falls back to the Python normalizer
    lib.normalize_dbfs(_fptr(audio), audio.size, target_db, eps)
    return audio


def native_resample(audio: np.ndarray, orig_sr: int, target_sr: int,
                    num_zeros: int = 16) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    frac = Fraction(target_sr, orig_sr).limit_denominator(1000)
    up, down = frac.numerator, frac.denominator
    audio = np.ascontiguousarray(audio, np.float32).reshape(-1)
    n_out = int(lib.resample_len(audio.size, up, down))
    out = np.empty(n_out, np.float32)
    lib.resample_sinc(_fptr(audio), audio.size, _fptr(out), n_out, up, down, num_zeros)
    return out
