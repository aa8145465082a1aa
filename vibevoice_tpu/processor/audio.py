"""Host-side audio processing: normalization, IO, resampling.

Re-provides the reference audio processor's behavior
(reference: vibevoice/processor/vibevoice_tokenizer_processor.py:19-457)
without librosa/soundfile hard dependencies:

  * dB-FS loudness normalization to -25 dB FS with clipping avoidance
    (reference :19-87)
  * stereo -> mono (reference :135-161)
  * file loading: .wav via stdlib `wave` (16/24/32-bit PCM + float32),
    .npy/.npz via numpy, .pt via torch when present; other formats use
    soundfile/librosa only if installed (reference :271-309)
  * resampling to 24 kHz: windowed-sinc polyphase (numpy); the optional C++
    runtime (vibevoice_tpu/runtime) provides a faster path
  * WAV saving incl. batch (reference :352-457)
"""

from __future__ import annotations

import math
import os
import struct
import wave
from fractions import Fraction
from typing import List, Optional, Union

import numpy as np

TARGET_SAMPLE_RATE = 24000


class AudioNormalizer:
    """Normalize loudness to target dB FS, then avoid clipping
    (reference vibevoice_tokenizer_processor.py:19-87)."""

    def __init__(self, target_dB_FS: float = -25.0, eps: float = 1e-6):
        self.target_dB_FS = target_dB_FS
        self.eps = eps

    def tailor_dB_FS(self, audio: np.ndarray):
        rms = np.sqrt(np.mean(audio ** 2))
        scalar = 10 ** (self.target_dB_FS / 20) / (rms + self.eps)
        return audio * scalar, rms, scalar

    def avoid_clipping(self, audio: np.ndarray):
        max_val = np.max(np.abs(audio)) if audio.size else 0.0
        scalar = max_val + self.eps if max_val > 1.0 else 1.0
        return audio / scalar, scalar

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        audio, _, _ = self.tailor_dB_FS(audio)
        audio, _ = self.avoid_clipping(audio)
        return audio


def ensure_mono(audio: np.ndarray) -> np.ndarray:
    if audio.ndim == 1:
        return audio
    if audio.ndim == 2:
        if audio.shape[0] == 2:
            return audio.mean(axis=0)
        if audio.shape[1] == 2:
            return audio.mean(axis=1)
        if audio.shape[0] == 1:
            return audio[0]
        if audio.shape[1] == 1:
            return audio[:, 0]
        raise ValueError(f"Unexpected audio shape {audio.shape}")
    raise ValueError(f"Audio must be 1D/2D, got {audio.shape}")


def resample(audio: np.ndarray, orig_sr: int, target_sr: int,
             num_zeros: int = 16, use_native: bool = True) -> np.ndarray:
    """Polyphase windowed-sinc resampler (host-side numpy).

    Tries the native C++ runtime first (vibevoice_tpu.runtime), falls back to
    a vectorized numpy implementation.
    """
    if orig_sr == target_sr:
        return audio.astype(np.float32)
    if use_native:
        try:
            from ..runtime.audio_runtime import native_resample
            out = native_resample(audio.astype(np.float32), orig_sr, target_sr)
            if out is not None:
                return out
        except Exception:  # noqa: BLE001 - native runtime optional
            pass

    frac = Fraction(target_sr, orig_sr).limit_denominator(1000)
    up, down = frac.numerator, frac.denominator
    n_out = int(math.ceil(len(audio) * up / down))
    # anti-alias cutoff relative to the input rate (only needed when downsampling)
    scale = min(1.0, up / down)
    half_width = int(math.ceil(num_zeros / scale))
    t_out = np.arange(n_out) * (down / up)            # output positions (input samples)
    left = np.floor(t_out).astype(np.int64)
    offsets = np.arange(-half_width, half_width + 1)
    idx = left[:, None] + offsets[None, :]
    dist = t_out[:, None] - idx                        # [n_out, taps]
    # Hann-windowed sinc low-pass
    window = 0.5 * (1.0 + np.cos(np.pi * np.clip(dist / (half_width + 1), -1, 1)))
    kern = np.sinc(dist * scale) * scale * window
    padded = np.pad(audio.astype(np.float64), (half_width + 1, half_width + 2))
    gathered = padded[np.clip(idx + half_width + 1, 0, len(padded) - 1)]
    return (gathered * kern).sum(axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# WAV IO (stdlib)
# ---------------------------------------------------------------------------

def read_wav(path: str):
    """Read a PCM/float32 WAV without external deps. Returns (audio_f32, sr)."""
    with open(path, "rb") as f:
        header = f.read(12)
        if header[:4] != b"RIFF" or header[8:12] != b"WAVE":
            raise ValueError(f"{path} is not a RIFF/WAVE file")
        fmt = None
        data = None
        while True:
            chunk = f.read(8)
            if len(chunk) < 8:
                break
            cid, size = chunk[:4], struct.unpack("<I", chunk[4:])[0]
            payload = f.read(size + (size & 1))
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", payload[:16])
            elif cid == b"data":
                data = payload[:size]
        if fmt is None or data is None:
            raise ValueError(f"{path}: missing fmt/data chunk")
        audio_fmt, channels, sr, _, _, bits = fmt
        if audio_fmt == 3 and bits == 32:  # IEEE float
            audio = np.frombuffer(data, "<f4").astype(np.float32)
        elif audio_fmt in (1, 0xFFFE):
            if bits == 16:
                audio = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
            elif bits == 32:
                audio = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
            elif bits == 24:
                raw = np.frombuffer(data, np.uint8).reshape(-1, 3)
                vals = (raw[:, 0].astype(np.int32) | (raw[:, 1].astype(np.int32) << 8)
                        | (raw[:, 2].astype(np.int32) << 16))
                vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
                audio = vals.astype(np.float32) / float(1 << 23)
            elif bits == 8:
                audio = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
            else:
                raise ValueError(f"Unsupported PCM bit depth {bits}")
        else:
            raise ValueError(f"Unsupported WAV format code {audio_fmt}")
        if channels > 1:
            audio = audio.reshape(-1, channels)
        return audio, sr


def write_wav(path: str, audio: np.ndarray, sample_rate: int = TARGET_SAMPLE_RATE):
    """Write mono 16-bit PCM WAV."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


class VibeVoiceAudioProcessor:
    """Audio front-end with the reference's public surface
    (vibevoice_tokenizer_processor.py:91-457)."""

    model_input_names = ["input_features"]

    def __init__(self, sampling_rate: int = TARGET_SAMPLE_RATE,
                 normalize_audio: bool = True, target_dB_FS: float = -25.0,
                 eps: float = 1e-6, **kwargs):
        self.sampling_rate = sampling_rate
        self.normalize_audio = normalize_audio
        self.target_dB_FS = target_dB_FS
        self.eps = eps
        self.normalizer = AudioNormalizer(target_dB_FS, eps) if normalize_audio else None

    # -- loading -------------------------------------------------------------
    def _load_audio_from_path(self, path: str) -> np.ndarray:
        ext = os.path.splitext(path)[1].lower()
        if ext == ".wav":
            audio, sr = read_wav(path)
        elif ext in (".npy", ".npz"):
            audio = np.load(path)
            if isinstance(audio, np.lib.npyio.NpzFile):
                audio = audio[list(audio.keys())[0]]
            sr = self.sampling_rate
        elif ext == ".pt":
            import torch
            audio = torch.load(path, map_location="cpu").float().numpy()
            sr = self.sampling_rate
        else:
            # mp3/flac/m4a/ogg: optional host codecs
            audio = sr = None
            try:
                import soundfile as sf
                audio, sr = sf.read(path, dtype="float32")
            except ImportError:
                try:
                    import librosa
                    audio, sr = librosa.load(path, sr=None, mono=False)
                except ImportError as e:
                    raise ImportError(
                        f"Reading {ext} requires soundfile or librosa; convert to .wav"
                    ) from e
        audio = ensure_mono(np.asarray(audio))
        if sr != self.sampling_rate:
            audio = resample(audio, sr, self.sampling_rate)
        return audio.astype(np.float32)

    def __call__(self, audio: Union[str, np.ndarray, List], sampling_rate: Optional[int] = None,
                 **kwargs) -> np.ndarray:
        if isinstance(audio, str):
            wav = self._load_audio_from_path(audio)
        else:
            wav = ensure_mono(np.asarray(audio, np.float32))
            if sampling_rate and sampling_rate != self.sampling_rate:
                wav = resample(wav, sampling_rate, self.sampling_rate)
        if self.normalizer is not None:
            wav = self.normalizer(wav)
        return wav

    # -- saving ---------------------------------------------------------------
    def save_audio(self, audio, output_path: str = "output.wav",
                   sampling_rate: Optional[int] = None, normalize: bool = False,
                   batch_prefix: str = "audio_") -> str:
        sr = sampling_rate or self.sampling_rate
        if isinstance(audio, (list, tuple)):
            base, ext = os.path.splitext(output_path)
            outdir = os.path.dirname(output_path) or "."
            paths = []
            for i, item in enumerate(audio):
                p = os.path.join(outdir, f"{batch_prefix}{i}{ext or '.wav'}")
                self.save_audio(item, p, sr, normalize)
                paths.append(p)
            return ",".join(paths)
        arr = np.asarray(getattr(audio, "numpy", lambda: audio)() if hasattr(audio, "numpy")
                         else audio, np.float32).reshape(-1)
        if normalize and np.abs(arr).max() > 0:
            arr = arr / np.abs(arr).max()
        write_wav(output_path, arr, sr)
        return output_path
