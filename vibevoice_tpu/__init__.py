"""vibevoice_tpu — a TPU-native (JAX/XLA/Pallas/pjit) VibeVoice framework.

A from-scratch re-design of the capabilities of beecave-homelab/VibeVoice-ROCm
(long-form multi-speaker next-token-diffusion TTS) for TPU hardware: functional
model cores, scanned generation, Pallas kernels for the hot paths, and
jax.sharding-based multi-chip parallelism.
"""

__version__ = "0.1.0"

from .config import (
    AcousticTokenizerConfig,
    DiffusionHeadConfig,
    Qwen2DecoderConfig,
    SemanticTokenizerConfig,
    VibeVoiceConfig,
)

__all__ = [
    "VibeVoiceConfig",
    "AcousticTokenizerConfig",
    "SemanticTokenizerConfig",
    "DiffusionHeadConfig",
    "Qwen2DecoderConfig",
]
