"""Configuration system for the VibeVoice-TPU framework.

Plain dataclasses (no HF ``PretrainedConfig`` machinery) composed the same way the
reference composes its four sub-configs (reference:
vibevoice/modular/configuration_vibevoice.py:13,76,130,164).  JSON architecture
files with the reference schema (vibevoice/configs/qwen2.5_*.json) load directly.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _filter_kwargs(cls, d: dict) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


@dataclass(frozen=True)
class AcousticTokenizerConfig:
    """σ-VAE causal-conv acoustic tokenizer config.

    Mirrors the fields consumed by the reference tokenizer
    (configuration_vibevoice.py:13-74, modular_vibevoice_tokenizer.py:694-774).
    """

    channels: int = 1
    vae_dim: int = 64
    fix_std: float = 0.5
    std_dist_type: str = "gaussian"  # 'gaussian' | 'fix' | 'none'
    # encoder/decoder structure
    encoder_n_filters: int = 32
    decoder_n_filters: int = 32
    encoder_ratios: Tuple[int, ...] = (8, 5, 5, 4, 2, 2)
    decoder_ratios: Tuple[int, ...] = (8, 5, 5, 4, 2, 2)
    encoder_depths: Tuple[int, ...] = (3, 3, 3, 3, 3, 3, 8)
    decoder_depths: Optional[Tuple[int, ...]] = None  # default: reversed encoder depths
    # conv / norm details
    kernel_size: int = 7
    last_kernel_size: int = 7
    causal: bool = True
    conv_bias: bool = True
    conv_norm: str = "none"
    pad_mode: str = "constant"
    layernorm: str = "RMSNorm"
    layernorm_eps: float = 1e-5
    layernorm_elementwise_affine: bool = True
    mixer_layer: str = "depthwise_conv"
    layer_scale_init_value: float = 1e-6
    disable_last_norm: bool = True
    weight_init_value: float = 0.01
    ffn_expansion: int = 4

    @property
    def total_stride(self) -> int:
        s = 1
        for r in self.encoder_ratios:
            s *= r
        return s

    @property
    def norm_depths(self) -> Tuple[int, ...]:
        return tuple(self.encoder_depths)

    @property
    def resolved_decoder_depths(self) -> Tuple[int, ...]:
        if self.decoder_depths is not None:
            return tuple(self.decoder_depths)
        return tuple(reversed(tuple(self.encoder_depths)))

    @classmethod
    def from_dict(cls, d: dict) -> "AcousticTokenizerConfig":
        d = dict(d)
        for key in ("encoder_depths", "decoder_depths"):
            v = d.get(key)
            if isinstance(v, str):
                d[key] = tuple(int(x) for x in v.split("-"))
            elif isinstance(v, list):
                d[key] = tuple(v)
        for key in ("encoder_ratios", "decoder_ratios"):
            if isinstance(d.get(key), list):
                d[key] = tuple(d[key])
        return cls(**_filter_kwargs(cls, d))


@dataclass(frozen=True)
class SemanticTokenizerConfig:
    """Encoder-only semantic tokenizer (reference configuration_vibevoice.py:76-128)."""

    channels: int = 1
    vae_dim: int = 128
    fix_std: float = 0.0
    std_dist_type: str = "none"
    encoder_n_filters: int = 32
    encoder_ratios: Tuple[int, ...] = (8, 5, 5, 4, 2, 2)
    encoder_depths: Tuple[int, ...] = (3, 3, 3, 3, 3, 3, 8)
    kernel_size: int = 7
    last_kernel_size: int = 7
    causal: bool = True
    conv_bias: bool = True
    conv_norm: str = "none"
    pad_mode: str = "constant"
    layernorm: str = "RMSNorm"
    layernorm_eps: float = 1e-5
    layernorm_elementwise_affine: bool = True
    mixer_layer: str = "depthwise_conv"
    layer_scale_init_value: float = 1e-6
    disable_last_norm: bool = True
    weight_init_value: float = 0.01
    ffn_expansion: int = 4

    @property
    def total_stride(self) -> int:
        s = 1
        for r in self.encoder_ratios:
            s *= r
        return s

    @classmethod
    def from_dict(cls, d: dict) -> "SemanticTokenizerConfig":
        d = dict(d)
        v = d.get("encoder_depths")
        if isinstance(v, str):
            d["encoder_depths"] = tuple(int(x) for x in v.split("-"))
        elif isinstance(v, list):
            d["encoder_depths"] = tuple(v)
        if isinstance(d.get("encoder_ratios"), list):
            d["encoder_ratios"] = tuple(d["encoder_ratios"])
        return cls(**_filter_kwargs(cls, d))


@dataclass(frozen=True)
class DiffusionHeadConfig:
    """AdaLN diffusion head (reference configuration_vibevoice.py:130-162)."""

    hidden_size: int = 1536
    head_layers: int = 4
    head_ffn_ratio: float = 3.0
    latent_size: int = 64
    rms_norm_eps: float = 1e-5
    freq_embed_size: int = 256
    # diffusion process
    ddpm_num_steps: int = 1000
    ddpm_num_inference_steps: int = 20
    ddpm_beta_schedule: str = "cosine"
    ddpm_batch_mul: int = 4
    prediction_type: str = "v_prediction"
    diffusion_type: str = "ddpm"

    @property
    def ffn_dim(self) -> int:
        return int(self.hidden_size * self.head_ffn_ratio)

    @classmethod
    def from_dict(cls, d: dict) -> "DiffusionHeadConfig":
        d = dict(d)
        if "speech_vae_dim" in d and "latent_size" not in d:
            d["latent_size"] = d["speech_vae_dim"]
        return cls(**_filter_kwargs(cls, d))


@dataclass(frozen=True)
class Qwen2DecoderConfig:
    """Qwen2.5 decoder architecture (reference configs/qwen2.5_*.json `decoder_config`)."""

    vocab_size: int = 151936
    hidden_size: int = 1536
    intermediate_size: int = 8960
    num_hidden_layers: int = 28
    num_attention_heads: int = 12
    num_key_value_heads: int = 2
    head_dim: Optional[int] = None
    max_position_embeddings: int = 65536
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    tie_word_embeddings: bool = True
    hidden_act: str = "silu"
    attention_bias: bool = True  # Qwen2 uses bias on q/k/v projections
    initializer_range: float = 0.02

    @property
    def resolved_head_dim(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @classmethod
    def from_dict(cls, d: dict) -> "Qwen2DecoderConfig":
        return cls(**_filter_kwargs(cls, d))


@dataclass(frozen=True)
class VibeVoiceConfig:
    """Composite model config (reference configuration_vibevoice.py:164-241)."""

    acoustic_tokenizer: AcousticTokenizerConfig = field(default_factory=AcousticTokenizerConfig)
    semantic_tokenizer: SemanticTokenizerConfig = field(default_factory=SemanticTokenizerConfig)
    decoder: Qwen2DecoderConfig = field(default_factory=Qwen2DecoderConfig)
    diffusion_head: DiffusionHeadConfig = field(default_factory=DiffusionHeadConfig)
    acoustic_vae_dim: int = 64
    semantic_vae_dim: int = 128
    dtype: str = "bfloat16"

    @classmethod
    def from_dict(cls, d: dict) -> "VibeVoiceConfig":
        return cls(
            acoustic_tokenizer=AcousticTokenizerConfig.from_dict(d.get("acoustic_tokenizer_config", {})),
            semantic_tokenizer=SemanticTokenizerConfig.from_dict(d.get("semantic_tokenizer_config", {})),
            decoder=Qwen2DecoderConfig.from_dict(d.get("decoder_config", {})),
            diffusion_head=DiffusionHeadConfig.from_dict(d.get("diffusion_head_config", {})),
            acoustic_vae_dim=d.get("acoustic_vae_dim", 64),
            semantic_vae_dim=d.get("semantic_vae_dim", 128),
            dtype=d.get("torch_dtype", d.get("dtype", "bfloat16")),
        )

    @classmethod
    def from_json(cls, path: str) -> "VibeVoiceConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    @classmethod
    def named(cls, name: str) -> "VibeVoiceConfig":
        """Load a bundled architecture config by short name (e.g. '1.5b', '7b', 'tiny')."""
        here = os.path.join(os.path.dirname(__file__), "configs")
        aliases = {
            "1.5b": "qwen2.5_1.5b_64k.json",
            "7b": "qwen2.5_7b_32k.json",
            "tiny": "tiny_test.json",
        }
        fname = aliases.get(name.lower(), name)
        return cls.from_json(os.path.join(here, fname))

    def to_dict(self) -> dict:
        def enc(o):
            if dataclasses.is_dataclass(o):
                return {k: enc(v) for k, v in dataclasses.asdict(o).items()}
            if isinstance(o, tuple):
                return list(o)
            return o

        return {
            "model_type": "vibevoice_tpu",
            "acoustic_vae_dim": self.acoustic_vae_dim,
            "semantic_vae_dim": self.semantic_vae_dim,
            "dtype": self.dtype,
            "acoustic_tokenizer_config": enc(self.acoustic_tokenizer),
            "semantic_tokenizer_config": enc(self.semantic_tokenizer),
            "decoder_config": enc(self.decoder),
            "diffusion_head_config": enc(self.diffusion_head),
        }

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)


__all__ = [
    "AcousticTokenizerConfig",
    "SemanticTokenizerConfig",
    "DiffusionHeadConfig",
    "Qwen2DecoderConfig",
    "VibeVoiceConfig",
]
