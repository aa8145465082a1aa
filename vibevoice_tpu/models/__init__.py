from . import acoustic_tokenizer, connectors, diffusion_head, qwen2, vibevoice

__all__ = ["qwen2", "acoustic_tokenizer", "diffusion_head", "connectors", "vibevoice"]
