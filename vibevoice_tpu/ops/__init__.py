from .norms import layer_norm, rms_norm
from .rope import apply_rope, rope_cos_sin

__all__ = ["rms_norm", "layer_norm", "apply_rope", "rope_cos_sin"]
