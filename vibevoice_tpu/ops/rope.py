"""Rotary position embeddings (RoPE), Qwen2 convention.

theta defaults to 1e6 for VibeVoice's long-context decoding
(reference: vibevoice/configs/qwen2.5_1.5b_64k.json:57 `rope_theta`).
cos/sin are computed in float32 — long-context RoPE loses phase accuracy in
bf16 — and applied with the rotate-half layout used by HF Qwen2.
"""

import jax
import jax.numpy as jnp


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float = 1e6,
                 dtype=jnp.float32):
    """cos/sin tables for given integer positions.

    positions: [...] int array. Returns (cos, sin) of shape [..., head_dim].
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., head_dim/2]
    angles = jnp.concatenate([angles, angles], axis=-1)           # [..., head_dim]
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply RoPE. x: [..., T, H, D] or [..., T, D]; cos/sin: [..., T, D] broadcastable.

    If x has a heads axis before D, cos/sin get an inserted axis.
    """
    if x.ndim == cos.ndim + 1:  # [..., T, H, D] with cos [..., T, D]
        cos = cos[..., None, :]
        sin = sin[..., None, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)
