"""Normalization primitives.

RMSNorm with fp32 internals matching the reference numerics
(reference: modular_vibevoice_tokenizer.py:53-72 and Qwen2RMSNorm): normalize in
float32, cast back to the input dtype, then apply the (unconverted) weight.
XLA fuses these into the surrounding computation; no hand-written kernel needed
on TPU (the APEX fused path in the reference is a CUDA workaround).
"""

from typing import Optional

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: Optional[jax.Array], eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    normed = normed.astype(x.dtype)
    if weight is not None:
        normed = normed * weight
    return normed


def layer_norm(x: jax.Array, weight: Optional[jax.Array], bias: Optional[jax.Array],
               eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        normed = normed * weight.astype(jnp.float32)
    if bias is not None:
        normed = normed + bias.astype(jnp.float32)
    return normed.astype(x.dtype)
