"""Attention ops: XLA reference path + backend dispatch.

The reference selects between flash-attention-2 and SDPA at load time
(reference: main.py:79-86, demo/inference_from_file.py:23-38).  Here the same
switch selects between the Pallas flash kernel (TPU) and a fused-XLA einsum
path (the universal fallback, used on CPU test meshes).

GQA (12q/2kv on 1.5B, 28q/4kv on 7B) is computed without materializing
repeated K/V heads: queries are grouped as [B, T, Hkv, G, D] and contracted
against the shared KV head.
"""

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(-2.0 ** 30)  # large-negative instead of -inf: keeps softmax NaN-free


def _group_query(q: jax.Array, num_kv: int) -> jax.Array:
    b, t, hq, d = q.shape
    return q.reshape(b, t, num_kv, hq // num_kv, d)


def attend(q: jax.Array, k: jax.Array, v: jax.Array,
           mask: Optional[jax.Array] = None, scale: Optional[float] = None) -> jax.Array:
    """Grouped-query attention, fp32 softmax.

    q: [B, Tq, Hq, D]; k, v: [B, Tk, Hkv, D]
    mask: [B, Tq, Tk] or [B, 1, Tq, Tk] boolean (True = attend) or additive float.
    Returns [B, Tq, Hq, D].
    """
    b, tq, hq, d = q.shape
    hkv = k.shape[2]
    scale = scale if scale is not None else d ** -0.5
    qg = _group_query(q, hkv)                                  # [B,Tq,Hkv,G,D]
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        if mask.dtype == jnp.bool_:
            bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
        else:
            bias = mask.astype(jnp.float32)
        if bias.ndim == 3:
            bias = bias[:, None, None, :, :]                    # [B,1,1,Tq,Tk]
        elif bias.ndim == 4:
            bias = bias[:, :, None, :, :]
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, tq, hq, d).astype(q.dtype)


def causal_mask(tq: int, tk: int, q_offset=0) -> jax.Array:
    """Boolean causal mask [tq, tk]; query i attends keys <= i + q_offset."""
    qi = jnp.arange(tq)[:, None] + q_offset
    kj = jnp.arange(tk)[None, :]
    return kj <= qi


# decode attention lives in ops/flash_decode.py (Pallas kernel + head-major
# XLA fallback); this module keeps the general masked GQA path used by
# prefill, training, and tests.
