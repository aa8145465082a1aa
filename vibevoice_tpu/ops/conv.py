"""Causal 1-D convolution primitives, channels-last.

TPU-native replacement for the reference's ``SConv1d`` / ``SConvTranspose1d``
(reference: modular_vibevoice_tokenizer.py:258-576).  Everything is [B, T, C]
(features on the lane dimension — no transposes around norms, unlike the
reference's channels-first layout), and streaming state is a *fixed-shape*
left-context buffer carried functionally, replacing the reference's dict-of-
tensors ``VibeVoiceTokenizerStreamingCache`` (tokenizer.py:193-256).

Causal padding contract (matches tokenizer.py:282-285, 384-418):
  * conv: left-pad ``(k-1)*d - (s-1)`` zeros (+ right pad to complete the last
    frame) -> output length ceil(T/s); when T % s == 0 streaming == batch.
  * conv-transpose (trim_right_ratio=1): full output, trim ``k - s`` on the
    right -> output length T*s.
Streaming state is zero-initialized, which is exactly equivalent to the batch
left-zero-pad (and, for the transposed conv, to the reference's empty
first-chunk cache — prepended zero inputs contribute nothing and only shift
which output window is returned).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_DN = ("NWC", "WIO", "NWC")


def conv_weight_shape(in_ch: int, out_ch: int, kernel: int, groups: int = 1):
    return (kernel, in_ch // groups, out_ch)


def context_size(kernel: int, stride: int, dilation: int = 1) -> int:
    return (kernel - 1) * dilation - (stride - 1)


def _unpack_qconv(x, w):
    """Support int8 conv weights {"q": int8, "s": f32 [C_out]}: the conv runs
    on the converted int8 kernel (the convert fuses into the conv read) and
    the per-out-channel scale applies to the OUTPUT — conv is linear in w,
    so conv(x, q*s) == conv(x, q) * s for a per-out-channel s."""
    if isinstance(w, dict):
        return w["q"].astype(x.dtype), w["s"]
    return w, None


def causal_conv1d(x: jax.Array, w, b: Optional[jax.Array],
                  stride: int = 1, dilation: int = 1, groups: int = 1) -> jax.Array:
    """Batch-mode causal conv. x: [B, T, C_in], w: [k, C_in/groups, C_out]."""
    w, w_scale = _unpack_qconv(x, w)
    k = w.shape[0]
    pad_left = (k - 1) * dilation - (stride - 1)
    t = x.shape[1]
    # right padding to complete the final frame (get_extra_padding_for_conv1d)
    out_len = -(-t // stride)  # ceil
    needed = (out_len - 1) * stride + (k - 1) * dilation + 1 - pad_left
    pad_right = max(needed - t, 0)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,),
        padding=[(pad_left, pad_right)], rhs_dilation=(dilation,),
        dimension_numbers=_DN, feature_group_count=groups)
    if w_scale is not None:
        y = y * w_scale.astype(y.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def causal_conv1d_step(x: jax.Array, state: jax.Array, w,
                       b: Optional[jax.Array], stride: int = 1, dilation: int = 1,
                       groups: int = 1) -> Tuple[jax.Array, jax.Array]:
    """Streaming step: T must be a multiple of stride.

    state: [B, ctx, C_in] with ctx = (k-1)*d - (s-1).  Returns (y [B, T//s, C_out],
    new_state).
    """
    w, w_scale = _unpack_qconv(x, w)
    ctx = state.shape[1]
    full = jnp.concatenate([state, x], axis=1) if ctx > 0 else x
    y = jax.lax.conv_general_dilated(
        full, w.astype(x.dtype), window_strides=(stride,), padding=[(0, 0)],
        rhs_dilation=(dilation,), dimension_numbers=_DN, feature_group_count=groups)
    if w_scale is not None:
        y = y * w_scale.astype(y.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    new_state = full[:, full.shape[1] - ctx:, :] if ctx > 0 else state
    return y, new_state


def causal_conv_transpose1d(x: jax.Array, w, b: Optional[jax.Array],
                            stride: int) -> jax.Array:
    """Batch-mode causal transposed conv. x: [B, T, C_in], w: [k, C_out, C_in]
    (torch ConvTranspose1d layout transposed to WOI -> we use transpose_kernel).

    Output: [B, T*s, C_out] (right-trimmed by k - s).
    """
    w, w_scale = _unpack_qconv(x, w)
    k = w.shape[0]
    y = jax.lax.conv_transpose(
        x, w.astype(x.dtype), strides=(stride,), padding="VALID",
        dimension_numbers=_DN, transpose_kernel=True)
    trim = k - stride
    if trim > 0:
        y = y[:, :-trim, :]
    if w_scale is not None:
        y = y * w_scale.astype(y.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def causal_conv_transpose1d_step(x: jax.Array, state: jax.Array, w: jax.Array,
                                 b: Optional[jax.Array], stride: int
                                 ) -> Tuple[jax.Array, jax.Array]:
    """Streaming step for the transposed conv.

    state: [B, k-1, C_in] of past *inputs* (zeros initially).  Returns the
    T*s new output samples and the updated state.
    """
    t = x.shape[1]
    full = jnp.concatenate([state, x], axis=1)
    y = causal_conv_transpose1d(full, w, b, stride)
    y = y[:, y.shape[1] - t * stride:, :]
    ctx = state.shape[1]
    new_state = full[:, full.shape[1] - ctx:, :] if ctx > 0 else state
    return y, new_state
