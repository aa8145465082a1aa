"""Weight-only quantization for the LM (int8 and int4 tiers).

TPU-native analogue of the reference's bitsandbytes NF4 4-bit loading
(reference: main.py:97-103, 349-397), as two tiers:

  * **int8** (this module): per-output-channel symmetric, dequant fused into
    the matmul by XLA (int8 weights stay in HBM; the scale multiply folds
    into the MXU epilogue).  Halves LM weight bandwidth — the decode step is
    weight-bandwidth-bound, so this directly raises RTF.
  * **int4** (ops/int4.py): group-wise symmetric, nibble-packed, dequantized
    in-register by a Pallas kernel — the same 4-bit width as the reference's
    NF4, halving bandwidth again.

Quantized tensors are stored as {"q": int8 [in, out], "s": f32 [out]} (int8)
or {"q4", "s4"} (int4) in place of the bf16 [in, out] leaf; `qmatmul`
dispatches on leaf type.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# W8A8 mode: quantize activations per-row to int8 at each quantized matmul so
# the dot runs in the MXU's NATIVE s8 x s8 -> s32 mode.  The weight-only path
# (W8A16) converts every int8 weight element to bf16 on the VPU inside the
# dot fusion — at decode batch sizes that convert stream, not HBM, bounds the
# matmul.  Activation rows are tiny ([2B, H] per decode step), so the dynamic
# quantization itself is ~free.  Opt-in pending real-weights validation
# (per-token dynamic W8A8 is standard serving practice; outlier channels are
# the known risk).
_W8A8 = os.environ.get("VIBEVOICE_W8A8", "0") == "1"

# trace-time scope (mirrors ops/int4.impl_scope): lets ONE program opt into
# W8A8 — e.g. quantized-compute prefill — without flipping the process
# global under concurrently-tracing threads (background chunk compiles)
_W8A8_VAR: "contextvars.ContextVar" = __import__("contextvars").ContextVar(
    "vibevoice_w8a8", default=None)


def set_w8a8(enabled: bool) -> None:
    global _W8A8
    _W8A8 = bool(enabled)


def current_w8a8() -> bool:
    v = _W8A8_VAR.get()
    return _W8A8 if v is None else v


class w8a8_scope:
    """Scope W8A8 dispatch to a with-block (thread-local, trace-time)."""

    def __init__(self, enabled: bool = True):
        self.enabled = bool(enabled)
        self._tok = None

    def __enter__(self):
        self._tok = _W8A8_VAR.set(self.enabled)
        return self

    def __exit__(self, *exc):
        _W8A8_VAR.reset(self._tok)
        return False


def quantize_weight(w: jax.Array) -> Dict[str, jax.Array]:
    """Per-output-channel symmetric int8. w: [..., in, out]."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)          # [..., 1, out]
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.squeeze(-2).astype(jnp.float32)}


def dequantize_weight(qw: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    return (qw["q"].astype(jnp.float32) * qw["s"][..., None, :]).astype(dtype)


def is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, dict) and set(leaf.keys()) == {"q", "s"}


def qmatmul(x: jax.Array, w: Any, shard_ctx=None) -> jax.Array:
    """x @ w where w is dense, int8 {q, s}, or int4 {q4, s4}/{q4c, s4c}.

    ``shard_ctx=(mesh, batch_on_dp)`` routes int4-family weights through the
    per-shard Pallas matmul (ops/int4.py int4_matmul_sharded) — the meshed
    serving path; dense/int8 weights ignore it (GSPMD partitions their dots
    natively)."""
    if is_quantized(w):
        if current_w8a8():
            sx = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
            sx = jnp.maximum(sx / 127.0, 1e-12)
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                          -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(xq, w["q"], (((xq.ndim - 1,), (w["q"].ndim - 2,)),
                                                 ((), ())),
                                    preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * sx * w["s"]).astype(x.dtype)
        y = jnp.dot(x, w["q"].astype(x.dtype), preferred_element_type=jnp.float32)
        return (y * w["s"]).astype(x.dtype)
    from .int4 import (int4_matmul, int4_matmul_sharded, int4c_matmul,
                       is_quantized_int4, is_quantized_int4c)
    if is_quantized_int4(w) or is_quantized_int4c(w):
        if shard_ctx is not None:
            mesh, batch_on_dp = shard_ctx
            return int4_matmul_sharded(x, w, mesh, batch_on_dp=batch_on_dp)
        return int4_matmul(x, w) if is_quantized_int4(w) else int4c_matmul(x, w)
    return x @ w


def split_stacked_quant(layers: dict) -> tuple[dict, dict]:
    """Split a layer-stacked params dict into (xs, stacked): ``xs`` leaves
    are scanned per layer as usual; ``stacked`` holds int4-packed leaves that
    must NOT be sliced by the scan — a pallas_call operand cannot fuse a
    dynamic-slice, so scanning them materializes an HBM copy of every
    quantized weight every step (profiled ~1.3 ms/step on the 1.5B int4
    tier).  The scan body closes over ``stacked`` and indexes it inside the
    kernel via scalar prefetch (see layer_view / ops/int4.py)."""
    from .int4 import is_quantized_int4, is_quantized_int4c
    xs, stacked = {}, {}
    for k, v in layers.items():
        if is_quantized_int4(v) or is_quantized_int4c(v):
            stacked[k] = v
        else:
            xs[k] = v
    return xs, stacked


def layer_view(lp_xs: dict, stacked: dict, lyr) -> dict:
    """Rebuild layer ``lyr``'s param dict inside a scan body: xs leaves come
    pre-sliced from the scan; stacked int4 leaves are wrapped with the traced
    layer index ("_lyr") for qmatmul to route to the stacked kernels."""
    if not stacked:
        return lp_xs
    return {**lp_xs, **{k: {**v, "_lyr": lyr} for k, v in stacked.items()}}


def dequantize_any(leaf: Any, dtype=jnp.float32) -> Any:
    """Dequantize a leaf of any tier (int8 / int4 / int4c); dense passes
    through."""
    from .int4 import (dequantize_weight_int4, dequantize_weight_int4c,
                       is_quantized_int4, is_quantized_int4c)
    if is_quantized(leaf):
        return dequantize_weight(leaf, dtype)
    if is_quantized_int4(leaf):
        return dequantize_weight_int4(leaf, dtype)
    if is_quantized_int4c(leaf):
        return dequantize_weight_int4c(leaf, dtype)
    return leaf


def weight_rel_error(w: jax.Array, qleaf: Any) -> float:
    """RMS relative error of a quantized leaf vs its dense source.

    This is the accuracy gate for the auto-fallback policy: a per-layer,
    data-free proxy for logit error.  It is exactly the quantity that blows
    up on the known failure mode — outlier input channels (one hot row
    inflates every per-output-column scale, crushing the resolution of the
    ordinary weights; reference analogue: LLM.int8() outlier analysis)."""
    wf = np.asarray(w, np.float32)
    back = np.asarray(dequantize_any(qleaf, jnp.float32), np.float32)
    denom = float(np.sqrt((wf ** 2).mean())) + 1e-12
    return float(np.sqrt(((back - wf) ** 2).mean())) / denom


def quantize_any(w: jax.Array, bits: int = 8, colscale: bool = False,
                 max_rel_err: float | None = None) -> Any:
    """Quantize one weight at the requested width; int4 falls back to int8
    when the in-dimension doesn't split into whole nibble-half groups.
    ``colscale`` picks the per-output-column int4 speed tier (one scale per
    column, applied to the accumulator) over group-16 fidelity.

    ``max_rel_err`` arms the per-layer accuracy gate: after quantizing, the
    RMS relative weight error is checked against the bound and the tier
    ladder falls back (int4c -> int4 -> int8 -> dense) until a tier passes.
    ``None`` (default) keeps the unconditional historical behavior."""
    tiers = []
    if bits == 4:
        from .int4 import (quantizable_int4, quantizable_int4c,
                           quantize_weight_int4, quantize_weight_int4c)
        if colscale and quantizable_int4c(w.shape):
            tiers.append(quantize_weight_int4c)
        if quantizable_int4(w.shape) and (not colscale
                                          or max_rel_err is not None):
            tiers.append(quantize_weight_int4)
    tiers.append(quantize_weight)

    if max_rel_err is None:
        return tiers[0](w)
    for quantize in tiers:
        q = quantize(w)
        if weight_rel_error(w, q) <= max_rel_err:
            return q
    return w  # dense: no tier met the bound (outlier-dominated layer)


def weight_rel_error_per_layer(w: jax.Array, qleaf: Any) -> "np.ndarray":
    """Per-layer RMS relative error for a stacked [L, ...] weight."""
    wf = np.asarray(w, np.float32)
    back = np.asarray(dequantize_any(qleaf, jnp.float32), np.float32)
    axes = tuple(range(1, wf.ndim))
    denom = np.sqrt((wf ** 2).mean(axis=axes)) + 1e-12
    return np.sqrt(((back - wf) ** 2).mean(axis=axes)) / denom


def _quantize_stacked(w: jax.Array, bits: int, colscale: bool,
                      max_rel_err: float | None) -> Any:
    """Quantize a layer-stacked [L, in, out] weight with the per-layer gate.

    Scales are already computed per layer (the reduction axes exclude axis
    0), so the gate checks each layer's error independently; because the
    stack is consumed by a single `lax.scan` the tier must be uniform across
    layers, so the worst layer decides: the ladder falls back
    (int4c -> int4 -> int8 -> dense) until EVERY layer meets the bound."""
    if max_rel_err is None:
        return quantize_any(w, bits, colscale=colscale)

    tiers = []
    if bits == 4:
        from .int4 import (quantizable_int4, quantizable_int4c,
                           quantize_weight_int4, quantize_weight_int4c)
        if colscale and quantizable_int4c(w.shape):
            tiers.append(quantize_weight_int4c)
        if quantizable_int4(w.shape):
            tiers.append(quantize_weight_int4)
    tiers.append(quantize_weight)
    for quantize in tiers:
        q = quantize(w)
        if float(weight_rel_error_per_layer(w, q).max()) <= max_rel_err:
            return q
    return w


_LM_QUANT_KEYS = ("wq", "wk", "wv", "wo", "wg", "wu", "wd")


def quantize_lm_params(lm_params: dict, bits: int = 8,
                       colscale: bool = False,
                       max_rel_err: float | None = None) -> dict:
    """Quantize the LM projection weights (layers stacked [L, in, out]).
    The lm_head stays int8 at every tier: constrained decoding gathers ~5
    rows from it per step (qwen2.lm_head_rows), never a full matmul.

    ``max_rel_err`` arms the per-LAYER accuracy gate: each stacked weight is
    gated per layer (outliers are a per-layer phenomenon), so one bad layer
    falls back without forfeiting the tier for the other 27."""
    out = dict(lm_params)
    layers = dict(lm_params["layers"])
    for k in _LM_QUANT_KEYS:
        layers[k] = _quantize_stacked(layers[k], bits, colscale, max_rel_err)
    out["layers"] = layers
    if "lm_head" in lm_params:
        out["lm_head"] = quantize_weight(lm_params["lm_head"])
    return out


def _concat_leaves(leaves, axis=-1):
    """Concatenate quantized-or-dense stacked leaves along the OUT axis.
    Valid because every tier's scales are per-output-column (int8 {q,s},
    int4 group {q4,s4}, int4 colscale {q4c,s4c}): quantize-then-concat ==
    concat-then-quantize.  Returns None when tiers differ between leaves
    (the per-layer accuracy ladder can demote one projection but not its
    siblings) — the caller keeps them unfused."""
    if all(isinstance(l, dict) for l in leaves):
        keys = set(leaves[0].keys())
        if any(set(l.keys()) != keys for l in leaves):
            return None
        return {k: jnp.concatenate([l[k] for l in leaves], axis=axis)
                for k in keys}
    if any(isinstance(l, dict) for l in leaves):
        return None
    return jnp.concatenate(leaves, axis=axis)


def fuse_lm_projections(lm_params: dict) -> dict:
    """Serving-time projection fusion: wq|wk|wv -> wqkv and wg|wu -> wgu
    (concat on the output axis), after any quantization.

    Why: at decode the stacked-weight Pallas matmuls pay a fixed per-call
    prologue; r4 profiling measured wk/wv at ~5x their HBM floor.  One call
    for qkv and one for gate|up removes 3 of the 7 projection dispatches
    per layer (~0.2 ms/step on the 1.5B int4 tier).  Single-device only —
    the TP plan shards q and kv head groups separately, so meshed serving
    keeps the unfused layout (generate.py skips fusion when mesh is set).

    Mixed-tier layers (the accuracy ladder demoted one sibling) are left
    unfused; the model body dispatches on leaf presence either way.
    """
    layers = dict(lm_params["layers"])
    if "wq" in layers:                        # idempotent: skip when fused
        qkv = _concat_leaves([layers["wq"], layers["wk"], layers["wv"]])
        if qkv is not None:
            layers["wqkv"] = qkv
            layers["bqkv"] = jnp.concatenate(
                [layers["bq"], layers["bk"], layers["bv"]], axis=-1)
            for k in ("wq", "wk", "wv", "bq", "bk", "bv"):
                del layers[k]
    layers = fuse_gate_up(layers)
    out = dict(lm_params)
    out["layers"] = layers
    return out


def fuse_gate_up(layers: dict) -> dict:
    """wg|wu -> wgu on any stacked layer dict (LM and diffusion head share
    the SwiGLU shape); same per-output-column concat validity as
    fuse_lm_projections, same mixed-tier skip, idempotent."""
    layers = dict(layers)
    if "wg" in layers:
        gu = _concat_leaves([layers["wg"], layers["wu"]])
        if gu is not None:
            layers["wgu"] = gu
            del layers["wg"], layers["wu"]
    return layers


def _leaf_out_dim(leaf) -> int:
    if isinstance(leaf, dict):
        return next(iter(leaf.values())).shape[-1]
    return leaf.shape[-1]


def _split_out(leaf, sizes):
    """Split a (possibly quantized) stacked leaf on the OUT (last) axis —
    the exact inverse of ``_concat_leaves`` (every tier's subleaves carry
    the out dim last, so one axis=-1 split applies uniformly)."""
    import numpy as _np
    offs = _np.cumsum(sizes)[:-1].tolist()
    if isinstance(leaf, dict):
        parts = {k: jnp.split(v, offs, axis=-1) for k, v in leaf.items()}
        return [{k: parts[k][i] for k in leaf} for i in range(len(sizes))]
    return jnp.split(leaf, offs, axis=-1)


def unfuse_gate_up(layers: dict) -> dict:
    """Inverse of :func:`fuse_gate_up` (equal-width halves)."""
    layers = dict(layers)
    if "wgu" in layers:
        f = _leaf_out_dim(layers["wgu"]) // 2
        wg, wu = _split_out(layers.pop("wgu"), [f, f])
        layers["wg"], layers["wu"] = wg, wu
    return layers


def unfuse_lm_projections(lm_params: dict, q_dim: int, kv_dim: int) -> dict:
    """Inverse of :func:`fuse_lm_projections`.

    Meshed serving needs the UNFUSED layout (the TP plan shards q and kv
    head groups separately), but a caller may hand it params taken from a
    single-device generator — which fused wqkv/wgu at construction.  Split
    them back instead of crashing shard_params on the key mismatch."""
    layers = dict(lm_params["layers"])
    if "wqkv" in layers:
        wq, wk, wv = _split_out(layers.pop("wqkv"), [q_dim, kv_dim, kv_dim])
        bq, bk, bv = _split_out(layers.pop("bqkv"), [q_dim, kv_dim, kv_dim])
        layers.update(wq=wq, wk=wk, wv=wv, bq=bq, bk=bk, bv=bv)
    layers = unfuse_gate_up(layers)
    out = dict(lm_params)
    out["layers"] = layers
    return out


def fuse_diffusion_head_projections(head_params: dict) -> dict:
    """Serving transform for the diffusion head: one gate|up stacked matmul
    per layer per solver iteration instead of two (the head FFN weights are
    re-read every iteration — x-dependent — so the saved dispatch repeats
    ddpm_steps times per generated frame)."""
    out = dict(head_params)
    out["layers"] = fuse_gate_up(dict(head_params["layers"]))
    return out


_HEAD_QUANT_KEYS = ("wg", "wu", "wd", "ada")


def quantize_diffusion_head_params(head_params: dict, bits: int = 8,
                                   colscale: bool = False,
                                   max_rel_err: float | None = None) -> dict:
    """Quantize the AdaLN-MLP projections (stacked [L, in, out]).

    The diffusion scan re-reads ~226 MB of head weights per solver iteration
    (x-dependent, uncacheable in VMEM) at ~86% of HBM peak — int8 halves
    that bandwidth.  Opt-in: the head computes the denoising signal, so
    validate quality on real weights before enabling in production.
    """
    out = dict(head_params)
    layers = dict(head_params["layers"])
    for k in _HEAD_QUANT_KEYS:
        layers[k] = _quantize_stacked(layers[k], bits, colscale, max_rel_err)
    out["layers"] = layers
    return out


_TOKENIZER_FFN_KEYS = ("ffn_w1", "ffn_w2")

# int4 pays off only past this weight size: the Pallas call's fixed prologue
# (~10-15 us measured on v5e) must be smaller than the int8->int4 bandwidth
# saved (size/2 bytes at ~819 GB/s -> ~8 M params breakeven).
_INT4_MIN_PARAMS = 8_000_000


def quantize_conv_weight(w: jax.Array, out_axis: int) -> Dict[str, jax.Array]:
    """Per-output-channel symmetric int8 for a conv kernel; ``out_axis`` is
    the weight's output-channel axis (2 for conv [k, Cin/g, Cout], 1 for
    transposed conv [k, Cout, Cin]).  The conv primitives apply ``s`` to the
    conv OUTPUT (conv is linear in w), so only the int8 kernel streams from
    HBM."""
    wf = w.astype(jnp.float32)
    oa = out_axis % wf.ndim
    axes = tuple(i for i in range(wf.ndim) if i != oa)
    amax = jnp.max(jnp.abs(wf), axis=axes)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    sb = scale.reshape(tuple(-1 if i == oa else 1 for i in range(wf.ndim)))
    q = jnp.clip(jnp.round(wf / sb), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.astype(jnp.float32)}


def quantize_tokenizer_params(tok_params: dict, bits: int = 8,
                              colscale: bool = False,
                              convs: bool = False,
                              max_rel_err: float | None = None) -> dict:
    """Quantize the ConvNeXt FFN matmuls of the acoustic/semantic tokenizers
    (the FFNs hold ~95% of the ~2 GB tokenizer weights; the vocode and
    semantic re-encode stages read them every generated frame).  Depthwise
    mixer convs and norms stay dense; int4-ineligible shapes (narrow early
    stages) fall back to int8 per weight.

    ``convs=True`` additionally quantizes the strided resampling kernels
    (stem/head/down/up) to int8 — the decoder's first upsample and the
    semantic encoder's last downsample are ~67 MB bf16 EACH, read every
    frame.  Depthwise mixers and sub-128-channel kernels stay dense.

    int4 is applied ONLY to FFN weights large enough to be bandwidth-bound
    (>= ``_INT4_MIN_PARAMS``, i.e. the 2048-channel stage on the real
    configs — 89% of the FFN mass).  Small-stage FFNs take int8 even at
    bits=4: a Pallas int4 call costs ~10-15 us of fixed prologue per
    execution (profiled r4) while the bandwidth it saves on a <4 M-param
    weight is <2 us; XLA's int8 dot fuses with the surrounding
    norm/gelu/residual ops and has no such floor.  Net: the r3 int4 tier
    spent ~0.45 ms/step of pure kernel-launch overhead in the conv tail."""
    def q_conv(p: dict, transpose: bool) -> dict:
        w = p.get("w")
        if (not isinstance(p, dict) or w is None or getattr(w, "ndim", 0) != 3
                or min(w.shape[1], w.shape[2]) < 128):
            return p
        return {**p, "w": quantize_conv_weight(w, out_axis=1 if transpose else 2)}

    def rec(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in _TOKENIZER_FFN_KEYS and getattr(v, "ndim", 0) >= 2:
                    eff_bits = 4 if (bits == 4 and
                                     v.size >= _INT4_MIN_PARAMS) else 8
                    out[k] = quantize_any(v, eff_bits, colscale=colscale,
                                          max_rel_err=max_rel_err)
                elif convs and k in ("stem", "head") and isinstance(v, dict):
                    out[k] = q_conv(v, transpose=False)
                elif convs and k == "down" and isinstance(v, (list, tuple)):
                    out[k] = type(v)(q_conv(p, False) for p in v)
                elif convs and k == "up" and isinstance(v, (list, tuple)):
                    out[k] = type(v)(q_conv(p, True) for p in v)
                else:
                    out[k] = rec(v)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v) for v in node)
        return node
    return rec(tok_params)


SERVING_TIERS = ("int8", "int4", "int4g")


def quantize_serving_stack(params: dict, tier: str) -> dict:
    """Full serving-stack quantization at a named tier: LM projections,
    diffusion-head FFNs, tokenizer FFNs + strided resampling convs — the
    reference's whole-model bitsandbytes quantization analogue
    (main.py:301-416 quantizes every nn.Linear).  Shared by the
    pre-quantized Orbax store (checkpoint.save_quantized_checkpoint) and
    the app model manager so both paths serve identical weights.
    'int8' = quality default, 'int4' = per-column speed tier, 'int4g' =
    group-16 fidelity at the same width."""
    assert tier in SERVING_TIERS, tier
    bits = 8 if tier == "int8" else 4
    colscale = tier == "int4"
    q = dict(params)
    q["lm"] = quantize_lm_params(q["lm"], bits=bits, colscale=colscale)
    q["diffusion_head"] = quantize_diffusion_head_params(
        q["diffusion_head"], bits=bits, colscale=colscale)
    for k in ("acoustic", "semantic"):
        q[k] = quantize_tokenizer_params(q[k], bits=bits, colscale=colscale,
                                         convs=True)
    return q


def dequantize_lm_params(lm_params: dict, dtype=jnp.bfloat16) -> dict:
    from .int4 import (dequantize_weight_int4, dequantize_weight_int4c,
                       is_quantized_int4, is_quantized_int4c)

    def deq(leaf):
        if is_quantized(leaf):
            return dequantize_weight(leaf, dtype)
        if is_quantized_int4(leaf):
            return dequantize_weight_int4(leaf, dtype)
        if is_quantized_int4c(leaf):
            return dequantize_weight_int4c(leaf, dtype)
        return leaf

    out = dict(lm_params)
    layers = dict(lm_params["layers"])
    for k in _LM_QUANT_KEYS:
        layers[k] = deq(layers[k])
    out["layers"] = layers
    if "lm_head" in out:
        out["lm_head"] = deq(out["lm_head"])
    return out
