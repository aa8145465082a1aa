"""Qwen2.5 decoder, TPU-native.

From-scratch functional implementation of the LM the reference obtains from
``transformers`` (reference: modeling_vibevoice.py:121 via AutoModel,
configs/qwen2.5_*.json `decoder_config`): token embeddings, RoPE(θ=1e6), GQA
(12q/2kv or 28q/4kv), RMSNorm, SwiGLU MLP, optional tied lm_head.

Idioms:
  * Parameters are *stacked across layers* (leading L axis) and the transformer
    body is a ``lax.scan`` over layers — one traced layer instead of 28,
    which keeps XLA compile times flat.
  * One forward covers prefill (T tokens, causal flash attention, cache write
    at absolute positions) and decode (T=1 against a fixed-size KV cache with
    per-sample write pointers) — the pointer indirection is what replaces the
    reference's per-sample Python cache surgery
    (modeling_vibevoice_inference.py:546-622).
  * Weights live as [in, out] so every projection is ``x @ W`` on the MXU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Qwen2DecoderConfig
from ..ops.attention import attend
from ..ops.norms import rms_norm
from ..ops.quant import (dequantize_any, is_quantized, layer_view,
                         qmatmul, split_stacked_quant)
from ..ops.rope import apply_rope, rope_cos_sin


class KVCache(NamedTuple):
    """Fixed-size per-layer KV cache: k, v of shape [L, B, Hkv, S, Dh].

    Head-major layout: each (sample, kv head) owns a contiguous S x Dh plane
    so the flash decode kernel streams dense KV blocks (ops/flash_decode.py).

    Quantized (``kv_quant``) caches store each leaf as {"q": int8
    [L, B, Hkv, S, Dh], "s": f32 [L, B, Hkv, 1, S]} — one symmetric scale
    per stored vector.  Halves KV HBM traffic and memory; dequantization
    happens inside the attention kernels (ops/flash_decode.py int8
    variants).  The scale's slot axis is LAST (lane-major, the exact view
    the kernels consume): storing it slot-major instead makes XLA convert
    the layout with a full-tensor copy per layer step (33 MB at 7B 32k).
    """
    k: jax.Array
    v: jax.Array

    @property
    def max_len(self) -> int:
        k = self.k["q"] if isinstance(self.k, dict) else self.k
        return k.shape[3]


def init_kv_cache(cfg: Qwen2DecoderConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16, quant: bool = False) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads, max_len,
             cfg.resolved_head_dim)
    if quant:
        def leaf():
            return {"q": jnp.zeros(shape, jnp.int8),
                    "s": jnp.zeros(shape[:3] + (1, max_len), jnp.float32)}
        return KVCache(k=leaf(), v=leaf())
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def _cache_write_decode(cache, vec, write_idx, lyr):
    """Write one vector per (sample, head) at the per-sample pointer into
    layer ``lyr`` of the STACKED cache [L, B, Hkv, S, Dh].
    vec: [B, Hkv, Dh]; quantized caches quantize per vector on the way in.

    Spelled as per-sample ``dynamic_update_slice`` (batch is small and
    static) rather than one batched scatter: the scatter's (head, dh)
    window made XLA prefer a heads-minor cache layout, inserting full-cache
    layout-conversion copies around every decode step (931 MB of HLO temp
    per K/V tensor at 7B 32k — the difference between fitting one chip and
    OOM).  DUS keeps the default head-major layout end to end."""
    if isinstance(cache, dict):
        from ..ops.flash_decode import quantize_kv
        q8, s = quantize_kv(vec)
        cq, cs = cache["q"], cache["s"]
        for bi in range(vec.shape[0]):
            cq = jax.lax.dynamic_update_slice(
                cq, q8[bi][None, None, :, None, :],
                (lyr, bi, 0, write_idx[bi], 0))
            cs = jax.lax.dynamic_update_slice(
                cs, s[bi][None, None, :, None, None],
                (lyr, bi, 0, 0, write_idx[bi]))
        return {"q": cq, "s": cs}
    vec = vec.astype(cache.dtype)
    for bi in range(vec.shape[0]):
        cache = jax.lax.dynamic_update_slice(
            cache, vec[bi][None, None, :, None, :],
            (lyr, bi, 0, write_idx[bi], 0))
    return cache


def _cache_write_block(cache, block_hm, offset, lyr):
    """Write a head-major block [B, Hkv, T, Dh] at slot ``offset`` of layer
    ``lyr`` in the stacked cache."""
    if isinstance(cache, dict):
        from ..ops.flash_decode import quantize_kv
        q8, s = quantize_kv(block_hm)
        return {"q": jax.lax.dynamic_update_slice(
                    cache["q"], q8[None], (lyr, 0, 0, offset, 0)),
                "s": jax.lax.dynamic_update_slice(
                    cache["s"], s[None, :, :, None, :],
                    (lyr, 0, 0, 0, offset))}
    return jax.lax.dynamic_update_slice(
        cache, block_hm.astype(cache.dtype)[None], (lyr, 0, 0, offset, 0))


def _cache_write_block_masked(cache, block_hm, offset, valid, lyr):
    """Write a head-major block [B, Hkv, T, Dh] at slot ``offset`` of layer
    ``lyr``, keeping the existing cache contents wherever ``valid`` [B, T]
    is False.  Used by the prefix-cache suffix prefill: the block's left
    padding overlaps the transplanted voice-prompt K/V, which must survive
    the write."""
    t = block_hm.shape[2]
    if isinstance(cache, dict):
        from ..ops.flash_decode import quantize_kv
        q8, s = quantize_kv(block_hm)
        oldq = jax.lax.dynamic_slice(
            cache["q"], (lyr, 0, 0, offset, 0),
            (1, q8.shape[0], q8.shape[1], t, q8.shape[3]))[0]
        olds = jax.lax.dynamic_slice(
            cache["s"], (lyr, 0, 0, 0, offset),
            (1, s.shape[0], s.shape[1], 1, t))[0, :, :, 0]
        q8 = jnp.where(valid[:, None, :, None], q8, oldq)
        s = jnp.where(valid[:, None, :], s, olds)
        return {"q": jax.lax.dynamic_update_slice(
                    cache["q"], q8[None], (lyr, 0, 0, offset, 0)),
                "s": jax.lax.dynamic_update_slice(
                    cache["s"], s[None, :, :, None, :],
                    (lyr, 0, 0, 0, offset))}
    blk = block_hm.astype(cache.dtype)
    old = jax.lax.dynamic_slice(
        cache, (lyr, 0, 0, offset, 0),
        (1, blk.shape[0], blk.shape[1], t, blk.shape[3]))[0]
    blk = jnp.where(valid[:, None, :, None], blk, old)
    return jax.lax.dynamic_update_slice(cache, blk[None], (lyr, 0, 0, offset, 0))


def init_params(rng: jax.Array, cfg: Qwen2DecoderConfig, dtype=jnp.bfloat16) -> dict:
    """Random init (normal(0, initializer_range), zero biases) matching the
    reference init contract (modeling_vibevoice.py:85-104)."""
    h, i = cfg.hidden_size, cfg.intermediate_size
    dh = cfg.resolved_head_dim
    hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    L = cfg.num_hidden_layers
    std = cfg.initializer_range

    keys = jax.random.split(rng, 10)
    n = lambda k, shape: (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)
    params = {
        "embed": n(keys[0], (cfg.vocab_size, h)),
        "layers": {
            "ln1": jnp.ones((L, h), dtype),
            "wq": n(keys[1], (L, h, hq * dh)),
            "bq": jnp.zeros((L, hq * dh), dtype),
            "wk": n(keys[2], (L, h, hkv * dh)),
            "bk": jnp.zeros((L, hkv * dh), dtype),
            "wv": n(keys[3], (L, h, hkv * dh)),
            "bv": jnp.zeros((L, hkv * dh), dtype),
            "wo": n(keys[4], (L, hq * dh, h)),
            "ln2": jnp.ones((L, h), dtype),
            "wg": n(keys[5], (L, h, i)),
            "wu": n(keys[6], (L, h, i)),
            "wd": n(keys[7], (L, i, h)),
        },
        "norm": jnp.ones((h,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = n(keys[8], (h, cfg.vocab_size))
    return params


def embed_tokens(params: dict, ids: jax.Array) -> jax.Array:
    emb = params["embed"]
    if is_quantized(emb):
        # int8 embedding table (capacity tier: frees ~1 GB on 7B so the 32k
        # KV cache fits one chip); gather rows then apply per-column scales
        return (emb["q"][ids].astype(jnp.float32) * emb["s"]).astype(jnp.bfloat16)
    return emb[ids]


def lm_head_rows(params: dict, ids) -> jax.Array:
    """[n, H] lm-head rows for the given token ids — the constrained-decode
    slice.  Gathers rows instead of slicing columns of the [H, V] weight so
    the tied-embedding case never materializes a transpose of the 152k-row
    embedding inside the decode step."""
    if "lm_head" in params:
        w = params["lm_head"]
        if is_quantized(w):
            return (w["q"][:, ids].astype(jnp.float32) * w["s"][ids]).T
        if isinstance(w, dict):
            # int4/int4c leaf: [H, V] packs along H — gather the handful of
            # token COLUMNS first, dequantize only those
            cols = {k: v[:, ids] for k, v in w.items()}
            return dequantize_any(cols, jnp.float32).T
        return w[:, ids].T
    emb = params["embed"]
    if is_quantized(emb):
        from ..ops.quant import dequantize_weight
        return dequantize_weight({"q": emb["q"][ids], "s": emb["s"]}, jnp.float32)
    return emb[ids]


def lm_head_weight(params: dict) -> jax.Array:
    """[H, V] projection; tied models reuse the embedding."""
    if "lm_head" in params:
        w = params["lm_head"]
        if isinstance(w, dict):
            dtype = (params["embed"].dtype
                     if not is_quantized(params["embed"]) else jnp.bfloat16)
            return dequantize_any(w, dtype)
        return w
    return params["embed"].T


def _proj_qkv(y, lp, b, t, cfg: Qwen2DecoderConfig, qctx=None):
    """q/k/v projections -> ([B,T,Hq,Dh], [B,T,Hkv,Dh], [B,T,Hkv,Dh]).
    Dispatches on the fused ``wqkv`` leaf when present (serving transform
    ops/quant.fuse_lm_projections — one stacked matmul instead of three);
    splitting the fused output equals the separate matmuls exactly because
    every quant tier's scales are per output column."""
    dh = cfg.resolved_head_dim
    hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    if "wqkv" in lp:
        qkv = qmatmul(y, lp["wqkv"], qctx) + lp["bqkv"]
        q, k, v = jnp.split(qkv, [hq * dh, (hq + hkv) * dh], axis=-1)
    else:
        q = qmatmul(y, lp["wq"], qctx) + lp["bq"]
        k = qmatmul(y, lp["wk"], qctx) + lp["bk"]
        v = qmatmul(y, lp["wv"], qctx) + lp["bv"]
    return (q.reshape(b, t, hq, dh), k.reshape(b, t, hkv, dh),
            v.reshape(b, t, hkv, dh))


def _mlp(y, lp, qctx=None):
    """SwiGLU MLP output; fused gate|up leaf (``wgu``) when present."""
    if "wgu" in lp:
        g, u = jnp.split(qmatmul(y, lp["wgu"], qctx), 2, axis=-1)
    else:
        g = qmatmul(y, lp["wg"], qctx)
        u = qmatmul(y, lp["wu"], qctx)
    return qmatmul(jax.nn.silu(g) * u, lp["wd"], qctx)


def _layer(x, lp, lyr, cfg: Qwen2DecoderConfig, cos, sin, cache_k, cache_v,
           write_idx, attn_mask, decode: bool, flash_kv_start=None,
           kv_start=None, kv_len=None, decode_impl: str = "xla",
           shard_ctx=None):
    """One transformer layer.  x: [B, T, H].  cache_k/v are the FULL
    layer-stacked caches [L, B, Hkv, S, Dh]; ``lyr`` is this layer's index.
    The stacked cache rides the layer scan's CARRY and is updated in place
    (DUS) — threading per-layer slices through scan xs->ys instead would
    force XLA to keep two full cache buffers plus layout-conversion copies
    around every decode step."""
    b, t, h = x.shape
    dh = cfg.resolved_head_dim
    hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads

    # meshed decode: int4-family matmuls go through the per-shard Pallas
    # wrapper (weights column-parallel, see parallel/sharding.py
    # _colwise_spec4); dense/int8 dots stay GSPMD-partitioned
    qctx = None
    if decode and decode_impl == "pallas_shmap" and shard_ctx is not None:
        qctx = (shard_ctx[0], shard_ctx[2])           # (mesh, batch_on_dp)

    resid = x
    y = rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
    q, k, v = _proj_qkv(y, lp, b, t, cfg, qctx)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if decode:
        # write the new token at the per-sample pointer, then attend over the
        # [kv_start, kv_len) live range of the head-major cache
        cache_k = _cache_write_decode(cache_k, k[:, 0], write_idx, lyr)
        cache_v = _cache_write_decode(cache_v, v[:, 0], write_idx, lyr)
        if decode_impl == "pallas_shmap":
            from ..ops.flash_decode import flash_decode_attention_sharded
            mesh, kv_tp, batch_on_dp = shard_ctx
            attn = flash_decode_attention_sharded(
                q[:, 0], cache_k, cache_v, kv_start, kv_len,
                mesh, kv_tp, batch_on_dp, layer=lyr)[:, None]
        elif decode_impl == "pallas":
            from ..ops.flash_decode import flash_decode_attention_any
            attn = flash_decode_attention_any(q[:, 0], cache_k, cache_v,
                                              kv_start, kv_len,
                                              layer=lyr)[:, None]
        else:
            from ..ops.flash_decode import decode_attend_xla
            attn = decode_attend_xla(q[:, 0], cache_k, cache_v,
                                     kv_start, kv_len, layer=lyr)[:, None]
    else:
        # prefill: write the whole block at offset 0 (head-major transpose)
        cache_k = _cache_write_block(cache_k, k.transpose(0, 2, 1, 3), 0, lyr)
        cache_v = _cache_write_block(cache_v, v.transpose(0, 2, 1, 3), 0, lyr)
        if flash_kv_start is not None:
            from ..ops.flash_attention import flash_attention
            attn = flash_attention(q, k, v, flash_kv_start, causal=True)
        else:
            attn = attend(q, k, v, mask=attn_mask)

    # fused o-proj + MLP kernel: one pallas call replaces the three decode
    # matmul dispatches plus the norm/silu/residual soup between them (the
    # per-call launch + unhidden-prologue tax dominates at decode sizes —
    # see ops/fused_mlp.py)
    if decode and t == 1 and qctx is None and hq * dh == h:
        from ..ops.fused_mlp import fused_omlp_eligible, fused_omlp_stacked
        from ..ops.int4 import current_impl
        if fused_omlp_eligible(lp, b, h):
            impl = current_impl()
            x = fused_omlp_stacked(
                attn.reshape(b, h), resid[:, 0], lp["ln2"], lp["wo"],
                lp["wgu"], lp["wd"], lp["wo"]["_lyr"],
                eps=cfg.rms_norm_eps,
                interpret=(impl == "interpret"
                           or jax.default_backend() != "tpu"))[:, None]
            return x, cache_k, cache_v

    x = resid + qmatmul(attn.reshape(b, t, hq * dh), lp["wo"], qctx)
    resid = x
    y = rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
    x = resid + _mlp(y, lp, qctx)
    return x, cache_k, cache_v


def forward(params: dict, cfg: Qwen2DecoderConfig, x: jax.Array,
            positions: jax.Array, cache: Optional[KVCache],
            attn_mask: Optional[jax.Array], write_idx: Optional[jax.Array] = None,
            decode: bool = False,
            flash_kv_start: Optional[jax.Array] = None,
            kv_start: Optional[jax.Array] = None,
            kv_len: Optional[jax.Array] = None,
            decode_impl: str = "xla",
            shard_ctx=None) -> Tuple[jax.Array, Optional[KVCache]]:
    """Transformer body.

    x: [B, T, H] embeddings; positions: [B, T] int for RoPE;
    attn_mask: prefill -> [B, T, T] bool; decode uses kv_start/kv_len [B]
    (valid cache range) instead of a mask.
    write_idx: [B] cache slot for the new token (decode only).
    decode_impl: 'pallas' (flash decode kernel) | 'xla' (full-buffer read).
    Returns (hidden [B, T, H], updated cache).
    """
    dh = cfg.resolved_head_dim
    cos, sin = rope_cos_sin(positions, dh, cfg.rope_theta)

    xs_layers, stacked = split_stacked_quant(params["layers"])

    if cache is None:
        # no-cache path (training forward)
        def body_nocache(xc, layer_in):
            lp_xs, lyr = layer_in
            lp = layer_view(lp_xs, stacked, lyr)
            b, t, _ = xc.shape
            resid = xc
            y = rms_norm(xc, lp["ln1"], cfg.rms_norm_eps)
            q, k, v = _proj_qkv(y, lp, b, t, cfg)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            attn = attend(q, k, v, mask=attn_mask)
            xc = resid + qmatmul(attn.reshape(b, t, -1), lp["wo"])
            resid = xc
            y = rms_norm(xc, lp["ln2"], cfg.rms_norm_eps)
            xc = resid + _mlp(y, lp)
            return xc, None

        x, _ = jax.lax.scan(
            body_nocache, x,
            (xs_layers, jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32)))
        return rms_norm(x, params["norm"], cfg.rms_norm_eps), None

    n_layers = cfg.num_hidden_layers

    def body(carry, layer_in):
        xc, ck, cv = carry
        lp_xs, lyr = layer_in
        lp = layer_view(lp_xs, stacked, lyr)
        y, ck, cv = _layer(xc, lp, lyr, cfg, cos, sin, ck, cv, write_idx,
                           attn_mask, decode, flash_kv_start=flash_kv_start,
                           kv_start=kv_start, kv_len=kv_len,
                           decode_impl=decode_impl, shard_ctx=shard_ctx)
        return (y, ck, cv), None

    (x, new_k, new_v), _ = jax.lax.scan(
        body, (x, cache.k, cache.v),
        (xs_layers, jnp.arange(n_layers, dtype=jnp.int32)))
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x, KVCache(k=new_k, v=new_v)


def prefill(params: dict, cfg: Qwen2DecoderConfig, embeds: jax.Array,
            valid_mask: jax.Array, cache: KVCache,
            impl: str = "auto") -> Tuple[jax.Array, KVCache]:
    """Prefill with a left-padded batch.

    embeds: [B, T, H]; valid_mask: [B, T] bool (True = real token).
    Positions count valid tokens from 0 (HF convention: mask.cumsum - 1).
    impl: 'auto' (Pallas flash on TPU, XLA elsewhere) | 'pallas' | 'xla' —
    the backend-selection switch, parity with the reference's
    flash-attn/SDPA chain (main.py:79-86).
    """
    b, t, _ = embeds.shape
    positions = jnp.clip(jnp.cumsum(valid_mask, axis=-1) - 1, 0)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        kv_start = (t - jnp.sum(valid_mask, axis=-1)).astype(jnp.int32)
        return forward(params, cfg, embeds, positions, cache, None,
                       decode=False, flash_kv_start=kv_start)
    causal = jnp.arange(t)[None, :, None] >= jnp.arange(t)[None, None, :]
    mask = causal & valid_mask[:, None, :]
    return forward(params, cfg, embeds, positions, cache, mask, decode=False)


def prefill_chunked(params: dict, cfg: Qwen2DecoderConfig, embeds: jax.Array,
                    valid_mask: jax.Array, cache: KVCache,
                    chunk: int) -> Tuple[jax.Array, KVCache]:
    """Prefill in fixed-size segments: bounds activation memory at [B, chunk]
    (a 30k-token 7B prompt would otherwise OOM a 16 GB chip on its FFN
    intermediates) and keeps one compiled program regardless of segment
    count.  Each segment writes its K/V into the cache at its offset, then
    attends over the whole cache buffer through the causal-masked
    chunked-prefill kernel (masked slots cost DMA only).

    embeds: [B, T, H] with T % chunk == 0; returns (last-position hidden
    [B, H], cache) — segment boundaries are invisible in the result.
    """
    from ..ops.flash_attention import flash_attention_cached_any

    b, t, hdim = embeds.shape
    assert t % chunk == 0, (t, chunk)
    n_seg = t // chunk
    dh = cfg.resolved_head_dim
    hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    positions = jnp.clip(jnp.cumsum(valid_mask, axis=-1) - 1, 0)
    kv_start = (t - jnp.sum(valid_mask, axis=-1)).astype(jnp.int32)

    n_layers = cfg.num_hidden_layers
    xs_layers, stacked = split_stacked_quant(params["layers"])

    def run_segment(i, carry):
        ck_all, cv_all, _ = carry
        off = i * chunk
        x = jax.lax.dynamic_slice_in_dim(embeds, off, chunk, axis=1)
        pos = jax.lax.dynamic_slice_in_dim(positions, off, chunk, axis=1)
        cos, sin = rope_cos_sin(pos, dh, cfg.rope_theta)

        def body(carry_in, layer_in):
            xc, ck, cv = carry_in
            lp_xs, lyr = layer_in
            lp = layer_view(lp_xs, stacked, lyr)
            resid = xc
            y = rms_norm(xc, lp["ln1"], cfg.rms_norm_eps)
            q, k, v = _proj_qkv(y, lp, b, chunk, cfg)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            ck = _cache_write_block(ck, k.transpose(0, 2, 1, 3), off, lyr)
            cv = _cache_write_block(cv, v.transpose(0, 2, 1, 3), off, lyr)
            attn = flash_attention_cached_any(q, ck, cv, kv_start, off,
                                              layer=lyr)
            xc = resid + qmatmul(attn.reshape(b, chunk, hq * dh), lp["wo"])
            resid = xc
            y = rms_norm(xc, lp["ln2"], cfg.rms_norm_eps)
            xc = resid + _mlp(y, lp)
            return (xc, ck, cv), None

        (x, nk, nv), _ = jax.lax.scan(
            body, (x, ck_all, cv_all),
            (xs_layers, jnp.arange(n_layers, dtype=jnp.int32)))
        return nk, nv, x[:, -1, :]

    last0 = jnp.zeros((b, hdim), embeds.dtype)
    nk, nv, last = jax.lax.fori_loop(0, n_seg, run_segment,
                                     (cache.k, cache.v, last0))
    last = rms_norm(last[:, None, :], params["norm"], cfg.rms_norm_eps)[:, 0]
    return last, KVCache(k=nk, v=nv)


def prefill_suffix(params: dict, cfg: Qwen2DecoderConfig, embeds: jax.Array,
                   valid_mask: jax.Array, pos0: jax.Array, cache: KVCache,
                   block_off: int, kv_start: jax.Array
                   ) -> Tuple[jax.Array, KVCache]:
    """Prefill a suffix block against a cache that already holds a prefix.

    The prefix-cache path (generation/prefix_cache.py): the voice-prompt
    K/V have been transplanted into ``cache`` at per-row ``kv_start``; this
    runs the remaining prompt tokens (script + " Speech output:" tail, plus
    the CFG-negative row's full short prompt) as one block that occupies
    cache slots [block_off, block_off + S).

    embeds: [B, S, H] suffix embeddings, real tokens RIGHT-aligned in the
    block; valid_mask: [B, S] (True = real); pos0: [B] RoPE position base
    per row (= number of prefix tokens already in the cache for that row);
    kv_start: [B] first live cache slot per row.  Causal masking is by
    absolute cache slot, which matches position order because each row's
    prefix slots precede its suffix slots.  Invalid block slots are never
    written (masked write), so left padding cannot clobber the transplanted
    prefix.  Returns (last-position hidden [B, H], cache).
    """
    from ..ops.flash_attention import flash_attention_cached_any

    b, s, hdim = embeds.shape
    dh = cfg.resolved_head_dim
    hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    positions = pos0[:, None] + jnp.clip(
        jnp.cumsum(valid_mask, axis=-1) - 1, 0)
    cos, sin = rope_cos_sin(positions, dh, cfg.rope_theta)
    q_off = jnp.int32(block_off)

    xs_layers, stacked = split_stacked_quant(params["layers"])

    def body(carry, layer_in):
        xc, ck, cv = carry
        lp_xs, lyr = layer_in
        lp = layer_view(lp_xs, stacked, lyr)
        resid = xc
        y = rms_norm(xc, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = _proj_qkv(y, lp, b, s, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        ck = _cache_write_block_masked(ck, k.transpose(0, 2, 1, 3),
                                       block_off, valid_mask, lyr)
        cv = _cache_write_block_masked(cv, v.transpose(0, 2, 1, 3),
                                       block_off, valid_mask, lyr)
        attn = flash_attention_cached_any(q, ck, cv, kv_start, q_off,
                                          layer=lyr)
        xc = resid + qmatmul(attn.reshape(b, s, hq * dh), lp["wo"])
        resid = xc
        y = rms_norm(xc, lp["ln2"], cfg.rms_norm_eps)
        xc = resid + _mlp(y, lp)
        return (xc, ck, cv), None

    (x, nk, nv), _ = jax.lax.scan(
        body, (embeds, cache.k, cache.v),
        (xs_layers, jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32)))
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x[:, -1, :], KVCache(k=nk, v=nv)


def decode_step(params: dict, cfg: Qwen2DecoderConfig, embeds: jax.Array,
                positions: jax.Array, write_idx: jax.Array, kv_start: jax.Array,
                kv_len: jax.Array, cache: KVCache,
                impl: str = "auto", shard_ctx=None) -> Tuple[jax.Array, KVCache]:
    """One decode step.

    embeds: [B, 1, H]; positions/write_idx/kv_start/kv_len: [B].
    Valid cache entries for attention: kv_start <= j < kv_len (the new token's
    slot must be inside that range).
    impl: 'auto' (Pallas flash decode on TPU, XLA elsewhere) | 'pallas' |
    'pallas_shmap' (sharded kernel via shard_map; requires shard_ctx =
    (mesh, kv_tp, batch_on_dp)) | 'xla'.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    return forward(params, cfg, embeds, positions[:, None], cache,
                   None, write_idx=write_idx, decode=True,
                   kv_start=kv_start, kv_len=kv_len, decode_impl=impl,
                   shard_ctx=shard_ctx)
