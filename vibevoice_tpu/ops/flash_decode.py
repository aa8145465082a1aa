"""Pallas TPU flash attention — decode path.

Single-query attention against the contiguous KV cache (the FlashAttention2
decode dependency of the reference, SURVEY.md §2.3 / main.py:65-86), designed
for the fused generation step:

  * Cache layout is head-major [B, Hkv, S, D]: each (sample, kv-head) owns a
    contiguous S x D plane, so KV blocks stream as dense DMAs (the token-major
    layout would stride every Hkv-th row — 50% DMA efficiency at Hkv=2).
  * grid = (B, Hkv, nK) with the k-block axis innermost; online-softmax
    scratch (m, l, acc) persists across the k sweep.
  * GQA without KV repeat: the q block for (b, h) is the G = Hq/Hkv query
    heads sharing kv head h, contracted against that single head's cache.
  * Dead blocks are never fetched: the kernel receives per-sample
    [kv_start, kv_len) bounds as scalar prefetch; the BlockSpec index map
    CLAMPS the block index into the live range, and Pallas skips the DMA when
    consecutive grid steps map to the same block.  Compute is skipped with
    @pl.when.  Net: per-step HBM traffic is proportional to the LIVE context,
    not the allocated buffer — a 64k-slot cache costs nothing until it fills,
    which removes the need for bucketed cache growth (and its recompiles).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-2.0 ** 30)
DEFAULT_BLOCK_K = 4096
_SUB_BLOCK = 512


def _pick_block(s: int, block_k: int):
    """Block size for the k sweep: large blocks amortize per-grid-step cost,
    but a block should stay a modest fraction of the buffer so the clamped
    index maps don't over-read shallow live ranges inside big caches.
    Returns (bk, splits) with bk dividing s and splits = bk / sub-block."""
    want = min(block_k, max(_SUB_BLOCK // 2, s // 8), s)
    bk = 1 << (want.bit_length() - 1) if want & (want - 1) else want
    while s % bk != 0:
        bk //= 2
    bk = max(bk, 8)
    return bk, max(1, bk // _SUB_BLOCK)


def _decode_kernel(lyr_ref, h0_ref, kv_start_ref, kv_len_ref,  # scalar prefetch
                   q_ref, k_ref, v_ref, o_ref,
                   m_scr, l_scr, acc_scr,
                   *, scale: float, block_k: int, splits: int):
    """Online-softmax k sweep.  Each grid step covers ``block_k`` cache slots
    processed as ``splits`` INDEPENDENT partial-softmax chains merged once at
    the end of the body: the strict per-block (dot -> max -> exp -> rescale)
    dependency chain, not DMA or dot throughput, was the measured bottleneck
    (2.6x device-time win at 7B/30k-deep geometry)."""
    del lyr_ref, h0_ref  # consumed by the BlockSpec index maps only
    b = pl.program_id(0)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    sub = block_k // splits

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    start_blk = kv_start_ref[b] // block_k
    end_blk = (kv_len_ref[b] - 1) // block_k

    @pl.when(jnp.logical_and(ki >= start_blk, ki <= end_blk))
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)          # [G, D]
        g = q.shape[0]
        parts = []
        for i in range(splits):
            k = k_ref[0, 0, 0, i * sub:(i + 1) * sub].astype(jnp.float32)
            v = v_ref[0, 0, 0, i * sub:(i + 1) * sub].astype(jnp.float32)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            j = (ki * block_k + i * sub
                 + jax.lax.broadcasted_iota(jnp.int32, (g, sub), 1))
            valid = jnp.logical_and(j >= kv_start_ref[b], j < kv_len_ref[b])
            s = jnp.where(valid, s, NEG_INF)
            m_i = jnp.max(s, axis=-1, keepdims=True)     # [G, 1]
            e = jnp.exp(s - m_i)
            l_i = jnp.sum(e, axis=-1, keepdims=True)
            pv_i = jax.lax.dot_general(
                e, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            parts.append((m_i, l_i, pv_i))

        m_new, l_new, acc_new = parts[0]
        for m_i, l_i, pv_i in parts[1:]:
            m2 = jnp.maximum(m_new, m_i)
            a1 = jnp.exp(m_new - m2)
            a2 = jnp.exp(m_i - m2)
            l_new = l_new * a1 + l_i * a2
            acc_new = acc_new * a1 + pv_i * a2
            m_new = m2
        m_prev = m_scr[:]                            # [G, 1]
        m2 = jnp.maximum(m_prev, m_new)
        a1 = jnp.exp(m_prev - m2)
        a2 = jnp.exp(m_new - m2)
        l_scr[:] = l_scr[:] * a1 + l_new * a2
        acc_scr[:] = acc_scr[:] * a1 + acc_new * a2
        m_scr[:] = m2

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret", "n_kv"))
def flash_decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                           kv_start: jax.Array, kv_len: jax.Array,
                           layer: jax.Array | None = None,
                           block_k: int = DEFAULT_BLOCK_K,
                           interpret: bool | None = None,
                           kv_head0: jax.Array | None = None,
                           n_kv: int | None = None) -> jax.Array:
    """q: [B, Hq, D]; k_cache/v_cache: [B, Hkv, S, D] head-major, or the
    FULL layer-stacked cache [L, B, Hkv, S, D] with ``layer`` the layer to
    attend against (the layer scan carries the stacked cache in place —
    per-layer slicing outside the kernel would either copy the slice or,
    as xs->ys scan threading, double cache memory with full-cache layout
    copies around every step).  kv_start/kv_len: [B] — valid cache range is
    kv_start <= j < kv_len.  Returns [B, Hq, D].

    ``kv_head0``/``n_kv`` (replicated-KV TP shards): attend q's heads
    against ``n_kv`` consecutive kv heads starting at cache head
    ``kv_head0`` — the caller's q rows are a contiguous slice of the full
    head set while the cache keeps every kv head (the kv_tp=False meshed
    decode, parallel/sharding.rep_kv_decode_ok)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if k_cache.ndim == 4:
        k_cache, v_cache = k_cache[None], v_cache[None]
        layer = jnp.int32(0)
    b, hq, d = q.shape
    hkv, s = k_cache.shape[2], k_cache.shape[3]
    n_kv_eff = n_kv if n_kv is not None else hkv
    group = hq // n_kv_eff
    scale = d ** -0.5
    if kv_head0 is None:
        kv_head0 = jnp.int32(0)

    bk, splits = _pick_block(s, block_k)
    nk = s // bk

    # [B, Nkv, G, D] so each grid point owns the query group of one kv head
    qg = q.reshape(b, n_kv_eff, group, d)

    def _kv_index(b_, h, ki, lyr, h0, kvs, kvl):
        start_blk = kvs[b_] // bk
        end_blk = (kvl[b_] - 1) // bk
        return (lyr[0], b_, h0[0] + h, jnp.clip(ki, start_blk, end_blk), 0)

    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, block_k=bk,
                          splits=splits),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, n_kv_eff, nk),
            in_specs=[
                pl.BlockSpec((1, 1, group, d),
                             lambda b_, h, ki, lyr, h0, kvs, kvl: (b_, h, 0, 0)),
                pl.BlockSpec((1, 1, 1, bk, d), _kv_index),
                pl.BlockSpec((1, 1, 1, bk, d), _kv_index),
            ],
            out_specs=pl.BlockSpec((1, 1, group, d),
                                   lambda b_, h, ki, lyr, h0, kvs, kvl: (b_, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((group, 1), jnp.float32),
                pltpu.VMEM((group, 1), jnp.float32),
                pltpu.VMEM((group, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_kv_eff, group, d), q.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      jnp.asarray(kv_head0, jnp.int32).reshape(1), kv_start.astype(jnp.int32),
      kv_len.astype(jnp.int32), qg, k_cache, v_cache)
    return out.reshape(b, hq, d)


def flash_decode_attention_sharded(q: jax.Array, k_cache: jax.Array,
                                   v_cache: jax.Array, kv_start: jax.Array,
                                   kv_len: jax.Array, mesh, kv_tp: bool,
                                   batch_on_dp: bool,
                                   layer: jax.Array | None = None,
                                   block_k: int = DEFAULT_BLOCK_K) -> jax.Array:
    """TP/DP-sharded wrapper: a pallas_call is opaque to GSPMD, so the kernel
    is mapped per-shard with shard_map.

    ``kv_tp=True`` (tp divides the kv-head count): cache sharded on
    (dp batch, tp kv-heads), attention fully shard-local — each tp shard
    owns the query group of its kv heads, no collectives.

    ``kv_tp=False`` (e.g. 1.5B's 2 kv heads at tp=4): the cache is
    REPLICATED across tp while q stays head-sharded (wq is
    column-parallel); each shard attends its q-head slice against the kv
    head(s) that slice belongs to via the kernel's ``kv_head0``/``n_kv``
    head-offset view.  No collectives either — before r4 this shape fell
    back to full-buffer XLA attention reads, ~2x the flash kernel's HBM
    traffic at depth.  Requires rep_kv_decode_ok(cfg, mesh)
    (parallel/sharding.py): per-shard q heads must tile whole kv-head
    groups or subdivide one group evenly.

    Either way the head-sharded output feeds the rowwise (tp)
    o-projection, exactly the Megatron dataflow.  Caches may be per-layer
    [B, Hkv, S, D] or layer-stacked [L, ...] with ``layer`` (the layer
    axis is unsharded)."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def _leaf(c):
        return c["q"] if is_quantized_kv(c) else c

    stacked = _leaf(k_cache).ndim == 5
    lead = (None,) if stacked else ()
    dp = "dp" if batch_on_dp else None
    tp_size = dict(mesh.shape).get("tp", 1)
    tp_q = "tp" if tp_size > 1 else None
    tp = "tp" if kv_tp else None
    qspec = P(dp, tp_q, None)            # [B, Hq, D] — q heads always on tp
    kvspec = P(*lead, dp, tp, None, None)
    sspec = P(dp)                        # [B]
    if layer is None:
        layer = jnp.int32(0)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    hq = q.shape[1]
    hkv = _leaf(k_cache).shape[2 if stacked else 1]
    if kv_tp or tp_size == 1:
        h0_nkv = lambda ti: (None, None)            # cache already head-local
    else:
        # replicated cache: shard ti's q heads [ti*hql, (ti+1)*hql) map to
        # kv heads starting at (ti*hql)//group (rep_kv_decode_ok guarantees
        # the range covers whole groups or stays inside one)
        hql = hq // tp_size
        group = hq // hkv
        n_kv_local = max(1, hql // group)

        def h0_nkv(ti):
            return (ti * hql) // group, n_kv_local

    if is_quantized_kv(k_cache):
        # int8 cache: {"q","s"} leaves shard on the same (dp, tp) axes —
        # per-vector scales stay local to their kv head's shard.  Scale
        # leaves have the cache layout [..., Hkv, 1, S] (rank matches q).
        sspec_scale = P(*lead, dp, tp,
                        *([None] * (k_cache["s"].ndim - len(lead) - 2)))
        cspec = {"q": kvspec, "s": sspec_scale}

        def inner(q_, k_, v_, s_, l_, lyr_):
            h0, nkv = h0_nkv(jax.lax.axis_index("tp") if tp_q else 0)
            return flash_decode_attention_q8(q_, k_["q"], k_["s"],
                                             v_["q"], v_["s"], s_, l_,
                                             layer=lyr_[0] if stacked else None,
                                             block_k=block_k,
                                             kv_head0=h0, n_kv=nkv)
    else:
        cspec = kvspec

        def inner(q_, k_, v_, s_, l_, lyr_):
            h0, nkv = h0_nkv(jax.lax.axis_index("tp") if tp_q else 0)
            return flash_decode_attention(q_, k_, v_, s_, l_,
                                          layer=lyr_[0] if stacked else None,
                                          block_k=block_k,
                                          kv_head0=h0, n_kv=nkv)

    kwargs = dict(mesh=mesh,
                  in_specs=(qspec, cspec, cspec, sspec, sspec, P(None)),
                  out_specs=qspec)
    try:
        fn = shard_map(inner, check_vma=False, **kwargs)
    except TypeError:  # older jax spells it check_rep
        fn = shard_map(inner, check_rep=False, **kwargs)
    return fn(q, k_cache, v_cache, kv_start, kv_len, layer)


# ---------------------------------------------------------------------------
# int8 KV cache variants: cache leaves are {"q": int8 [B,Hkv,S,D],
# "s": f32 [B,Hkv,S]} with one symmetric scale per stored vector.  Halves the
# per-step KV HBM traffic at depth — the long-context decode bottleneck —
# and halves cache memory (a 7B 32k dual-context cache drops 4.0 -> 2.0 GB).
# Dequantization folds into the attention math: scores scale per KEY row
# after the q·k8 dot; the v scale folds into the probability row before the
# p·v8 dot, so the MXU never sees a dequantized cache tensor.
# ---------------------------------------------------------------------------

def is_quantized_kv(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf.keys()) == {"q", "s"}


def quantize_kv(x: jax.Array):
    """Per-vector symmetric int8 over the trailing (head-dim) axis.
    x: [..., D] -> ({int8 [..., D]}, f32 scale [...])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    s = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def dequantize_kv(leaf, dtype=jnp.bfloat16) -> jax.Array:
    s = leaf["s"]
    if s.ndim == leaf["q"].ndim:        # cache layout: [..., 1, S] scales
        s = s.swapaxes(-1, -2)          # -> [..., S, 1]
    else:                               # quantize_kv layout: [..., S] scales
        s = s[..., None]
    return (leaf["q"].astype(jnp.float32) * s).astype(dtype)


def _decode_kernel_q8(lyr_ref, h0_ref, kv_start_ref, kv_len_ref,  # scalar prefetch
                      q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
                      m_scr, l_scr, acc_scr,
                      *, scale: float, block_k: int, splits: int):
    """int8-cache variant of the split-chain sweep (see _decode_kernel).

    Scales arrive LANE-major as [1, BK] blocks of a [L, B, Hkv, 1, S] view.
    The earlier [BK, 1] (slot-in-sublanes) spelling forced XLA to store the
    whole scale tensor with the size-Hkv axis in the 128-lane dimension — a
    32x padding blowup (a 7B 32k cache's 29 MB of scales ballooned to 931 MB
    of HBM and proportional DMA)."""
    del lyr_ref, h0_ref  # consumed by the BlockSpec index maps only
    b = pl.program_id(0)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    sub = block_k // splits

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    start_blk = kv_start_ref[b] // block_k
    end_blk = (kv_len_ref[b] - 1) // block_k

    @pl.when(jnp.logical_and(ki >= start_blk, ki <= end_blk))
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)          # [G, D]
        g = q.shape[0]
        parts = []
        for i in range(splits):
            k = k_ref[0, 0, 0, i * sub:(i + 1) * sub].astype(jnp.float32)
            v = v_ref[0, 0, 0, i * sub:(i + 1) * sub].astype(jnp.float32)
            ks = ks_ref[0, 0, 0, :, i * sub:(i + 1) * sub].astype(jnp.float32)
            vs = vs_ref[0, 0, 0, :, i * sub:(i + 1) * sub].astype(jnp.float32)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * (ks * scale)                     # per-key dequant
            j = (ki * block_k + i * sub
                 + jax.lax.broadcasted_iota(jnp.int32, (g, sub), 1))
            valid = jnp.logical_and(j >= kv_start_ref[b], j < kv_len_ref[b])
            s = jnp.where(valid, s, NEG_INF)
            m_i = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m_i)
            l_i = jnp.sum(e, axis=-1, keepdims=True)
            pv_i = jax.lax.dot_general(
                e * vs, v, (((1,), (0,)), ((), ())),  # fold v dequant into p
                preferred_element_type=jnp.float32)
            parts.append((m_i, l_i, pv_i))

        m_new, l_new, acc_new = parts[0]
        for m_i, l_i, pv_i in parts[1:]:
            m2 = jnp.maximum(m_new, m_i)
            a1 = jnp.exp(m_new - m2)
            a2 = jnp.exp(m_i - m2)
            l_new = l_new * a1 + l_i * a2
            acc_new = acc_new * a1 + pv_i * a2
            m_new = m2
        m_prev = m_scr[:]
        m2 = jnp.maximum(m_prev, m_new)
        a1 = jnp.exp(m_prev - m2)
        a2 = jnp.exp(m_new - m2)
        l_scr[:] = l_scr[:] * a1 + l_new * a2
        acc_scr[:] = acc_scr[:] * a1 + acc_new * a2
        m_scr[:] = m2

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret", "n_kv"))
def flash_decode_attention_q8(q: jax.Array, k8: jax.Array, ks: jax.Array,
                              v8: jax.Array, vs: jax.Array,
                              kv_start: jax.Array, kv_len: jax.Array,
                              layer: jax.Array | None = None,
                              block_k: int = DEFAULT_BLOCK_K,
                              interpret: bool | None = None,
                              kv_head0: jax.Array | None = None,
                              n_kv: int | None = None) -> jax.Array:
    """int8-cache decode attention.  q: [B, Hq, D]; k8/v8: [B, Hkv, S, D]
    int8 (or layer-stacked [L, B, Hkv, S, D] with ``layer``); ks/vs:
    [B, Hkv, S] ([L, B, Hkv, S]) per-vector scales.  Same live-range
    clamping as the bf16 kernel; KV DMA is halved.  ``kv_head0``/``n_kv``:
    replicated-KV TP sharding, see flash_decode_attention."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if k8.ndim == 4:
        # per-layer API: [B, Hkv, S, D] data with [B, Hkv, S] (quantize_kv)
        # or [B, Hkv, 1, S] (cache-layout) scales
        k8, v8 = k8[None], v8[None]
        if ks.ndim == 3:
            ks, vs = ks[:, :, None, :], vs[:, :, None, :]
        ks, vs = ks[None], vs[None]
        layer = jnp.int32(0)
    b, hq, d = q.shape
    hkv, s = k8.shape[2], k8.shape[3]
    n_kv_eff = n_kv if n_kv is not None else hkv
    group = hq // n_kv_eff
    scale = d ** -0.5
    if kv_head0 is None:
        kv_head0 = jnp.int32(0)

    bk, splits = _pick_block(s, block_k)
    nk = s // bk

    qg = q.reshape(b, n_kv_eff, group, d)

    def _kv_index(b_, h, ki, lyr, h0, kvs, kvl):
        start_blk = kvs[b_] // bk
        end_blk = (kvl[b_] - 1) // bk
        return (lyr[0], b_, h0[0] + h, jnp.clip(ki, start_blk, end_blk), 0)

    def _s_index(b_, h, ki, lyr, h0, kvs, kvl):
        start_blk = kvs[b_] // bk
        end_blk = (kvl[b_] - 1) // bk
        return (lyr[0], b_, h0[0] + h, 0, jnp.clip(ki, start_blk, end_blk))

    out = pl.pallas_call(
        functools.partial(_decode_kernel_q8, scale=scale, block_k=bk,
                          splits=splits),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, n_kv_eff, nk),
            in_specs=[
                pl.BlockSpec((1, 1, group, d),
                             lambda b_, h, ki, lyr, h0, kvs, kvl: (b_, h, 0, 0)),
                pl.BlockSpec((1, 1, 1, bk, d), _kv_index),
                pl.BlockSpec((1, 1, 1, 1, bk), _s_index),
                pl.BlockSpec((1, 1, 1, bk, d), _kv_index),
                pl.BlockSpec((1, 1, 1, 1, bk), _s_index),
            ],
            out_specs=pl.BlockSpec((1, 1, group, d),
                                   lambda b_, h, ki, lyr, h0, kvs, kvl: (b_, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((group, 1), jnp.float32),
                pltpu.VMEM((group, 1), jnp.float32),
                pltpu.VMEM((group, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_kv_eff, group, d), q.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      jnp.asarray(kv_head0, jnp.int32).reshape(1), kv_start.astype(jnp.int32),
      kv_len.astype(jnp.int32), qg, k8, ks, v8, vs)
    return out.reshape(b, hq, d)


def flash_decode_attention_any(q, k_cache, v_cache, kv_start, kv_len,
                               layer=None, block_k: int = DEFAULT_BLOCK_K):
    """Dispatch on cache representation: bf16 arrays or int8 {"q","s"}."""
    if is_quantized_kv(k_cache):
        return flash_decode_attention_q8(q, k_cache["q"], k_cache["s"],
                                         v_cache["q"], v_cache["s"],
                                         kv_start, kv_len, layer=layer,
                                         block_k=block_k)
    return flash_decode_attention(q, k_cache, v_cache, kv_start, kv_len,
                                  layer=layer, block_k=block_k)


def decode_attend_xla(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                      kv_start: jax.Array, kv_len: jax.Array,
                      layer: jax.Array | None = None) -> jax.Array:
    """XLA fallback with identical semantics on the head-major cache
    (used on CPU meshes and under GSPMD sharding, where a pallas_call
    cannot be auto-partitioned).  Reads the full buffer.  int8 caches are
    dequantized inline (the fallback is a correctness path).  ``layer``
    selects one layer of a stacked [L, ...] cache."""
    if layer is not None:
        k_cache = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, False), k_cache)
        v_cache = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, False), v_cache)
    if is_quantized_kv(k_cache):
        k_cache = dequantize_kv(k_cache, q.dtype)
        v_cache = dequantize_kv(v_cache, q.dtype)
    b, hq, d = q.shape
    hkv, s = k_cache.shape[1], k_cache.shape[2]
    qg = q.reshape(b, hkv, hq // hkv, d)
    logits = jnp.einsum("bhgd,bhkd->bhgk", qg.astype(jnp.float32),
                        k_cache.astype(jnp.float32),
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    j = jnp.arange(s)[None, :]
    valid = (j >= kv_start[:, None]) & (j < kv_len[:, None])    # [B, S]
    logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgk,bhkd->bhgd", probs.astype(v_cache.dtype), v_cache,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, hq, d).astype(q.dtype)
