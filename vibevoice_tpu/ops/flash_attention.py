"""Pallas TPU flash attention (prefill path).

Replaces the reference's FlashAttention2 CUDA dependency
(reference: main.py:65-86, modeling_vibevoice.py:79) with a TPU-native
blockwise online-softmax kernel.

Design:
  * grid = (B, Hq, nQ, nK); the k-block axis is innermost, so the VMEM scratch
    (running max m, denominator l, output accumulator) persists across the k
    sweep for one q block — the canonical TPU flash pattern.
  * GQA: the k/v index map selects kv head = q_head // group_size, so K/V are
    never materialized per q-head.
  * Left-padded batches (reference processor pads prompts on the left,
    vibevoice_processor.py:333-338) are handled by a per-sample `kv_start`
    scalar prefetch: keys before kv_start are masked.
  * Causal masking is computed inline from block indices; fully-masked k blocks
    are skipped with @pl.when (compute skipped; DMA pipelining still streams
    the block — acceptable at prefill sizes, revisit with manual DMA if needed).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-2.0 ** 30)
DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _flash_kernel(kv_start_ref,  # scalar prefetch: [B] int32
                  q_ref, k_ref, v_ref, o_ref,
                  m_scr, l_scr, acc_scr,
                  *, scale: float, block_q: int, block_k: int, causal: bool):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = qi * block_q
    k_start = ki * block_k

    def _compute():
        # dots run in the STORED dtype (bf16 in production) with f32
        # accumulation: prefill is MXU-throughput-bound and f32 MXU passes
        # run at 1/4 the bf16 rate (profiled 63 ms -> ~16 ms per
        # segment-layer at 7B/30k).  f32 callers (tests) keep f32 dots.
        q = q_ref[0, 0]                              # [BQ, D]
        k = k_ref[0, 0]                              # [BK, D]
        v = v_ref[0, 0]                              # [BK, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale  # [BQ, BK]

        q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_ids = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = k_ids >= kv_start_ref[b]
        if causal:
            mask = jnp.logical_and(mask, k_ids <= q_ids)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]                            # [BQ, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                       # [BQ, BK]
        alpha = jnp.exp(m_prev - m_new)              # [BQ, 1]
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = m_new

    if causal:
        # Skip k blocks strictly above the causal diagonal for this q block.
        pl.when(k_start <= q_start + block_q - 1)(_compute)
    else:
        _compute()

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:]
        l = jnp.where(l == 0.0, 1.0, l)              # fully-masked rows -> zeros, not NaN
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    kv_start: jax.Array | None = None, causal: bool = True,
                    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool | None = None) -> jax.Array:
    """q: [B, Tq, Hq, D]; k, v: [B, Tk, Hkv, D]; kv_start: [B] first valid key.

    Tq/Tk must be multiples of the block sizes (callers bucket prompt lengths).
    Returns [B, Tq, Hq, D].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, tq, hq, d = q.shape
    tk, hkv = k.shape[1], k.shape[2]
    group = hq // hkv
    if kv_start is None:
        kv_start = jnp.zeros((b,), jnp.int32)

    def _fit(block, t):
        block = min(block, t)
        while t % block != 0:
            block //= 2
        return max(block, 8)

    block_q = _fit(block_q, tq)
    block_k = _fit(block_k, tk)
    assert tq % block_q == 0 and tk % block_k == 0, (tq, tk, block_q, block_k)
    scale = d ** -0.5

    # layout: [B, H, T, D] blocks
    qh = q.transpose(0, 2, 1, 3)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)

    grid = (b, hq, tq // block_q, tk // block_k)
    kernel = functools.partial(_flash_kernel, scale=scale, block_q=block_q,
                               block_k=block_k, causal=causal)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            # index maps receive the scalar-prefetch ref as a trailing arg
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda b_, h, qi, ki, kvs: (b_, h, qi, 0)),
                # GQA: kv head = q head // group, no repeat/materialization
                pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki, kvs: (b_, h // group, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki, kvs: (b_, h // group, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b_, h, qi, ki, kvs: (b_, h, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, tq, d), q.dtype),
        interpret=interpret,
    )(kv_start.astype(jnp.int32), qh, kh, vh)
    return out.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Chunked-prefill kernel: q segment vs the (head-major) KV cache
# ---------------------------------------------------------------------------

# r5 on-chip sweep at 40k-context segment shapes: (1024, 4096) measured
# 0.74 MFU vs 0.58 for the old (512, 2048) — bigger q blocks amortize the
# per-sweep KV re-streaming, bigger k blocks the per-block softmax state
# merges; beyond this the sweep plateaus (VPU softmax passes bind).
DEFAULT_BLOCK_K_CACHED = 4096
DEFAULT_BLOCK_Q_CACHED = 1024


def _flash_cached_kernel(lyr_ref,        # scalar prefetch: [1] int32
                         kv_start_ref,   # scalar prefetch: [B] int32
                         q_off_ref,      # scalar prefetch: [1] int32
                         q_ref, k_ref, v_ref, o_ref,
                         m_scr, l_scr, acc_scr,
                         *, scale: float, block_q: int, block_k: int,
                         chunk: int, splits: int):
    """Segment attention for chunked prefill: queries live at GLOBAL
    positions q_off + [0, chunk); keys are the KV cache buffer.  Causality
    (k <= q_global) doubles as the live-range upper bound — slots past the
    segment being written are masked.

    GQA is packed into q rows: the q-block axis spans all G = Hq/Hkv query
    heads of one kv head ([G*chunk] rows, head-contiguous), so each cache
    block streams once per KV head, not once per query head.  Dead k blocks
    (above the causal diagonal or before the left-pad start) are never
    fetched: the BlockSpec index map clamps into the live range and Pallas
    skips the DMA when consecutive grid steps map to the same block.

    Like the decode kernel, each k block is ``splits`` independent
    partial-softmax chains merged once per body, and dots run in the
    stored dtype (bf16 in production, f32 accumulation) — the serial
    per-block chain plus 1/4-rate f32 MXU passes made the original
    spelling 63 ms/segment-layer at 7B/30k."""
    del lyr_ref  # consumed by the BlockSpec index maps only
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)
    sub = block_k // splits

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # block_q divides chunk, so every q block holds ONE head's contiguous
    # positions: global position of row 0 = q_off + (block-start mod chunk)
    q_start = q_off_ref[0] + (qi * block_q) % chunk
    k_start = ki * block_k

    def _compute(need_mask):
        def go():
            q = q_ref[0, 0]
            parts = []
            for i in range(splits):
                k = k_ref[0, 0, 0, i * sub:(i + 1) * sub]
                v = v_ref[0, 0, 0, i * sub:(i + 1) * sub]
                # 1/sqrt(d) is folded into q by the wrapper — saves a
                # full VPU pass over every score element (r5: this kernel
                # is VPU-bound, ~6 passes/element; one pass is ~15%)
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if need_mask:
                    # broadcast-form mask ([bq,1] x [1,sub] compares)
                    # instead of two materialized [bq, sub] int32 iotas
                    sub_start = k_start + i * sub
                    q_col = (q_start + jax.lax.broadcasted_iota(
                        jnp.int32, (block_q, 1), 0))
                    k_row = (sub_start + jax.lax.broadcasted_iota(
                        jnp.int32, (1, sub), 1))
                    mask = jnp.logical_and(k_row >= kv_start_ref[b],
                                           k_row <= q_col)
                    s = jnp.where(mask, s, NEG_INF)
                m_i = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m_i)
                l_i = jnp.sum(e, axis=-1, keepdims=True)
                pv_i = jax.lax.dot_general(
                    e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
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
        return go

    in_range = jnp.logical_and(
        k_start <= q_start + block_q - 1,                 # causal upper bound
        k_start + block_k > kv_start_ref[b])              # left-pad lower bound
    # Most k blocks of a long prefill are INTERIOR — fully below the causal
    # diagonal and past the left pad — and need no mask at all.  The kernel
    # is VPU-softmax-bound (r5 audit), so a mask-free straight-line body for
    # that case saves real passes; the two pl.when branches each stay
    # straight-line, unlike a value-returning lax.cond in the split loop
    # (measured SLOWER — it broke Mosaic's vector scheduling).
    full = jnp.logical_and(k_start + block_k - 1 <= q_start,
                           k_start >= kv_start_ref[b])
    pl.when(jnp.logical_and(in_range, full))(_compute(False))
    pl.when(jnp.logical_and(in_range, jnp.logical_not(full)))(_compute(True))

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention_cached(q: jax.Array, cache_k: jax.Array, cache_v: jax.Array,
                           kv_start: jax.Array, q_offset: jax.Array,
                           layer: jax.Array | None = None,
                           block_q: int = DEFAULT_BLOCK_Q_CACHED,
                           block_k: int = DEFAULT_BLOCK_K_CACHED,
                           interpret: bool | None = None) -> jax.Array:
    """Chunked-prefill attention: q: [B, C, Hq, D] at global positions
    q_offset + [0, C); cache_k/v: [B, Hkv, S, D] head-major (the KV cache
    buffer, already holding this segment's keys at [q_offset, q_offset+C)),
    or layer-stacked [L, B, Hkv, S, D] with ``layer``.
    kv_start: [B] first valid key (left-pad).  q_offset: [] or [1] traced.
    Returns [B, C, Hq, D].

    HBM traffic is proportional to the causal prefix, not the cache buffer:
    per-(kv-head) clamped index maps + GQA row packing make a 40k-token
    chunked prefill stream each live cache block once per kv head."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if cache_k.ndim == 4:
        cache_k, cache_v = cache_k[None], cache_v[None]
        layer = jnp.int32(0)
    b, tq, hq, d = q.shape
    s_len, hkv = cache_k.shape[3], cache_k.shape[2]
    group = hq // hkv

    def _fit(block, t):
        block = min(block, t)
        while t % block != 0:
            block //= 2
        return max(block, 8)

    from .flash_decode import _pick_block
    block_q = _fit(block_q, tq)       # divides the chunk -> blocks never
    block_k, splits = _pick_block(s_len, block_k)  # straddle a head boundary
    scale = d ** -0.5

    # GQA packing: [B, C, Hq, D] -> [B, Hkv, G*C, D], rows head-contiguous.
    # 1/sqrt(d) folds into q here (one pass over N*D) instead of into the
    # kernel's scores (one pass over N*LIVE per segment).
    qh = ((q.astype(jnp.float32) * scale).astype(q.dtype)
          .transpose(0, 2, 1, 3).reshape(b, hkv, group * tq, d))

    q_off = jnp.atleast_1d(jnp.asarray(q_offset, jnp.int32))

    def _kv_index(b_, h, qi, ki, lyr, kvs, qo):
        # live range for THIS q block: [kv_start, q_pos_end]; dead grid steps
        # re-map to an already-fetched block (no DMA, compute skipped)
        q_end = qo[0] + (qi * block_q) % tq + block_q - 1
        lo = kvs[b_] // block_k
        hi = jnp.maximum(q_end // block_k, lo)
        return (lyr[0], b_, h, jnp.clip(ki, lo, hi), 0)

    grid = (b, hkv, (group * tq) // block_q, s_len // block_k)
    kernel = functools.partial(_flash_cached_kernel, scale=scale,
                               block_q=block_q, block_k=block_k, chunk=tq,
                               splits=splits)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda b_, h, qi, ki, lyr, kvs, qo: (b_, h, qi, 0)),
                pl.BlockSpec((1, 1, 1, block_k, d), _kv_index),
                pl.BlockSpec((1, 1, 1, block_k, d), _kv_index),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d),
                                   lambda b_, h, qi, ki, lyr, kvs, qo: (b_, h, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, group * tq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            # big q x k blocks (s + exp intermediates) exceed the default
            # 16 MB scoped-vmem stack at the MFU-optimal block sizes
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), kv_start.astype(jnp.int32),
      q_off, qh, cache_k, cache_v)
    return out.reshape(b, hq, tq, d).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# int8-cache variant of the chunked-prefill kernel (see ops/flash_decode.py
# for the cache representation): score rows dequantize per KEY after the
# q-k8 dot; the v scale folds into the probability rows before p-v8.
# ---------------------------------------------------------------------------

def _flash_cached_kernel_q8(lyr_ref, kv_start_ref, q_off_ref,
                            q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
                            m_scr, l_scr, acc_scr,
                            *, scale: float, block_q: int, block_k: int,
                            chunk: int, splits: int, a8: bool = False):
    """int8-cache variant of _flash_cached_kernel (split partial-softmax
    chains, stored-dtype dots — int8 values are exact in bf16 so the q-dtype
    dots are lossless vs the stored data; f32 MXU passes run at 1/4 rate).

    ``a8``: quantized-compute mode for the W8A8 prefill tier — q rows
    quantize to int8 once per body (per-row scale) and the probability
    rows to int8 per block (per-row scale over e*vs, e <= 1 by the running
    max), so BOTH dots run the MXU's native s8 x s8 -> s32 mode at 2x the
    bf16 rate and the int8 k/v blocks are consumed without converts.  The
    r5 TTFA audit measured the bf16 spelling at 0.74 MFU with the 40.5k
    prefill flash being 74% of device TTFA.

    Scales arrive LANE-major as [1, BK] blocks of a [L, B, Hkv, 1, S] view
    (slot-in-sublanes blocks force a 32x lane-padding blowup on the stored
    scale tensor — see ops/flash_decode.py)."""
    del lyr_ref  # consumed by the BlockSpec index maps only
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)
    sub = block_k // splits

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = q_off_ref[0] + (qi * block_q) % chunk
    k_start = ki * block_k

    def _compute():
        q = q_ref[0, 0]
        if a8:
            qf = q.astype(jnp.float32)
            sq = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
                             / 127.0, 1e-12)
            q8 = jnp.round(qf / sq).astype(jnp.int8)
        parts = []
        for i in range(splits):
            ks = ks_ref[0, 0, 0, :, i * sub:(i + 1) * sub].astype(jnp.float32)
            vs = vs_ref[0, 0, 0, :, i * sub:(i + 1) * sub].astype(jnp.float32)
            if a8:
                k8 = k_ref[0, 0, 0, i * sub:(i + 1) * sub]
                s = jax.lax.dot_general(
                    q8, k8, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                s = s * (sq * scale) * ks
            else:
                k = k_ref[0, 0, 0, i * sub:(i + 1) * sub].astype(q.dtype)
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                s = s * (ks * scale)

            q_ids = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, sub), 0)
            k_ids = (k_start + i * sub + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, sub), 1))
            mask = jnp.logical_and(k_ids >= kv_start_ref[b], k_ids <= q_ids)
            s = jnp.where(mask, s, NEG_INF)
            m_i = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m_i)
            l_i = jnp.sum(e, axis=-1, keepdims=True)
            if a8:
                ps = e * vs
                sp = jnp.maximum(jnp.max(ps, axis=-1, keepdims=True)
                                 / 127.0, 1e-12)
                p8 = jnp.round(ps / sp).astype(jnp.int8)
                v8 = v_ref[0, 0, 0, i * sub:(i + 1) * sub]
                pv_i = jax.lax.dot_general(
                    p8, v8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32) * sp
            else:
                v = v_ref[0, 0, 0, i * sub:(i + 1) * sub].astype(q.dtype)
                pv_i = jax.lax.dot_general(
                    (e * vs).astype(q.dtype), v, (((1,), (0,)), ((), ())),
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

    in_range = jnp.logical_and(
        k_start <= q_start + block_q - 1,
        k_start + block_k > kv_start_ref[b])
    pl.when(in_range)(_compute)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret", "a8"))
def flash_attention_cached_q8(q: jax.Array, k8: jax.Array, ks: jax.Array,
                              v8: jax.Array, vs: jax.Array,
                              kv_start: jax.Array, q_offset: jax.Array,
                              layer: jax.Array | None = None,
                              block_q: int = DEFAULT_BLOCK_Q_CACHED,
                              block_k: int = DEFAULT_BLOCK_K_CACHED,
                              interpret: bool | None = None,
                              a8: bool | None = None) -> jax.Array:
    """Chunked-prefill attention against an int8 cache (per-layer rank-4 or
    layer-stacked rank-5 with ``layer``).  Same GQA packing and live-range
    clamping as the bf16 kernel; KV DMA halves.

    ``a8`` runs both dots in the MXU's native s8 x s8 mode (see
    _flash_cached_kernel_q8).  Default OFF: the r5 on-chip A/B measured it
    SLOWER (8.9 vs 6.0 ms at 40k-context segments) — this kernel is
    VPU-softmax-bound, so halving MXU time buys nothing and the extra
    quantize passes cost; kept for hardware where the dots bind."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if a8 is None:
        a8 = False
    if k8.ndim == 4:
        # per-layer API: [B, Hkv, S, D] data with [B, Hkv, S] (quantize_kv)
        # or [B, Hkv, 1, S] (cache-layout) scales
        k8, v8 = k8[None], v8[None]
        if ks.ndim == 3:
            ks, vs = ks[:, :, None, :], vs[:, :, None, :]
        ks, vs = ks[None], vs[None]
        layer = jnp.int32(0)
    b, tq, hq, d = q.shape
    s_len, hkv = k8.shape[3], k8.shape[2]
    group = hq // hkv

    def _fit(block, t):
        block = min(block, t)
        while t % block != 0:
            block //= 2
        return max(block, 8)

    from .flash_decode import _pick_block
    block_q = _fit(block_q, tq)
    block_k, splits = _pick_block(s_len, block_k)
    scale = d ** -0.5
    qh = q.transpose(0, 2, 1, 3).reshape(b, hkv, group * tq, d)
    q_off = jnp.atleast_1d(jnp.asarray(q_offset, jnp.int32))

    def _kv_index(b_, h, qi, ki, lyr, kvs, qo):
        q_end = qo[0] + (qi * block_q) % tq + block_q - 1
        lo = kvs[b_] // block_k
        hi = jnp.maximum(q_end // block_k, lo)
        return (lyr[0], b_, h, jnp.clip(ki, lo, hi), 0)

    def _s_index(b_, h, qi, ki, lyr, kvs, qo):
        q_end = qo[0] + (qi * block_q) % tq + block_q - 1
        lo = kvs[b_] // block_k
        hi = jnp.maximum(q_end // block_k, lo)
        return (lyr[0], b_, h, 0, jnp.clip(ki, lo, hi))

    grid = (b, hkv, (group * tq) // block_q, s_len // block_k)
    kernel = functools.partial(_flash_cached_kernel_q8, scale=scale,
                               block_q=block_q, block_k=block_k, chunk=tq,
                               splits=splits, a8=bool(a8))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda b_, h, qi, ki, lyr, kvs, qo: (b_, h, qi, 0)),
                pl.BlockSpec((1, 1, 1, block_k, d), _kv_index),
                pl.BlockSpec((1, 1, 1, 1, block_k), _s_index),
                pl.BlockSpec((1, 1, 1, block_k, d), _kv_index),
                pl.BlockSpec((1, 1, 1, 1, block_k), _s_index),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d),
                                   lambda b_, h, qi, ki, lyr, kvs, qo: (b_, h, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, group * tq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), kv_start.astype(jnp.int32),
      q_off, qh, k8, ks, v8, vs)
    return out.reshape(b, hq, tq, d).transpose(0, 2, 1, 3)


def flash_attention_cached_any(q, cache_k, cache_v, kv_start, q_offset,
                               layer=None):
    """Dispatch on the cache representation (bf16 array vs int8 {"q","s"})."""
    if isinstance(cache_k, dict):
        return flash_attention_cached_q8(q, cache_k["q"], cache_k["s"],
                                         cache_v["q"], cache_v["s"],
                                         kv_start, q_offset, layer=layer)
    return flash_attention_cached(q, cache_k, cache_v, kv_start, q_offset,
                                  layer=layer)
