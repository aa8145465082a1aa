"""Fused o-proj + SwiGLU-MLP decode kernel (int4c serving tier).

One pallas_call executes the second half of a transformer decode layer —
o-projection, residual add, RMSNorm, gate|up matmul, SiLU, down matmul,
residual add — against layer-stacked int4c weights addressed by scalar
prefetch (reference for the layer math: Qwen2DecoderLayer;
models/qwen2.py:310-313 is the unfused composition this replaces).

Why: r5 profiling of the 1.5B int4 tier measured every per-matmul Pallas
call paying a fixed tax that single-call pipelining cannot hide — a ~2 us
launch plus one UNHIDDEN first-block fetch (the Mosaic grid pipeline has
nothing to overlap the prologue fetch with).  Per-call achieved bandwidth
tracked exactly 1 - 1/n_blocks of peak: the 10-block gate|up call ran at
~680 GB/s, the 5-block down call ~620, and the single-block o call only
~360.  Fusing the three matmuls into one 16-phase grid pays the launch
once and hides every fetch after the first behind the previous phase's
compute, and deletes the XLA norm/silu/residual soup between the calls
(~6 us/layer) by folding it into the phases.

Phase layout (grid = (n_o + n_gu + n_d,)):
  [0, n_o)            o-proj output blocks; last one assembles
                      res2 = resid + attn @ Wo and y = RMSNorm(res2) * w
  [n_o, n_o + n_gu)   paired gate/up output blocks (two operand views of
                      the fused ``wgu`` stack, gate at column block j, up
                      at n_gu + j); act_j = silu(g_j) * u_j
  [n_o+n_gu, end)     down-proj K blocks, int32-free W4A16 algebra
                      accumulating into f32 scratch; flush adds res2

The down matmul's split-half int4c packing means K-block i consumes act
blocks i (lo nibbles) and n_d + i (hi nibbles) — both are ready once the
gate/up phases finish because bo (the gate/up block width) equals the
down K-block row count, so activation scratch blocks line up one-to-one
with down K blocks.  All dynamic indexing is on leading (untiled)
scratch dims, per the Mosaic rule (see ops/convnext_stage.py).

Weight blocks are clip-indexed (monotonic within the grid): every phase
maps each operand to the block it needs next, so each fetch issues one
phase ahead and lands exactly when used.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-block budget (bytes of packed weight per phase): matches the ~1.5 MB
# sweet spot measured for the standalone stacked kernels (ops/int4._plan_c)
_BLOCK_BUDGET = 1536 * 1024
_CANDS = (2048, 1792, 1536, 1280, 1024, 896, 768, 640, 512, 384, 256, 128)

_FUSE_DEFAULT = os.environ.get("VIBEVOICE_FUSE_OMLP", "1") == "1"


def set_fuse_omlp(enabled: bool) -> None:
    global _FUSE_DEFAULT
    _FUSE_DEFAULT = bool(enabled)


def fuse_omlp_enabled() -> bool:
    return _FUSE_DEFAULT


@functools.lru_cache(maxsize=64)
def _plan(h: int, f: int) -> Optional[Tuple[int, int, int, int]]:
    """(n_o, bo_o, n_gu, bo) or None if the shapes don't block cleanly.

    bo must divide F/2 so the down K blocks pair one-to-one with gate/up
    activation blocks; bo_o divides H.  H must be even and lane-aligned.
    """
    if h % 256 or f % 2:
        return None
    half_h = h // 2
    bo_o = next((c for c in _CANDS
                 if h % c == 0 and half_h * c <= 2 * _BLOCK_BUDGET), 0)
    bo = next((c for c in _CANDS
               if (f // 2) % c == 0 and half_h * c <= _BLOCK_BUDGET
               and c * h <= 2 * _BLOCK_BUDGET), 0)
    if not (bo_o and bo):
        return None
    return (h // bo_o, bo_o, f // bo, bo)


def _mm4_full(x_lo, x_hi, pq, s):
    """Full-K W4A16 int4c matmul on VMEM-resident operands: bf16 dots
    against the packed byte and its low nibble, recombined algebraically
    (same math as ops/int4._int4c_kernel).  x_*: bf16 [B, K/2],
    pq: int8 [K/2, BO], s: f32-able [1, BO] -> f32 [B, BO]."""
    m = x_lo.shape[0]
    u = jnp.bitwise_and(pq, jnp.int8(15))
    x2 = jnp.concatenate([x_lo, x_hi], axis=0)
    acc_p = jax.lax.dot_general(
        x_hi, pq.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_u = jax.lax.dot_general(
        x2, u.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    hi = (acc_p - acc_u[m:]) * 0.0625
    lo = acc_u[:m] - 8.0 * jnp.sum(x_lo.astype(jnp.float32), axis=1,
                                   keepdims=True)
    return (hi + lo) * s.astype(jnp.float32)


def _omlp_kernel(lyr_ref, x_ref, r_ref, nw_ref, woq_ref, wos_ref,
                 gq_ref, gs_ref, uq_ref, us_ref, wdq_ref, wds_ref, o_ref,
                 o_scr, res2_scr, y_scr, act_scr, accp_scr, accu_scr,
                 xsum_scr, *, eps: float, n_o: int, n_gu: int, n_d: int,
                 half_h: int):
    del lyr_ref
    p = pl.program_id(0)
    b = x_ref.shape[0]

    @pl.when(p < n_o)
    def _o_phase():
        x = x_ref[...]
        o_scr[p] = _mm4_full(x[:, :half_h], x[:, half_h:],
                             woq_ref[0], wos_ref[0]).astype(o_scr.dtype)

        @pl.when(p == n_o - 1)
        def _assemble():
            if n_o == 1:
                o_full = o_scr[0]
            else:
                o_full = jnp.concatenate([o_scr[t] for t in range(n_o)],
                                         axis=-1)
            # match the unfused dtype rounds: f32 matmul -> bf16 cast ->
            # bf16 residual add; norm does f32 internals, bf16 weight mul
            res2 = r_ref[...] + o_full.astype(r_ref.dtype)
            res2_scr[...] = res2.astype(jnp.float32)
            xf = res2.astype(jnp.float32)
            normed = xf * jax.lax.rsqrt(
                jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
            y = normed.astype(r_ref.dtype) * nw_ref[0][None, :]
            y_scr[...] = y.astype(jnp.float32)

    @pl.when(jnp.logical_and(p >= n_o, p < n_o + n_gu))
    def _gu_phase():
        j = p - n_o
        y = y_scr[...].astype(jnp.bfloat16)
        y_lo, y_hi = y[:, :half_h], y[:, half_h:]
        g = _mm4_full(y_lo, y_hi, gq_ref[0], gs_ref[0]).astype(jnp.bfloat16)
        u = _mm4_full(y_lo, y_hi, uq_ref[0], us_ref[0]).astype(jnp.bfloat16)
        act = jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
        act_scr[j] = act.astype(jnp.bfloat16).astype(act_scr.dtype)

    @pl.when(p >= n_o + n_gu)
    def _wd_phase():
        i = p - n_o - n_gu

        @pl.when(i == 0)
        def _init():
            accp_scr[...] = jnp.zeros_like(accp_scr)
            accu_scr[...] = jnp.zeros_like(accu_scr)
            xsum_scr[...] = jnp.zeros_like(xsum_scr)

        a_lo = act_scr[i].astype(jnp.bfloat16)
        a_hi = act_scr[n_d + i].astype(jnp.bfloat16)
        pq = wdq_ref[0]
        u = jnp.bitwise_and(pq, jnp.int8(15))
        a2 = jnp.concatenate([a_lo, a_hi], axis=0)
        accp_scr[...] += jax.lax.dot_general(
            a_hi, pq.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        accu_scr[...] += jax.lax.dot_general(
            a2, u.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xsum_scr[...] += jnp.sum(a_lo.astype(jnp.float32), axis=1,
                                 keepdims=True)

        @pl.when(i == n_d - 1)
        def _flush():
            hi = (accp_scr[...] - accu_scr[b:]) * 0.0625
            lo = accu_scr[:b] - 8.0 * xsum_scr[...]
            mlp = (hi + lo) * wds_ref[0].astype(jnp.float32)
            out = (res2_scr[...].astype(o_ref.dtype)
                   + mlp.astype(o_ref.dtype))
            o_ref[...] = out


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_omlp_stacked(attn_out: jax.Array, resid: jax.Array,
                       norm_w: jax.Array, wo: dict, wgu: dict, wd: dict,
                       lyr: jax.Array, eps: float = 1e-6,
                       interpret: bool = False) -> jax.Array:
    """attn_out, resid: [B, H] (bf16 at serving); norm_w: [H] (this
    layer's ln2 weight — scan-sliced, not stacked);
    wo: {q4c [L, H/2, H], s4c [L, 1, H]}; wgu: {q4c [L, H/2, 2F], ...};
    wd: {q4c [L, F/2, H], ...}; lyr: scalar layer index.
    Returns the layer output [B, H] in attn_out's dtype."""
    b, h = attn_out.shape
    f2 = wd["q4c"].shape[-2]                       # F/2
    f = 2 * f2
    plan = _plan(h, f)
    assert plan is not None, (h, f)
    n_o, bo_o, n_gu, bo = plan
    n_d = f2 // bo
    half_h = h // 2
    grid = (n_o + n_gu + n_d,)

    def clip(v, lo_, hi_):
        return jnp.clip(v, lo_, hi_)

    kernel = functools.partial(
        _omlp_kernel, eps=eps, n_o=n_o, n_gu=n_gu, n_d=n_d, half_h=half_h)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b, h), lambda p, lref: (0, 0)),       # attn
                pl.BlockSpec((b, h), lambda p, lref: (0, 0)),       # resid
                pl.BlockSpec((1, h), lambda p, lref: (0, 0)),       # ln2 w
                pl.BlockSpec((1, half_h, bo_o),                      # wo q
                             lambda p, lref: (lref[0], 0,
                                              clip(p, 0, n_o - 1))),
                pl.BlockSpec((1, 1, bo_o),                           # wo s
                             lambda p, lref: (lref[0], 0,
                                              clip(p, 0, n_o - 1))),
                pl.BlockSpec((1, half_h, bo),                        # gate q
                             lambda p, lref: (lref[0], 0,
                                              clip(p - n_o, 0, n_gu - 1))),
                pl.BlockSpec((1, 1, bo),                             # gate s
                             lambda p, lref: (lref[0], 0,
                                              clip(p - n_o, 0, n_gu - 1))),
                pl.BlockSpec((1, half_h, bo),                        # up q
                             lambda p, lref: (lref[0], 0,
                                              n_gu + clip(p - n_o, 0,
                                                          n_gu - 1))),
                pl.BlockSpec((1, 1, bo),                             # up s
                             lambda p, lref: (lref[0], 0,
                                              n_gu + clip(p - n_o, 0,
                                                          n_gu - 1))),
                pl.BlockSpec((1, bo, h),                             # wd q
                             lambda p, lref: (lref[0],
                                              clip(p - n_o - n_gu, 0,
                                                   n_d - 1), 0)),
                pl.BlockSpec((1, 1, h), lambda p, lref: (lref[0], 0, 0)),
            ],
            out_specs=pl.BlockSpec((b, h), lambda p, lref: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((n_o, b, bo_o), jnp.float32),   # o blocks
                pltpu.VMEM((b, h), jnp.float32),           # res2
                pltpu.VMEM((b, h), jnp.float32),           # normed y
                pltpu.VMEM((n_gu, b, bo), jnp.float32),    # silu(g)*u
                pltpu.VMEM((b, h), jnp.float32),           # wd acc (packed)
                pltpu.VMEM((2 * b, h), jnp.float32),       # wd acc (nibble)
                pltpu.VMEM((b, 1), jnp.float32),           # wd lo rowsum
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        out_shape=jax.ShapeDtypeStruct((b, h), attn_out.dtype),
        interpret=interpret,
    )(jnp.asarray(lyr, jnp.int32).reshape(1), attn_out, resid,
      norm_w.reshape(1, h), wo["q4c"], wo["s4c"], wgu["q4c"], wgu["s4c"],
      wgu["q4c"], wgu["s4c"], wd["q4c"], wd["s4c"])


def fused_omlp_eligible(lp: dict, rows: int, h: int) -> bool:
    """True when the decode layer's o/gate-up/down leaves are stacked int4c
    layer-views the fused kernel can consume (mirrors the int4c_matmul
    dispatch conditions; caller still gates on decode/t==1/qctx is None)."""
    if not _FUSE_DEFAULT or rows > 32:
        return False
    from .int4 import current_impl, is_quantized_int4c
    impl = current_impl()
    if impl == "xla":
        return False
    if impl == "auto" and jax.default_backend() != "tpu":
        return False
    for k in ("wo", "wgu", "wd"):
        leaf = lp.get(k)
        if not (isinstance(leaf, dict) and is_quantized_int4c(leaf)
                and "_lyr" in leaf and leaf["q4c"].ndim == 3):
            return False
    f2 = lp["wd"]["q4c"].shape[-2]
    if lp["wgu"]["q4c"].shape[-1] != 4 * f2:       # gate|up fused, 2F wide
        return False
    if lp["wo"]["q4c"].shape[-2] * 2 != h or lp["wo"]["q4c"].shape[-1] != h:
        return False
    return _plan(h, 2 * f2) is not None
