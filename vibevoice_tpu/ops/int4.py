"""Weight-only int4 quantization with a Pallas dequant-matmul kernel.

TPU-native analogue of the reference's bitsandbytes **4-bit** NF4 loading
(reference: main.py:97-103, 349-397 — `load_in_4bit`, double quant, fp16
compute) at the same weight width.  The decode step is weight-bandwidth-bound,
so cutting bytes again over int8 directly raises RTF; on a 16 GB v5e chip the
7B LM drops to ~4.4 GB.

Format (per weight leaf, replacing the bf16 [..., in, out] array):
  {"q4": int8 [..., in/2, out], "s4": bf16 [..., in/16, out]}

  * **Split-half packing**: packed row ``j`` stores original row ``j`` in its
    low nibble and row ``j + in/2`` in its high nibble.  Unpacking is then two
    contiguous half-blocks instead of an interleave — the Pallas kernel reads
    the activation block twice (columns [j) and [j + in/2)) and never
    shuffles sublanes.
  * **Group-wise scales**, group 16 along `in`: symmetric, q in [-8, 7],
    scale = amax/7 in bf16 — the linear-grid stand-in for NF4's nonlinear
    grid (NF4's quantile grid needs a per-element lookup; a 16-group linear
    grid reaches comparable error on normal-ish weights and dequantizes with
    one VPU multiply).  Group 16 also satisfies the Mosaic layout rule that
    a scale *block* span >= 8 sublanes.  Net 0.625 bytes/param.

Why a kernel at all: XLA reliably fuses an int8->bf16 `convert` into the dot
(ops/quant.py relies on that), but nibble unpack+sign-extend+concat is not a
fusible dot operand — without Pallas the unpacked tensor round-trips through
HBM and the bandwidth win evaporates.  The kernel streams packed blocks into
VMEM, unpacks and scales in-register, and feeds the MXU.

The XLA fallback path (non-TPU backends, GSPMD-sharded serving where a
pallas_call cannot be auto-partitioned, and kernel-unfriendly shapes)
materializes the dequantized weight; it is numerically identical up to f32
accumulation order.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 16

# 'auto' = Pallas on TPU, XLA elsewhere.  Dispatch happens at TRACE time, so
# scoping works per-jit-build: a meshed generator traces its GSPMD programs
# under impl_scope('xla') (GSPMD cannot partition a pallas_call) WITHOUT
# degrading other generators in the process — its decode step instead routes
# quantized LM matmuls through the shard_map wrapper below, which keeps the
# Pallas kernel per shard.
_IMPL_DEFAULT = os.environ.get("VIBEVOICE_INT4_IMPL", "auto")
_IMPL_VAR: contextvars.ContextVar = contextvars.ContextVar(
    "vibevoice_int4_impl", default=None)


def set_impl(impl: str) -> None:
    """Set the process-default dispatch ('auto' | 'pallas' | 'xla').  Prefer
    the scoped form (`impl_scope`) — this remains for tests/tools that really
    mean the whole process."""
    global _IMPL_DEFAULT
    assert impl in ("auto", "pallas", "xla"), impl
    _IMPL_DEFAULT = impl


def current_impl() -> str:
    return _IMPL_VAR.get() or _IMPL_DEFAULT


@contextlib.contextmanager
def impl_scope(impl: str):
    """Scope the trace-time int4 dispatch to a with-block (thread-local).
    Wrap jit *construction/tracing* sites; compiled executables are
    unaffected.  'interpret' = the Pallas kernels in interpret mode (CPU
    tests exercising the exact kernel math off-TPU)."""
    assert impl in ("auto", "pallas", "xla", "interpret"), impl
    tok = _IMPL_VAR.set(impl)
    try:
        yield
    finally:
        _IMPL_VAR.reset(tok)


def is_quantized_int4(leaf: Any) -> bool:
    # "_lyr" marks a trace-time layer-view of a stacked leaf (quant.layer_view)
    return (isinstance(leaf, dict)
            and {"q4", "s4"} <= set(leaf.keys()) <= {"q4", "s4", "_lyr"})


def quantizable_int4(shape, group_size: int = GROUP) -> bool:
    """in must split into two nibble halves of whole scale groups, with the
    half a multiple of 8 groups (Mosaic sublane rule for the scale blocks)."""
    if len(shape) < 2:
        return False
    inn = shape[-2]
    return inn % (2 * 8 * group_size) == 0


def quantize_weight_int4(w: jax.Array, group_size: int = GROUP) -> Dict[str, jax.Array]:
    """Symmetric group-wise int4, split-half packed. w: [..., in, out]."""
    assert w.shape[-2] % (2 * group_size) == 0, (w.shape, group_size)
    wf = w.astype(jnp.float32)
    *lead, inn, out = wf.shape
    g = wf.reshape(*lead, inn // group_size, group_size, out)
    amax = jnp.max(jnp.abs(g), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-12).astype(jnp.bfloat16)
    q = jnp.clip(jnp.round(g / scale.astype(jnp.float32)), -8, 7).astype(jnp.int8)
    q = q.reshape(*lead, inn, out)
    half = inn // 2
    lo = q[..., :half, :]
    hi = q[..., half:, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF), jnp.left_shift(hi, 4))
    return {"q4": packed.astype(jnp.int8), "s4": scale.squeeze(-2)}


def _unpack(packed: jax.Array):
    """int8 packed -> (lo, hi) sign-extended int8 nibbles."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)   # arithmetic shifts
    hi = jnp.right_shift(packed, 4)
    return lo, hi


def dequantize_weight_int4(qw: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    lo, hi = _unpack(qw["q4"])
    q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)  # [..., in, out]
    *lead, inn, out = q.shape
    s = qw["s4"].astype(jnp.float32)
    gs = inn // s.shape[-2]
    q = q.reshape(*lead, s.shape[-2], gs, out) * s[..., :, None, :]
    return q.reshape(*lead, inn, out).astype(dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _int4_kernel(x_lo_ref, x_hi_ref, q4_ref, s_lo_ref, s_hi_ref, o_ref,
                 acc_scr, *, n_groups: int, group_size: int):
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    p = q4_ref[...].astype(jnp.int32)                    # [BP, BO]
    lo = (jnp.bitwise_and(p, 15) ^ 8) - 8                # sign-extend low nibble
    hi = jnp.right_shift(p, 4)                           # arithmetic: high nibble
    bp, bo = p.shape

    def expand(s):                                       # [BP/gs, BO] -> [BP, BO]
        return jnp.broadcast_to(s.astype(jnp.float32)[:, None, :],
                                (n_groups, group_size, bo)).reshape(bp, bo)

    w_lo = lo.astype(jnp.float32) * expand(s_lo_ref[...])
    w_hi = hi.astype(jnp.float32) * expand(s_hi_ref[...])

    x_lo = x_lo_ref[...].astype(jnp.float32)             # [BM, BP]
    x_hi = x_hi_ref[...].astype(jnp.float32)
    acc_scr[:] += (
        jax.lax.dot_general(x_lo, w_lo, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(x_hi, w_hi, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32))

    @pl.when(i == ni - 1)
    def _flush():
        o_ref[...] = acc_scr[:].astype(o_ref.dtype)


def _plan(half: int, out: int, gs: int) -> Optional[Tuple[int, int]]:
    """(bp, bo) block sizes, or None when the kernel can't tile this shape.
    bp must divide the half, be a multiple of the group size, and span a
    multiple of 8 scale rows (sublane rule).  Same large-block policy as
    _plan_c, with a VMEM budget for the in-register dequantized f32 block."""
    bp = 0
    for cand in (1024, 896, 768, 640, 512, 384, 256, 128):
        if half % cand == 0 and cand % (8 * gs) == 0:
            bp = cand
            break
    bo = 0
    for cand in (1024, 896, 768, 640, 512, 384, 256, 128):
        if out % cand == 0:
            bo = cand
            break
    if not (bp and bo):
        return None
    # dequantized w_lo/w_hi are f32 in-register: budget ~512 KB packed block
    while bp * bo > 512 * 1024 and bo > 128:
        bo = next((c for c in (896, 768, 640, 512, 384, 256, 128)
                   if c < bo and out % c == 0), 128)
    while bp * bo > 512 * 1024 and bp > 128:
        bp = next((c for c in (896, 768, 640, 512, 384, 256, 128)
                   if c < bp and half % c == 0 and c % (8 * gs) == 0), 128)
    if bp % (8 * gs) != 0:
        return None
    return (bp, bo)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4_matmul_2d(x: jax.Array, q4: jax.Array, s4: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """x: [M, IN] (M % bm == 0 arranged by caller), q4: [IN/2, OUT],
    s4: [IN/gs, OUT] -> [M, OUT] f32."""
    m, inn = x.shape
    half, out = q4.shape
    gs = inn // s4.shape[0]
    bp, bo = _plan(half, out, gs)
    bm = m if m <= 256 else 256
    assert m % bm == 0, (m, bm)
    ni = half // bp
    n_groups = bp // gs

    grid = (m // bm, out // bo, ni)
    out_arr = pl.pallas_call(
        functools.partial(_int4_kernel, n_groups=n_groups, group_size=gs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bp), lambda mi, o, i: (mi, i)),          # x lo cols
            pl.BlockSpec((bm, bp), lambda mi, o, i, _ni=ni: (mi, i + _ni)),  # x hi
            pl.BlockSpec((bp, bo), lambda mi, o, i: (i, o)),
            pl.BlockSpec((n_groups, bo), lambda mi, o, i: (i, o)),     # s lo rows
            pl.BlockSpec((n_groups, bo), lambda mi, o, i, _ni=ni: (i + _ni, o)),
        ],
        out_specs=pl.BlockSpec((bm, bo), lambda mi, o, i: (mi, o)),
        scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        out_shape=jax.ShapeDtypeStruct((m, out), jnp.float32),
        interpret=interpret,
    )(x, x, q4, s4, s4)
    return out_arr


# ---------------------------------------------------------------------------
# Per-column-scale variant ("int4c") — the SPEED tier
# ---------------------------------------------------------------------------
# Group-16 scales (above) pay ~2 VPU ops/element to broadcast+apply scales
# inside the kernel (and the [groups, gs, out] -> [in, out] reshape is a
# Mosaic relayout); at batch 1 that ALU stream outweighs the bandwidth
# saving, which is why plain int4 measures SLOWER than int8.  With one scale
# per OUTPUT COLUMN the scale applies to the [m, out] accumulator at flush —
# O(m*out), not O(in*out).  Coarser scales cost accuracy (this is the speed
# tier; group-16 remains the fidelity tier) but keep the symmetric-linear
# grid of the reference's NF4 analogue.
#
# Packing is chosen to make the in-kernel unpack ONE native-int8 AND:
#   packed (int8) = 16*q_hi + (q_lo + 8)       q in [-8, 7]
# i.e. the HI nibble rides SIGNED in the byte's top bits and the LO nibble
# rides BIASED (u = q_lo + 8 in [0, 15]) in the bottom bits.  Then with
# u = p & 15 (the only unpack op — legal on int8 lanes; the arithmetic shift
# a sign-extending unpack needs is NOT, forcing the int8->int32->bf16
# round-trip that made the old kernel VPU-bound):
#
#   x_hi @ q_hi = (x_hi @ p - x_hi @ u) / 16          (exact)
#   x_lo @ q_lo =  x_lo @ u - 8 * sum(x_lo)           (rank-1 correction)
#
# Both p and u feed the MXU directly; the divide/correction apply to the
# [m, out] accumulators at flush.


def is_quantized_int4c(leaf: Any) -> bool:
    # "_lyr" marks a trace-time layer-view of a stacked leaf (quant.layer_view)
    return (isinstance(leaf, dict)
            and {"q4c", "s4c"} <= set(leaf.keys()) <= {"q4c", "s4c", "_lyr"})


def quantizable_int4c(shape) -> bool:
    if len(shape) < 2:
        return False
    return shape[-2] % (2 * 8) == 0


def quantize_weight_int4c(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-column int4, split-half packed (lo biased, hi
    signed — see block comment above).
    w: [..., in, out] -> {"q4c": int8 [..., in/2, out], "s4c": f32 [..., 1, out]}."""
    assert w.shape[-2] % 2 == 0, w.shape
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)          # [..., 1, out]
    scale = jnp.maximum(amax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -8, 7).astype(jnp.int32)
    half = q.shape[-2] // 2
    lo_b = q[..., :half, :] + 8                          # biased: [0, 15]
    hi_s = q[..., half:, :]                              # signed: [-8, 7]
    packed = jnp.bitwise_or(lo_b, jnp.left_shift(hi_s, 4))
    return {"q4c": packed.astype(jnp.int8), "s4c": scale}


def _unpack_c(packed: jax.Array):
    """int4c packed int8 -> (lo, hi) int8 nibble values in [-8, 7]."""
    p = packed.astype(jnp.int32)
    lo = jnp.bitwise_and(p, 15) - 8
    hi = jnp.right_shift(p, 4)          # arithmetic: floor(p/16) == q_hi
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def dequantize_weight_int4c(qw: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    lo, hi = _unpack_c(qw["q4c"])
    q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)
    return (q * qw["s4c"].astype(jnp.float32)).astype(dtype)


def _int4c_kernel(x_lo_ref, x_hi_ref, q4_ref, s_ref, o_ref,
                  acc_p_scr, acc_u_scr, xsum_scr):
    """W4A16: bf16 MXU dots against the packed byte and its low nibble;
    hi/lo contributions recombined algebraically at flush."""
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        acc_p_scr[:] = jnp.zeros_like(acc_p_scr)
        acc_u_scr[:] = jnp.zeros_like(acc_u_scr)
        xsum_scr[:] = jnp.zeros_like(xsum_scr)

    p = q4_ref[...]                                       # int8 [BP, BO]
    u = jnp.bitwise_and(p, jnp.int8(15))                  # native i8 lanes
    p_bf = p.astype(jnp.bfloat16)                         # exact: |p| <= 127
    u_bf = u.astype(jnp.bfloat16)

    x_lo = x_lo_ref[...].astype(jnp.bfloat16)             # [BM, BP]
    x_hi = x_hi_ref[...].astype(jnp.bfloat16)
    m = x_lo.shape[0]
    x2 = jnp.concatenate([x_lo, x_hi], axis=0)            # [2BM, BP]

    acc_p_scr[:] += jax.lax.dot_general(
        x_hi, p_bf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_u_scr[:] += jax.lax.dot_general(
        x2, u_bf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    xsum_scr[:] += jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)

    @pl.when(i == ni - 1)
    def _flush():
        d_u_lo = acc_u_scr[:m]
        d_u_hi = acc_u_scr[m:]
        hi = (acc_p_scr[:] - d_u_hi) * 0.0625             # = x_hi @ q_hi
        lo = d_u_lo - 8.0 * xsum_scr[:]                   # = x_lo @ q_lo
        o_ref[...] = ((hi + lo) * s_ref[...].astype(jnp.float32)
                      ).astype(o_ref.dtype)


_PLAN_C_BUDGET = 1536 * 1024
_CANDS_P = (2048, 1792, 1536, 1280, 1024, 896, 768, 640, 512, 384, 256, 128)
_CANDS_O = (2048, 1792, 1536, 1280, 1024, 896, 768, 640, 512, 384, 256, 128)


def _plan_c(half: int, out: int) -> Optional[Tuple[int, int]]:
    """Largest lane/sublane-aligned divisors with the weight block under
    ~1.5 MB (double-buffered block + f32 accumulators must fit VMEM).  Bigger
    blocks = fewer grid steps = less flush/init overhead; covering the whole
    half (bp == half) removes the accumulation loop entirely.  The budget is
    empirical: an r4 on-device sweep over the serving shapes measured the
    1536 KB plan ~10% faster than 768 KB on the LM mlp stacks (wgu/wd) and
    neutral elsewhere; >=3 MB regressed the tokenizer 2d shape."""
    bp = next((c for c in _CANDS_P if half % c == 0), 0)
    bo = next((c for c in _CANDS_O if out % c == 0), 0)
    if not (bp and bo):
        return None
    while bp * bo > _PLAN_C_BUDGET and bo > 128:
        bo = next((c for c in _CANDS_O if c < bo and out % c == 0), 128)
    while bp * bo > _PLAN_C_BUDGET and bp > 128:
        bp = next((c for c in _CANDS_P if c < bp and half % c == 0), 128)
    return (bp, bo)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4c_matmul_2d(x: jax.Array, q4: jax.Array, s4: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """x: [M, IN], q4: [IN/2, OUT] packed, s4: [1, OUT] -> [M, OUT] f32."""
    m, inn = x.shape
    half, out = q4.shape
    bp, bo = _plan_c(half, out)
    bm = m if m <= 256 else 256
    assert m % bm == 0, (m, bm)
    ni = half // bp

    grid = (m // bm, out // bo, ni)
    return pl.pallas_call(
        _int4c_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bp), lambda mi, o, i: (mi, i)),            # x lo
            pl.BlockSpec((bm, bp), lambda mi, o, i, _ni=ni: (mi, i + _ni)),  # x hi
            pl.BlockSpec((bp, bo), lambda mi, o, i: (i, o)),
            pl.BlockSpec((1, bo), lambda mi, o, i: (0, o)),
        ],
        out_specs=pl.BlockSpec((bm, bo), lambda mi, o, i: (mi, o)),
        scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32),
                        pltpu.VMEM((2 * bm, bo), jnp.float32),
                        pltpu.VMEM((bm, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        out_shape=jax.ShapeDtypeStruct((m, out), jnp.float32),
        interpret=interpret,
    )(x, x, q4, s4)


def _int4c_w4a8_kernel(x_lo_ref, x_hi_ref, q4_ref, s_ref, sx_ref, o_ref,
                       acc_p_scr, acc_u_scr, xsum_scr):
    """W4A8: int8 activations on the MXU's native s8 x s8 -> s32 mode against
    the packed byte and its low nibble — same algebraic recombination as the
    W4A16 kernel, integer accumulators.  Scales (per-column weight scale x
    per-row activation scale) apply to the [bm, bo] accumulator at flush."""
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        acc_p_scr[:] = jnp.zeros_like(acc_p_scr)
        acc_u_scr[:] = jnp.zeros_like(acc_u_scr)
        xsum_scr[:] = jnp.zeros_like(xsum_scr)

    p = q4_ref[...]                                       # int8 [BP, BO]
    u = jnp.bitwise_and(p, jnp.int8(15))                  # native i8 lanes

    x_lo = x_lo_ref[...]
    x_hi = x_hi_ref[...]
    m = x_lo.shape[0]
    x2 = jnp.concatenate([x_lo, x_hi], axis=0)            # [2BM, BP] int8

    acc_p_scr[:] += jax.lax.dot_general(
        x_hi, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    acc_u_scr[:] += jax.lax.dot_general(
        x2, u, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    xsum_scr[:] += jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)

    @pl.when(i == ni - 1)
    def _flush():
        d_u_lo = acc_u_scr[:m]
        d_u_hi = acc_u_scr[m:]
        hi16 = acc_p_scr[:] - d_u_hi                      # = 16 * x_hi @ q_hi
        lo = d_u_lo - 8 * xsum_scr[:]                     # = x_lo @ q_lo
        o_ref[...] = ((hi16.astype(jnp.float32) * 0.0625
                       + lo.astype(jnp.float32))
                      * sx_ref[...].astype(jnp.float32)
                      * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4c_w4a8_matmul_2d(xq: jax.Array, sx: jax.Array, q4: jax.Array,
                          s4: jax.Array, interpret: bool = False) -> jax.Array:
    """xq: int8 [M, IN], sx: f32 [M, 1], q4: [IN/2, OUT], s4: [1, OUT]."""
    m, inn = xq.shape
    half, out = q4.shape
    bp, bo = _plan_c(half, out)
    bm = m if m <= 256 else 256
    assert m % bm == 0, (m, bm)
    ni = half // bp

    grid = (m // bm, out // bo, ni)
    return pl.pallas_call(
        _int4c_w4a8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bp), lambda mi, o, i: (mi, i)),
            pl.BlockSpec((bm, bp), lambda mi, o, i, _ni=ni: (mi, i + _ni)),
            pl.BlockSpec((bp, bo), lambda mi, o, i: (i, o)),
            pl.BlockSpec((1, bo), lambda mi, o, i: (0, o)),
            pl.BlockSpec((bm, 1), lambda mi, o, i: (mi, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bo), lambda mi, o, i: (mi, o)),
        scratch_shapes=[pltpu.VMEM((bm, bo), jnp.int32),
                        pltpu.VMEM((2 * bm, bo), jnp.int32),
                        pltpu.VMEM((bm, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        out_shape=jax.ShapeDtypeStruct((m, out), jnp.float32),
        interpret=interpret,
    )(xq, xq, q4, s4, sx)


# ---------------------------------------------------------------------------
# Stacked-weight variants (layer-scanned models)
# ---------------------------------------------------------------------------
# LM / diffusion-head weights live layer-STACKED ([L, in, out]) and are
# consumed inside a lax.scan.  Slicing layer l's weight out of the stack and
# passing it to a pallas_call forces XLA to MATERIALIZE the slice (a pallas
# operand cannot fuse a dynamic-slice), costing an extra HBM write+read of
# every quantized weight every step — profiled at ~1.3 ms/step on the 1.5B
# int4 tier (dynamic-slice_bitcast_fusion ops), more than the entire unpack.
# These variants instead take the FULL stack plus the layer index as a
# scalar-prefetch argument (same pattern as the stacked KV cache in
# ops/flash_decode.py): the index maps address layer l's blocks directly, so
# only the needed bytes ever move.
#
# Dispatch: the scan body wraps the stacked leaf as {"q4c", "s4c", "_lyr"}
# (see quant.layer_view); int4c_matmul/int4_matmul route on "_lyr".


def _int4c_stacked_kernel(lyr_ref, x_lo_ref, x_hi_ref, q4_ref, s_ref, o_ref,
                          acc_p_scr, acc_u_scr, xsum_scr):
    del lyr_ref                                           # consumed by index maps
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        acc_p_scr[:] = jnp.zeros_like(acc_p_scr)
        acc_u_scr[:] = jnp.zeros_like(acc_u_scr)
        xsum_scr[:] = jnp.zeros_like(xsum_scr)

    p = q4_ref[0]                                         # int8 [BP, BO]
    u = jnp.bitwise_and(p, jnp.int8(15))
    p_bf = p.astype(jnp.bfloat16)
    u_bf = u.astype(jnp.bfloat16)

    x_lo = x_lo_ref[...].astype(jnp.bfloat16)
    x_hi = x_hi_ref[...].astype(jnp.bfloat16)
    m = x_lo.shape[0]
    x2 = jnp.concatenate([x_lo, x_hi], axis=0)

    acc_p_scr[:] += jax.lax.dot_general(
        x_hi, p_bf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_u_scr[:] += jax.lax.dot_general(
        x2, u_bf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    xsum_scr[:] += jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)

    @pl.when(i == ni - 1)
    def _flush():
        hi = (acc_p_scr[:] - acc_u_scr[m:]) * 0.0625
        lo = acc_u_scr[:m] - 8.0 * xsum_scr[:]
        o_ref[...] = ((hi + lo) * s_ref[0].astype(jnp.float32)
                      ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4c_matmul_stacked(x: jax.Array, q4s: jax.Array, s4s: jax.Array,
                          lyr: jax.Array, interpret: bool = False) -> jax.Array:
    """x: [M, IN], q4s: [L, IN/2, OUT], s4s: [L, 1, OUT], lyr: scalar int32
    -> [M, OUT] f32, using only layer ``lyr``'s blocks of the stack."""
    m, inn = x.shape
    _, half, out = q4s.shape
    bp, bo = _plan_c(half, out)
    bm = m if m <= 256 else 256
    assert m % bm == 0, (m, bm)
    ni = half // bp

    grid = (m // bm, out // bo, ni)
    return pl.pallas_call(
        _int4c_stacked_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bp), lambda mi, o, i, lref: (mi, i)),
                pl.BlockSpec((bm, bp),
                             lambda mi, o, i, lref, _ni=ni: (mi, i + _ni)),
                pl.BlockSpec((1, bp, bo), lambda mi, o, i, lref: (lref[0], i, o)),
                pl.BlockSpec((1, 1, bo), lambda mi, o, i, lref: (lref[0], 0, o)),
            ],
            out_specs=pl.BlockSpec((bm, bo), lambda mi, o, i, lref: (mi, o)),
            scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32),
                            pltpu.VMEM((2 * bm, bo), jnp.float32),
                            pltpu.VMEM((bm, 1), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        out_shape=jax.ShapeDtypeStruct((m, out), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(lyr, jnp.int32).reshape(1), x, x, q4s, s4s)


def _int4c_w4a8_stacked_kernel(lyr_ref, x_lo_ref, x_hi_ref, q4_ref, s_ref,
                               sx_ref, o_ref, acc_p_scr, acc_u_scr, xsum_scr):
    del lyr_ref
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        acc_p_scr[:] = jnp.zeros_like(acc_p_scr)
        acc_u_scr[:] = jnp.zeros_like(acc_u_scr)
        xsum_scr[:] = jnp.zeros_like(xsum_scr)

    p = q4_ref[0]
    u = jnp.bitwise_and(p, jnp.int8(15))
    x_lo = x_lo_ref[...]
    x_hi = x_hi_ref[...]
    m = x_lo.shape[0]
    x2 = jnp.concatenate([x_lo, x_hi], axis=0)

    acc_p_scr[:] += jax.lax.dot_general(
        x_hi, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    acc_u_scr[:] += jax.lax.dot_general(
        x2, u, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    xsum_scr[:] += jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)

    @pl.when(i == ni - 1)
    def _flush():
        hi16 = acc_p_scr[:] - acc_u_scr[m:]
        lo = acc_u_scr[:m] - 8 * xsum_scr[:]
        o_ref[...] = ((hi16.astype(jnp.float32) * 0.0625
                       + lo.astype(jnp.float32))
                      * sx_ref[...].astype(jnp.float32)
                      * s_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4c_w4a8_matmul_stacked(xq: jax.Array, sx: jax.Array, q4s: jax.Array,
                               s4s: jax.Array, lyr: jax.Array,
                               interpret: bool = False) -> jax.Array:
    m, inn = xq.shape
    _, half, out = q4s.shape
    bp, bo = _plan_c(half, out)
    bm = m if m <= 256 else 256
    assert m % bm == 0, (m, bm)
    ni = half // bp

    grid = (m // bm, out // bo, ni)
    return pl.pallas_call(
        _int4c_w4a8_stacked_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bp), lambda mi, o, i, lref: (mi, i)),
                pl.BlockSpec((bm, bp),
                             lambda mi, o, i, lref, _ni=ni: (mi, i + _ni)),
                pl.BlockSpec((1, bp, bo), lambda mi, o, i, lref: (lref[0], i, o)),
                pl.BlockSpec((1, 1, bo), lambda mi, o, i, lref: (lref[0], 0, o)),
                pl.BlockSpec((bm, 1), lambda mi, o, i, lref: (mi, 0)),
            ],
            out_specs=pl.BlockSpec((bm, bo), lambda mi, o, i, lref: (mi, o)),
            scratch_shapes=[pltpu.VMEM((bm, bo), jnp.int32),
                            pltpu.VMEM((2 * bm, bo), jnp.int32),
                            pltpu.VMEM((bm, 1), jnp.int32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        out_shape=jax.ShapeDtypeStruct((m, out), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(lyr, jnp.int32).reshape(1), xq, xq, q4s, s4s, sx)


def _int4_stacked_kernel(lyr_ref, x_lo_ref, x_hi_ref, q4_ref, s_lo_ref,
                         s_hi_ref, o_ref, acc_scr, *, n_groups: int,
                         group_size: int):
    del lyr_ref
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    p = q4_ref[0].astype(jnp.int32)
    lo = (jnp.bitwise_and(p, 15) ^ 8) - 8
    hi = jnp.right_shift(p, 4)
    bp, bo = p.shape

    def expand(s):
        return jnp.broadcast_to(s.astype(jnp.float32)[:, None, :],
                                (n_groups, group_size, bo)).reshape(bp, bo)

    w_lo = lo.astype(jnp.float32) * expand(s_lo_ref[0])
    w_hi = hi.astype(jnp.float32) * expand(s_hi_ref[0])

    x_lo = x_lo_ref[...].astype(jnp.float32)
    x_hi = x_hi_ref[...].astype(jnp.float32)
    acc_scr[:] += (
        jax.lax.dot_general(x_lo, w_lo, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(x_hi, w_hi, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32))

    @pl.when(i == ni - 1)
    def _flush():
        o_ref[...] = acc_scr[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4_matmul_stacked(x: jax.Array, q4s: jax.Array, s4s: jax.Array,
                         lyr: jax.Array, interpret: bool = False) -> jax.Array:
    """Group-16 fidelity tier, stacked: q4s [L, IN/2, OUT], s4s [L, IN/gs, OUT]."""
    m, inn = x.shape
    _, half, out = q4s.shape
    gs = inn // s4s.shape[1]
    bp, bo = _plan(half, out, gs)
    bm = m if m <= 256 else 256
    assert m % bm == 0, (m, bm)
    ni = half // bp
    n_groups = bp // gs

    grid = (m // bm, out // bo, ni)
    return pl.pallas_call(
        functools.partial(_int4_stacked_kernel, n_groups=n_groups,
                          group_size=gs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bp), lambda mi, o, i, lref: (mi, i)),
                pl.BlockSpec((bm, bp),
                             lambda mi, o, i, lref, _ni=ni: (mi, i + _ni)),
                pl.BlockSpec((1, bp, bo), lambda mi, o, i, lref: (lref[0], i, o)),
                pl.BlockSpec((1, n_groups, bo),
                             lambda mi, o, i, lref: (lref[0], i, o)),
                pl.BlockSpec((1, n_groups, bo),
                             lambda mi, o, i, lref, _ni=ni: (lref[0], i + _ni, o)),
            ],
            out_specs=pl.BlockSpec((bm, bo), lambda mi, o, i, lref: (mi, o)),
            scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        out_shape=jax.ShapeDtypeStruct((m, out), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(lyr, jnp.int32).reshape(1), x, x, q4s, s4s, s4s)


_W4A8 = os.environ.get("VIBEVOICE_W4A8", "0") == "1"


def set_w4a8(enabled: bool) -> None:
    """int4c matmuls quantize activations per-row to int8 and run the MXU's
    native s8 x s8 mode (same accuracy tradeoff as W8A8)."""
    global _W4A8
    _W4A8 = bool(enabled)


def _layer_slice(qw: Dict[str, jax.Array], keys) -> Dict[str, jax.Array]:
    """Materialize layer ``_lyr`` of a stacked quantized leaf (XLA fallback)."""
    lyr = qw["_lyr"]
    return {k: jax.lax.dynamic_index_in_dim(qw[k], lyr, 0, keepdims=False)
            for k in keys}


# Row-count threshold for the pallas kernels.  At decode sizes (a few CFG
# rows) the matmul is weight-bandwidth-bound and in-register unpack wins; at
# prefill sizes it is MXU-compute-bound, where the kernels' two weight
# streams double the MXU work while XLA's dequantize-then-dot runs one
# stream at full rate (measured: int4 pallas prefill ~2x slower than int8's
# fused path at 4k-token segments).
_PALLAS_MAX_ROWS = 32


def int4c_matmul(x: jax.Array, qw: Dict[str, jax.Array],
                 impl: Optional[str] = None,
                 interpret: bool = False) -> jax.Array:
    """x @ W for a per-column-scale int4 weight; x: [..., in].

    A leaf carrying "_lyr" is a layer-view of a [L, in/2, out] stack inside a
    layer scan: the pallas path addresses layer blocks via scalar prefetch
    (no materialized slice).  ``impl`` overrides the scoped dispatch
    (int4_matmul_sharded passes 'pallas' per shard); ``interpret`` runs the
    kernel in Pallas interpret mode (CPU-mesh tests)."""
    *lead, inn = x.shape
    half, out = qw["q4c"].shape[-2:]
    stacked = "_lyr" in qw and qw["q4c"].ndim == 3

    rows = 1
    for d in lead:
        rows *= d
    impl = impl or current_impl()
    if impl == "interpret":
        impl, interpret = "pallas", True
    if impl == "auto":
        impl = ("pallas" if jax.default_backend() == "tpu"
                and rows <= _PALLAS_MAX_ROWS else "xla")
    if impl == "pallas" and ((qw["q4c"].ndim != 2 and not stacked)
                             or _plan_c(half, out) is None):
        impl = "xla"
    if impl == "xla":
        qw2 = _layer_slice(qw, ("q4c", "s4c")) if stacked else qw
        w = dequantize_weight_int4c(qw2, x.dtype)
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)

    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, inn)
    pad = 0
    if m > 256 and m % 256 != 0:
        pad = 256 - m % 256
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    if _W4A8:
        sx = jnp.max(jnp.abs(x2.astype(jnp.float32)), axis=-1, keepdims=True)
        sx = jnp.maximum(sx / 127.0, 1e-12)
        xq = jnp.clip(jnp.round(x2.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        if stacked:
            y = _int4c_w4a8_matmul_stacked(xq, sx, qw["q4c"], qw["s4c"],
                                           qw["_lyr"], interpret=interpret)
        else:
            y = _int4c_w4a8_matmul_2d(xq, sx, qw["q4c"], qw["s4c"],
                                      interpret=interpret)
    elif stacked:
        y = _int4c_matmul_stacked(x2, qw["q4c"], qw["s4c"], qw["_lyr"],
                                  interpret=interpret)
    else:
        y = _int4c_matmul_2d(x2, qw["q4c"], qw["s4c"], interpret=interpret)
    if pad:
        y = y[:m]
    return y.reshape(*lead, out).astype(x.dtype)


def int4_matmul(x: jax.Array, qw: Dict[str, jax.Array],
                impl: Optional[str] = None,
                interpret: bool = False) -> jax.Array:
    """x @ W for an int4-packed weight; x: [..., in]. Output in x.dtype.
    Leaves carrying "_lyr" are layer-views of a stack (see int4c_matmul)."""
    *lead, inn = x.shape
    half, out = qw["q4"].shape[-2:]
    gs = inn // qw["s4"].shape[-2]
    stacked = "_lyr" in qw and qw["q4"].ndim == 3

    rows = 1
    for d in lead:
        rows *= d
    impl = impl or current_impl()
    if impl == "interpret":
        impl, interpret = "pallas", True
    if impl == "auto":
        impl = ("pallas" if jax.default_backend() == "tpu"
                and rows <= _PALLAS_MAX_ROWS else "xla")
    if impl == "pallas" and ((qw["q4"].ndim != 2 and not stacked)
                             or _plan(half, out, gs) is None):
        impl = "xla"
    if impl == "xla":
        qw2 = _layer_slice(qw, ("q4", "s4")) if stacked else qw
        w = dequantize_weight_int4(qw2, x.dtype)
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)

    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, inn)
    pad = 0
    if m > 256 and m % 256 != 0:
        pad = 256 - m % 256
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    if stacked:
        y = _int4_matmul_stacked(x2, qw["q4"], qw["s4"], qw["_lyr"],
                                 interpret=interpret)
    else:
        y = _int4_matmul_2d(x2, qw["q4"], qw["s4"], interpret=interpret)
    if pad:
        y = y[:m]
    return y.reshape(*lead, out).astype(x.dtype)


# ---------------------------------------------------------------------------
# Sharded serving: per-shard Pallas matmul under shard_map
# ---------------------------------------------------------------------------

def int4_matmul_sharded(x: jax.Array, qw: Dict[str, jax.Array], mesh,
                        batch_on_dp: bool = False,
                        interpret: Optional[bool] = None) -> jax.Array:
    """x @ W for an int4/int4c leaf with the weight's OUT axis sharded on
    mesh axis 'tp' (column-parallel; the serving layout in
    parallel/sharding.py when the Pallas decode path is active).

    A pallas_call is opaque to GSPMD, so the kernel is mapped per shard with
    shard_map: each tp shard runs the standard kernel on its complete
    [in(/2), out/tp] weight block against the replicated activation — the
    split-half nibble packing stays shard-local, no repacking, no collectives
    inside the matmul.  The output comes back sharded on its last axis (and
    on dp over rows when ``batch_on_dp``); surrounding GSPMD code
    re-shards as needed.  Matches reference capability: quantized serving on
    the multi-device layouts of main.py:349-397 +
    configuration_vibevoice.py:175-183.
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    is_c = "q4c" in qw
    wkeys = ("q4c", "s4c") if is_c else ("q4", "s4")
    wspec = {k: P(*([None] * (qw[k].ndim - 1)), "tp") for k in wkeys}
    if "_lyr" in qw:
        wspec["_lyr"] = P()
    dp = "dp" if batch_on_dp else None
    xspec = P(dp, *([None] * (x.ndim - 1)))
    ospec = P(dp, *([None] * (x.ndim - 2)), "tp")

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # per-shard dispatch: force the kernel (that's the point), interpret off
    # TPU so CPU-mesh tests execute the same kernel code numerically
    fn = int4c_matmul if is_c else int4_matmul

    def inner(x_, qw_):
        return fn(x_, qw_, impl="pallas", interpret=interpret)

    kwargs = dict(mesh=mesh, in_specs=(xspec, wspec), out_specs=ospec)
    try:
        mapped = shard_map(inner, check_vma=False, **kwargs)
    except TypeError:  # older jax spells it check_rep
        mapped = shard_map(inner, check_rep=False, **kwargs)
    return mapped(x, qw)
