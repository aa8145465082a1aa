"""Fused ConvNeXt-stage streaming kernel (the int4 serving tier's conv tail).

One pallas_call executes a WHOLE tokenizer stage (depth identical blocks:
RMSNorm -> depthwise causal conv -> layer scale -> residual -> RMSNorm ->
int4c FFN w1 -> exact GELU -> int4c FFN w2 -> layer scale -> residual) for
one streaming step (T=1).  Replaces, per stage per generated frame, ~depth*2
Pallas matmul calls plus ~depth*6 small XLA ops with a single call whose
grid streams the stacked block weights from HBM.

Why: r4 profiling of the int4 tier measured the 2048-channel stages
(acoustic decoder stage 0 / semantic encoder stage 6 — 89% of the tokenizer
FFN mass, reference modular_vibevoice_tokenizer.py:620-684 Block1D) behind
~30 per-block kernel prologues plus a ~0.2 ms/step soup of per-block
norms/mixers between them.

Grid = (depth, 1 + n1 + nk2): phase 0 runs the norm/mixer/norm prologue
(no weight traffic), phases [1, n1] each compute one ``bo1``-wide output
block of the w1 matmul + GELU, and phases (n1, n1+nk2] one K-block of the
w2 matmul, accumulating in f32 scratch; the residual applies at the last
K-block.  The split-half int4c packing means w2 K-block i consumes g
blocks [i*m, (i+1)*m) (lo nibbles) and [n1/2 + i*m, ...) (hi nibbles),
m = n1/(2*nk2) — all ready once the w1 phases finish, so no reordering.

Mosaic's grid pipeline prefetches each operand ONE step ahead, and a phase
blocks on every operand whose mapped block changed — whether or not the
phase reads it.  Two scheduling rules follow: (1) all weight phases use
equal-size blocks, so each fetch hides exactly behind the previous phase's
fetch-wait; (2) weight index maps are simple clips of the phase index into
each operand's valid range (phase 0 maps w1 to block 0 of the CURRENT row,
w2 to its first K-block), monotonic within a row — a "smarter" mapping
that parked phase 0 on the previous row's last-held blocks to skip its
fetch was rejected: Mosaic miscompiled it (see the NOTE in
convnext_stage_step_int4c).  (The first cut of this kernel fetched the
whole stage-block per phase and serialized an in-register slab loop
against it — 4x off the weight-streaming floor; a second cut ran one
whole-row w2 phase and double-fetched at phase 0, pinning every variant
at ~420 GB/s regardless of compute mode.)

Streaming floor notes (measured on v5e): the W4A16 path is CONVERT-bound,
not DMA-bound — every packed byte costs two int8->bf16 vector converts (p
and its masked low nibble) before the MXU, capping int4c kernels around
~580 GB/s effective.  The ``a8`` mode removes the converts entirely: the
activation row is quantized to int8 once per matmul (per-row dynamic
scale, a ~[B, C] op against MBs of weights), and the dots run in the
MXU's native s8 x s8 -> s32 mode against the packed byte and its low
nibble — the same algebraic recombination as ops/int4._int4c_w4a8_kernel.
Serving enables a8 on the int4c speed tier (bf16 activations); f32 inputs
(parity tests) keep exact W4A16 math.

All dynamic indexing is on leading (untiled) dimensions — g_scr is
[n1, B, bo1] so the w1 phases write g_scr[j]; dynamic lane-dim slicing is
not Mosaic-lowerable.

Weights use the int4c packing of ops/int4.py (lo nibble biased, hi signed;
algebraic recombination, see the block comment there).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# FFN1 output-block width (lane-dim multiple of 128; the real stages have
# FFN 8192 / C 2048 — bo1 2048 gives 2.1 MB w1 blocks) and the w2 K-block
# count (>1 splits w2 into equal K-phases; must divide n1/2 when n1 even.
# Validated default is 1 — the K-split measured no faster on v5e)
_BO1 = 2048
_NK2 = 1


def _erf(x):
    """Abramowitz–Stegun 7.1.26 (|err| <= 1.5e-7): Mosaic has no erf
    primitive, and 1.5e-7 absolute disappears under the bf16 activation
    rounding (~4e-3) the serving path carries anyway."""
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu(h):
    return 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))


def _quant_rows(x):
    """Per-row symmetric int8 quantization of a small activation block.
    Returns (q int8 [B, C], scale f32 [B, 1])."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.round(xf / s).astype(jnp.int8)
    return q, s


def _mm_int4c(x, q_blk, s_blk, dtype):
    """W4A16: [B, IN] activations @ one packed int4c block [IN/2, BO] ->
    [B, BO] f32.  Two dequant converts per packed byte (the bf16 wall)."""
    b = x.shape[0]
    half = q_blk.shape[0]
    x_lo = x[:, :half].astype(dtype)
    x_hi = x[:, half:].astype(dtype)
    x2 = jnp.concatenate([x_lo, x_hi], axis=0)
    xsum = jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
    p = q_blk
    u = jnp.bitwise_and(p, jnp.int8(15))
    acc_p = jax.lax.dot_general(
        x_hi, p.astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_u = jax.lax.dot_general(
        x2, u.astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    hi = (acc_p - acc_u[b:]) * 0.0625
    lo = acc_u[:b] - 8.0 * xsum
    return (hi + lo) * s_blk.astype(jnp.float32)


def _mm_int4c_a8(xq, sx, q_blk, s_blk):
    """W4A8: int8 activations (pre-quantized, per-row scale sx) @ one packed
    int4c block — native s8 x s8 -> s32 dots, no weight converts."""
    b = xq.shape[0]
    half = q_blk.shape[0]
    x_lo = xq[:, :half]
    x_hi = xq[:, half:]
    x2 = jnp.concatenate([x_lo, x_hi], axis=0)
    xsum = jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
    p = q_blk
    u = jnp.bitwise_and(p, jnp.int8(15))
    acc_p = jax.lax.dot_general(
        x_hi, p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_u = jax.lax.dot_general(
        x2, u, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    hi16 = acc_p - acc_u[b:]                  # = 16 * x_hi @ q_hi
    lo = acc_u[:b] - 8 * xsum                 # = x_lo @ q_lo
    acc = hi16.astype(jnp.float32) * 0.0625 + lo.astype(jnp.float32)
    return acc * sx * s_blk.astype(jnp.float32)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return n.astype(x.dtype) * w


# packed C-vector row indices in the `vecs` operand [depth, 6, C]
_NORM, _MIX_B, _GAMMA, _FFN_NORM, _B2, _FFN_GAMMA = range(6)


def _stage_kernel(x_ref, state_ref, vecs_ref, mix_w_ref, w1q_ref, w1s_ref,
                  b1_ref, w2q_ref, w2s_ref, y_ref, state_out_ref,
                  x_scr, n2_scr, sx_scr, g_scr, acc_scr, *, eps: float,
                  depth: int, ffn_dim: int, dim: int, n1: int, bo1: int,
                  nk2: int, a8: bool, mxu_dtype):
    d = pl.program_id(0)
    p = pl.program_id(1)
    m = max(n1 // (2 * nk2), 1)       # g blocks per w2 K-block half

    @pl.when(p == 0)
    def _mixer():
        @pl.when(d == 0)
        def _load_x():
            x_scr[:] = x_ref[:]

        x = x_scr[:]                                       # [B, C]
        # mixer: RMSNorm -> depthwise causal conv (K taps over the carried
        # left context) -> layer scale -> residual
        nrm = _rms(x, vecs_ref[0, _NORM], eps)
        st = state_ref[0]                                  # [B, K-1, C]
        k1 = st.shape[1]
        win = jnp.concatenate([st, nrm[:, None, :]], axis=1)
        mix = jnp.zeros(x.shape, jnp.float32)
        for k in range(k1 + 1):
            mix = mix + (win[:, k].astype(jnp.float32)
                         * mix_w_ref[0, k].astype(jnp.float32))
        mix = mix.astype(x.dtype) + vecs_ref[0, _MIX_B]
        state_out_ref[0] = win[:, 1:]
        x1 = x + mix * vecs_ref[0, _GAMMA]
        x_scr[:] = x1
        n2 = _rms(x1, vecs_ref[0, _FFN_NORM], eps)
        if a8:
            q, s = _quant_rows(n2)
            n2_scr[:] = q
            sx_scr[0, :] = s[:, 0]
        else:
            n2_scr[:] = n2

    @pl.when(jnp.logical_and(p >= 1, p <= n1))
    def _ffn1_block():
        j = p - 1
        if a8:
            h = _mm_int4c_a8(n2_scr[:], sx_scr[0, :][:, None],
                             w1q_ref[0], w1s_ref[0, 0])
        else:
            h = _mm_int4c(n2_scr[:], w1q_ref[0], w1s_ref[0, 0], mxu_dtype)
        h = h + b1_ref[0, 0].astype(jnp.float32)
        g_scr[j] = _gelu(h).astype(g_scr.dtype)

    @pl.when(p > n1)
    def _ffn2_kblock():
        i = p - 1 - n1                 # w2 K-block index in [0, nk2)
        if nk2 == 1 or n1 % 2:
            g = jnp.concatenate([g_scr[t] for t in range(n1)], axis=-1)
        else:
            # K-block i pairs g blocks [i*m,(i+1)*m) with [n1/2+i*m, ...)
            g_lo = jnp.concatenate([g_scr[i * m + t] for t in range(m)],
                                   axis=-1)
            g_hi = jnp.concatenate([g_scr[n1 // 2 + i * m + t]
                                    for t in range(m)], axis=-1)
            g = jnp.concatenate([g_lo, g_hi], axis=-1)
        if a8:
            gq, sg = _quant_rows(g)
            part = _mm_int4c_a8(gq, sg, w2q_ref[0], jnp.float32(1.0))
        else:
            part = _mm_int4c(g, w2q_ref[0], jnp.float32(1.0), mxu_dtype)

        def flush(y):
            y = y * w2s_ref[0, 0].astype(jnp.float32)
            x1 = x_scr[:]
            y = y.astype(x1.dtype) + vecs_ref[0, _B2]
            x_scr[:] = x1 + y * vecs_ref[0, _FFN_GAMMA]

            @pl.when(d == depth - 1)
            def _emit():
                y_ref[:] = x_scr[:]

        if nk2 == 1:
            flush(part)
        else:
            @pl.when(i == 0)
            def _init():
                acc_scr[:] = part

            @pl.when(i != 0)
            def _add():
                acc_scr[:] = acc_scr[:] + part

            @pl.when(i == nk2 - 1)
            def _flush():
                flush(acc_scr[:])


def _pick_bo(total: int, pref: int) -> int:
    """Largest lane-aligned block width <= pref that divides total."""
    bo = min(pref, total)
    while total % bo or bo % 128:
        bo -= 128
        if bo <= 0:
            return total
    return bo


def _a8_default() -> bool:
    # default OFF: on v5e the fused stage is DMA/schedule-bound, so removing
    # the dequant converts measured no speedup — a8 would spend quantization
    # error for nothing.  The mode stays available for parts where compute
    # does bind (and for future hardware where converts are the wall).
    return os.environ.get("VIBEVOICE_STAGE_A8", "0") == "1"


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "a8"))
def convnext_stage_step_int4c(x: jax.Array, state: jax.Array, sp: dict,
                              eps: float = 1e-5,
                              interpret: bool = False,
                              a8: bool | None = None,
                              ) -> Tuple[jax.Array, jax.Array]:
    """One streaming step (T=1) of a stacked ConvNeXt stage.

    x: [B, C]; state: [depth, B, K-1, C] stacked per-block conv contexts;
    sp: stacked stage params (models/acoustic_tokenizer.stack_stage):
      vecs [depth, 6, C] (norm | mix_b | gamma | ffn_norm | b2 | ffn_gamma),
      mix_w [depth, K, C], b1 [depth, 1, FFN],
      w1 {"q4c": [depth, C/2, FFN], "s4c": [depth, 1, FFN]},
      w2 {"q4c": [depth, FFN/2, C], "s4c": [depth, 1, C]}.
    Returns (y [B, C], new_state).

    ``a8``: int8-activation mode — opt-in for bf16 inputs via env
    VIBEVOICE_STAGE_A8=1 (default off: measured a wash on v5e, see
    _a8_default).  f32 inputs always use exact W4A16.
    """
    depth, b, k1, dim = state.shape
    ffn_dim = sp["b1"].shape[-1]
    bo1 = _pick_bo(ffn_dim, _BO1)
    n1 = ffn_dim // bo1
    nk2 = _NK2 if (n1 % 2 == 0 and (n1 // 2) % _NK2 == 0) else 1
    if a8 is None:
        a8 = x.dtype == jnp.bfloat16 and _a8_default()
    # bf16 MXU inputs at serving; full-precision dots when x is f32 (tests)
    mxu_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    kernel = functools.partial(
        _stage_kernel, eps=eps, depth=depth, ffn_dim=ffn_dim, dim=dim,
        n1=n1, bo1=bo1, nk2=nk2, a8=a8, mxu_dtype=mxu_dtype)

    # NOTE on index maps: keep them simple and monotonic.  A "smart"
    # schedule that mapped idle phases to the previous row's block (to
    # avoid phase 0 waiting on fetches it doesn't read) produced WRONG
    # results on real Mosaic for every variant while passing interpret
    # mode — and measured no faster.  Clip-style maps are validated.
    def w1_map(d, p):
        return (d, 0, jnp.clip(p - 1, 0, n1 - 1))

    def w2_map(d, p):
        return (d, 0, jnp.clip(p - 1 - n1, 0, nk2 - 1))

    y, new_state = pl.pallas_call(
        kernel,
        grid=(depth, 1 + n1 + nk2),
        in_specs=[
            pl.BlockSpec((b, dim), lambda d, p: (0, 0)),
            pl.BlockSpec((1, b, k1, dim), lambda d, p: (d, 0, 0, 0)),
            pl.BlockSpec((1, 6, dim), lambda d, p: (d, 0, 0)),
            pl.BlockSpec((1, k1 + 1, dim), lambda d, p: (d, 0, 0)),
            pl.BlockSpec((1, dim // 2, bo1), w1_map),
            pl.BlockSpec((1, 1, bo1), w1_map),
            pl.BlockSpec((1, 1, bo1), w1_map),
            pl.BlockSpec((1, ffn_dim // 2 // nk2, dim), w2_map),
            pl.BlockSpec((1, 1, dim), lambda d, p: (d, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((b, dim), lambda d, p: (0, 0)),
            pl.BlockSpec((1, b, k1, dim), lambda d, p: (d, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, dim), x.dtype),
            jax.ShapeDtypeStruct(state.shape, state.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, dim), x.dtype),
            pltpu.VMEM((b, dim), jnp.int8 if a8 else x.dtype),
            pltpu.VMEM((1, b), jnp.float32),
            pltpu.VMEM((n1, b, bo1), x.dtype),
            pltpu.VMEM((b, dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, state, sp["vecs"], sp["mix_w"], sp["w1"]["q4c"], sp["w1"]["s4c"],
      sp["b1"], sp["w2"]["q4c"], sp["w2"]["s4c"])
    return y, new_state
