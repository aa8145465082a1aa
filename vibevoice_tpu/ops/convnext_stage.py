"""Fused ConvNeXt-stage streaming kernel (the int4 serving tier's conv tail).

One pallas_call executes a WHOLE tokenizer stage (depth identical blocks:
RMSNorm -> depthwise causal conv -> layer scale -> residual -> RMSNorm ->
int4c FFN w1 -> exact GELU -> int4c FFN w2 -> layer scale -> residual) for
one streaming step (T=1).  Replaces, per stage per generated frame, ~depth*2
Pallas matmul calls plus ~depth*6 small XLA ops with a single call whose
grid streams the stacked block weights from HBM.

Why: r4 profiling of the int4 tier measured the 2048-channel stages
(acoustic decoder stage 0 / semantic encoder stage 6 — 89% of the tokenizer
FFN mass, reference modular_vibevoice_tokenizer.py:620-684 Block1D) at ~65%
of the HBM floor with ~0.2 ms/step of per-call prologue + op-soup around
them.  The fused grid pays one prologue per stage and overlaps each block's
weight DMA with the previous block's compute.

Grid = (depth, 2): phase 0 runs norm/mix/norm + the w1 matmul + GELU, phase
1 the w2 matmul + residual.  The phase split halves peak VMEM: w1[d] and
w2[d] blocks are ~4.2 MB each packed (C=2048), and the revolving-buffer
prefetch holds at most w1[d] + w2[d-1] + (incoming w2[d]) ~= 12.6 MB.

Weights use the int4c packing of ops/int4.py (lo nibble biased, hi signed;
algebraic recombination, see the block comment there) so the packed byte and
its low nibble feed the MXU directly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-matmul output-slab width: bounds the in-register dequantized weight
# temporaries ([C/2, SLAB] casts) to ~0.5-1 MB beside the resident blocks
_SLAB = 256


def _mm_int4c_slabbed(x, q_ref, s_ref, out_dim: int, dtype):
    """x [B, IN] @ int4c-packed q_ref block (1, IN/2, OUT) -> [B, OUT] f32.
    Static loop over output slabs keeps dequant temporaries small."""
    half = q_ref.shape[1]
    b = x.shape[0]
    x_lo = x[:, :half].astype(dtype)
    x_hi = x[:, half:].astype(dtype)
    x2 = jnp.concatenate([x_lo, x_hi], axis=0)
    xsum = jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)  # [B, 1]
    cols = []
    for j in range(0, out_dim, _SLAB):
        p = q_ref[0, :, j:min(j + _SLAB, out_dim)]        # int8 [half, SLAB]
        u = jnp.bitwise_and(p, jnp.int8(15))
        acc_p = jax.lax.dot_general(
            x_hi, p.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_u = jax.lax.dot_general(
            x2, u.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        hi = (acc_p - acc_u[b:]) * 0.0625
        lo = acc_u[:b] - 8.0 * xsum
        s = s_ref[0, 0, j:min(j + _SLAB, out_dim)].astype(jnp.float32)
        cols.append((hi + lo) * s)
    return jnp.concatenate(cols, axis=-1)                 # [B, OUT] f32


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return n.astype(x.dtype) * w


# packed C-vector row indices in the `vecs` operand [depth, 6, C]
_NORM, _MIX_B, _GAMMA, _FFN_NORM, _B2, _FFN_GAMMA = range(6)


def _stage_kernel(x_ref, state_ref, vecs_ref, mix_w_ref, w1q_ref, w1s_ref,
                  b1_ref, w2q_ref, w2s_ref, y_ref, state_out_ref,
                  x_scr, g_scr, *, eps: float, depth: int, ffn_dim: int,
                  dim: int, mxu_dtype):
    d = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(jnp.logical_and(d == 0, p == 0))
    def _load_x():
        x_scr[:] = x_ref[:]

    @pl.when(p == 0)
    def _phase0():
        x = x_scr[:]                                       # [B, C]
        # mixer: RMSNorm -> depthwise causal conv (K taps over the carried
        # left context) -> layer scale -> residual
        n1 = _rms(x, vecs_ref[0, _NORM], eps)
        st = state_ref[0]                                  # [B, K-1, C]
        k1 = st.shape[1]
        win = jnp.concatenate([st, n1[:, None, :]], axis=1)
        mix = jnp.zeros(x.shape, jnp.float32)
        for k in range(k1 + 1):
            mix = mix + (win[:, k].astype(jnp.float32)
                         * mix_w_ref[0, k].astype(jnp.float32))
        mix = mix.astype(x.dtype) + vecs_ref[0, _MIX_B]
        state_out_ref[0] = win[:, 1:]
        x1 = x + mix * vecs_ref[0, _GAMMA]
        x_scr[:] = x1
        # FFN in: RMSNorm -> w1 -> bias -> exact GELU
        n2 = _rms(x1, vecs_ref[0, _FFN_NORM], eps)
        h = _mm_int4c_slabbed(n2, w1q_ref, w1s_ref, ffn_dim, mxu_dtype)
        h = h.astype(x.dtype) + b1_ref[0]
        hf = h.astype(jnp.float32)
        g = 0.5 * hf * (1.0 + jax.lax.erf(hf * (2.0 ** -0.5)))
        g_scr[:] = g.astype(x.dtype)

    @pl.when(p == 1)
    def _phase1():
        x1 = x_scr[:]
        y = _mm_int4c_slabbed(g_scr[:], w2q_ref, w2s_ref, dim, mxu_dtype)
        y = y.astype(x1.dtype) + vecs_ref[0, _B2]
        x2 = x1 + y * vecs_ref[0, _FFN_GAMMA]
        x_scr[:] = x2

        @pl.when(d == depth - 1)
        def _emit():
            y_ref[:] = x_scr[:]


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def convnext_stage_step_int4c(x: jax.Array, state: jax.Array, sp: dict,
                              eps: float = 1e-5,
                              interpret: bool = False
                              ) -> Tuple[jax.Array, jax.Array]:
    """One streaming step (T=1) of a stacked ConvNeXt stage.

    x: [B, C]; state: [depth, B, K-1, C] stacked per-block conv contexts;
    sp: stacked stage params (models/acoustic_tokenizer.stack_stage):
      vecs [depth, 6, C] (norm | mix_b | gamma | ffn_norm | b2 | ffn_gamma),
      mix_w [depth, K, C], b1 [depth, FFN],
      w1 {"q4c": [depth, C/2, FFN], "s4c": [depth, 1, FFN]},
      w2 {"q4c": [depth, FFN/2, C], "s4c": [depth, 1, C]}.
    Returns (y [B, C], new_state).
    """
    depth, b, k1, dim = state.shape
    ffn_dim = sp["b1"].shape[-1]
    # bf16 MXU inputs at serving; full-precision dots when x is f32 (tests)
    mxu_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    kernel = functools.partial(
        _stage_kernel, eps=eps, depth=depth, ffn_dim=ffn_dim, dim=dim,
        mxu_dtype=mxu_dtype)
    y, new_state = pl.pallas_call(
        kernel,
        grid=(depth, 2),
        in_specs=[
            pl.BlockSpec((b, dim), lambda d, p: (0, 0)),
            pl.BlockSpec((1, b, k1, dim), lambda d, p: (d, 0, 0, 0)),
            pl.BlockSpec((1, 6, dim), lambda d, p: (d, 0, 0)),
            pl.BlockSpec((1, k1 + 1, dim), lambda d, p: (d, 0, 0)),
            pl.BlockSpec((1, dim // 2, ffn_dim), lambda d, p: (d, 0, 0)),
            pl.BlockSpec((1, 1, ffn_dim), lambda d, p: (d, 0, 0)),
            pl.BlockSpec((1, ffn_dim), lambda d, p: (d, 0)),
            # w2 lags one phase behind w1 so at most one 4.2 MB block is in
            # flight at a time (see module docstring VMEM accounting)
            pl.BlockSpec((1, ffn_dim // 2, dim),
                         lambda d, p: (jnp.where(p == 1, d,
                                                 jnp.maximum(d - 1, 0)), 0, 0)),
            pl.BlockSpec((1, 1, dim),
                         lambda d, p: (jnp.where(p == 1, d,
                                                 jnp.maximum(d - 1, 0)), 0, 0)),
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
            pltpu.VMEM((b, ffn_dim), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, state, sp["vecs"], sp["mix_w"], sp["w1"]["q4c"], sp["w1"]["s4c"],
      sp["b1"], sp["w2"]["q4c"], sp["w2"]["s4c"])
    return y, new_state
