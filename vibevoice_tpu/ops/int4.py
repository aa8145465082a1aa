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

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 16

# 'auto' = Pallas on TPU, XLA elsewhere. Meshed serving sets 'xla' (GSPMD
# cannot partition a pallas_call; the dequant+dot lowers fine sharded).
_IMPL = os.environ.get("VIBEVOICE_INT4_IMPL", "auto")


def set_impl(impl: str) -> None:
    """'auto' | 'pallas' | 'xla' — trace-time dispatch for int4 matmuls.
    Process-global: creating a meshed generator pins 'xla'."""
    global _IMPL
    assert impl in ("auto", "pallas", "xla"), impl
    _IMPL = impl


def is_quantized_int4(leaf: Any) -> bool:
    return isinstance(leaf, dict) and set(leaf.keys()) == {"q4", "s4"}


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
    multiple of 8 scale rows (sublane rule)."""
    bp = 0
    for cand in (512, 384, 256, 128):
        if half % cand == 0 and cand % (8 * gs) == 0:
            bp = cand
            break
    bo = 0
    for cand in (512, 256, 128):
        if out % cand == 0:
            bo = cand
            break
    return (bp, bo) if bp and bo else None


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
        out_shape=jax.ShapeDtypeStruct((m, out), jnp.float32),
        interpret=interpret,
    )(x, x, q4, s4, s4)
    return out_arr


def int4_matmul(x: jax.Array, qw: Dict[str, jax.Array]) -> jax.Array:
    """x @ W for an int4-packed weight; x: [..., in]. Output in x.dtype."""
    *lead, inn = x.shape
    half, out = qw["q4"].shape[-2:]
    gs = inn // qw["s4"].shape[-2]

    impl = _IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas" and (qw["q4"].ndim != 2 or _plan(half, out, gs) is None):
        impl = "xla"
    if impl == "xla":
        w = dequantize_weight_int4(qw, x.dtype)
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)

    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, inn)
    pad = 0
    if m > 256 and m % 256 != 0:
        pad = 256 - m % 256
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    y = _int4_matmul_2d(x2, qw["q4"], qw["s4"])
    if pad:
        y = y[:m]
    return y.reshape(*lead, out).astype(x.dtype)
