"""VMEM-resident multi-iteration diffusion-head solver kernel.

The per-token diffusion loop evaluates the AdaLN head's FFN stack once per
solver iteration; the FFN weights are x-dependent (unhoistable), so the
XLA scan re-streams them from HBM every iteration — ~4/5 of the int4
tier's diffusion-stage bytes are these re-reads (r5 stage table:
247 MB/step modeled, 170 MB of it repeat FFN traffic), and the r5
microbench proved the stage sits at the pure-DMA wall (all compute hides
behind the weight streams).  The only way to go faster is to stop
re-reading: this kernel runs ALL solver iterations in ONE pallas_call
whose weight operands are whole-array blocks with constant index maps —
loaded into VMEM once, revisited from VMEM each iteration.  The head's
packed int4c FFN stack (~43 MB at 1.5B scale) fits VMEM with room for
activations.

Everything else about the iteration is faithfully inlined:
  - the denoise pass is models/diffusion_head.apply_with_mods (AdaLN
    modulations precomputed outside, reference
    modular_vibevoice_diffusion_head.py:200-230) with the W4A16 int4c
    matmul algebra of ops/int4._int4c_kernel;
  - classifier-free guidance mixes the doubled batch exactly as
    generate.py's denoise closure does (inference:695-708);
  - the solver update is schedule/dpm_solver.solver_step with
    thresholding off, its per-iteration coefficients passed as a small
    f32 operand (uniform formula — unused coefficients are zero);
  - SDE noise draws are precomputed outside from the same per-row key
    splits sample_with_solver makes, preserving the row-determinism
    contract.

The solver loop (S iterations x L layers) is unrolled in Python: the
grid is (1,) and Mosaic sees one straight-line program over VMEM-resident
operands.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _mm4_full

_RESIDENT_DEFAULT = os.environ.get("VIBEVOICE_RESIDENT_HEAD", "1") == "1"
# packed-weight budget for VMEM residency (v5e VMEM is 128 MB; leave room
# for modulations, activations and the compiler's own buffers)
_VMEM_BUDGET = 80 * 1024 * 1024


def set_resident_head(enabled: bool) -> None:
    global _RESIDENT_DEFAULT
    _RESIDENT_DEFAULT = bool(enabled)


def _is_int4c(leaf) -> bool:
    from .int4 import is_quantized_int4c
    return (isinstance(leaf, dict) and is_quantized_int4c(leaf)
            and leaf["q4c"].ndim == 3)


def resident_solver_eligible(head_layers: dict, sched, noisy_proj,
                             final_linear, rows2: int) -> bool:
    """True when the whole solver loop can run as one resident kernel:
    int4c-stacked FFN leaves, thresholding off, shapes lane-aligned, and
    the packed stack under the VMEM budget.  ``rows2`` is the CFG-doubled
    row count the head sees."""
    if not _RESIDENT_DEFAULT or rows2 > 16:
        return False
    if float(np.asarray(sched.thresh)[0]) >= 0:        # dynamic thresholding
        return False
    if not (_is_int4c(head_layers.get("wgu")) and _is_int4c(head_layers.get("wd"))):
        return False
    if isinstance(noisy_proj, dict) or isinstance(final_linear, dict):
        return False
    lq, gq = head_layers["wd"]["q4c"], head_layers["wgu"]["q4c"]
    l, f2, h = lq.shape
    if h % 256 or f2 % 128 or gq.shape != (l, h // 2, 4 * f2):
        return False
    from .int4 import current_impl
    impl = current_impl()
    if impl == "xla":
        return False
    if impl == "auto" and jax.default_backend() != "tpu":
        return False
    return gq.size + lq.size <= _VMEM_BUDGET


def _resident_kernel(coef_ref, x_ref, noise_ref, np_ref, fl_ref, norm_ref,
                     lm_ref, fm_ref, gq_ref, gs_ref, dq_ref, ds_ref, o_ref,
                     mp_scr, mp2_scr,
                     *, s_steps: int, n_layers: int, h: int, f: int,
                     eps: float, b: int):
    """coef: [S, 16] f32 solver coefficients (+ cfg_scale in col 11);
    x: [B, D] f32; noise: [S, B, D] f32; np: [D, H] bf16; fl: [H, D] bf16;
    norm: [L, H] bf16; lm: [S, L, 2B, 3H] bf16; fm: [S, 2B, 2H] bf16;
    gq/gs: wgu int4c stack; dq/ds: wd int4c stack. Out: [B, D] f32."""
    h2, f2 = h // 2, f // 2
    x0 = x_ref[...]

    # fori_loops (not Python unrolling) over iterations AND layers: the
    # unrolled 20-FFN straight-line version made Mosaic's register
    # allocator reserve per-instance spill slots for every big temporary
    # (164 MB of VMEM spill — compile OOM); loop bodies reuse one set.
    # multistep history lives in scratch, not the fori carry: a zeros-init
    # carry gets a replicated vector layout Mosaic cannot reconcile with
    # the loop body's concrete one (invalid-relayout compile error)
    mp_scr[...] = jnp.zeros_like(mp_scr)
    mp2_scr[...] = jnp.zeros_like(mp2_scr)

    def one_iter(i, x):
        m_prev = mp_scr[...]
        m_prev2 = mp2_scr[...]
        # ---- denoise (apply_with_mods, bf16 serving dtype rounds) ----
        xx = jnp.concatenate([x, x], axis=0).astype(jnp.bfloat16)
        # Mosaic requires 32-bit matmul accumulators; round to bf16 after
        # (matches XLA's f32-accumulate + bf16-result dot)
        xc = jnp.dot(xx, np_ref[...],
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def one_layer(l, xc):
            mod = lm_ref[i, l]                              # [2B, 3H] bf16
            shift, scale, gate = mod[:, :h], mod[:, h:2 * h], mod[:, 2 * h:]
            xf = xc.astype(jnp.float32)
            normed = (xf * jax.lax.rsqrt(
                jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
            ).astype(jnp.bfloat16) * norm_ref[l, 0][None, :]
            y = normed * (1 + scale) + shift
            gu = _mm4_full(y[:, :h2], y[:, h2:], gq_ref[l],
                           gs_ref[l]).astype(jnp.bfloat16)
            g, u = gu[:, :f], gu[:, f:]
            act = (jax.nn.silu(g.astype(jnp.float32))
                   * u.astype(jnp.float32)).astype(jnp.bfloat16)
            d = _mm4_full(act[:, :f2], act[:, f2:], dq_ref[l],
                          ds_ref[l]).astype(jnp.bfloat16)
            return xc + gate * d

        xc = jax.lax.fori_loop(0, n_layers, one_layer, xc)
        fmod = fm_ref[i]                                    # [2B, 2H]
        fshift, fscale = fmod[:, :h], fmod[:, h:]
        xf = xc.astype(jnp.float32)
        fr = (xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        ).astype(jnp.bfloat16)
        out = jnp.dot(fr * (1 + fscale) + fshift, fl_ref[...],
                      preferred_element_type=jnp.float32
                      ).astype(jnp.bfloat16)                 # [2B, D]

        # ---- CFG mix (generate.py denoise closure) ----
        c = out[:b].astype(jnp.float32)
        u_ = out[b:].astype(jnp.float32)
        cf = lambda k: coef_ref[i, k]          # SMEM scalar read
        mo = u_ + cf(11) * (c - u_)

        # ---- solver_step (thresholding off; unused coeffs are 0) ----
        m = cf(0) * x + cf(1) * mo
        d1_0 = (m - m_prev) * cf(6)
        d1_1 = (m_prev - m_prev2) * cf(8)
        d1 = d1_0 + cf(9) * (d1_0 - d1_1)
        d2 = cf(10) * (d1_0 - d1_1)
        x = (cf(2) * x + cf(3) * m + cf(4) * d1
             + cf(7) * d2 + cf(5) * noise_ref[i])
        mp2_scr[...] = m_prev
        mp_scr[...] = m
        return x

    o_ref[...] = jax.lax.fori_loop(0, s_steps, one_iter, x0)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _resident_call(coef, x_t, noise, noisy_proj, final_linear, norms,
                   layer_mods, final_mods, gq, gs, dq, ds,
                   eps: float, interpret: bool = False):
    s_steps, n_layers = layer_mods.shape[:2]
    b, d = x_t.shape
    l, f2, h = dq.shape
    f = 2 * f2
    # [L, 1, H]: leading (untiled) dim so the layer fori_loop can
    # dynamic-index it — dynamic SUBLANE indexing needs static alignment
    # proofs Mosaic can't make for loop indices.  Coefficients go to SMEM
    # (scalar memory): per-iteration scalar reads from VMEM lower to
    # vector relayouts Mosaic rejects.
    norms = norms.reshape(l, 1, h)
    kernel = functools.partial(
        _resident_kernel, s_steps=s_steps, n_layers=n_layers, h=h, f=f,
        eps=eps, b=b)
    whole = lambda shape: pl.BlockSpec(shape, lambda _: tuple(0 for _ in shape))
    smem = lambda shape: pl.BlockSpec(shape, lambda _: tuple(0 for _ in shape),
                                      memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[smem(coef.shape), whole(x_t.shape), whole(noise.shape),
                  whole(noisy_proj.shape), whole(final_linear.shape),
                  whole(norms.shape), whole(layer_mods.shape),
                  whole(final_mods.shape), whole(gq.shape), whole(gs.shape),
                  whole(dq.shape), whole(ds.shape)],
        out_specs=whole((b, d)),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, d), jnp.float32),
                        pltpu.VMEM((b, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the resident weights are the point: operands + the loop
            # body's working set far exceed the default 16 MB scoped limit
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(coef, x_t, noise, noisy_proj, final_linear, norms, layer_mods,
      final_mods, gq, gs, dq, ds)


def solver_coefficients(sched, cfg_scale) -> jax.Array:
    """Pack the schedule's per-iteration scalars (+ cfg_scale) into the
    [S, 16] f32 coefficient operand the kernel reads.  Column order matches
    _resident_kernel: cvt_x, cvt_m, c_x, c_d0, c_d1, c_noise, inv_r0,
    c_d2, inv_r1, w01, inv_r01, cfg_scale."""
    s = sched.num_steps
    cols = np.zeros((s, 16), np.float32)
    for j, a in enumerate((sched.cvt_x, sched.cvt_m, sched.c_x, sched.c_d0,
                           sched.c_d1, sched.c_noise, sched.inv_r0,
                           sched.c_d2, sched.inv_r1, sched.w01,
                           sched.inv_r01)):
        cols[:, j] = np.asarray(a)[:s]
    # cfg_scale is traced at generate time (one program serves any scale)
    return jnp.asarray(cols).at[:, 11].set(jnp.float32(cfg_scale))


def resident_solver_sample(head_params: dict, sched, x_t: jax.Array,
                           layer_mods: jax.Array, final_mods: jax.Array,
                           noise: jax.Array, cfg_scale, eps: float,
                           interpret: bool = False) -> jax.Array:
    """Drop-in for sample_with_solver over the serving denoise closure.

    x_t: [B, D] f32 initial latent; layer_mods [S, L, 2B, 3H] /
    final_mods [S, 2B, 2H] from diffusion_head.precompute_modulations;
    noise [S, B, D] f32 pre-drawn SDE noise (same draws sample_with_solver
    would make).  Returns the final latent [B, D] f32."""
    lw = head_params["layers"]
    coef = solver_coefficients(sched, cfg_scale)
    return _resident_call(
        coef, x_t.astype(jnp.float32), noise.astype(jnp.float32),
        head_params["noisy_proj"], head_params["final_linear"], lw["norm"],
        layer_mods, final_mods, lw["wgu"]["q4c"], lw["wgu"]["s4c"],
        lw["wd"]["q4c"], lw["wd"]["s4c"], eps=eps, interpret=interpret)
