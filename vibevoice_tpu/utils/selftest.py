"""On-chip Pallas kernel self-test tier.

CPU interpret-mode tests structurally cannot catch Mosaic-legality or
miscompile bugs (r4 postmortem: the fused ConvNeXt kernel "had never
lowered on real Mosaic" — BlockSpec divisibility and a missing lax.erf
lowering hid behind interpret mode).  This tier lowers EVERY Pallas kernel
variant on the real chip at small-but-representative shapes and checks it
against an XLA/numpy reference; bench.py runs it in the default driver
bench and emits the results as ``selftest_*`` keys, making kernel health
driver-visible every round.

Each check returns a max relative error; a kernel that fails to lower (or
exceeds its tolerance) is reported by name so a regression cannot hide
behind a healthy aggregate RTF.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _rel(out, ref) -> float:
    o = np.asarray(out, np.float32)
    r = np.asarray(ref, np.float32)
    denom = np.abs(r).max() + 1e-9
    return float(np.abs(o - r).max() / denom)


def _check_flash_prefill(rs) -> float:
    from ..ops.attention import attend
    from ..ops.flash_attention import flash_attention
    b, t, hq, hkv, d = 2, 256, 4, 2, 128
    q = jnp.asarray(rs.randn(b, t, hq, d), jnp.bfloat16)
    k = jnp.asarray(rs.randn(b, t, hkv, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(b, t, hkv, d), jnp.bfloat16)
    kv_start = jnp.asarray([0, 64], jnp.int32)      # left-pad edge on row 1
    out = flash_attention(q, k, v, kv_start, causal=True, interpret=False)
    mask = np.zeros((b, t, t), bool)
    for bi, s0 in enumerate((0, 64)):
        for i in range(t):
            mask[bi, i, s0:i + 1] = True
    ref = attend(q.astype(jnp.float32), k.astype(jnp.float32),
                 v.astype(jnp.float32), mask=jnp.asarray(mask))
    # padded query rows (position < kv_start) have empty attention sets:
    # the kernel emits zeros, the XLA reference a uniform average — both
    # are ignored downstream, so compare the valid region only
    return max(_rel(out[0], ref[0]), _rel(out[1, 64:], ref[1, 64:]))


def _check_flash_cached(rs, q8: bool) -> float:
    from ..ops.flash_attention import (flash_attention_cached,
                                       flash_attention_cached_q8)
    b, chunk, hq, hkv, d, s = 1, 256, 6, 2, 128, 2048
    q = jnp.asarray(rs.randn(b, chunk, hq, d), jnp.bfloat16)
    kf = rs.randn(b, hkv, s, d).astype(np.float32)
    vf = rs.randn(b, hkv, s, d).astype(np.float32)
    kv_start = jnp.asarray([32], jnp.int32)
    q_off = jnp.int32(1024)
    if q8:
        ksc = np.abs(kf).max(-1) / 127.0
        vsc = np.abs(vf).max(-1) / 127.0
        k8 = jnp.asarray(np.round(kf / ksc[..., None]), jnp.int8)
        v8 = jnp.asarray(np.round(vf / vsc[..., None]), jnp.int8)
        out = flash_attention_cached_q8(
            q, k8, jnp.asarray(ksc), v8, jnp.asarray(vsc), kv_start, q_off,
            interpret=False)
        kf = np.asarray(k8, np.float32) * ksc[..., None]
        vf = np.asarray(v8, np.float32) * vsc[..., None]
    else:
        out = flash_attention_cached(q, jnp.asarray(kf, jnp.bfloat16),
                                     jnp.asarray(vf, jnp.bfloat16),
                                     kv_start, q_off, interpret=False)
    qf = np.asarray(q, np.float32)
    ref = np.zeros((b, chunk, hq, d), np.float32)
    for h in range(hq):
        kvh = h // (hq // hkv)
        sc = np.einsum("cd,sd->cs", qf[0, :, h], kf[0, kvh]) / np.sqrt(d)
        sc[:, :32] = -1e30
        for c in range(chunk):
            sc[c, 1024 + c + 1:] = -1e30
        p = np.exp(sc - sc.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref[0, :, h] = p @ vf[0, kvh]
    return _rel(out, ref)


def _check_flash_decode(rs, kv8: bool) -> float:
    from ..ops.flash_decode import (decode_attend_xla, flash_decode_attention,
                                    flash_decode_attention_q8, quantize_kv)
    b, hq, hkv, d, s_len = 2, 12, 2, 128, 1024
    q = jnp.asarray(rs.randn(b, hq, d), jnp.bfloat16)
    k = jnp.asarray(rs.randn(b, hkv, s_len, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(b, hkv, s_len, d), jnp.bfloat16)
    kv_start = jnp.asarray([0, 700], jnp.int32)     # live-range edges
    kv_len = jnp.asarray([1000, 705], jnp.int32)
    if kv8:
        k8, ks = quantize_kv(k)
        v8, vs = quantize_kv(v)
        out = flash_decode_attention_q8(q, k8, ks, v8, vs, kv_start, kv_len,
                                        interpret=False)
        ref = decode_attend_xla(q, {"q": k8, "s": ks}, {"q": v8, "s": vs},
                                kv_start, kv_len)
    else:
        out = flash_decode_attention(q, k, v, kv_start, kv_len,
                                     interpret=False)
        ref = decode_attend_xla(q, k, v, kv_start, kv_len)
    return _rel(out, ref)


def _check_int4c(rs, stacked: bool, w4a8: bool) -> float:
    from ..ops import int4
    l, inn, out_dim, rows = 3, 512, 1024, 4
    w = jnp.asarray(rs.randn(l, inn, out_dim).astype(np.float32) * 0.05)
    qw = int4.quantize_weight_int4c(w)
    x = jnp.asarray(rs.randn(rows, inn), jnp.bfloat16)
    old = int4._W4A8
    int4._W4A8 = w4a8
    try:
        if stacked:
            y = int4.int4c_matmul(x, {**qw, "_lyr": jnp.int32(1)},
                                  impl="pallas")
            ref = x.astype(jnp.float32) @ int4.dequantize_weight_int4c(
                {k: v[1] for k, v in qw.items()}, jnp.float32)
        else:
            qw1 = {k: v[1] for k, v in qw.items()}
            y = int4.int4c_matmul(x, qw1, impl="pallas")
            ref = x.astype(jnp.float32) @ int4.dequantize_weight_int4c(
                qw1, jnp.float32)
    finally:
        int4._W4A8 = old
    return _rel(y, ref)


def _check_int4_grouped(rs) -> float:
    from ..ops import int4
    inn, out_dim, rows = 512, 1024, 4
    w = jnp.asarray(rs.randn(inn, out_dim).astype(np.float32) * 0.05)
    qw = int4.quantize_weight_int4(w)
    x = jnp.asarray(rs.randn(rows, inn), jnp.bfloat16)
    y = int4.int4_matmul(x, qw, impl="pallas")
    ref = x.astype(jnp.float32) @ int4.dequantize_weight_int4(qw, jnp.float32)
    return _rel(y, ref)


def _check_convnext_stage(rs, a8: bool) -> float:
    from ..ops.convnext_stage import convnext_stage_step_int4c
    from ..ops.int4 import quantize_weight_int4c
    depth, b, k, c, ffn = 2, 2, 7, 512, 2048
    sp = {
        "vecs": jnp.asarray(rs.randn(depth, 6, c).astype(np.float32) * 0.1
                            + (np.arange(6) == 0)[None, :, None],
                            jnp.bfloat16),
        "mix_w": jnp.asarray(rs.randn(depth, k, c).astype(np.float32) * 0.1,
                             jnp.bfloat16),
        "b1": jnp.asarray(rs.randn(depth, 1, ffn).astype(np.float32) * 0.01,
                          jnp.bfloat16),
        "w1": quantize_weight_int4c(
            jnp.asarray(rs.randn(depth, c, ffn).astype(np.float32) * 0.02)),
        "w2": quantize_weight_int4c(
            jnp.asarray(rs.randn(depth, ffn, c).astype(np.float32) * 0.02)),
    }
    x = jnp.asarray(rs.randn(b, c), jnp.bfloat16)
    st = jnp.asarray(rs.randn(depth, b, k - 1, c).astype(np.float32) * 0.1,
                     jnp.bfloat16)
    y, _ = convnext_stage_step_int4c(x, st, sp, interpret=False, a8=a8)
    ref, _ = convnext_stage_step_int4c(
        x.astype(jnp.float32), st.astype(jnp.float32), sp, interpret=True,
        a8=False)
    return _rel(y, ref)


def _check_fused_omlp(rs) -> float:
    from ..ops import quant
    from ..ops.fused_mlp import fused_omlp_stacked
    from ..ops.int4 import quantize_weight_int4c
    from ..ops.norms import rms_norm
    l, h, f, b = 2, 1536, 8960, 2
    qo = quantize_weight_int4c(
        jnp.asarray(rs.randn(l, h, h).astype(np.float32) * 0.02))
    qgu = quantize_weight_int4c(
        jnp.asarray(rs.randn(l, h, 2 * f).astype(np.float32) * 0.02))
    qd = quantize_weight_int4c(
        jnp.asarray(rs.randn(l, f, h).astype(np.float32) * 0.02))
    nw = (jnp.asarray(rs.randn(h).astype(np.float32) * 0.1) + 1.0
          ).astype(jnp.bfloat16)
    attn = jnp.asarray(rs.randn(b, h) * 0.5, jnp.bfloat16)
    resid = jnp.asarray(rs.randn(b, h) * 0.5, jnp.bfloat16)
    out = fused_omlp_stacked(attn, resid, nw, qo, qgu, qd, jnp.int32(1),
                             eps=1e-6, interpret=False)
    view = lambda qq: {kk: vv[1] for kk, vv in qq.items()}
    x = resid + quant.qmatmul(attn, view(qo))
    y = rms_norm(x, nw, 1e-6)
    g, u = jnp.split(quant.qmatmul(y, view(qgu)), 2, axis=-1)
    ref = x + quant.qmatmul(jax.nn.silu(g) * u, view(qd))
    return _rel(out, ref)


def _check_resident_solver(rs) -> float:
    from ..config import DiffusionHeadConfig
    from ..models import diffusion_head
    from ..ops.diffusion_resident import resident_solver_sample
    from ..ops.quant import (fuse_diffusion_head_projections,
                             quantize_diffusion_head_params)
    from ..schedule.dpm_solver import (DPMSolverConfig, make_schedule,
                                       sample_with_solver)
    cfg = DiffusionHeadConfig(hidden_size=512, head_layers=2,
                              head_ffn_ratio=1.5, latent_size=64)
    p = diffusion_head.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    p["layers"]["ada"] = (jax.random.normal(
        jax.random.PRNGKey(1), p["layers"]["ada"].shape) * 0.05
    ).astype(jnp.bfloat16)
    p["final_linear"] = (jax.random.normal(
        jax.random.PRNGKey(2), p["final_linear"].shape) * 0.05
    ).astype(jnp.bfloat16)
    p = quantize_diffusion_head_params(p, bits=4, colscale=True)
    p = fuse_diffusion_head_projections(p)
    sched = make_schedule(DPMSolverConfig(
        algorithm_type="sde-dpmsolver++", solver_order=2,
        prediction_type="v_prediction", beta_schedule="cosine"), 4)
    b, dd = 1, 64
    cond2 = jax.random.normal(jax.random.PRNGKey(3), (2 * b, 512),
                              jnp.bfloat16)
    lm, fm = diffusion_head.precompute_modulations(
        p, cfg, jnp.asarray(np.asarray(sched.timesteps)), cond2)
    x_t = jax.random.normal(jax.random.PRNGKey(4), (b, dd), jnp.float32)
    k_rows = jax.random.split(jax.random.PRNGKey(5), b)
    cfg_scale = jnp.float32(1.3)

    def denoise(x, t, i):
        xx = jnp.concatenate([x, x], axis=0).astype(jnp.bfloat16)
        o = diffusion_head.apply_with_mods(p, cfg, xx, lm[i], fm[i])
        c, u = o[:b].astype(jnp.float32), o[b:].astype(jnp.float32)
        return u + cfg_scale * (c - u)

    ref = sample_with_solver(sched, denoise, x_t, rng=k_rows, with_index=True)
    nkeys = jnp.swapaxes(
        jax.vmap(lambda k: jax.random.split(k, sched.num_steps))(k_rows), 0, 1)
    z = jax.vmap(jax.vmap(
        lambda k: jax.random.normal(k, (dd,), jnp.float32)))(nkeys)
    out = resident_solver_sample(p, sched, x_t, lm, fm, z, cfg_scale,
                                 eps=cfg.rms_norm_eps, interpret=False)
    return _rel(out, ref)


def _check_w8a8(rs) -> float:
    from ..ops import quant
    w = jnp.asarray(rs.randn(512, 1024).astype(np.float32) * 0.05)
    qw = quant.quantize_weight(w)
    x = jnp.asarray(rs.randn(4, 512), jnp.bfloat16)
    with quant.w8a8_scope(True):
        y = quant.qmatmul(x, qw)
    ref = x.astype(jnp.float32) @ quant.dequantize_weight(qw, jnp.float32)
    return _rel(y, ref)


# name -> (callable(rs) -> max_rel_err, tolerance)
CHECKS: Dict[str, Tuple] = {
    "flash_prefill": (_check_flash_prefill, 0.02),
    "flash_cached": (lambda rs: _check_flash_cached(rs, q8=False), 0.02),
    "flash_cached_q8": (lambda rs: _check_flash_cached(rs, q8=True), 0.03),
    "flash_decode": (lambda rs: _check_flash_decode(rs, kv8=False), 0.02),
    "flash_decode_kv8": (lambda rs: _check_flash_decode(rs, kv8=True), 0.02),
    "int4c_2d": (lambda rs: _check_int4c(rs, False, False), 0.02),
    "int4c_stacked": (lambda rs: _check_int4c(rs, True, False), 0.02),
    "int4c_w4a8_2d": (lambda rs: _check_int4c(rs, False, True), 0.05),
    "int4c_w4a8_stacked": (lambda rs: _check_int4c(rs, True, True), 0.05),
    "int4_grouped": (_check_int4_grouped, 0.02),
    "w8a8_dot": (_check_w8a8, 0.05),
    "convnext_stage": (lambda rs: _check_convnext_stage(rs, a8=False), 0.05),
    "convnext_stage_a8": (lambda rs: _check_convnext_stage(rs, a8=True), 0.08),
    "fused_omlp": (_check_fused_omlp, 0.03),
    "resident_solver": (_check_resident_solver, 0.03),
}


def run_selftest(verbose: bool = False) -> dict:
    """Lower + parity-check every Pallas kernel variant on the current
    backend.  Returns {"selftest_pass": n, "selftest_total": n,
    "selftest_fail": [names], "selftest_max_rel": worst} — bench.py merges
    these into the driver JSON line."""
    results, fails = {}, []
    worst = 0.0
    for name, (fn, tol) in CHECKS.items():
        rs = np.random.RandomState(7)
        try:
            err = fn(rs)
            results[name] = err
            worst = max(worst, err)
            if not (err <= tol):
                fails.append(f"{name}:rel={err:.4f}>tol={tol}")
        except Exception as e:  # noqa: BLE001 — lowering failure IS the signal
            results[name] = None
            fails.append(f"{name}:{type(e).__name__}")
        if verbose:
            print(f"  selftest {name}: {results[name]}")
    return {
        "selftest_pass": sum(1 for n, (f, t) in CHECKS.items()
                             if results.get(n) is not None
                             and results[n] <= t),
        "selftest_total": len(CHECKS),
        "selftest_fail": fails,
        "selftest_max_rel": round(worst, 5),
    }
