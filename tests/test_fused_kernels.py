"""Parity tests for the r5 decode-path fused kernels.

- ops/fused_mlp.fused_omlp_stacked: one pallas call vs the unfused
  o-proj + RMSNorm + SwiGLU composition it replaces
  (models/qwen2.py:310-313).
- ops/diffusion_resident.resident_solver_sample: the whole solver loop
  in one VMEM-resident call vs schedule.dpm_solver.sample_with_solver
  over the serving denoise closure (generate.py stage_diffusion).

Both run in Pallas interpret mode on the CPU mesh; the on-chip Mosaic
lowering of the same kernels is gated by bench.py --selftest.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibevoice_tpu.config import DiffusionHeadConfig
from vibevoice_tpu.models import diffusion_head
from vibevoice_tpu.ops import quant
from vibevoice_tpu.ops.fused_mlp import (_plan, fused_omlp_eligible,
                                         fused_omlp_stacked)
from vibevoice_tpu.ops.diffusion_resident import (resident_solver_eligible,
                                                  resident_solver_sample)
from vibevoice_tpu.ops.int4 import quantize_weight_int4c
from vibevoice_tpu.ops.norms import rms_norm
from vibevoice_tpu.ops.quant import (fuse_diffusion_head_projections,
                                     quantize_diffusion_head_params)
from vibevoice_tpu.schedule.dpm_solver import (DPMSolverConfig, make_schedule,
                                               sample_with_solver)


def _stacks(rs, L, H, F):
    wo = jnp.asarray(rs.randn(L, H, H).astype(np.float32) * 0.02)
    wg = jnp.asarray(rs.randn(L, H, F).astype(np.float32) * 0.02)
    wu = jnp.asarray(rs.randn(L, H, F).astype(np.float32) * 0.02)
    wd = jnp.asarray(rs.randn(L, F, H).astype(np.float32) * 0.02)
    return (quantize_weight_int4c(wo),
            quantize_weight_int4c(jnp.concatenate([wg, wu], axis=-1)),
            quantize_weight_int4c(wd))


@pytest.mark.parametrize("shapes", [(1536, 8960, 2), (512, 1792, 4)])
def test_fused_omlp_matches_unfused(shapes):
    H, F, B = shapes
    assert _plan(H, F) is not None, "plan must exist for tested shapes"
    L = 3
    rs = np.random.RandomState(0)
    qo, qgu, qd = _stacks(rs, L, H, F)
    nw = (jnp.asarray(rs.randn(L, H).astype(np.float32) * 0.1) + 1.0
          ).astype(jnp.bfloat16)
    attn = jnp.asarray(rs.randn(B, H).astype(np.float32) * 0.5
                       ).astype(jnp.bfloat16)
    resid = jnp.asarray(rs.randn(B, H).astype(np.float32) * 0.5
                        ).astype(jnp.bfloat16)
    for lyr in range(L):
        qov = {k: qo[k][lyr] for k in ("q4c", "s4c")}
        qguv = {k: qgu[k][lyr] for k in ("q4c", "s4c")}
        qdv = {k: qd[k][lyr] for k in ("q4c", "s4c")}
        x = resid + quant.qmatmul(attn, qov)
        y = rms_norm(x, nw[lyr], 1e-6)
        g, u = jnp.split(quant.qmatmul(y, qguv), 2, axis=-1)
        ref = x + quant.qmatmul(jax.nn.silu(g) * u, qdv)

        out = fused_omlp_stacked(attn, resid, nw[lyr], qo, qgu, qd,
                                 jnp.int32(lyr), eps=1e-6, interpret=True)
        ref32 = np.asarray(ref, np.float32)
        err = np.abs(np.asarray(out, np.float32) - ref32)
        assert err.max() / (np.abs(ref32).max() + 1e-9) < 0.02, (lyr, err.max())


def test_fused_omlp_eligibility_requires_stacked_int4c():
    H, F = 1536, 8960
    rs = np.random.RandomState(1)
    qo, qgu, qd = _stacks(rs, 2, H, F)
    view = lambda leaf: {**leaf, "_lyr": jnp.int32(0)}
    from vibevoice_tpu.ops.int4 import impl_scope
    with impl_scope("interpret"):
        lp = {"wo": view(qo), "wgu": view(qgu), "wd": view(qd)}
        assert fused_omlp_eligible(lp, 2, H)
        assert not fused_omlp_eligible(lp, 64, H)          # row cap
        assert not fused_omlp_eligible({**lp, "wd": qd["q4c"]}, 2, H)
    with impl_scope("xla"):
        assert not fused_omlp_eligible(lp, 2, H)


def _head_setup(S=5, algorithm="sde-dpmsolver++", order=2):
    cfg = DiffusionHeadConfig(hidden_size=512, head_layers=3,
                              head_ffn_ratio=1.5, latent_size=64)
    p = diffusion_head.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    for k, kk in ((1, "final_ada"), (3, "final_linear")):
        p[kk] = (jax.random.normal(jax.random.PRNGKey(k), p[kk].shape,
                                   jnp.float32) * 0.05).astype(jnp.bfloat16)
    p["layers"]["ada"] = (jax.random.normal(
        jax.random.PRNGKey(2), p["layers"]["ada"].shape,
        jnp.float32) * 0.05).astype(jnp.bfloat16)
    p = quantize_diffusion_head_params(p, bits=4, colscale=True)
    p = fuse_diffusion_head_projections(p)
    scfg = DPMSolverConfig(num_train_timesteps=1000, beta_schedule="cosine",
                           prediction_type="v_prediction",
                           algorithm_type=algorithm, solver_order=order)
    return cfg, p, make_schedule(scfg, S)


@pytest.mark.parametrize("algorithm,order",
                         [("sde-dpmsolver++", 2), ("dpmsolver++", 2),
                          ("dpmsolver++", 3)])
def test_resident_solver_matches_scan(algorithm, order):
    cfg, p, sched = _head_setup(algorithm=algorithm, order=order)
    S, b, D = sched.num_steps, 2, 64
    from vibevoice_tpu.ops.int4 import impl_scope
    with impl_scope("interpret"):
        assert resident_solver_eligible(p["layers"], sched, p["noisy_proj"],
                                        p["final_linear"], 2 * b)
    cond2 = jax.random.normal(jax.random.PRNGKey(4), (2 * b, 512),
                              jnp.bfloat16)
    lm, fm = diffusion_head.precompute_modulations(
        p, cfg, jnp.asarray(np.asarray(sched.timesteps)), cond2)
    cfg_scale = jnp.float32(1.3)
    x_t = jax.random.normal(jax.random.PRNGKey(5), (b, D), jnp.float32)
    k_rows = jax.random.split(jax.random.PRNGKey(6), b)

    def denoise(x, t, i):
        xx = jnp.concatenate([x, x], axis=0).astype(jnp.bfloat16)
        out = diffusion_head.apply_with_mods(p, cfg, xx, lm[i], fm[i])
        c, u = out[:b].astype(jnp.float32), out[b:].astype(jnp.float32)
        return u + cfg_scale * (c - u)

    ref = sample_with_solver(sched, denoise, x_t, rng=k_rows, with_index=True)
    nkeys = jnp.swapaxes(jax.vmap(lambda k: jax.random.split(k, S))(k_rows),
                         0, 1)
    z = jax.vmap(jax.vmap(lambda k: jax.random.normal(k, (D,), jnp.float32))
                 )(nkeys)
    res = resident_solver_sample(p, sched, x_t, lm, fm, z, cfg_scale,
                                 eps=cfg.rms_norm_eps, interpret=True)
    ref32 = np.asarray(ref, np.float32)
    err = np.abs(np.asarray(res) - ref32)
    assert err.max() / (np.abs(ref32).max() + 1e-9) < 0.02, err.max()


def test_resident_solver_ineligible_cases():
    cfg, p, sched = _head_setup()
    from vibevoice_tpu.ops.int4 import impl_scope
    ok = (p["layers"], sched, p["noisy_proj"], p["final_linear"])
    with impl_scope("interpret"):
        assert resident_solver_eligible(*ok, 2)
        assert not resident_solver_eligible(*ok, 32)       # row cap
        bad_sched = sched._replace(
            thresh=np.asarray([0.995, 1.0], np.float32))
        assert not resident_solver_eligible(
            p["layers"], bad_sched, p["noisy_proj"], p["final_linear"], 2)
        dense = dict(p["layers"])
        dense["wgu"] = jnp.zeros((3, 512, 1536), jnp.bfloat16)
        assert not resident_solver_eligible(dense, sched, p["noisy_proj"],
                                            p["final_linear"], 2)
    with impl_scope("xla"):
        assert not resident_solver_eligible(*ok, 2)
