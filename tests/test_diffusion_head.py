"""Diffusion head: zero-init contract + shapes + connector."""

import numpy as np

import jax
import jax.numpy as jnp

from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.models import connectors, diffusion_head

CFG = VibeVoiceConfig.named("tiny").diffusion_head


def test_zero_init_output_is_zero():
    """AdaLN + output zero-init (reference diffusion_head.py:240-252) means an
    untrained head returns exactly zeros regardless of inputs."""
    params = diffusion_head.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    noisy = jnp.ones((5, CFG.latent_size))
    t = jnp.asarray([0.0, 1.0, 10.0, 50.0, 99.0])
    cond = jnp.ones((5, CFG.hidden_size))
    out = diffusion_head.apply(params, CFG, noisy, t, cond)
    assert out.shape == (5, CFG.latent_size)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_nonzero_after_perturbation():
    params = diffusion_head.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    params["final_linear"] = jnp.ones_like(params["final_linear"]) * 0.1
    out = diffusion_head.apply(params, CFG, jnp.ones((2, CFG.latent_size)),
                               jnp.asarray([1.0, 2.0]), jnp.ones((2, CFG.hidden_size)))
    assert np.abs(np.asarray(out)).max() > 0


def test_timestep_embedding_matches_reference_formula():
    import math
    dim, t = 16, jnp.asarray([3.0])
    emb = np.asarray(diffusion_head.timestep_embedding(t, dim))
    half = dim // 2
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    expected = np.concatenate([np.cos(3.0 * freqs), np.sin(3.0 * freqs)])
    np.testing.assert_allclose(emb[0], expected, rtol=1e-5)


def test_precomputed_modulations_match_apply():
    """The hoisted-AdaLN path (precompute_modulations + apply_with_mods) is
    numerically identical to apply() at every solver timestep — including
    with a quantized ada (the int8 head tier)."""
    from vibevoice_tpu.ops.quant import quantize_diffusion_head_params

    rs = np.random.RandomState(3)
    params = diffusion_head.init_params(jax.random.PRNGKey(2), CFG, jnp.float32)
    params["layers"]["ada"] = jnp.asarray(
        rs.randn(*params["layers"]["ada"].shape) * 0.05, jnp.float32)
    params["final_ada"] = jnp.asarray(
        rs.randn(*params["final_ada"].shape) * 0.05, jnp.float32)
    params["final_linear"] = jnp.asarray(
        rs.randn(*params["final_linear"].shape) * 0.05, jnp.float32)

    n, S = 4, 5
    cond = jnp.asarray(rs.randn(n, CFG.hidden_size), jnp.float32)
    timesteps = jnp.asarray([99.0, 75.0, 50.0, 25.0, 1.0])
    for p in (params, quantize_diffusion_head_params(params)):
        lm, fm = diffusion_head.precompute_modulations(p, CFG, timesteps, cond)
        assert lm.shape[:2] == (S, CFG.head_layers) and fm.shape[0] == S
        for i in range(S):
            noisy = jnp.asarray(rs.randn(n, CFG.latent_size), jnp.float32)
            ref = diffusion_head.apply(p, CFG, noisy,
                                       jnp.full((n,), timesteps[i]), cond)
            out = diffusion_head.apply_with_mods(p, CFG, noisy, lm[i], fm[i])
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-5, atol=1e-6)


def test_connector_shapes():
    p = connectors.init_params(jax.random.PRNGKey(1), 8, 32, jnp.float32)
    y = connectors.apply(p, jnp.ones((2, 3, 8)))
    assert y.shape == (2, 3, 32)
