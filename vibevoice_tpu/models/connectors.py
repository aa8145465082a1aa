"""Speech connectors: VAE latent dim -> LM hidden dim.

Functional port of the reference ``SpeechConnector`` (modeling_vibevoice.py:58-69):
fc1 -> RMSNorm(eps=1e-6) -> fc2, biases included.
"""

import jax
import jax.numpy as jnp

from ..ops.norms import rms_norm


def init_params(rng: jax.Array, in_dim: int, out_dim: int, dtype=jnp.bfloat16,
                std: float = 0.02) -> dict:
    k1, k2 = jax.random.split(rng)
    n = lambda k, shape: (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)
    return {
        "fc1_w": n(k1, (in_dim, out_dim)),
        "fc1_b": jnp.zeros((out_dim,), dtype),
        "norm": jnp.ones((out_dim,), dtype),
        "fc2_w": n(k2, (out_dim, out_dim)),
        "fc2_b": jnp.zeros((out_dim,), dtype),
    }


def apply(params: dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    x = x @ params["fc1_w"] + params["fc1_b"]
    x = rms_norm(x, params["norm"], eps)
    return x @ params["fc2_w"] + params["fc2_b"]
