"""Training-time diffusion timestep samplers.

Functional equivalents of the reference samplers
(reference: vibevoice/schedule/timestep_sampler.py:5-18).
"""

import jax
import jax.numpy as jnp


def uniform_sample(rng: jax.Array, shape, num_timesteps: int, mu=None, sigma=None):
    """Uniform integer timesteps in [0, num_timesteps)."""
    return jax.random.randint(rng, shape, 0, num_timesteps)


def logit_normal_sample(rng: jax.Array, shape, num_timesteps: int, mu: float = 0.0, sigma: float = 1.0):
    """Logit-normal distributed timesteps: sigmoid(N(mu, sigma)) * T, as integers."""
    z = jax.random.normal(rng, shape) * sigma + mu
    t = jax.nn.sigmoid(z) * num_timesteps
    return jnp.clip(t.astype(jnp.int32), 0, num_timesteps - 1)
