"""AdaLN diffusion head.

Functional port of the reference's 4-layer conditioned MLP denoiser
(reference: modular_vibevoice_diffusion_head.py:48-280): sinusoidal timestep
embedder -> per-layer AdaLN (shift/scale/gate from condition) around a SwiGLU
FFN -> AdaLN final projection.  AdaLN and output weights are zero-initialized
(reference :240-252) so an untrained head is the identity flow.

This whole network is a handful of [B, H] matmuls — at inference it runs inside
the per-token diffusion ``lax.scan`` with a doubled (CFG) batch, which is
exactly the batched-small-matmul regime the MXU handles well.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np

from ..config import DiffusionHeadConfig
from ..ops.norms import rms_norm
from ..ops.quant import layer_view, qmatmul, split_stacked_quant


def init_params(rng: jax.Array, cfg: DiffusionHeadConfig, dtype=jnp.bfloat16) -> dict:
    h, f, lat = cfg.hidden_size, cfg.ffn_dim, cfg.latent_size
    L = cfg.head_layers
    keys = jax.random.split(rng, 8)
    n = lambda k, shape, std=0.02: (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)
    return {
        "noisy_proj": n(keys[0], (lat, h)),
        "cond_proj": n(keys[1], (h, h)),
        "t_mlp1": n(keys[2], (cfg.freq_embed_size, h)),
        "t_mlp2": n(keys[3], (h, h)),
        "layers": {
            "norm": jnp.ones((L, h), dtype),
            "ada": jnp.zeros((L, h, 3 * h), dtype),      # zero-init AdaLN
            "wg": n(keys[4], (L, h, f)),
            "wu": n(keys[5], (L, h, f)),
            "wd": n(keys[6], (L, f, h)),
        },
        "final_ada": jnp.zeros((h, 2 * h), dtype),
        "final_linear": jnp.zeros((h, lat), dtype),       # zero-init output
    }


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding, [N] -> [N, dim] (cos first, then sin —
    reference modular_vibevoice_diffusion_head.py:80-88).

    Two accuracy traps measured against the torch reference (r5):
    (1) the DEVICE exp builds the frequency table with ~4.5e-6 relative
    error, which t ~ 1000 amplifies to ~1.3e-3 rad of phase — the root of
    a ~0.3-1% systematic head-output drift; the table is static, so it is
    built host-side in f64 and embedded as an f32 constant.  (2) backends
    with fast sin/cos range reduction lose precision at 1000-rad
    arguments; a two-constant Cody-Waite reduction folds them into
    [-pi, pi] exactly in f32 first."""
    half = dim // 2
    freqs = jnp.asarray(np.exp(
        -math.log(max_period) * np.arange(half, dtype=np.float64) / half
    ).astype(np.float32))
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    two_pi_hi = jnp.float32(6.28125)               # few significand bits
    two_pi_lo = jnp.float32(2.0 * math.pi - 6.28125)
    k = jnp.round(args / jnp.float32(2.0 * math.pi))
    r = (args - k * two_pi_hi) - k * two_pi_lo
    emb = jnp.concatenate([jnp.cos(r), jnp.sin(r)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def precompute_modulations(params: dict, cfg: DiffusionHeadConfig,
                           timesteps: jax.Array, condition: jax.Array):
    """Hoist the x-independent AdaLN work out of the solver loop.

    The conditioning ``c = cond_proj(condition) + t_emb(t)`` and every AdaLN
    modulation (per-layer shift/scale/gate and the final shift/scale) depend
    only on (condition, t) — NOT on the noisy latent — yet the ada weights
    are ~half the head's bytes.  Computing them once for all S solver
    timesteps means the solver scan re-reads only the x-dependent FFN
    weights per iteration (the head is weight-bandwidth-bound).

    timesteps: [S], condition: [N, H] ->
      (layer_mods [S, L, N, 3H], final_mods [S, N, 2H])
    """
    dtype = condition.dtype
    t_emb = timestep_embedding(timesteps, cfg.freq_embed_size).astype(dtype)
    t_emb = jax.nn.silu(t_emb @ params["t_mlp1"]) @ params["t_mlp2"]   # [S, H]
    cp = condition @ params["cond_proj"]                               # [N, H]
    sc = jax.nn.silu(cp[None, :, :] + t_emb[:, None, :])               # [S, N, H]

    ada = params["layers"]["ada"]
    ada_xs, ada_stacked = split_stacked_quant({"ada": ada})
    n_l = (next(iter(ada.values())) if isinstance(ada, dict) else ada).shape[0]

    def one_layer(_, layer_in):
        lp_xs, lyr = layer_in
        lp = layer_view(lp_xs, ada_stacked, lyr)
        return None, qmatmul(sc, lp["ada"])                            # [S, N, 3H]

    _, layer_mods = jax.lax.scan(
        one_layer, None, (ada_xs, jnp.arange(n_l, dtype=jnp.int32)))
    layer_mods = jnp.swapaxes(layer_mods, 0, 1)                        # [S, L, N, 3H]
    final_mods = sc @ params["final_ada"]                              # [S, N, 2H]
    return layer_mods, final_mods


def _ffn(y, lp):
    """SwiGLU FFN; fused gate|up leaf (``wgu``) when present
    (ops/quant.fuse_diffusion_head_projections)."""
    if "wgu" in lp:
        g, u = jnp.split(qmatmul(y, lp["wgu"]), 2, axis=-1)
    else:
        g = qmatmul(y, lp["wg"])
        u = qmatmul(y, lp["wu"])
    return qmatmul(jax.nn.silu(g) * u, lp["wd"])


def apply_with_mods(params: dict, cfg: DiffusionHeadConfig, noisy: jax.Array,
                    layer_mods: jax.Array, final_mod: jax.Array) -> jax.Array:
    """Denoise with precomputed AdaLN modulations (one solver iteration's
    slice of ``precompute_modulations``): noisy [N, latent],
    layer_mods [L, N, 3H], final_mod [N, 2H]."""
    dtype = layer_mods.dtype
    x = noisy.astype(dtype) @ params["noisy_proj"]
    lw = params["layers"]
    keys = [k for k in ("norm", "wg", "wu", "wgu", "wd") if k in lw]
    ffn = {k: lw[k] for k in keys}
    ffn_xs, ffn_stacked = split_stacked_quant(ffn)
    n_l = layer_mods.shape[0]

    def body(xc, inp):
        lp_xs, lyr, mod = inp
        lp = layer_view(lp_xs, ffn_stacked, lyr)
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        y = rms_norm(xc, lp["norm"], cfg.rms_norm_eps) * (1 + scale) + shift
        y = _ffn(y, lp)
        return xc + gate * y, None

    x, _ = jax.lax.scan(
        body, x, (ffn_xs, jnp.arange(n_l, dtype=jnp.int32), layer_mods))

    shift, scale = jnp.split(final_mod, 2, axis=-1)
    x = rms_norm(x, None, cfg.rms_norm_eps) * (1 + scale) + shift
    return x @ params["final_linear"]


def apply(params: dict, cfg: DiffusionHeadConfig, noisy: jax.Array,
          timesteps: jax.Array, condition: jax.Array) -> jax.Array:
    """noisy: [N, latent], timesteps: [N], condition: [N, H] -> [N, latent]."""
    dtype = condition.dtype
    x = noisy.astype(dtype) @ params["noisy_proj"]
    t_emb = timestep_embedding(timesteps, cfg.freq_embed_size).astype(dtype)
    t_emb = jax.nn.silu(t_emb @ params["t_mlp1"]) @ params["t_mlp2"]
    c = condition @ params["cond_proj"] + t_emb
    l_xs, l_stacked = split_stacked_quant(params["layers"])
    n_l = l_xs["norm"].shape[0]

    def body(xc, layer_in):
        lp_xs, lyr = layer_in
        lp = layer_view(lp_xs, l_stacked, lyr)
        mod = qmatmul(jax.nn.silu(c), lp["ada"])
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        y = rms_norm(xc, lp["norm"], cfg.rms_norm_eps) * (1 + scale) + shift
        y = _ffn(y, lp)
        return xc + gate * y, None

    x, _ = jax.lax.scan(body, x, (l_xs, jnp.arange(n_l, dtype=jnp.int32)))

    shift, scale = jnp.split(jax.nn.silu(c) @ params["final_ada"], 2, axis=-1)
    x = rms_norm(x, None, cfg.rms_norm_eps) * (1 + scale) + shift
    return x @ params["final_linear"]
