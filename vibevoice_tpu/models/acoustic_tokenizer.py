"""σ-VAE acoustic tokenizer and encoder-only semantic tokenizer.

TPU-native redesign of the reference conv tokenizers
(reference: modular_vibevoice_tokenizer.py:687-1186):

  * Encoder: stem conv -> 7 ConvNeXt-ish stages (depthwise-conv mixer +
    layer-scale + GELU FFN), interleaved with 6 strided downsample convs
    (ratios reversed, tokenizer.py:701,737-743), head conv -> vae_dim latents.
    Total stride 3200 (7.5 Hz at 24 kHz).
  * Decoder mirrors with causal transposed convs (tokenizer.py:863-912).
  * Everything is channels-last [B, T, C]; norms act on the lane dimension with
    fp32 internals — no transposes (the reference's ConvRMSNorm transposes
    around every norm, tokenizer.py:77-91).
  * Streaming: a functional pytree of fixed-shape left-context buffers
    (one per conv) replaces the reference's dict cache (tokenizer.py:193-256).
    For stride-aligned chunks streaming == batch exactly (tested).

All forward functions come in pairs: batch mode (`state=None`) and streaming
step mode (state pytree in / out).
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..config import AcousticTokenizerConfig, SemanticTokenizerConfig
from ..ops.conv import (
    causal_conv1d,
    causal_conv1d_step,
    causal_conv_transpose1d,
    causal_conv_transpose1d_step,
    context_size,
    conv_weight_shape,
)
from ..ops.norms import rms_norm
from ..ops.quant import qmatmul

TokCfg = Union[AcousticTokenizerConfig, SemanticTokenizerConfig]


# ---------------------------------------------------------------------------
# Parameter / state construction
# ---------------------------------------------------------------------------

def _conv_init(rng, in_ch, out_ch, kernel, groups=1, std=0.01, bias=True, dtype=jnp.float32):
    kw, kb = jax.random.split(rng)
    p = {"w": (jax.random.normal(kw, conv_weight_shape(in_ch, out_ch, kernel, groups),
                                 jnp.float32) * std).astype(dtype)}
    p["b"] = jnp.zeros((out_ch,), dtype) if bias else None
    return p


def _convtr_init(rng, in_ch, out_ch, kernel, std=0.01, bias=True, dtype=jnp.float32):
    kw, kb = jax.random.split(rng)
    p = {"w": (jax.random.normal(kw, (kernel, out_ch, in_ch), jnp.float32) * std).astype(dtype)}
    p["b"] = jnp.zeros((out_ch,), dtype) if bias else None
    return p


def _block_init(rng, dim, cfg: TokCfg, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(rng, 3)
    std = cfg.weight_init_value
    ffn_dim = cfg.ffn_expansion * dim
    return {
        "norm": jnp.ones((dim,), dtype) if cfg.layernorm_elementwise_affine else None,
        "mix": _conv_init(k1, dim, dim, cfg.kernel_size, groups=dim, std=std,
                          bias=cfg.conv_bias, dtype=dtype),
        "gamma": jnp.full((dim,), cfg.layer_scale_init_value, dtype)
                 if cfg.layer_scale_init_value > 0 else None,
        "ffn_norm": jnp.ones((dim,), dtype) if cfg.layernorm_elementwise_affine else None,
        # Block1D forwards bias=conv_bias into its FFN (tokenizer.py:651-655 via
        # the layer_type partial at :746-756), so with conv_bias=true (both real
        # configs) the FFN linears DO carry biases; zero-init per _init_weights
        # (tokenizer.py:1069-1072).
        "ffn_w1": (jax.random.normal(k2, (dim, ffn_dim), jnp.float32) * std).astype(dtype),
        "ffn_b1": jnp.zeros((ffn_dim,), dtype) if cfg.conv_bias else None,
        "ffn_w2": (jax.random.normal(k3, (ffn_dim, dim), jnp.float32) * std).astype(dtype),
        "ffn_b2": jnp.zeros((dim,), dtype) if cfg.conv_bias else None,
        "ffn_gamma": jnp.full((dim,), cfg.layer_scale_init_value, dtype)
                     if cfg.layer_scale_init_value > 0 else None,
    }


def _encoder_channels(cfg: TokCfg) -> List[int]:
    nf = cfg.encoder_n_filters
    return [nf * (2 ** i) for i in range(len(cfg.encoder_depths))]


def init_encoder_params(rng: jax.Array, cfg: TokCfg, dtype=jnp.float32) -> dict:
    depths = tuple(cfg.encoder_depths)
    chans = _encoder_channels(cfg)
    ratios = list(reversed(cfg.encoder_ratios))  # tokenizer.py:701
    keys = iter(jax.random.split(rng, 4 + len(ratios) + sum(depths)))
    std = cfg.weight_init_value

    params = {
        "stem": _conv_init(next(keys), cfg.channels, chans[0], cfg.kernel_size,
                           std=std, bias=cfg.conv_bias, dtype=dtype),
        "down": [
            _conv_init(next(keys), chans[i], chans[i + 1], ratios[i] * 2,
                       std=std, bias=cfg.conv_bias, dtype=dtype)
            for i in range(len(ratios))
        ],
        "stages": [
            [_block_init(next(keys), chans[i], cfg, dtype) for _ in range(depths[i])]
            for i in range(len(depths))
        ],
        "final_norm": None if cfg.disable_last_norm else jnp.ones((chans[-1],), dtype),
        "head": _conv_init(next(keys), chans[-1], cfg.vae_dim, cfg.last_kernel_size,
                           std=std, bias=cfg.conv_bias, dtype=dtype),
    }
    return params


def init_decoder_params(rng: jax.Array, cfg: AcousticTokenizerConfig,
                        dtype=jnp.float32) -> dict:
    depths = cfg.resolved_decoder_depths
    nf = cfg.decoder_n_filters
    nd = len(depths)
    chans = [nf * (2 ** (nd - 1 - i)) for i in range(nd)]  # 2048 ... 32
    ratios = list(cfg.decoder_ratios)                       # NOT reversed (tokenizer.py:830)
    keys = iter(jax.random.split(rng, 4 + len(ratios) + sum(depths)))
    std = cfg.weight_init_value

    return {
        "stem": _conv_init(next(keys), cfg.vae_dim, chans[0], cfg.kernel_size,
                           std=std, bias=cfg.conv_bias, dtype=dtype),
        "up": [
            _convtr_init(next(keys), chans[i], chans[i + 1], ratios[i] * 2,
                         std=std, bias=cfg.conv_bias, dtype=dtype)
            for i in range(len(ratios))
        ],
        "stages": [
            [_block_init(next(keys), chans[i], cfg, dtype) for _ in range(depths[i])]
            for i in range(nd)
        ],
        "final_norm": None if cfg.disable_last_norm else jnp.ones((chans[-1],), dtype),
        "head": _conv_init(next(keys), chans[-1], cfg.channels, cfg.last_kernel_size,
                           std=std, bias=cfg.conv_bias, dtype=dtype),
    }


def init_acoustic_params(rng: jax.Array, cfg: AcousticTokenizerConfig,
                         dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(rng)
    return {"encoder": init_encoder_params(k1, cfg, dtype),
            "decoder": init_decoder_params(k2, cfg, dtype)}


# --- streaming state ---------------------------------------------------------

def _conv_state(batch, in_ch, kernel, stride, dtype):
    ctx = context_size(kernel, stride)
    return jnp.zeros((batch, ctx, in_ch), dtype)


def _stage_state(stacked: bool, batch: int, ch: int, depth: int,
                 kernel: int, dtype):
    """Per-stage mixer contexts: a list of [B, k-1, C] buffers, or one
    stacked [depth, B, k-1, C] array when the stage params are stacked
    (fused streaming kernel layout)."""
    if stacked:
        ctx = context_size(kernel, 1)
        return jnp.zeros((depth, batch, ctx, ch), dtype)
    return [_conv_state(batch, ch, kernel, 1, dtype) for _ in range(depth)]


def _stages_stacked(params: Optional[dict], n: int):
    if params is None:
        return [False] * n
    return [is_stacked_stage(st) for st in params["stages"]]


def init_encoder_state(cfg: TokCfg, batch: int, dtype=jnp.float32,
                       params: Optional[dict] = None) -> dict:
    """``params``: the encoder params the state will run against — stages
    stacked for the fused kernel get stacked state arrays (layouts must
    match; None = all per-block lists)."""
    depths = tuple(cfg.encoder_depths)
    chans = _encoder_channels(cfg)
    ratios = list(reversed(cfg.encoder_ratios))
    stk = _stages_stacked(params, len(depths))
    return {
        "stem": _conv_state(batch, cfg.channels, cfg.kernel_size, 1, dtype),
        "down": [_conv_state(batch, chans[i], ratios[i] * 2, ratios[i], dtype)
                 for i in range(len(ratios))],
        "stages": [_stage_state(stk[i], batch, chans[i], depths[i],
                                cfg.kernel_size, dtype)
                   for i in range(len(depths))],
        "head": _conv_state(batch, chans[-1], cfg.last_kernel_size, 1, dtype),
    }


def init_decoder_state(cfg: AcousticTokenizerConfig, batch: int,
                       dtype=jnp.float32,
                       params: Optional[dict] = None) -> dict:
    depths = cfg.resolved_decoder_depths
    nf = cfg.decoder_n_filters
    nd = len(depths)
    chans = [nf * (2 ** (nd - 1 - i)) for i in range(nd)]
    ratios = list(cfg.decoder_ratios)
    stk = _stages_stacked(params, nd)
    return {
        "stem": _conv_state(batch, cfg.vae_dim, cfg.kernel_size, 1, dtype),
        # transposed conv keeps k-1 past *inputs* (tokenizer.py:447)
        "up": [jnp.zeros((batch, ratios[i] * 2 - 1, chans[i]), dtype)
               for i in range(len(ratios))],
        "stages": [_stage_state(stk[i], batch, chans[i], depths[i],
                                cfg.kernel_size, dtype) for i in range(nd)],
        "head": _conv_state(batch, chans[-1], cfg.last_kernel_size, 1, dtype),
    }


# ---------------------------------------------------------------------------
# Stacked stages (fused streaming kernel, ops/convnext_stage.py)
# ---------------------------------------------------------------------------

def is_stacked_stage(stage) -> bool:
    return isinstance(stage, dict)


def stack_stage(blocks):
    """Stack a stage's identical ConvNeXt blocks for the fused streaming
    kernel.  Eligible only when every block's FFN is int4c-quantized (on the
    real configs: the 2048-channel stage — quantize_tokenizer_params gives
    smaller stages int8) and all optional leaves are present.  Returns the
    stacked dict, or None (caller keeps the per-block list)."""
    from ..ops.int4 import is_quantized_int4c

    if len(blocks) == 0:
        return None
    for bp in blocks:
        if not (is_quantized_int4c(bp.get("ffn_w1"))
                and is_quantized_int4c(bp.get("ffn_w2"))):
            return None
        if any(bp.get(k) is None for k in
               ("norm", "gamma", "ffn_norm", "ffn_gamma", "ffn_b1", "ffn_b2")):
            return None
        if bp["mix"].get("b") is None or isinstance(bp["mix"]["w"], dict):
            return None
    vecs = jnp.stack([
        jnp.stack([bp["norm"], bp["mix"]["b"], bp["gamma"], bp["ffn_norm"],
                   bp["ffn_b2"], bp["ffn_gamma"]]) for bp in blocks])
    return {
        "vecs": vecs,                                     # [depth, 6, C]
        "mix_w": jnp.stack([bp["mix"]["w"][:, 0, :] for bp in blocks]),
        # [depth, 1, FFN]: the singleton keeps the kernel's per-block view
        # Mosaic-legal — a (1, FFN) block over [depth, FFN] violates the
        # "second-minor divisible by 8 or equal to the array dim" rule
        "b1": jnp.stack([bp["ffn_b1"] for bp in blocks])[:, None, :],
        "w1": {k: jnp.stack([bp["ffn_w1"][k] for bp in blocks])
               for k in ("q4c", "s4c")},
        "w2": {k: jnp.stack([bp["ffn_w2"][k] for bp in blocks])
               for k in ("q4c", "s4c")},
    }


def stack_tokenizer_stages(params: dict) -> dict:
    """Serving transform: replace eligible per-block stage lists with the
    stacked layout (zero weight duplication — leaves are restacked, the
    originals dropped).  Applied by single-device generators next to
    fuse_lm_projections; training/parity/checkpoints keep the list layout."""
    def rec(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "stages" and isinstance(v, list):
                    out[k] = [(stack_stage(st) or st)
                              if isinstance(st, list) else st for st in v]
                else:
                    out[k] = rec(v)
            return out
        return node
    return rec(params)


def unstack_tokenizer_stages(params: dict) -> dict:
    """Inverse of :func:`stack_tokenizer_stages`: restore the per-block list
    layout (meshed generators need it — GSPMD shards per-block leaves, and a
    caller may hand them params taken from a single-device generator)."""
    def rec(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "stages" and isinstance(v, list):
                    out[k] = [[_stage_block_view(st, j)
                               for j in range(_stage_depth(st))]
                              if is_stacked_stage(st) else st for st in v]
                else:
                    out[k] = rec(v)
            return out
        return node
    return rec(params)


def _stage_block_view(sp: dict, j: int) -> dict:
    """Per-block param view of a stacked stage (batch-mode / fallback path);
    static indexing of the stacked leaves — XLA fuses the slices into the
    consuming ops, no weight copies."""
    return {
        "norm": sp["vecs"][j, 0],
        "mix": {"w": sp["mix_w"][j][:, None, :], "b": sp["vecs"][j, 1]},
        "gamma": sp["vecs"][j, 2],
        "ffn_norm": sp["vecs"][j, 3],
        "ffn_w1": {k: sp["w1"][k][j] for k in ("q4c", "s4c")},
        # [depth, 1, FFN] kernel layout -> original [FFN] per-block layout
        "ffn_b1": sp["b1"][j, 0],
        "ffn_w2": {k: sp["w2"][k][j] for k in ("q4c", "s4c")},
        "ffn_b2": sp["vecs"][j, 4],
        "ffn_gamma": sp["vecs"][j, 5],
    }


def _stage_depth(stage) -> int:
    return stage["b1"].shape[0] if is_stacked_stage(stage) else len(stage)


def _run_stage(x, stage, cfg: TokCfg, st_in):
    """Run one stage: the fused kernel when (stacked params, T==1 streaming,
    Pallas available per the int4 dispatch scope), else per-block.  Returns
    (x, new_stage_state)."""
    if is_stacked_stage(stage):
        from ..ops.convnext_stage import convnext_stage_step_int4c
        from ..ops.int4 import current_impl

        impl = current_impl()
        fused_ok = (st_in is not None and x.shape[1] == 1 and impl != "xla"
                    and (impl in ("pallas", "interpret")
                         or jax.default_backend() == "tpu"))
        if fused_ok:
            y, new_st = convnext_stage_step_int4c(
                x[:, 0], st_in, stage, eps=cfg.layernorm_eps,
                interpret=(impl == "interpret"
                           or jax.default_backend() != "tpu"))
            return y[:, None], new_st
        new_blocks = []
        for j in range(_stage_depth(stage)):
            x, s = _block(x, _stage_block_view(stage, j), cfg,
                          None if st_in is None else st_in[j])
            new_blocks.append(s)
        if st_in is None:
            return x, None
        return x, jnp.stack(new_blocks)
    new_state = [None] * len(stage)
    for j in range(len(stage)):
        x, s = _block(x, stage[j], cfg,
                      None if st_in is None else st_in[j])
        new_state[j] = s
    return x, (new_state if st_in is not None else None)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _conv(x, p, stride, groups, state):
    if state is None:
        return causal_conv1d(x, p["w"], p["b"], stride=stride, groups=groups), None
    y, s = causal_conv1d_step(x, state, p["w"], p["b"], stride=stride, groups=groups)
    return y, s


def _block(x, bp, cfg: TokCfg, state):
    """ConvNeXt-style block (tokenizer.py:620-684). x: [B, T, C]."""
    dim = x.shape[-1]
    resid = x
    y = rms_norm(x, bp["norm"], cfg.layernorm_eps)
    y, new_state = _conv(y, bp["mix"], 1, dim, state)
    if bp["gamma"] is not None:
        y = y * bp["gamma"]
    x = resid + y

    resid = x
    y = rms_norm(x, bp["ffn_norm"], cfg.layernorm_eps)
    h = qmatmul(y, bp["ffn_w1"])
    if bp.get("ffn_b1") is not None:
        h = h + bp["ffn_b1"]
    y = qmatmul(jax.nn.gelu(h, approximate=False), bp["ffn_w2"])
    if bp.get("ffn_b2") is not None:
        y = y + bp["ffn_b2"]
    if bp["ffn_gamma"] is not None:
        y = y * bp["ffn_gamma"]
    return resid + y, new_state


def encode(params: dict, cfg: TokCfg, audio: jax.Array,
           state: Optional[dict] = None) -> Tuple[jax.Array, Optional[dict]]:
    """audio: [B, T, 1] -> latents [B, T/3200, vae_dim].

    With `state` given, runs one streaming step (T must be stride-aligned).
    """
    ratios = list(reversed(cfg.encoder_ratios))
    depths = tuple(cfg.encoder_depths)
    new_state = {"stem": None, "down": [None] * len(ratios),
                 "stages": [None] * len(depths), "head": None} if state else None

    x = audio
    for i in range(len(depths)):
        if i == 0:
            x, s = _conv(x, params["stem"], 1, 1,
                         state["stem"] if state else None)
            if state:
                new_state["stem"] = s
        else:
            x, s = _conv(x, params["down"][i - 1], ratios[i - 1], 1,
                         state["down"][i - 1] if state else None)
            if state:
                new_state["down"][i - 1] = s
        x, s = _run_stage(x, params["stages"][i], cfg,
                          state["stages"][i] if state else None)
        if state:
            new_state["stages"][i] = s

    if params["final_norm"] is not None:
        x = rms_norm(x, params["final_norm"], cfg.layernorm_eps)
    x, s = _conv(x, params["head"], 1, 1, state["head"] if state else None)
    if state:
        new_state["head"] = s
    return x, new_state


def decode(params: dict, cfg: AcousticTokenizerConfig, latents: jax.Array,
           state: Optional[dict] = None) -> Tuple[jax.Array, Optional[dict]]:
    """latents: [B, T, vae_dim] -> audio [B, T*3200, 1]."""
    ratios = list(cfg.decoder_ratios)
    depths = cfg.resolved_decoder_depths
    new_state = {"stem": None, "up": [None] * len(ratios),
                 "stages": [None] * len(depths), "head": None} if state else None

    x = latents
    for i in range(len(depths)):
        if i == 0:
            x, s = _conv(x, params["stem"], 1, 1, state["stem"] if state else None)
            if state:
                new_state["stem"] = s
        else:
            p = params["up"][i - 1]
            if state is None:
                x = causal_conv_transpose1d(x, p["w"], p["b"], ratios[i - 1])
                s = None
            else:
                x, s = causal_conv_transpose1d_step(x, state["up"][i - 1], p["w"],
                                                    p["b"], ratios[i - 1])
            if state:
                new_state["up"][i - 1] = s
        x, s = _run_stage(x, params["stages"][i], cfg,
                          state["stages"][i] if state else None)
        if state:
            new_state["stages"][i] = s

    if params["final_norm"] is not None:
        x = rms_norm(x, params["final_norm"], cfg.layernorm_eps)
    x, s = _conv(x, params["head"], 1, 1, state["head"] if state else None)
    if state:
        new_state["head"] = s
    return x, new_state


# ---------------------------------------------------------------------------
# σ-VAE sampling (tokenizer.py:954-1000)
# ---------------------------------------------------------------------------

def sample_latents(rng: jax.Array, mean: jax.Array, fix_std: float,
                   dist_type: str = "gaussian") -> jax.Array:
    """Sample from the fixed-variance posterior.

    'gaussian': per-sample scalar std ~ N(0, (fix_std/0.8)^2), then
    mean + std * eps (tokenizer.py:980-989).  'fix': mean + fix_std * eps.
    'none': mean.
    """
    if dist_type == "none":
        return mean
    k1, k2 = jax.random.split(rng)
    eps = jax.random.normal(k2, mean.shape, mean.dtype)
    if dist_type == "fix":
        return mean + fix_std * eps
    if dist_type == "gaussian":
        b = mean.shape[0]
        std = jax.random.normal(k1, (b,), mean.dtype) * (fix_std / 0.8)
        std = std.reshape((b,) + (1,) * (mean.ndim - 1))
        return mean + std * eps
    raise ValueError(dist_type)
