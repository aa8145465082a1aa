"""Checkpoint import: HF/torch VibeVoice weights -> vibevoice_tpu pytree.

Replaces the reference's nnscaler->HF converter role
(reference: vibevoice/scripts/convert_nnscaler_checkpoint_to_transformers.py:20-131)
for the TPU stack: reads HF-format sharded safetensors (or torch .bin) of the
published VibeVoice checkpoints and maps every tensor into this framework's
parameter layout.

Layout transforms (torch -> ours):
  * nn.Linear [out, in]            -> [in, out]        (transpose)
  * nn.Conv1d [out, in/g, k]       -> [k, in/g, out]   (permute 2,1,0)
  * nn.ConvTranspose1d [in, out, k]-> [k, out, in]     (permute 2,1,0)
  * per-layer tensors              -> stacked [L, ...] (lax.scan layout)

Also exports back to the reference naming (`export_state_dict`) so round-trip
tests can verify the mapping without real checkpoints.
"""

from __future__ import annotations

import glob
import os
from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import VibeVoiceConfig

Array = np.ndarray


def _load_raw(path: str) -> Dict[str, Array]:
    """Load a checkpoint directory/file into {name: np.ndarray}."""
    tensors: Dict[str, Array] = {}
    if os.path.isdir(path):
        st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        bin_files = sorted(glob.glob(os.path.join(path, "*.bin")))
        files = st_files or bin_files
        if not files:
            raise FileNotFoundError(f"No safetensors/bin files under {path}")
    else:
        files = [path]
    for f in files:
        if f.endswith(".safetensors"):
            from safetensors import safe_open
            with safe_open(f, framework="np") as sf:
                for k in sf.keys():
                    tensors[k] = sf.get_tensor(k)
        else:
            import torch
            sd = torch.load(f, map_location="cpu", weights_only=True)
            sd = sd.get("state_dict", sd)
            for k, v in sd.items():
                tensors[k] = v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
    return tensors


def _lin(w: Array) -> Array:
    return np.ascontiguousarray(w.T)


def _conv(w: Array) -> Array:
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def _convtr(w: Array) -> Array:
    return np.ascontiguousarray(w.transpose(2, 1, 0))


class _SD:
    """State-dict view with prefix handling + consumption tracking."""

    def __init__(self, tensors: Dict[str, Array]):
        self.t = tensors
        self.used = set()

    def get(self, name: str, required: bool = True) -> Optional[Array]:
        # the converter strips 'model.model.' prefixes; published HF ckpts use
        # 'model.'-rooted names
        for cand in (name, f"model.{name}", name.replace("model.", "", 1)):
            if cand in self.t:
                self.used.add(cand)
                return self.t[cand]
        if required:
            raise KeyError(f"missing tensor: {name}")
        return None


def _import_lm(sd: _SD, cfg, dtype) -> dict:
    L = cfg.num_hidden_layers
    pre = "model.language_model"

    def stack(fmt: str, tf: Callable[[Array], Array]) -> jnp.ndarray:
        return jnp.asarray(np.stack([tf(sd.get(fmt.format(i))) for i in range(L)]), dtype)

    p = {
        "embed": jnp.asarray(sd.get(f"{pre}.embed_tokens.weight"), dtype),
        "layers": {
            "ln1": stack(pre + ".layers.{}.input_layernorm.weight", lambda x: x),
            "wq": stack(pre + ".layers.{}.self_attn.q_proj.weight", _lin),
            "bq": stack(pre + ".layers.{}.self_attn.q_proj.bias", lambda x: x),
            "wk": stack(pre + ".layers.{}.self_attn.k_proj.weight", _lin),
            "bk": stack(pre + ".layers.{}.self_attn.k_proj.bias", lambda x: x),
            "wv": stack(pre + ".layers.{}.self_attn.v_proj.weight", _lin),
            "bv": stack(pre + ".layers.{}.self_attn.v_proj.bias", lambda x: x),
            "wo": stack(pre + ".layers.{}.self_attn.o_proj.weight", _lin),
            "ln2": stack(pre + ".layers.{}.post_attention_layernorm.weight", lambda x: x),
            "wg": stack(pre + ".layers.{}.mlp.gate_proj.weight", _lin),
            "wu": stack(pre + ".layers.{}.mlp.up_proj.weight", _lin),
            "wd": stack(pre + ".layers.{}.mlp.down_proj.weight", _lin),
        },
        "norm": jnp.asarray(sd.get(f"{pre}.norm.weight"), dtype),
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = jnp.asarray(_lin(sd.get("lm_head.weight")), dtype)
    return p


def _import_block(sd: _SD, pre: str, dtype) -> dict:
    g = lambda n, req=True: sd.get(f"{pre}.{n}", req)
    gamma = g("gamma", req=False)
    ffn_gamma = g("ffn_gamma", req=False)
    # Block1D's FFN carries biases when conv_bias=true (tokenizer.py:651-655);
    # optional here so bias-free checkpoints import too.
    ffn_b1 = g("ffn.linear1.bias", req=False)
    ffn_b2 = g("ffn.linear2.bias", req=False)
    return {
        "norm": jnp.asarray(g("norm.weight"), dtype),
        "mix": {"w": jnp.asarray(_conv(g("mixer.conv.conv.conv.weight")), dtype),
                "b": jnp.asarray(g("mixer.conv.conv.conv.bias"), dtype)},
        "gamma": None if gamma is None else jnp.asarray(gamma, dtype),
        "ffn_norm": jnp.asarray(g("ffn_norm.weight"), dtype),
        "ffn_w1": jnp.asarray(_lin(g("ffn.linear1.weight")), dtype),
        "ffn_b1": None if ffn_b1 is None else jnp.asarray(ffn_b1, dtype),
        "ffn_w2": jnp.asarray(_lin(g("ffn.linear2.weight")), dtype),
        "ffn_b2": None if ffn_b2 is None else jnp.asarray(ffn_b2, dtype),
        "ffn_gamma": None if ffn_gamma is None else jnp.asarray(ffn_gamma, dtype),
    }


def _import_encoder(sd: _SD, pre: str, tok_cfg, dtype) -> dict:
    depths = tuple(tok_cfg.encoder_depths)
    n_down = len(tok_cfg.encoder_ratios)
    conv = lambda n: {"w": jnp.asarray(_conv(sd.get(f"{pre}.{n}.weight")), dtype),
                      "b": jnp.asarray(sd.get(f"{pre}.{n}.bias"), dtype)}
    p = {
        "stem": conv("downsample_layers.0.0.conv.conv"),
        "down": [conv(f"downsample_layers.{i + 1}.0.conv.conv") for i in range(n_down)],
        "stages": [[_import_block(sd, f"{pre}.stages.{i}.{j}", dtype)
                    for j in range(depths[i])] for i in range(len(depths))],
        "final_norm": None,
        "head": conv("head.conv.conv"),
    }
    if not tok_cfg.disable_last_norm:
        p["final_norm"] = jnp.asarray(sd.get(f"{pre}.norm.weight"), dtype)
    return p


def _import_decoder(sd: _SD, pre: str, tok_cfg, dtype) -> dict:
    depths = tok_cfg.resolved_decoder_depths
    n_up = len(tok_cfg.decoder_ratios)
    conv = lambda n: {"w": jnp.asarray(_conv(sd.get(f"{pre}.{n}.weight")), dtype),
                      "b": jnp.asarray(sd.get(f"{pre}.{n}.bias"), dtype)}
    convtr = lambda n: {"w": jnp.asarray(_convtr(sd.get(f"{pre}.{n}.weight")), dtype),
                        "b": jnp.asarray(sd.get(f"{pre}.{n}.bias"), dtype)}
    p = {
        "stem": conv("upsample_layers.0.0.conv.conv"),
        "up": [convtr(f"upsample_layers.{i + 1}.0.convtr.convtr") for i in range(n_up)],
        "stages": [[_import_block(sd, f"{pre}.stages.{i}.{j}", dtype)
                    for j in range(depths[i])] for i in range(len(depths))],
        "final_norm": None,
        "head": conv("head.conv.conv"),
    }
    if not tok_cfg.disable_last_norm:
        p["final_norm"] = jnp.asarray(sd.get(f"{pre}.norm.weight"), dtype)
    return p


def _import_connector(sd: _SD, pre: str, dtype) -> dict:
    return {
        "fc1_w": jnp.asarray(_lin(sd.get(f"{pre}.fc1.weight")), dtype),
        "fc1_b": jnp.asarray(sd.get(f"{pre}.fc1.bias"), dtype),
        "norm": jnp.asarray(sd.get(f"{pre}.norm.weight"), dtype),
        "fc2_w": jnp.asarray(_lin(sd.get(f"{pre}.fc2.weight")), dtype),
        "fc2_b": jnp.asarray(sd.get(f"{pre}.fc2.bias"), dtype),
    }


def _import_diffusion_head(sd: _SD, cfg, dtype) -> dict:
    pre = "model.prediction_head"
    L = cfg.head_layers

    def stack(fmt: str, tf) -> jnp.ndarray:
        return jnp.asarray(np.stack([tf(sd.get(fmt.format(i))) for i in range(L)]), dtype)

    return {
        "noisy_proj": jnp.asarray(_lin(sd.get(f"{pre}.noisy_images_proj.weight")), dtype),
        "cond_proj": jnp.asarray(_lin(sd.get(f"{pre}.cond_proj.weight")), dtype),
        "t_mlp1": jnp.asarray(_lin(sd.get(f"{pre}.t_embedder.mlp.0.weight")), dtype),
        "t_mlp2": jnp.asarray(_lin(sd.get(f"{pre}.t_embedder.mlp.2.weight")), dtype),
        "layers": {
            "norm": stack(pre + ".layers.{}.norm.weight", lambda x: x),
            "ada": stack(pre + ".layers.{}.adaLN_modulation.1.weight", _lin),
            "wg": stack(pre + ".layers.{}.ffn.gate_proj.weight", _lin),
            "wu": stack(pre + ".layers.{}.ffn.up_proj.weight", _lin),
            "wd": stack(pre + ".layers.{}.ffn.down_proj.weight", _lin),
        },
        "final_ada": jnp.asarray(_lin(sd.get(f"{pre}.final_layer.adaLN_modulation.1.weight")), dtype),
        "final_linear": jnp.asarray(_lin(sd.get(f"{pre}.final_layer.linear.weight")), dtype),
    }


def import_state_dict(tensors: Dict[str, Array], cfg: VibeVoiceConfig,
                      dtype=jnp.bfloat16, tok_dtype=jnp.bfloat16) -> dict:
    """Map a reference-named state dict into the vibevoice_tpu param tree."""
    sd = _SD(tensors)
    params = {
        "lm": _import_lm(sd, cfg.decoder, dtype),
        "acoustic": {
            "encoder": _import_encoder(sd, "model.acoustic_tokenizer.encoder",
                                       cfg.acoustic_tokenizer, tok_dtype),
            "decoder": _import_decoder(sd, "model.acoustic_tokenizer.decoder",
                                       cfg.acoustic_tokenizer, tok_dtype),
        },
        "semantic": _import_encoder(sd, "model.semantic_tokenizer.encoder",
                                    cfg.semantic_tokenizer, tok_dtype),
        "acoustic_connector": _import_connector(sd, "model.acoustic_connector", dtype),
        "semantic_connector": _import_connector(sd, "model.semantic_connector", dtype),
        "diffusion_head": _import_diffusion_head(sd, cfg.diffusion_head, dtype),
    }
    scale = sd.get("model.speech_scaling_factor", required=False)
    bias = sd.get("model.speech_bias_factor", required=False)
    params["speech_scaling_factor"] = jnp.float32(float(scale) if scale is not None else np.nan)
    params["speech_bias_factor"] = jnp.float32(float(bias) if bias is not None else np.nan)
    return params


def load_pretrained(path: str, cfg: Optional[VibeVoiceConfig] = None,
                    dtype=jnp.bfloat16) -> Tuple[dict, VibeVoiceConfig]:
    """Load an HF-format VibeVoice checkpoint directory.

    A single-file path whose torch payload carries nnscaler trainer state
    (``model`` + ``train_args`` keys) is routed to :func:`load_nnscaler`,
    so the original Microsoft training artifact imports directly too."""
    if os.path.isfile(path) and not path.endswith(".safetensors"):
        import torch
        try:
            probe = torch.load(path, map_location="cpu", weights_only=False)
        except Exception:  # noqa: BLE001 — not a torch file; fall through
            probe = None
        if isinstance(probe, dict) and "model" in probe and "train_args" in probe:
            return load_nnscaler(probe, cfg, dtype)
    if cfg is None:
        cfg_path = os.path.join(path, "config.json")
        cfg = VibeVoiceConfig.from_json(cfg_path)
    tensors = _load_raw(path)
    return import_state_dict(tensors, cfg, dtype), cfg


def _nnscaler_config(ckpt: dict) -> VibeVoiceConfig:
    """Recover the model config the way the reference converter does: probe
    train_args for the init-config filename and look it up in this repo's
    ``configs/`` (reference converter:35-44)."""
    rel = (ckpt.get("train_args", {}).get("vars", {})
           .get("model_args", {}).get("config_path", {}))
    rel = rel.get("relative_path") if isinstance(rel, dict) else rel
    if not rel:
        raise ValueError(
            "nnscaler checkpoint carries no train_args config path; pass cfg=")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_path = os.path.join(here, "configs", os.path.basename(str(rel)))
    if not os.path.exists(cfg_path):
        raise FileNotFoundError(
            f"init config {os.path.basename(str(rel))!r} not found under "
            f"{os.path.dirname(cfg_path)}; pass cfg= explicitly")
    return VibeVoiceConfig.from_json(cfg_path)


def load_nnscaler(path_or_ckpt, cfg: Optional[VibeVoiceConfig] = None,
                  dtype=jnp.bfloat16,
                  tok_dtype=jnp.bfloat16) -> Tuple[dict, VibeVoiceConfig]:
    """Ingest a RAW nnscaler training checkpoint (the original Microsoft
    training artifact), without a torch-side conversion step.

    Mirrors the reference converter's extraction
    (vibevoice/scripts/convert_nnscaler_checkpoint_to_transformers.py:32-56):
    the trainer dict's ``model`` entry holds ``model.model.``-prefixed weights
    (one ``model.`` stripped below) plus ``model.lm_head.weight`` when
    embeddings are untied; the init config filename is probed from
    ``train_args`` when ``cfg`` is not given.  Optimizer / lr-scheduler / rng
    trainer state is ignored, as in the reference.  Accepts a file path or an
    already-loaded trainer dict.
    """
    import torch
    ckpt = path_or_ckpt
    if not isinstance(ckpt, dict):
        ckpt = torch.load(ckpt, map_location="cpu", weights_only=False)
    if not (isinstance(ckpt, dict) and "model" in ckpt):
        raise ValueError("not an nnscaler trainer checkpoint (no 'model' entry)")
    if cfg is None:
        cfg = _nnscaler_config(ckpt)

    def to_np(v):
        return v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()

    tensors: Dict[str, Array] = {}
    for k, v in ckpt["model"].items():
        if k.startswith("model.model."):
            tensors[k[len("model."):]] = to_np(v)
        elif k == "model.lm_head.weight":
            tensors["lm_head.weight"] = to_np(v)
    return import_state_dict(tensors, cfg, dtype, tok_dtype), cfg


# ---------------------------------------------------------------------------
# Export (for round-trip tests and interop)
# ---------------------------------------------------------------------------

def export_state_dict(params: dict, cfg: VibeVoiceConfig,
                      dtype=np.float32) -> Dict[str, Array]:
    """Inverse mapping: vibevoice_tpu params -> reference-named numpy dict.

    ``dtype=None`` preserves each tensor's dtype (bf16 checkpoints stay bf16,
    matching what the reference converter writes); the default float32 keeps
    the historical behavior for torch interop tests."""
    out: Dict[str, Array] = {}
    if dtype is None:
        f32 = lambda a: np.asarray(a)
    else:
        f32 = lambda a: np.asarray(a, dtype)

    lm = params["lm"]
    pre = "model.language_model"
    out[f"{pre}.embed_tokens.weight"] = f32(lm["embed"])
    L = cfg.decoder.num_hidden_layers
    lay = lm["layers"]
    for i in range(L):
        p = f"{pre}.layers.{i}"
        out[f"{p}.input_layernorm.weight"] = f32(lay["ln1"][i])
        out[f"{p}.self_attn.q_proj.weight"] = f32(lay["wq"][i]).T
        out[f"{p}.self_attn.q_proj.bias"] = f32(lay["bq"][i])
        out[f"{p}.self_attn.k_proj.weight"] = f32(lay["wk"][i]).T
        out[f"{p}.self_attn.k_proj.bias"] = f32(lay["bk"][i])
        out[f"{p}.self_attn.v_proj.weight"] = f32(lay["wv"][i]).T
        out[f"{p}.self_attn.v_proj.bias"] = f32(lay["bv"][i])
        out[f"{p}.self_attn.o_proj.weight"] = f32(lay["wo"][i]).T
        out[f"{p}.post_attention_layernorm.weight"] = f32(lay["ln2"][i])
        out[f"{p}.mlp.gate_proj.weight"] = f32(lay["wg"][i]).T
        out[f"{p}.mlp.up_proj.weight"] = f32(lay["wu"][i]).T
        out[f"{p}.mlp.down_proj.weight"] = f32(lay["wd"][i]).T
    out[f"{pre}.norm.weight"] = f32(lm["norm"])
    if "lm_head" in lm:
        out["lm_head.weight"] = f32(lm["lm_head"]).T
    else:
        out["lm_head.weight"] = f32(lm["embed"])

    def conv_out(name, p):
        out[f"{name}.weight"] = f32(p["w"]).transpose(2, 1, 0)
        out[f"{name}.bias"] = f32(p["b"])

    def block_out(name, bp):
        out[f"{name}.norm.weight"] = f32(bp["norm"])
        out[f"{name}.mixer.conv.conv.conv.weight"] = f32(bp["mix"]["w"]).transpose(2, 1, 0)
        out[f"{name}.mixer.conv.conv.conv.bias"] = f32(bp["mix"]["b"])
        if bp["gamma"] is not None:
            out[f"{name}.gamma"] = f32(bp["gamma"])
        out[f"{name}.ffn_norm.weight"] = f32(bp["ffn_norm"])
        out[f"{name}.ffn.linear1.weight"] = f32(bp["ffn_w1"]).T
        if bp.get("ffn_b1") is not None:
            out[f"{name}.ffn.linear1.bias"] = f32(bp["ffn_b1"])
        out[f"{name}.ffn.linear2.weight"] = f32(bp["ffn_w2"]).T
        if bp.get("ffn_b2") is not None:
            out[f"{name}.ffn.linear2.bias"] = f32(bp["ffn_b2"])
        if bp["ffn_gamma"] is not None:
            out[f"{name}.ffn_gamma"] = f32(bp["ffn_gamma"])

    def encoder_out(name, ep, depths):
        conv_out(f"{name}.downsample_layers.0.0.conv.conv", ep["stem"])
        for i, d in enumerate(ep["down"]):
            conv_out(f"{name}.downsample_layers.{i + 1}.0.conv.conv", d)
        for i, stage in enumerate(ep["stages"]):
            for j, bp in enumerate(stage):
                block_out(f"{name}.stages.{i}.{j}", bp)
        conv_out(f"{name}.head.conv.conv", ep["head"])
        if ep["final_norm"] is not None:
            out[f"{name}.norm.weight"] = f32(ep["final_norm"])

    def decoder_out(name, dp):
        conv_out(f"{name}.upsample_layers.0.0.conv.conv", dp["stem"])
        for i, u in enumerate(dp["up"]):
            out[f"{name}.upsample_layers.{i + 1}.0.convtr.convtr.weight"] = \
                f32(u["w"]).transpose(2, 1, 0)
            out[f"{name}.upsample_layers.{i + 1}.0.convtr.convtr.bias"] = f32(u["b"])
        for i, stage in enumerate(dp["stages"]):
            for j, bp in enumerate(stage):
                block_out(f"{name}.stages.{i}.{j}", bp)
        conv_out(f"{name}.head.conv.conv", dp["head"])
        if dp["final_norm"] is not None:
            out[f"{name}.norm.weight"] = f32(dp["final_norm"])

    encoder_out("model.acoustic_tokenizer.encoder", params["acoustic"]["encoder"],
                cfg.acoustic_tokenizer.encoder_depths)
    decoder_out("model.acoustic_tokenizer.decoder", params["acoustic"]["decoder"])
    encoder_out("model.semantic_tokenizer.encoder", params["semantic"],
                cfg.semantic_tokenizer.encoder_depths)

    for nm in ("acoustic_connector", "semantic_connector"):
        cp = params[nm]
        out[f"model.{nm}.fc1.weight"] = f32(cp["fc1_w"]).T
        out[f"model.{nm}.fc1.bias"] = f32(cp["fc1_b"])
        out[f"model.{nm}.norm.weight"] = f32(cp["norm"])
        out[f"model.{nm}.fc2.weight"] = f32(cp["fc2_w"]).T
        out[f"model.{nm}.fc2.bias"] = f32(cp["fc2_b"])

    dh = params["diffusion_head"]
    pre = "model.prediction_head"
    out[f"{pre}.noisy_images_proj.weight"] = f32(dh["noisy_proj"]).T
    out[f"{pre}.cond_proj.weight"] = f32(dh["cond_proj"]).T
    out[f"{pre}.t_embedder.mlp.0.weight"] = f32(dh["t_mlp1"]).T
    out[f"{pre}.t_embedder.mlp.2.weight"] = f32(dh["t_mlp2"]).T
    for i in range(cfg.diffusion_head.head_layers):
        p = f"{pre}.layers.{i}"
        out[f"{p}.norm.weight"] = f32(dh["layers"]["norm"][i])
        out[f"{p}.adaLN_modulation.1.weight"] = f32(dh["layers"]["ada"][i]).T
        out[f"{p}.ffn.gate_proj.weight"] = f32(dh["layers"]["wg"][i]).T
        out[f"{p}.ffn.up_proj.weight"] = f32(dh["layers"]["wu"][i]).T
        out[f"{p}.ffn.down_proj.weight"] = f32(dh["layers"]["wd"][i]).T
    out[f"{pre}.final_layer.adaLN_modulation.1.weight"] = f32(dh["final_ada"]).T
    out[f"{pre}.final_layer.linear.weight"] = f32(dh["final_linear"]).T

    out["model.speech_scaling_factor"] = f32(params["speech_scaling_factor"])
    out["model.speech_bias_factor"] = f32(params["speech_bias_factor"])
    return out


# ---------------------------------------------------------------------------
# HF-format checkpoint writer (the reference converter's artifact layout)
# ---------------------------------------------------------------------------

_PREPROCESSOR_CONFIG = {
    # exact schema the reference converter writes
    # (convert_nnscaler_checkpoint_to_transformers.py:92-124)
    "processor_class": "VibeVoiceProcessor",
    "speech_tok_compress_ratio": 3200,
    "db_normalize": True,
    "audio_processor": {
        "feature_extractor_type": "VibeVoiceTokenizerProcessor",
        "sampling_rate": 24000,
        "normalize_audio": True,
        "target_dB_FS": -25,
        "eps": 1e-6,
    },
}


def write_hf_checkpoint(params: dict, cfg: VibeVoiceConfig, outdir: str,
                        max_shard_bytes: int = 2 * 1024 ** 3,
                        dtype=None) -> Dict[str, str]:
    """Write params as a reference-layout HF checkpoint directory.

    Produces exactly what the reference converter's ``save_pretrained(...,
    max_shard_size="2GB", safe_serialization=True)`` emits
    (convert_nnscaler_checkpoint_to_transformers.py:92-124): ``config.json``,
    ``preprocessor_config.json``, and ``model-XXXXX-of-YYYYY.safetensors``
    shards with a ``model.safetensors.index.json`` weight map (single
    un-indexed ``model.safetensors`` when everything fits one shard).

    Returns the tensor-name -> shard-file map that was written.
    """
    import json

    from safetensors.numpy import save_file

    os.makedirs(outdir, exist_ok=True)
    sd = export_state_dict(params, cfg, dtype=dtype)
    # tied embeddings: HF save_pretrained drops the tied lm_head alias
    if cfg.decoder.tie_word_embeddings:
        sd.pop("lm_head.weight", None)

    names = list(sd.keys())
    shards: list = [[]]
    cur = 0
    for n in names:
        nbytes = sd[n].nbytes
        if shards[-1] and cur + nbytes > max_shard_bytes:
            shards.append([])
            cur = 0
        shards[-1].append(n)
        cur += nbytes

    weight_map: Dict[str, str] = {}
    if len(shards) == 1:
        fname = "model.safetensors"
        save_file({n: np.ascontiguousarray(sd[n]) for n in shards[0]},
                  os.path.join(outdir, fname))
        weight_map = {n: fname for n in shards[0]}
    else:
        total = sum(sd[n].nbytes for n in names)
        for i, group in enumerate(shards):
            fname = f"model-{i + 1:05d}-of-{len(shards):05d}.safetensors"
            save_file({n: np.ascontiguousarray(sd[n]) for n in group},
                      os.path.join(outdir, fname))
            weight_map.update({n: fname for n in group})
        with open(os.path.join(outdir, "model.safetensors.index.json"), "w",
                  encoding="utf-8") as f:
            json.dump({"metadata": {"total_size": total},
                       "weight_map": weight_map}, f, indent=2)

    cfg.save_json(os.path.join(outdir, "config.json"))
    with open(os.path.join(outdir, "preprocessor_config.json"), "w",
              encoding="utf-8") as f:
        json.dump(_PREPROCESSOR_CONFIG, f, indent=2)
    return weight_map
