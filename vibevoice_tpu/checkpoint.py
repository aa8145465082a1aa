"""Native checkpointing via Orbax (SURVEY.md §5.4).

Replaces the reference's HF sharded-safetensors save/load
(reference: convert_nnscaler_checkpoint_to_transformers.py:92-131) with an
Orbax store holding the parameter pytree + the architecture config, restorable
directly onto a sharded mesh.  ``import_hf_to_orbax`` is the
safetensors -> Orbax one-shot conversion tool.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax

from .config import VibeVoiceConfig


def save_checkpoint(path: str, params: dict, cfg: VibeVoiceConfig,
                    step: Optional[int] = None) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), params, force=True)
    cfg.save_json(os.path.join(path, "config.json"))
    meta = {"framework": "vibevoice_tpu", "step": step}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


QUANT_TIERS = ("int8", "int4", "int4g")


def checkpoint_meta(path: str) -> dict:
    """The store's meta.json ({} when absent): ``quant_tier`` marks a
    pre-quantized store."""
    try:
        with open(os.path.join(os.path.abspath(path), "meta.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def save_quantized_checkpoint(path: str, params: dict, cfg: VibeVoiceConfig,
                              tier: str = "int4",
                              step: Optional[int] = None,
                              already_quantized: bool = False) -> None:
    """Quantize the full serving stack (LM + diffusion head + tokenizer
    FFNs/convs) at ``tier`` and save the quantized leaves directly — the
    reference's pre-quantized 4-bit repo analogue (main.py:349-367): a
    serving process restores {"q4c","s4c"} leaves as-is instead of paying
    the quantize pass on every load/LOD switch (~10 s on the 1.5B tree).
    Orbax stores the leaf dicts natively; ``meta.json`` carries the tier so
    loaders know not to re-quantize.  ``already_quantized``: ``params``
    went through quantize_serving_stack(tier) already (the write-through
    cache path) — save as-is."""
    from .ops.quant import quantize_serving_stack

    assert tier in QUANT_TIERS, tier
    q = params if already_quantized else quantize_serving_stack(params, tier)
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), q, force=True)
    cfg.save_json(os.path.join(path, "config.json"))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"framework": "vibevoice_tpu", "step": step,
                   "quant_tier": tier}, f)


def load_checkpoint(path: str, shardings=None) -> Tuple[dict, VibeVoiceConfig]:
    """Restore params (+config).

    `shardings`: optional pytree of NamedShardings — the restore then streams
    each shard straight onto its device (single-pass sharded load; the 7B
    tree never materializes on one host/device).  The abstract target is
    derived from the config, so shapes never round-trip through the host.
    """
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    cfg = VibeVoiceConfig.from_json(os.path.join(path, "config.json"))
    if shardings is not None and checkpoint_meta(path).get("quant_tier"):
        # the abstract target below is derived from the DENSE init shapes;
        # a pre-quantized store is a single-device serving artifact — meshed
        # serving re-quantizes from the dense store (shard_params handles
        # quantized leaves AFTER restore, not during)
        raise ValueError(
            "pre-quantized store cannot be restored with shardings; load "
            "the dense checkpoint and quantize after shard_params")
    with ocp.StandardCheckpointer() as ckptr:
        if shardings is None:
            params = ckptr.restore(os.path.join(path, "params"))
        else:
            from .models import vibevoice
            dtype = jnp.dtype(cfg.dtype)
            shapes = jax.eval_shape(
                lambda k: vibevoice.init_params(k, cfg, dtype),
                jax.random.PRNGKey(0))
            target = jax.tree.map(
                lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
                dict(shapes), shardings)
            params = ckptr.restore(os.path.join(path, "params"), target)
    return params, cfg


def import_hf_to_orbax(hf_path: str, out_path: str,
                       cfg: Optional[VibeVoiceConfig] = None) -> None:
    """One-shot: HF safetensors checkpoint -> Orbax (the §3.5 converter's
    TPU-era replacement)."""
    from .convert import load_pretrained

    params, cfg = load_pretrained(hf_path, cfg)
    save_checkpoint(out_path, params, cfg)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(
        description="Convert HF checkpoint to Orbax (optionally pre-quantized)")
    p.add_argument("hf_path", help="HF safetensors dir OR an Orbax store")
    p.add_argument("out_path")
    p.add_argument("--quantize", choices=QUANT_TIERS, default=None,
                   help="emit a pre-quantized serving store at this tier")
    args = p.parse_args()
    if args.quantize is None:
        import_hf_to_orbax(args.hf_path, args.out_path)
    else:
        if os.path.exists(os.path.join(args.hf_path, "config.json")) and \
                os.path.exists(os.path.join(args.hf_path, "params")):
            params, cfg = load_checkpoint(args.hf_path)
        else:
            from .convert import load_pretrained
            params, cfg = load_pretrained(args.hf_path)
        save_quantized_checkpoint(args.out_path, params, cfg, args.quantize)
