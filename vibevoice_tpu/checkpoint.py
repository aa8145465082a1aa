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

    p = argparse.ArgumentParser(description="Convert HF checkpoint to Orbax")
    p.add_argument("hf_path")
    p.add_argument("out_path")
    args = p.parse_args()
    import_hf_to_orbax(args.hf_path, args.out_path)
