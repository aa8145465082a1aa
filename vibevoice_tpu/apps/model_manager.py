"""Model manager: registry, load/unload/switch, load-on-demand, quantization.

Host-side equivalent of the flagship app's model management
(reference: main.py:186-541): a model registry, load-on-demand ("LOD") that
frees HBM between generations, int8 weight-only quantized loading (the
bitsandbytes-NF4 analogue, main.py:301-416), checkpoint-path fallbacks, and
offline/cache controls via environment variables.
"""

from __future__ import annotations

import gc
import os
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import VibeVoiceConfig
from ..generation import VibeVoiceGenerator
from ..processor import VibeVoiceProcessor

# registry: display name -> (config alias, default checkpoint dirs to probe)
MODEL_REGISTRY: Dict[str, dict] = {
    "VibeVoice-1.5B": {"config": "1.5b",
                       "paths": ["microsoft/VibeVoice-1.5B", "WestZhang/VibeVoice-1.5B"]},
    "VibeVoice-7B-Preview": {"config": "7b",
                             "paths": ["WestZhang/VibeVoice-Large-pt",
                                       "microsoft/VibeVoice-Large"]},
}


QUANT_TIERS = ("", "int8", "int4", "int4g")


def _norm_tier(quantize) -> str:
    """bool/str -> tier name ('' = dense).  True keeps its historical int8
    meaning; 'int4' is the per-column speed tier, 'int4g' group-16 fidelity."""
    if quantize is True:
        return "int8"
    if not quantize:
        return ""
    tier = str(quantize)
    assert tier in QUANT_TIERS[1:], f"unknown quantize tier: {tier}"
    return tier


@dataclass
class LoadedModel:
    name: str
    cfg: VibeVoiceConfig
    generator: VibeVoiceGenerator
    processor: VibeVoiceProcessor
    quantized: str = ""                  # "", "int8", "int4", "int4g"
    loaded_at: float = field(default_factory=time.time)


class ModelManager:
    """Load/unload/switch models; optionally free weights after each use."""

    def __init__(self, checkpoints_dir: Optional[str] = None,
                 load_on_demand: bool = False, quantize: bool = False,
                 ddpm_steps: int = 10, debug: bool = False,
                 offline: Optional[bool] = None, log_fn=None, mesh=None):
        # mesh: optional jax.sharding.Mesh — generators built by this manager
        # serve sharded (TP on attention heads / MLP, DP on batch)
        self.mesh = mesh
        self.checkpoints_dir = checkpoints_dir or os.environ.get(
            "VIBEVOICE_CHECKPOINTS", os.path.expanduser("~/.cache/vibevoice"))
        self.load_on_demand = load_on_demand
        self.quantize = quantize
        self.ddpm_steps = ddpm_steps
        self.debug = debug
        self.log = log_fn or print
        # offline mode (reference main.py:274-289): explicit flag wins, then
        # HF_HUB_OFFLINE / VIBEVOICE_OFFLINE environment
        if offline is None:
            env = (os.environ.get("HF_HUB_OFFLINE", "")
                   or os.environ.get("VIBEVOICE_OFFLINE", ""))
            offline = env == "1" or env.lower() in ("true", "yes")
        self.offline = offline
        self.current: Optional[LoadedModel] = None

    # -- path resolution (offline aware, main.py:274-289) ----------------------
    def _resolve_path(self, name: str) -> Optional[str]:
        entry = MODEL_REGISTRY.get(name, {"paths": [name]})
        candidates = [os.path.join(self.checkpoints_dir, p.replace("/", "--"))
                      for p in entry.get("paths", [])]
        candidates += entry.get("paths", [])
        candidates.append(os.path.join(self.checkpoints_dir, name))
        for c in candidates:
            if os.path.isdir(c) and (
                    os.path.exists(os.path.join(c, "config.json"))
                    or any(f.endswith(".safetensors") for f in os.listdir(c))):
                return c
        return None

    def _quant_store_path(self, name: str, tier: str) -> Optional[str]:
        """Directory of the pre-quantized store for (model, tier) under
        VIBEVOICE_QUANT_STORE (or <checkpoints_dir>/quant when unset '1'
        is given); None disables the store entirely."""
        if not tier:
            return None
        root = os.environ.get("VIBEVOICE_QUANT_STORE", "")
        if not root:
            return None
        if root == "1":
            root = os.path.join(self.checkpoints_dir, "quant")
        return os.path.join(root, f"{name.replace('/', '--')}-{tier}")

    def _processor_for(self, name: str) -> VibeVoiceProcessor:
        path = self._resolve_path(name)
        if path is not None:
            try:
                return VibeVoiceProcessor.from_pretrained(path)
            except Exception:  # noqa: BLE001 — default processor fallback
                pass
        return VibeVoiceProcessor()

    def available_models(self):
        return list(MODEL_REGISTRY.keys())

    def _try_hub_download(self, repo_id: str) -> Optional[str]:
        """Attempt a hub snapshot download (skipped in offline mode).
        Mirrors the reference's download step in its fallback chain
        (main.py:480-541); failures fall through to the next candidate."""
        if self.offline:
            self.log(f"📴 Offline mode: not downloading {repo_id}")
            return None
        try:
            from huggingface_hub import snapshot_download
            self.log(f"⬇️  Downloading {repo_id} from the hub...")
            return snapshot_download(repo_id, cache_dir=self.checkpoints_dir)
        except Exception as e:  # noqa: BLE001 — any failure -> next candidate
            self.log(f"⚠️  Hub download of {repo_id} failed: "
                     f"{type(e).__name__}: {str(e)[:120]}")
            return None

    def load(self, name: str, quantize=None) -> LoadedModel:
        if self.current is not None and self.current.name == name:
            return self.current
        self.unload()
        tier = _norm_tier(self.quantize if quantize is None else quantize)

        entry = MODEL_REGISTRY.get(name, {})
        # pre-quantized store (reference: the pre-quantized 4-bit repo is
        # tried FIRST, main.py:349-367): restore quantized leaves directly,
        # skipping both the dense load and the quantize pass
        qstore = self._quant_store_path(name, tier)
        if qstore is not None:
            from ..checkpoint import checkpoint_meta, load_checkpoint
            if checkpoint_meta(qstore).get("quant_tier") == tier:
                params, cfg = load_checkpoint(qstore)
                processor = self._processor_for(name)
                self.log(f"✅ Loaded pre-quantized {tier} store {qstore}")
                gen = VibeVoiceGenerator(params, cfg, processor.tokenizer,
                                         ddpm_inference_steps=self.ddpm_steps,
                                         mesh=self.mesh)
                self.current = LoadedModel(name=name, cfg=cfg, generator=gen,
                                           processor=processor, quantized=tier)
                return self.current

        # fallback chain (reference main.py:274-541): local cache for each
        # registered repo (legacy first, then current) -> hub download unless
        # offline -> random weights with a loud warning
        path = self._resolve_path(name)
        if path is None:
            for repo in entry.get("paths", []):
                path = self._try_hub_download(repo)
                if path is not None:
                    break
        if path is not None:
            from ..convert import load_pretrained
            params, cfg = load_pretrained(path)
            processor = VibeVoiceProcessor.from_pretrained(path)
            self.log(f"✅ Loaded checkpoint from {path}")
        else:
            # no checkpoint available: random-weights fallback so the app
            # stays usable for smoke testing (mirrors the reference's
            # fallback-chain spirit, main.py:417-477)
            cfg = VibeVoiceConfig.named(entry.get("config", "1.5b"))
            from ..models import vibevoice
            params = vibevoice.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
            processor = VibeVoiceProcessor()
            self.log(f"⚠️  No checkpoint found for {name}; using random weights")

        if tier:
            # on-the-fly fallback (reference main.py:369-416): quantize the
            # full serving stack, then write through to the pre-quantized
            # store (when configured) so the NEXT load/LOD switch skips
            # this pass
            from ..ops.quant import quantize_serving_stack
            params = quantize_serving_stack(params, tier)
            if qstore is not None:
                try:
                    from ..checkpoint import save_quantized_checkpoint
                    save_quantized_checkpoint(qstore, params, cfg, tier,
                                              already_quantized=True)
                    self.log(f"💾 Cached pre-quantized {tier} store {qstore}")
                except Exception as e:  # noqa: BLE001 — cache is optional
                    self.log(f"⚠️  Could not write quant store: {e}")

        gen = VibeVoiceGenerator(params, cfg, processor.tokenizer,
                                 ddpm_inference_steps=self.ddpm_steps,
                                 mesh=self.mesh)
        self.current = LoadedModel(name=name, cfg=cfg, generator=gen,
                                   processor=processor, quantized=tier)
        return self.current

    def ensure_loaded(self, name: str) -> LoadedModel:
        return self.load(name)

    def unload(self) -> None:
        if self.current is not None:
            self.current = None
            gc.collect()

    def after_generate(self) -> None:
        """In load-on-demand mode, free the model after each generation
        (main.py:1111-1114)."""
        if self.load_on_demand:
            self.unload()
