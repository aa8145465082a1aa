"""Sharding specs for the VibeVoice parameter tree.

TP plan (TPU-native rendering of the reference's declarative tp_plan,
configuration_vibevoice.py:175-183):
  * attention q / o: colwise / rowwise on the "tp" axis (q heads split; KV
    heads replicated — GQA has only 2-4 KV heads, replicating them avoids
    head-dim splits and keeps decode attention local)
  * MLP gate/up colwise, down rowwise
  * embeddings / lm_head replicated in compute (colwise_rep semantics)
  * everything else (norms, tokenizers, diffusion head, connectors) replicated
    — the conv tokenizers and AdaLN head are tiny relative to the LM
  * FSDP-style data parallelism: batch on "dp"; optionally shard the *stored*
    params on dp via `fsdp=True` (optimizer state follows params)
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import VibeVoiceConfig


def _lm_layer_specs() -> dict:
    return {
        "ln1": P(),
        "wq": P(None, None, "tp"), "bq": P(None, "tp"),
        "wk": P(), "bk": P(),
        "wv": P(), "bv": P(),
        "wo": P(None, "tp", None),
        "ln2": P(),
        "wg": P(None, None, "tp"),
        "wu": P(None, None, "tp"),
        "wd": P(None, "tp", None),
    }


def param_pspecs(params: dict) -> dict:
    """PartitionSpec pytree matching `vibevoice.init_params` structure."""
    specs: dict = jax.tree.map(lambda _: P(), params)
    lm = {"embed": P(), "norm": P(), "layers": _lm_layer_specs()}
    if "lm_head" in params["lm"]:
        lm["lm_head"] = P(None, "tp")
    specs = dict(specs)
    specs["lm"] = lm
    return specs


def param_shardings(params: dict, mesh: Mesh) -> Any:
    return jax.tree.map(lambda s: NamedSharding(mesh, s), param_pspecs(params),
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params: dict, mesh: Mesh) -> dict:
    """device_put the parameter tree with the TP shardings."""
    sh = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, sh)


def batch_shardings(mesh: Mesh, tree: Any) -> Any:
    """Shard every leaf's leading (batch) axis on dp."""
    def spec(x):
        nd = getattr(x, "ndim", 0)
        return NamedSharding(mesh, P("dp", *([None] * (nd - 1)))) if nd else NamedSharding(mesh, P())
    return jax.tree.map(spec, tree)
