"""Sharding specs for the VibeVoice parameter tree.

TP plan (TPU-native rendering of the reference's declarative tp_plan,
configuration_vibevoice.py:175-183):
  * attention q: colwise on "tp" (head split); k/v colwise too when the tp
    group size divides the KV-head count (`kv_tp=True`) — then the KV cache
    shards on its head axis and decode attention is fully shard-local; else
    KV stays replicated (GQA has only 2-4 KV heads)
  * o rowwise; MLP gate/up colwise, down rowwise
  * embeddings / lm_head replicated in compute (colwise_rep semantics)
  * everything else (norms, tokenizers, diffusion head, connectors) replicated
    — the conv tokenizers and AdaLN head are tiny relative to the LM
  * `fsdp=True` additionally shards the *stored* LM params (and therefore
    optimizer state, which follows params) on "dp" along a non-tp dimension;
    XLA all-gathers weights per use inside jit (FSDP/ZeRO-3 semantics)
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Qwen2DecoderConfig


def infer_kv_tp(cfg: Qwen2DecoderConfig, mesh: Mesh) -> bool:
    """KV-head tensor parallelism is usable when tp divides the KV-head count
    AND the q-head count (so q head groups stay aligned with their kv head)."""
    tp = mesh.shape.get("tp", 1)
    return (cfg.num_key_value_heads % tp == 0
            and cfg.num_attention_heads % tp == 0)


def rep_kv_decode_ok(cfg: Qwen2DecoderConfig, mesh: Mesh) -> bool:
    """Whether the replicated-KV sharded flash decode applies when kv_tp is
    unavailable: per-shard q-head slices must tile whole kv-head groups
    (hql % group == 0) or evenly subdivide one group (group % hql == 0) so
    each shard's heads attend a contiguous kv-head range
    (ops/flash_decode.flash_decode_attention_sharded, kv_head0/n_kv view).
    Covers every power-of-two tp for the real configs (1.5B 12q/2kv,
    7B 28q/4kv at tp in {2, 4}; 7B tp=8 falls back — 3.5 q heads/shard)."""
    tp = mesh.shape.get("tp", 1)
    hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    if tp == 1 or hq % tp != 0:
        return False
    hql, group = hq // tp, hq // hkv
    return hql % group == 0 or group % hql == 0


def _lm_layer_specs(kv_tp: bool, fsdp: bool) -> dict:
    dp = "dp" if fsdp else None
    kv = "tp" if kv_tp else None
    return {
        "ln1": P(),
        "wq": P(None, dp, "tp"), "bq": P(None, "tp"),
        "wk": P(None, dp, kv), "bk": P(None, kv),
        "wv": P(None, dp, kv), "bv": P(None, kv),
        "wo": P(None, "tp", dp),
        "ln2": P(),
        "wg": P(None, dp, "tp"),
        "wu": P(None, dp, "tp"),
        "wd": P(None, "tp", dp),
    }


def _is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf.keys()) == {"q", "s"}


def _is_quantized4(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf.keys()) == {"q4", "s4"}


def _is_quantized4c(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf.keys()) == {"q4c", "s4c"}


def _quantize_spec(spec: P) -> dict:
    """Spec for an int8 {q, s} leaf: q inherits the weight spec; the
    per-output-channel scale [..., out] keeps the leading and output axes."""
    return {"q": spec, "s": P(*([*spec][:-2] + [spec[-1]]))}


def _quantize_spec4(spec: P, leaf: dict) -> dict:
    """Spec for an int4 {q4, s4} / int4c {q4c, s4c} leaf: every member keeps
    the weight's [..., in, out] rank (q4's in-axis is nibble-halved, s4's is
    group-divided, s4c's is 1; _fit_spec drops any axis whose shard count no
    longer divides)."""
    return {k: spec for k in leaf}


def _colwise_spec4(leaf: dict) -> dict:
    """Column-parallel spec for an int4/int4c leaf: OUT (last) axis on tp,
    everything else replicated.  This is the serving layout when the Pallas
    sharded matmul is active (ops/int4.py int4_matmul_sharded): each tp shard
    holds a complete [in/2, out/tp] packed block, so the split-half nibble
    packing never crosses a shard boundary.  (The Megatron rowwise layout
    would shard the PACKED in-axis, whose rows interleave original rows j and
    j+in/2 — the per-shard kernel would need repacked bytes; column-parallel
    trades that for a small activation all-gather per rowwise-position
    matmul, negligible at decode batch sizes.)"""
    return {k: P(*([None] * (v.ndim - 1)), "tp") for k, v in leaf.items()}


def param_pspecs(params: dict, kv_tp: bool = False, fsdp: bool = False,
                 int4_colwise: bool = False) -> dict:
    """PartitionSpec pytree matching `vibevoice.init_params` structure
    (including int8 {q, s} and int4/int4c quantized leaves from ops/quant.py
    and ops/int4.py).  ``int4_colwise`` switches int4-family leaves to the
    column-parallel layout required by the sharded Pallas matmul."""
    dp = "dp" if fsdp else None
    specs: dict = jax.tree.map(lambda _: P(), params)
    lm = {"embed": P(dp, None), "norm": P(),
          "layers": dict(_lm_layer_specs(kv_tp, fsdp))}
    if "lm_head" in params["lm"]:
        lm["lm_head"] = P(dp, "tp")
    for k, leaf in params["lm"]["layers"].items():
        if _is_quantized(leaf):
            lm["layers"][k] = _quantize_spec(lm["layers"][k])
        elif _is_quantized4(leaf) or _is_quantized4c(leaf):
            lm["layers"][k] = (_colwise_spec4(leaf) if int4_colwise
                               else _quantize_spec4(lm["layers"][k], leaf))
    head_leaf = params["lm"].get("lm_head")
    if _is_quantized(head_leaf):
        lm["lm_head"] = _quantize_spec(lm["lm_head"])
    elif _is_quantized4(head_leaf) or _is_quantized4c(head_leaf):
        # lm_head is consumed via column gathers (constrained decode), not
        # the sharded kernel — keep it replicated under int4_colwise
        lm["lm_head"] = (_quantize_spec4(P(), head_leaf) if int4_colwise
                         else _quantize_spec4(lm["lm_head"], head_leaf))
    specs = dict(specs)
    specs["lm"] = lm
    return specs


def _fit_spec(x, spec: P, mesh: Mesh) -> P:
    """Drop mesh axes from a spec wherever the dimension isn't divisible by
    the axis size (e.g. fsdp on a dp=3 mesh with a 512-row embed) — the leaf
    falls back to replication on that axis instead of an error."""
    parts = []
    shape = getattr(x, "shape", ())
    for i, ax in enumerate(spec):
        if ax is None or i >= len(shape):
            parts.append(None)
            continue
        size = mesh.shape.get(ax, 1) if isinstance(ax, str) else 1
        parts.append(ax if size and shape[i] % size == 0 else None)
    return P(*parts)


def param_shardings(params: dict, mesh: Mesh, kv_tp: bool = False,
                    fsdp: bool = False, int4_colwise: bool = False) -> Any:
    specs = param_pspecs(params, kv_tp=kv_tp, fsdp=fsdp,
                         int4_colwise=int4_colwise)
    return jax.tree.map(
        lambda x, s: NamedSharding(mesh, _fit_spec(x, s, mesh)),
        params, specs)


def shard_params(params: dict, mesh: Mesh, kv_tp: bool = False,
                 fsdp: bool = False, int4_colwise: bool = False) -> dict:
    """device_put the parameter tree with the TP(/FSDP) shardings."""
    sh = param_shardings(params, mesh, kv_tp=kv_tp, fsdp=fsdp,
                         int4_colwise=int4_colwise)
    return jax.tree.map(jax.device_put, params, sh)


def kv_cache_pspec(kv_tp: bool, batch_on_dp: bool = True) -> P:
    """KV cache [L, B, Hkv, S, Dh]: batch on dp, heads on tp when kv_tp."""
    return P(None, "dp" if batch_on_dp else None,
             "tp" if kv_tp else None, None, None)


def batch_shardings(mesh: Mesh, tree: Any, axis_size: Optional[int] = None) -> Any:
    """Shard every leaf's leading (batch) axis on dp.

    If ``axis_size`` is given and not divisible by the dp size, leaves are
    replicated instead (safe fallback for odd inference batch sizes).
    """
    dp = mesh.shape.get("dp", 1)

    def spec(x):
        nd = getattr(x, "ndim", 0)
        if not nd:
            return NamedSharding(mesh, P())
        lead = x.shape[0] if axis_size is None else axis_size
        if lead % dp != 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P("dp", *([None] * (nd - 1))))
    return jax.tree.map(spec, tree)
