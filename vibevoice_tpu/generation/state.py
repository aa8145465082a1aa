"""Generation state carried through the scanned decode step.

The reference's generate loop keeps its state in Python objects mutated
per-sample (HF KV caches, dict conv caches, lists of chunks —
modeling_vibevoice_inference.py:386-422).  Here the whole loop state is one
fixed-shape pytree so the entire token step — LM decode (CFG-fused), diffusion
scan, streaming vocode, semantic re-encode — compiles to a single XLA program
and can be chunk-scanned on device.

Cache layout: one KV cache of batch 2B.  Rows [0, B) are the positive
(conditional) context, rows [B, 2B) the negative (CFG) context — so the
reference's two sequential LM forwards per token
(modeling_vibevoice_inference.py:477-480, 581-587) become one batched decode.
The negative context's per-sample *write pointer* replaces the reference's
KV shift-surgery (inference:588-622): a non-diffusing sample simply does not
advance its pointer, so the transiently written slot is overwritten next step
and masked out of attention.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from ..models.qwen2 import KVCache


class GenState(NamedTuple):
    # LM caches (batch 2B: [pos; neg])
    cache: KVCache
    kv_start: jax.Array       # [2B] first valid absolute index per row
    pos_len: jax.Array        # [B] int32: next write slot per positive row
                              # (per-sample so rows can join mid-flight —
                              # continuous batching; lockstep rows all equal)
    neg_ptr: jax.Array        # [B] next write slot for negative rows
    neg_init_ptr: jax.Array   # [B] reset target for neg_ptr on speech_start
                              # (= kv_start[b:] + negative-prompt length; the
                              # reference's 1-token reset, inference:546-563,
                              # generalized to arbitrary negative prompts)
    # last LM hidden states (pos/neg) for the *pending* token decision
    last_hidden: jax.Array    # [2B, H]
    # per-sample bookkeeping
    finished: jax.Array       # [B] bool
    reach_max: jax.Array      # [B] bool
    step: jax.Array           # scalar int32, 0-based loop step
    max_steps_per_sample: jax.Array  # [B] int32
    # streaming conv tokenizer states
    acoustic_state: dict      # decoder left-context buffers
    semantic_state: dict      # encoder left-context buffers
    # rng
    rng: jax.Array            # batch-level key (SDE solver noise only)
    row_rng: jax.Array        # [B, 2] uint32 per-row stream keys; per-step
                              # noise = fold_in(row key, pos_len) so a row's
                              # stream depends only on (its seed, its own
                              # position) — never on batch-mates or the
                              # global step (continuous-batching determinism)


class StepOutput(NamedTuple):
    tokens: jax.Array       # [B] int32 sampled this step
    audio: jax.Array        # [B, frame_samples] vocoded chunk, tokenizer
                            # compute dtype (bf16 at serving; hosts upcast)
    diffused: jax.Array     # [B] bool — audio valid this step
    finished: jax.Array     # [B] bool — post-step finished flags
    reach_max: jax.Array    # [B] bool — post-step budget-stop flags (carried
                            # per step so the host never re-fetches GenState:
                            # one device->host read costs ~30 ms on a
                            # tunneled chip, all of it per-call latency)
