"""VibeVoice generation: the token loop as a fused, scannable XLA step.

Re-architecture of the reference generate loop
(reference: modeling_vibevoice_inference.py:326-708) for TPU:

  * The CFG pair of LM forwards per token (inference:477-480 positive,
    :573-587 negative) is ONE batched decode over a 2B-row KV cache.
  * The reference's per-sample negative-cache shift surgery (inference:588-622)
    becomes a per-sample write pointer: a non-diffusing sample doesn't advance
    its pointer, so the transient slot is overwritten and masked out. The
    speech_start negative-context reset (inference:546-563) is a pointer reset.
  * Constrained decoding (VibeVoiceTokenConstraintProcessor, inference:53-66,
    403-418): instead of computing the full 152k-vocab lm_head and masking,
    logits are computed ONLY for the ~5 valid control tokens — a [H, 5]
    matvec per step instead of [H, 152k].
  * The per-token diffusion loop (inference:695-708) is a lax.scan over
    precomputed DPM-Solver coefficients with the CFG pair batched through the
    AdaLN head.
  * Streaming vocode + semantic re-encode (inference:633-662) are fixed-shape
    conv streaming steps carried in the state.
  * Everything above compiles into ONE step program, which is then scanned in
    chunks of K steps on device — the host syncs once per chunk, not per
    token/term check.

Host-visible behavior (termination, CFG semantics, token budget
``max_length_times``, per-sample EOS/max-step, audio chunk validity) matches
the reference contract.
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass
import functools
from functools import partial
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VibeVoiceConfig
from ..models import acoustic_tokenizer as tok
from ..models import connectors, diffusion_head, qwen2
from ..schedule.dpm_solver import DPMSolverConfig, make_schedule, sample_with_solver
from .state import GenState, StepOutput


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _round_cache(n: int) -> int:
    """Cache capacities: multiples of 4096 once big enough — the flash
    decode kernels sweep the cache in 4096-slot blocks of 512-slot
    split-softmax chains (ops/flash_decode.py _pick_block), and a capacity
    4096 divides keeps the big-block path; small caches stay at 256-slot
    granularity (≤ 12% padding either way)."""
    return _round_up(n, 4096 if n > 8192 else 256)


def _bucket_len(n: int, base: int = 64) -> int:
    """Quarter-octave shape bucket: round n up to the next multiple of
    2^ceil(log2(n))/4, floored at `base`.  Bounds the number of distinct
    compiled programs (4 buckets per size octave) while wasting at most 25%
    padding — the fix for the round-1 exact-shape recompile storm
    (one prefill program per distinct voice-prompt length)."""
    n = max(n, base)
    p = 1 << (n - 1).bit_length()          # next pow2 >= n
    step = max(p // 4, base)
    return _round_up(n, step)


@partial(jax.jit, static_argnames=("new_len",))
def _grow_cache_arrays(kv, new_len: int):
    def grow(a):
        # slot axis is 3 for [L,B,H,S,D] data, the last for
        # [L,B,H,1,S] scales (distinguished by the singleton at axis 3)
        ax = 3 if a.ndim == 5 and a.shape[3] != 1 else a.ndim - 1
        pad = [(0, 0)] * a.ndim
        pad[ax] = (0, new_len - a.shape[ax])
        return jnp.pad(a, pad)
    return jax.tree.map(grow, kv)


def _start_host_copies(out) -> None:
    """Enqueue async device->host copies for every chunk-output leaf the
    moment a chunk is dispatched.  ``np.asarray`` fetches leaves one at a
    time — on a tunneled device that serializes ~30 ms round-trips per
    chunk (measured; it dominated short-run wall time).  Async copies start
    as soon as the chunk finishes on device and run concurrently, so the
    blocking fetch finds the bytes already on the host."""
    for leaf in jax.tree.leaves(out):
        try:
            leaf.copy_to_host_async()
        except Exception:  # noqa: BLE001 — best-effort (sharded/CPU arrays)
            return


def _grow_cache(state: GenState, new_len: int) -> GenState:
    from ..models.qwen2 import KVCache
    k, v = _grow_cache_arrays((state.cache.k, state.cache.v), new_len)
    return state._replace(cache=KVCache(k=k, v=v))


def _scatter_voice_embeds(params, cfg: VibeVoiceConfig, lm_dtype, embeds_rows,
                          speech_tensors, speech_masks, speech_input_mask,
                          rng, scale_bias):
    """Voice-prompt acoustic latents -> connector -> scatter into the
    diffusion-pad slots (reference inference:149-176, 221-224).

    embeds_rows: [B, T, H] the positive prompt rows; speech_tensors: [N, S]
    waveforms; speech_masks: [N, F] valid frames; speech_input_mask: [B, T]
    True at diffusion-pad slots.  Returns embeds_rows with the k-th True slot
    holding the k-th valid frame's connector feature.
    """
    mean, _ = tok.encode(params["acoustic"]["encoder"], cfg.acoustic_tokenizer,
                         speech_tensors[..., None].astype(jnp.float32))
    lat = tok.sample_latents(rng, mean, cfg.acoustic_tokenizer.fix_std,
                             cfg.acoustic_tokenizer.std_dist_type)
    s, bia = scale_bias
    feats = (lat + bia) * s
    conn = connectors.apply(params["acoustic_connector"],
                            feats.astype(lm_dtype))  # [N, F, H]
    h = conn.shape[-1]
    flat = conn.reshape(-1, h)
    valid_frames = speech_masks.reshape(-1)
    order = jnp.argsort(~valid_frames, stable=True)
    compact = flat[order]
    pos_embeds = embeds_rows.reshape(-1, h)
    tok_mask = speech_input_mask.reshape(-1)
    idx = jnp.clip(jnp.cumsum(tok_mask) - 1, 0, compact.shape[0] - 1)
    pos_embeds = jnp.where(tok_mask[:, None], compact[idx], pos_embeds)
    return pos_embeds.reshape(embeds_rows.shape)


@dataclass
class VibeVoiceGenerationOutput:
    """Mirror of the reference output (inference:39-51)."""
    sequences: np.ndarray                     # [B, steps] generated control tokens
    speech_outputs: List[Optional[np.ndarray]]  # per-sample 24 kHz waveform
    reach_max_step_sample: np.ndarray         # [B] bool


class VibeVoiceGenerator:
    """Stateless-parameters generator; jitted programs cached per shape bucket.

    Pass ``mesh`` (a ``jax.sharding.Mesh`` with axes ("dp", "tp")) to serve
    sharded: LM params get the TP plan (reference tp_plan,
    configuration_vibevoice.py:175-183), the KV cache shards on its head axis
    when tp divides the KV-head count, and batches shard on dp.  This is the
    path that makes 7B bf16 servable (weights + 32k KV do not fit one chip).
    """

    def __init__(self, params: dict, cfg: VibeVoiceConfig, tokenizer,
                 ddpm_inference_steps: Optional[int] = None,
                 solver: Optional[DPMSolverConfig] = None,
                 lm_dtype=None, mesh=None, kv_quant: bool = False,
                 prefix_cache: int = 0,
                 prefill_w8a8: Optional[bool] = None):
        from ..utils.compilation_cache import enable_persistent_compilation_cache
        enable_persistent_compilation_cache()
        if lm_dtype is None:
            # follow the parameter dtype (fp32 params + bf16 activations
            # would silently promote and break the KV-cache/scan dtypes)
            embed = params["lm"]["embed"]
            lm_dtype = (jnp.bfloat16 if isinstance(embed, dict)
                        else embed.dtype)
        self.mesh = mesh
        self.kv_tp = False
        # trace-time int4 dispatch, scoped to THIS generator's jit traces
        # (ops/int4.py impl_scope): meshed GSPMD programs trace under 'xla'
        # because GSPMD cannot auto-partition a pallas_call — but the decode
        # step's quantized LM matmuls route through the per-shard Pallas
        # wrapper (int4_matmul_sharded), so the quant speed tier survives
        # sharded serving; other generators in the process are unaffected.
        self._int4_impl = "xla" if mesh is not None else "auto"
        if mesh is not None:
            from ..ops.quant import unfuse_gate_up, unfuse_lm_projections
            from ..parallel.sharding import infer_kv_tp, shard_params
            # params may come from a single-device generator, which fuses
            # wqkv/wgu (and stacks tokenizer stages) at construction; the TP
            # plan shards q and kv head groups separately, so undo the
            # serving fusions before sharding
            dcfg = cfg.decoder
            hd = dcfg.resolved_head_dim
            params = dict(params)
            params["lm"] = unfuse_lm_projections(
                params["lm"], dcfg.num_attention_heads * hd,
                dcfg.num_key_value_heads * hd)
            params["diffusion_head"] = {
                **params["diffusion_head"],
                "layers": unfuse_gate_up(params["diffusion_head"]["layers"])}
            params["acoustic"] = {
                **params["acoustic"],
                "decoder": tok.unstack_tokenizer_stages(
                    params["acoustic"]["decoder"])}
            params["semantic"] = tok.unstack_tokenizer_stages(
                params["semantic"])
            self.kv_tp = infer_kv_tp(cfg.decoder, mesh)
            params = shard_params(params, mesh, kv_tp=self.kv_tp,
                                  int4_colwise=True)
        elif os.environ.get("VIBEVOICE_FUSE_PROJ", "1") == "1":
            # single-device serving: fuse qkv and gate|up into single
            # stacked matmuls (ops/quant.fuse_lm_projections) — identical
            # outputs, 3 fewer per-layer dispatches in the decode step.
            # Meshed serving keeps the unfused layout (the TP plan shards q
            # and kv head groups separately).
            from ..ops.quant import (fuse_diffusion_head_projections,
                                     fuse_lm_projections)
            params = dict(params)
            params["lm"] = fuse_lm_projections(params["lm"])
            params["diffusion_head"] = fuse_diffusion_head_projections(
                params["diffusion_head"])
        if mesh is None and os.environ.get("VIBEVOICE_FUSE_STAGE", "0") == "1":
            # opt-in: stack int4c-quantized tokenizer stages for the fused
            # streaming kernel (ops/convnext_stage.py) — one pallas call per
            # stage per generated frame instead of 2*depth matmul calls +
            # op soup.  Default OFF: an r4 end-to-end A/B on v5e measured it
            # a wash (36.1 vs 35.8 int4 RTF) — the step is HBM-bound and
            # inter-op device idle is ~0.06 ms/step, so collapsing calls
            # buys nothing the per-block Pallas matmuls don't already get
            params = dict(params)
            params["acoustic"] = {
                **params["acoustic"],
                "decoder": tok.stack_tokenizer_stages(
                    params["acoustic"]["decoder"])}
            params["semantic"] = tok.stack_tokenizer_stages(params["semantic"])
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.lm_dtype = lm_dtype
        self.ddpm_steps = ddpm_inference_steps or cfg.diffusion_head.ddpm_num_inference_steps
        # demos run sde-dpmsolver++ (reference demo/gradio_demo.py:173-179,
        # main.py:543-548); cosine == squaredcos_cap_v2 here.
        self.solver_cfg = solver or DPMSolverConfig(
            num_train_timesteps=cfg.diffusion_head.ddpm_num_steps,
            beta_schedule=cfg.diffusion_head.ddpm_beta_schedule,
            prediction_type=cfg.diffusion_head.prediction_type,
            algorithm_type="sde-dpmsolver++", solver_order=2)
        self.sched = make_schedule(self.solver_cfg, self.ddpm_steps)
        tk = tokenizer
        # constrained-decode token set {start, end, diffusion, eos, bos}
        # (reference modeling_vibevoice_inference.py:403-418); Qwen2.5 sets
        # bos == eos, in which case the set collapses to 4 ids
        vid = [tk.speech_start_id, tk.speech_end_id, tk.speech_diffusion_id,
               tk.eos_id]
        bos = getattr(tk, "bos_id", tk.eos_id)
        if bos is not None and bos not in vid:
            vid.append(bos)
        # numpy on purpose: closed over by the jitted step (see make_schedule)
        self.valid_ids = np.asarray(vid, np.int32)
        self.frame_samples = cfg.acoustic_tokenizer.total_stride
        # conv tokenizer compute dtype = its param dtype (bf16 at serving);
        # an int8-quantized {"q","s"} stem means the bf16 serving tier
        stem_w = params["acoustic"]["decoder"]["stem"]["w"]
        self.tok_dtype = (jnp.bfloat16 if isinstance(stem_w, dict)
                          else stem_w.dtype)
        # flash decode only reads the [kv_start, kv_len) live range, so the
        # cache can be allocated at final size with no growth recompiles; a
        # pallas_call cannot be auto-partitioned by GSPMD, so meshed serving
        # maps the kernel per-shard with shard_map ('pallas_shmap')
        import os as _os
        on_tpu = jax.default_backend() == "tpu"
        if mesh is not None:
            # meshed: per-shard kernel via shard_map — head-sharded cache
            # when kv_tp, replicated-KV head-offset view otherwise (1.5B's
            # 2 kv heads at tp=4 previously fell back to full-buffer XLA
            # reads, ~2x decode HBM traffic at depth)
            from ..parallel.sharding import rep_kv_decode_ok
            meshed_impl = ("pallas_shmap"
                           if self.kv_tp or rep_kv_decode_ok(cfg.decoder, mesh)
                           else "xla")
        self.decode_impl = _os.environ.get("VIBEVOICE_DECODE_IMPL") or (
            meshed_impl if mesh is not None
            else ("pallas" if on_tpu else "xla"))
        # int8 KV cache (opt-in): halves per-step KV HBM traffic at depth
        # and halves cache memory (long-context tier).  Served everywhere:
        # solo, through the engine (splice/park tree-map over the {"q","s"}
        # leaves), and TP/DP-sharded (the shard_map decode wrapper carries
        # per-vector scales on the same (dp, tp) axes as the data).
        self.kv_quant = bool(kv_quant) or _os.environ.get(
            "VIBEVOICE_KV8", "0") == "1"
        # quantized-compute prefill (W8A8 dots for int8 weight leaves) —
        # scoped to the PREFILL programs' traces only; decode keeps W8A16.
        # The long-prompt TTFA lever: prefill linear FLOPs run the MXU's
        # native s8xs8 mode at 2x the bf16 rate.  Tri-state:
        #   None (default) = AUTO — on for prompts past ``prefill_chunk``
        #     when the LM stack carries quantized leaves (the long-prompt
        #     serving default; accuracy gated by tests/test_quant.py's
        #     W8A8 ladder + the long-prompt token-parity gate);
        #   True/VIBEVOICE_PREFILL_W8A8=1 = always; False/=0 = never
        #     (the bf16-prefill escape hatch).
        # Irrelevant to dense/bf16 stacks (no int8 leaves).
        env_w8a8 = _os.environ.get("VIBEVOICE_PREFILL_W8A8")
        if env_w8a8 is not None:
            self.prefill_w8a8: Optional[bool] = env_w8a8 == "1"
        else:
            self.prefill_w8a8 = prefill_w8a8
        # prompts longer than this prefill in fixed segments (activation
        # memory ∝ segment, not prompt — the 7B/30k-prompt OOM guard)
        self.prefill_chunk = int(_os.environ.get(
            "VIBEVOICE_PREFILL_CHUNK", "4096"))
        self._prefill_jit: Dict[Any, Callable] = {}
        self._rng_jit: Dict[int, Callable] = {}
        self._chunk_jit: Dict[Any, Callable] = {}
        # streaming-cadence support (bounded max_gap_s mode): chunk programs
        # known-compiled, AOT executables built off-thread, and the in-flight
        # background compile set.  See generate()'s ladder policy.
        self._chunk_ready: set = set()
        self._chunk_raw: Dict[Any, Callable] = {}
        self._chunk_aot: Dict[Any, Callable] = {}
        self._chunk_compiling: set = set()
        self._assemble_jit: Dict[int, Callable] = {}
        self.last_metrics: Dict[str, dict] = {}
        # voice-prompt prefix cache (opt-in): repeat voices skip the acoustic
        # encode + prefix LM forward (generation/prefix_cache.py).  Scope is
        # deliberate, not incidental:
        #   * b=1 only — the serving shape: the engine prefills every request
        #     at b=1 before splicing it into the live batch, so engine
        #     traffic always qualifies; batched b>1 generate() is the offline
        #     path where the encode amortizes over the batch anyway.
        #   * single device — the stored K/V block is a host-shaped array;
        #     transplanting into a TP-sharded cache would need per-shard
        #     entries.  Meshed generators silently take the full prefill
        #     (identical output, tested in test_feature_matrix.py).
        #   * voice section <= prefill_chunk (4096 tokens ≈ 9 min of voice
        #     audio at 7.5 tok/s) — far beyond any realistic voice prompt;
        #     longer sections take the chunked full prefill.
        pc_n = int(prefix_cache or _os.environ.get("VIBEVOICE_PREFIX_CACHE", "0"))
        self.prefix_cache = None
        if pc_n > 0:
            from .prefix_cache import PrefixCache
            self.prefix_cache = PrefixCache(pc_n)
        self._prefix_jit: Dict[Any, Callable] = {}
        self._suffix_jit: Dict[Any, Callable] = {}

    def _use_w8a8_prefill(self, prompt_len: int) -> bool:
        """Resolve the tri-state prefill_w8a8 flag for a prompt of
        ``prompt_len`` (bucketed) tokens: AUTO turns quantized-compute
        prefill on past ``prefill_chunk`` when the LM stack actually has
        quantized leaves (W8A8 over dense bf16 weights would quantize
        weights on the fly per step — slower AND less accurate)."""
        if self.prefill_w8a8 is not None:
            return bool(self.prefill_w8a8)
        if prompt_len <= self.prefill_chunk:
            return False
        if not hasattr(self, "_lm_has_quant"):
            from ..ops.int4 import is_quantized_int4, is_quantized_int4c
            from ..ops.quant import is_quantized
            self._lm_has_quant = any(
                is_quantized(v) or is_quantized_int4(v) or is_quantized_int4c(v)
                for v in self.params["lm"]["layers"].values())
        return self._lm_has_quant

    def _resident_head_ok(self, b: int) -> bool:
        """Trace-time gate for the VMEM-resident diffusion solver kernel
        (ops/diffusion_resident.py): int4c head FFN stack under the VMEM
        budget, thresholding off, shapes aligned."""
        try:
            from ..ops.diffusion_resident import resident_solver_eligible
            hp = self.params["diffusion_head"]
            return resident_solver_eligible(
                hp["layers"], self.sched, hp["noisy_proj"],
                hp["final_linear"], 2 * b)
        except Exception:  # noqa: BLE001 — malformed/partial head params
            return False

    def set_ddpm_inference_steps(self, num_steps: Optional[int] = None) -> None:
        """Reference API parity (inference:146-147). Rebuilds the schedule."""
        self.ddpm_steps = num_steps or self.cfg.diffusion_head.ddpm_num_inference_steps
        self.sched = make_schedule(self.solver_cfg, self.ddpm_steps)
        self._clear_chunk_programs()

    def set_solver(self, **overrides) -> None:
        import dataclasses as dc
        self.solver_cfg = dc.replace(self.solver_cfg, **overrides)
        self.sched = make_schedule(self.solver_cfg, self.ddpm_steps)
        self._clear_chunk_programs()

    def _clear_chunk_programs(self) -> None:
        self._chunk_jit.clear()
        self._chunk_raw.clear()
        self._chunk_aot.clear()
        self._chunk_ready.clear()

    def _scoped(self, fn):
        """Run ``fn`` (a jitted callable) under this generator's int4 impl
        scope — dispatch inside ops/int4.py happens at TRACE time, so the
        scope only matters on a call that triggers compilation; steady-state
        calls hit the jit cache through a ~100 ns contextvar set/reset."""
        from ..ops import int4
        impl = self._int4_impl

        @functools.wraps(fn)
        def wrapped(*a, **k):
            with int4.impl_scope(impl):
                return fn(*a, **k)

        return wrapped

    # ------------------------------------------------------------------
    # sharding helpers
    # ------------------------------------------------------------------
    def _rng_setup(self, b: int, base):
        """(split + per-row fold_in) as ONE cached jitted dispatch.

        Eager `jax.random.split` / `vmap(fold_in)` re-trace on every
        generate() call (vmap has no persistent eager cache) — r4 profiling
        measured ~8 ms of host time per call in exactly these two lines,
        all of it TTFA.  Bit-identical to the eager ops (threefry is
        deterministic under jit), so golden sequences are unchanged.
        Contract preserved: row i <- fold_in(post-split base, i), so b=1
        gets fold_in(base, 0) — identical solo or spliced into an engine
        slot."""
        if b not in self._rng_jit:
            @jax.jit
            def f(key):
                rng2, k_pre = jax.random.split(key)
                row = jax.vmap(jax.random.fold_in)(
                    jnp.broadcast_to(jnp.asarray(rng2, jnp.uint32), (b, 2)),
                    jnp.arange(b, dtype=jnp.uint32))
                return rng2, k_pre, row
            self._rng_jit[b] = f
        return self._rng_jit[b](base)

    def _put_batched(self, tree):
        """device_put leaves with their leading axis on dp (replicate when the
        axis isn't divisible); identity without a mesh."""
        if self.mesh is None:
            return tree
        from ..parallel.sharding import batch_shardings
        sh = batch_shardings(self.mesh, tree)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, s) if x is not None else None,
            tree, sh, is_leaf=lambda x: x is None)

    def _cache_sharding(self, b2: int, ndim: int = 5):
        """NamedSharding for a cache leaf: the 5-D [L,B,Hkv,S,Dh] data and
        the [L,B,Hkv,1,S] per-vector scales of a quantized cache share the
        spec (dp on batch, tp on heads, nothing on the trailing axes)."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec
        from ..parallel.sharding import kv_cache_pspec
        batch_on_dp = b2 % self.mesh.shape.get("dp", 1) == 0
        spec = kv_cache_pspec(self.kv_tp, batch_on_dp)
        if ndim == 4:
            spec = PartitionSpec(*tuple(spec)[:4])
        return NamedSharding(self.mesh, spec)

    # ------------------------------------------------------------------
    # scaling factors
    # ------------------------------------------------------------------
    @staticmethod
    def _scale_bias(params):
        s = params["speech_scaling_factor"]
        b = params["speech_bias_factor"]
        s = jnp.where(jnp.isnan(s), 1.0, s).astype(jnp.float32)
        b = jnp.where(jnp.isnan(b), 0.0, b).astype(jnp.float32)
        return s, b

    # ------------------------------------------------------------------
    # Prefill
    # ------------------------------------------------------------------
    def _build_prefill(self, t_bucket: int, cache_len: int, has_speech: bool,
                       neg_bucket: Optional[int] = None):
        cfg = self.cfg

        def prefill_fn(params, ids2b, valid2b, speech_tensors, speech_masks,
                       speech_input_mask, rng):
            b2 = ids2b.shape[0]
            b = b2 // 2
            embeds = qwen2.embed_tokens(params["lm"], ids2b).astype(self.lm_dtype)
            if has_speech:
                embeds = embeds.at[:b].set(_scatter_voice_embeds(
                    params, cfg, self.lm_dtype, embeds[:b], speech_tensors,
                    speech_masks, speech_input_mask, rng,
                    self._scale_bias(params)))

            cache = qwen2.init_kv_cache(cfg.decoder, b2, cache_len,
                                        self.lm_dtype, quant=self.kv_quant)
            if self.mesh is not None:
                cache = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, self._cache_sharding(b2, x.ndim)), cache)
            if (t_bucket > self.prefill_chunk and
                    t_bucket % self.prefill_chunk == 0 and self.mesh is None):
                # long prompts: segmented prefill bounds activation memory
                # (the 7B 30k-prompt OOM) — one program for any segment count
                last, cache = qwen2.prefill_chunked(
                    params["lm"], cfg.decoder, embeds, valid2b, cache,
                    self.prefill_chunk)
                return last, cache
            hidden, cache = qwen2.prefill(params["lm"], cfg.decoder, embeds,
                                          valid2b, cache)
            return hidden[:, -1, :], cache

        def prefill_split_fn(params, ids_pos, valid_pos, ids_neg, valid_neg,
                             speech_tensors, speech_masks, speech_input_mask,
                             rng):
            """Long-prompt prefill with the CFG-negative rows split out: the
            negative context is a handful of tokens, but the joint [2B,
            t_bucket] program computes its full left padding — at 40k tokens
            that DOUBLES prefill FLOPs (r3: longform_64k_ttfa 3.68 s, half
            of it the padded negative row).  Here the positive rows run the
            segmented prefill into rows [0, B) of the 2B-row cache (the
            cache-write DUS and the cached-flash grid only touch q's rows),
            and the negative rows run a tiny [B, neg_bucket] prefill whose
            block is inserted at rows [B, 2B), slots [0, neg_bucket).  The
            decode step's per-row kv_start/neg_ptr make the slot base an
            implementation detail (positions = slot - kv_start)."""
            b = ids_pos.shape[0]
            embeds = qwen2.embed_tokens(params["lm"], ids_pos).astype(self.lm_dtype)
            if has_speech:
                embeds = _scatter_voice_embeds(
                    params, cfg, self.lm_dtype, embeds, speech_tensors,
                    speech_masks, speech_input_mask, rng,
                    self._scale_bias(params))
            cache = qwen2.init_kv_cache(cfg.decoder, 2 * b, cache_len,
                                        self.lm_dtype, quant=self.kv_quant)
            last_pos, cache = qwen2.prefill_chunked(
                params["lm"], cfg.decoder, embeds, valid_pos, cache,
                self.prefill_chunk)

            neg_embeds = qwen2.embed_tokens(
                params["lm"], ids_neg).astype(self.lm_dtype)
            neg_cache = qwen2.init_kv_cache(cfg.decoder, b, neg_bucket,
                                            self.lm_dtype, quant=self.kv_quant)
            hidden_neg, neg_cache = qwen2.prefill(
                params["lm"], cfg.decoder, neg_embeds, valid_neg, neg_cache)

            def insert(big, small):
                return jax.lax.dynamic_update_slice(
                    big, small, (0, b) + (0,) * (small.ndim - 2))

            cache = qwen2.KVCache(
                k=jax.tree.map(insert, cache.k, neg_cache.k),
                v=jax.tree.map(insert, cache.v, neg_cache.v))
            last = jnp.concatenate([last_pos, hidden_neg[:, -1, :]], axis=0)
            return last, cache

        if neg_bucket is not None:
            return jax.jit(prefill_split_fn)
        return jax.jit(prefill_fn)

    # ------------------------------------------------------------------
    # Voice-prompt prefix cache (generation/prefix_cache.py)
    # ------------------------------------------------------------------
    def _negative_rows(self, b: int, width: int, dtype, negative_prompt_ids,
                       negative_prompt_attention_mask):
        """CFG-negative context rows, right-aligned at ``width``: a single
        speech_start token by default (inference:377-384), or the tokenized
        negative prompt."""
        tk = self.tokenizer
        neg_ids = np.full((b, width), tk.pad_id, dtype)
        neg_valid = np.zeros((b, width), bool)
        neg_lens = np.ones((b,), np.int64)
        if negative_prompt_ids is not None:
            nids = np.asarray(negative_prompt_ids)
            if nids.ndim == 1:
                nids = nids[None, :]
            if nids.shape[0] == 1 and b > 1:
                nids = np.broadcast_to(nids, (b, nids.shape[1]))
            nmask = (np.asarray(negative_prompt_attention_mask)
                     if negative_prompt_attention_mask is not None
                     else np.ones_like(nids))
            for i in range(b):
                row = nids[i][nmask[i].astype(bool)][-width:]
                ln = len(row)
                neg_ids[i, width - ln:] = row
                neg_valid[i, width - ln:] = True
                neg_lens[i] = ln
        else:
            neg_ids[:, -1] = tk.speech_start_id
            neg_valid[:, -1] = True
        return neg_ids, neg_valid, neg_lens

    def _build_prefix_prefill(self, pb: int):
        """Jitted prefill of ONLY the voice-prompt prefix (b=1, right-aligned
        in a [1, pb] bucket): voice encode + scatter + LM forward, returning
        the filled [L, 1, Hkv, pb, Dh] cache."""
        cfg = self.cfg

        def prefix_fn(params, ids, valid, speech_tensors, speech_masks,
                      speech_input_mask, rng):
            embeds = qwen2.embed_tokens(params["lm"], ids).astype(self.lm_dtype)
            embeds = _scatter_voice_embeds(
                params, cfg, self.lm_dtype, embeds, speech_tensors,
                speech_masks, speech_input_mask, rng, self._scale_bias(params))
            cache = qwen2.init_kv_cache(cfg.decoder, 1, pb, self.lm_dtype,
                                        quant=self.kv_quant)
            _, cache = qwen2.prefill(params["lm"], cfg.decoder, embeds,
                                     valid, cache)
            return cache

        return jax.jit(prefix_fn)

    def _build_suffix_prefill(self, s_bucket: int, cache_len: int):
        """Jitted suffix prefill: the script tokens (and the CFG-negative row)
        run as one [2, s_bucket] block against a cache already holding the
        transplanted prefix.  block_off is traced, so one program serves any
        prompt bucket at this (s_bucket, cache_len)."""
        cfg = self.cfg

        def suffix_fn(params, ids2b, valid2b, pos0, kv_start, block_off, cache):
            embeds = qwen2.embed_tokens(params["lm"], ids2b).astype(self.lm_dtype)
            return qwen2.prefill_suffix(params["lm"], cfg.decoder, embeds,
                                        valid2b, pos0, cache, block_off,
                                        kv_start)

        return jax.jit(suffix_fn, donate_argnums=(6,))

    def _prefill_state_prefix(self, ids, attn, speech_tensors, speech_masks,
                              speech_input_mask, negative_prompt_ids,
                              negative_prompt_attention_mask, rng,
                              t_bucket: int, cache_len: int,
                              max_steps_per_sample, timer) -> Optional[GenState]:
        """Prefix-cached prefill (b=1).  Returns None when the prompt is not
        eligible (no voice section, unexpected layout, oversized prefix) —
        the caller falls back to the full prefill.

        Layout invariant: the prompt's real tokens occupy cache slots
        [t_bucket - init_len, t_bucket), prefix first.  The prefix K/V block
        is transplanted at kv_start (positions 0..P-1 are pad-independent:
        qwen2.prefill counts positions from the first valid token), then the
        suffix block [2, s_bucket] right-aligned at t_bucket runs through
        prefill_suffix, whose masked write cannot clobber the transplant.
        On a miss the same transplant + suffix programs run after a
        prefix-only prefill populates the store — hit and miss are therefore
        bitwise identical.
        """
        pc = self.prefix_cache
        tk = self.tokenizer
        cfg = self.cfg
        b, t0 = ids.shape
        init_len = attn.sum(axis=-1)
        smask = np.asarray(speech_input_mask, bool)
        if smask.shape != ids.shape or not smask.any():
            return None
        start = int(t0 - init_len[0])
        last_true = int(np.nonzero(smask[0])[0].max())
        # the voice section ends with speech_end + "\n" after the final
        # diffusion pad (processor._create_voice_prompt; reference
        # vibevoice_processor.py:391-444)
        prefix_end = last_true + 3
        if prefix_end >= t0:                       # no suffix tokens
            return None
        if int(ids[0, last_true + 1]) != tk.speech_end_id:
            return None                            # unexpected prompt layout
        p_len = prefix_end - start
        if p_len < 1:
            return None
        pb = _bucket_len(p_len, 64)
        if pb > self.prefill_chunk:
            return None                            # oversized voice section

        # bucket the voice-prompt frames exactly like the full prefill so
        # both paths see identical speech shapes
        speech_tensors = np.asarray(speech_tensors, np.float32)
        speech_masks_b = np.asarray(speech_masks, bool)
        n_frames = speech_masks_b.shape[1]
        fb = _bucket_len(n_frames, 8)
        if fb != n_frames:
            speech_tensors = np.pad(
                speech_tensors,
                ((0, 0), (0, max(0, fb * self.frame_samples
                                 - speech_tensors.shape[1]))))
            speech_masks_b = np.pad(speech_masks_b, ((0, 0), (0, fb - n_frames)))

        prefix_ids = np.asarray(ids[0, start:prefix_end])
        key = pc.key(prefix_ids, speech_tensors, speech_masks_b, self.kv_quant)
        entry = pc.get(key)
        if entry is None:
            pad_id = tk.pad_id
            ids_p = np.full((1, pb), pad_id, ids.dtype)
            ids_p[0, pb - p_len:] = prefix_ids
            valid_p = np.zeros((1, pb), bool)
            valid_p[0, pb - p_len:] = True
            smask_p = np.zeros((1, pb), bool)
            smask_p[0, pb - p_len:] = smask[0, start:prefix_end]
            pj_key = (pb, speech_tensors.shape)
            if pj_key not in self._prefix_jit:
                self._prefix_jit[pj_key] = self._scoped(self._build_prefix_prefill(pb))
            # latent rng from the prefix content, NOT the request seed: the
            # stored K/V must be request-independent
            k_lat = jnp.asarray(pc.latent_rng_key(key), jnp.uint32)
            from ..ops.quant import current_w8a8, w8a8_scope
            with timer.stage("prefix_prefill"), w8a8_scope(
                    self._use_w8a8_prefill(pb) or current_w8a8()):
                cache_p = self._prefix_jit[pj_key](
                    self.params, jnp.asarray(ids_p), jnp.asarray(valid_p),
                    jnp.asarray(speech_tensors), jnp.asarray(speech_masks_b),
                    jnp.asarray(smask_p), k_lat)
            # store only the live tail [pb - p_len, pb)
            def tail(a):
                sl = [slice(None)] * a.ndim
                ax = 3 if a.ndim == 5 and a.shape[3] != 1 else a.ndim - 1
                sl[ax] = slice(pb - p_len, pb)
                return a[tuple(sl)]
            entry = {"k": jax.tree.map(tail, cache_p.k),
                     "v": jax.tree.map(tail, cache_p.v),
                     "p_len": p_len}
            pc.put(key, entry)
        if entry["p_len"] != p_len:                # hash collision guard
            return None

        # ---- transplant + suffix prefill ----
        s_real = int(init_len[0]) - p_len
        neg_ids_t, neg_valid_t, neg_lens = self._negative_rows(
            b, t_bucket, ids.dtype, negative_prompt_ids,
            negative_prompt_attention_mask)
        s_bucket = min(_bucket_len(max(s_real, int(neg_lens.max()), 8), 64),
                       t_bucket)
        block_off = t_bucket - s_bucket

        pad_id = tk.pad_id
        ids2b = np.full((2, s_bucket), pad_id, ids.dtype)
        valid2b = np.zeros((2, s_bucket), bool)
        ids2b[0, s_bucket - s_real:] = ids[0, prefix_end:]
        valid2b[0, s_bucket - s_real:] = True
        ids2b[1] = neg_ids_t[0, t_bucket - s_bucket:]
        valid2b[1] = neg_valid_t[0, t_bucket - s_bucket:]
        pos0 = np.array([p_len, 0], np.int32)
        kv_start2 = np.array([t_bucket - int(init_len[0]),
                              t_bucket - int(neg_lens[0])], np.int32)

        # same split as the full path; k_pre unused (latents from the store)
        rng, _k_pre, row_rng = self._rng_setup(b, rng)

        sj_key = (s_bucket, cache_len)
        if sj_key not in self._suffix_jit:
            self._suffix_jit[sj_key] = self._scoped(self._build_suffix_prefill(
                s_bucket, cache_len))
        from ..ops.quant import current_w8a8, w8a8_scope
        with timer.stage("prefill"), w8a8_scope(
                self._use_w8a8_prefill(s_bucket) or current_w8a8()):
            cache = qwen2.init_kv_cache(cfg.decoder, 2 * b, cache_len,
                                        self.lm_dtype, quant=self.kv_quant)
            kvs = int(kv_start2[0])

            def put(dst, blk, scale: bool):
                idx = (0, 0, 0, 0, kvs) if scale else (0, 0, 0, kvs, 0)
                return jax.lax.dynamic_update_slice(dst, blk, idx)

            if self.kv_quant:
                k = {"q": put(cache.k["q"], entry["k"]["q"], False),
                     "s": put(cache.k["s"], entry["k"]["s"], True)}
                v = {"q": put(cache.v["q"], entry["v"]["q"], False),
                     "s": put(cache.v["s"], entry["v"]["s"], True)}
            else:
                k = put(cache.k, entry["k"], False)
                v = put(cache.v, entry["v"], False)
            cache = qwen2.KVCache(k=k, v=v)
            last_hidden, cache = self._suffix_jit[sj_key](
                self.params, ids2b, valid2b, pos0, kv_start2,
                np.int32(block_off), cache)
            jax.block_until_ready(last_hidden)
        timer.totals["prefix_cache_hit"] = float(
            "prefix_prefill" not in timer.totals)
        return self._assemble_state(b, t_bucket, init_len, neg_lens,
                                    last_hidden, cache, rng, row_rng,
                                    max_steps_per_sample)

    # ------------------------------------------------------------------
    # One generation step (sample -> bookkeeping -> diffuse -> vocode -> LM)
    # ------------------------------------------------------------------
    def _make_step(self, do_sample: bool, temperature: float, top_p: float,
                   refresh_negative: bool, top_k: int = 0):
        cfg = self.cfg
        sched = self.sched
        valid_ids = self.valid_ids
        eos = self.tokenizer.eos_id
        start_id = self.tokenizer.speech_start_id
        end_id = self.tokenizer.speech_end_id
        diff_id = self.tokenizer.speech_diffusion_id

        def step(params, state: GenState, cfg_scale):
            # [H, n_valid] slice of the lm head — constrained decoding without
            # the full-vocab matmul (row gather: no embed.T materialization)
            w_valid = qwen2.lm_head_rows(params["lm"], valid_ids).T.astype(jnp.float32)
            b2 = state.last_hidden.shape[0]
            b = b2 // 2
            rng = state.rng
            # per-row keys: noise = f(row key, row position) only — rows are
            # reproducible regardless of batch-mates / global step (the
            # continuous-batching contract; see GenState.row_rng)
            step_keys = jax.vmap(jax.random.fold_in)(state.row_rng,
                                                     state.pos_len)
            k_tok_rows = jax.vmap(jax.random.fold_in)(
                step_keys, jnp.ones((b,), jnp.uint32))
            k_lat_rows = jax.vmap(jax.random.fold_in)(
                step_keys, jnp.full((b,), 2, jnp.uint32))
            pos_h = state.last_hidden[:b]
            neg_h = state.last_hidden[b:]

            # ---- constrained token sampling --------------------------------
            # stage_* named scopes land in XLA op metadata so a profiled run
            # can attribute device time per stage (bench step_frac_* keys,
            # utils/profile_report.aggregate_stages)
            scope = jax.named_scope
            logits = pos_h.astype(jnp.float32) @ w_valid           # [B, n_valid]
            if do_sample:
                logits = logits / max(temperature, 1e-5)
                if top_k and top_k < logits.shape[-1]:
                    # top_k over the constrained set (reference main.py:1195
                    # passes top_k into sampling over the full vocab; the
                    # constrained set makes this a k-of-n_valid cutoff)
                    kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
                    logits = jnp.where(logits >= kth, logits, -jnp.inf)
                if top_p < 1.0:
                    probs = jax.nn.softmax(logits, axis=-1)
                    sorted_p = jnp.sort(probs, axis=-1)[:, ::-1]
                    csum = jnp.cumsum(sorted_p, axis=-1)
                    # number of tokens needed to reach top_p mass
                    k_keep = jnp.sum(csum - sorted_p < top_p, axis=-1, keepdims=True)
                    ranks = jnp.argsort(jnp.argsort(-logits, axis=-1), axis=-1)
                    logits = jnp.where(ranks < k_keep, logits, -jnp.inf)
                idx = jax.vmap(jax.random.categorical)(k_tok_rows, logits)
            else:
                idx = jnp.argmax(logits, axis=-1)
            token = jnp.asarray(valid_ids)[idx]
            token = jnp.where(state.finished, eos, token)

            # ---- termination bookkeeping (inference:517-537) ----------------
            finished = state.finished | (token == eos)
            hit_max = (~finished) & (state.step >= state.max_steps_per_sample)
            finished = finished | hit_max
            reach_max = state.reach_max | hit_max
            token = jnp.where(hit_max, eos, token)

            # speech_end zeroes both conv caches (inference:539-544); select
            # (not multiply) so the state dtype is preserved (bf16 at serving)
            end3 = (token == end_id)[:, None, None]
            ac_state = jax.tree.map(
                lambda s: jnp.where(end3, jnp.zeros((), s.dtype), s),
                state.acoustic_state)
            sem_state = jax.tree.map(
                lambda s: jnp.where(end3, jnp.zeros((), s.dtype), s),
                state.semantic_state)

            start_mask = (~finished) & (token == start_id)
            diffuse = (~finished) & (token == diff_id)

            # negative-context pointer updates (replaces inference:546-622)
            if refresh_negative:
                neg_ptr = jnp.where(start_mask, state.neg_init_ptr, state.neg_ptr)
                neg_ptr = neg_ptr + diffuse.astype(neg_ptr.dtype)
            else:
                neg_ptr = state.neg_ptr + 1

            # ---- per-token diffusion with CFG (inference:695-708) -----------
            cond2 = jnp.concatenate([pos_h, neg_h], axis=0)        # [2B, H]
            with scope("stage_diffusion"):
                # AdaLN modulations depend only on (condition, t): compute them
                # once for all solver timesteps so the scan re-reads only the
                # x-dependent FFN weights (~half the head bytes per iteration)
                layer_mods, final_mods = diffusion_head.precompute_modulations(
                    params["diffusion_head"], cfg.diffusion_head,
                    jnp.asarray(sched.timesteps), cond2)

                def denoise(x, t, i):
                    xx = jnp.concatenate([x, x], axis=0).astype(pos_h.dtype)
                    out = diffusion_head.apply_with_mods(
                        params["diffusion_head"], cfg.diffusion_head, xx,
                        layer_mods[i], final_mods[i])
                    c, u = out[:b].astype(jnp.float32), out[b:].astype(jnp.float32)
                    return u + cfg_scale * (c - u)

                x_t = jax.vmap(lambda k: jax.random.normal(
                    k, (cfg.acoustic_vae_dim,), jnp.float32))(k_lat_rows)
                # per-row SDE noise keys: stream 3 of the row-position fold (the
                # SDE solver variants are row-deterministic too — a row's audio
                # never depends on when it joined a batch or who its mates are)
                k_sde_rows = jax.vmap(jax.random.fold_in)(
                    step_keys, jnp.full((b,), 3, jnp.uint32))
                if self._resident_head_ok(b):
                    # whole solver loop as ONE VMEM-resident pallas call —
                    # FFN weights load once instead of once per iteration
                    # (ops/diffusion_resident.py).  Noise pre-drawn from the
                    # same per-row key splits sample_with_solver makes.
                    from ..ops.diffusion_resident import resident_solver_sample
                    from ..ops.int4 import current_impl
                    nkeys = jnp.swapaxes(jax.vmap(
                        lambda k: jax.random.split(k, sched.num_steps)
                    )(k_sde_rows), 0, 1)                       # [S, B, 2]
                    z = jax.vmap(jax.vmap(lambda k: jax.random.normal(
                        k, (cfg.acoustic_vae_dim,), jnp.float32)))(nkeys)
                    latent = resident_solver_sample(
                        params["diffusion_head"], sched, x_t,
                        layer_mods, final_mods, z, cfg_scale,
                        eps=cfg.diffusion_head.rms_norm_eps,
                        interpret=(current_impl() == "interpret"
                                   or jax.default_backend() != "tpu"))
                else:
                    latent = sample_with_solver(sched, denoise, x_t,
                                                rng=k_sde_rows,
                                                with_index=True)  # [B, D]

            # ---- streaming vocode (inference:633-641) -----------------------
            # conv compute follows the tokenizer PARAM dtype (bf16 at serving,
            # like the reference's torch_dtype=bf16 modules; norms still do
            # fp32 internals) — fp32 here would double the per-step conv tail
            with scope("stage_vocode"):
                s, bia = self._scale_bias(params)
                scaled = (latent / s - bia).astype(self.tok_dtype)
                audio, ac_new = tok.decode(params["acoustic"]["decoder"],
                                           cfg.acoustic_tokenizer,
                                           scaled[:, None, :], ac_state)
                keep = diffuse[:, None, None]
                ac_state = jax.tree.map(lambda n, o: jnp.where(keep, n, o),
                                        ac_new, ac_state)

            # ---- semantic re-encode (inference:655-662) ---------------------
            with scope("stage_semantic"):
                sem, sem_new = tok.encode(params["semantic"],
                                          cfg.semantic_tokenizer,
                                          audio, sem_state)
                sem_state = jax.tree.map(lambda n, o: jnp.where(keep, n, o),
                                         sem_new, sem_state)

            # ---- next input embedding (inference:565-673) -------------------
            tok_embed = qwen2.embed_tokens(params["lm"], token).astype(self.lm_dtype)
            ac_embed = connectors.apply(params["acoustic_connector"],
                                        latent.astype(self.lm_dtype))
            sem_embed = connectors.apply(params["semantic_connector"],
                                         sem[:, 0].astype(self.lm_dtype))
            next_e = jnp.where(diffuse[:, None], ac_embed + sem_embed, tok_embed)

            # ---- fused CFG decode forward -----------------------------------
            embeds2b = jnp.concatenate([next_e, next_e], axis=0)[:, None, :]
            w_idx = jnp.concatenate([state.pos_len.astype(jnp.int32),
                                     neg_ptr.astype(jnp.int32)])
            positions = w_idx - state.kv_start
            shard_ctx = None
            if self.decode_impl == "pallas_shmap" and self.mesh is not None:
                shard_ctx = (self.mesh, self.kv_tp,
                             b2 % self.mesh.shape.get("dp", 1) == 0)
            with scope("stage_lm"):
                hidden, cache = qwen2.decode_step(
                    params["lm"], cfg.decoder, embeds2b, positions=positions,
                    write_idx=w_idx, kv_start=state.kv_start, kv_len=w_idx + 1,
                    cache=state.cache, impl=self.decode_impl,
                    shard_ctx=shard_ctx)

            new_state = GenState(
                cache=cache, kv_start=state.kv_start, pos_len=state.pos_len + 1,
                neg_ptr=neg_ptr, neg_init_ptr=state.neg_init_ptr,
                last_hidden=hidden[:, 0, :], finished=finished,
                reach_max=reach_max, step=state.step + 1,
                max_steps_per_sample=state.max_steps_per_sample,
                acoustic_state=ac_state, semantic_state=sem_state, rng=rng,
                row_rng=state.row_rng)
            out = StepOutput(tokens=token.astype(jnp.int32),
                             # native tokenizer dtype on the wire (bf16 at
                             # serving): the values were computed in that
                             # dtype, so the host-side f32 upcast is lossless
                             # and the device->host audio bytes halve
                             audio=audio[..., 0],
                             diffused=diffuse, finished=finished,
                             reach_max=reach_max)
            return new_state, out

        return step

    def _build_chunk(self, key, chunk: int, do_sample: bool, temperature: float,
                     top_p: float, refresh_negative: bool, top_k: int = 0):
        step = self._make_step(do_sample, temperature, top_p, refresh_negative,
                               top_k=top_k)

        import os as _os
        f16_transfer = _os.environ.get("VIBEVOICE_TRANSFER_F16", "0") == "1"

        @partial(jax.jit, donate_argnums=(1,))
        def run_chunk(params, state: GenState, cfg_scale):
            state, outs = jax.lax.scan(lambda s, _: step(params, s, cfg_scale),
                                       state, None, length=chunk)
            # flatten outputs: ragged/tiled layouts (e.g. [K, 1, 3200]) transfer
            # pathologically slowly host-ward; 1-D compact buffers do not.
            # Optional f16 audio transfer halves the host-bound bytes (f16's
            # 11-bit mantissa exceeds 16-bit PCM precision on [-1, 1]).
            audio = outs.audio.reshape(-1)
            if f16_transfer:
                audio = audio.astype(jnp.float16)
            # one packed int32 meta array instead of four small leaves: every
            # distinct device->host fetch pays a ~30 ms round trip on a
            # tunneled chip, so the wire format is exactly TWO arrays
            # (meta + audio) per chunk
            meta = jnp.stack([outs.tokens.reshape(-1),
                              outs.diffused.reshape(-1).astype(jnp.int32),
                              outs.finished.reshape(-1).astype(jnp.int32),
                              outs.reach_max.reshape(-1).astype(jnp.int32)])
            return state, (meta, audio)

        return run_chunk

    def _prefill_state(self, ids, attn, speech_tensors, speech_masks,
                       speech_input_mask, negative_prompt_ids,
                       negative_prompt_attention_mask, rng, t_bucket: int,
                       cache_len: int, max_steps_per_sample, timer) -> GenState:
        """Build the 2B prompt (positive rows + CFG-negative rows), run
        prefill, and assemble the initial GenState at (t_bucket, cache_len).
        Shared by generate() and the continuous-batching engine (which
        prefills b=1 and splices the rows into a live multi-slot state)."""
        cfg = self.cfg
        tk = self.tokenizer
        b, t0 = ids.shape
        extra = t_bucket - t0
        init_len = attn.sum(axis=-1)

        if (self.prefix_cache is not None and speech_tensors is not None
                and b == 1 and self.mesh is None):
            st = self._prefill_state_prefix(
                ids, attn, speech_tensors, speech_masks, speech_input_mask,
                negative_prompt_ids, negative_prompt_attention_mask, rng,
                t_bucket, cache_len, max_steps_per_sample, timer)
            if st is not None:
                return st

        # build 2B prompt: rows [0,B) the real prompt, rows [B,2B) the
        # negative (CFG) context — by default a single speech_start token
        # (inference:377-384); with negative_prompt_ids, the tokenized
        # negative prompt (main.py:743, 1177-1198 — accepted but unused by
        # the reference model; honored here)
        pad_id = tk.pad_id
        ids_pad = np.full((b, t_bucket), pad_id, ids.dtype)
        ids_pad[:, extra:] = ids
        # long prompts split the negative rows into their own short prefill
        # (_build_prefill.prefill_split_fn): the joint [2B, t_bucket] program
        # computes the negative row's full left padding — at 40k tokens that
        # doubles prefill FLOPs for a ~1-token context (r3 longform TTFA)
        split_neg = (t_bucket > self.prefill_chunk
                     and t_bucket % self.prefill_chunk == 0
                     and self.mesh is None)
        if split_neg:
            nw = (1 if negative_prompt_ids is None
                  else int(np.asarray(negative_prompt_ids).shape[-1]))
            neg_width = min(max(64, _bucket_len(nw, 64)), t_bucket)
        else:
            neg_width = t_bucket
        neg_ids, neg_valid, neg_lens = self._negative_rows(
            b, neg_width, ids.dtype, negative_prompt_ids,
            negative_prompt_attention_mask)
        if not split_neg:
            ids2b = np.concatenate([ids_pad, neg_ids], axis=0)
            valid2b = np.zeros((2 * b, t_bucket), bool)
            valid2b[:b, extra:] = attn.astype(bool)
            valid2b[b:] = neg_valid
        else:
            valid_pos = np.zeros((b, t_bucket), bool)
            valid_pos[:, extra:] = attn.astype(bool)

        smask_pad = None
        has_speech = speech_tensors is not None
        if has_speech:
            smask_pad = np.zeros((b, t_bucket), bool)
            smask_pad[:, extra:] = np.asarray(speech_input_mask)
            # bucket the voice-prompt waveform length (frames, quarter-octave)
            # so distinct prompt audio lengths share one prefill program; the
            # padded frames carry mask=False and never reach the scatter
            speech_tensors = np.asarray(speech_tensors, np.float32)
            speech_masks = np.asarray(speech_masks, bool)
            n_frames = speech_masks.shape[1]
            fb = _bucket_len(n_frames, 8)
            if fb != n_frames:
                speech_tensors = np.pad(
                    speech_tensors,
                    ((0, 0), (0, max(0, fb * self.frame_samples
                                     - speech_tensors.shape[1]))))
                speech_masks = np.pad(speech_masks,
                                      ((0, 0), (0, fb - n_frames)))

        rng, k_pre, row_rng = self._rng_setup(b, rng)

        pf_key = (t_bucket, cache_len, has_speech,
                  None if not has_speech else np.asarray(speech_tensors).shape,
                  neg_width if split_neg else None)
        if pf_key not in self._prefill_jit:
            self._prefill_jit[pf_key] = self._scoped(self._build_prefill(
                t_bucket, cache_len, has_speech,
                neg_bucket=neg_width if split_neg else None))
        prefill_fn = self._prefill_jit[pf_key]
        from ..ops.quant import current_w8a8, w8a8_scope
        with timer.stage("prefill"), w8a8_scope(
                self._use_w8a8_prefill(t_bucket) or current_w8a8()):
            # numpy args straight into the jitted call (its dispatch bundles
            # the transfers) — an eager jnp.asarray per operand costs a
            # separate device_put round each, all of it TTFA
            sp = (None if not has_speech
                  else np.asarray(speech_tensors, np.float32))
            sm = None if not has_speech else np.asarray(speech_masks)
            sim = None if not has_speech else np.asarray(smask_pad)
            # no host sync: nothing host-side needs the prefill results, so
            # the first chunk dispatch pipelines behind prefill on device
            # (the block cost a full device round-trip per generate call);
            # the stage therefore times the enqueue, not device execution
            if split_neg:
                last_hidden, cache = prefill_fn(
                    self.params, ids_pad, valid_pos, neg_ids, neg_valid,
                    sp, sm, sim, k_pre)
            else:
                pf_in = self._put_batched((ids2b, valid2b, sp, sm, sim))
                last_hidden, cache = prefill_fn(self.params, *pf_in, k_pre)

        return self._assemble_state(b, t_bucket, init_len, neg_lens,
                                    last_hidden, cache, rng, row_rng,
                                    max_steps_per_sample,
                                    neg_base=neg_width if split_neg
                                    else t_bucket)

    def _build_assemble(self, b: int):
        """One jitted program that materializes every small GenState leaf —
        counters, flags, and the ~70 streaming-conv zero buffers — in a
        single dispatch.  Building them leaf-by-leaf on the host costs one
        device round-trip each (~180 ms per generate() call on a tunneled
        chip, measured — it dominated TTFA and engine-join latency)."""
        cfg = self.cfg
        tok_dtype = self.tok_dtype
        ac_dec_params = self.params["acoustic"]["decoder"]
        sem_params = self.params["semantic"]

        @jax.jit
        def assemble_fn(kv_start, t_bucket, neg_base, max_steps, row_rng):
            full_b = jnp.full((b,), t_bucket, jnp.int32)
            neg_b = jnp.full((b,), neg_base, jnp.int32)
            leaves = (
                kv_start,
                full_b,                       # pos_len
                neg_b,                        # neg_ptr (slot base of the
                neg_b,                        # neg rows; == t_bucket unless
                                              # the split-negative prefill
                                              # parked them at a small base)
                jnp.zeros((b,), bool),        # finished
                jnp.zeros((b,), bool),        # reach_max
                max_steps,
                row_rng,
                jnp.int32(0),                 # step
                tok.init_decoder_state(cfg.acoustic_tokenizer, b, tok_dtype,
                                       params=ac_dec_params),
                tok.init_encoder_state(cfg.semantic_tokenizer, b, tok_dtype,
                                       params=sem_params),
            )
            # per-leaf barriers: the chunk program donates the state, so every
            # leaf needs its own buffer — without them XLA dedups the identical
            # zero/full constants (the neg_ptr/neg_init_ptr aliasing hazard,
            # generalized to the many same-shape conv-state zeros)
            return jax.tree.map(jax.lax.optimization_barrier, leaves)

        return assemble_fn

    def _assemble_state(self, b: int, t_bucket: int, init_len, neg_lens,
                        last_hidden, cache, rng, row_rng,
                        max_steps_per_sample, neg_base: int | None = None
                        ) -> GenState:
        """Pack prefill results into the initial GenState (shared by the full
        prefill and the prefix-cache suffix prefill).  ``neg_base`` is the
        cache-slot base of the negative rows (t_bucket normally; the small
        neg bucket under the split-negative long-prompt prefill)."""
        cfg = self.cfg
        if neg_base is None:
            neg_base = t_bucket
        kv_start = np.zeros(2 * b, np.int32)
        kv_start[:b] = t_bucket - init_len
        kv_start[b:] = neg_base - neg_lens

        if self.mesh is None:
            if b not in self._assemble_jit:
                self._assemble_jit[b] = self._build_assemble(b)
            (kv_start_a, pos_len_a, neg_ptr_a, neg_init_a, finished_a,
             reach_max_a, max_steps_a, row_rng_a, step_a, ac_state,
             sem_state) = self._assemble_jit[b](
                kv_start, np.int32(t_bucket), np.int32(neg_base),
                np.asarray(max_steps_per_sample, np.int32), row_rng)
            return GenState(
                cache=cache, kv_start=kv_start_a, pos_len=pos_len_a,
                neg_ptr=neg_ptr_a, neg_init_ptr=neg_init_a,
                last_hidden=last_hidden, finished=finished_a,
                reach_max=reach_max_a, step=step_a,
                max_steps_per_sample=max_steps_a, acoustic_state=ac_state,
                semantic_state=sem_state, rng=rng, row_rng=row_rng_a)

        batched = self._put_batched((
            jnp.asarray(kv_start),
            jnp.full((b,), t_bucket, jnp.int32),
            jnp.full((b,), t_bucket, jnp.int32),
            jnp.zeros((b,), bool),
            jnp.zeros((b,), bool),
            jnp.asarray(max_steps_per_sample, jnp.int32),
            row_rng,
            tok.init_decoder_state(cfg.acoustic_tokenizer, b, self.tok_dtype,
                                   params=self.params["acoustic"]["decoder"]),
            tok.init_encoder_state(cfg.semantic_tokenizer, b, self.tok_dtype,
                                   params=self.params["semantic"])))
        (kv_start_a, neg_ptr_a, pos_len_a, finished_a, reach_max_a, max_steps_a,
         row_rng_a, ac_state, sem_state) = batched
        return GenState(
            cache=cache,
            kv_start=kv_start_a,
            pos_len=pos_len_a,
            neg_ptr=neg_ptr_a,
            # distinct buffer (not an alias of neg_ptr): the chunk program
            # donates the state, and XLA rejects donating one buffer twice
            neg_init_ptr=jnp.array(neg_ptr_a),
            last_hidden=last_hidden,
            finished=finished_a,
            reach_max=reach_max_a,
            step=jnp.int32(0),
            max_steps_per_sample=max_steps_a,
            acoustic_state=ac_state,
            semantic_state=sem_state,
            rng=rng,
            row_rng=row_rng_a)

    # ------------------------------------------------------------------
    # Public generate
    # ------------------------------------------------------------------
    def generate(self,
                 input_ids: np.ndarray,
                 attention_mask: Optional[np.ndarray] = None,
                 speech_tensors: Optional[np.ndarray] = None,
                 speech_masks: Optional[np.ndarray] = None,
                 speech_input_mask: Optional[np.ndarray] = None,
                 cfg_scale: float = 1.3,
                 max_new_tokens: Optional[int] = None,
                 max_length_times: float = 2.0,
                 do_sample: bool = False,
                 temperature: float = 0.95,
                 top_p: float = 0.95,
                 top_k: int = 0,
                 negative_prompt_ids: Optional[np.ndarray] = None,
                 negative_prompt_attention_mask: Optional[np.ndarray] = None,
                 refresh_negative: bool = True,
                 seed: int = 0,
                 audio_streamer=None,
                 stop_check_fn: Optional[Callable[[], bool]] = None,
                 chunk_steps: int = 8,
                 chunk_steps_max: Optional[int] = None,
                 max_gap_s: Optional[float] = None,
                 return_speech: bool = True,
                 show_progress_bar: bool = False,
                 verbose: bool = False,
                 ) -> VibeVoiceGenerationOutput:
        """Generate speech. Inputs are the processor outputs (numpy).

        Matches the reference argument surface (inference:326-363); sampling
        differences: temperature/top_p act on the constrained 4-token logits
        rather than the full vocab (equivalent decisions, cheaper math).
        """
        cfg = self.cfg
        tk = self.tokenizer
        ids = np.asarray(input_ids)
        b, t0 = ids.shape
        if attention_mask is None:
            attention_mask = np.ones_like(ids)
        attn = np.asarray(attention_mask)

        # token budget (inference:368, 420-422)
        if max_new_tokens is None:
            max_new_tokens = cfg.decoder.max_position_embeddings - t0
        max_length = t0 + max_new_tokens
        max_steps = int(min(max_length - t0, int(max_length_times * t0)))
        init_len = attn.sum(axis=-1)
        max_steps_per_sample = np.minimum(max_length - init_len,
                                          (max_length_times * init_len).astype(np.int64))

        # bucketed shapes to bound recompiles; the KV cache starts small and
        # doubles as generation proceeds, so decode attention only ever reads
        # ~2x the live context instead of the worst-case 64k buffer (the
        # long-form killer: at 64k a full-buffer read is ~3.7 GB/step)
        t_bucket = min(_bucket_len(t0, 64), cfg.decoder.max_position_embeddings)
        t_bucket = max(t_bucket, t0)
        if t_bucket > self.prefill_chunk:
            # long prompts: bucket to whole SEGMENTS (the segmented prefill
            # program is shape-keyed on segment count anyway), not quarter
            # octaves — a 40.5k prompt under the octave rule padded to 49152
            # and paid 21% extra prefill compute (r4 on-chip profile: the
            # quarter-octave step is 16k out here, vs one 4k segment)
            t_bucket = _round_up(t0, self.prefill_chunk)
        cache_len_final = _round_cache(t_bucket + max_steps + 2)
        if self.decode_impl in ("pallas", "pallas_shmap"):
            # flash decode never touches dead slots: allocate final size up
            # front — one chunk program for the whole run, no growth copies
            cache_len = cache_len_final
        else:
            cache_len = min(_round_cache(t_bucket + 4 * chunk_steps + 2),
                            cache_len_final)
        rng = jax.random.PRNGKey(seed)
        from ..utils.profiling import StageTimer
        timer = StageTimer()
        t_gen0 = time.perf_counter()

        state = self._prefill_state(
            ids, attn, speech_tensors, speech_masks, speech_input_mask,
            negative_prompt_ids, negative_prompt_attention_mask, rng,
            t_bucket, cache_len, max_steps_per_sample, timer)

        def chunk_key(k_steps: int, cur_cache_len: int):
            return (k_steps, do_sample, temperature, top_p, top_k,
                    refresh_negative, b, cur_cache_len)

        def get_run_chunk(k_steps: int, cur_cache_len: int):
            key = chunk_key(k_steps, cur_cache_len)
            if key not in self._chunk_jit:
                raw = self._build_chunk(key, k_steps, do_sample, temperature,
                                        top_p, refresh_negative, top_k=top_k)
                self._chunk_raw[key] = raw
                self._chunk_jit[key] = self._scoped(raw)
            return key, (self._chunk_aot.get(key) or self._chunk_jit[key])

        def start_aot(k_steps: int, cur_cache_len: int, state) -> None:
            """AOT-compile a bigger chunk program OFF-THREAD (XLA compilation
            releases the GIL) so the bounded-cadence policy can grow chunk
            size without ever paying a compile stall mid-stream.  The
            resulting executable is used directly (the jit wrapper's own
            cache can't be pre-populated from outside)."""
            key = chunk_key(k_steps, cur_cache_len)
            if key in self._chunk_ready or key in self._chunk_compiling:
                return
            get_run_chunk(k_steps, cur_cache_len)       # build the raw jit
            raw = self._chunk_raw[key]
            avals = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(
                    jnp.shape(x), jnp.result_type(x),
                    sharding=getattr(x, "sharding", None)),
                (self.params, state, cfg_scale_arr))
            self._chunk_compiling.add(key)
            impl = self._int4_impl

            def work():
                try:
                    from ..ops import int4
                    with int4.impl_scope(impl):
                        compiled = raw.lower(*avals).compile()
                    self._chunk_aot[key] = compiled
                    self._chunk_ready.add(key)
                except Exception:    # pragma: no cover — falls back to the
                    pass             # sync-compile path on first use
                finally:
                    self._chunk_compiling.discard(key)

            threading.Thread(target=work, daemon=True,
                             name=f"vv-aot-chunk-{k_steps}").start()

        all_tokens: List[np.ndarray] = []
        audio_chunks: List[List[np.ndarray]] = [[] for _ in range(b)]
        cfg_scale_arr = jnp.float32(cfg_scale)
        prev_fin = np.zeros((b,), bool)
        aborted = np.zeros((b,), bool)

        def should_stop() -> bool:
            if stop_check_fn is not None and stop_check_fn():
                return True
            if audio_streamer is not None and getattr(audio_streamer, "finished_flags", None):
                if all(audio_streamer.finished_flags[:b]):
                    return True
            return False

        def apply_external_ends(state):
            """A consumer-side ``end()`` on a still-live sample (client
            disconnect, per-stream stop button) aborts THAT sample only: its
            device row is forced finished, the rest of the batch continues.
            Flags the loop set itself (natural finishes, tracked in
            ``prev_fin``) are excluded.  Single-sample behavior is unchanged:
            ending the only stream stops the run (reference inference:441-445
            stops everything on any streamer end; per-sample ends matter only
            for batched serving, which the reference does not have)."""
            nonlocal aborted
            if audio_streamer is None or not getattr(
                    audio_streamer, "finished_flags", None):
                return state
            flags = np.asarray(audio_streamer.finished_flags[:b], bool)
            newly = flags & ~prev_fin & ~aborted
            if newly.any():
                aborted |= newly
                ab_dev = jax.device_put(jnp.asarray(aborted),
                                        state.finished.sharding)
                state = state._replace(finished=state.finished | ab_dev)
            return state

        # adaptive chunking: the first two chunks use the small `chunk_steps`
        # (fast first audio), then grow toward `chunk_steps_max` for
        # steady-state throughput (fewer host syncs).  With a live consumer
        # the big chunk emits audio in ~0.5 s bursts, so when an
        # audio_streamer is attached the growth is BOUNDED: chunk sizes come
        # from a power-of-2 ladder (each size compiles once) and the pick is
        # the largest whose estimated wall time stays under ``max_gap_s``
        # (default 0.25 s with a streamer; None = unbounded).  Matches the
        # reference's live-playback chunk buffering intent (main.py:913-999).
        big_chunk = max(chunk_steps_max or chunk_steps, chunk_steps)
        if max_gap_s is None and audio_streamer is not None:
            max_gap_s = 0.25
        ladder = [chunk_steps]
        while ladder[-1] * 2 < big_chunk:
            ladder.append(ladder[-1] * 2)
        if big_chunk > ladder[-1]:
            ladder.append(big_chunk)
        step_time_ema: Optional[float] = None
        self.last_chunk_sizes: List[int] = []
        # fetch-completion timestamps per chunk: the producer-side cadence
        # record (consumer-visible gaps == these gaps + host decode/put) —
        # asserted by the observed-gap test, useful diagnostics everywhere
        self.last_chunk_times: List[float] = []
        n_dispatched = 0

        def note_chunk_period(dt: float, k: int) -> None:
            """EMA of per-step wall time from observed chunk periods (in
            steady state the double-buffered fetch period == chunk device
            time).  Compile stalls inflate one sample; clamp their weight."""
            nonlocal step_time_ema
            est = dt / max(k, 1)
            if step_time_ema is None:
                step_time_ema = est
            else:
                step_time_ema = 0.5 * step_time_ema + 0.5 * min(
                    est, 4.0 * step_time_ema)

        def pick_k(state) -> int:
            if n_dispatched < 2:
                return chunk_steps
            if max_gap_s is None:
                return big_chunk
            if step_time_ema is None:
                # bounded mode but nothing fetched yet (the pipelined loop
                # dispatches ahead of the first fetch): stay at the base size
                return chunk_steps
            # 0.8 safety margin: the consumer-visible gap is chunk device
            # time PLUS host decode/put overhead and EMA estimation error —
            # r3 measured 333 ms against a 250 ms bound when 32*ema landed at
            # 246 ms (the bound must absorb the slack, not ride its edge)
            budget = 0.8 * max_gap_s
            want = chunk_steps
            for k in ladder:
                if k * step_time_ema <= budget:
                    want = max(want, k)
            # bounded-cadence mode NEVER compiles synchronously mid-stream:
            # use the largest already-compiled size; if the gap budget allows
            # a bigger one, compile it in the background and switch once
            # ready (a few chunks later).  Small chunks only cost extra host
            # syncs — the gap bound itself is never at risk.
            best = chunk_steps
            for k in ladder:
                if k <= want and chunk_key(k, cache_len) in self._chunk_ready:
                    best = max(best, k)
            if want > best:
                start_aot(want, cache_len, state)
            return best

        def dispatch(state, dispatched):
            """Enqueue one chunk (async — JAX dispatch returns futures).
            Returns (state, out_future, chunk_len)."""
            nonlocal cache_len, n_dispatched
            k_steps = pick_k(state)
            self.last_chunk_sizes.append(k_steps)
            n_dispatched += 1
            need = t_bucket + dispatched + k_steps + 2
            if need > cache_len and cache_len < cache_len_final:
                new_len = min(max(cache_len * 2, _round_cache(need)), cache_len_final)
                with timer.stage("cache_grow"):
                    state = _grow_cache(state, new_len)
                cache_len = new_len
            key, run_chunk = get_run_chunk(k_steps, cache_len)
            state, out = run_chunk(self.params, state, cfg_scale_arr)
            self._chunk_ready.add(key)
            _start_host_copies(out)
            return state, out, k_steps

        # pipelined loop: up to ``depth`` chunks are dispatched BEFORE chunk
        # k's results are pulled to the host, so host-side numpy conversion,
        # streamer pushes AND the dispatch round-trip itself (real wall time
        # on a tunneled chip) overlap with device compute.  Non-streaming
        # keeps the classic depth-1 double buffer — its chunks are big, so
        # an extra speculative chunk is pure waste at termination; with a
        # live consumer the bounded-cadence chunks are small and depth 2
        # keeps the device busy across the host's put/fetch work, making
        # the consumer-visible gap track chunk DEVICE time.  If termination
        # is discovered in chunk k, the in-flight chunks are discarded
        # (their steps are all-eos no-ops past `finished`).
        from collections import deque
        depth = 2 if audio_streamer is not None else 1
        steps_done = 0
        inflight: deque = deque()
        t_prev_fetch = time.perf_counter()

        def top_up():
            nonlocal state, steps_done
            while (len(inflight) < depth and steps_done < max_steps
                   and not should_stop()):
                if inflight:
                    state = apply_external_ends(state)
                state, o, k = dispatch(state, steps_done)
                inflight.append((o, k))
                steps_done += k

        top_up()
        prev_rmax = np.zeros((b,), bool)
        while inflight:
            out, out_k = inflight.popleft()
            top_up()

            # blocks until the device finishes this chunk (the next ones are
            # already in flight)
            with timer.stage("decode_chunk"):
                meta = np.asarray(out[0]).reshape(4, out_k, b)
                audio = np.asarray(out[1]).astype(np.float32).reshape(
                    out_k, b, self.frame_samples)
                toks = meta[0]
                diff = meta[1].astype(bool)
                fin = meta[2].astype(bool)
                rmax = meta[3].astype(bool)
            now = time.perf_counter()
            note_chunk_period(now - t_prev_fetch, out_k)
            t_prev_fetch = now
            self.last_chunk_times.append(now)
            all_tokens.append(toks)

            for si in range(toks.shape[0]):
                d = diff[si]
                if d.any():
                    if "ttfa" not in timer.totals:
                        timer.record("ttfa", time.perf_counter() - t_gen0)
                    idxs = np.nonzero(d)[0]
                    for i in idxs:
                        audio_chunks[i].append(audio[si, i])
                    if audio_streamer is not None:
                        audio_streamer.put(audio[si, idxs], idxs)
                if audio_streamer is not None:
                    newly = fin[si] & ~prev_fin
                    if newly.any():
                        audio_streamer.end(np.nonzero(newly)[0])
                prev_fin = fin[si]
                prev_rmax = rmax[si]

            if bool(prev_fin.all()):
                break

        if audio_streamer is not None:
            audio_streamer.end()

        timer.record("generate_total", time.perf_counter() - t_gen0)
        self.last_metrics = timer.summary()

        sequences = (np.concatenate(all_tokens, axis=0).T if all_tokens
                     else np.zeros((b, 0), np.int32))
        speech_outputs: List[Optional[np.ndarray]] = []
        for chunks in audio_chunks:
            speech_outputs.append(np.concatenate(chunks) if chunks else None)

        # reach_max means "stopped by budget, not by eos" (reference
        # inference:528-537).  Taken from the last PROCESSED chunk's packed
        # meta rather than re-fetched from GenState (both flags freeze once
        # every sample is finished, and discarded in-flight chunks are only
        # dispatched past the all-finished point — same value, one fewer
        # ~30 ms device->host round trip per call).  A sample whose
        # per-sample cap coincides with the dispatched step budget never
        # executes the device step that would flag it — fold that edge in
        # from the host side.
        reach_max = prev_rmax
        budget_hit = (~prev_fin
                      & (sequences.shape[1]
                         >= np.asarray(max_steps_per_sample)))
        return VibeVoiceGenerationOutput(
            sequences=sequences,
            speech_outputs=speech_outputs if return_speech else None,
            reach_max_step_sample=reach_max | budget_hit)
