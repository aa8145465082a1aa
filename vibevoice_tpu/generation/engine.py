"""Slot-based continuous batching engine.

Beyond-reference serving capability (the reference generates one batch at a
time, reference: modeling_vibevoice_inference.py:326): a fixed-shape
generation state with `slots` sample rows runs chunk programs continuously;
requests JOIN a free slot mid-flight (b=1 prefill spliced into the live
state between chunks) and RETIRE the moment they finish — no convoy effect
where a long request blocks the whole batch, no idle slots while work is
queued.

Why this is cheap on TPU: the decode step is weight-bandwidth-bound, so the
marginal cost of an occupied slot is ~zero — the batch rides the same HBM
weight reads.  All programs are fixed-shape (slots, cache_len, chunk_steps
are engine constants), so the engine never recompiles after warmup.

Sharded serving: pass a mesh-aware ``VibeVoiceGenerator(mesh=...)`` — the
live state keeps the generator's shardings (KV cache slot rows on "dp" ×
heads on "tp" when tp divides the KV-head count, per-slot bookkeeping on
"dp"), pinned via ``out_shardings`` on every state-producing program so
joins/retires never change shardings or trigger chunk recompiles.  This is
what makes 7B bf16 *continuous* serving possible (weights + KV do not fit
one chip).

Determinism contract: every row's noise stream (token sampling, diffusion
init, SDE solver noise) is ``fold_in(row_seed, row_position)``
(GenState.row_rng), so a request's output is a function of (its prompt, its
seed) alone — identical whether it runs solo through
``VibeVoiceGenerator.generate`` or joins an engine batch at any moment.

int8 KV caches (``VibeVoiceGenerator(kv_quant=True)``) serve too: cache
leaves are {"q","s"} pytrees, splice/park tree-map over them, and the
contract holds because per-vector quantization is deterministic and
row-local.  Halves the engine's cache memory — the lever for more slots or
deeper per-slot context on one chip.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..models import acoustic_tokenizer as tok
from ..models import qwen2
from .generate import _bucket_len
from .state import GenState


@dataclass
class EngineRequest:
    """One submitted generation; filled in as it progresses."""
    inputs: dict                      # processor outputs (numpy)
    max_new_tokens: Optional[int] = None
    max_length_times: float = 2.0
    negative_prompt_ids: Optional[np.ndarray] = None
    seed: int = 0
    streamer: object = None           # optional AudioStreamer(batch_size=1)
    # progress / results
    done: threading.Event = field(default_factory=threading.Event)
    error: Optional[str] = None
    tokens: List[int] = field(default_factory=list)
    audio_chunks: List[np.ndarray] = field(default_factory=list)
    slot: Optional[int] = None
    reach_max: bool = False
    submitted_at: float = field(default_factory=time.time)
    started_step: int = 0
    # filled by submit()/_prepare(): prefilled 2-row GenState + step budget
    small: Optional[object] = None
    budget: int = 0

    @property
    def audio(self) -> Optional[np.ndarray]:
        return np.concatenate(self.audio_chunks) if self.audio_chunks else None


class ContinuousEngine:
    """Continuous batching over a ``VibeVoiceGenerator``.

    All generation settings that shape the compiled step (sampling mode,
    temperatures, cfg_scale, chunk size) are engine-wide constants; per-
    request knobs are the prompt, voice prompt, negative prompt, seed and
    budget.
    """

    def __init__(self, generator, slots: int = 4, cache_len: int = 4096,
                 chunk_steps: int = 16, cfg_scale: float = 1.3,
                 do_sample: bool = False, temperature: float = 0.95,
                 top_p: float = 0.95, top_k: int = 0,
                 refresh_negative: bool = True, log_fn=None):
        self.gen = generator
        self.slots = int(slots)
        self.cache_len = int(cache_len)
        self.chunk_steps = int(chunk_steps)
        self.cfg_scale = float(cfg_scale)
        self.do_sample = bool(do_sample)
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        self.top_k = int(top_k)
        self.refresh_negative = bool(refresh_negative)
        self.log = log_fn or (lambda *_: None)

        # sharded serving: pin the live state's shardings once (mesh from the
        # generator — TP on KV heads when it divides, slot rows on dp) and
        # force every state-producing program (_splice/_park/_abort) to emit
        # them, so the chunk program compiles once and never recompiles when
        # requests join or retire
        self._state_sh = (self._state_shardings() if generator.mesh is not None
                          else None)
        self.state = self._empty_state()
        self.slot_req: List[Optional[EngineRequest]] = [None] * self.slots
        self.pending: "deque[EngineRequest]" = deque()
        self.lock = threading.Lock()
        self.work = threading.Condition(self.lock)
        self.global_step = 0
        self.chunks_run = 0
        self._stop = False
        self._inflight = None             # (StepOutput futures, slot->req)
        self._aborted: set = set()        # slots force-finished by disconnect

        frame = generator.frame_samples
        self.frame_samples = frame

        B = self.slots

        def _splice(big: GenState, small: GenState, slot, max_steps_abs):
            """Insert the b=1 prefilled rows into slot `slot` of the live
            state.  Positive row -> slot, negative (CFG) row -> B + slot."""
            def two_rows(bg, sm, axis):
                bg = lax.dynamic_update_slice_in_dim(
                    bg, lax.slice_in_dim(sm, 0, 1, axis=axis), slot, axis=axis)
                return lax.dynamic_update_slice_in_dim(
                    bg, lax.slice_in_dim(sm, 1, 2, axis=axis), B + slot, axis=axis)

            def one_row(bg, sm):
                return lax.dynamic_update_slice_in_dim(bg, sm[0:1], slot, axis=0)

            # tree.map covers both bf16 arrays and int8 {"q","s"} leaves —
            # axis 1 is the slot-row axis in every cache leaf layout
            cache = qwen2.KVCache(
                k=jax.tree.map(lambda bg, sm: two_rows(bg, sm, 1),
                               big.cache.k, small.cache.k),
                v=jax.tree.map(lambda bg, sm: two_rows(bg, sm, 1),
                               big.cache.v, small.cache.v))
            return GenState(
                cache=cache,
                kv_start=two_rows(big.kv_start, small.kv_start, 0),
                pos_len=one_row(big.pos_len, small.pos_len),
                neg_ptr=one_row(big.neg_ptr, small.neg_ptr),
                neg_init_ptr=one_row(big.neg_init_ptr, small.neg_init_ptr),
                last_hidden=two_rows(big.last_hidden, small.last_hidden, 0),
                finished=one_row(big.finished, jnp.zeros((1,), bool)),
                reach_max=one_row(big.reach_max, jnp.zeros((1,), bool)),
                step=big.step,
                max_steps_per_sample=one_row(
                    big.max_steps_per_sample,
                    jnp.asarray([max_steps_abs], jnp.int32)),
                acoustic_state=jax.tree.map(one_row, big.acoustic_state,
                                            small.acoustic_state),
                semantic_state=jax.tree.map(one_row, big.semantic_state,
                                            small.semantic_state),
                rng=big.rng,
                row_rng=one_row(big.row_rng, small.row_rng))

        def _park(big: GenState, slot):
            """Reset a retired slot's pointers so its (discarded) attention
            reads stay O(1) instead of scanning a stale live range."""
            def one(bg, val):
                return lax.dynamic_update_slice_in_dim(
                    bg, jnp.asarray([val], bg.dtype), slot, axis=0)
            kv_start = lax.dynamic_update_slice_in_dim(
                big.kv_start, jnp.zeros((1,), jnp.int32), slot, axis=0)
            kv_start = lax.dynamic_update_slice_in_dim(
                kv_start, jnp.zeros((1,), jnp.int32), B + slot, axis=0)
            return big._replace(kv_start=kv_start,
                                pos_len=one(big.pos_len, 1),
                                neg_ptr=one(big.neg_ptr, 1),
                                neg_init_ptr=one(big.neg_init_ptr, 1),
                                max_steps_per_sample=one(
                                    big.max_steps_per_sample, 0))

        def _abort(big: GenState, mask):
            return big._replace(finished=big.finished | mask)

        jit_kw = dict(donate_argnums=(0,))
        if self._state_sh is not None:
            jit_kw["out_shardings"] = self._state_sh
        self._splice = jax.jit(_splice, **jit_kw)
        self._park = jax.jit(_park, **jit_kw)
        self._abort = jax.jit(_abort, **jit_kw)

    # ------------------------------------------------------------------
    def _state_shardings(self):
        """GenState sharding pytree on the generator's mesh: KV cache rows on
        dp × heads on tp (when tp divides), every per-slot array's leading
        axis on dp where divisible, scalars/rng replicated."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharding import batch_shardings
        mesh = self.gen.mesh
        skel = jax.eval_shape(self._build_empty_state)
        sh = batch_shardings(mesh, skel)
        c_sh = jax.tree.map(
            lambda l: self.gen._cache_sharding(2 * self.slots, l.ndim),
            skel.cache)
        repl = NamedSharding(mesh, P())
        return sh._replace(cache=c_sh, step=repl, rng=repl)

    def _empty_state(self) -> GenState:
        if self._state_sh is None:
            return self._build_empty_state()
        # allocate directly INTO the shardings (jit with out_shardings): the
        # sharded-serving cache must never materialize on one device
        return jax.jit(self._build_empty_state,
                       out_shardings=self._state_sh)()

    def _build_empty_state(self) -> GenState:
        gen, cfg = self.gen, self.gen.cfg
        B, S = self.slots, self.cache_len
        cache = qwen2.init_kv_cache(cfg.decoder, 2 * B, S, gen.lm_dtype,
                                    quant=getattr(gen, "kv_quant", False))
        return GenState(
            cache=cache,
            kv_start=jnp.zeros((2 * B,), jnp.int32),
            pos_len=jnp.ones((B,), jnp.int32),
            neg_ptr=jnp.ones((B,), jnp.int32),
            neg_init_ptr=jnp.ones((B,), jnp.int32),
            last_hidden=jnp.zeros((2 * B, cfg.decoder.hidden_size),
                                  gen.lm_dtype),
            finished=jnp.ones((B,), bool),
            reach_max=jnp.zeros((B,), bool),
            step=jnp.int32(0),
            max_steps_per_sample=jnp.zeros((B,), jnp.int32),
            acoustic_state=tok.init_decoder_state(
                cfg.acoustic_tokenizer, B, gen.tok_dtype,
                params=gen.params["acoustic"]["decoder"]),
            semantic_state=tok.init_encoder_state(
                cfg.semantic_tokenizer, B, gen.tok_dtype,
                params=gen.params["semantic"]),
            rng=jax.random.PRNGKey(0),
            row_rng=jnp.zeros((B, 2), jnp.uint32))

    def _run_chunk_fn(self):
        key = (self.chunk_steps, self.do_sample, self.temperature, self.top_p,
               self.top_k, self.refresh_negative, self.slots, self.cache_len)
        if key not in self.gen._chunk_jit:
            # _scoped is REQUIRED here, not just consistency with
            # generate.py:1063-1067: dispatch inside ops/int4.py happens at
            # TRACE time, so an engine whose chunk key wasn't pre-compiled by
            # generate() would otherwise trace a meshed GSPMD program under
            # 'auto' → Pallas inside GSPMD → unpartitionable kernel on TPU.
            raw = self.gen._build_chunk(
                key, self.chunk_steps, self.do_sample, self.temperature,
                self.top_p, self.refresh_negative, top_k=self.top_k)
            self.gen._chunk_raw[key] = raw
            self.gen._chunk_jit[key] = self.gen._scoped(raw)
        return self.gen._chunk_jit[key]

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------
    def submit(self, inputs: dict, max_new_tokens: Optional[int] = None,
               max_length_times: float = 2.0, negative_prompt_ids=None,
               seed: int = 0, streamer=None) -> EngineRequest:
        """Prefill the request (b=1) on the CALLER's thread and queue it for
        splicing.  Prefill dispatch — and any cold prefill-bucket compile —
        therefore never stalls the live batch; the engine thread only runs
        chunks and O(1) splices.  On error the request is finished
        immediately (``done`` set, streamer ended)."""
        req = EngineRequest(inputs=inputs, max_new_tokens=max_new_tokens,
                            max_length_times=max_length_times,
                            negative_prompt_ids=negative_prompt_ids,
                            seed=seed, streamer=streamer)
        try:
            self._prepare(req)
        except Exception as e:  # noqa: BLE001 — per-request error
            req.error = f"{type(e).__name__}: {e}"
            if req.streamer is not None:
                req.streamer.end([0])
            req.done.set()
            return req
        with self.work:
            self.pending.append(req)
            self.work.notify()
        return req

    def active(self) -> int:
        return sum(r is not None for r in self.slot_req)

    def _prepare(self, req: EngineRequest):
        """Budget + b=1 prefill into a 2-row GenState (caller thread)."""
        from ..utils.profiling import StageTimer
        ids = np.asarray(req.inputs["input_ids"])
        attn = np.asarray(req.inputs.get("attention_mask",
                                         np.ones_like(ids)))
        b, t0 = ids.shape
        assert b == 1, "engine requests are single-sample"
        t_bucket = max(_bucket_len(t0, 64), t0)
        if t_bucket > self.gen.prefill_chunk:
            from .generate import _round_up
            t_bucket = _round_up(t_bucket, self.gen.prefill_chunk)
        if t_bucket + 2 >= self.cache_len:
            raise ValueError(f"prompt ({t0} tokens) does not fit the engine "
                             f"cache ({self.cache_len})")
        init_len = int(attn.sum())
        req.budget = int(min(req.max_new_tokens or 1 << 30,
                             req.max_length_times * init_len,
                             self.cache_len - t_bucket - 2))
        req.small = self.gen._prefill_state(
            ids, attn,
            req.inputs.get("speech_tensors"), req.inputs.get("speech_masks"),
            req.inputs.get("speech_input_mask"),
            req.negative_prompt_ids, None,
            jax.random.PRNGKey(req.seed), t_bucket, self.cache_len,
            np.asarray([req.budget], np.int64), StageTimer())

    def _join(self, slot: int, req: EngineRequest):
        """Splice the prepared rows into `slot` (engine thread, O(1))."""
        self.state = self._splice(self.state, req.small, jnp.int32(slot),
                                  jnp.int32(self.global_step + req.budget))
        req.small = None                      # free the prefill buffers
        req.slot = slot
        req.started_step = self.global_step
        self.slot_req[slot] = req
        self.log(f"⚙️ joined slot {slot} at step {self.global_step} "
                 f"(budget {req.budget})")

    def _retire(self, slot: int, req, reach_max: bool):
        if self.slot_req[slot] is req:
            self.slot_req[slot] = None
            self.state = self._park(self.state, jnp.int32(slot))
        req.reach_max = reach_max
        if req.streamer is not None:
            req.streamer.end([0])
        req.done.set()
        self.log(f"🏁 slot {slot} retired after "
                 f"{len(req.tokens)} tokens")

    def step_chunk(self) -> bool:
        """Join pending requests, dispatch ONE chunk, and route the PREVIOUS
        in-flight chunk's outputs.

        The pipeline keeps one chunk in flight: chunk k+1 is dispatched
        (async — JAX returns futures) BEFORE chunk k's outputs are pulled to
        the host, so host routing, streamer pushes, and splice dispatches
        overlap device compute (the solo generate loop's double-buffering,
        c91852f, applied to the engine; over the tunneled chip each chunk
        otherwise pays ~2-4 round trips of device idle).  Consequences:
        * outputs are routed by the slot->request SNAPSHOT taken at dispatch
          (a slot retired then re-joined between dispatch and consume must
          not leak the old request's rows into the new one);
        * a slot that finishes in chunk k keeps running as eos no-ops
          through the already-dispatched chunk k+1 (harmless: finished rows
          produce no audio) and frees for joins at the next call;
        * ``global_step`` counts DISPATCHED steps, so join budgets stay
          absolute step counts in the state the splice lands in.
        Returns True if device work was dispatched or outputs consumed."""
        with self.lock:
            for slot in range(self.slots):
                if self.slot_req[slot] is None and self.pending:
                    req = self.pending.popleft()
                    try:
                        self._join(slot, req)
                    except Exception as e:  # noqa: BLE001 — per-request error
                        req.error = f"{type(e).__name__}: {e}"
                        if req.streamer is not None:
                            req.streamer.end([0])
                        req.done.set()

        active_slots = [i for i, r in enumerate(self.slot_req) if r is not None]

        # consumer-side stream ends (disconnects) abort their slot only
        abort = np.zeros((self.slots,), bool)
        for i in active_slots:
            st = self.slot_req[i].streamer
            if st is not None and getattr(st, "finished_flags", None):
                if st.finished_flags[0] and i not in self._aborted:
                    abort[i] = True
                    self._aborted.add(i)
        if abort.any():
            self.state = self._abort(self.state, jnp.asarray(abort))

        newly = None
        if active_slots:
            run_chunk = self._run_chunk_fn()
            self.state, out = run_chunk(self.gen.params, self.state,
                                        jnp.float32(self.cfg_scale))
            from .generate import _start_host_copies
            _start_host_copies(out)   # overlap the meta+audio fetches
            self.global_step += self.chunk_steps
            newly = (out, {i: self.slot_req[i] for i in active_slots})

        prev, self._inflight = self._inflight, newly
        if prev is not None:
            self._consume(prev)
        return prev is not None or newly is not None

    def _consume(self, inflight) -> None:
        """Route one dispatched chunk's outputs (blocks until the device
        finishes it; the next chunk is already in flight)."""
        out, snapshot = inflight
        K, B = self.chunk_steps, self.slots
        meta = np.asarray(out[0]).reshape(4, K, B)
        audio = np.asarray(out[1]).astype(np.float32).reshape(
            K, B, self.frame_samples)
        toks = meta[0]
        diff = meta[1].astype(bool)
        fin = meta[2].astype(bool)
        self.chunks_run += 1

        eos = getattr(self.gen.tokenizer, "eos_id", None)
        for i, req in snapshot.items():
            if req.done.is_set():
                continue              # retired from an earlier chunk
            ended = False
            end_tok = None
            for si in range(K):
                if not ended:
                    req.tokens.append(int(toks[si, i]))
                    if diff[si, i]:
                        req.audio_chunks.append(audio[si, i])
                        if req.streamer is not None:
                            req.streamer.put(audio[si:si + 1, i], [0])
                    if fin[si, i]:
                        ended = True
                        end_tok = int(toks[si, i])
            if ended:
                # budget-finish = ended on a non-eos token (aborted slots
                # were force-finished by the disconnect, not the budget)
                reach_max = (i not in self._aborted and eos is not None
                             and end_tok != eos)
                self._aborted.discard(i)
                self._retire(i, req, reach_max)

    def drain(self):
        """Run until every pending + active request is finished and the last
        in-flight chunk is consumed (tests/CLI)."""
        while self.pending or self.active() or self._inflight is not None:
            self.step_chunk()

    def run_forever(self):
        """Serve loop: step while there is work, sleep on the condition
        variable otherwise.  Call stop() to exit."""
        while not self._stop:
            did = False
            if self.pending or self.active() or self._inflight is not None:
                did = self.step_chunk()
            if not did and not self.pending:
                with self.work:
                    if (not self.pending and not self.active()
                            and self._inflight is None and not self._stop):
                        self.work.wait(timeout=0.2)

    def stop(self):
        self._stop = True
        with self.work:
            self.work.notify_all()
