"""End-to-end generation tests on the tiny config (SURVEY.md §7 stage 7)."""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.generation import VibeVoiceGenerator
from vibevoice_tpu.models import qwen2, vibevoice

CFG = VibeVoiceConfig.named("tiny")


class TinyTokenizer:
    """Speech-control ids small enough for the tiny test vocab."""
    eos_id = 3
    speech_start_id = 10
    speech_end_id = 11
    speech_diffusion_id = 12
    pad_id = 4

    def encode(self, text, add_special_tokens=False):
        return [ord(c) % 200 + 20 for c in text]


@pytest.fixture(scope="module")
def model():
    params = vibevoice.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    gen = VibeVoiceGenerator(params, CFG, TinyTokenizer(),
                             ddpm_inference_steps=4, lm_dtype=jnp.float32)
    return gen


def _prompt(b=1, t=12):
    tk = TinyTokenizer()
    rs = np.random.RandomState(0)
    ids = rs.randint(20, 200, (b, t))
    ids[:, -1] = tk.speech_start_id
    return ids


def test_generate_runs_and_shapes(model):
    out = model.generate(_prompt(), cfg_scale=1.3, max_new_tokens=16,
                         chunk_steps=4, seed=0)
    frame = CFG.acoustic_tokenizer.total_stride
    tk = TinyTokenizer()
    valid = {tk.eos_id, tk.speech_start_id, tk.speech_end_id, tk.speech_diffusion_id}
    assert out.sequences.shape[0] == 1
    assert set(np.unique(out.sequences)) <= valid
    if out.speech_outputs[0] is not None:
        assert len(out.speech_outputs[0]) % frame == 0
    assert out.reach_max_step_sample.shape == (1,)


def test_generate_with_voice_prompt(model):
    frame = CFG.acoustic_tokenizer.total_stride
    tk = TinyTokenizer()
    b, t = 1, 16
    ids = _prompt(b, t)
    # voice prompt occupying 3 diffusion slots
    ids[0, 2] = tk.speech_start_id
    ids[0, 3:6] = tk.speech_diffusion_id
    ids[0, 6] = tk.speech_end_id
    smask = np.zeros((b, t), bool)
    smask[0, 3:6] = True
    speech = np.random.RandomState(1).randn(1, 3 * frame).astype(np.float32) * 0.1
    sp_masks = np.ones((1, 3), bool)

    out = model.generate(ids, speech_tensors=speech, speech_masks=sp_masks,
                         speech_input_mask=smask, cfg_scale=1.5,
                         max_new_tokens=12, chunk_steps=4)
    assert out.sequences.shape[0] == 1


def test_generate_batch_and_determinism(model):
    ids = _prompt(b=2, t=12)
    out1 = model.generate(ids, cfg_scale=1.3, max_new_tokens=12, chunk_steps=4, seed=7)
    out2 = model.generate(ids, cfg_scale=1.3, max_new_tokens=12, chunk_steps=4, seed=7)
    np.testing.assert_array_equal(out1.sequences, out2.sequences)
    for a, b_ in zip(out1.speech_outputs, out2.speech_outputs):
        if a is None:
            assert b_ is None
        else:
            np.testing.assert_allclose(a, b_, atol=1e-6)


def test_max_length_times_budget(model):
    """Generated steps must respect min(max_new, 2x prompt) (inference:420-422)."""
    ids = _prompt(b=1, t=12)
    out = model.generate(ids, cfg_scale=1.0, max_new_tokens=100,
                         max_length_times=1.0, chunk_steps=4, do_sample=False)
    # budget = 1.0 * 12 = 12 steps; chunked execution may overshoot by < chunk
    assert out.sequences.shape[1] <= 12 + 4


def test_write_pointer_cache_semantics():
    """The negative-context write-pointer trick must equal recomputing the
    kept subsequence from scratch (replaces the reference's KV shift surgery,
    inference:588-622)."""
    dcfg = CFG.decoder
    params = qwen2.init_params(jax.random.PRNGKey(1), dcfg, jnp.float32)
    rs = np.random.RandomState(2)
    n_stream = 7
    embeds = jnp.asarray(rs.randn(1, n_stream, dcfg.hidden_size), jnp.float32) * 0.1
    keep = [True, False, True, True, False, True, True]

    # pointer-based: write each embed at ptr, advance only when kept
    cache = qwen2.init_kv_cache(dcfg, 1, 16, jnp.float32)
    ptr = 0
    hiddens = []
    for i in range(n_stream):
        pos = jnp.asarray([ptr])
        h, cache = qwen2.decode_step(params, dcfg, embeds[:, i:i + 1],
                                     positions=pos, write_idx=jnp.asarray([ptr]),
                                     kv_start=jnp.asarray([0]),
                                     kv_len=jnp.asarray([ptr + 1]), cache=cache)
        hiddens.append(h[:, 0])
        if keep[i]:
            ptr += 1

    # reference: full forward over kept prefix + current token
    kept_idx = [i for i in range(n_stream) if keep[i]]
    for i in range(n_stream):
        prefix = [j for j in kept_idx if j < i] + [i]
        sub = embeds[:, prefix, :]
        t = sub.shape[1]
        causal = jnp.arange(t)[None, :, None] >= jnp.arange(t)[None, None, :]
        h_full, _ = qwen2.forward(params, dcfg, sub,
                                  positions=jnp.arange(t)[None, :],
                                  cache=None, attn_mask=causal)
        np.testing.assert_allclose(np.asarray(hiddens[i][0]),
                                   np.asarray(h_full[0, -1]), rtol=2e-4, atol=2e-4)


def test_negative_prompt_ids_change_cfg(model):
    """A custom negative prompt must flow into the CFG branch: with cfg!=1 the
    generated audio differs from the default [speech_start] negative context
    (the reference accepts negative_prompt_ids but silently ignores them —
    main.py:1177-1198 vs modeling_vibevoice_inference.py:377-384; we honor
    them)."""
    ids = _prompt(t=12)
    neg = np.array([[21, 22, 23, 24]])
    # the AdaLN head is zero-initialized (its output ignores the condition at
    # init), so give it non-zero weights for the CFG signal to exist
    rs = np.random.RandomState(9)
    params = dict(model.params)
    params["diffusion_head"] = jax.tree.map(
        lambda x: jnp.asarray(rs.randn(*x.shape) * 0.05, x.dtype),
        model.params["diffusion_head"])
    gen = VibeVoiceGenerator(params, CFG, TinyTokenizer(),
                             ddpm_inference_steps=4, lm_dtype=jnp.float32)
    # high-temperature sampling so diffusion tokens occur with random weights;
    # the token path only reads the positive context, so both runs share the
    # same token/diffusion schedule and differ only through CFG
    kw = dict(cfg_scale=2.5, max_new_tokens=12, chunk_steps=4, seed=11,
              do_sample=True, temperature=8.0, top_p=1.0,
              max_length_times=1000.0)
    out_def = gen.generate(ids, **kw)
    out_neg = gen.generate(ids, negative_prompt_ids=neg, **kw)
    # same constrained token dynamics are possible, but the diffusion CFG
    # signal must differ -> audio differs wherever frames were diffused
    a, bq = out_def.speech_outputs[0], out_neg.speech_outputs[0]
    assert a is not None and bq is not None
    n = min(len(a), len(bq))
    # scale-aware: the random-weights audio amplitude can be arbitrarily
    # small, so compare the difference against the signal's own scale
    scale = max(float(np.abs(a[:n]).max()), 1e-30)
    assert float(np.abs(a[:n] - bq[:n]).max()) > 1e-3 * scale, \
        "negative prompt had no effect on CFG output"
    # cfg_scale=1.0 collapses CFG (eps = cond), so the negative context must
    # have NO effect there
    kw["cfg_scale"] = 1.0
    out1 = gen.generate(ids, **kw)
    out2 = gen.generate(ids, negative_prompt_ids=neg, **kw)
    a1, a2 = out1.speech_outputs[0], out2.speech_outputs[0]
    n = min(len(a1), len(a2))
    np.testing.assert_allclose(a1[:n], a2[:n], atol=1e-5)


def test_negative_prompt_ragged_batch(model):
    """Per-row negative prompts with an attention mask (ragged lengths)."""
    ids = _prompt(b=2, t=12)
    neg = np.array([[0, 21, 22], [31, 32, 33]])
    nmask = np.array([[0, 1, 1], [1, 1, 1]])
    out = model.generate(ids, negative_prompt_ids=neg,
                         negative_prompt_attention_mask=nmask,
                         cfg_scale=1.5, max_new_tokens=6, chunk_steps=3,
                         seed=0, max_length_times=1000.0)
    assert out.sequences.shape[0] == 2


def test_top_k_sampling(model):
    """top_k=1 with do_sample must equal greedy decoding."""
    ids = _prompt(t=12)
    kw = dict(cfg_scale=1.3, max_new_tokens=8, chunk_steps=4,
              max_length_times=1000.0)
    greedy = model.generate(ids, do_sample=False, seed=5, **kw)
    topk1 = model.generate(ids, do_sample=True, top_k=1, temperature=1.0,
                           top_p=1.0, seed=5, **kw)
    np.testing.assert_array_equal(greedy.sequences, topk1.sequences)


def test_max_steps_per_sample_ragged_batch(model):
    """Per-sample budget with a ragged (left-padded) batch: the short sample
    must hit its own cap (times * its valid length) while the long sample
    keeps going to its larger cap (reference per-sample max-step semantics,
    inference:528-537). Budget test previously covered only b=1."""
    tk = TinyTokenizer()
    rs = np.random.RandomState(2)
    b, t = 2, 16
    ids = rs.randint(20, 200, (b, t))
    ids[:, -1] = tk.speech_start_id
    attn = np.ones((b, t), np.int64)
    attn[0, :10] = 0          # sample 0 valid length 6; sample 1 length 16
    ids[0, :10] = tk.pad_id
    out = model.generate(ids, attention_mask=attn, cfg_scale=1.3,
                         max_new_tokens=64, max_length_times=1.0,
                         chunk_steps=4, do_sample=False)
    # caps: sample0 = 1.0*6 = 6, sample1 = 1.0*16 = 16
    assert bool(out.reach_max_step_sample[0])
    seq0 = out.sequences[0]
    # after its cap the short sample must be forced to eos
    assert (seq0[6:] == tk.eos_id).all()
    # the long sample runs past the short one's cap to its OWN cap: not
    # eos-forced at step 6, forced from step 16, and flagged reach_max
    seq1 = out.sequences[1]
    assert bool(out.reach_max_step_sample[1])
    assert not (seq1[6:16] == tk.eos_id).all()
    assert (seq1[16:] == tk.eos_id).all()


def test_external_stream_end_aborts_one_sample(model):
    """Ending one sample's stream from the consumer side (client disconnect)
    must abort ONLY that sample; the rest of the batch keeps generating.
    Before the fix, ANY streamer flag — including the loop's own
    natural-finish flags — halted the whole batch."""
    from vibevoice_tpu.streamer import AudioStreamer

    tk = TinyTokenizer()
    ids = _prompt(b=2, t=12)
    base = model.generate(ids, cfg_scale=1.3, max_new_tokens=16,
                          chunk_steps=4, do_sample=False,
                          max_length_times=1000.0)

    streamer = AudioStreamer(batch_size=2)
    streamer.end([0])   # sample 0's consumer is gone before generation starts
    out = model.generate(ids, cfg_scale=1.3, max_new_tokens=16,
                         chunk_steps=4, do_sample=False,
                         max_length_times=1000.0, audio_streamer=streamer)

    # sample 1 is unaffected: token-identical to the streamer-less run
    np.testing.assert_array_equal(out.sequences[1], base.sequences[1])
    if base.speech_outputs[1] is not None:
        np.testing.assert_allclose(out.speech_outputs[1],
                                   base.speech_outputs[1], atol=1e-6)
    # sample 0 was force-finished after the first chunk: eos from there on
    assert (out.sequences[0][8:] == tk.eos_id).all()
    # sample 1's stream delivered audio; sample 0's queue got nothing
    assert streamer.audio_queues[0].qsize() <= 1   # stop sentinel only


def test_assemble_state_leaves_own_distinct_buffers(model):
    """The fused single-dispatch assemble (generate.py:_build_assemble) must
    give every GenState leaf its own buffer: the chunk program donates the
    whole state, and XLA rejects donating one buffer twice.  Identical
    zero/full constants (neg_ptr vs pos_len, the many same-shape conv-state
    zeros) are exactly the leaves a compiler would dedup — the per-leaf
    optimization_barriers exist to stop that."""
    ids = _prompt()
    from vibevoice_tpu.utils.profiling import StageTimer
    state = model._prefill_state(
        ids, np.ones_like(ids), None, None, None, None, None,
        jax.random.PRNGKey(0), 16, 64, np.full((1,), 1 << 30, np.int64),
        StageTimer())
    ptrs = [l.unsafe_buffer_pointer() for l in jax.tree.leaves(state)
            if hasattr(l, "unsafe_buffer_pointer")]
    assert len(ptrs) == len(set(ptrs)), "aliased GenState leaf buffers"


def test_streamer_bounds_chunk_cadence(model):
    """With a live audio streamer the adaptive chunk growth is bounded by
    ``max_gap_s`` (VERDICT r2 item 4): a tiny bound pins every chunk at the
    base ``chunk_steps``; an explicit ``max_gap_s=None`` (or no streamer)
    lets steady-state chunks grow to ``chunk_steps_max``."""
    from vibevoice_tpu.streamer import AudioStreamer

    ids = _prompt(1, 12)
    kw = dict(cfg_scale=1.3, max_new_tokens=24, chunk_steps=2,
              chunk_steps_max=16, max_length_times=1000.0, seed=0)

    streamer = AudioStreamer(batch_size=1)
    model.generate(ids, audio_streamer=streamer, max_gap_s=1e-9, **kw)
    assert set(model.last_chunk_sizes) == {2}, model.last_chunk_sizes

    model.generate(ids, max_gap_s=None, **kw)
    sizes = model.last_chunk_sizes
    assert sizes[:2] == [2, 2], sizes
    if len(sizes) > 2:          # (all rows may finish inside the warmup)
        assert max(sizes) == 16, sizes


def test_streamer_growth_never_compiles_midstream(model):
    """With a streamer attached, chunk growth only ever steps onto sizes
    whose program is ALREADY compiled: bigger ladder sizes are AOT-compiled
    in a background thread (generate.py start_aot) and adopted once ready,
    so a consumer never sees a compile-length gap (VERDICT r2 item 4 — the
    r2 ladder introduced exactly that stall)."""
    from vibevoice_tpu.streamer import AudioStreamer

    ids = _prompt(1, 12)
    streamer = AudioStreamer(batch_size=1)
    pre_ready = {k[0] for k in model._chunk_ready}   # earlier tests' programs
    model.generate(ids, audio_streamer=streamer, cfg_scale=1.3,
                   max_new_tokens=64, chunk_steps=2, chunk_steps_max=16,
                   max_gap_s=10.0, max_length_times=1000.0, seed=0)
    sizes = model.last_chunk_sizes
    ladder = {2, 4, 8, 16}
    assert set(sizes) <= ladder, sizes
    # every NEW size above the base must have gone through the AOT path —
    # the only way a fresh program can appear under a live streamer
    aot_sizes = {k[0] for k in model._chunk_aot}
    for s in set(sizes) - {2} - pre_ready:
        assert s in aot_sizes, (sizes, aot_sizes, pre_ready)


@pytest.mark.parametrize("bits", [None, 8, 4])
def test_fused_projections_match_unfused(bits):
    """fuse_lm_projections (serving transform) must not change a single
    token or audio sample: splitting the fused qkv / gate|up output equals
    the separate matmuls because all quant tiers scale per output column."""
    import os
    from vibevoice_tpu.ops.quant import quantize_lm_params

    params = vibevoice.init_params(jax.random.PRNGKey(3), CFG, jnp.float32)
    if bits is not None:
        params["lm"] = quantize_lm_params(params["lm"], bits=bits,
                                          colscale=(bits == 4))
    ids = _prompt(t=16)
    outs = []
    for fuse in ("0", "1"):
        os.environ["VIBEVOICE_FUSE_PROJ"] = fuse
        try:
            gen = VibeVoiceGenerator(params, CFG, TinyTokenizer(),
                                     ddpm_inference_steps=3,
                                     lm_dtype=jnp.float32)
            if fuse == "1":
                assert "wqkv" in gen.params["lm"]["layers"]
                assert "wgu" in gen.params["lm"]["layers"]
            outs.append(gen.generate(ids, cfg_scale=1.3, max_new_tokens=10,
                                     chunk_steps=5, seed=7,
                                     max_length_times=1000.0))
        finally:
            del os.environ["VIBEVOICE_FUSE_PROJ"]
    a, b_ = outs
    np.testing.assert_array_equal(a.sequences, b_.sequences)
    if a.speech_outputs[0] is not None:
        np.testing.assert_allclose(a.speech_outputs[0], b_.speech_outputs[0],
                                   rtol=1e-6, atol=1e-7)


def test_streaming_observed_gap_bound(model):
    """VERDICT r3 next #3: the cadence bound must hold on OBSERVED producer
    gaps over a >=200-step streamed run, not just in the pick_k policy.
    The tiny random model never emits diffusion tokens (no audio puts), so
    the gate is on chunk-FETCH timestamps — the cadence the ladder paces;
    consumer put gaps equal these plus host decode time (the bench's
    streaming_max_gap_ms measures the put side on the real model).  x1.3:
    the EMA adapts over its first chunks, so one early chunk may overshoot
    while the estimate converges.  Wall-clock timing on a shared CPU host is
    noisy (background ladder compiles from earlier tests, machine load), and
    the ladder itself starts background compiles of bigger sizes DURING the
    first runs — on the CPU platform those compiles contend with 'device'
    execution (GIL-held tracing + shared thread pools) and can stall a
    fetch for seconds, which a real TPU never sees (bench
    streaming_max_gap_ms gates that side).  Early attempts therefore serve
    as priming until the ladder is fully compiled; only the last attempt's
    cadence is asserted."""
    import threading

    from vibevoice_tpu.streamer import AudioStreamer

    bound = 0.3
    attempts = 3
    for attempt in range(attempts):
        # drain in-flight ladder compiles before measuring: on the CPU test
        # platform a background compile shares the host with "device"
        # execution (GIL-held tracing + XLA's intra-op pool), so a compile
        # mid-measurement shows up as a multi-second fetch gap that a real
        # TPU run never sees (bench streaming_max_gap_ms gates that side)
        t_drain = time.time()
        while model._chunk_compiling and time.time() - t_drain < 120:
            time.sleep(0.05)
        streamer = AudioStreamer(batch_size=1)
        th = threading.Thread(
            target=lambda s=streamer: [None for _ in s.get_stream(0)])
        th.start()
        ids = _prompt(1, 12)
        model.generate(ids, cfg_scale=1.3, max_new_tokens=220, chunk_steps=2,
                       chunk_steps_max=64, max_gap_s=bound,
                       audio_streamer=streamer,
                       max_length_times=1000.0, seed=0)
        th.join(timeout=30)
        sizes = model.last_chunk_sizes
        assert sum(sizes) >= 200 and len(sizes) >= 6, sizes
        gaps = np.diff(np.asarray(model.last_chunk_times))
        p99 = float(np.quantile(gaps, 0.99))
        # every dispatched size was under the bound per the live EMA, and
        # the grow path engaged through the BACKGROUND compiler only (on CPU
        # the ladder compiles don't finish within the run, so growth itself
        # is a real-hardware assertion — bench streaming_max_gap_ms; here
        # the contract is: no sync compile mid-stream, bigger sizes in
        # flight).  Both checks are load-sensitive: a slammed host inflates
        # the EMA enough that the ladder legitimately declines to grow.
        bigger = {k[0] for k in (model._chunk_ready | model._chunk_compiling)
                  if k[0] > 2}
        if p99 <= bound * 1.3 and bigger:
            break
        if attempt == attempts - 1:
            assert p99 <= bound * 1.3, (p99, sorted(gaps)[-5:], sizes)
            assert bigger, (model._chunk_ready, model._chunk_compiling)

def test_prefill_w8a8_scope_confined_to_prefill():
    """Quantized-compute prefill (prefill_w8a8=True): the W8A8 contextvar
    scope must be ACTIVE while the prefill program traces and INACTIVE for
    the decode chunk traces — and the end-to-end output must stay close to
    the W8A16 baseline (the scope only changes int8 matmul activation
    precision).  Class-of-bug probe: records the scope value seen by every
    quantized matmul trace."""
    from vibevoice_tpu.ops import quant

    params = vibevoice.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    params = dict(params)
    params["lm"] = quant.quantize_lm_params(params["lm"], bits=8)
    ids = _prompt(1, 12)

    base = VibeVoiceGenerator(params, CFG, TinyTokenizer(),
                              ddpm_inference_steps=3, lm_dtype=jnp.float32)
    out_base = base.generate(ids, cfg_scale=1.3, max_new_tokens=8,
                             chunk_steps=4, max_length_times=1000.0, seed=3)

    seen = []
    orig = quant.current_w8a8

    def probe():
        v = orig()
        seen.append(v)
        return v

    quant.current_w8a8 = probe
    try:
        gen = VibeVoiceGenerator(params, CFG, TinyTokenizer(),
                                 ddpm_inference_steps=3,
                                 lm_dtype=jnp.float32, prefill_w8a8=True)
        out = gen.generate(ids, cfg_scale=1.3, max_new_tokens=8,
                           chunk_steps=4, max_length_times=1000.0, seed=3)
    finally:
        quant.current_w8a8 = orig
    # both scope states were observed during tracing: True (prefill
    # programs) and False (decode chunks)
    assert True in seen and False in seen, set(seen)
    # int8-activation prefill perturbs but must not derail generation
    assert out.sequences.shape == out_base.sequences.shape
    a, b_ = out.speech_outputs[0], out_base.speech_outputs[0]
    if a is not None and b_ is not None:
        m = min(len(a), len(b_))
        rel = (np.linalg.norm(a[:m] - b_[:m])
               / max(np.linalg.norm(b_[:m]), 1e-9))
        assert rel < 0.1, rel
