"""Benchmark: VibeVoice steady-state generation RTF on one TPU chip.

Measures the full fused token step (CFG-paired LM decode + constrained
sampling + DPM diffusion scan + streaming vocode + semantic re-encode) in the
real serving configuration.

The default run covers the whole BASELINE matrix:
  * config 1/2: 1.5B bf16 RTF (ddpm5 median-of-3) + ddpm10 tier
  * quant tiers: full-int8 and full-int4 (per-column-scale) serving stacks
  * config 4: streaming path through AudioStreamer (producer-side cadence:
    first chunk, p50 device-sync gap, max gap — NOT consumer pop gaps, which
    read 0 when the consumer outruns the producer)
  * continuous-batching engine: aggregate RTF over staggered requests +
    p50/p99 submit->first-audio latency joining a LIVE batch
  * config 3: 7B full-int8, 4 speakers with per-speaker voice prompts
    (prefill speech encode + scatter), single chip
  * config 5: 7B full-int8 long-form — decode sustained to >32k live context
  * 1.5B 64k endgame: decode at >40k live context (the reference's ~90-min
    headline regime, README.md:260)

Honesty notes:
  * audio seconds are counted from frames that actually DIFFUSED (vocoded
    audio emitted), not from raw step count.  The bench tokenizer aliases
    speech_start to speech_diffusion and the valid-token embedding rows are
    identical, so greedy decoding deterministically emits the diffusion token
    every step — the same ~1 control token per minute regime as trained
    weights, with zero dependence on random-weight argmax luck.
  * compile_s is the FIRST in-process build (tracing + compile or persistent-
    cache deserialization); compile_warm_s rebuilds the same generator fresh
    in-process (new jit objects -> persistent-cache hits), the restart cost a
    served process actually pays.  The repo commits its cache (.xla_cache).
  * hbm_gb numbers are analytic (sum of live buffer bytes); the tunneled
    device does not expose memory_stats.
  * BENCH_HEAVY=0 skips the 7B/long-form tiers (laptop-scale smoke run).
"""

import gc
import json
import os
import sys
import threading
import time

import jax

# the TPU plugin in this environment ignores the JAX_PLATFORMS env var; a
# CPU smoke run (BENCH_CPU=1) must force the backend before any device use
if os.environ.get("BENCH_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from vibevoice_tpu.processor.text_tokenizer import (EOS_ID, PAD_ID,
                                                    SPEECH_DIFFUSION_ID,
                                                    SPEECH_END_ID)


class BenchTokenizer:
    """speech_start aliased to the diffusion id (see module docstring)."""
    eos_id = EOS_ID
    speech_start_id = SPEECH_DIFFUSION_ID
    speech_end_id = SPEECH_END_ID
    speech_diffusion_id = SPEECH_DIFFUSION_ID
    pad_id = PAD_ID
    bos_id = EOS_ID


def build_generator(cfg, ddpm_steps, quantize=False, quantize_head=False,
                    bits=8, colscale=False, quantize_embed=False,
                    kv_quant=False, prefill_w8a8=None):
    from vibevoice_tpu.generation import VibeVoiceGenerator
    from vibevoice_tpu.models import vibevoice

    # cheap deterministic fill (values don't affect timing; a real RNG init
    # of 233M params costs minutes of unjitted dispatches over the tunnel).
    # Constant weights make every valid-token logit tie, and argmax picks the
    # FIRST valid id — the aliased diffusion token — so every step diffuses,
    # matching the trained-weights regime.
    shapes = jax.eval_shape(lambda k: vibevoice.init_params(k, cfg, jnp.bfloat16),
                            jax.random.PRNGKey(0))
    if quantize:
        # synthesize the quantized leaves directly from shapes — materializing
        # the bf16 7B tree first (~15 GB) would not leave room to quantize on
        # a 16 GB chip; values are irrelevant to timing
        from vibevoice_tpu.ops.int4 import quantizable_int4, quantizable_int4c
        from vibevoice_tpu.ops.quant import _LM_QUANT_KEYS

        def synth(sl):
            inn = sl.shape[-2]
            if bits == 4 and colscale and quantizable_int4c(sl.shape):
                return {"q4c": jnp.ones(sl.shape[:-2] + (inn // 2,) + sl.shape[-1:],
                                        jnp.int8),
                        "s4c": jnp.full(sl.shape[:-2] + (1,) + sl.shape[-1:],
                                        1e-4, jnp.float32)}
            if bits == 4 and not colscale and quantizable_int4(sl.shape):
                return {"q4": jnp.ones(sl.shape[:-2] + (inn // 2,) + sl.shape[-1:],
                                       jnp.int8),
                        "s4": jnp.full(sl.shape[:-2] + (inn // 16,) + sl.shape[-1:],
                                       1e-4, jnp.bfloat16)}
            return {"q": jnp.ones(sl.shape, jnp.int8),
                    "s": jnp.full(sl.shape[:-2] + sl.shape[-1:], 1e-4,
                                  jnp.float32)}

        lm_shapes = dict(shapes["lm"])
        layers = dict(lm_shapes["layers"])
        for k in _LM_QUANT_KEYS:
            layers[k] = synth(layers[k])
        lm_shapes["layers"] = layers
        if quantize_embed:
            # int8 embed + lm_head (capacity tier): frees ~2 GB on 7B so the
            # 32k-context KV cache fits beside the weights on one 16 GB chip
            lm_shapes["embed"] = {
                "q": jnp.ones(lm_shapes["embed"].shape, jnp.int8),
                "s": jnp.full(lm_shapes["embed"].shape[-1:], 1e-4, jnp.float32)}
            if "lm_head" in lm_shapes:
                lm_shapes["lm_head"] = synth(lm_shapes["lm_head"])
        shapes = dict(shapes)
        shapes["lm"] = lm_shapes
    params = dict(jax.tree.map(
        lambda s: (s if isinstance(s, jax.Array)
                   else jnp.full(s.shape, 0.01, s.dtype)), shapes))
    if quantize_head:
        from vibevoice_tpu.ops.quant import quantize_diffusion_head_params
        params["diffusion_head"] = quantize_diffusion_head_params(
            params["diffusion_head"], bits=bits, colscale=colscale)
    if os.environ.get("BENCH_QUANT_TOK", "0") == "1":
        from vibevoice_tpu.ops.quant import quantize_tokenizer_params
        qconvs = os.environ.get("BENCH_QUANT_CONV", "0") == "1"
        params["acoustic"] = quantize_tokenizer_params(
            params["acoustic"], bits=bits, colscale=colscale, convs=qconvs)
        params["semantic"] = quantize_tokenizer_params(
            params["semantic"], bits=bits, colscale=colscale, convs=qconvs)
    return VibeVoiceGenerator(params, cfg, BenchTokenizer(),
                              ddpm_inference_steps=ddpm_steps,
                              lm_dtype=jnp.bfloat16, kv_quant=kv_quant,
                              prefill_w8a8=prefill_w8a8)


def full_quant_tiers(gen_params, bits, colscale):
    """Quantize the tokenizer/conv stack in-place on a generator's params
    (the full serving stack used by the int8/int4/7B tiers).  Restacks the
    int4c stages afterward: stacking normally happens at generator
    construction, which this post-hoc path bypasses — without the restack
    the int4 tier silently loses the fused ConvNeXt-stage kernel (r4
    profiling caught exactly that: 14+ per-block _int4c_matmul_2d calls per
    step where one fused call should run)."""
    from vibevoice_tpu.models.acoustic_tokenizer import stack_tokenizer_stages
    from vibevoice_tpu.ops.quant import quantize_tokenizer_params
    gen_params["acoustic"] = quantize_tokenizer_params(
        gen_params["acoustic"], bits=bits, colscale=colscale, convs=True)
    gen_params["semantic"] = quantize_tokenizer_params(
        gen_params["semantic"], bits=bits, colscale=colscale, convs=True)
    if os.environ.get("VIBEVOICE_FUSE_STAGE", "0") == "1":
        gen_params["acoustic"] = {
            **gen_params["acoustic"],
            "decoder": stack_tokenizer_stages(gen_params["acoustic"]["decoder"])}
        gen_params["semantic"] = stack_tokenizer_stages(gen_params["semantic"])


def sustained_rtf(gen, wall, audio, chunk_steps, frame_s):
    """Decode-only RTF at depth (the long-form regime is a long SESSION: the
    one-time prefill is TTFA, not throughput).  Prefill dispatches async so
    the stage timer no longer observes its cost — exclude it via the run's
    TTFA: audio and wall past the first chunk."""
    ttfa = gen.last_metrics.get("ttfa", {}).get("total_s", 0.0)
    a_first = chunk_steps * frame_s
    if wall > ttfa > 0 and audio > a_first:
        return round((audio - a_first) / (wall - ttfa), 3)
    return None


def tree_gb(tree) -> float:
    return sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(tree)
               if hasattr(l, "dtype")) / 1e9


def run_config(gen, ids, steps, chunk, cfg_scale, frame_sec, streamer=None,
               chunk_max=None, stop_check_fn=None, **kw):
    t0 = time.perf_counter()
    out = gen.generate(ids, cfg_scale=cfg_scale, max_new_tokens=steps,
                       chunk_steps=chunk, chunk_steps_max=chunk_max,
                       max_length_times=1000.0,
                       refresh_negative=False, audio_streamer=streamer,
                       stop_check_fn=stop_check_fn, **kw)
    wall = time.perf_counter() - t0
    diffused = sum(len(a) // gen.frame_samples
                   for a in out.speech_outputs if a is not None)
    return wall, int(out.sequences.shape[1]), diffused, diffused * frame_sec


def median_run(gen, ids, steps, chunk, cfg_scale, frame_sec, n=3, **kw):
    """Median-of-n run_config (by wall time).  Single-shot heavy tiers are
    vulnerable to one transient tunnel stall misreporting the tier 2-3x low
    (observed once on the 7B tier); the device work per extra run is ~3 s."""
    assert n % 2 == 1, "median_run needs odd n"
    runs = sorted((run_config(gen, ids, steps, chunk, cfg_scale, frame_sec,
                              **kw) for _ in range(n)),
                  key=lambda r: r[0])
    return runs[n // 2]


def stop_after_chunks(n):
    """stop_check_fn that lets ~n chunks run — warms prefill + chunk programs
    (persistent-cache deserialization) at full shape without a full-length run."""
    calls = [0]

    def fn():
        calls[0] += 1
        return calls[0] > n

    return fn


def make_ids(batch, t0_len):
    rs = np.random.RandomState(0)
    ids = rs.randint(20, 200, (batch, t0_len))
    ids[:, -1] = BenchTokenizer.speech_start_id
    return ids


def voice_prompt_inputs(n_speakers, frames_per_speaker, t0_len, frame):
    """Config-3 semantics (reference demo/inference_from_file.py:209-446):
    per-speaker voice prompt audio expands to diffusion-pad slots in the
    prompt; speech_input_mask marks them for the prefill encode+scatter."""
    rs = np.random.RandomState(3)
    ids = rs.randint(20, 200, (1, t0_len))
    smask = np.zeros((1, t0_len), bool)
    pos = 8
    for k in range(n_speakers):
        ids[0, pos] = BenchTokenizer.speech_start_id
        ids[0, pos + 1:pos + 1 + frames_per_speaker] = SPEECH_DIFFUSION_ID
        smask[0, pos + 1:pos + 1 + frames_per_speaker] = True
        ids[0, pos + 1 + frames_per_speaker] = BenchTokenizer.speech_end_id
        pos += frames_per_speaker + 3
    ids[0, -1] = BenchTokenizer.speech_start_id
    speech = rs.randn(n_speakers, frames_per_speaker * frame).astype(np.float32) * 0.1
    masks = np.ones((n_speakers, frames_per_speaker), bool)
    return ids, speech, masks, smask


def main():
    # `python bench.py --selftest`: just the on-chip kernel gate (every
    # Pallas variant lowered on real Mosaic + parity-checked), one JSON line
    if "--selftest" in sys.argv:
        from vibevoice_tpu.utils.selftest import run_selftest
        print(json.dumps({"metric": "kernel_selftest", "unit": "pass",
                          **run_selftest(verbose=True)}))
        return
    from vibevoice_tpu.config import VibeVoiceConfig
    from vibevoice_tpu.streamer import AudioStreamer
    from vibevoice_tpu.utils.compilation_cache import (cache_counts,
                                                       install_cache_counters)

    # count persistent-cache hits/misses for the whole bench run: a nonzero
    # miss count on a fresh clone means the committed .xla_cache no longer
    # covers the programs bench compiles (the r4 203 s regression's cause)
    install_cache_counters()

    model_name = os.environ.get("BENCH_MODEL", "1.5b")
    ddpm_steps = int(os.environ.get("BENCH_DDPM_STEPS", "5"))
    bench_steps = int(os.environ.get("BENCH_STEPS", "192"))
    chunk = int(os.environ.get("BENCH_CHUNK", "64"))
    with_extras = os.environ.get("BENCH_EXTRAS", "1") == "1"
    heavy = os.environ.get("BENCH_HEAVY", "1") == "1"
    # BENCH_QUANT: 0 = bf16; 1/8 = int8 LM (7B fits one chip); 4 = int4 LM
    # (group-16 fidelity tier); 4c = int4 per-column-scale speed tier
    quant_env = os.environ.get("BENCH_QUANT", "0")
    quant = quant_env in ("1", "8", "4", "4c")
    bits = 4 if quant_env in ("4", "4c") else 8
    colscale = quant_env == "4c"
    quant_head = os.environ.get("BENCH_QUANT_HEAD", "0") == "1"  # quantized AdaLN head
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    t0_len = int(os.environ.get("BENCH_PROMPT", "64"))  # prompt tokens

    cfg = VibeVoiceConfig.named(model_name)
    frame_sec = cfg.acoustic_tokenizer.total_stride / 24000.0
    gen = build_generator(cfg, ddpm_steps, quantize=quant,
                          quantize_head=quant_head, bits=bits,
                          colscale=colscale)

    ids = make_ids(batch, t0_len)

    # warmup / compile with the exact shape buckets of the measured runs
    t_c0 = time.perf_counter()
    run_config(gen, ids, bench_steps, chunk, 1.3, frame_sec)
    run_config(gen, ids, 1, 1, 1.3, frame_sec)
    compile_s = time.perf_counter() - t_c0

    # time-to-first-audio: prefill + one 1-step chunk (compiled)
    t_t0 = time.perf_counter()
    run_config(gen, ids, 1, 1, 1.3, frame_sec)
    ttfa_s = time.perf_counter() - t_t0

    if os.environ.get("BENCH_PROFILE", "0") == "1":
        # op-level attribution of one run (slower under instrumentation;
        # relative shares are the signal) — printed to stderr, JSON stays
        # the only stdout line
        from vibevoice_tpu.utils.profile_report import profile_callable
        rep = profile_callable(lambda: run_config(gen, ids, bench_steps, chunk,
                                                  1.3, frame_sec))
        print(rep["table"], file=sys.stderr)

    # config 1: steady state, 5 diffusion steps — median of 3 runs (the
    # host<->device link adds ~±10% run-to-run noise)
    runs = [run_config(gen, ids, bench_steps, chunk, 1.3, frame_sec)
            for _ in range(3)]
    runs.sort(key=lambda r: r[0])
    wall, steps, diffused, audio_sec = runs[1]
    rtf = audio_sec / wall

    extras = {}

    def stage_breakdown(g, prefix, step_ms):
        """Per-stage attribution of the fused step (profiled short run,
        bucketed by the stage_* named scopes — generate.py _make_step).
        step_ms_X = measured ms/step split by each stage's share of the
        staged device time; step_frac_other covers prefill + sampling glue."""
        try:
            import tempfile
            from vibevoice_tpu.utils.profile_report import aggregate_stages
            tdir = tempfile.mkdtemp(prefix="vvstages_")
            with jax.profiler.trace(tdir):
                run_config(g, ids, min(bench_steps, 48), chunk, 1.3, frame_sec)
            st = aggregate_stages(tdir)
            staged = sum(v for k_, v in st.items()
                         if k_ not in ("total", "other"))
            if st.get("total", 0) > 0 and staged > 0:
                for k_, v in st.items():
                    if k_ == "total":
                        continue
                    nm = k_.replace("stage_", "")
                    extras[f"{prefix}step_frac_{nm}"] = round(v / st["total"], 3)
                    if k_ != "other":
                        extras[f"{prefix}step_ms_{nm}"] = round(
                            step_ms * v / staged, 3)
            else:
                # never vanish silently (r3: real-TPU traces carried the
                # scope path differently and this branch hid it)
                extras[f"{prefix}step_frac_error"] = (
                    f"no staged device time (total={st.get('total', 0):.1f}"
                    f" ms, staged=0)")
        except Exception as e:  # noqa: BLE001 — failure-isolated tier
            extras[f"{prefix}step_frac_error"] = repr(e)[:120]

    def roofline_keys(g, step_ms, prefix, live_ctx):
        """Bandwidth-roofline keys (VERDICT r3 next #6): the decode step is
        HBM-bound, so its floor is bytes-streamed / bandwidth.  Bytes model:
        every LM layer weight once, the diffusion head's x-dependent FFN
        stack once per solver iteration (AdaLN mods are precomputed once),
        the conv tokenizer stacks once, and the live KV range for both CFG
        rows.  roofline_frac = floor_time / measured — a falling fraction
        flags efficiency regressions that RTF alone can hide behind model
        or schedule changes."""
        try:
            def nbytes(tree):
                return sum(l.size * l.dtype.itemsize
                           for l in jax.tree.leaves(tree)
                           if hasattr(l, "dtype"))

            p = g.params
            hl = p["diffusion_head"]["layers"]
            ffn = sum(nbytes(hl[k]) for k in ("wg", "wu", "wgu", "wd")
                      if k in hl)
            dcfg = g.cfg.decoder
            kv_item = 1 if g.kv_quant else jnp.dtype(g.lm_dtype).itemsize
            kv = (dcfg.num_hidden_layers * 2 * 2 * dcfg.num_key_value_heads
                  * dcfg.resolved_head_dim * kv_item * live_ctx)
            total = (nbytes(p["lm"]["layers"])
                     + nbytes(p["diffusion_head"])
                     + (g.ddpm_steps - 1) * ffn
                     + nbytes(p["acoustic"]["decoder"])
                     + nbytes(p["semantic"]) + kv)
            kind = jax.devices()[0].device_kind.lower()
            bw = next((v for k_, v in (("v5 lite", 8.19e11),
                                       ("v5e", 8.19e11), ("v5p", 2.765e12),
                                       ("v4", 1.2e12), ("v6", 1.64e12))
                       if k_ in kind), 8.19e11)
            extras[f"{prefix}hbm_bytes_per_step"] = int(total)
            extras[f"{prefix}roofline_frac"] = round(
                (total / bw) / (step_ms / 1e3), 3)
        except Exception as e:  # noqa: BLE001 — failure-isolated tier
            extras[f"{prefix}roofline_error"] = repr(e)[:120]

    stage_breakdown(gen, "", 1000 * wall / max(steps, 1))
    roofline_keys(gen, 1000 * wall / max(steps, 1), "", t0_len + bench_steps)

    # restart cost: a FRESH generator (new jit objects) on the same weights —
    # recompilation path with persistent-cache hits, i.e. what a server
    # restart pays.  Done on the already-resident params so no alloc churn.
    t_w0 = time.perf_counter()
    gen_warm = build_generator(cfg, ddpm_steps, quantize=quant,
                               quantize_head=quant_head, bits=bits,
                               colscale=colscale)
    run_config(gen_warm, ids, bench_steps, chunk, 1.3, frame_sec)
    run_config(gen_warm, ids, 1, 1, 1.3, frame_sec)
    extras["compile_warm_s"] = round(time.perf_counter() - t_w0, 1)
    del gen_warm
    gc.collect()

    if with_extras and not quant:
        # full-int8 and full-int4 serving tiers (LM + diffusion head +
        # tokenizer FFNs + strided resampling convs) — measured as the speed
        # headroom of the bandwidth-bound step.  int4 runs the Pallas
        # stacked-weight dequant kernels (ops/int4.py) at the reference
        # NF4's width and is the SPEED tier (one-native-op unpack + layer
        # index via scalar prefetch); int8 is the quality default.
        for tier_bits, tier_col, key in ((8, False, "int8_rtf"),
                                         (4, True, "int4_rtf")):
            gen_q = None
            try:
                gen_q = build_generator(cfg, ddpm_steps, quantize=True,
                                        quantize_head=True, bits=tier_bits,
                                        colscale=tier_col)
                full_quant_tiers(gen_q.params, tier_bits, tier_col)
                run_config(gen_q, ids, bench_steps, chunk, 1.3, frame_sec)  # compile
                wq_, sq_, _, aq_ = median_run(gen_q, ids, bench_steps, chunk,
                                              1.3, frame_sec)
                extras[key] = round(aq_ / wq_, 3)
                roofline_keys(gen_q, 1000 * wq_ / max(sq_, 1),
                              key.replace("rtf", ""), t0_len + bench_steps)

                if tier_bits == 4:
                    # post-int4 bottleneck attribution (VERDICT r3 item 3):
                    # at ~4 ms/step the conv vocode+semantic tail's share
                    # decides whether a quantized streaming-conv kernel pays
                    stage_breakdown(gen_q, "int4_", 1000 * wq_ / max(sq_, 1))
                if tier_bits == 4:
                    # throughput headline: the pipelined engine over the
                    # int4 stack — 8 slots, 16 staggered requests
                    from vibevoice_tpu.generation.engine import ContinuousEngine
                    eng4 = ContinuousEngine(gen_q, slots=8, cache_len=1024,
                                            chunk_steps=16, cfg_scale=1.3)
                    eng4.submit({"input_ids": ids[:1]}, max_new_tokens=8,
                                max_length_times=1000.0, seed=0)
                    eng4.drain()                      # compile outside timing
                    r4, t4 = [], time.perf_counter()
                    for i in range(16):
                        r4.append(eng4.submit(
                            {"input_ids": ids[:1]}, max_new_tokens=64,
                            max_length_times=1000.0, seed=i))
                        if i % 2 == 1:
                            eng4.step_chunk()
                    eng4.drain()
                    a4 = sum(0.0 if r.audio is None else
                             len(r.audio) / 24000.0 for r in r4)
                    assert all(r.error is None for r in r4)
                    extras["engine_int4_8slot_rtf"] = round(
                        a4 / (time.perf_counter() - t4), 3)

                    # ---- serving soak (r4 VERDICT #5) -------------------
                    # many staggered MIXED-LENGTH requests through the live
                    # engine: zero recompiles after warmup, flat HBM,
                    # (prompt,seed)-deterministic outputs vs solo runs, and
                    # join p99.  BENCH_SOAK_REQS sizes it (default 200).
                    try:
                        n_soak = int(os.environ.get("BENCH_SOAK_REQS",
                                                    "200"))
                        lens = (64, 128, 256)
                        steps_mix = (24, 48, 64, 96)
                        prompts = {L: make_ids(1, L) for L in lens}
                        # determinism probes: solo tokens for 3 (prompt,
                        # seed) pairs, compared against mid-soak outputs
                        probes = [(64, 7), (128, 11), (256, 13)]
                        solo_tok = {}
                        for L, sd in probes:
                            o = gen_q.generate(
                                prompts[L], cfg_scale=1.3,
                                max_new_tokens=48, chunk_steps=16,
                                max_length_times=1000.0,
                                refresh_negative=False, seed=sd)
                            solo_tok[(L, sd)] = np.asarray(o.sequences)[0]
                        # warmup: one request per prompt length
                        for L in lens:
                            eng4.submit({"input_ids": prompts[L]},
                                        max_new_tokens=8,
                                        max_length_times=1000.0, seed=0)
                        eng4.drain()
                        progs0 = (len(gen_q._chunk_jit)
                                  + len(gen_q._prefill_jit)
                                  + len(gen_q._suffix_jit))
                        hbm0 = sum(a.nbytes for a in jax.live_arrays())
                        rs_soak = np.random.RandomState(0)
                        soak_reqs, probe_reqs = [], {}
                        t_s0 = time.perf_counter()
                        join_ts = []
                        for i in range(n_soak):
                            L = lens[rs_soak.randint(len(lens))]
                            st_n = steps_mix[rs_soak.randint(
                                len(steps_mix))]
                            sd = 1000 + i
                            pr = None
                            for pj, (pL, psd) in enumerate(probes):
                                if (pL, psd) not in probe_reqs and \
                                        i == (pj + 1) * n_soak // 5:
                                    L, st_n, sd, pr = pL, 48, psd, (pL, psd)
                            st_ = AudioStreamer(batch_size=1) \
                                if i % 10 == 5 else None
                            t_sub = time.perf_counter()
                            r = eng4.submit({"input_ids": prompts[L]},
                                            max_new_tokens=st_n,
                                            max_length_times=1000.0,
                                            seed=sd, streamer=st_)
                            if st_ is not None:
                                # sampled submit -> first-audio join times
                                def _cj(st_=st_, t0_=t_sub):
                                    for _ in st_.get_stream(0):
                                        join_ts.append(
                                            time.perf_counter() - t0_)
                                        break
                                    for _ in st_.get_stream(0):
                                        pass          # drain
                                threading.Thread(target=_cj,
                                                 daemon=True).start()
                            if pr is not None:
                                probe_reqs[pr] = r
                            soak_reqs.append(r)
                            if i % 2 == 1:
                                eng4.step_chunk()
                        eng4.drain()
                        s_wall = time.perf_counter() - t_s0
                        s_audio = sum(
                            0.0 if r.audio is None
                            else len(r.audio) / 24000.0 for r in soak_reqs)
                        errs = [r.error for r in soak_reqs
                                if r.error is not None]
                        progs1 = (len(gen_q._chunk_jit)
                                  + len(gen_q._prefill_jit)
                                  + len(gen_q._suffix_jit))
                        hbm1 = sum(a.nbytes for a in jax.live_arrays())
                        def _det(k):
                            et = np.asarray(probe_reqs[k].tokens)
                            n_ = min(len(et), len(solo_tok[k]))
                            return (n_ >= 40
                                    and np.array_equal(et[:n_],
                                                       solo_tok[k][:n_]))
                        det_ok = (len(probe_reqs) == len(probes)
                                  and all(_det(k) for k in probe_reqs))
                        extras["soak_reqs"] = n_soak
                        extras["soak_aggregate_rtf"] = round(
                            s_audio / s_wall, 3)
                        extras["soak_errors"] = len(errs)
                        extras["soak_recompiles"] = progs1 - progs0
                        extras["soak_hbm_drift_mb"] = round(
                            (hbm1 - hbm0) / 1e6, 1)
                        extras["soak_determinism_ok"] = bool(det_ok)
                        if join_ts:
                            js = np.sort(np.asarray(join_ts))
                            extras["soak_join_p50_s"] = round(
                                float(np.median(js)), 3)
                            extras["soak_join_p99_s"] = round(float(
                                js[min(len(js) - 1,
                                       int(np.ceil(0.99 * len(js))) - 1)]),
                                3)
                    except Exception as e:  # noqa: BLE001
                        extras["soak_error"] = repr(e)[:200]
                    del eng4, r4
            except Exception as e:  # noqa: BLE001 — keep the line flowing
                extras[key + "_error"] = repr(e)[:200]
            finally:
                del gen_q
                gc.collect()
    if with_extras:
      # umbrella try: a failure in any of config2/streaming/engine must not
      # erase the primary numbers or skip the JSON print (the heavy tiers
      # below carry their own per-tier try-blocks)
      try:
        # config 2: CFG 1.3 with 10 diffusion steps (2-speaker regime);
        # warm up with the EXACT step count so cache_len matches and no
        # compile leaks into the measured run
        gen.set_ddpm_inference_steps(10)
        run_config(gen, ids, bench_steps, chunk, 1.3, frame_sec)  # compile
        w2, _, d2, a2 = run_config(gen, ids, bench_steps, chunk, 1.3, frame_sec)
        extras["config2_ddpm10_rtf"] = round(a2 / w2, 3)
        gen.set_ddpm_inference_steps(ddpm_steps)

        # config 4: streaming path — adaptive chunking (8-step first chunks
        # for latency, then 64-step for throughput).  Cadence is measured on
        # the PRODUCER side (time of each streamer.put): puts arrive in
        # bursts at device-sync boundaries, so the p50/max of the >0.5 ms
        # gaps are the real chunk cadence / worst stall a listener would
        # have to buffer over.
        run_config(gen, ids, 128, 8, 1.3, frame_sec, chunk_max=chunk)  # compile

        class TimedStreamer(AudioStreamer):
            def __init__(self):
                super().__init__(batch_size=1)
                self.put_t = []

            def put(self, chunks, indices=None):
                self.put_t.append(time.perf_counter())
                super().put(chunks, indices)

        streamer = TimedStreamer()

        def consume():
            for _ in streamer.get_stream(0):
                pass

        th = threading.Thread(target=consume)
        th.start()
        t_s0 = time.perf_counter()
        run_config(gen, ids, 128, 8, 1.3, frame_sec, streamer=streamer,
                   chunk_max=chunk)
        th.join(timeout=30)
        if len(streamer.put_t) > 2:
            pt = np.asarray(streamer.put_t)
            gaps = np.diff(pt)
            sync_gaps = gaps[gaps > 5e-4]
            extras["streaming_first_chunk_s"] = round(pt[0] - t_s0, 3)
            if len(sync_gaps):
                extras["streaming_p50_sync_gap_ms"] = round(
                    float(np.median(sync_gaps)) * 1e3, 1)
                extras["streaming_max_gap_ms"] = round(
                    float(gaps.max()) * 1e3, 1)
            extras["streaming_rtf"] = round(
                len(pt) * frame_sec / (pt[-1] - t_s0), 3)

        # prefix-cache tier: repeat-voice requests skip the acoustic encode +
        # voice-section prefill (generation/prefix_cache.py) — measured as
        # TTFA (prefill + one 1-step chunk) of a voice-prompted request with
        # a warm store (hit) vs a cleared store (miss), both fully compiled
        from vibevoice_tpu.generation.prefix_cache import PrefixCache
        gen.prefix_cache = PrefixCache(2)
        idsv, spv, spmv, simv = voice_prompt_inputs(
            1, 23, 96, cfg.acoustic_tokenizer.total_stride)
        kwv = dict(speech_tensors=spv, speech_masks=spmv,
                   speech_input_mask=simv)
        run_config(gen, idsv, 1, 1, 1.3, frame_sec, **kwv)  # compile (miss)
        t_p0 = time.perf_counter()
        run_config(gen, idsv, 1, 1, 1.3, frame_sec, **kwv)  # hit
        extras["prefix_hit_ttfa_s"] = round(time.perf_counter() - t_p0, 3)
        gen.prefix_cache.clear()
        t_p1 = time.perf_counter()
        run_config(gen, idsv, 1, 1, 1.3, frame_sec, **kwv)  # miss, compiled
        extras["prefix_miss_ttfa_s"] = round(time.perf_counter() - t_p1, 3)
        gen.prefix_cache = None

        # continuous-batching engine (beyond-reference serving): aggregate
        # throughput over staggered joins + join latency tails INTO a live
        # batch (p50/p99 submit -> first audio, what a production request
        # actually waits)
        from vibevoice_tpu.generation.engine import ContinuousEngine
        slots = int(os.environ.get("BENCH_ENGINE_SLOTS", "4"))
        eng = ContinuousEngine(gen, slots=slots, cache_len=1024,
                               chunk_steps=16, cfg_scale=1.3)
        eng.submit({"input_ids": ids[:1]}, max_new_tokens=8,
                   max_length_times=1000.0, seed=0)
        eng.drain()                                   # compile outside timing
        n_req = 2 * slots
        reqs, t_e0 = [], time.perf_counter()
        for i in range(n_req):
            reqs.append(eng.submit({"input_ids": ids[:1]}, max_new_tokens=64,
                                   max_length_times=1000.0, seed=i))
            if i % 2 == 1:                            # stagger: join mid-flight
                eng.step_chunk()
        eng.drain()
        e_wall = time.perf_counter() - t_e0
        e_audio = sum(0.0 if r.audio is None else len(r.audio) / 24000.0
                      for r in reqs)
        assert all(r.error is None for r in reqs)
        extras["engine_aggregate_rtf"] = round(e_audio / e_wall, 3)
        extras["engine_slots"] = slots

        # join-latency tails: keep slots-1 long requests live, then submit 8
        # short ones in sequence, timing submit -> first streamed audio each
        bg_streams = [AudioStreamer(batch_size=1) for _ in range(slots - 1)]
        bg = [eng.submit({"input_ids": ids[:1]}, max_new_tokens=100000,
                         max_length_times=1000.0, seed=100 + i, streamer=s_)
              for i, s_ in enumerate(bg_streams)]
        eng.step_chunk()                              # batch is live
        join_lat = []
        for j in range(8):
            st = AudioStreamer(batch_size=1)
            got = []
            t_j0 = time.perf_counter()
            jr = eng.submit({"input_ids": ids[:1]}, max_new_tokens=24,
                            max_length_times=1000.0, seed=200 + j, streamer=st)

            def consume_join(st=st, got=got, t_j0=t_j0):
                for _ in st.get_stream(0):
                    if not got:
                        got.append(time.perf_counter() - t_j0)

            thj = threading.Thread(target=consume_join)
            thj.start()
            while not jr.done.is_set():
                eng.step_chunk()
            thj.join(timeout=30)
            assert jr.error is None
            if got:
                join_lat.append(got[0])
        for s_ in bg_streams:                 # consumer-side abort of the rest
            s_.end([0])
        eng.drain()
        assert all(r.error is None for r in bg)
        if join_lat:
            jl = np.sort(np.asarray(join_lat))
            extras["engine_join_p50_s"] = round(float(np.median(jl)), 3)
            extras["engine_join_p99_s"] = round(
                float(jl[min(len(jl) - 1, int(np.ceil(0.99 * len(jl))) - 1)]), 3)
            # alias spellings (p50/p99 submit->first-audio into a live batch)
            extras["engine_p50_join_s"] = extras["engine_join_p50_s"]
            extras["engine_p99_join_s"] = extras["engine_join_p99_s"]

        # repeat-voice serving: a production TTS deployment reuses a handful
        # of voices across many requests, so the prefix cache is benched
        # where it earns its keep — join latency INTO a live batch when the
        # request carries multi-second voice prompts.  4 speakers x 60
        # frames (~8 s of voice each, ~250 voice-section tokens): a hit
        # skips the acoustic encode + voice-section prefill entirely.
        gen.prefix_cache = PrefixCache(4)
        idsv2, spv2, spmv2, simv2 = voice_prompt_inputs(
            4, 60, 288, cfg.acoustic_tokenizer.total_stride)
        vreq = dict(input_ids=idsv2, speech_tensors=spv2, speech_masks=spmv2,
                    speech_input_mask=simv2)
        # compile both paths + populate the store, outside timing
        eng.submit(vreq, max_new_tokens=2, max_length_times=1000.0, seed=0)
        eng.drain()
        gen.prefix_cache.clear()
        eng.submit(vreq, max_new_tokens=2, max_length_times=1000.0, seed=0)
        eng.drain()

        bg2_streams = [AudioStreamer(batch_size=1) for _ in range(slots - 1)]
        bg2 = [eng.submit({"input_ids": ids[:1]}, max_new_tokens=100000,
                          max_length_times=1000.0, seed=300 + i, streamer=s_)
               for i, s_ in enumerate(bg2_streams)]
        eng.step_chunk()                          # batch is live

        def voice_joins(n, warm):
            lats = []
            for j in range(n):
                if not warm:
                    gen.prefix_cache.clear()
                stj = AudioStreamer(batch_size=1)
                got = []
                t_v0 = time.perf_counter()
                jr2 = eng.submit(vreq, max_new_tokens=16,
                                 max_length_times=1000.0, seed=400 + j,
                                 streamer=stj)

                def consume_v(stj=stj, got=got, t_v0=t_v0):
                    for _ in stj.get_stream(0):
                        if not got:
                            got.append(time.perf_counter() - t_v0)

                thv = threading.Thread(target=consume_v)
                thv.start()
                while not jr2.done.is_set():
                    eng.step_chunk()
                thv.join(timeout=30)
                assert jr2.error is None, jr2.error
                if got:
                    lats.append(got[0])
            return lats

        lat_hit = voice_joins(5, warm=True)
        lat_miss = voice_joins(5, warm=False)
        for s_ in bg2_streams:            # consumer-side abort of the rest
            s_.end([0])
        eng.drain()
        assert all(r.error is None for r in bg2)
        if lat_hit and lat_miss:
            extras["prefix_engine_hit_join_s"] = round(
                float(np.median(lat_hit)), 3)
            extras["prefix_engine_miss_join_s"] = round(
                float(np.median(lat_miss)), 3)
        gen.prefix_cache = None
        # the engine holds the bf16 generator (and so its params): drop BOTH
        # here or the later `del gen` frees nothing and the 7B build OOMs a
        # 16 GB chip under the leftover ~6 GB
        del eng, reqs, bg, bg2, jr
      except Exception as e:  # noqa: BLE001
        extras["extras_error"] = repr(e)[:200]
        try:
            del eng               # the engine pins the generator's params
        except NameError:
            pass
      gc.collect()

    if with_extras and heavy and model_name == "1.5b":
        del gen
        gc.collect()

        # ---- 1.5B 64k endgame: decode at >40k live context ----------------
        # (reference headline: ~90 min @ 64k on 1.5B, README.md:260).  A 40.5k
        # synthetic prompt seeds the KV depth; decode then runs 1024 steps at
        # live context 40.5k -> 41.5k.  Warmup stops after 2 chunks so
        # persistent-cache deserialization stays outside the timed run.
        gen15q = deep_ids = None
        try:
            gen15q = build_generator(cfg, ddpm_steps, quantize=True,
                                     quantize_head=True, bits=8)
            full_quant_tiers(gen15q.params, 8, False)
            deep_ids = make_ids(1, 40500)
            lf_steps = 1024
            run_config(gen15q, deep_ids, lf_steps, chunk, 1.3, frame_sec,
                       stop_check_fn=stop_after_chunks(3))      # warm programs
            # TTFA at depth = 40.5k-token prefill + FIRST audio chunk.  The
            # first chunk is 8 steps — the serving streaming ladder starts
            # at the base chunk and grows, so a small first chunk is the
            # production TTFA shape; median-of-3 short runs (prefill is
            # W8A8 by default here: auto for long prompts over the
            # quantized stack, generate.py _use_w8a8_prefill)
            run_config(gen15q, deep_ids, 16, 8, 1.3, frame_sec)  # warm c8
            tt = []
            for _ in range(3):
                run_config(gen15q, deep_ids, 16, 8, 1.3, frame_sec)
                tt.append(gen15q.last_metrics.get("ttfa", {}).get(
                    "total_s", -1.0))
            extras["longform_64k_ttfa_s"] = round(sorted(tt)[1], 2)
            wl, sl, dl, al = run_config(gen15q, deep_ids, lf_steps, chunk, 1.3,
                                        frame_sec)
            extras["longform_64k_rtf"] = round(al / wl, 3)
            sr = sustained_rtf(gen15q, wl, al, chunk, frame_sec)
            if sr is not None:
                extras["longform_64k_rtf_sustained"] = sr
            extras["longform_64k_depth_end"] = 40500 + sl
            extras["longform_64k_hbm_gb"] = round(
                tree_gb(gen15q.params)
                + 28 * 2 * 2 * 2 * 128 * 52000 * 2 / 1e9, 2)
        except Exception as e:  # noqa: BLE001 - keep the JSON line flowing
            extras["longform_64k_error"] = repr(e)[:200]
        finally:
            del gen15q, deep_ids
            gc.collect()

        # bf16-prefill escape hatch at depth (the control for the W8A8
        # default above): prefill_w8a8=False runs the 40.5k prompt encode
        # with bf16 linears — same 8-step production first-chunk shape, so
        # the delta vs longform_64k_ttfa_s is exactly the W8A8 prefill win.
        gen15w = deep_ids = None
        try:
            gen15w = build_generator(cfg, ddpm_steps, quantize=True,
                                     quantize_head=True, bits=8,
                                     prefill_w8a8=False)
            full_quant_tiers(gen15w.params, 8, False)
            deep_ids = make_ids(1, 40500)
            run_config(gen15w, deep_ids, 16, 8, 1.3, frame_sec)  # compile
            ws = []
            for _ in range(3):
                run_config(gen15w, deep_ids, 16, 8, 1.3, frame_sec)
                ws.append(gen15w.last_metrics.get("ttfa", {}).get("total_s",
                                                                  -1.0))
            ws.sort()
            extras["longform_64k_bf16_prefill_ttfa_s"] = round(ws[1], 2)
        except Exception as e:  # noqa: BLE001
            extras["longform_64k_bf16_prefill_error"] = repr(e)[:200]
        finally:
            del gen15w, deep_ids
            gc.collect()

        # 64k endgame, best serving stack (int4 weights + int8 KV): at 41k
        # live context the bf16 dual-row KV stream is ~4.7 GB/step — the
        # dominant cost — and the weights are the rest; both halve (or
        # better) under this stack
        gen15b = deep_ids = None
        try:
            gen15b = build_generator(cfg, ddpm_steps, quantize=True,
                                     quantize_head=True, bits=4,
                                     colscale=True, kv_quant=True)
            full_quant_tiers(gen15b.params, 4, True)
            deep_ids = make_ids(1, 40500)
            run_config(gen15b, deep_ids, 1024, chunk, 1.3, frame_sec,
                       stop_check_fn=stop_after_chunks(3))
            gc.collect()
            wb_, sb_, db_, ab_ = run_config(gen15b, deep_ids, 1024, chunk,
                                            1.3, frame_sec)
            extras["longform_64k_int4kv8_rtf"] = round(ab_ / wb_, 3)
            sr = sustained_rtf(gen15b, wb_, ab_, chunk, frame_sec)
            if sr is not None:
                extras["longform_64k_int4kv8_rtf_sustained"] = sr
        except Exception as e:  # noqa: BLE001
            extras["longform_64k_int4kv8_error"] = repr(e)[:200]
        finally:
            del gen15b, deep_ids
            gc.collect()

        # Optional int8-KV-cache rerun of the 64k tier (BENCH_KV8=1): same
        # prompt/steps, cache leaves quantized — the decode bottleneck at
        # this depth is KV HBM traffic, which the q8 kernels halve
        if os.environ.get("BENCH_KV8", "0") == "1":
            gen15k = deep_ids = None
            try:
                gen15k = build_generator(cfg, ddpm_steps, quantize=True,
                                         quantize_head=True, bits=8,
                                         kv_quant=True)
                full_quant_tiers(gen15k.params, 8, False)
                deep_ids = make_ids(1, 40500)
                run_config(gen15k, deep_ids, 1024, chunk, 1.3, frame_sec,
                           stop_check_fn=stop_after_chunks(3))
                wk, sk, dk, ak = run_config(gen15k, deep_ids, 1024, chunk,
                                            1.3, frame_sec)
                extras["longform_64k_kv8_rtf"] = round(ak / wk, 3)
                sr = sustained_rtf(gen15k, wk, ak, chunk, frame_sec)
                if sr is not None:
                    extras["longform_64k_kv8_rtf_sustained"] = sr
                extras["longform_64k_kv8_hbm_gb"] = round(
                    tree_gb(gen15k.params)
                    + 28 * 2 * 2 * 2 * 128 * 52000 * 1.25 / 1e9, 2)
            except Exception as e:  # noqa: BLE001
                extras["longform_64k_kv8_error"] = repr(e)[:200]
            finally:
                del gen15k, deep_ids
                gc.collect()

        # ---- 7B tiers (configs 3 + 5), full-int8 on ONE chip --------------
        try:
            cfg7 = VibeVoiceConfig.named("7b")
            frame7 = cfg7.acoustic_tokenizer.total_stride / 24000.0
            gen7 = build_generator(cfg7, ddpm_steps, quantize=True,
                                   quantize_head=True, bits=8,
                                   quantize_embed=True)
            full_quant_tiers(gen7.params, 8, False)

            # config 3: 4 speakers, per-speaker voice prompts (23 frames ≈
            # 3 s each) — prefill runs the acoustic encode + connector
            # scatter, then 192-step decode
            ids7, sp, spm, simask = voice_prompt_inputs(
                4, 23, 256, cfg7.acoustic_tokenizer.total_stride)
            kw7 = dict(speech_tensors=sp, speech_masks=spm,
                       speech_input_mask=simask)
            run_config(gen7, ids7, bench_steps, chunk, 1.3, frame7, **kw7)
            run_config(gen7, ids7, 1, 1, 1.3, frame7, **kw7)
            t_70 = time.perf_counter()
            run_config(gen7, ids7, 1, 1, 1.3, frame7, **kw7)
            extras["7b_ttfa_s"] = round(time.perf_counter() - t_70, 3)
            w7, s7, d7, a7 = median_run(gen7, ids7, bench_steps, chunk, 1.3,
                                        frame7, **kw7)
            extras["7b_int8_4spk_rtf"] = round(a7 / w7, 3)

        except Exception as e:  # noqa: BLE001
            extras["7b_error"] = repr(e)[:200]
            gen7 = None

        # 7B full-int4 (speed tier): same config-3 workload at 4-bit LM +
        # head + tokenizer FFNs — ~3.4 GB of LM weights on the wire per step
        # instead of ~6.8 GB
        del gen7
        gen7 = None
        gc.collect()
        gen7q = None
        try:
            gen7q = build_generator(cfg7, ddpm_steps, quantize=True,
                                    quantize_head=True, bits=4, colscale=True,
                                    quantize_embed=True)
            full_quant_tiers(gen7q.params, 4, True)
            ids7, sp, spm, simask = voice_prompt_inputs(
                4, 23, 256, cfg7.acoustic_tokenizer.total_stride)
            kw7 = dict(speech_tensors=sp, speech_masks=spm,
                       speech_input_mask=simask)
            run_config(gen7q, ids7, bench_steps, chunk, 1.3, frame7, **kw7)
            w7q, s7q, d7q, a7q = median_run(gen7q, ids7, bench_steps, chunk,
                                            1.3, frame7, **kw7)
            extras["7b_int4_4spk_rtf"] = round(a7q / w7q, 3)
        except Exception as e:  # noqa: BLE001
            extras["7b_int4_error"] = repr(e)[:200]
        finally:
            del gen7q
            gc.collect()

        # config 5: long-form at 32k context — 30.5k-token prompt, then 1024
        # decode steps sustained through live context 30.5k -> 31.5k, with
        # the int8 KV cache (the capacity configuration: a bf16 dual-context
        # 32k cache + its chunk-program working set does not fit beside the
        # 7B int8 weights on one 16 GB chip).  Own try-block: an OOM here
        # must not erase the config-3 numbers.
        del gen7
        gen7 = None
        gc.collect()
        gen7k = deep7 = None
        try:
            gen7k = build_generator(cfg7, ddpm_steps, quantize=True,
                                    quantize_head=True, bits=8,
                                    quantize_embed=True, kv_quant=True)
            full_quant_tiers(gen7k.params, 8, False)
            deep7 = make_ids(1, 30500)
            lf7_steps = 1024
            run_config(gen7k, deep7, lf7_steps, chunk, 1.3, frame7,
                       stop_check_fn=stop_after_chunks(3))      # warm programs
            gc.collect()                      # warmup state before timed state
            w7l, s7l, d7l, a7l = run_config(gen7k, deep7, lf7_steps, chunk,
                                            1.3, frame7)
            extras["longform_32k_rtf"] = round(a7l / w7l, 3)
            sr = sustained_rtf(gen7k, w7l, a7l, chunk, frame7)
            if sr is not None:
                extras["longform_32k_rtf_sustained"] = sr
            extras["longform_32k_depth_end"] = 30500 + s7l
            extras["longform_32k_hbm_gb"] = round(
                tree_gb(gen7k.params)
                + 28 * 2 * 4 * 2 * 128 * 33024 * 1.25 / 1e9, 2)
        except Exception as e:  # noqa: BLE001
            extras["longform_32k_error"] = repr(e)[:200]
        finally:
            del gen7k, deep7
            gc.collect()

        # config 5 at the int4 speed tier: the decode step at 30.5k depth is
        # ~80-100% of HBM speed-of-light on int8 (profiled: MLP 7.7 ms +
        # head 3.2 ms + int8-KV attention 2.7 ms per step) — the MLP and
        # head are weight-bandwidth-bound, so int4 halves them
        gen7q4 = deep7 = None
        try:
            gen7q4 = build_generator(cfg7, ddpm_steps, quantize=True,
                                     quantize_head=True, bits=4,
                                     colscale=True, quantize_embed=True,
                                     kv_quant=True)
            full_quant_tiers(gen7q4.params, 4, True)
            deep7 = make_ids(1, 30500)
            run_config(gen7q4, deep7, 1024, chunk, 1.3, frame7,
                       stop_check_fn=stop_after_chunks(3))
            gc.collect()
            w7q, s7q, d7q, a7q = run_config(gen7q4, deep7, 1024, chunk,
                                            1.3, frame7)
            extras["longform_32k_int4_rtf"] = round(a7q / w7q, 3)
            sr = sustained_rtf(gen7q4, w7q, a7q, chunk, frame7)
            if sr is not None:
                extras["longform_32k_int4_rtf_sustained"] = sr
        except Exception as e:  # noqa: BLE001
            extras["longform_32k_int4_error"] = repr(e)[:200]
        finally:
            del gen7q4, deep7
            gc.collect()

    if os.environ.get("BENCH_ENGINE", "0") == "1":
        # extended engine stress (opt-in): many staggered requests at real
        # lengths — the default run keeps a lighter version above.  Own
        # try-block: by this point the chip has built/freed many param trees
        # and an OOM here must not erase every collected number.
        try:
            from vibevoice_tpu.generation.engine import ContinuousEngine
            slots = int(os.environ.get("BENCH_ENGINE_SLOTS", "4"))
            n_req = int(os.environ.get("BENCH_ENGINE_REQS", str(2 * slots)))
            req_steps = int(os.environ.get("BENCH_ENGINE_STEPS", "96"))
            gen = build_generator(cfg, ddpm_steps, quantize=quant,
                                  quantize_head=quant_head, bits=bits,
                                  colscale=colscale)
            eng = ContinuousEngine(gen, slots=slots, cache_len=1024,
                                   chunk_steps=16, cfg_scale=1.3)
            eng.submit({"input_ids": ids[:1]}, max_new_tokens=8,
                       max_length_times=1000.0, seed=0)
            eng.drain()
            reqs, t_e0 = [], time.perf_counter()
            for i in range(n_req):
                reqs.append(eng.submit({"input_ids": ids[:1]},
                                       max_new_tokens=req_steps,
                                       max_length_times=1000.0, seed=i))
                if i % 2 == 1:
                    eng.step_chunk()
            eng.drain()
            e_wall = time.perf_counter() - t_e0
            e_audio = sum(0.0 if r.audio is None else len(r.audio) / 24000.0
                          for r in reqs)
            assert all(r.error is None for r in reqs)
            extras["engine_stress_aggregate_rtf"] = round(e_audio / e_wall, 3)
            extras["engine_stress_reqs"] = n_req
        except Exception as e:  # noqa: BLE001
            extras["engine_stress_error"] = repr(e)[:200]
        gc.collect()

    # ---- on-chip Pallas kernel self-test tier (r4 VERDICT #4) -------------
    # every Pallas kernel variant lowers on REAL Mosaic and parity-checks
    # against an XLA reference — the class of bug interpret-mode CPU tests
    # cannot catch (Mosaic legality / miscompiles).  Recorded in the driver
    # JSON so a kernel regression is visible even when aggregate RTF hides
    # it.  BENCH_SELFTEST=0 skips (tiny debug runs).
    if os.environ.get("BENCH_SELFTEST", "1") == "1":
        try:
            from vibevoice_tpu.utils.selftest import run_selftest
            extras.update(run_selftest())
        except Exception as e:  # noqa: BLE001
            extras["selftest_error"] = repr(e)[:200]
        gc.collect()

    print(json.dumps({
        "metric": (f"rtf_{model_name}_b{batch}_cfg_ddpm{ddpm_steps}"
                   + (f"_int{'8' if quant_env in ('1', '8') else quant_env}"
                      if quant else "")),
        "value": round(rtf, 4),
        "unit": "audio_sec_per_wall_sec",
        "vs_baseline": round(rtf / 0.3, 3),
        "steps": steps,
        "diffused_frames": diffused,
        "audio_s": round(audio_sec, 2),
        "wall_s": round(wall, 3),
        "ms_per_step": round(1000 * wall / max(steps, 1), 2),
        "ttfa_s": round(ttfa_s, 3),
        "compile_s": round(compile_s, 1),
        "compile_cold_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
        # whole-run persistent-cache counters: misses > 0 on a fresh clone
        # means .xla_cache drifted from the programs bench compiles
        "xla_cache_hits": cache_counts()["hits"],
        "xla_cache_misses": cache_counts()["misses"],
        **extras,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception:  # noqa: BLE001
        # one retry after a transient device failure (the tunneled TPU can
        # abort mid-run); persistent compile caches make the second pass
        # cheap.  Terminal failure still emits the JSON line the driver
        # parses — a recorded error beats a missing artifact.
        import traceback
        traceback.print_exc()
        gc.collect()
        time.sleep(60)
        try:
            main()
        except Exception as e2:  # noqa: BLE001
            traceback.print_exc()
            print(json.dumps({"metric": "bench_error", "value": 0.0,
                              "unit": "error", "vs_baseline": 0.0,
                              "error": repr(e2)[:300]}))
