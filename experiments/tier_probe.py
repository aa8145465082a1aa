"""Focused serving-tier RTF probe: build one generator tier, run the bench
decode, print RTF + per-step ms.  Usage:
  python experiments/tier_probe.py int8|int4|int4g|bf16 [steps]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (repo-root bench.py)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tier = args[0] if args else "int4"
    steps = int(args[1]) if len(args) > 1 else 192
    from vibevoice_tpu.config import VibeVoiceConfig

    cfg = VibeVoiceConfig.named("1.5b")
    frame_sec = cfg.acoustic_tokenizer.total_stride / 24000.0

    kw = dict(quantize=False)
    bits, col = 8, False
    t0_len = 64
    if tier == "int8":
        kw = dict(quantize=True, quantize_head=True, bits=8)
    elif tier == "int4":
        kw = dict(quantize=True, quantize_head=True, bits=4, colscale=True)
        bits, col = 4, True
    elif tier == "int4g":
        kw = dict(quantize=True, quantize_head=True, bits=4, colscale=False)
        bits, col = 4, False
    elif tier.startswith("longform32k"):
        # the bench config-5 regime: 7B int8 (or int4) + int8 KV at 30.5k
        cfg = VibeVoiceConfig.named("7b")
        frame_sec = cfg.acoustic_tokenizer.total_stride / 24000.0
        b4 = tier.endswith("int4")
        kw = dict(quantize=True, quantize_head=True,
                  bits=4 if b4 else 8, colscale=b4,
                  quantize_embed=True, kv_quant=True)
        bits, col = (4, True) if b4 else (8, False)
        t0_len = 30500

    gen = bench.build_generator(cfg, 5, **kw)
    if kw.get("quantize"):
        bench.full_quant_tiers(gen.params, bits, col)
    ids = bench.make_ids(1, t0_len)

    # warm
    bench.run_config(gen, ids, steps, 64, 1.3, frame_sec)
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        w, s, d, a = bench.run_config(gen, ids, steps, 64, 1.3, frame_sec)
        runs.append((w, s, d, a))
    runs.sort()
    w, s, d, a = runs[1]
    print(f"tier={tier} rtf={a / w:.3f} ms_per_step={1e3 * w / s:.2f} "
          f"steps={s} audio_s={a:.1f}")

    if "--profile" in sys.argv:
        from vibevoice_tpu.utils.profile_report import profile_callable
        rep = profile_callable(
            lambda: bench.run_config(gen, ids, steps, 64, 1.3, frame_sec),
            top=int(os.environ.get("PROBE_TOP", "40")))
        print(rep["table"])


if __name__ == "__main__":
    main()


def engine_probe(tier="int4", slots=4, chunk_steps=16):
    """Aggregate RTF through the continuous-batching engine at a quant tier."""
    from vibevoice_tpu.config import VibeVoiceConfig
    from vibevoice_tpu.generation.engine import ContinuousEngine

    cfg = VibeVoiceConfig.named("1.5b")
    kw = dict(quantize=True, quantize_head=True,
              bits=4 if tier.startswith("int4") else 8,
              colscale=tier == "int4")
    gen = bench.build_generator(cfg, 5, **kw)
    bench.full_quant_tiers(gen.params, kw["bits"], kw["colscale"])
    ids = bench.make_ids(1, 64)

    eng = ContinuousEngine(gen, slots=slots, cache_len=1024,
                           chunk_steps=chunk_steps, cfg_scale=1.3)
    eng.submit({"input_ids": ids[:1]}, max_new_tokens=8,
               max_length_times=1000.0, seed=0)
    eng.drain()
    n_req = 2 * slots
    reqs, t0 = [], time.perf_counter()
    for i in range(n_req):
        reqs.append(eng.submit({"input_ids": ids[:1]}, max_new_tokens=64,
                               max_length_times=1000.0, seed=i))
        if i % 2 == 1:
            eng.step_chunk()
    eng.drain()
    wall = time.perf_counter() - t0
    audio = sum(0.0 if r.audio is None else len(r.audio) / 24000.0
                for r in reqs)
    assert all(r.error is None for r in reqs)
    print(f"engine tier={tier} slots={slots} chunk={chunk_steps} "
          f"aggregate_rtf={audio / wall:.2f}")
