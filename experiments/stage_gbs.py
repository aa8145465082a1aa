"""Per-stage achieved-GB/s table for the int4 serving step (VERDICT r4 #1).

For each named stage of the fused decode step (stage_lm, stage_diffusion,
stage_vocode, stage_semantic) this measures device time from an xplane
trace, pairs it with that stage's bytes model (the same accounting as
bench.roofline_keys, split by stage), and prints achieved GB/s vs the v5e
HBM peak — turning "int4 runs at 50% of roofline" into a per-stage
attribution that says WHERE the missing bandwidth goes.

Also prints the top ops per stage (by total device time) and a
per-hlo-category rollup so convert/copy/norm soup is visible separately
from the streaming matmuls.

Usage: python experiments/stage_gbs.py [steps]
"""
import collections
import os
import sys
import tempfile

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B  # noqa: E402
from vibevoice_tpu.config import VibeVoiceConfig  # noqa: E402
from vibevoice_tpu.utils import xplane  # noqa: E402

HBM_PEAK = 8.19e11  # v5e

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 96


def nbytes(tree):
    return sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(tree)
               if hasattr(l, "dtype"))


def main():
    cfg = VibeVoiceConfig.from_json("vibevoice_tpu/configs/qwen2.5_1.5b_64k.json")
    gen = B.build_generator(cfg, 5, quantize=True, quantize_head=True,
                            bits=4, colscale=True)
    B.full_quant_tiers(gen.params, 4, True)
    ids = B.make_ids(1, 64)
    fs = gen.frame_samples / 24000
    B.run_config(gen, ids, STEPS, 16, 1.3, fs)  # compile
    td = tempfile.mkdtemp(prefix="stagegbs_")
    w, s, d, a = B.run_config(gen, ids, STEPS, 16, 1.3, fs)
    with jax.profiler.trace(td):
        w, s, d, a = B.run_config(gen, ids, STEPS, 16, 1.3, fs)
    xp = xplane.find_xplane(td)
    print(f"trace: {xp}  wall={w:.3f}s steps={s} ms/step={1000*w/s:.3f}")

    p = gen.params
    hl = p["diffusion_head"]["layers"]
    ffn = sum(nbytes(hl[k]) for k in ("wg", "wu", "wgu", "wd") if k in hl)
    live_ctx = 64 + STEPS
    dcfg = gen.cfg.decoder
    kv_item = 1 if gen.kv_quant else jnp.dtype(gen.lm_dtype).itemsize
    kv = (dcfg.num_hidden_layers * 2 * 2 * dcfg.num_key_value_heads
          * dcfg.resolved_head_dim * kv_item * live_ctx)
    stage_bytes = {
        "stage_lm": nbytes(p["lm"]["layers"]) + kv,
        "stage_diffusion": nbytes(p["diffusion_head"]) + (gen.ddpm_steps - 1) * ffn,
        "stage_vocode": nbytes(p["acoustic"]["decoder"]),
        "stage_semantic": nbytes(p["semantic"]),
    }

    per_stage = collections.defaultdict(lambda: collections.defaultdict(float))
    cnt = collections.defaultdict(lambda: collections.defaultdict(int))
    cat_ms = collections.defaultdict(lambda: collections.defaultdict(float))
    stage_ms = collections.defaultdict(float)
    total_ms = 0.0
    for _, em, dur in xplane.device_op_events(xp):
        tf_op = em.stats.get("tf_op", "")
        stage = next((st for st in ("stage_vocode", "stage_semantic",
                                    "stage_lm", "stage_diffusion")
                      if st in tf_op), "other")
        name = em.display_name or em.name
        cat = em.stats.get("hlo_category", "?")
        ms = dur / 1e9
        per_stage[stage][(cat, name[:90])] += ms
        cnt[stage][(cat, name[:90])] += 1
        cat_ms[stage][cat] += ms
        stage_ms[stage] += ms
        total_ms += ms

    n_steps = s
    print(f"\ndevice total {total_ms:.1f} ms over {n_steps} steps "
          f"({total_ms/n_steps:.3f} ms/step device vs "
          f"{1000*w/n_steps:.3f} ms/step wall)")
    print(f"\n{'stage':<16} {'ms/step':>8} {'bytes/step':>12} {'floor ms':>9} "
          f"{'GB/s':>7} {'frac':>6}")
    for st in ("stage_lm", "stage_diffusion", "stage_vocode",
               "stage_semantic", "other"):
        msps = stage_ms[st] / n_steps
        by = stage_bytes.get(st)
        if by:
            floor = by / HBM_PEAK * 1e3
            gbs = by / (msps / 1e3) / 1e9 if msps else 0
            print(f"{st:<16} {msps:8.3f} {by:12,d} {floor:9.3f} "
                  f"{gbs:7.0f} {floor/msps if msps else 0:6.3f}")
        else:
            print(f"{st:<16} {msps:8.3f} {'-':>12} {'-':>9} {'-':>7} {'-':>6}")

    for st in ("stage_lm", "stage_diffusion", "stage_vocode",
               "stage_semantic", "other"):
        rows = sorted(per_stage[st].items(), key=lambda kv_: -kv_[1])
        print(f"\n== {st}: {stage_ms[st]:.1f} ms total, by category: "
              + " ".join(f"{c}={m/n_steps:.3f}" for c, m in
                         sorted(cat_ms[st].items(), key=lambda kv_: -kv_[1])))
        for (cat, name), ms in rows[:14]:
            print(f"  {ms/n_steps:7.4f} ms/st n={cnt[st][(cat, name)]:5d} "
                  f"[{cat}] {name}")


if __name__ == "__main__":
    main()
