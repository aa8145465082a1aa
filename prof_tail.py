import os, sys, time, tempfile, collections
import jax, jax.numpy as jnp
import bench as B
from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.utils import xplane

t0 = time.time()
def mark(msg): print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

cfg = VibeVoiceConfig.from_json('vibevoice_tpu/configs/qwen2.5_1.5b_64k.json')
mark("building generator")
gen = B.build_generator(cfg, 5, quantize=True, quantize_head=True, bits=4, colscale=True)
mark("quantizing tokenizer stacks")
B.full_quant_tiers(gen.params, 4, True)
ids = B.make_ids(1, 64)
fs = gen.frame_samples / 24000
mark("compile run")
B.run_config(gen, ids, 48, 64, 1.3, fs)  # compile
mark("profiled run")
td = tempfile.mkdtemp(prefix="tailprof_")
with jax.profiler.trace(td):
    B.run_config(gen, ids, 48, 64, 1.3, fs)
mark("parsing xplane")
xp = xplane.find_xplane(td)
print("xplane:", xp)
per_stage = collections.defaultdict(lambda: collections.defaultdict(float))
cnt = collections.defaultdict(lambda: collections.defaultdict(int))
for _, em, dur in xplane.device_op_events(xp):
    tf_op = em.stats.get("tf_op", "")
    stage = next((s for s in ("stage_vocode", "stage_semantic", "stage_lm", "stage_diffusion") if s in tf_op), "other")
    name = em.display_name or em.name
    cat = em.stats.get("hlo_category", "?")
    key = (cat, name[:70])
    per_stage[stage][key] += dur / 1e9
    cnt[stage][key] += 1
for stage in ("stage_vocode", "stage_semantic", "stage_lm", "stage_diffusion", "other"):
    rows = sorted(per_stage[stage].items(), key=lambda kv: -kv[1])
    tot = sum(per_stage[stage].values())
    print(f"\n== {stage}: total {tot:.1f} ms ==")
    for (cat, name), ms in rows[:16]:
        print(f"  {ms:7.2f} ms  n={cnt[stage][(cat,name)]:4d}  [{cat}] {name}")
