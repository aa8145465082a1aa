import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Measure 64k long-form TTFA (40.5k-token prefill + first chunk) on the
real chip — the VERDICT r3 item 4 probe.  Prints TTFA for the int8 tier."""
import time
import bench as B
from vibevoice_tpu.config import VibeVoiceConfig

cfg = VibeVoiceConfig.named("1.5b")
frame_sec = cfg.acoustic_tokenizer.total_stride / 24000.0
gen = B.build_generator(cfg, 5, quantize=True, quantize_head=True, bits=8)
B.full_quant_tiers(gen.params, 8, False)
ids = B.make_ids(1, 40500)
print("[compile+warm]", flush=True)
t0 = time.time()
B.run_config(gen, ids, 8, 8, 1.3, frame_sec)
print(f"[warm done {time.time()-t0:.0f}s]", flush=True)
for i in range(3):
    B.run_config(gen, ids, 8, 8, 1.3, frame_sec)
    m = gen.last_metrics
    print(f"run {i}: ttfa={m.get('ttfa', {}).get('total_s', -1):.3f}s "
          f"prefill_enqueue={m.get('prefill', {}).get('total_s', -1):.3f}s", flush=True)
