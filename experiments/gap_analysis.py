"""Attribute device IDLE gaps to the op that follows them (its prologue/
dispatch cost).  Runs offline on an existing xplane trace."""
import sys, os, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vibevoice_tpu.utils import xplane

path = sys.argv[1]
spans = sorted(((off, dur, em) for _, em, off, dur in
                xplane.device_op_spans(path)), key=lambda t: t[0])
print(f"{len(spans)} leaf ops")
busy = sum(d for _, d, _ in spans) / 1e9
gap_by = collections.defaultdict(float)
gap_n = collections.defaultdict(int)
total_gap = 0.0
big = []
prev_end = None
for off, dur, em in spans:
    if prev_end is not None and off > prev_end:
        g = (off - prev_end) / 1e9            # ms
        total_gap += g
        name = em.display_name or em.name or "?"
        cat = em.stats.get("hlo_category", "?")
        key = f"[{cat}] {name[:56]}"
        gap_by[key] += g
        gap_n[key] += 1
        if g > 0.05:
            big.append((g, key))
    prev_end = max(prev_end or 0, off + dur)
print(f"busy {busy:.1f} ms   idle-between-ops {total_gap:.1f} ms")
for key, g in sorted(gap_by.items(), key=lambda kv: -kv[1])[:24]:
    print(f"  {g:7.2f} ms  n={gap_n[key]:5d}  mean={1e3*g/gap_n[key]:6.1f}us  before {key}")
print("largest single gaps:")
for g, key in sorted(big, reverse=True)[:8]:
    print(f"  {g:7.2f} ms before {key}")
