import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Block-budget sweep over the REAL int4c serving matmul shapes:
LM fused wqkv/wgu/wd/wo (stacked, L=28) and the tokenizer big-stage FFN
(2d).  Interleaved best-of-5 per (shape, budget) to beat tunnel noise."""
import time
import jax, jax.numpy as jnp
from vibevoice_tpu.ops import int4

key = jax.random.PRNGKey(0)
CANDS_P = (2048, 1792, 1536, 1280, 1024, 896, 768, 640, 512, 384, 256, 128)
CANDS_O = (8960, 8192, 7168, 6144, 5120, 4480, 4096, 3584, 3072, 2560, 2048,
           1792, 1536, 1280, 1024, 896, 768, 640, 512, 384, 256, 128)

def make_plan(budget_b):
    def plan(half, out):
        bp = next((c for c in CANDS_P if half % c == 0), 0)
        bo = next((c for c in CANDS_O if out % c == 0), 0)
        if not (bp and bo):
            return None
        while bp * bo > budget_b and bo > 128:
            bo = next((c for c in CANDS_O if c < bo and out % c == 0), 128)
        while bp * bo > budget_b and bp > 128:
            bp = next((c for c in CANDS_P if c < bp and half % c == 0), 128)
        return (bp, bo)
    return plan

# (name, kind, m, in, out, L)
SHAPES = [
    ("wqkv", "st", 2, 1536, 2048, 28),
    ("wgu",  "st", 2, 1536, 17920, 28),
    ("wd",   "st", 2, 8960, 1536, 28),
    ("wo",   "st", 2, 1536, 1536, 28),
    ("tok",  "2d", 8, 2048, 8192, 0),
]
data = {}
for name, kind, m, inn, out, L in SHAPES:
    x = jax.random.normal(key, (m, inn), jnp.bfloat16)
    shape = (L, inn, out) if kind == "st" else (inn, out)
    q = int4.quantize_weight_int4c(jax.random.normal(key, shape, jnp.float32) * 0.02)
    data[name] = (kind, x, q, inn * out // 2 + (0))

BUDGETS = (768, 1536, 3072, 6144)
results = {n: {b: [] for b in BUDGETS} for n in data}
lyr = jnp.int32(5)
for rep in range(5):
    for budget_kb in BUDGETS:
        int4._plan_c = make_plan(budget_kb * 1024)
        int4._int4c_matmul_2d._clear_cache()
        int4._int4c_matmul_stacked._clear_cache()
        for name, (kind, x, q, nbytes) in data.items():
            if kind == "st":
                f = lambda: int4._int4c_matmul_stacked(x, q["q4c"], q["s4c"], lyr)
            else:
                f = lambda: int4._int4c_matmul_2d(x, q["q4c"], q["s4c"])
            jax.block_until_ready(f())
            t0 = time.perf_counter()
            for _ in range(300):
                r = f()
            jax.block_until_ready(r)
            results[name][budget_kb].append((time.perf_counter() - t0) / 300 * 1e6)
for name, (kind, x, q, nbytes) in data.items():
    row = []
    for b in BUDGETS:
        t = min(results[name][b])
        row.append(f"{b}KB:{t:6.2f}us({nbytes/t/1e3:.0f}GB/s)")
    print(f"{name:5s} " + "  ".join(row))
