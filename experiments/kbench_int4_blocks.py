import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Microbench: int4c kernel block-size (VMEM budget) sweep on the real chip.
Shapes = the two hot serving matmuls (vocode big-stage FFN, LM mlp)."""
import time
import jax, jax.numpy as jnp
from vibevoice_tpu.ops import int4

def timeit(f, *args, n=500):
    jax.block_until_ready(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / n * 1e6)
    return best

key = jax.random.PRNGKey(0)
x_v = jax.random.normal(key, (8, 2048), jnp.bfloat16)
q_v = int4.quantize_weight_int4c(jax.random.normal(key, (2048, 8192), jnp.float32) * 0.02)
x_m = jax.random.normal(key, (2, 1536), jnp.bfloat16)
q_m = int4.quantize_weight_int4c(jax.random.normal(key, (28, 1536, 8960), jnp.float32) * 0.02)
lyr = jnp.int32(3)

CANDS_P = (2048, 1792, 1536, 1280, 1024, 896, 768, 640, 512, 384, 256, 128)
CANDS_O = (8192, 7168, 6144, 5120, 4480, 4096, 3584, 3072, 2560, 2240, 2048, 1792, 1536, 1280, 1120, 1024, 896, 768, 640, 512, 384, 256, 128)
for budget_kb in (768, 1536, 3072, 6144, 8192):
    def plan(half, out, _b=budget_kb * 1024):
        bp = next((c for c in CANDS_P if half % c == 0), 0)
        bo = next((c for c in CANDS_O if out % c == 0), 0)
        if not (bp and bo):
            return None
        while bp * bo > _b and bo > 128:
            bo = next((c for c in CANDS_O if c < bo and out % c == 0), 128)
        while bp * bo > _b and bp > 128:
            bp = next((c for c in CANDS_P if c < bp and half % c == 0), 128)
        return (bp, bo)
    int4._plan_c = plan
    int4._int4c_matmul_2d._clear_cache()
    int4._int4c_matmul_stacked._clear_cache()
    t2d = timeit(int4._int4c_matmul_2d, x_v, q_v["q4c"], q_v["s4c"])
    tst = timeit(int4._int4c_matmul_stacked, x_m, q_m["q4c"], q_m["s4c"], lyr)
    print(f"budget {budget_kb:5d}KB plan2d={plan(1024, 8192)} planst={plan(768, 8960)}"
          f"  2d {t2d:6.2f}us ({8.4e6 / t2d / 1e3:.0f}GB/s)"
          f"  stacked {tst:6.2f}us ({6.88e6 / tst / 1e3:.0f}GB/s)")
