"""Flash chunked-prefill block/splits sweep on the 64k TTFA shape
(r5, VERDICT r4 #2 due-diligence): interleaved round-robin timing (7 reps,
median) of flash_attention_cached on a LATE 40.5k-prefill segment
(C=4096 queries at q_off=36864, 40.9k live keys), with _pick_block
monkeypatched so the requested (block_k, splits) is honored exactly.

Measured 2026-08-21 on v5e (post-d00df40 kernel):

    (1024, 4096, 16): median 30.63 ms   min 29.15
    (1024, 4096,  4): median 31.97 ms   min 29.59
    (1024, 4096,  8): median 32.02 ms   min 29.40
    (1024, 2048,  4): median 32.42 ms   min 30.56   <- production (capped) plan
    ( 512, 4096,  8): median 32.76 ms   min 30.01
    (2048, 4096,  8): median 35.82 ms   min 34.31
    (1024, 8192,  *): 33.6 ms (worse); (1024, 16384, *): WRONG RESULTS

Every config except 2048-row q blocks lands within the +-5% tunnel noise
of the production plan (mins 29.2-30.6 ms): the kernel is at its
block-plan plateau, so the remaining 64k-TTFA gap vs the 1.5 s target
(measured 1.55-1.63 s) is not recoverable by block tuning.  A first-chunk
A/B (8/4/2 steps: 1.63/1.57/1.55 s) bounds the serving-policy lever at
~60-80 ms.
"""
import sys, os, time, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from vibevoice_tpu.ops import flash_attention as fa
from vibevoice_tpu.ops import flash_decode as fd

B, HQ, HKV, D, C = 1, 12, 2, 128, 4096
S = 40960
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (B, C, HQ, D), jnp.bfloat16)
ck = jax.random.normal(key, (1, B, HKV, S, D), jnp.bfloat16)
cv = jax.random.normal(key, (1, B, HKV, S, D), jnp.bfloat16)
kv_start = jnp.zeros((B,), jnp.int32)
lyr = jnp.int32(0)
orig = fd._pick_block

CFGS = [(1024, 4096, 8), (1024, 4096, 4), (1024, 4096, 16), (2048, 4096, 8),
        (512, 4096, 8), (1024, 2048, 4)]
fns = {}
for bq, bk, sp in CFGS:
    def mk(bq=bq, bk=bk, sp=sp):
        def pick(s, blk):
            return bk, sp
        def call(q_, o_):
            fd._pick_block = pick
            try:
                return fa.flash_attention_cached(q_, ck, cv, kv_start, o_, lyr,
                                                 block_q=bq, block_k=bk)
            finally:
                fd._pick_block = orig
        return call
    fns[(bq, bk, sp)] = jax.jit(mk())

off = jnp.int32(36864)
ok = {}
ref = None
for cfgk, f in fns.items():
    try:
        o = f(q, off); o.block_until_ready()
        if ref is None: ref = o
        err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref.astype(jnp.float32))))
        ok[cfgk] = f
        print(f"{cfgk}: ok maxerr={err:.2e}", flush=True)
    except Exception as e:
        print(f"{cfgk}: FAIL {repr(e)[:100]}", flush=True)
t = collections.defaultdict(list)
for rep in range(7):
    for cfgk, f in ok.items():
        t0 = time.perf_counter(); f(q, off).block_until_ready()
        t[cfgk].append(time.perf_counter() - t0)
for cfgk, ts in sorted(t.items(), key=lambda kv: sorted(kv[1])[3]):
    ts.sort()
    print(f"{cfgk}: median {ts[3]*1e3:7.2f} ms  min {ts[0]*1e3:7.2f}", flush=True)
