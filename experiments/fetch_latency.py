import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Tunnel transfer characterization (r4): device->host fetch costs ~28 ms
FIXED latency + ~21 MB/s on the axon-tunneled v5e, while H2D puts and
block_until_ready are sub-ms.  This is why the chunk wire format packs all
host-bound outputs into exactly two arrays and why per-call fetch WAVES,
not bytes, dominate TTFA/engine-join latency.  Run to re-characterize."""
import time
import numpy as np, jax, jax.numpy as jnp

f = jax.jit(lambda x: (x @ x, x + 1, x.sum(), (x * 2)[:16]))
a = jnp.ones((2048, 2048), jnp.bfloat16)
jax.block_until_ready(f(a))

for name, fn in (
    ("put+block scalar", lambda: jax.block_until_ready(jax.device_put(np.float32(1.0)))),
    ("null-jit+block", lambda: jax.block_until_ready(f(a)[2])),
):
    ts = sorted(abs(-time.perf_counter() + (fn(), time.perf_counter())[1]) for _ in range(20))
    print(f"{name}: p50={1e3*ts[10]:.2f}ms")

for shape in ((8,), (512, 512), (2048, 2048)):
    g = jax.jit(lambda x: x[:shape[0]] if len(shape) == 1 else x[:shape[0], :shape[1]])
    ws = []
    for _ in range(10):
        r = g(a); jax.block_until_ready(r)
        t0 = time.perf_counter(); np.asarray(r); ws.append(time.perf_counter() - t0)
    ws.sort()
    nb = int(np.prod(shape)) * 2
    print(f"fetch {str(shape):14s} ({nb/1e6:6.2f} MB): p50={1e3*ws[5]:6.1f}ms")

ws = []
for _ in range(10):
    r = f(a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for leaf in r: np.asarray(leaf)
    ws.append(time.perf_counter() - t0)
ws.sort()
print(f"4 sequential fresh fetches: p50={1e3*ws[5]:.1f}ms  (waves, not bytes)")
