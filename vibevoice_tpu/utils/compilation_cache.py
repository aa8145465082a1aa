"""Persistent XLA compilation cache.

The generation step is one large fused program (LM decode + DPM scan +
streaming vocode + semantic re-encode); cold-compiling it costs minutes on
TPU.  The reference has no analogue (PyTorch eager pays per-op dispatch
instead); on TPU the idiomatic fix is JAX's persistent compilation cache:
compiled executables are keyed by HLO fingerprint and reloaded across
processes, so a server restart pays deserialization (~seconds), not
recompilation (~minutes).

Disable with VIBEVOICE_COMPILATION_CACHE=off.
"""

from __future__ import annotations

import os

import jax

_ENABLED = False

# populated by install_cache_counters(); read via cache_counts()
_COUNTS = {"hits": 0, "misses": 0}
_COUNTERS_INSTALLED = False


def install_cache_counters() -> None:
    """Count persistent-cache hits/misses via jax.monitoring events.

    The r4 driver bench paid a 203 s cold compile because the committed
    cache had drifted from the programs bench.py actually builds; a count
    of misses in the bench JSON makes that drift visible the moment it
    happens instead of one round later.  Idempotent; install BEFORE the
    first jit execution or early compiles go uncounted.
    """
    global _COUNTERS_INSTALLED
    if _COUNTERS_INSTALLED:
        return
    from jax._src import monitoring

    def _event(event: str, **kw) -> None:
        if event == "/jax/compilation_cache/cache_hits":
            _COUNTS["hits"] += 1
        elif event == "/jax/compilation_cache/cache_misses":
            _COUNTS["misses"] += 1

    monitoring.register_event_listener(_event)
    _COUNTERS_INSTALLED = True


def cache_counts() -> dict:
    """{"hits": n, "misses": n} since install_cache_counters()."""
    return dict(_COUNTS)


def default_cache_dir() -> str:
    """Prefer the repo-local ``.xla_cache`` (committed, survives fresh
    environments where ``~/.cache`` does not — the round-1 driver bench paid
    a 609 s cold compile precisely because the home cache was gone); fall
    back to ``~/.cache`` for installed copies without a writable repo dir."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    repo_cache = os.path.join(here, ".xla_cache")
    if os.path.isdir(repo_cache) or os.access(here, os.W_OK):
        return repo_cache
    return os.path.expanduser("~/.cache/vibevoice_tpu/xla")


def enable_persistent_compilation_cache(path: str | None = None) -> str | None:
    """Idempotent; returns the cache dir (or None when disabled)."""
    global _ENABLED
    path = path or os.environ.get(
        "VIBEVOICE_COMPILATION_CACHE") or default_cache_dir()
    if path.lower() in ("0", "off", "none", "disabled", ""):
        return None
    if _ENABLED:
        return path
    # TPU only: XLA:CPU AOT cache entries are machine-feature-pinned and this
    # environment's CPU loader warns of potential SIGILL on mismatch; CPU
    # compiles are cheap anyway
    if jax.default_backend() != "tpu":
        return None
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took noticeable compile time, however small
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _ENABLED = True
    return path
