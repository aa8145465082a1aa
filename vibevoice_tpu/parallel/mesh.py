"""Device mesh construction.

The reference's parallelism is a declarative HF tp_plan plus torch.distributed
shims (reference: configuration_vibevoice.py:175-183, modeling_vibevoice.py:29-30,
311-318).  TPU-native equivalent: a 2-D ``jax.sharding.Mesh`` with axes
("dp", "tp"); collectives are inserted by XLA from sharding annotations and
ride ICI.  Multi-host setup goes through ``jax.distributed.initialize()``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def force_virtual_cpu_devices(n: int) -> None:
    """Provision an ``n``-device virtual CPU platform for sharding dry-runs.

    Mirrors tests/conftest.py: must run before any JAX device use.  Safe to
    call when the backend is already a CPU mesh of >= n devices (no-op);
    raises a clear error if the backend was already initialized differently.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}")
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    devs = jax.devices()
    if len(devs) < n:
        raise RuntimeError(
            f"virtual CPU mesh unavailable: wanted {n} devices, backend "
            f"initialized with {len(devs)} ({devs[0].platform}). "
            "force_virtual_cpu_devices must be called before first device use.")


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("dp", "tp") mesh.

    Defaults: use all devices; choose tp as the largest power-of-two divisor
    <= 8 that divides the device count (v5e pod slices are 2-D tori, a tp
    group of 4-8 stays within one ring hop).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if tp is None and dp is None:
        tp = 1
        for cand in (8, 4, 2):
            if n % cand == 0:
                tp = cand
                break
        dp = n // tp
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up (replaces torch.distributed init; SURVEY.md §5.8)."""
    jax.distributed.initialize(**kwargs)
