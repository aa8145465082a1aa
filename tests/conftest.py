"""Test configuration: hermetic 8-device CPU mesh.

Multi-chip sharding tests run the same pjit programs on a virtual CPU mesh
(XLA_FLAGS host platform device count), per SURVEY.md §4.  Benchmarks
(bench.py) run on the real TPU chip instead.

Note: the TPU platform plugin in this environment ignores JAX_PLATFORMS from
the environment, so the CPU backend is forced via jax.config before any
device use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
