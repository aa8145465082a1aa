"""Two-process jax.distributed dryrun (r4 VERDICT stretch #9).

parallel/mesh.py claims multi-host bring-up via jax.distributed.initialize;
until now nothing executed that path.  This spawns TWO real processes, each
owning 4 virtual CPU devices, initializes the distributed runtime through
``initialize_distributed`` (coordinator on localhost), builds one GLOBAL
8-device mesh, and runs a cross-process collective whose result proves both
processes' devices participated — the multi-host analogue of the driver's
single-process dryrun (SURVEY.md §5.8 mapping)."""

import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

_WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from vibevoice_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())   # global view
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "tp"))

    # each process contributes its process_id+1 on its local shard; a global
    # psum over BOTH axes must see every device on both hosts
    local = jnp.full((4, 8), float(pid + 1))
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("dp", None))

    @jax.jit
    def total(x):
        return jnp.sum(x)

    with mesh:
        t = total(garr)
    # rows: process 0 contributes 4*8*1, process 1 contributes 4*8*2.
    # the jit result is fully replicated -> every process reads its local copy
    expect = 4 * 8 * 1 + 4 * 8 * 2
    got = float(np.asarray(t.addressable_data(0)))
    assert got == expect, (got, expect)
    print(f"proc {pid}: global mesh {mesh.shape} total {got} OK", flush=True)
""")


def test_two_process_distributed_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"proc {pid}: global mesh" in out and "OK" in out, out[-800:]
