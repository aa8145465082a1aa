"""Orbax checkpoint save/restore + profiling utils."""

import numpy as np

import jax
import jax.numpy as jnp

from vibevoice_tpu.checkpoint import load_checkpoint, save_checkpoint
from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.models import vibevoice

CFG = VibeVoiceConfig.named("tiny")


def test_save_restore_roundtrip(tmp_path):
    params = vibevoice.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    save_checkpoint(str(tmp_path / "ckpt"), params, CFG, step=7)
    back, cfg2 = load_checkpoint(str(tmp_path / "ckpt"))
    assert cfg2 == CFG

    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(back)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stage_timer():
    import time

    from vibevoice_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    t.record("b", 0.5)
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0.01
    assert s["b"]["total_s"] == 0.5
    assert "mean_ms" in s["a"]


def test_sharded_restore_onto_mesh(tmp_path):
    """Single-pass sharded restore: params stream straight onto the mesh with
    the TP shardings (the 7B-scale load path - nothing materializes
    unsharded)."""
    import dataclasses
    import jax.numpy as jnp
    from vibevoice_tpu import checkpoint as ckpt
    from vibevoice_tpu.config import VibeVoiceConfig
    from vibevoice_tpu.models import vibevoice
    from vibevoice_tpu.parallel import make_mesh, param_shardings

    cfg = VibeVoiceConfig.named("tiny")
    cfg = dataclasses.replace(cfg, dtype="float32")
    params = vibevoice.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    ckpt.save_checkpoint(str(tmp_path / "c"), params, cfg)

    mesh = make_mesh(8, tp=2)
    sh = param_shardings(params, mesh, kv_tp=True)
    restored, cfg2 = ckpt.load_checkpoint(str(tmp_path / "c"), shardings=sh)
    # sharding applied
    wq = restored["lm"]["layers"]["wq"]
    assert wq.sharding.spec == sh["lm"]["layers"]["wq"].spec
    # values identical
    np.testing.assert_array_equal(np.asarray(wq),
                                  np.asarray(params["lm"]["layers"]["wq"]))
    assert cfg2.decoder.hidden_size == cfg.decoder.hidden_size
