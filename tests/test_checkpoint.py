"""Orbax checkpoint save/restore + profiling utils."""

import numpy as np
import pytest

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


def test_quantized_checkpoint_roundtrip(tmp_path):
    """int8-quantized params ({q, s} pytree leaves) survive Orbax
    save/restore and still generate identically."""
    import dataclasses
    import jax.numpy as jnp
    from vibevoice_tpu import checkpoint as ckpt
    from vibevoice_tpu.config import VibeVoiceConfig
    from vibevoice_tpu.generation.generate import VibeVoiceGenerator
    from vibevoice_tpu.models import vibevoice
    from vibevoice_tpu.ops.quant import quantize_lm_params
    from vibevoice_tpu.processor.text_tokenizer import ByteFallbackTokenizer

    cfg = dataclasses.replace(VibeVoiceConfig.named("tiny"), dtype="float32")
    base = dict(vibevoice.init_params(jax.random.PRNGKey(1), cfg, jnp.float32))
    tk = ByteFallbackTokenizer()
    ids = np.random.RandomState(0).randint(20, 200, (1, 12))
    ids[:, -1] = tk.speech_start_id
    kw = dict(cfg_scale=1.3, max_new_tokens=4, chunk_steps=2,
              max_length_times=1000.0, seed=1)
    for bits, colscale, tag, leafkey in ((8, False, "q8", "q"),
                                         (4, True, "q4", "q4c")):
        params = dict(base)
        params["lm"] = quantize_lm_params(base["lm"], bits=bits,
                                          colscale=colscale)
        ckpt.save_checkpoint(str(tmp_path / tag), params, cfg)
        restored, cfg2 = ckpt.load_checkpoint(str(tmp_path / tag))
        np.testing.assert_array_equal(
            np.asarray(restored["lm"]["layers"]["wq"][leafkey]),
            np.asarray(params["lm"]["layers"]["wq"][leafkey]))

        o1 = VibeVoiceGenerator(params, cfg, tk, ddpm_inference_steps=2,
                                lm_dtype=jnp.float32).generate(ids, **kw)
        o2 = VibeVoiceGenerator(restored, cfg2, tk, ddpm_inference_steps=2,
                                lm_dtype=jnp.float32).generate(ids, **kw)
        np.testing.assert_array_equal(o1.sequences, o2.sequences)


def test_prequantized_store_roundtrip(tmp_path):
    """Pre-quantized Orbax store (VERDICT r3 next #8, reference
    main.py:349-367's pre-quantized repo): saving quantized {"q4c","s4c"}
    leaves and restoring them must generate token-identical audio to
    quantizing on the fly — and the store must carry its tier in meta."""
    from vibevoice_tpu.checkpoint import (checkpoint_meta, load_checkpoint,
                                          save_quantized_checkpoint)
    from vibevoice_tpu.generation import VibeVoiceGenerator
    from vibevoice_tpu.models import vibevoice
    from vibevoice_tpu.ops.quant import quantize_serving_stack
    from vibevoice_tpu.processor.text_tokenizer import ByteFallbackTokenizer

    cfg = VibeVoiceConfig.named("tiny")
    params = vibevoice.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    store = str(tmp_path / "tiny-int4")
    save_quantized_checkpoint(store, params, cfg, tier="int4")
    assert checkpoint_meta(store)["quant_tier"] == "int4"

    loaded, cfg2 = load_checkpoint(store)
    tk = ByteFallbackTokenizer()
    ids = np.full((1, 12), 65, np.int64)
    ids[:, -1] = tk.speech_start_id
    kw = dict(cfg_scale=1.3, max_new_tokens=6, chunk_steps=3,
              max_length_times=1000.0, seed=1)
    out_fly = VibeVoiceGenerator(
        quantize_serving_stack(params, "int4"), cfg, tk,
        ddpm_inference_steps=3, lm_dtype=jnp.float32).generate(ids, **kw)
    out_store = VibeVoiceGenerator(
        loaded, cfg2, tk, ddpm_inference_steps=3,
        lm_dtype=jnp.float32).generate(ids, **kw)
    np.testing.assert_array_equal(out_fly.sequences, out_store.sequences)
    if out_fly.speech_outputs[0] is not None:
        np.testing.assert_allclose(out_fly.speech_outputs[0],
                                   out_store.speech_outputs[0],
                                   rtol=1e-6, atol=1e-7)

    # sharded restore of a quantized store is rejected with guidance
    with pytest.raises(ValueError, match="pre-quantized"):
        load_checkpoint(store, shardings={})


def test_model_manager_writes_and_hits_quant_store(tmp_path, monkeypatch):
    """First quantized load writes through to the store; a fresh manager's
    next load restores it without the dense load + quantize pass."""
    from vibevoice_tpu.apps.model_manager import ModelManager
    from vibevoice_tpu.checkpoint import checkpoint_meta

    monkeypatch.setenv("VIBEVOICE_QUANT_STORE", str(tmp_path / "qs"))
    from vibevoice_tpu.apps import model_manager as mm
    monkeypatch.setitem(mm.MODEL_REGISTRY, "VibeVoice-tiny-test",
                        {"config": "tiny", "paths": []})
    logs = []
    m1 = ModelManager(checkpoints_dir=str(tmp_path / "none"), offline=True,
                      quantize="int4", ddpm_steps=2, log_fn=logs.append)
    lm1 = m1.load("VibeVoice-tiny-test")
    assert lm1.quantized == "int4"
    store = m1._quant_store_path("VibeVoice-tiny-test", "int4")
    assert checkpoint_meta(store).get("quant_tier") == "int4"

    logs2 = []
    m2 = ModelManager(checkpoints_dir=str(tmp_path / "none"), offline=True,
                      quantize="int4", ddpm_steps=2, log_fn=logs2.append)
    lm2 = m2.load("VibeVoice-tiny-test")
    assert lm2.quantized == "int4"
    assert any("pre-quantized" in l for l in logs2), logs2
