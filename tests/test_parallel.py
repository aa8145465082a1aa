"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4):
the same pjit program must run on 1 and N devices with matching results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.models import vibevoice
from vibevoice_tpu.parallel import batch_shardings, make_mesh, param_shardings
from vibevoice_tpu.train import make_train_step

CFG = VibeVoiceConfig.named("tiny")


def _batch(b, t=24, n_frames=2):
    frame = CFG.acoustic_tokenizer.total_stride
    rs = np.random.RandomState(0)
    ids = rs.randint(0, CFG.decoder.vocab_size, (b, t))
    labels = np.where(rs.rand(b, t) < 0.2, -100, ids)
    ac = np.zeros((b, t), bool)
    ac[:, 5:5 + n_frames] = True
    return {
        "input_ids": ids,
        "attention_mask": np.ones((b, t), np.int32),
        "labels": labels,
        "speech_tensors": rs.randn(b, n_frames * frame).astype(np.float32) * 0.1,
        "speech_masks": np.ones((b, n_frames), bool),
        "acoustic_input_mask": ac,
        "acoustic_loss_mask": ac,
    }


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8
    mesh2 = make_mesh(8, dp=4)
    assert mesh2.shape == {"dp": 4, "tp": 2}


def test_train_step_single_device():
    params = vibevoice.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    init_state, train_step = make_train_step(CFG)
    state = init_state(params)
    state, metrics = jax.jit(train_step)(state, _batch(2), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["ce_loss"]))
    assert np.isfinite(float(metrics["diffusion_loss"]))
    # a second step changes the loss (params actually updated)
    state2, m2 = jax.jit(train_step)(state, _batch(2), jax.random.PRNGKey(1))
    assert float(m2["loss"]) != float(metrics["loss"])


def test_train_step_sharded_matches_single():
    """dp=2 x tp=4 sharded step == single-device step (same data, same rng)."""
    params = vibevoice.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    init_state, train_step = make_train_step(CFG)
    batch = _batch(4)
    rngs = jax.random.PRNGKey(3)

    # single device
    state1 = init_state(params)
    _, m1 = jax.jit(train_step)(state1, batch, rngs)

    # sharded
    mesh = make_mesh(8, dp=2, tp=4)
    p_sh = param_shardings(params, mesh)
    params_sh = jax.tree.map(jax.device_put, params, p_sh)
    state2 = init_state(params_sh)
    batch_sh = jax.tree.map(jax.device_put, batch, batch_shardings(mesh, batch))
    with mesh:
        _, m2 = jax.jit(train_step)(state2, batch_sh, rngs)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m1["diffusion_loss"]),
                               float(m2["diffusion_loss"]), rtol=1e-4)


def test_sharded_generation_matches_single():
    """TP/DP-sharded generation on the 8-device mesh must produce the same
    tokens and audio as single-device generation (VERDICT item 2: sharded
    inference path for the reference's tp_plan)."""
    from vibevoice_tpu.generation.generate import VibeVoiceGenerator
    from vibevoice_tpu.processor.text_tokenizer import ByteFallbackTokenizer

    tk = ByteFallbackTokenizer()
    params = vibevoice.init_params(jax.random.PRNGKey(7), CFG, jnp.float32)
    rs = np.random.RandomState(1)
    b = 2
    ids = rs.randint(20, 200, (b, 24))
    ids[:, -1] = tk.speech_start_id
    # voice prompt: covers the prefill speech-encode + scatter under GSPMD
    frame = CFG.acoustic_tokenizer.total_stride
    ids[:, 2] = tk.speech_start_id
    ids[:, 3:6] = tk.speech_diffusion_id
    ids[:, 6] = tk.speech_end_id
    smask = np.zeros((b, 24), bool)
    smask[:, 3:6] = True
    kw = dict(cfg_scale=1.3, max_new_tokens=8, chunk_steps=4,
              max_length_times=1000.0, seed=3,
              speech_tensors=rs.randn(b, 3 * frame).astype(np.float32) * 0.1,
              speech_masks=np.ones((b, 3), bool),
              speech_input_mask=smask)

    gen1 = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=3,
                              lm_dtype=jnp.float32)
    out1 = gen1.generate(ids, **kw)

    mesh = make_mesh(8, tp=2)
    gen2 = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=3,
                              lm_dtype=jnp.float32, mesh=mesh)
    assert gen2.kv_tp, "tiny config (2 kv heads) should shard kv on tp=2"
    out2 = gen2.generate(ids, **kw)

    np.testing.assert_array_equal(out1.sequences, out2.sequences)
    for a, bw in zip(out1.speech_outputs, out2.speech_outputs):
        if a is None:
            assert bw is None
        else:
            np.testing.assert_allclose(a, bw, atol=2e-4)


def test_graft_dryrun():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_calibration_wired_and_sharded_matches_single():
    """VERDICT item 6: the first train step must calibrate the NaN scale/bias
    buffers from batch latent stats (reference modeling_vibevoice.py:307-323),
    with identical values on 1 device and on the dp-sharded mesh (the implicit
    GSPMD collective replaces the reference's all_reduce)."""
    params = vibevoice.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    assert np.isnan(float(params["speech_scaling_factor"]))
    init_state, train_step = make_train_step(CFG)
    batch = _batch(4)
    rngs = jax.random.PRNGKey(5)

    s1 = init_state(params)
    s1, m1 = jax.jit(train_step)(s1, batch, rngs)
    sf1 = float(m1["speech_scaling_factor"])
    bf1 = float(m1["speech_bias_factor"])
    assert np.isfinite(sf1) and np.isfinite(bf1) and sf1 > 0

    mesh = make_mesh(8, dp=2, tp=4)
    p_sh = jax.tree.map(jax.device_put, params, param_shardings(params, mesh))
    s2 = init_state(p_sh)
    batch_sh = jax.tree.map(jax.device_put, batch, batch_shardings(mesh, batch))
    with mesh:
        s2, m2 = jax.jit(train_step)(s2, batch_sh, rngs)
    np.testing.assert_allclose(sf1, float(m2["speech_scaling_factor"]), rtol=1e-5)
    np.testing.assert_allclose(bf1, float(m2["speech_bias_factor"]), rtol=1e-5)

    # second step must NOT recalibrate (buffers pinned once non-NaN)
    s1b, m1b = jax.jit(train_step)(s1, _batch(4, n_frames=3), jax.random.PRNGKey(9))
    np.testing.assert_allclose(float(m1b["speech_scaling_factor"]), sf1, rtol=0, atol=0)


def test_fsdp_param_sharding():
    """fsdp=True shards the stored LM params (and optimizer state, which
    follows params) on dp - per-device shard bytes drop ~dp x for the LM."""
    from vibevoice_tpu.parallel import param_shardings

    params = vibevoice.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    mesh = make_mesh(8, dp=4, tp=2)

    def shard_bytes(p):
        x = p["lm"]["layers"]["wg"]
        db = x.sharding.shard_shape(x.shape)
        return np.prod(db)

    p_rep = jax.tree.map(jax.device_put, params,
                         param_shardings(params, mesh, fsdp=False))
    p_fsdp = jax.tree.map(jax.device_put, params,
                          param_shardings(params, mesh, fsdp=True))
    assert shard_bytes(p_fsdp) * 4 == shard_bytes(p_rep)

    # the sharded train step still runs and matches the replicated one
    init_state, train_step = make_train_step(CFG)
    batch = _batch(4)
    batch_sh = jax.tree.map(jax.device_put, batch, batch_shardings(mesh, batch))
    rngs = jax.random.PRNGKey(3)
    with mesh:
        _, m_rep = jax.jit(train_step)(init_state(p_rep), batch_sh, rngs)
        _, m_fsdp = jax.jit(train_step)(init_state(p_fsdp), batch_sh, rngs)
    np.testing.assert_allclose(float(m_rep["loss"]), float(m_fsdp["loss"]), rtol=1e-4)


def test_7b_sharded_decode_lowers():
    """The 7B config's CFG-paired decode step must lower with real TP
    shardings (VERDICT item 2 done-criterion) — abstract params, no weight
    materialization, tp=4 matches 28q/4kv head counts."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vibevoice_tpu.parallel import infer_kv_tp, kv_cache_pspec, param_pspecs

    cfg7 = VibeVoiceConfig.named("7b")
    mesh = make_mesh(8, tp=4)
    assert infer_kv_tp(cfg7.decoder, mesh)

    from vibevoice_tpu.models import qwen2

    shapes = jax.eval_shape(
        lambda k: vibevoice.init_params(k, cfg7, jnp.bfloat16),
        jax.random.PRNGKey(0))
    pspecs = param_pspecs(shapes, kv_tp=True)
    p_avals = jax.tree.map(
        lambda s, sp: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, sp)),
        dict(shapes), pspecs,
        is_leaf=lambda x: isinstance(x, (jax.ShapeDtypeStruct, P)))

    b2, s = 2, 1024
    cache_sh = NamedSharding(mesh, kv_cache_pspec(True, batch_on_dp=False))
    dc = cfg7.decoder
    cache_aval = qwen2.KVCache(
        k=jax.ShapeDtypeStruct((dc.num_hidden_layers, b2, dc.num_key_value_heads,
                                s, dc.resolved_head_dim), jnp.bfloat16,
                               sharding=cache_sh),
        v=jax.ShapeDtypeStruct((dc.num_hidden_layers, b2, dc.num_key_value_heads,
                                s, dc.resolved_head_dim), jnp.bfloat16,
                               sharding=cache_sh))

    def step(lm, embeds, positions, widx, kvs, kvl, cache):
        return qwen2.decode_step(lm, dc, embeds, positions, widx, kvs, kvl,
                                 cache, impl="xla")

    lowered = jax.jit(step).lower(
        p_avals["lm"],
        jax.ShapeDtypeStruct((b2, 1, dc.hidden_size), jnp.bfloat16),
        jax.ShapeDtypeStruct((b2,), jnp.int32),
        jax.ShapeDtypeStruct((b2,), jnp.int32),
        jax.ShapeDtypeStruct((b2,), jnp.int32),
        jax.ShapeDtypeStruct((b2,), jnp.int32),
        cache_aval)
    hlo = lowered.as_text()
    assert "sharding" in hlo  # shardings survived into the lowered module


def test_quantized_sharded_generation():
    """int8 LM + TP mesh: quantized {q, s} leaves get matching shardings
    (the 7B multi-chip int8 serving combination) and sharded generation
    matches the single-device quantized run."""
    from vibevoice_tpu.generation.generate import VibeVoiceGenerator
    from vibevoice_tpu.ops.quant import quantize_lm_params
    from vibevoice_tpu.processor.text_tokenizer import ByteFallbackTokenizer

    tk = ByteFallbackTokenizer()
    params = vibevoice.init_params(jax.random.PRNGKey(3), CFG, jnp.float32)
    params = dict(params)
    params["lm"] = quantize_lm_params(params["lm"])
    rs = np.random.RandomState(5)
    ids = rs.randint(20, 200, (2, 20))
    ids[:, -1] = tk.speech_start_id
    kw = dict(cfg_scale=1.3, max_new_tokens=6, chunk_steps=3,
              max_length_times=1000.0, seed=2)

    out1 = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=3,
                              lm_dtype=jnp.float32).generate(ids, **kw)
    mesh = make_mesh(8, tp=2)
    gen2 = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=3,
                              lm_dtype=jnp.float32, mesh=mesh)
    # the int8 projection shardings actually landed on tp
    wq = gen2.params["lm"]["layers"]["wq"]
    assert wq["q"].sharding.spec[-1] == "tp"
    out2 = gen2.generate(ids, **kw)
    np.testing.assert_array_equal(out1.sequences, out2.sequences)


def test_int4_sharded_matmul_kernel_matches_dequant():
    """int4_matmul_sharded keeps the Pallas quant kernel under a mesh
    (VERDICT r2 item 2): column-parallel weight, per-shard kernel (interpret
    mode on the CPU mesh), output matches the dequantized matmul to bf16-dot
    tolerance.  Covers the plain and layer-stacked (_lyr) leaf forms."""
    from vibevoice_tpu.ops import int4

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1.0, (8, 512)).astype(np.float32))
    mesh = make_mesh(8, tp=2)

    w = jnp.asarray(rng.normal(0, 0.05, (512, 256)).astype(np.float32))
    qw = int4.quantize_weight_int4c(w)
    y_ref = x @ int4.dequantize_weight_int4c(qw, jnp.float32)
    y = int4.int4_matmul_sharded(x, qw, mesh, batch_on_dp=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-2, atol=2e-2)

    # stacked leaf addressed by scalar prefetch, layer 1 of 3
    ws = jnp.asarray(rng.normal(0, 0.05, (3, 512, 256)).astype(np.float32))
    qs = int4.quantize_weight_int4c(ws)
    leaf = {"q4c": qs["q4c"], "s4c": qs["s4c"], "_lyr": jnp.int32(1)}
    y_ref = x @ int4.dequantize_weight_int4c(
        {"q4c": qs["q4c"][1], "s4c": qs["s4c"][1]}, jnp.float32)
    y = int4.int4_matmul_sharded(x, leaf, mesh, batch_on_dp=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-2, atol=2e-2)


def test_int4_sharded_generation_matches_single():
    """int4c LM + TP mesh: quantized leaves land column-parallel (the layout
    the per-shard Pallas matmul requires), meshed generation is token-exact
    vs single-device, and the meshed generator does NOT degrade the
    process-wide int4 dispatch (per-generator impl, not set_impl global)."""
    from vibevoice_tpu.generation.generate import VibeVoiceGenerator
    from vibevoice_tpu.ops import int4
    from vibevoice_tpu.ops.quant import quantize_lm_params
    from vibevoice_tpu.processor.text_tokenizer import ByteFallbackTokenizer

    tk = ByteFallbackTokenizer()
    params = vibevoice.init_params(jax.random.PRNGKey(11), CFG, jnp.float32)
    params = dict(params)
    params["lm"] = quantize_lm_params(params["lm"], bits=4, colscale=True)
    assert any("q4c" in leaf for leaf in params["lm"]["layers"].values()
               if isinstance(leaf, dict)), "tiny LM should quantize to int4c"
    rs = np.random.RandomState(5)
    ids = rs.randint(20, 200, (2, 20))
    ids[:, -1] = tk.speech_start_id
    kw = dict(cfg_scale=1.3, max_new_tokens=6, chunk_steps=3,
              max_length_times=1000.0, seed=2)

    out1 = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=3,
                              lm_dtype=jnp.float32).generate(ids, **kw)
    mesh = make_mesh(8, tp=2)
    gen2 = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=3,
                              lm_dtype=jnp.float32, mesh=mesh)
    wq = gen2.params["lm"]["layers"]["wq"]
    assert wq["q4c"].sharding.spec[-1] == "tp", wq["q4c"].sharding
    # constructing the meshed generator must not pin the process default
    assert int4.current_impl() == "auto"
    out2 = gen2.generate(ids, **kw)
    np.testing.assert_array_equal(out1.sequences, out2.sequences)
    for a, bw in zip(out1.speech_outputs, out2.speech_outputs):
        if a is None:
            assert bw is None
        else:
            np.testing.assert_allclose(a, bw, atol=2e-4)


@pytest.mark.parametrize("kv8", [False, True])
def test_rep_kv_sharded_decode_matches_single(kv8):
    """VERDICT r3 weak #5: when tp does NOT divide the kv-head count
    (tiny config: 2 kv heads, tp=4) meshed decode must still take the
    flash kernel — the replicated-KV head-offset shard_map path
    (flash_decode_attention_sharded kv_tp=False) — and produce tokens
    and audio identical to a single device, for both bf16 and int8 KV."""
    from vibevoice_tpu.generation.generate import VibeVoiceGenerator
    from vibevoice_tpu.processor.text_tokenizer import ByteFallbackTokenizer

    tk = ByteFallbackTokenizer()
    params = vibevoice.init_params(jax.random.PRNGKey(7), CFG, jnp.float32)
    rs = np.random.RandomState(2)
    b = 2
    ids = rs.randint(20, 200, (b, 24))
    ids[:, -1] = tk.speech_start_id
    kw = dict(cfg_scale=1.3, max_new_tokens=8, chunk_steps=4,
              max_length_times=1000.0, seed=3)

    gen1 = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=3,
                              lm_dtype=jnp.float32, kv_quant=kv8)
    out1 = gen1.generate(ids, **kw)

    mesh = make_mesh(8, tp=4)
    gen2 = VibeVoiceGenerator(params, CFG, tk, ddpm_inference_steps=3,
                              lm_dtype=jnp.float32, mesh=mesh, kv_quant=kv8)
    assert not gen2.kv_tp, "tp=4 must not divide the 2 kv heads"
    assert gen2.decode_impl == "pallas_shmap", gen2.decode_impl
    out2 = gen2.generate(ids, **kw)

    np.testing.assert_array_equal(out1.sequences, out2.sequences)
    for a, bw in zip(out1.speech_outputs, out2.speech_outputs):
        if a is None:
            assert bw is None
        else:
            np.testing.assert_allclose(a, bw, atol=2e-4)
