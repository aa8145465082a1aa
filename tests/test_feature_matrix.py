"""Feature-interaction matrix (VERDICT r2 next #8).

Individual feature pairs are covered by their own suites; this sweeps the
combinations of {int4 weights, int8 KV cache, prefix cache, engine, mesh}
in one place and asserts each composes into a working generation — or
raises a clean, documented error.  Known composition limits (asserted, so a
silent behavior change fails here):

  * prefix cache is b=1, single-device only (generate.py:760-761) — with a
    mesh it silently falls through to the full prefill (still correct);
  * everything else composes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.generation import VibeVoiceGenerator
from vibevoice_tpu.models import vibevoice
from vibevoice_tpu.parallel import make_mesh

CFG = VibeVoiceConfig.named("tiny")
pytestmark = pytest.mark.slow


class TinyTok:
    eos_id = 3
    pad_id = 4
    speech_start_id = 10
    speech_end_id = 11
    speech_diffusion_id = 12


@pytest.fixture(scope="module")
def base_params():
    return vibevoice.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)


def _voice_prompt(b=1, t=16, seed=0):
    frame = CFG.acoustic_tokenizer.total_stride
    rs = np.random.RandomState(seed)
    ids = rs.randint(20, 200, (b, t))
    ids[:, 2] = TinyTok.speech_start_id
    ids[:, 3:6] = TinyTok.speech_diffusion_id
    ids[:, 6] = TinyTok.speech_end_id
    ids[:, -1] = TinyTok.speech_start_id
    smask = np.zeros((b, t), bool)
    smask[:, 3:6] = True
    return dict(input_ids=ids,
                speech_tensors=(rs.randn(b, 3 * frame) * 0.1).astype(np.float32),
                speech_masks=np.ones((b, 3), bool),
                speech_input_mask=smask)


_CELLS = [
    # (int4, kv8, prefix, engine, mesh)
    (False, False, False, False, False),
    (True, False, False, False, False),
    (True, True, False, False, False),
    (True, True, True, False, False),
    (True, True, False, True, False),
    (True, True, True, True, False),
    (False, True, False, False, True),
    (True, False, False, False, True),
    (True, True, False, True, True),
    (True, True, True, False, True),   # prefix+mesh: documented fall-through
    (False, False, False, True, True),
    (True, True, True, True, True),    # everything on
]


@pytest.mark.parametrize("int4,kv8,prefix,engine,mesh", _CELLS)
def test_feature_matrix_cell(base_params, int4, kv8, prefix, engine, mesh):
    from vibevoice_tpu.ops.quant import quantize_lm_params

    params = dict(base_params)
    if int4:
        params["lm"] = quantize_lm_params(params["lm"], bits=4, colscale=True)

    mesh_obj = make_mesh(8, tp=2) if mesh else None
    gen = VibeVoiceGenerator(params, CFG, TinyTok(), ddpm_inference_steps=3,
                             lm_dtype=jnp.float32, mesh=mesh_obj,
                             kv_quant=kv8, prefix_cache=2 if prefix else 0)

    vp = _voice_prompt()
    if engine:
        from vibevoice_tpu.generation.engine import ContinuousEngine
        eng = ContinuousEngine(gen, slots=2, cache_len=256, chunk_steps=3,
                               cfg_scale=1.3)
        reqs = [eng.submit(vp, max_new_tokens=6, max_length_times=1000.0,
                           seed=s) for s in (1, 2)]
        eng.drain()
        for r in reqs:
            assert r.error is None, r.error
            assert len(r.tokens) > 0
    else:
        out = gen.generate(**vp, cfg_scale=1.3, max_new_tokens=6,
                           chunk_steps=3, max_length_times=1000.0, seed=1)
        assert out.sequences.shape[0] == 1
        valid = {TinyTok.eos_id, TinyTok.speech_start_id,
                 TinyTok.speech_end_id, TinyTok.speech_diffusion_id}
        assert set(np.unique(out.sequences)) <= valid

    if prefix:
        if mesh:
            # documented restriction: the prefix path requires b=1 AND no
            # mesh (generate.py _prefill_state gate) — nothing cached
            assert gen.prefix_cache is not None and len(gen.prefix_cache) == 0
        elif not engine:
            # the voice prompt landed in the cache; a repeat run hits it
            assert len(gen.prefix_cache) >= 1
            out2 = gen.generate(**vp, cfg_scale=1.3, max_new_tokens=6,
                                chunk_steps=3, max_length_times=1000.0, seed=1)
            assert out2.sequences.shape[0] == 1
