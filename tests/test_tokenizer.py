"""Acoustic/semantic tokenizer: shapes, round-trip, streaming == batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibevoice_tpu.config import VibeVoiceConfig
from vibevoice_tpu.models import acoustic_tokenizer as tok

CFG = VibeVoiceConfig.named("tiny")
ACFG = CFG.acoustic_tokenizer  # total stride 4*2*2 = 16
SCFG = CFG.semantic_tokenizer


@pytest.fixture(scope="module")
def params():
    return tok.init_acoustic_params(jax.random.PRNGKey(0), ACFG, jnp.float32)


def test_encode_decode_shapes(params):
    stride = ACFG.total_stride
    b, frames = 2, 5
    audio = jnp.asarray(np.random.RandomState(0).randn(b, frames * stride, 1),
                        jnp.float32)
    lat, _ = tok.encode(params["encoder"], ACFG, audio)
    assert lat.shape == (b, frames, ACFG.vae_dim)
    out, _ = tok.decode(params["decoder"], ACFG, lat)
    assert out.shape == (b, frames * stride, 1)


def test_encode_unaligned_length(params):
    # non-multiple of stride -> ceil(T/stride) frames (tokenizer.py:127-133)
    stride = ACFG.total_stride
    audio = jnp.asarray(np.random.RandomState(1).randn(1, 3 * stride + 7, 1), jnp.float32)
    lat, _ = tok.encode(params["encoder"], ACFG, audio)
    assert lat.shape[1] == 4


def test_streaming_encode_equals_batch(params):
    stride = ACFG.total_stride
    b, frames = 2, 6
    audio = np.random.RandomState(2).randn(b, frames * stride, 1).astype(np.float32)
    lat_batch, _ = tok.encode(params["encoder"], ACFG, jnp.asarray(audio))

    state = tok.init_encoder_state(ACFG, b)
    outs = []
    for i in range(frames):
        chunk = jnp.asarray(audio[:, i * stride:(i + 1) * stride])
        lat, state = tok.encode(params["encoder"], ACFG, chunk, state)
        outs.append(lat)
    lat_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(lat_stream), np.asarray(lat_batch),
                               rtol=2e-4, atol=2e-4)


def test_streaming_decode_equals_batch(params):
    """The hot vocode path: one latent frame in -> `stride` samples out,
    chunked decode must equal batch decode exactly (SURVEY.md §4)."""
    stride = ACFG.total_stride
    b, frames = 2, 6
    lat = np.random.RandomState(3).randn(b, frames, ACFG.vae_dim).astype(np.float32)
    audio_batch, _ = tok.decode(params["decoder"], ACFG, jnp.asarray(lat))

    state = tok.init_decoder_state(ACFG, b)
    outs = []
    for i in range(frames):
        audio, state = tok.decode(params["decoder"], ACFG,
                                  jnp.asarray(lat[:, i:i + 1]), state)
        assert audio.shape == (b, stride, 1)
        outs.append(audio)
    audio_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(audio_stream), np.asarray(audio_batch),
                               rtol=2e-4, atol=2e-4)


def test_semantic_encoder():
    params = tok.init_encoder_params(jax.random.PRNGKey(1), SCFG, jnp.float32)
    stride = SCFG.total_stride
    audio = jnp.asarray(np.random.RandomState(4).randn(1, 4 * stride, 1), jnp.float32)
    lat, _ = tok.encode(params, SCFG, audio)
    assert lat.shape == (1, 4, SCFG.vae_dim)

    # streaming parity for the semantic re-encode path too
    state = tok.init_encoder_state(SCFG, 1)
    outs = []
    for i in range(4):
        l, state = tok.encode(params, SCFG, audio[:, i * stride:(i + 1) * stride], state)
        outs.append(l)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, axis=1)),
                               np.asarray(lat), rtol=2e-4, atol=2e-4)


def test_vae_sampling_modes():
    mean = jnp.ones((3, 4, 8))
    rng = jax.random.PRNGKey(0)
    assert np.allclose(tok.sample_latents(rng, mean, 0.0, "none"), mean)
    fix = tok.sample_latents(rng, mean, 0.5, "fix")
    assert fix.shape == mean.shape and not np.allclose(fix, mean)
    # gaussian: per-sample scalar std (tokenizer.py:980-989)
    g = tok.sample_latents(rng, mean, 0.5, "gaussian")
    assert g.shape == mean.shape
