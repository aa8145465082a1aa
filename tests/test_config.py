import json

from vibevoice_tpu.config import VibeVoiceConfig


def test_load_bundled_configs():
    for name, vocab, hidden in [("1.5b", 151936, 1536), ("7b", 152064, 3584)]:
        cfg = VibeVoiceConfig.named(name)
        assert cfg.decoder.vocab_size == vocab
        assert cfg.decoder.hidden_size == hidden
        assert cfg.acoustic_tokenizer.vae_dim == 64
        assert cfg.semantic_tokenizer.vae_dim == 128
        assert cfg.acoustic_tokenizer.total_stride == 3200
        assert cfg.diffusion_head.prediction_type == "v_prediction"
        assert cfg.diffusion_head.ddpm_beta_schedule == "cosine"

    cfg15 = VibeVoiceConfig.named("1.5b")
    assert cfg15.decoder.tie_word_embeddings
    assert not VibeVoiceConfig.named("7b").decoder.tie_word_embeddings
    assert cfg15.decoder.rope_theta == 1e6
    assert cfg15.decoder.max_position_embeddings == 65536


def test_depth_parsing_and_decoder_default():
    cfg = VibeVoiceConfig.named("1.5b").acoustic_tokenizer
    assert cfg.encoder_depths == (3, 3, 3, 3, 3, 3, 8)
    # decoder depths default to reversed encoder depths (tokenizer.py:1024-1028)
    assert cfg.resolved_decoder_depths == (8, 3, 3, 3, 3, 3, 3)


def test_roundtrip(tmp_path):
    cfg = VibeVoiceConfig.named("tiny")
    p = tmp_path / "cfg.json"
    cfg.save_json(str(p))
    cfg2 = VibeVoiceConfig.from_json(str(p))
    assert cfg2 == cfg
