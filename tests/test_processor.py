"""Processor golden tests: prompt layout, parsing, batching (SURVEY.md §3.3)."""

import numpy as np
import pytest

from vibevoice_tpu.processor import VibeVoiceProcessor
from vibevoice_tpu.processor.text_tokenizer import (
    ByteFallbackTokenizer,
    EOS_ID,
    PAD_ID,
    SPEECH_DIFFUSION_ID,
    SPEECH_END_ID,
    SPEECH_START_ID,
)


@pytest.fixture
def proc():
    return VibeVoiceProcessor(tokenizer=ByteFallbackTokenizer())


def test_prompt_layout_single_speaker(proc):
    out = proc("Speaker 1: Hello world")
    ids = out["input_ids"][0].tolist()
    tok = proc.tokenizer
    sys_toks = tok.encode(proc.system_prompt)
    assert ids[:len(sys_toks)] == sys_toks
    # sequence ends with " Speech output:\n" + speech_start
    tail = tok.encode(" Speech output:\n") + [SPEECH_START_ID]
    assert ids[-len(tail):] == tail
    # text section present, 1-based -> 0-based normalization
    text_sec = tok.encode(" Text input:\n") + tok.encode(" Speaker 0: Hello world\n")
    joined = ",".join(map(str, ids))
    assert ",".join(map(str, text_sec)) in joined
    assert not any(out["speech_input_mask"][0])  # no voice prompt -> no speech slots


def test_voice_prompt_expansion(proc):
    sr = 24000
    ratio = proc.speech_tok_compress_ratio
    wav = np.zeros(2 * ratio + 100, np.float32)  # -> ceil = 3 frames
    out = proc("Speaker 1: Hi", voice_samples=[wav])
    ids = out["input_ids"][0].tolist()
    mask = out["speech_input_mask"][0]

    assert ids.count(SPEECH_DIFFUSION_ID) == 3
    assert mask.sum() == 3
    # mask is exactly on the diffusion pads
    for i, t in enumerate(ids):
        assert mask[i] == (t == SPEECH_DIFFUSION_ID)
    # voice prompt section: start ... end present before the text section
    si, ei = ids.index(SPEECH_START_ID), ids.index(SPEECH_END_ID)
    assert ei - si == 3 + 1
    assert out["speech_tensors"].shape[0] == 1
    assert out["speech_masks"].shape == (1, 3)
    assert out["speech_masks"].all()


def test_left_padding_batch(proc):
    out = proc(["Speaker 1: Hi", "Speaker 1: A much longer line of text here"])
    ids = out["input_ids"]
    attn = out["attention_mask"]
    assert ids.shape == attn.shape
    # left padding: row 0 starts with pads
    assert ids[0, 0] == PAD_ID
    assert attn[0, 0] == 0 and attn[0, -1] == 1
    # both rows end at the same speech_start
    assert ids[0, -1] == SPEECH_START_ID and ids[1, -1] == SPEECH_START_ID


def test_script_parsing_multispeaker(proc):
    parsed = proc._parse_script("Speaker 1: hello\nSpeaker 2: there\nSpeaker 1: again")
    assert parsed == [(0, " hello"), (1, " there"), (0, " again")]
    # 0-based ids stay untouched
    parsed0 = proc._parse_script("Speaker 0: a\nSpeaker 1: b")
    assert parsed0 == [(0, " a"), (1, " b")]


def test_txt_and_json_ingestion(proc, tmp_path):
    txt = tmp_path / "s.txt"
    txt.write_text("Speaker 1: hello\nplain continuation\n")
    script = proc._convert_text_to_script(str(txt))
    assert script == "Speaker 1: hello\nSpeaker 1: plain continuation"

    import json
    j = tmp_path / "s.json"
    j.write_text(json.dumps([{"speaker": "1", "text": "hi"},
                             {"speaker": "2", "text": "yo"}]))
    script = proc._convert_json_to_script(str(j))
    assert script == "Speaker 1: hi\nSpeaker 2: yo"


def test_save_pretrained_roundtrip(proc, tmp_path):
    proc.save_pretrained(str(tmp_path))
    p2 = VibeVoiceProcessor.from_pretrained(str(tmp_path))
    assert p2.speech_tok_compress_ratio == proc.speech_tok_compress_ratio
    assert p2.db_normalize == proc.db_normalize


def test_audio_normalizer():
    from vibevoice_tpu.processor.audio import AudioNormalizer
    rs = np.random.RandomState(0)
    audio = rs.randn(24000).astype(np.float32) * 0.01
    norm = AudioNormalizer(target_dB_FS=-25)
    out = norm(audio)
    rms_db = 20 * np.log10(np.sqrt(np.mean(out ** 2)))
    assert abs(rms_db - (-25)) < 0.5
    assert np.abs(out).max() <= 1.0


def test_wav_roundtrip(tmp_path):
    from vibevoice_tpu.processor.audio import read_wav, write_wav
    rs = np.random.RandomState(1)
    audio = (rs.rand(1000).astype(np.float32) - 0.5) * 0.8
    p = str(tmp_path / "t.wav")
    write_wav(p, audio, 24000)
    back, sr = read_wav(p)
    assert sr == 24000
    np.testing.assert_allclose(back, audio, atol=1.5 / 16384)  # 16-bit quantization


def test_resample():
    from vibevoice_tpu.processor.audio import resample
    t = np.arange(16000) / 16000
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample(tone, 16000, 24000)
    assert abs(len(out) - 24000) <= 2
    # the resampled tone should still be a 440 Hz sine: compare midsection
    t24 = np.arange(len(out)) / 24000
    ref = np.sin(2 * np.pi * 440 * t24)
    mid = slice(1000, len(out) - 1000)
    err = np.abs(out[mid] - ref[mid]).max()
    assert err < 0.02, err
