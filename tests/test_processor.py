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


class TestQwen2BPE:
    """Standalone Qwen2-style BPE (processor/text_tokenizer.py) against a
    handcrafted vocab/merges fixture — validates the GPT-2 byte encoder, the
    merge order, the pre-tokenizer split, and special-token handling without
    needing the real 151k vocab (unavailable in this air-gapped image)."""

    def _tok(self):
        from vibevoice_tpu.processor.text_tokenizer import (Qwen2BPETokenizer,
                                                            _bytes_to_unicode)
        be = _bytes_to_unicode()
        sp = be[ord(" ")]  # 'Ġ'
        base = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [sp]
        merges = [(sp, "h"), ("h", "e"), (sp + "h", "e"), ("l", "l"),
                  ("ll", "o"), (sp + "he", "llo")]
        vocab_list = base + ["".join(m) for m in merges]
        vocab = {t: i for i, t in enumerate(vocab_list)}
        specials = {"<|endoftext|>": 500, "<|vision_start|>": 501,
                    "<|vision_end|>": 502, "<|vision_pad|>": 503,
                    "<|image_pad|>": 504}
        vocab.update(specials)
        return Qwen2BPETokenizer(vocab, merges, specials), vocab, sp

    def test_merge_order_and_byte_encoder(self):
        tok, vocab, sp = self._tok()
        # " hello" pre-tokenizes as one piece; merges build Ġ+h -> Ġh+e?? no:
        # merge order: Ġ+h, Ġh+e, l+l, ll+o, Ġhe+llo -> one token
        ids = tok.encode(" hello")
        assert ids == [vocab[sp + "hello"]]
        # no leading space: h+e, l+l, ll+o; (he,llo) is not a merge
        ids2 = tok.encode("hello")
        assert ids2 == [vocab["he"], vocab["llo"]]

    def test_pretokenizer_splits_words(self):
        tok, vocab, sp = self._tok()
        # two words -> independent BPE per piece
        ids = tok.encode("he he")
        assert ids == [vocab["he"], vocab[sp + "he"]]

    def test_roundtrip_and_specials(self):
        tok, vocab, sp = self._tok()
        ids = tok.encode(" hello hello")
        assert tok.decode(ids) == " hello hello"
        ids_sp = ids + [tok.speech_start_id, tok.speech_diffusion_id]
        assert tok.speech_start_id == 501 and tok.pad_id == 504
        assert tok.decode(ids_sp) == " hello hello"
        assert tok.decode(ids_sp, skip_special_tokens=False).endswith(
            "<|vision_start|><|vision_pad|>")

    def test_from_pretrained_files(self, tmp_path):
        """Loads the standard vocab.json + merges.txt artifact layout."""
        import json
        from vibevoice_tpu.processor.text_tokenizer import (Qwen2BPETokenizer,
                                                            _bytes_to_unicode)
        tok0, vocab, sp = self._tok()
        (tmp_path / "vocab.json").write_text(
            json.dumps({k: v for k, v in vocab.items()
                        if not k.startswith("<|")}))
        (tmp_path / "merges.txt").write_text(
            "#version: 0.2\n" + "\n".join(" ".join(m) for m in tok0.ranks))
        (tmp_path / "tokenizer_config.json").write_text(json.dumps({
            "added_tokens_decoder": {
                "500": {"content": "<|endoftext|>"},
                "501": {"content": "<|vision_start|>"},
                "502": {"content": "<|vision_end|>"},
                "503": {"content": "<|vision_pad|>"},
                "504": {"content": "<|image_pad|>"}}}))
        tok = Qwen2BPETokenizer.from_pretrained(str(tmp_path))
        assert tok.encode(" hello") == tok0.encode(" hello")
        assert tok.speech_diffusion_id == 503

    def test_matches_hf_bpe_if_available(self, tmp_path):
        """Cross-check against HF's GPT2/Qwen2 BPE machinery on the fixture."""
        pytest.importorskip("transformers")
        import json
        from transformers import GPT2Tokenizer
        tok0, vocab, sp = self._tok()
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        # trailing newline required: HF's reader drops the final line
        (tmp_path / "merges.txt").write_text(
            "#version: 0.2\n"
            + "\n".join(" ".join(m) for m in tok0.ranks) + "\n")
        try:
            hf = GPT2Tokenizer(str(tmp_path / "vocab.json"),
                               str(tmp_path / "merges.txt"))
        except Exception:
            pytest.skip("GPT2Tokenizer unavailable")
        for text in (" hello", "hello", " hello hello", " he llo"):
            assert tok0.encode(text) == hf.encode(text), text

    def test_special_tokens_split_in_encode(self):
        """Literal control markers inside text resolve to their ids, matching
        HF added-token behavior (reference
        modular_vibevoice_text_tokenizer.py:68-80); surrounding text is BPE'd
        per segment."""
        tok, vocab, sp = self._tok()
        ids = tok.encode("he<|vision_start|> hello")
        assert ids == [vocab["he"], 501, vocab[sp + "hello"]]
        # adjacent specials, and at string boundaries
        assert tok.encode("<|vision_pad|><|vision_end|>") == [503, 502]
        assert tok.encode("<|endoftext|>") == [500]
        # longest-match: no special is a prefix of another here, but the
        # alternation must not split mid-token
        assert tok.encode("hello<|image_pad|>") == [
            vocab["he"], vocab["llo"], 504]

    def test_special_tokens_split_matches_hf(self, tmp_path):
        """The split behavior equals HF's added-special-token handling."""
        pytest.importorskip("transformers")
        import json
        from transformers import GPT2Tokenizer
        tok0, vocab, sp = self._tok()
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        (tmp_path / "merges.txt").write_text(
            "#version: 0.2\n"
            + "\n".join(" ".join(m) for m in tok0.ranks) + "\n")
        try:
            hf = GPT2Tokenizer(str(tmp_path / "vocab.json"),
                               str(tmp_path / "merges.txt"))
        except Exception:
            pytest.skip("GPT2Tokenizer unavailable")
        hf.add_special_tokens({"additional_special_tokens": [
            "<|vision_start|>", "<|vision_end|>", "<|vision_pad|>"]})
        for text in ("he<|vision_start|> hello",
                     "<|vision_pad|><|vision_end|>hello",
                     " hello<|vision_start|>"):
            assert tok0.encode(text) == hf.encode(text), text

    def test_byte_fallback_special_tokens(self):
        from vibevoice_tpu.processor.text_tokenizer import (
            SPEECH_START_ID, ByteFallbackTokenizer)
        tok = ByteFallbackTokenizer()
        ids = tok.encode("ab<|vision_start|>c")
        assert ids == [ord("a"), ord("b"), SPEECH_START_ID, ord("c")]
