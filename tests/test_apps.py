"""Host app logic tests: script-AI pipeline, voice library, CLI parsing, streamer."""

import json
import os
import threading
import time

import numpy as np
import pytest

from vibevoice_tpu.apps.gradio_app import VoiceLibrary, convert_to_16_bit_wav
from vibevoice_tpu.apps.inference_from_file import VoiceMapper, parse_txt_script
from vibevoice_tpu.apps.script_ai import (
    ScriptAIClient,
    ScriptAIConfig,
    normalize_base_url,
)
from vibevoice_tpu.streamer import AudioStreamer


def test_normalize_base_url():
    assert normalize_base_url("localhost:8000") == "http://localhost:8000/v1"
    assert normalize_base_url("https://api.openai.com/v1/") == "https://api.openai.com/v1"
    assert normalize_base_url("http://x/v1") == "http://x/v1"


def test_script_cleanup_markdown_and_numbers():
    raw = """```
# Podcast
Speaker 1: Hello there!
**Speaker 2: Hi!**
3: I'm third but clamped.
random continuation line
```"""
    out = ScriptAIClient.clean_script(raw, num_speakers=2)
    lines = out.split("\n")
    assert lines[0] == "Speaker 1: Hello there!"
    assert lines[1] == "Speaker 2: Hi!"
    assert lines[2].startswith("Speaker 2: I'm third")  # clamped to num_speakers
    assert "random continuation line" in lines[2]


def test_script_cleanup_json_shape():
    raw = json.dumps([{"speaker": 1, "text": "a"}, {"speaker": 2, "text": "b"}])
    out = ScriptAIClient.clean_script(raw, 2)
    assert out == "Speaker 1: a\nSpeaker 2: b"


def test_extract_text_shapes():
    ex = ScriptAIClient._extract_text
    assert ex({"choices": [{"message": {"content": "x"}}]}) == "x"
    assert ex({"choices": [{"text": "y"}]}) == "y"
    assert ex({"output_text": "z"}) == "z"
    with pytest.raises(ValueError):
        ex({"weird": 1})


def test_script_ai_env_precedence(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / ".env").write_text("OPENAI_BASE_URL=dotenv-host\nOPENAI_MODEL=m1\n")
    monkeypatch.setenv("OPENAI_BASE_URL", "env-host")
    cfg = ScriptAIConfig.from_env({"base_url": "cli-host"})
    assert cfg.base_url == "http://cli-host/v1"      # CLI wins
    assert cfg.model == "m1"                          # .env fills the rest
    monkeypatch.delenv("OPENAI_BASE_URL")
    cfg2 = ScriptAIConfig.from_env()
    assert cfg2.base_url == "http://dotenv-host/v1"


def test_parse_txt_script_named_speakers():
    script, actors = parse_txt_script(
        "Alice: hi\nBob: yo\nAlice: bye", ["Alice", "Bob"])
    assert script == "Speaker 1: hi\nSpeaker 2: yo\nSpeaker 1: bye"
    assert actors == ["Alice", "Bob"]


def test_voice_mapper(tmp_path):
    (tmp_path / "en-Alice_woman.wav").write_bytes(b"RIFF")
    (tmp_path / "en-Bob_man.wav").write_bytes(b"RIFF")
    vm = VoiceMapper(str(tmp_path))
    assert vm.get_voice_path("Alice").endswith("en-Alice_woman.wav")
    assert vm.get_voice_path("BOB").endswith("en-Bob_man.wav")
    # fallback for unknown name
    assert vm.get_voice_path("Zoe")


def test_voice_library_scan(tmp_path, monkeypatch):
    voices = tmp_path / "voices"
    custom = tmp_path / "custom_voices" / "nested"
    voices.mkdir()
    custom.mkdir(parents=True)
    from vibevoice_tpu.processor.audio import write_wav
    write_wav(str(voices / "alice.wav"), np.zeros(100, np.float32))
    write_wav(str(custom / "me.wav"), np.ones(100, np.float32) * 0.5)
    lib = VoiceLibrary(str(voices), str(tmp_path / "custom_voices"))
    assert "alice" in lib.names()
    assert "custom/nested/me" in lib.names()
    wav = lib.load_voice("custom/nested/me", normalize_rms=True, target_rms=0.1)
    assert abs(float(np.sqrt(np.mean(wav ** 2))) - 0.1) < 0.01


def test_convert_to_16_bit_wav():
    out = convert_to_16_bit_wav(np.array([0.0, 0.5, -2.0]))
    assert out.dtype == np.int16
    assert out[0] == 0 and out[2] == -32767


def test_streamer_put_end_iter():
    s = AudioStreamer(batch_size=2)
    s.put(np.ones((2, 10), np.float32), [0, 1])
    s.put(np.ones((1, 5), np.float32) * 2, [1])
    s.end()
    chunks0 = list(s.get_stream(0))
    chunks1 = list(s.get_stream(1))
    assert len(chunks0) == 1 and chunks0[0].shape == (10,)
    assert len(chunks1) == 2 and chunks1[1].shape == (5,)
    assert all(s.finished_flags)


def test_streamer_threaded():
    s = AudioStreamer(batch_size=1)
    got = []

    def consumer():
        for c in s.get_stream(0):
            got.append(c)

    t = threading.Thread(target=consumer)
    t.start()
    for i in range(5):
        s.put(np.full((1, 4), i, np.float32), [0])
        time.sleep(0.01)
    s.end()
    t.join(timeout=2)
    assert len(got) == 5


def test_example_library(tmp_path):
    """Example loader: skips >15-min scripts by filename, counts speakers
    (reference demo/gradio_demo.py:584-630)."""
    from vibevoice_tpu.apps.gradio_app import ExampleLibrary
    d = tmp_path / "text_examples"
    d.mkdir()
    (d / "2p_short.txt").write_text("Speaker 1: hi\n\nSpeaker 2: hello\n")
    (d / "4p_long_45min.txt").write_text("Speaker 1: way too long\n")
    (d / "empty.txt").write_text("\n\n")
    lib = ExampleLibrary(str(d))
    assert lib.names() == ["2p_short"]
    k, script = lib.get("2p_short")
    assert k == 2
    assert "Speaker 2: hello" in script and "\n\n" not in script


def test_example_library_repo_examples():
    """The bundled examples/text_examples load and respect the 15-min cap."""
    import os
    from vibevoice_tpu.apps.gradio_app import ExampleLibrary
    root = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "text_examples")
    if not os.path.isdir(root):
        pytest.skip("no bundled examples")
    lib = ExampleLibrary(root)
    assert lib.names(), "bundled examples should load"
    assert not any("45min" in n or "100min" in n for n in lib.names())


def test_offline_mode_and_log_panel(tmp_path, monkeypatch):
    """Offline manager never attempts downloads; demo log accumulates."""
    from vibevoice_tpu.apps.gradio_app import VibeVoiceDemo
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    demo = VibeVoiceDemo(checkpoints_dir=str(tmp_path))
    assert demo.manager.offline
    demo.log("hello")
    demo.log("world")
    assert "hello" in demo.log_text and "world" in demo.log_text
    # load falls back to random weights and logs the chain
    demo.manager.ddpm_steps = 2
    # use tiny config to keep the fallback fast
    from vibevoice_tpu.apps import model_manager as mm
    monkeypatch.setitem(mm.MODEL_REGISTRY, "TinyTest",
                        {"config": "tiny", "paths": ["nonexistent/TinyTest"]})
    demo.model_name = "TinyTest"
    model = demo.manager.ensure_loaded("TinyTest")
    assert model is not None
    assert any("random weights" in l for l in demo._log_lines)


def test_gradio_demo_build(monkeypatch, tmp_path):
    """Upstream-style demo: builds headlessly with the tiny config and
    switches the solver to sde-dpmsolver++ (reference gradio_demo.py:173-179)."""
    from vibevoice_tpu.apps import model_manager as mm
    from vibevoice_tpu.apps.gradio_demo import build_demo
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    monkeypatch.setitem(mm.MODEL_REGISTRY, "TinyDemo",
                        {"config": "tiny", "paths": []})
    demo = build_demo("TinyDemo", checkpoints_dir=str(tmp_path),
                      inference_steps=2)
    gen = demo.manager.current.generator
    assert gen.solver_cfg.algorithm_type == "sde-dpmsolver++"


def test_streamer_batch_iterator():
    """Round-robin batch iterator yields (idx, chunk) across live samples."""
    from vibevoice_tpu.streamer import AudioStreamer
    st = AudioStreamer(batch_size=3)
    st.put(np.ones((2, 4), np.float32), [0, 2])
    st.put(np.full((1, 4), 2.0, np.float32), [1])
    st.end()
    got = sorted((i, float(c[0])) for i, c in st)
    assert got == [(0, 1.0), (1, 2.0), (2, 1.0)]


def test_async_streamer():
    """AsyncAudioStreamer: thread-safe puts consumed from an asyncio loop
    (reference streamer.py:150-264)."""
    import asyncio
    import threading
    from vibevoice_tpu.streamer import AsyncAudioStreamer

    async def main():
        st = AsyncAudioStreamer(batch_size=2, loop=asyncio.get_running_loop())

        def producer():
            st.put(np.ones((2, 8), np.float32), [0, 1])
            st.put(np.full((1, 8), 3.0, np.float32), [1])
            st.end()

        threading.Thread(target=producer).start()
        got0, got1 = [], []
        async for c in st.get_stream(0):
            got0.append(c)
        async for c in st.get_stream(1):
            got1.append(c)
        return got0, got1

    got0, got1 = asyncio.run(main())
    assert len(got0) == 1 and len(got1) == 2
    assert float(got1[1][0]) == 3.0


def test_async_batch_iterator():
    """AsyncAudioBatchIterator (reference streamer.py:206-264): each
    __anext__ yields {idx: chunk} for every ready sample; finished samples
    drop out; iteration ends when all are done."""
    import asyncio
    import threading
    from vibevoice_tpu.streamer import AsyncAudioStreamer

    async def main():
        st = AsyncAudioStreamer(batch_size=3,
                                loop=asyncio.get_running_loop(),
                                timeout=30.0)

        def producer():
            st.put(np.ones((2, 8), np.float32), [0, 2])
            st.end([0])
            st.put(np.full((2, 8), 2.0, np.float32), [1, 2])
            st.put(np.full((1, 8), 3.0, np.float32), [2])
            st.end()

        threading.Thread(target=producer).start()
        got = {0: [], 1: [], 2: []}
        n_frames = 0
        async for chunks in st:
            n_frames += 1
            for i, c in chunks.items():
                got[i].append(float(c[0]))
        return got, n_frames

    got, n_frames = asyncio.run(main())
    assert got[0] == [1.0]
    assert got[1] == [2.0]
    assert got[2] == [1.0, 2.0, 3.0]
    assert n_frames >= 1


def test_async_batch_iterator_timeout():
    """A stalled producer ends iteration after streamer.timeout instead of
    hanging the consumer."""
    import asyncio
    from vibevoice_tpu.streamer import AsyncAudioStreamer

    async def main():
        st = AsyncAudioStreamer(batch_size=1,
                                loop=asyncio.get_running_loop(),
                                timeout=0.1)
        frames = []
        async for chunks in st:       # nothing ever arrives
            frames.append(chunks)
        return frames

    assert asyncio.run(main()) == []


def test_script_ai_cli_overrides(monkeypatch):
    """CLI flags outrank env (reference precedence main.py:1357-1380)."""
    from vibevoice_tpu.apps.script_ai import ScriptAIConfig
    monkeypatch.setenv("OPENAI_BASE_URL", "http://env:1/v1")
    monkeypatch.setenv("OPENAI_MODEL", "env-model")
    cfg = ScriptAIConfig.from_env({"base_url": "http://cli:2/v1",
                                   "model": "cli-model"})
    assert cfg.base_url == "http://cli:2/v1"
    assert cfg.model == "cli-model"
    cfg2 = ScriptAIConfig.from_env()
    assert cfg2.base_url == "http://env:1/v1"


def test_gradio_app_script_ai_flags(monkeypatch, capsys):
    """--script-ai-* flags reach the ScriptAIClient config via --check."""
    from vibevoice_tpu.apps import gradio_app
    monkeypatch.setattr(gradio_app, "launch_ui", lambda *a, **k: None,
                        raising=False)
    args = gradio_app.build_argparser().parse_args(
        ["--check", "--offline", "--script-ai-url", "http://flag:9",
         "--script-ai-model", "flag-model"])
    assert args.script_ai_url == "http://flag:9"
    overrides = {k: v for k, v in (("base_url", args.script_ai_url),
                                   ("model", args.script_ai_model),
                                   ("api_key", args.script_ai_api_key)) if v}
    demo = gradio_app.VibeVoiceDemo(load_on_demand=True,
                                    script_ai_overrides=overrides)
    assert demo.script_ai.config.base_url == "http://flag:9/v1"
    assert demo.script_ai.config.model == "flag-model"


def test_script_ai_env_aliases(monkeypatch):
    """SCRIPT_AI_* names (reference README:106-120) outrank OPENAI_*."""
    from vibevoice_tpu.apps.script_ai import ScriptAIConfig
    monkeypatch.setenv("OPENAI_BASE_URL", "http://openai:1/v1")
    monkeypatch.setenv("SCRIPT_AI_URL", "http://scriptai:2/v1")
    monkeypatch.setenv("SCRIPT_AI_MODEL", "gemini-2.5-flash")
    cfg = ScriptAIConfig.from_env()
    assert cfg.base_url == "http://scriptai:2/v1"
    assert cfg.model == "gemini-2.5-flash"


def test_headless_ui_construction_and_callbacks(tmp_path, monkeypatch):
    """create_demo_interface runs end to end on the vendored gradio stub:
    every component constructs, every handler wires, and the non-generation
    callbacks (speaker visibility, clear log, save log, load example) work
    when invoked the way gradio would."""
    from vibevoice_tpu.apps import gradio_app
    from vibevoice_tpu.apps.gradio_app import VibeVoiceDemo

    monkeypatch.chdir(tmp_path)
    os.makedirs("examples/text_examples")
    with open("examples/text_examples/2p_test.txt", "w") as f:
        f.write("Speaker 1: hi\nSpeaker 2: hello\n")
    demo = VibeVoiceDemo(load_on_demand=True)
    ui = gradio_app.build_ui_headless(demo)

    assert len(ui.components) > 20
    events = {}
    for comp in ui.components:
        for ev, fn, ins, outs in comp.events:
            events[(comp.label or comp.args[0] if comp.args else None, ev)] = \
                (fn, ins, outs)
    # all wirings present (generate, stop, script-AI, regenerate, example,
    # speakers, clear/save log, refresh voices, load model)
    assert len(ui.handlers()) == 10

    # per-speaker visibility follows the slider
    fn, _, outs = events[("Speakers", "change")]
    ups = fn(4)
    assert [u["visible"] for u in ups] == [True] * 4
    assert [u["visible"] for u in fn(1)] == [True, False, False, False]
    assert len(outs) == 4

    # save-log handler writes the session log and reveals the file widget
    demo.log("hello from the test")
    fn, _, _ = events[("💾 Download log", "click")]
    up = fn()
    assert up["visible"] and os.path.exists(up["value"])
    assert "hello from the test" in open(up["value"]).read()

    # example loader fills script + speaker count
    fn, _, _ = events[("📄 Load example", "click")]
    script, k = fn("2p_test")
    assert k == 2 and "Speaker 2: hello" in script

    # clear-log empties the panel
    fn, _, _ = events[("🧹 Clear log", "click")]
    assert fn() == "" and demo.log_text == ""

    # refresh-voices rescans the library into all four dropdowns
    os.makedirs("custom_voices", exist_ok=True)
    with open("custom_voices/new_voice.npy", "wb") as f:
        np.save(f, np.zeros(16, np.float32))
    fn, _, outs = events[("🔄 Refresh voices", "click")]
    ups = fn()
    assert len(ups) == len(outs) == 4
    assert "custom/new_voice" in ups[0]["choices"]


def test_generation_settings_persistence(tmp_path, monkeypatch):
    """Settings saved by one app session initialize the next session's UI
    widgets (SettingsStore round-trip through the JSON file)."""
    from vibevoice_tpu.apps import gradio_app
    from vibevoice_tpu.apps.gradio_app import SettingsStore, VibeVoiceDemo

    monkeypatch.chdir(tmp_path)
    s = SettingsStore()
    assert s.get("cfg_scale") == 1.6                      # defaults
    s.save(cfg_scale=2.2, diffusion_steps=20, num_speakers=3, custom_key="x")

    demo = VibeVoiceDemo(load_on_demand=True)             # fresh "session"
    assert demo.settings.get("cfg_scale") == 2.2
    assert demo.settings.get("custom_key") == "x"         # unknown keys kept
    ui = gradio_app.build_ui_headless(demo)
    assert ui.find("CFG scale").value == 2.2
    assert ui.find("Diffusion steps").value == 20
    assert ui.find("Speakers").value == 3
    # 3 speakers -> three visible voice cards at construction
    vis = [c.visible for c in ui.components if (c.label or "").startswith("Voice ")]
    assert vis == [True, True, True, False]


def test_generate_handler_routes_tagged_stream(tmp_path, monkeypatch):
    """The generate handler clears both audio widgets first, streams
    incremental chunks to the streaming widget, and routes the final
    concatenated render to the separate complete-audio widget (reference
    two-widget layout + clear_audio_outputs, main.py:2442-2465, 2656-2668)."""
    import numpy as np
    from vibevoice_tpu.apps import gradio_app
    from vibevoice_tpu.apps.gradio_app import VibeVoiceDemo

    monkeypatch.chdir(tmp_path)
    demo = VibeVoiceDemo(load_on_demand=True)
    ui = gradio_app.build_ui_headless(demo)

    chunk = np.zeros(8, np.int16)
    full = np.ones(16, np.int16)

    def fake_stream(*a, tagged=False, **k):
        assert tagged
        yield ("chunk", 24000, chunk)
        yield ("chunk", 24000, chunk)
        yield ("final", 24000, full)

    demo.generate_podcast_streaming = fake_stream
    gen_fn = next(fn for c in ui.components for ev, fn, ins, outs in c.events
                  if (c.args and c.args[0] == "🎧 Generate podcast"))
    ys = list(gen_fn("VibeVoice-1.5B", 2, "Speaker 1: hi", None, None, None,
                     None, 1.3, False, 0.9, 0.9, 0, 5, False, ""))
    # first yield clears both widgets; middle yields stream chunks and leave
    # the complete widget untouched; last yield parks the stream and delivers
    # the full render
    assert ys[0][0] is None and ys[0][1] is None
    assert ys[1][0] == (24000, chunk) or ys[1][0][1] is chunk
    assert isinstance(ys[1][1], dict)          # gr.update() passthrough
    assert ys[-1][0] is None
    assert ys[-1][1][1] is full
    assert "2-speaker session" in ys[0][2]
