"""Gradio podcast-generation app (flagship UI).

Behavioral port of the reference's flagship demo (reference: main.py:1-3150)
to the TPU stack: model manager with load-on-demand, voice library with
recursive custom_voices scan (main.py:560-658), RMS voice normalization
(main.py:683-727), streaming generation with chunk buffering (main.py:729-1135),
Script-AI generation (apps/script_ai.py), stop control, 16-bit conversion
(main.py:2956-2979), CLI (main.py:2982-3065) and the --share security gate
(main.py:3072-3094).

The UI itself requires `gradio` (not bundled in this image); everything below
`VibeVoiceDemo` is importable and testable without it.
"""

from __future__ import annotations

import argparse
import os
import threading
import time
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..processor.audio import read_wav, resample
from ..streamer import AudioStreamer
from .model_manager import ModelManager
from .script_ai import ScriptAIClient

SAMPLE_RATE = 24000
VOICE_EXTS = (".wav", ".mp3", ".flac", ".m4a", ".ogg", ".npy", ".pt")


def convert_to_16_bit_wav(data: np.ndarray) -> np.ndarray:
    """float -> int16 with peak guard (reference main.py:2956-2979)."""
    data = np.asarray(data, np.float32).reshape(-1)
    peak = np.abs(data).max() if data.size else 0.0
    if peak > 1.0:
        data = data / peak
    try:
        from ..runtime.audio_runtime import native_f32_to_i16
        return native_f32_to_i16(data)
    except Exception:  # noqa: BLE001
        return (np.clip(data, -1, 1) * 32767.0).astype(np.int16)


class VoiceLibrary:
    """Voice presets: voices/ + recursive custom_voices/ scan
    (reference main.py:560-658)."""

    def __init__(self, voices_dir: Optional[str] = None,
                 custom_dir: str = "custom_voices"):
        if voices_dir is None:
            voices_dir = next((d for d in ("voices", "examples/voices")
                               if os.path.isdir(d)), "voices")
        self.voices_dir = voices_dir
        self.custom_dir = custom_dir
        self.presets: Dict[str, str] = {}
        self.refresh()

    def refresh(self) -> None:
        self.presets = {}
        if os.path.isdir(self.voices_dir):
            for f in sorted(os.listdir(self.voices_dir)):
                if f.lower().endswith(VOICE_EXTS):
                    self.presets[os.path.splitext(f)[0]] = os.path.join(self.voices_dir, f)
        if os.path.isdir(self.custom_dir):
            for root, _, files in os.walk(self.custom_dir):
                for f in sorted(files):
                    if f.lower().endswith(VOICE_EXTS):
                        rel = os.path.relpath(os.path.join(root, f), self.custom_dir)
                        name = "custom/" + os.path.splitext(rel)[0].replace(os.sep, "/")
                        self.presets[name] = os.path.join(root, f)

    def names(self) -> List[str]:
        return list(self.presets.keys())

    def load_voice(self, name_or_path: str, normalize_rms: bool = False,
                   target_rms: float = 0.1) -> np.ndarray:
        path = self.presets.get(name_or_path, name_or_path)
        if path.endswith(".wav"):
            audio, sr = read_wav(path)
            if audio.ndim > 1:
                audio = audio.mean(axis=-1)
            if sr != SAMPLE_RATE:
                audio = resample(audio, sr, SAMPLE_RATE)
        elif path.endswith(".npy"):
            audio = np.load(path).astype(np.float32)
        else:
            from ..processor.audio import VibeVoiceAudioProcessor
            audio = VibeVoiceAudioProcessor(normalize_audio=False)._load_audio_from_path(path)
        audio = audio.astype(np.float32)
        if normalize_rms:
            rms = float(np.sqrt(np.mean(audio ** 2)) + 1e-9)
            audio = audio * (target_rms / rms)  # main.py:683-727
        return audio


class ExampleLibrary:
    """Example-script loader (reference demo/gradio_demo.py:584-630): scans a
    text_examples directory, skips scripts whose filename advertises a
    duration over 15 minutes ("...45min.txt"), counts speakers."""

    def __init__(self, examples_dir: Optional[str] = None,
                 max_minutes: int = 15):
        import re
        if examples_dir is None:
            for cand in ("examples/text_examples", "text_examples"):
                if os.path.isdir(cand):
                    examples_dir = cand
                    break
        self.examples_dir = examples_dir
        self.max_minutes = max_minutes
        self.examples: List[tuple] = []   # (name, num_speakers, script)
        if examples_dir and os.path.isdir(examples_dir):
            for f in sorted(os.listdir(examples_dir)):
                if not f.lower().endswith(".txt"):
                    continue
                m = re.search(r"(\d+)min", f.lower())
                if m and int(m.group(1)) > max_minutes:
                    continue
                try:
                    with open(os.path.join(examples_dir, f), encoding="utf-8") as fh:
                        script = "\n".join(l for l in fh.read().splitlines()
                                           if l.strip())
                except OSError:
                    continue
                if not script:
                    continue
                speakers = {m2.group(1) for m2 in
                            re.finditer(r"(?im)^\s*speaker\s+(\d+)\s*:", script)}
                self.examples.append((os.path.splitext(f)[0],
                                      max(len(speakers), 1), script))

    def names(self) -> List[str]:
        return [n for n, _, _ in self.examples]

    def get(self, name: str):
        for n, k, s in self.examples:
            if n == name:
                return k, s
        return None


class SettingsStore:
    """Generation-settings persistence: the UI's knobs (cfg scale, diffusion
    steps, sampling params, ...) survive app restarts via a small JSON file.
    Unknown keys are preserved so older/newer app versions can share a file."""

    DEFAULTS = {"cfg_scale": 1.6, "diffusion_steps": 10, "do_sample": True,
                "temperature": 0.95, "top_p": 0.95, "top_k": 0,
                "normalize_voices": False, "num_speakers": 2}

    def __init__(self, path: Optional[str] = None):
        self.path = path or os.path.join("outputs", "ui_settings.json")
        self.values = dict(self.DEFAULTS)
        self.load()

    def load(self) -> dict:
        import json
        try:
            with open(self.path, encoding="utf-8") as f:
                stored = json.load(f)
            if isinstance(stored, dict):
                self.values.update(stored)
        except (OSError, ValueError):
            pass
        return self.values

    def save(self, **updates) -> None:
        import json
        self.values.update(updates)
        try:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "w", encoding="utf-8") as f:
                json.dump(self.values, f, indent=2)
        except OSError:
            pass  # settings persistence is best-effort

    def get(self, key: str):
        return self.values.get(key, self.DEFAULTS.get(key))


class VibeVoiceDemo:
    """Generation orchestration shared by the UI and headless callers."""

    def __init__(self, model_name: str = "VibeVoice-1.5B",
                 checkpoints_dir: Optional[str] = None,
                 inference_steps: int = 10, load_on_demand: bool = False,
                 quantize: bool = False, debug: bool = False,
                 script_ai_overrides: Optional[dict] = None):
        self.manager = ModelManager(checkpoints_dir=checkpoints_dir,
                                    load_on_demand=load_on_demand,
                                    quantize=quantize, ddpm_steps=inference_steps,
                                    debug=debug, log_fn=self.log)
        self.model_name = model_name
        self.voices = VoiceLibrary()
        self.examples = ExampleLibrary()
        from .script_ai import ScriptAIConfig
        self.script_ai = ScriptAIClient(
            config=ScriptAIConfig.from_env(script_ai_overrides), debug=debug)
        self.debug = debug
        self.stop_generation = False
        self.is_generating = False
        self._log_lines: List[str] = []
        self.settings = SettingsStore()

    # -- streaming log (reference main.py:808-810, 2469-2475) -----------------
    def log(self, msg: str) -> None:
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        self._log_lines.append(line)
        self._log_lines = self._log_lines[-200:]
        if self.debug:
            print(line)

    @property
    def log_text(self) -> str:
        return "\n".join(self._log_lines)

    def save_log(self, path: Optional[str] = None) -> str:
        """Write the session log to a file and return its path (the UI's
        'download log' action; headless callers get the same artifact)."""
        if path is None:
            os.makedirs("outputs", exist_ok=True)
            path = os.path.join(
                "outputs", f"session_log_{time.strftime('%Y%m%d_%H%M%S')}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(self.log_text + ("\n" if self._log_lines else ""))
        return path

    # -- streaming generation (main.py:729-1135) -------------------------------
    def generate_podcast_streaming(self, num_speakers: int, script: str,
                                   speaker_voices: List[str], cfg_scale: float = 1.6,
                                   do_sample: bool = True, temperature: float = 0.95,
                                   top_p: float = 0.95, top_k: int = 0,
                                   negative_prompt: str = "",
                                   diffusion_steps: Optional[int] = None,
                                   normalize_voices: bool = False,
                                   min_yield_seconds: float = 2.0,
                                   tagged: bool = False,
                                   ) -> Iterator[tuple]:
        """Yields (sample_rate, int16 chunk) tuples; final yield is the full
        audio. Mirrors the chunk-buffering policy of main.py:913-999.

        With ``tagged=True`` yields ("chunk"|"final", sample_rate, data)
        instead, so a UI can route incremental chunks to a streaming widget
        and the final concatenated audio to a separate complete-audio widget
        (the reference's two-widget layout, main.py:2442-2465)."""
        def _emit(kind, sr, data):
            return (kind, sr, data) if tagged else (sr, data)
        self.stop_generation = False
        self.is_generating = True
        try:
            self.log(f"Loading model {self.model_name}...")
            model = self.manager.ensure_loaded(self.model_name)
            if diffusion_steps:
                model.generator.set_ddpm_inference_steps(diffusion_steps)

            voice_wavs = [self.voices.load_voice(v, normalize_rms=normalize_voices)
                          for v in speaker_voices[:num_speakers]] or None
            inputs = model.processor(script, voice_samples=voice_wavs)
            self.log(f"Prompt: {inputs['input_ids'].shape[1]} tokens, "
                     f"{num_speakers} speaker(s)")

            # custom negative prompt for CFG (reference main.py:1177-1198)
            negative_ids = None
            if negative_prompt.strip():
                try:
                    negative_ids = np.asarray(
                        [model.processor.tokenizer.encode(negative_prompt)])
                    self.log(f"Negative prompt: {negative_ids.shape[1]} tokens")
                except Exception as e:  # noqa: BLE001
                    self.log(f"Negative prompt tokenization failed: {e}")

            streamer = AudioStreamer(batch_size=1)
            err: List[Exception] = []

            def run():
                try:
                    model.generator.generate(
                        inputs["input_ids"], attention_mask=inputs["attention_mask"],
                        speech_tensors=inputs["speech_tensors"],
                        speech_masks=inputs["speech_masks"],
                        speech_input_mask=inputs["speech_input_mask"],
                        cfg_scale=cfg_scale, do_sample=do_sample,
                        temperature=temperature, top_p=top_p, top_k=int(top_k),
                        negative_prompt_ids=negative_ids,
                        audio_streamer=streamer,
                        stop_check_fn=lambda: self.stop_generation,
                        # small first chunks -> fast first audio; big chunks
                        # afterwards -> steady-state throughput
                        chunk_steps=8, chunk_steps_max=64)
                except Exception as e:  # noqa: BLE001
                    err.append(e)
                finally:
                    streamer.end()  # never leave the UI hanging (main.py:1205-1209)

            thread = threading.Thread(target=run, daemon=True)
            thread.start()

            buffered: List[np.ndarray] = []
            buffered_samples = 0
            last_yield = time.time()
            all_chunks: List[np.ndarray] = []
            for chunk in streamer.get_stream(0):
                if self.stop_generation:
                    break
                buffered.append(chunk)
                all_chunks.append(chunk)
                buffered_samples += len(chunk)
                if (buffered_samples >= min_yield_seconds * SAMPLE_RATE
                        or time.time() - last_yield > 15.0):
                    yield _emit("chunk", SAMPLE_RATE,
                                convert_to_16_bit_wav(np.concatenate(buffered)))
                    buffered, buffered_samples = [], 0
                    last_yield = time.time()
            if buffered:
                yield _emit("chunk", SAMPLE_RATE,
                            convert_to_16_bit_wav(np.concatenate(buffered)))

            thread.join(timeout=30.0)
            if err:
                self.log(f"Generation failed: {err[0]}")
                raise err[0]
            if all_chunks:
                total = sum(len(c) for c in all_chunks) / SAMPLE_RATE
                m = getattr(model.generator, "last_metrics", {}) or {}
                gt = m.get("generate_total", {}).get("total_s")
                self.log(f"Done: {total:.1f}s audio"
                         + (f" in {gt:.1f}s (RTF {total / gt:.2f})" if gt else ""))
                yield _emit("final", SAMPLE_RATE,
                            convert_to_16_bit_wav(np.concatenate(all_chunks)))
        finally:
            self.is_generating = False
            self.manager.after_generate()

    def stop(self) -> None:
        self.stop_generation = True

    def generate_script(self, topic: str, num_speakers: int, minutes: float) -> str:
        # remember the request so the UI can regenerate without retyping
        # (reference main.py regenerate_last behavior)
        self.last_script_request = (topic, num_speakers, minutes)
        return self.script_ai.generate_script(topic, num_speakers, minutes)

    def regenerate_script(self) -> str:
        """Re-run the last Script-AI request (reference main.py:2735-2797)."""
        req = getattr(self, "last_script_request", None)
        if req is None:
            return ""
        return self.script_ai.generate_script(*req)


# ---------------------------------------------------------------------------
# UI (requires gradio)
# ---------------------------------------------------------------------------

def build_ui_headless(demo: VibeVoiceDemo):
    """Construct the full UI without serving it: real gradio when installed,
    the vendored `gradio_stub` otherwise.  Executes every component
    constructor and event wiring — the --check smoke path and what the UI
    tests drive."""
    try:
        import gradio  # noqa: F401
    except ImportError:
        from . import gradio_stub
        gradio_stub._install()
    return create_demo_interface(demo)


# Original dark theme (covers the reference's custom-CSS row,
# main.py:1936-2130, with our own design — gradients, cards, soft focus
# rings — rather than the reference's stylesheet).
CUSTOM_CSS = """
:root {
  --vv-bg: #10131a; --vv-panel: #181c26; --vv-edge: #2a3142;
  --vv-ink: #e8ebf2; --vv-dim: #9aa3b5; --vv-accent: #5eb0ff;
  --vv-accent2: #9f7bff;
}
.gradio-container {
  background: linear-gradient(165deg, var(--vv-bg) 0%, #141925 60%, #101722 100%);
  color: var(--vv-ink);
}
.vv-header {
  padding: 18px 22px; border-radius: 14px; margin-bottom: 10px;
  background: linear-gradient(100deg, rgba(94,176,255,.14), rgba(159,123,255,.10));
  border: 1px solid var(--vv-edge);
}
.vv-header h1 { margin: 0; font-size: 1.5rem; letter-spacing: .3px; }
.vv-header p { margin: 4px 0 0; color: var(--vv-dim); }
.vv-scene {
  padding: 8px 14px; border-left: 3px solid var(--vv-accent);
  border-radius: 6px; background: rgba(94,176,255,.07);
  color: var(--vv-ink); font-weight: 600; min-height: 1.2em;
}
.vv-footer { text-align: center; color: var(--vv-dim); font-size: .85rem;
  margin-top: 14px; border-top: 1px solid var(--vv-edge); padding-top: 8px; }
button.primary { background: linear-gradient(90deg, var(--vv-accent), var(--vv-accent2)) !important; }
.block, .form, .panel { border-color: var(--vv-edge) !important; }
*:focus-visible { outline: 2px solid var(--vv-accent) !important; }
"""

HEADER_HTML = """
<div class="vv-header">
  <h1>🎙️ VibeVoice-TPU</h1>
  <p>Long-form multi-speaker text-to-speech, served from a TPU mesh —
     streaming audio, voice prompts, Script-AI drafting.</p>
</div>
"""

FOOTER_HTML = """
<div class="vv-footer">VibeVoice-TPU · JAX/XLA/Pallas serving stack ·
audio is synthetic — label it as such when you publish it.</div>
"""

USAGE_TIPS_MD = """
**Tips**
- One line per turn, `Speaker 1: …` through `Speaker 4: …`; the speaker
  slider controls how many voice cards are active.
- Voice prompts are optional — drop `.wav` files into `voices/` or
  `custom_voices/` and hit *Refresh voices*.
- Lower *CFG scale* = freer delivery; higher = closer to the prompt voice.
- *Diffusion steps* trades audio fidelity for speed (5 is the serving
  default, 10+ for final renders).
- Long scripts stream as they render — the complete file lands in the
  *Complete audio* widget when generation finishes.
"""


def create_demo_interface(demo: VibeVoiceDemo):
    import gradio as gr

    def status_text() -> str:
        import jax
        cur = demo.manager.current
        loaded = (f"{cur.name}" + (f" ({cur.quantized})" if cur.quantized else "")
                  if cur else "none (load on demand)")
        return (f"**Model:** {loaded} · **Device:** {jax.devices()[0].platform} "
                f"× {len(jax.devices())} · "
                f"**Offline:** {'yes' if demo.manager.offline else 'no'}")

    s = demo.settings
    with gr.Blocks(title="VibeVoice-TPU", theme=gr.themes.Soft(),
                   css=CUSTOM_CSS) as ui:
        gr.HTML(HEADER_HTML)
        status_md = gr.Markdown(status_text())
        scene_html = gr.HTML("", elem_classes=["vv-scene"])
        with gr.Row():
            with gr.Column():
                model_dd = gr.Dropdown(demo.manager.available_models(),
                                       value=demo.model_name, label="Model")
                num_speakers = gr.Slider(1, 4, value=s.get("num_speakers"),
                                         step=1, label="Speakers")
                voice_dds = [gr.Dropdown(demo.voices.names() or ["(none)"],
                                         label=f"Voice {i + 1}",
                                         visible=i < int(s.get("num_speakers")))
                             for i in range(4)]
                refresh_voices_btn = gr.Button("🔄 Refresh voices", size="sm")
                load_model_btn = gr.Button("📦 Load model", size="sm")
                cfg_scale = gr.Slider(1.0, 3.0, value=s.get("cfg_scale"),
                                      step=0.05, label="CFG scale")
                steps = gr.Slider(5, 30, value=s.get("diffusion_steps"),
                                  step=1, label="Diffusion steps")
                do_sample = gr.Checkbox(value=s.get("do_sample"),
                                        label="Sample (vs greedy)")
                temperature = gr.Slider(0.1, 2.0, value=s.get("temperature"),
                                        step=0.05, label="Temperature")
                top_p = gr.Slider(0.1, 1.0, value=s.get("top_p"), step=0.01,
                                  label="Top-p")
                top_k = gr.Slider(0, 50, value=s.get("top_k"), step=1,
                                  label="Top-k (0 = off)")
                norm_voices = gr.Checkbox(value=s.get("normalize_voices"),
                                          label="Normalize voice RMS")
                negative_box = gr.Textbox(
                    label="Negative prompt (CFG steers away from this)",
                    placeholder="optional")
            with gr.Column():
                example_dd = gr.Dropdown(demo.examples.names() or ["(none)"],
                                         label="Example scripts")
                load_example_btn = gr.Button("📄 Load example")
                topic = gr.Textbox(label="Script AI topic (optional)")
                gen_script_btn = gr.Button("✨ Generate script with AI")
                regen_script_btn = gr.Button("♻️ Regenerate last script",
                                             size="sm")
                script_box = gr.Textbox(lines=12, label="Script (Speaker N: ...)")
                gen_btn = gr.Button("🎧 Generate podcast", variant="primary")
                stop_btn = gr.Button("⏹ Stop")
                audio_out = gr.Audio(label="Streaming audio", streaming=True,
                                     autoplay=True)
                complete_audio = gr.Audio(label="Complete audio",
                                          streaming=False)
                log_out = gr.Textbox(label="Log", lines=8)
                with gr.Row():
                    clear_log_btn = gr.Button("🧹 Clear log", size="sm")
                    save_log_btn = gr.Button("💾 Download log", size="sm")
                log_file = gr.File(label="Session log", visible=False)
        with gr.Accordion("💡 Usage tips", open=False):
            gr.Markdown(USAGE_TIPS_MD)
        gr.HTML(FOOTER_HTML)

        def scene_title(n, script):
            first = next((ln.strip() for ln in (script or "").splitlines()
                          if ln.strip()), "")
            if len(first) > 70:
                first = first[:67] + "…"
            return f"🎬 {int(n)}-speaker session — {first}" if first else ""

        def on_generate(model_name, n, script, v1, v2, v3, v4, cfg, st, temp,
                        tp, tk, ds, nv, neg):
            demo.model_name = model_name
            # settings persist across app restarts (SettingsStore)
            demo.settings.save(num_speakers=int(n), cfg_scale=float(cfg),
                               do_sample=bool(st), temperature=float(temp),
                               top_p=float(tp), top_k=int(tk),
                               diffusion_steps=int(ds),
                               normalize_voices=bool(nv))
            voices = [v for v in (v1, v2, v3, v4) if v and v != "(none)"]
            scene = scene_title(n, script)
            final = None
            # clear both audio widgets before the new render (reference
            # clear_audio_outputs, main.py:2656-2668)
            yield None, None, scene, demo.log_text, status_text()
            # tagged stream: incremental chunks feed the streaming widget,
            # the final concatenated render lands in the complete-audio
            # widget (reference two-widget layout, main.py:2442-2465)
            for kind, sr, data in demo.generate_podcast_streaming(
                    int(n), script, voices, cfg_scale=cfg, do_sample=st,
                    temperature=temp, top_p=tp, top_k=int(tk),
                    negative_prompt=neg or "",
                    diffusion_steps=int(ds), normalize_voices=nv,
                    tagged=True):
                if kind == "final":
                    final = (sr, data)
                else:
                    yield ((sr, data), gr.update(), scene, demo.log_text,
                           status_text())
            yield None, final, scene, demo.log_text, status_text()

        def on_load_example(name):
            ex = demo.examples.get(name)
            if ex is None:
                return gr.update(), gr.update()
            k, script = ex
            return script, k

        def on_num_speakers(n):
            # per-speaker voice cards appear/disappear with the slider
            # (reference main.py speaker-section visibility behavior)
            return [gr.update(visible=i < int(n)) for i in range(4)]

        def on_clear_log():
            demo._log_lines = []
            return ""

        gen_btn.click(on_generate,
                      [model_dd, num_speakers, script_box, *voice_dds,
                       cfg_scale, do_sample, temperature, top_p, top_k, steps,
                       norm_voices, negative_box],
                      [audio_out, complete_audio, scene_html, log_out,
                       status_md])
        stop_btn.click(lambda: demo.stop())
        gen_script_btn.click(
            lambda t, n: demo.generate_script(t, int(n), 2.0),
            [topic, num_speakers], [script_box])
        load_example_btn.click(on_load_example, [example_dd],
                               [script_box, num_speakers])
        def on_save_log():
            return gr.update(value=demo.save_log(), visible=True)

        def on_refresh_voices():
            # pick up wavs dropped into voices/ or custom_voices/ while the
            # app is running (reference main.py refresh_voices)
            demo.voices.refresh()
            names = demo.voices.names() or ["(none)"]
            return [gr.update(choices=names) for _ in range(4)]

        def on_load_model(model_name):
            demo.model_name = model_name
            try:
                demo.manager.ensure_loaded(model_name)
            except Exception as e:  # noqa: BLE001 — surfaced in the log panel
                demo.log(f"Model load failed: {e}")
            return demo.log_text, status_text()

        num_speakers.change(on_num_speakers, [num_speakers], voice_dds)
        clear_log_btn.click(on_clear_log, [], [log_out])
        save_log_btn.click(on_save_log, [], [log_file])
        refresh_voices_btn.click(on_refresh_voices, [], voice_dds)
        load_model_btn.click(on_load_model, [model_dd], [log_out, status_md])
        regen_script_btn.click(lambda: demo.regenerate_script(), [],
                               [script_box])
    return ui


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="VibeVoice-TPU gradio app")
    p.add_argument("--model", default="VibeVoice-1.5B")
    p.add_argument("--checkpoints-dir", "--checkpoints_dir", default=None)
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--share", action="store_true")
    p.add_argument("--lod", action="store_true", help="load model on demand")
    p.add_argument("--quantize", nargs="?", const="int8", default="",
                   choices=["int8", "int4", "int4g"],
                   help="weight-only LM tier: bare flag or 'int8' (quality "
                        "default), 'int4' (per-column speed tier), 'int4g' "
                        "(group-16 fidelity)")
    p.add_argument("--inference-steps", type=int, default=10)
    p.add_argument("--debug", action="store_true")
    # Script-AI CLI overrides (precedence: defaults < .env < env < CLI;
    # reference main.py:3037-3053, 1357-1380)
    p.add_argument("--script-ai-url", "--script_ai_url", dest="script_ai_url",
                   default=None, help="OpenAI-compatible base URL for script "
                   "generation (e.g. http://localhost:11434/v1)")
    p.add_argument("--script-ai-model", "--script_ai_model",
                   dest="script_ai_model", default=None)
    p.add_argument("--script-ai-api-key", "--script_ai_api_key",
                   dest="script_ai_api_key", default=None)
    p.add_argument("--offline", action="store_true",
                   help="never download checkpoints (HF_HUB_OFFLINE analogue)")
    p.add_argument("--check", action="store_true",
                   help="construct the app headlessly and exit (smoke test)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.share:
        # security gate (reference main.py:3072-3094)
        ack = os.environ.get("VIBEVOICE_ALLOW_SHARE", "")
        if ack != "1":
            raise SystemExit(
                "--share exposes this machine publicly. Set "
                "VIBEVOICE_ALLOW_SHARE=1 to confirm you understand the risk.")
    overrides = {k: v for k, v in (("base_url", args.script_ai_url),
                                   ("model", args.script_ai_model),
                                   ("api_key", args.script_ai_api_key)) if v}
    demo = VibeVoiceDemo(model_name=args.model, checkpoints_dir=args.checkpoints_dir,
                         inference_steps=args.inference_steps,
                         load_on_demand=args.lod, quantize=args.quantize,
                         debug=args.debug, script_ai_overrides=overrides or None)
    if args.offline:
        demo.manager.offline = True
    if args.check:
        print(f"models: {demo.manager.available_models()}")
        print(f"voices: {len(demo.voices.names())} preset(s)")
        print(f"examples: {demo.examples.names()}")
        print(f"offline: {demo.manager.offline}")
        ui = build_ui_headless(demo)
        n_comp = len(getattr(ui, "components", []))
        n_ev = len(ui.handlers()) if hasattr(ui, "handlers") else "n/a"
        print(f"ui: constructed ({n_comp or 'gradio'} components, "
              f"{n_ev} handlers)")
        print("check ok")
        return
    ui = create_demo_interface(demo)
    ui.queue().launch(server_name=args.host, server_port=args.port,
                      share=args.share)


if __name__ == "__main__":
    main()
