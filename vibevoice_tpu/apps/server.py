"""Production serving daemon: OpenAI-style TTS REST API.

The reference serves only through Gradio (reference: main.py:2982-3150);
this adds the missing production surface: a dependency-free HTTP server
(stdlib ``http.server``) exposing

  POST /v1/audio/speech   — generate speech from a script
                            body: {"input": "Speaker 1: ...", "voices": [...],
                                   "cfg_scale", "ddpm_steps", "seed",
                                   "do_sample", "temperature", "top_p",
                                   "top_k", "negative_prompt",
                                   "max_length_times", "stream": bool}
                            returns audio/wav (complete file, or chunked
                            streaming WAV when "stream" is true — audio
                            starts flowing at time-to-first-chunk)
  POST /v1/tts/stream_batch — multiplexed async batch: {"inputs": [...]}
                            runs ONE device batch and streams NDJSON frames
                            {"i", "sr", "samples", "pcm16"(b64)} as each
                            sample's chunks land (AsyncAudioBatchIterator),
                            ending with {"done", "results"}
  GET  /v1/voices          — voice presets (examples/voices + custom_voices)
  GET  /v1/models          — model registry + loaded state
  GET  /v1/metrics         — served/batch counters + per-stage times of the
                             last generation (StageTimer summary)
  GET  /healthz            — liveness + device info

Design: requests enqueue into a single-worker generation queue — the TPU is
a single-stream device, and the fused generation step already batches the
CFG pair.  **Dynamic batching**: queued requests with identical generation
settings (same `batch_key`) coalesce, within a short window, into one device
batch of up to --max_batch samples — the decode step is weight-bandwidth-
bound, so batch-mates ride the same HBM reads (~86% linear aggregate-RTF
scaling at batch 4).  Each response streams its own sample from the shared
AudioStreamer; a client disconnect ends only that sample's stream, which the
generation loop turns into a per-sample abort (generation/generate.py
apply_external_ends) — batch-mates keep generating.

Security: binds 127.0.0.1 unless --host is given explicitly (the share-gate
spirit of reference main.py:3072-3094).
"""

from __future__ import annotations

import json
import queue
import struct
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

from ..streamer import AudioStreamer
from .gradio_app import VoiceLibrary, convert_to_16_bit_wav
from .model_manager import MODEL_REGISTRY, ModelManager

SAMPLE_RATE = 24000


def wav_header(n_samples: int, sample_rate: int = SAMPLE_RATE,
               streaming: bool = False) -> bytes:
    """16-bit mono PCM WAV header.  Streaming mode uses the 0xFFFFFFFF
    unknown-length convention (players treat it as 'read until EOF')."""
    data_bytes = 0xFFFFFFFF - 36 if streaming else n_samples * 2
    riff_size = 0xFFFFFFFF if streaming else 36 + data_bytes
    return (b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                    sample_rate * 2, 2, 16)
            + b"data" + struct.pack("<I", data_bytes))


def pcm16(chunk: np.ndarray) -> bytes:
    return convert_to_16_bit_wav(np.asarray(chunk)).astype("<i2").tobytes()


@dataclass
class Job:
    """One queued generation request."""
    request: dict
    streamer: Optional[AudioStreamer] = None   # assigned by the worker
    async_streamer: Optional[object] = None    # multiplexed async-batch jobs
    sample_index: int = 0
    assigned: threading.Event = field(default_factory=threading.Event)
    done: threading.Event = field(default_factory=threading.Event)
    error: Optional[str] = None
    result: Optional[dict] = None
    finalize: Optional[object] = None          # callable run after done.wait()


# generation settings that must match for two requests to share one device
# batch (they are traced into / parameterize a single program)
_BATCH_KEY_FIELDS = ("model", "cfg_scale", "ddpm_steps", "do_sample",
                     "temperature", "top_p", "top_k", "negative_prompt",
                     "seed", "max_length_times", "max_new_tokens",
                     "chunk_steps", "chunk_steps_max")


def batch_key(request: dict) -> tuple:
    if "_stream_batch" in request:
        # multiplexed async-batch jobs already carry a full batch and run
        # solo; id(request) keeps two of them from being grouped
        return ("_stream_batch", id(request))
    return tuple(request.get(f) for f in _BATCH_KEY_FIELDS)


class ServingApp:
    """Model + voice state shared by the HTTP handlers and the worker."""

    def __init__(self, model_name: str = "VibeVoice-1.5B",
                 quantize: bool = False, ddpm_steps: int = 10,
                 load_on_demand: bool = False, offline: Optional[bool] = None,
                 voices_dir: Optional[str] = None, log_fn=print,
                 max_batch: int = 4, batch_window_s: float = 0.05, mesh=None,
                 engine: bool = False, engine_slots: int = 4,
                 engine_cache_len: int = 4096, engine_chunk_steps: int = 16,
                 engine_cfg_scale: float = 1.3):
        self.log = log_fn
        self.model_name = model_name
        self.manager = ModelManager(load_on_demand=load_on_demand,
                                    quantize=quantize, ddpm_steps=ddpm_steps,
                                    offline=offline, log_fn=log_fn, mesh=mesh)
        self.voices = VoiceLibrary(voices_dir=voices_dir)
        self.jobs: "queue.Queue[Job]" = queue.Queue()
        self.max_batch = max(1, int(max_batch))
        self.batch_window_s = batch_window_s
        self._backlog: List[Job] = []      # key-mismatched jobs, kept in order
        self.engine = None
        if engine:
            from ..generation.engine import ContinuousEngine
            model = self._load(model_name)
            self.engine = ContinuousEngine(
                model.generator, slots=engine_slots,
                cache_len=engine_cache_len, chunk_steps=engine_chunk_steps,
                cfg_scale=engine_cfg_scale, log_fn=log_fn)
            self.worker = threading.Thread(target=self.engine.run_forever,
                                           daemon=True)
        else:
            self.worker = threading.Thread(target=self._worker_loop,
                                           daemon=True)
        self.worker.start()
        self.started_at = time.time()
        self.served = 0
        self.batches = 0

    # -- tiny-model path for smoke tests / --check -------------------------
    def _load(self, name: str):
        if name == "tiny":
            if (self.manager.current is None
                    or self.manager.current.name != "tiny"):
                import jax
                import jax.numpy as jnp
                from ..config import VibeVoiceConfig
                from ..generation import VibeVoiceGenerator
                from ..models import vibevoice
                from ..processor import VibeVoiceProcessor
                from ..processor.text_tokenizer import ByteFallbackTokenizer
                from .model_manager import LoadedModel

                class _TinyTokenizer(ByteFallbackTokenizer):
                    """Small-id specials fitting the tiny config's 512-token
                    vocab (the real Qwen2 ids at ~151k would silently clamp);
                    speech_start aliased to the diffusion id so constant-
                    weight greedy decoding deterministically emits audio
                    (same device regime as bench.py)."""
                    eos_id = 256
                    bos_id = 256
                    speech_diffusion_id = 257
                    speech_start_id = 257   # alias -> every step diffuses
                    speech_end_id = 258
                    pad_id = 259

                cfg = VibeVoiceConfig.named("tiny")
                shapes = jax.eval_shape(
                    lambda k: vibevoice.init_params(k, cfg, jnp.float32),
                    jax.random.PRNGKey(0))
                params = jax.tree.map(
                    lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
                proc = VibeVoiceProcessor(tokenizer=_TinyTokenizer())
                gen = VibeVoiceGenerator(params, cfg, proc.tokenizer,
                                         ddpm_inference_steps=3,
                                         lm_dtype=jnp.float32,
                                         mesh=self.manager.mesh)
                self.manager.current = LoadedModel(
                    name="tiny", cfg=cfg, generator=gen, processor=proc)
            return self.manager.current
        return self.manager.load(name)

    # -- dynamic batching ---------------------------------------------------
    # Queued requests with identical generation settings coalesce into one
    # device batch (batch 4 runs at ~86% linear aggregate-RTF scaling — the
    # decode step is weight-bandwidth-bound, so the batch rides the same HBM
    # reads).  Mismatched requests wait in a backlog and run, in order, as
    # their own batches.
    def _next_job(self) -> Job:
        if self._backlog:
            return self._backlog.pop(0)
        return self.jobs.get()

    def _collect_batch(self) -> List[Job]:
        first = self._next_job()
        key = batch_key(first.request)
        batch = [first]
        # matching jobs already in the backlog join first (preserves order)
        rest = []
        for j in self._backlog:
            if len(batch) < self.max_batch and batch_key(j.request) == key:
                batch.append(j)
            else:
                rest.append(j)
        self._backlog = rest
        deadline = time.time() + self.batch_window_s
        while len(batch) < self.max_batch:
            tmo = deadline - time.time()
            if tmo <= 0:
                break
            try:
                j = self.jobs.get(timeout=tmo)
            except queue.Empty:
                break
            if batch_key(j.request) == key:
                batch.append(j)
            else:
                self._backlog.append(j)
        return batch

    def _worker_loop(self):
        while True:
            batch = self._collect_batch()
            try:
                self._run_batch(batch)
            except Exception as e:  # noqa: BLE001 — reported to the clients
                msg = f"{type(e).__name__}: {e}"
                for job in batch:
                    job.error = job.error or msg
                self.log(f"❌ generation failed: {msg}")
            finally:
                for job in batch:
                    if job.streamer is not None:
                        job.streamer.end([job.sample_index])
                    job.assigned.set()      # unblock handlers on early errors
                    job.done.set()
                self.manager.after_generate()

    def _run_batch(self, batch: List[Job]):
        if len(batch) == 1 and "_stream_batch" in batch[0].request:
            return self._run_stream_batch(batch[0])
        n = len(batch)
        streamer = AudioStreamer(batch_size=n)
        for i, job in enumerate(batch):
            job.streamer, job.sample_index = streamer, i
            job.assigned.set()

        req = batch[0].request        # batch-wide settings (same batch_key)
        model = self._load(req.get("model") or self.model_name)
        proc, gen = model.processor, model.generator

        scripts, voice_wavs, any_voice = [], [], False
        for job in batch:
            r = job.request
            scripts.append(r["input"])
            vs = r.get("voices") or ([r["voice"]] if r.get("voice") else [])
            wavs = [self.voices.load_voice(v) for v in vs] or None
            any_voice = any_voice or wavs is not None
            voice_wavs.append(wavs)
        inputs = proc(scripts, voice_samples=voice_wavs if any_voice else None)

        ddpm = req.get("ddpm_steps")
        if ddpm and int(ddpm) != gen.ddpm_steps:
            gen.set_ddpm_inference_steps(int(ddpm))
        neg = req.get("negative_prompt") or None
        t0 = time.perf_counter()
        out = gen.generate(
            inputs["input_ids"], attention_mask=inputs["attention_mask"],
            speech_tensors=inputs.get("speech_tensors"),
            speech_masks=inputs.get("speech_masks"),
            speech_input_mask=inputs.get("speech_input_mask"),
            cfg_scale=float(req.get("cfg_scale", 1.3)),
            do_sample=bool(req.get("do_sample", False)),
            temperature=float(req.get("temperature", 0.95)),
            top_p=float(req.get("top_p", 0.95)),
            top_k=int(req.get("top_k", 0)),
            negative_prompt_ids=(np.asarray([proc.tokenizer.encode(neg)])
                                 if neg else None),
            max_length_times=float(req.get("max_length_times", 2.0)),
            max_new_tokens=(int(req["max_new_tokens"])
                            if req.get("max_new_tokens") else None),
            seed=int(req.get("seed", 0)),
            chunk_steps=int(req.get("chunk_steps", 8)),
            chunk_steps_max=int(req.get("chunk_steps_max", 64)),
            audio_streamer=streamer)
        wall = time.perf_counter() - t0
        for i, job in enumerate(batch):
            wav = out.speech_outputs[i]
            audio_s = 0.0 if wav is None else len(wav) / SAMPLE_RATE
            job.result = {"tokens": int(out.sequences.shape[1]),
                          "audio_s": round(audio_s, 3),
                          "wall_s": round(wall, 3),
                          "rtf": round(audio_s / wall, 3) if wall > 0 else None,
                          "batch": n}
        self.served += n
        self.batches += 1
        self.log(f"🎧 served batch of {n}: "
                 f"{[j.result['audio_s'] for j in batch]} audio-s "
                 f"in {round(wall, 3)} s")

    def _run_stream_batch(self, job: Job):
        """One multiplexed async-batch job: N scripts generate as ONE device
        batch, chunks fan out through the handler's AsyncAudioStreamer
        (streamer.AsyncAudioBatchIterator — reference streamer.py:206-264).
        The streamer was created by the HTTP handler (it owns the event
        loop); generation runs here on the worker thread."""
        reqs = job.request["_stream_batch"]
        streamer = job.async_streamer
        job.assigned.set()
        try:
            req = dict(job.request)
            model = self._load(req.get("model") or self.model_name)
            proc, gen = model.processor, model.generator

            scripts, voice_wavs, any_voice = [], [], False
            for r in reqs:
                scripts.append(r["input"])
                vs = r.get("voices") or ([r["voice"]] if r.get("voice") else [])
                wavs = [self.voices.load_voice(v) for v in vs] or None
                any_voice = any_voice or wavs is not None
                voice_wavs.append(wavs)
            inputs = proc(scripts, voice_samples=voice_wavs if any_voice else None)
            ddpm = req.get("ddpm_steps")
            if ddpm and int(ddpm) != gen.ddpm_steps:
                gen.set_ddpm_inference_steps(int(ddpm))
            t0 = time.perf_counter()
            out = gen.generate(
                inputs["input_ids"], attention_mask=inputs["attention_mask"],
                speech_tensors=inputs.get("speech_tensors"),
                speech_masks=inputs.get("speech_masks"),
                speech_input_mask=inputs.get("speech_input_mask"),
                cfg_scale=float(req.get("cfg_scale", 1.3)),
                do_sample=bool(req.get("do_sample", False)),
                max_length_times=float(req.get("max_length_times", 2.0)),
                max_new_tokens=(int(req["max_new_tokens"])
                                if req.get("max_new_tokens") else None),
                seed=int(req.get("seed", 0)),
                chunk_steps=int(req.get("chunk_steps", 8)),
                chunk_steps_max=int(req.get("chunk_steps_max", 64)),
                audio_streamer=streamer)
            wall = time.perf_counter() - t0
            job.result = {"per_sample": [
                {"audio_s": (0.0 if w is None
                             else round(len(w) / SAMPLE_RATE, 3))}
                for w in out.speech_outputs],
                "tokens": int(out.sequences.shape[1]),
                "wall_s": round(wall, 3), "batch": len(reqs)}
            self.served += len(reqs)
            self.batches += 1
        finally:
            # generate() ends the streamer on success; on error this wakes
            # every queue so the handler's pump terminates
            streamer.end()

    # engine-wide generation settings; requests may only override the rest
    _ENGINE_FIXED = ("cfg_scale", "do_sample", "temperature", "top_p",
                     "top_k", "ddpm_steps", "chunk_steps")

    def _submit_engine(self, request: dict) -> Job:
        """Continuous-batching path: translate the HTTP request into an
        engine request that joins a live slot mid-flight."""
        job = Job(request=request)
        eng = self.engine
        for f in self._ENGINE_FIXED:
            # every fixed field lives on the engine except ddpm_steps, which
            # shapes the compiled diffusion scan on the engine's GENERATOR
            fixed = (eng.gen.ddpm_steps if f == "ddpm_steps"
                     else getattr(eng, f))
            if f in request and float(request[f]) != float(fixed):
                job.error = (f"'{f}' is engine-wide in --engine mode "
                             f"(fixed at server start)")
                job.assigned.set()
                job.streamer = AudioStreamer(batch_size=1)
                job.streamer.end()
                job.done.set()
                return job
        req_model = request.get("model")
        if req_model and req_model != self.model_name:
            job.error = (f"--engine serves '{self.model_name}' only "
                         f"(requested '{req_model}')")
            job.assigned.set()
            job.streamer = AudioStreamer(batch_size=1)
            job.streamer.end()
            job.done.set()
            return job
        model = self.manager.current
        proc = model.processor
        voices = request.get("voices") or (
            [request["voice"]] if request.get("voice") else [])
        wavs = [self.voices.load_voice(v) for v in voices] or None
        inputs = proc(request["input"], voice_samples=wavs)
        neg = request.get("negative_prompt") or None
        streamer = AudioStreamer(batch_size=1)
        t0 = time.perf_counter()
        req = eng.submit(
            inputs,
            max_new_tokens=(int(request["max_new_tokens"])
                            if request.get("max_new_tokens") else None),
            max_length_times=float(request.get("max_length_times", 2.0)),
            negative_prompt_ids=(np.asarray([proc.tokenizer.encode(neg)])
                                 if neg else None),
            seed=int(request.get("seed", 0)), streamer=streamer)
        job.streamer, job.sample_index = streamer, 0
        job.done = req.done
        job.assigned.set()

        ran = []

        def finalize():
            if ran:                      # idempotent (stream + complete paths)
                return
            ran.append(True)
            wall = time.perf_counter() - t0
            job.error = job.error or req.error
            audio_s = 0.0 if req.audio is None else len(req.audio) / SAMPLE_RATE
            job.result = {"tokens": len(req.tokens),
                          "audio_s": round(audio_s, 3),
                          "wall_s": round(wall, 3),
                          "rtf": round(audio_s / wall, 3) if wall > 0 else None,
                          "engine_slot": req.slot}
            self.served += 1
        job.finalize = finalize
        return job

    def submit(self, request: dict) -> Job:
        if self.engine is not None:
            return self._submit_engine(request)
        job = Job(request=request)
        self.jobs.put(job)
        return job

    def warmup(self) -> float:
        """Pre-compile the serving programs (prefill at the default prompt
        bucket, the small first-chunk and big steady-state chunk programs)
        so the first real request doesn't pay the compile wall.  With the
        persistent compilation cache this is a disk load on warm processes.
        Returns the wall seconds spent."""
        t0 = time.time()
        job = self.submit({"input": "Speaker 1: Warm up the compiler.",
                           "model": self.model_name,
                           "max_new_tokens": 80,      # 2 small + 1 big chunk
                           "max_length_times": 1000.0})
        job.done.wait()
        if job.finalize is not None:
            job.finalize()
        dt = time.time() - t0
        if job.error:
            self.log(f"⚠️ warmup failed: {job.error}")
        else:
            self.log(f"🔥 warmed up in {dt:.1f} s "
                     f"(first request will not compile)")
        return dt

    def queue_depth(self) -> int:
        if self.engine is not None:
            return len(self.engine.pending)
        return self.jobs.qsize() + len(self._backlog)

    def info(self) -> dict:
        import jax
        cur = self.manager.current
        out = {"status": "ok", "uptime_s": round(time.time() - self.started_at, 1),
               "served": self.served, "batches": self.batches,
               "max_batch": self.max_batch,
               "device": str(jax.devices()[0]),
               "loaded_model": cur.name if cur else None,
               "queue_depth": self.queue_depth()}
        if self.engine is not None:
            eng = self.engine
            out["engine"] = {"slots": eng.slots, "active": eng.active(),
                             "global_step": eng.global_step,
                             "chunks_run": eng.chunks_run,
                             "cache_len": eng.cache_len,
                             "chunk_steps": eng.chunk_steps}
        return out


def make_handler(app: ServingApp):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route through the app logger
            app.log(f"🌐 {self.address_string()} {fmt % args}")

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                return self._json(200, app.info())
            if self.path == "/v1/voices":
                return self._json(200, {"voices": app.voices.names()})
            if self.path == "/v1/models":
                cur = app.manager.current
                return self._json(200, {
                    "models": list(MODEL_REGISTRY) + ["tiny"],
                    "loaded": cur.name if cur else None})
            if self.path == "/v1/metrics":
                cur = app.manager.current
                gen_metrics = {}
                if cur is not None:
                    # StageTimer.summary(): {stage: {total_s, count, mean_ms}}
                    gen_metrics = cur.generator.last_metrics or {}
                out = {"served": app.served, "batches": app.batches,
                       "queue_depth": app.queue_depth(),
                       "last_generate": gen_metrics}
                if app.engine is not None:
                    out["engine"] = app.info()["engine"]
                return self._json(200, out)
            return self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                return self._json(400, {"error": f"bad request: {e}"})
            if self.path in ("/v1/tts/stream_batch", "/v1/tts/stream_batch/"):
                return self._stream_batch_response(req)
            if self.path not in ("/v1/audio/speech", "/v1/audio/speech/"):
                return self._json(404, {"error": f"no route {self.path}"})
            if not req.get("input"):
                return self._json(400, {"error": "missing 'input'"})

            job = app.submit(req)
            if req.get("stream"):
                return self._stream_response(job)
            return self._complete_response(job)

        def _stream_batch_response(self, req: dict):
            """POST /v1/tts/stream_batch: {"inputs": [{"input": ...}, ...],
            <shared settings>} -> NDJSON frames multiplexing every sample's
            audio as it is produced: {"i", "sr", "samples", "pcm16"}
            (base64 PCM), then one final {"done": true, "results": ...}.
            The device runs ONE batched generation; chunks fan out through
            AsyncAudioBatchIterator (the reference's async batch path,
            streamer.py:206-264)."""
            if app.engine is not None:
                return self._json(400, {
                    "error": "stream_batch joins its own device batch; in "
                             "--engine mode submit per-request streams "
                             "instead (they join live engine slots)"})
            subs = req.get("inputs")
            if (not isinstance(subs, list) or not subs
                    or not all(isinstance(r, dict) and r.get("input")
                               for r in subs)):
                return self._json(400, {
                    "error": "missing 'inputs': [{\"input\": ...}, ...]"})

            import asyncio
            import base64
            from vibevoice_tpu.streamer import AsyncAudioStreamer
            loop = asyncio.new_event_loop()
            streamer = AsyncAudioStreamer(batch_size=len(subs), loop=loop,
                                          timeout=300.0)
            job = Job(request={**{k: v for k, v in req.items()
                                  if k != "inputs"},
                               "_stream_batch": subs})
            job.async_streamer = streamer
            app.jobs.put(job)

            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def write_chunk(data: bytes):
                self.wfile.write(f"{len(data):X}\r\n".encode() + data
                                 + b"\r\n")

            async def pump():
                async for chunks in streamer:
                    for i, audio in sorted(chunks.items()):
                        frame = {"i": int(i), "sr": SAMPLE_RATE,
                                 "samples": int(len(audio)),
                                 "pcm16": base64.b64encode(
                                     pcm16(audio)).decode()}
                        write_chunk((json.dumps(frame) + "\n").encode())

            try:
                loop.run_until_complete(pump())
                job.done.wait()
                tail = {"done": True, "error": job.error,
                        "results": job.result}
                write_chunk((json.dumps(tail) + "\n").encode())
                self.wfile.write(b"0\r\n\r\n")
            except (BrokenPipeError, ConnectionResetError):
                job.done.wait()
            finally:
                loop.close()

        def _complete_response(self, job: Job):
            job.assigned.wait()
            chunks: List[np.ndarray] = list(
                job.streamer.get_stream(job.sample_index))
            job.done.wait()
            if job.finalize is not None:
                job.finalize()
            if job.error:
                return self._json(500, {"error": job.error})
            pcm = b"".join(pcm16(c) for c in chunks)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(44 + len(pcm)))
            if job.result:
                self.send_header("X-VibeVoice-Metrics", json.dumps(job.result))
            self.end_headers()
            self.wfile.write(wav_header(len(pcm) // 2))
            self.wfile.write(pcm)

        def _stream_response(self, job: Job):
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def write_chunk(data: bytes):
                self.wfile.write(f"{len(data):X}\r\n".encode() + data + b"\r\n")

            try:
                write_chunk(wav_header(0, streaming=True))
                job.assigned.wait()
                for chunk in job.streamer.get_stream(job.sample_index):
                    write_chunk(pcm16(chunk))
                job.done.wait()
                if job.finalize is not None:
                    job.finalize()
                self.wfile.write(b"0\r\n\r\n")        # terminal chunk
            except (BrokenPipeError, ConnectionResetError):
                # client went away: end THIS sample's stream — the generation
                # loop aborts just this row, batch-mates keep generating
                job.assigned.wait()
                job.streamer.end([job.sample_index])
                job.done.wait()
                if job.finalize is not None:
                    job.finalize()

    return Handler


def serve(app: ServingApp, host: str = "127.0.0.1", port: int = 8200):
    httpd = ThreadingHTTPServer((host, port), make_handler(app))
    app.log(f"🚀 vibevoice-serve on http://{host}:{httpd.server_address[1]} "
            f"(model={app.model_name})")
    return httpd


def build_argparser():
    import argparse
    p = argparse.ArgumentParser(description="VibeVoice-TPU serving daemon")
    p.add_argument("--model", default="VibeVoice-1.5B",
                   help="registry name, or 'tiny' for a random-weights smoke model")
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address (non-loopback exposes the API — "
                        "put a real gateway in front first)")
    p.add_argument("--port", type=int, default=8200)
    p.add_argument("--quantize", nargs="?", const="int8", default="",
                   choices=["int8", "int4", "int4g"],
                   help="weight-only LM tier: bare flag or 'int8' (quality "
                        "default), 'int4' (per-column speed tier), 'int4g' "
                        "(group-16 fidelity)")
    p.add_argument("--max_batch", type=int, default=4,
                   help="max requests coalesced into one device batch")
    p.add_argument("--batch_window", type=float, default=0.05,
                   help="seconds to wait for batch-mates after dequeuing")
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel size: serve sharded over a "
                        "('dp','tp') device mesh (7B bf16 needs tp>=2)")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh axis (batch sharding)")
    p.add_argument("--ddpm_steps", type=int, default=10)
    p.add_argument("--engine", action="store_true",
                   help="continuous batching: requests join a live fixed-"
                        "shape batch mid-flight (no convoy effect; sampling "
                        "settings become engine-wide constants)")
    p.add_argument("--engine_slots", type=int, default=4,
                   help="concurrent request slots in --engine mode")
    p.add_argument("--engine_cache_len", type=int, default=4096,
                   help="fixed KV cache length per slot in --engine mode")
    p.add_argument("--engine_chunk_steps", type=int, default=16,
                   help="decode steps per device dispatch in --engine mode")
    p.add_argument("--engine_cfg_scale", type=float, default=1.3,
                   help="engine-wide CFG scale in --engine mode")
    p.add_argument("--lod", action="store_true", help="load-on-demand")
    p.add_argument("--offline", action="store_true")
    p.add_argument("--voices_dir", default=None)
    p.add_argument("--preload", action="store_true",
                   help="load the model at startup instead of first request")
    p.add_argument("--check", action="store_true",
                   help="smoke: start on an ephemeral port, run one tiny "
                        "request through HTTP, print metrics, exit")
    return p


def _check(app: ServingApp) -> int:
    import urllib.request
    httpd = serve(app, port=0)
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    ok = True
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            print("healthz:", r.read().decode())
        with urllib.request.urlopen(f"{base}/v1/voices", timeout=30) as r:
            print("voices:", r.read().decode()[:120])
        body = json.dumps({"input": "Speaker 1: Hello from the serving check.",
                           "model": "tiny", "max_new_tokens": 8,
                           "max_length_times": 1000.0}).encode()
        req = urllib.request.Request(f"{base}/v1/audio/speech", data=body,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            wav = r.read()
            print("speech: bytes:", len(wav), "riff:", wav[:4],
                  "metrics:", r.headers.get("X-VibeVoice-Metrics"))
            ok = wav[:4] == b"RIFF" and len(wav) > 44
        body = json.dumps({"input": "Speaker 1: Streaming check.",
                           "model": "tiny", "max_new_tokens": 6,
                           "max_length_times": 1000.0, "stream": True}).encode()
        req = urllib.request.Request(f"{base}/v1/audio/speech", data=body,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            swav = r.read()
            print("stream: bytes:", len(swav), "riff:", swav[:4])
            ok = ok and swav[:4] == b"RIFF"
    finally:
        httpd.shutdown()
    print("check ok" if ok else "check FAILED")
    return 0 if ok else 1


def main(argv=None):
    args = build_argparser().parse_args(argv)
    mesh = None
    if args.tp or args.dp:
        from ..parallel import make_mesh
        mesh = make_mesh(tp=args.tp or None, dp=args.dp or None)
        print(f"Serving on mesh {dict(mesh.shape)}")
    app = ServingApp(model_name=args.model, quantize=args.quantize,
                     ddpm_steps=args.ddpm_steps, load_on_demand=args.lod,
                     offline=args.offline or None, voices_dir=args.voices_dir,
                     max_batch=args.max_batch, batch_window_s=args.batch_window,
                     mesh=mesh, engine=args.engine,
                     engine_slots=args.engine_slots,
                     engine_cache_len=args.engine_cache_len,
                     engine_chunk_steps=args.engine_chunk_steps,
                     engine_cfg_scale=args.engine_cfg_scale)
    if args.check:
        raise SystemExit(_check(app))
    if args.host not in ("127.0.0.1", "localhost"):
        app.log("⚠️  Binding a non-loopback address exposes the API to the "
                "network; ensure a gateway/auth layer is in front.")
    if args.preload:
        app._load(args.model)
        app.warmup()
    httpd = serve(app, host=args.host, port=args.port)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        app.log("👋 shutting down")
        httpd.shutdown()


if __name__ == "__main__":
    main()
