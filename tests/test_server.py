"""Serving daemon tests: routes, WAV framing, queueing, streaming.

The reference has no HTTP serving surface (Gradio only, reference
main.py:2982-3150); these tests pin ours: an OpenAI-style TTS REST API.
"""

import json
import struct
import threading
import urllib.error
import urllib.request

import pytest

from vibevoice_tpu.apps.server import ServingApp, serve, wav_header


def test_wav_header_fields():
    h = wav_header(1200)
    assert h[:4] == b"RIFF" and h[8:12] == b"WAVE"
    riff_size, = struct.unpack("<I", h[4:8])
    assert riff_size == 36 + 2400
    fmt = struct.unpack("<IHHIIHH", h[16:36])
    assert fmt == (16, 1, 1, 24000, 48000, 2, 16)
    assert h[36:40] == b"data"
    data_size, = struct.unpack("<I", h[40:44])
    assert data_size == 2400
    # streaming header: unknown-length convention
    hs = wav_header(0, streaming=True)
    assert struct.unpack("<I", hs[4:8])[0] == 0xFFFFFFFF


@pytest.fixture(scope="module")
def server():
    app = ServingApp(model_name="tiny", log_fn=lambda *_: None)
    httpd = serve(app, port=0)
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", app
    httpd.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=60) as r:
        return r.status, json.loads(r.read())


def _post(base, body: dict):
    req = urllib.request.Request(
        base + "/v1/audio/speech", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, r.read(), dict(r.headers)


def test_healthz_voices_models(server):
    base, app = server
    code, h = _get(base, "/healthz")
    assert code == 200 and h["status"] == "ok" and "device" in h
    code, v = _get(base, "/v1/voices")
    assert code == 200 and isinstance(v["voices"], list)
    code, m = _get(base, "/v1/models")
    assert code == 200 and "tiny" in m["models"]


def test_unknown_route_404(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(base + "/nope", timeout=30)
    assert ei.value.code == 404


def test_missing_input_400(server):
    base, _ = server
    req = urllib.request.Request(
        base + "/v1/audio/speech", data=b"{}",
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


def test_speech_complete_and_stream(server):
    base, app = server
    body = {"input": "Speaker 1: Hello from the server test.",
            "model": "tiny", "max_new_tokens": 6,
            "max_length_times": 1000.0}
    code, wav, headers = _post(base, body)
    assert code == 200 and wav[:4] == b"RIFF"
    assert len(wav) > 44, "no audio samples in the complete response"
    metrics = json.loads(headers["X-VibeVoice-Metrics"])
    # steps run in chunk_steps-sized device chunks; token count rounds up
    assert metrics["tokens"] >= 6 and metrics["audio_s"] > 0

    code, swav, _ = _post(base, dict(body, stream=True))
    assert code == 200 and swav[:4] == b"RIFF" and len(swav) > 44
    # streamed PCM equals the complete-response PCM (same seed/model)
    assert swav[44:] == wav[44:]
    assert app.served >= 2


def test_batch_key_fields():
    from vibevoice_tpu.apps.server import batch_key
    a = {"input": "x", "model": "tiny", "cfg_scale": 1.3}
    b = {"input": "totally different", "model": "tiny", "cfg_scale": 1.3}
    c = {"input": "x", "model": "tiny", "cfg_scale": 1.7}
    assert batch_key(a) == batch_key(b)       # input text does not split batches
    assert batch_key(a) != batch_key(c)       # generation settings do


def test_dynamic_batching_coalesces(server):
    """Two concurrent same-settings requests must run as ONE device batch."""
    base, app = server
    app.batch_window_s = 1.0   # generous coalescing window for the test
    body = {"input": "Speaker 1: Batched request.",
            "model": "tiny", "max_new_tokens": 6, "max_length_times": 1000.0}
    results = [None, None]

    def fire(i):
        results[i] = _post(base, dict(body, input=f"Speaker 1: Request {i}."))

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    app.batch_window_s = 0.05
    for code, wav, headers in results:
        assert code == 200 and wav[:4] == b"RIFF" and len(wav) > 44
        metrics = json.loads(headers["X-VibeVoice-Metrics"])
        assert metrics["batch"] == 2, metrics


def test_metrics_endpoint(server):
    base, app = server
    code, m = _get(base, "/v1/metrics")
    assert code == 200 and m["served"] >= 1
    assert "generate_total" in m["last_generate"]
    assert m["last_generate"]["generate_total"]["count"] >= 1


def test_warmup(server):
    _, app = server
    served_before = app.served
    dt = app.warmup()
    assert dt > 0 and app.served == served_before + 1


def test_mixed_load_and_midstream_disconnect(server):
    """Concurrent mixed-settings requests plus a client that disconnects
    mid-stream: the disconnect aborts only its own sample, everything else
    completes, and the server stays healthy."""
    base, app = server
    app.batch_window_s = 0.5
    results = {}

    def normal(i):
        results[i] = _post(base, {
            "input": f"Speaker 1: Mixed load {i}.", "model": "tiny",
            "max_new_tokens": 12, "max_length_times": 1000.0})

    def other_settings():
        results["other"] = _post(base, {
            "input": "Speaker 1: Different settings.", "model": "tiny",
            "cfg_scale": 2.0, "max_new_tokens": 6, "max_length_times": 1000.0})

    def disconnector():
        req = urllib.request.Request(
            base + "/v1/audio/speech",
            data=json.dumps({"input": "Speaker 1: I will hang up.",
                             "model": "tiny", "max_new_tokens": 64,
                             "max_length_times": 1000.0,
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        r = urllib.request.urlopen(req, timeout=600)
        r.read(64)          # a few header/PCM bytes...
        r.close()           # ...then vanish mid-generation
        results["gone"] = True

    threads = [threading.Thread(target=normal, args=(i,)) for i in range(2)]
    threads += [threading.Thread(target=other_settings),
                threading.Thread(target=disconnector)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    app.batch_window_s = 0.05

    for i in range(2):
        code, wav, _ = results[i]
        assert code == 200 and wav[:4] == b"RIFF" and len(wav) > 44
    code, wav, _ = results["other"]
    assert code == 200 and wav[:4] == b"RIFF"
    assert results.get("gone")

    # the server must still serve after the disconnect
    code, h = _get(base, "/healthz")
    assert code == 200 and h["status"] == "ok"
    code, wav, _ = _post(base, {"input": "Speaker 1: Still alive?",
                                "model": "tiny", "max_new_tokens": 6,
                                "max_length_times": 1000.0})
    assert code == 200 and len(wav) > 44


@pytest.fixture(scope="module")
def engine_server():
    """Daemon in --engine (continuous batching) mode on the tiny model."""
    app = ServingApp(model_name="tiny", log_fn=lambda *_: None,
                     engine=True, engine_slots=2, engine_cache_len=512,
                     engine_chunk_steps=4)
    httpd = serve(app, port=0)
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", app
    app.engine.stop()
    httpd.shutdown()


def test_engine_server_complete_and_stream(engine_server):
    base, app = engine_server
    body = {"input": "Speaker 1: Engine-served request.",
            "model": "tiny", "max_new_tokens": 6, "max_length_times": 1000.0,
            "seed": 7}
    code, wav, headers = _post(base, body)
    assert code == 200 and wav[:4] == b"RIFF" and len(wav) > 44
    metrics = json.loads(headers["X-VibeVoice-Metrics"])
    assert metrics["tokens"] >= 6 and "engine_slot" in metrics

    # same prompt+seed streamed: deterministic, byte-identical PCM
    code, swav, _ = _post(base, dict(body, stream=True))
    assert code == 200 and swav[:4] == b"RIFF"
    assert swav[44:] == wav[44:]

    code, h = _get(base, "/healthz")
    assert h["engine"]["slots"] == 2 and h["engine"]["active"] == 0
    code, m = _get(base, "/v1/metrics")
    assert m["engine"]["chunks_run"] >= 1


def test_engine_server_rejects_fixed_override(engine_server):
    base, _ = engine_server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, {"input": "Speaker 1: Hot take.", "model": "tiny",
                     "cfg_scale": 2.0, "max_new_tokens": 4})
    assert ei.value.code == 500
    assert "engine-wide" in json.loads(ei.value.read())["error"]

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, {"input": "Speaker 1: Wrong model.",
                     "model": "VibeVoice-1.5B", "max_new_tokens": 4})
    assert ei.value.code == 500
    assert "serves 'tiny' only" in json.loads(ei.value.read())["error"]


def test_engine_server_concurrent(engine_server):
    """More concurrent requests than slots: all are served (slot recycling),
    none error, and the engine drains back to idle."""
    base, app = engine_server
    results = [None] * 3

    def fire(i):
        results[i] = _post(base, {
            "input": f"Speaker 1: Concurrent engine request {i}.",
            "model": "tiny", "max_new_tokens": 8, "max_length_times": 1000.0,
            "seed": i})

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    for code, wav, headers in results:
        assert code == 200 and wav[:4] == b"RIFF" and len(wav) > 44
    assert app.engine.active() == 0 and not app.engine.pending


def test_tp_sharded_serving():
    """The daemon serves through a TP-sharded generator (tiny model on the
    virtual CPU mesh) — the --tp path end to end over HTTP."""
    from vibevoice_tpu.parallel import make_mesh

    app = ServingApp(model_name="tiny", log_fn=lambda *_: None,
                     mesh=make_mesh(tp=2))   # dp fills the remaining devices
    httpd = serve(app, port=0)
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        code, wav, headers = _post(base, {
            "input": "Speaker 1: Sharded serving.", "model": "tiny",
            "max_new_tokens": 6, "max_length_times": 1000.0})
        assert code == 200 and wav[:4] == b"RIFF" and len(wav) > 44
    finally:
        httpd.shutdown()


def test_stream_batch_multiplexed(server):
    """POST /v1/tts/stream_batch: one device batch, NDJSON frames
    multiplexed through AsyncAudioBatchIterator — every sample's audio
    arrives tagged with its index, ending in a summary frame."""
    import base64 as b64
    base, app = server
    body = {"inputs": [{"input": "Speaker 1: stream batch sample one."},
                       {"input": "Speaker 1: the second, rather longer, "
                                 "sample of the batch."}],
            "max_new_tokens": 12, "seed": 3}
    req = urllib.request.Request(
        base + "/v1/tts/stream_batch", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    frames = []
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/x-ndjson"
        for line in r:
            line = line.strip()
            if line:
                frames.append(json.loads(line))
    assert frames, "no frames received"
    tail = frames[-1]
    assert tail.get("done") is True and tail.get("error") is None
    assert tail["results"]["batch"] == 2
    audio_frames = [f for f in frames[:-1] if "pcm16" in f]
    seen = {f["i"] for f in audio_frames}
    assert seen == {0, 1}, seen
    for f in audio_frames:
        pcm = b64.b64decode(f["pcm16"])
        assert len(pcm) == 2 * f["samples"]
    # per-sample audio totals match the summary
    per = {i: sum(f["samples"] for f in audio_frames if f["i"] == i)
           for i in (0, 1)}
    for i in (0, 1):
        assert per[i] / 24000 == pytest.approx(
            tail["results"]["per_sample"][i]["audio_s"], abs=0.01)


def test_stream_batch_validation(server):
    base, _ = server
    req = urllib.request.Request(
        base + "/v1/tts/stream_batch", data=json.dumps({}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


@pytest.mark.slow
def test_engine_server_http_soak(engine_server):
    """Mini-soak through the REAL HTTP surface in --engine mode: 24
    concurrent mixed-length requests; all succeed, none recompile a chunk
    program after warmup, and (input, seed)-repeat requests return
    identical audio bytes (the engine determinism contract end-to-end)."""
    base, app = engine_server
    # warmup covers the prefill buckets the soak uses
    for text in ("Speaker 1: warm.", "Speaker 1: " + "warm words " * 12):
        _post(base, {"input": text, "max_new_tokens": 4, "seed": 0})
    progs0 = len(app.engine.gen._chunk_jit) + len(app.engine.gen._prefill_jit)

    results = {}
    def one(i):
        text = ("Speaker 1: short soak." if i % 3 else
                "Speaker 1: " + "a noticeably longer script line " * 3)
        body = {"input": text, "max_new_tokens": 6 + (i % 3) * 4,
                "seed": i % 5}
        code, wav, _ = _post(base, body)
        results[i] = (code, body["input"], body["seed"],
                      body["max_new_tokens"], wav)

    threads = [threading.Thread(target=one, args=(i,)) for i in range(24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert len(results) == 24
    assert all(code == 200 for code, *_ in results.values())
    progs1 = len(app.engine.gen._chunk_jit) + len(app.engine.gen._prefill_jit)
    assert progs1 == progs0, "soak recompiled programs after warmup"
    # determinism across the soak: same (input, seed, steps) -> same bytes
    by_key = {}
    for code, text, seed, steps, wav in results.values():
        by_key.setdefault((text, seed, steps), []).append(wav)
    repeated = [v for v in by_key.values() if len(v) > 1]
    assert repeated, "soak produced no repeated (input, seed) pairs"
    for group in repeated:
        assert all(w == group[0] for w in group[1:])
