"""Native C++ audio runtime tests (builds the .so via make)."""

import threading
import time

import numpy as np
import pytest

from vibevoice_tpu.runtime.audio_runtime import (
    NativeAudioRing,
    native_available,
    native_f32_to_i16,
    native_normalize_dbfs,
    native_resample,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def test_ring_push_pop():
    ring = NativeAudioRing()
    a = np.arange(10, dtype=np.float32)
    b = np.arange(10, 20, dtype=np.float32)
    assert ring.push(a)
    assert ring.push(b)
    assert len(ring) == 20
    out = ring.pop(max_samples=15, timeout_ms=100)
    np.testing.assert_array_equal(out, np.arange(15, dtype=np.float32))
    out = ring.pop(max_samples=100, timeout_ms=100)
    np.testing.assert_array_equal(out, np.arange(15, 20, dtype=np.float32))


def test_ring_blocking_and_close():
    ring = NativeAudioRing()
    results = []

    def consumer():
        while True:
            out = ring.pop(max_samples=100, timeout_ms=2000)
            if out is None or out.size == 0:
                break
            results.append(out)

    t = threading.Thread(target=consumer)
    t.start()
    time.sleep(0.05)
    ring.push(np.ones(5, np.float32))
    time.sleep(0.05)
    ring.close()
    t.join(timeout=3)
    assert not t.is_alive()
    assert sum(r.size for r in results) == 5


def test_ring_timeout():
    ring = NativeAudioRing()
    t0 = time.time()
    assert ring.pop(timeout_ms=100) is None
    assert 0.05 < time.time() - t0 < 1.0


def test_f32_to_i16():
    audio = np.array([-2.0, -1.0, 0.0, 0.5, 1.0, 2.0], np.float32)
    out = native_f32_to_i16(audio)
    np.testing.assert_array_equal(out, [-32767, -32767, 0, 16384, 32767, 32767])


def test_normalize_dbfs_matches_python():
    from vibevoice_tpu.processor.audio import AudioNormalizer
    rs = np.random.RandomState(0)
    audio = rs.randn(24000).astype(np.float32) * 0.01
    out_native = native_normalize_dbfs(audio, -25.0)
    out_py = AudioNormalizer(-25.0)(audio)
    np.testing.assert_allclose(out_native, out_py, atol=1e-5)


def test_native_resample_matches_python():
    from vibevoice_tpu.processor.audio import resample
    t = np.arange(8000) / 16000
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out_native = native_resample(tone, 16000, 24000)
    out_py = resample(tone, 16000, 24000, use_native=False)
    assert out_native is not None
    assert abs(len(out_native) - len(out_py)) <= 1
    n = min(len(out_native), len(out_py))
    np.testing.assert_allclose(out_native[100:n - 100], out_py[100:n - 100], atol=1e-4)
