// Native audio runtime for vibevoice_tpu.
//
// Host-side C++ replacing the performance-sensitive pieces the reference
// delegates to native libraries (librosa/soundfile resampling, and the
// per-chunk queue/convert hot path of the streamer, reference
// vibevoice/modular/streamer.py:13-86, main.py:2956-2979):
//
//   * lock-based SPSC ring buffer for float32 audio chunks (bounded memory,
//     blocking pop with timeout) — the generation-thread <-> UI-thread
//     transport
//   * float32 -> int16 PCM conversion with clipping (convert_to_16_bit_wav)
//   * dB-FS loudness normalization
//   * polyphase windowed-sinc resampler (matches the numpy fallback)
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Ring buffer of variable-size float chunks (SPSC, blocking)
// ---------------------------------------------------------------------------

struct AudioRing {
    std::deque<std::vector<float>> chunks;
    std::mutex mu;
    std::condition_variable cv;
    std::atomic<bool> closed{false};
    size_t max_chunks;
    size_t total_samples{0};
};

void* ring_create(size_t max_chunks) {
    auto* r = new AudioRing();
    r->max_chunks = max_chunks == 0 ? 1024 : max_chunks;
    return r;
}

void ring_destroy(void* h) { delete static_cast<AudioRing*>(h); }

// returns 1 on success, 0 if closed or full
int ring_push(void* h, const float* data, size_t n) {
    auto* r = static_cast<AudioRing*>(h);
    std::unique_lock<std::mutex> lk(r->mu);
    if (r->closed.load() || r->chunks.size() >= r->max_chunks) return 0;
    r->chunks.emplace_back(data, data + n);
    r->total_samples += n;
    lk.unlock();
    r->cv.notify_one();
    return 1;
}

// pop up to `cap` samples into out; returns samples written; -1 = closed+empty;
// 0 = timeout. timeout_ms < 0 blocks forever.
long ring_pop(void* h, float* out, size_t cap, long timeout_ms) {
    auto* r = static_cast<AudioRing*>(h);
    std::unique_lock<std::mutex> lk(r->mu);
    auto ready = [&] { return !r->chunks.empty() || r->closed.load(); };
    if (timeout_ms < 0) {
        r->cv.wait(lk, ready);
    } else if (!r->cv.wait_for(lk, std::chrono::milliseconds(timeout_ms), ready)) {
        return 0;
    }
    if (r->chunks.empty()) return r->closed.load() ? -1 : 0;
    size_t written = 0;
    while (!r->chunks.empty() && written < cap) {
        auto& front = r->chunks.front();
        size_t take = std::min(cap - written, front.size());
        std::memcpy(out + written, front.data(), take * sizeof(float));
        written += take;
        if (take == front.size()) {
            r->chunks.pop_front();
        } else {
            front.erase(front.begin(), front.begin() + take);
        }
    }
    r->total_samples -= written;
    return static_cast<long>(written);
}

void ring_close(void* h) {
    auto* r = static_cast<AudioRing*>(h);
    r->closed.store(true);
    r->cv.notify_all();
}

size_t ring_size(void* h) {
    auto* r = static_cast<AudioRing*>(h);
    std::lock_guard<std::mutex> lk(r->mu);
    return r->total_samples;
}

// ---------------------------------------------------------------------------
// PCM conversion + normalization
// ---------------------------------------------------------------------------

void f32_to_i16(const float* in, int16_t* out, size_t n) {
    for (size_t i = 0; i < n; ++i) {
        float v = in[i];
        v = v < -1.f ? -1.f : (v > 1.f ? 1.f : v);
        out[i] = static_cast<int16_t>(std::lrintf(v * 32767.f));
    }
}

// normalize to target dB FS then avoid clipping; in-place
void normalize_dbfs(float* data, size_t n, float target_db, float eps) {
    double sq = 0.0;
    for (size_t i = 0; i < n; ++i) sq += double(data[i]) * data[i];
    float rms = std::sqrt(float(sq / (n ? n : 1)));
    float scalar = std::pow(10.f, target_db / 20.f) / (rms + eps);
    float maxv = 0.f;
    for (size_t i = 0; i < n; ++i) {
        data[i] *= scalar;
        maxv = std::max(maxv, std::fabs(data[i]));
    }
    if (maxv > 1.f) {
        float inv = 1.f / (maxv + eps);
        for (size_t i = 0; i < n; ++i) data[i] *= inv;
    }
}

// ---------------------------------------------------------------------------
// Polyphase windowed-sinc resampler (Hann window); matches the Python
// fallback in vibevoice_tpu/processor/audio.py
// ---------------------------------------------------------------------------

size_t resample_len(size_t n_in, long up, long down) {
    return static_cast<size_t>((static_cast<unsigned long long>(n_in) * up + down - 1) / down);
}

void resample_sinc(const float* in, size_t n_in, float* out, size_t n_out,
                   long up, long down, int num_zeros) {
    const double scale = std::min(1.0, double(up) / double(down));
    const int half = int(std::ceil(num_zeros / scale));
    for (size_t o = 0; o < n_out; ++o) {
        const double t = double(o) * double(down) / double(up);
        const long left = long(std::floor(t));
        double acc = 0.0;
        for (int k = -half; k <= half; ++k) {
            const long idx = left + k;
            if (idx < 0 || idx >= long(n_in)) continue;
            const double d = t - double(idx);
            const double w = 0.5 * (1.0 + std::cos(M_PI * std::min(1.0, std::fabs(d) / (half + 1))));
            const double x = d * scale;
            const double sinc = x == 0.0 ? 1.0 : std::sin(M_PI * x) / (M_PI * x);
            acc += double(in[idx]) * sinc * scale * w;
        }
        out[o] = float(acc);
    }
}

}  // extern "C"
