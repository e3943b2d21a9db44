// hostlib — native host-side audio/data kernels for unimoe-audio-tpu.
//
// The TPU owns all model compute (JAX/XLA/Pallas); this library covers the
// host-side hot paths around it, which matter at serving scale on the
// small host CPUs that front TPU slices:
//   * int16 PCM <-> float32 conversion (wav decode/encode inner loop)
//   * mono mixdown
//   * windowed-sinc polyphase resampling (voice-prompt ingest: arbitrary
//     sample rates -> the codec's 16 kHz)
//   * batch right-pad collation for the training data pipeline
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency);
// codec/native.py loads it and falls back to numpy/scipy when absent.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// int16 little-endian PCM -> float32 in [-1, 1)
void pcm16_to_f32(const int16_t* in, float* out, int64_t n) {
    const float k = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * k;
}

// float32 -> int16 PCM with clipping (round-half-away like lrintf)
void f32_to_pcm16(const float* in, int16_t* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i];
        v = v > 1.0f ? 1.0f : (v < -1.0f ? -1.0f : v);
        float s = v * 32767.0f;
        out[i] = (int16_t)(s >= 0.0f ? s + 0.5f : s - 0.5f);
    }
}

// interleaved [T, C] -> mono average [T]
void mixdown(const float* in, float* out, int64_t frames, int32_t channels) {
    const float k = 1.0f / (float)channels;
    for (int64_t t = 0; t < frames; ++t) {
        float acc = 0.0f;
        for (int32_t c = 0; c < channels; ++c) acc += in[t * channels + c];
        out[t] = acc * k;
    }
}

// Windowed-sinc polyphase resampler: in[T_in] at rate (up/down), taps per
// phase = `taps`.  Equivalent quality class to scipy.signal.resample_poly
// with a Hann-windowed sinc kernel.
// Returns the number of output samples written (caller allocates
// ceil(T_in * up / down)).
int64_t resample_poly(
    const float* in, int64_t t_in,
    float* out, int64_t out_cap,
    int32_t up, int32_t down, int32_t taps) {
    if (up == down) {
        int64_t n = std::min<int64_t>(t_in, out_cap);
        std::memcpy(out, in, (size_t)n * sizeof(float));
        return n;
    }
    const int32_t half = taps / 2;                 // taps per side per phase
    const double fc = 0.5 / std::max(up, down);    // cutoff in input units/up
    const double gain = (double)up;
    // filter length (in upsampled domain) = 2*half*up + 1
    const int64_t flen = 2LL * half * up + 1;
    std::vector<double> h((size_t)flen);
    for (int64_t i = 0; i < flen; ++i) {
        const double x = (double)(i - half * up);
        const double sinc = x == 0.0 ? 1.0 : std::sin(2.0 * M_PI * fc * x) / (M_PI * x * 2.0 * fc);
        const double win = 0.5 + 0.5 * std::cos(M_PI * x / (double)(half * up + 1));
        h[(size_t)i] = 2.0 * fc * sinc * win * gain;
    }
    const int64_t t_out_total = (t_in * up + down - 1) / down;
    const int64_t t_out = std::min(t_out_total, out_cap);
    for (int64_t m = 0; m < t_out; ++m) {
        // output sample m sits at upsampled index m*down
        const int64_t pos = m * down;
        double acc = 0.0;
        // x_up[j] = in[j/up] when j%up==0; convolve h centered at pos
        const int64_t j_lo = pos - half * up;
        // first input index >= j_lo that is a multiple of up
        int64_t j = j_lo >= 0 ? ((j_lo + up - 1) / up) * up : ((j_lo) / up) * up;
        if (j < j_lo) j += up;
        for (; j <= pos + half * up; j += up) {
            const int64_t n = j / up;
            if (n < 0 || n >= t_in) continue;
            acc += (double)in[n] * h[(size_t)(j - j_lo)];
        }
        out[m] = (float)acc;
    }
    return t_out;
}

// Right-pad collation: scatter `n_seqs` int64 sequences (lengths[i] each,
// concatenated in `flat`) into out[n_seqs, max_len] prefilled by caller.
void collate_pad_i64(
    const int64_t* flat, const int64_t* lengths, int32_t n_seqs,
    int64_t max_len, int64_t* out) {
    int64_t off = 0;
    for (int32_t i = 0; i < n_seqs; ++i) {
        const int64_t n = std::min(lengths[i], max_len);
        std::memcpy(out + i * max_len, flat + off, (size_t)n * sizeof(int64_t));
        off += lengths[i];
    }
}

}  // extern "C"
