// cosy_dsp: native host-side DSP for the training data pipeline.
//
// Replaces the reference's pyworld (WORLD, C++) F0 extraction dependency
// (reference: cosy_repo/cosyvoice/dataset/processor.py:188-210) with a
// first-party YIN implementation, plus framing/overlap-add helpers used by
// the dataset workers.  Exposed via a C ABI for ctypes (no pybind11 in the
// build image).
//
// Build: make -C native   (produces libcosy_dsp.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// YIN pitch estimation.
//   wav:       n samples, float32, mono
//   f0_out:    n / hop entries (caller-allocated)
// Returns number of frames written.
int yin_f0(const float* wav, int64_t n, int sample_rate, int hop,
           float fmin, float fmax, int frame_len, float threshold,
           float* f0_out) {
    const int tau_min = std::max(1, (int)(sample_rate / fmax));
    const int tau_max = (int)(sample_rate / fmin);
    const int64_t n_frames = n / hop;
    std::vector<float> d(tau_max + 1), cmnd(tau_max + 1);
    std::vector<float> frame(frame_len + tau_max + 1, 0.0f);

    for (int64_t fi = 0; fi < n_frames; ++fi) {
        const int64_t start = fi * hop;
        const int64_t avail = std::min<int64_t>(frame_len + tau_max, n - start);
        std::fill(frame.begin(), frame.end(), 0.0f);
        if (avail > 0) std::memcpy(frame.data(), wav + start, sizeof(float) * avail);

        // silence gate
        float peak = 0.0f;
        for (int i = 0; i < frame_len; ++i) peak = std::max(peak, std::fabs(frame[i]));
        if (peak < 1e-4f) { f0_out[fi] = 0.0f; continue; }

        // difference function d(tau) = sum_t (x[t] - x[t+tau])^2
        d[0] = 0.0f;
        for (int tau = 1; tau <= tau_max; ++tau) {
            double acc = 0.0;
            const float* a = frame.data();
            const float* b = frame.data() + tau;
            for (int t = 0; t < frame_len; ++t) {
                const float diff = a[t] - b[t];
                acc += (double)diff * diff;
            }
            d[tau] = (float)acc;
        }

        // cumulative mean normalized difference
        cmnd[0] = 1.0f;
        double cum = 0.0;
        for (int tau = 1; tau <= tau_max; ++tau) {
            cum += d[tau];
            cmnd[tau] = cum > 1e-12 ? (float)(d[tau] * tau / cum) : 1.0f;
        }

        // absolute threshold
        int tau = -1;
        for (int t = tau_min; t < tau_max; ++t) {
            if (cmnd[t] < threshold) {
                tau = t;
                while (tau + 1 < tau_max && cmnd[tau + 1] < cmnd[tau]) ++tau;
                break;
            }
        }
        if (tau < 0) {
            // global minimum fallback with voicing gate
            float best = 1e9f; int best_t = tau_min;
            for (int t = tau_min; t < tau_max; ++t)
                if (cmnd[t] < best) { best = cmnd[t]; best_t = t; }
            if (best > 0.5f) { f0_out[fi] = 0.0f; continue; }
            tau = best_t;
        }

        // parabolic interpolation
        float tau_f = (float)tau;
        if (tau >= 1 && tau + 1 < tau_max) {
            const float a = cmnd[tau - 1], b = cmnd[tau], c = cmnd[tau + 1];
            const float denom = a - 2.0f * b + c;
            if (std::fabs(denom) > 1e-12f) {
                float shift = 0.5f * (a - c) / denom;
                shift = std::max(-1.0f, std::min(1.0f, shift));
                tau_f += shift;
            }
        }
        f0_out[fi] = (float)sample_rate / tau_f;
    }
    return (int)n_frames;
}

// Strided framing: out[f, i] = x[f * hop + i] (zero-padded tail).
void frame_signal(const float* x, int64_t n, int frame_len, int hop,
                  int64_t n_frames, float* out) {
    for (int64_t f = 0; f < n_frames; ++f) {
        const int64_t start = f * hop;
        const int64_t avail = std::max<int64_t>(0, std::min<int64_t>(frame_len, n - start));
        if (avail > 0) std::memcpy(out + f * frame_len, x + start, sizeof(float) * avail);
        if (avail < frame_len)
            std::memset(out + f * frame_len + avail, 0, sizeof(float) * (frame_len - avail));
    }
}

// Hamming-window crossfade of chunk boundaries (reference utils/common.py:142).
void crossfade(float* fade_in, const float* fade_out_tail, const float* window,
               int overlap) {
    for (int i = 0; i < overlap; ++i)
        fade_in[i] = fade_in[i] * window[i] + fade_out_tail[i] * window[overlap + i];
}

}  // extern "C"
