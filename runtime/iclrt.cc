// iclrt — native host runtime for the TPU ICL speech-text framework.
//
// The reference framework leans on torch DataLoader worker processes and HF's
// C-backed feature extractor for host-side data work (SURVEY.md §2.5, §7.3
// hard part #6). This library is the TPU-native equivalent: the host-side hot
// loops that feed fixed-shape device batches — audio block packing, polyphase
// resampling, and a lock-free ring buffer for prefetch pipelining — compiled
// as a small C ABI usable from ctypes.
//
// Build: see runtime/build.sh (g++ -O3 -march=native -shared -fPIC).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Audio block packing: scatter variable-length wavs into a zero-initialized
// (B, n_slots, n_samples) block. Replaces the Python per-slot copy loop in
// data/collate.py (the reference's pad_sequence + stack dance,
// ref: data/model_processors.py:786-874).
//
// wav_ptrs:    array of B*n_slots float* (nullptr = empty slot)
// wav_lengths: array of B*n_slots int64 lengths
// out:         (B*n_slots*n_samples) float, pre-allocated, NOT pre-zeroed
// ---------------------------------------------------------------------------
void iclrt_pack_audio_block(const float** wav_ptrs, const int64_t* wav_lengths,
                            int64_t num_slots_total, int64_t n_samples,
                            float* out) {
  for (int64_t s = 0; s < num_slots_total; ++s) {
    float* dst = out + s * n_samples;
    const float* src = wav_ptrs[s];
    int64_t n = src ? std::min<int64_t>(wav_lengths[s], n_samples) : 0;
    if (n > 0) std::memcpy(dst, src, sizeof(float) * n);
    if (n < n_samples) std::memset(dst + n, 0, sizeof(float) * (n_samples - n));
  }
}

// ---------------------------------------------------------------------------
// Windowed-sinc polyphase resampler (Kaiser window), matching the semantics of
// ops/mel.py:resample_kaiser. For host-side normalization of non-16kHz corpora
// before device dispatch.
// ---------------------------------------------------------------------------
static double bessel_i0(double x) {
  // series expansion; converges fast for the beta range we use
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-12 * sum) break;
  }
  return sum;
}

static int64_t gcd64(int64_t a, int64_t b) {
  while (b) { int64_t t = a % b; a = b; b = t; }
  return a;
}

// Returns the number of output samples written (<= out_capacity).
// `zeros` = sinc zero crossings on each side (filter sharpness, e.g. 16).
int64_t iclrt_resample(const float* in, int64_t n_in, int64_t from_sr,
                       int64_t to_sr, float* out, int64_t out_capacity,
                       int64_t zeros, double beta /* kaiser beta, e.g. 8.0 */) {
  if (from_sr == to_sr) {
    int64_t n = std::min(n_in, out_capacity);
    std::memcpy(out, in, sizeof(float) * n);
    return n;
  }
  int64_t g = gcd64(from_sr, to_sr);
  int64_t up = to_sr / g, down = from_sr / g;
  // at the upsampled rate: cutoff 1/max(up,down); half-width must cover
  // `zeros` sinc zero crossings → T = zeros * max(up, down) taps
  int64_t rate = std::max(up, down);
  double cutoff = 1.0 / double(rate);
  int64_t T = zeros * rate;
  int64_t width = 2 * T + 1;

  std::vector<double> h(width);
  double i0b = bessel_i0(beta);
  for (int64_t i = 0; i < width; ++i) {
    double t = double(i - T);
    double sinc = (t == 0.0) ? cutoff : std::sin(M_PI * t * cutoff) / (M_PI * t);
    double frac = t / double(T);
    double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - frac * frac))) / i0b;
    h[i] = sinc * double(up) * w;
  }

  int64_t n_out = std::min(out_capacity, (n_in * up) / down);
  // polyphase evaluation: out[j] = sum_i x[i] * h[j*down - i*up + T]
  for (int64_t j = 0; j < n_out; ++j) {
    int64_t pos = j * down;  // position in upsampled grid
    double acc = 0.0;
    int64_t i_lo = (pos - T + up - 1) / up;  // ceil
    int64_t i_hi = (pos + T) / up;           // floor
    i_lo = std::max<int64_t>(i_lo, 0);
    i_hi = std::min<int64_t>(i_hi, n_in - 1);
    for (int64_t i = i_lo; i <= i_hi; ++i) {
      int64_t tap = pos - i * up + T;
      acc += double(in[i]) * h[tap];
    }
    out[j] = float(acc);
  }
  return n_out;
}

// ---------------------------------------------------------------------------
// SPSC ring buffer for batch prefetch: producer thread fills slots while the
// consumer (device dispatch) drains them. Slots carry opaque byte payloads.
// ---------------------------------------------------------------------------
struct IclrtRing {
  std::vector<std::vector<uint8_t>> slots;
  std::atomic<int64_t> head{0};  // next write
  std::atomic<int64_t> tail{0};  // next read
  int64_t capacity;
};

void* iclrt_ring_create(int64_t capacity) {
  auto* r = new IclrtRing();
  r->capacity = capacity;
  r->slots.resize(capacity);
  return r;
}

void iclrt_ring_destroy(void* ring) { delete static_cast<IclrtRing*>(ring); }

// returns 1 on success, 0 if full
int iclrt_ring_push(void* ring, const uint8_t* data, int64_t nbytes) {
  auto* r = static_cast<IclrtRing*>(ring);
  int64_t head = r->head.load(std::memory_order_relaxed);
  int64_t tail = r->tail.load(std::memory_order_acquire);
  if (head - tail >= r->capacity) return 0;
  auto& slot = r->slots[head % r->capacity];
  slot.assign(data, data + nbytes);
  r->head.store(head + 1, std::memory_order_release);
  return 1;
}

// returns payload size (and copies up to capacity bytes), -1 if empty
int64_t iclrt_ring_pop(void* ring, uint8_t* out, int64_t out_capacity) {
  auto* r = static_cast<IclrtRing*>(ring);
  int64_t tail = r->tail.load(std::memory_order_relaxed);
  int64_t head = r->head.load(std::memory_order_acquire);
  if (tail >= head) return -1;
  auto& slot = r->slots[tail % r->capacity];
  int64_t n = std::min<int64_t>(slot.size(), out_capacity);
  std::memcpy(out, slot.data(), n);
  int64_t total = slot.size();
  r->tail.store(tail + 1, std::memory_order_release);
  return total <= out_capacity ? n : total;
}

int64_t iclrt_ring_size(void* ring) {
  auto* r = static_cast<IclrtRing*>(ring);
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

int64_t iclrt_version() { return 1; }

}  // extern "C"
