// Native audio IO for the TPU-native Whisper framework.
//
// Host-side counterpart of the reference's native DSP layer: where the
// reference links a Rust staticlib over a C FFI for its mel frontend
// (/root/reference/stft/src/lib.rs:110-122, bridge at
// /root/reference/Whisper/Whisper/bridge.h:11), this framework runs the mel
// math on-chip (Pallas) and keeps the *data-loading* path native instead:
// WAV decode, int->float conversion, channel mixdown, and windowed-sinc
// polyphase resampling. Exposed as a C ABI consumed via ctypes
// (openai_whisper_coreml_tpu/utils/audio_io.py).
//
// Build: make -C native        (produces libwhisper_audio.so)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct WavInfo {
  uint16_t format = 0;       // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  const uint8_t* data = nullptr;
  size_t data_len = 0;
};

uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}

// Parse RIFF/WAVE chunks; returns false on malformed input.
bool parse_wav(const uint8_t* buf, size_t len, WavInfo* out) {
  if (len < 12 || std::memcmp(buf, "RIFF", 4) != 0 ||
      std::memcmp(buf + 8, "WAVE", 4) != 0) {
    return false;
  }
  size_t pos = 12;
  bool have_fmt = false;
  while (pos + 8 <= len) {
    const uint8_t* hdr = buf + pos;
    uint32_t chunk_len = rd_u32(hdr + 4);
    const uint8_t* body = hdr + 8;
    if (pos + 8 + chunk_len > len) {
      chunk_len = static_cast<uint32_t>(len - pos - 8);  // tolerate truncation
    }
    if (std::memcmp(hdr, "fmt ", 4) == 0 && chunk_len >= 16) {
      out->format = rd_u16(body);
      out->channels = rd_u16(body + 2);
      out->sample_rate = rd_u32(body + 4);
      out->bits = rd_u16(body + 14);
      if (out->format == 0xFFFE && chunk_len >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        out->format = rd_u16(body + 24);
      }
      have_fmt = true;
    } else if (std::memcmp(hdr, "data", 4) == 0) {
      out->data = body;
      out->data_len = chunk_len;
    }
    pos += 8 + chunk_len + (chunk_len & 1);  // chunks are word-aligned
  }
  return have_fmt && out->data != nullptr && out->channels > 0 &&
         out->sample_rate > 0;
}

// Decode interleaved samples to mono float32 in [-1, 1].
bool decode_samples(const WavInfo& w, std::vector<float>* out) {
  const size_t bytes_per = w.bits / 8;
  if (bytes_per == 0) return false;
  const size_t n_frames = w.data_len / (bytes_per * w.channels);
  out->resize(n_frames);
  const float inv_ch = 1.0f / static_cast<float>(w.channels);
  for (size_t i = 0; i < n_frames; ++i) {
    float acc = 0.0f;
    for (unsigned c = 0; c < w.channels; ++c) {
      const uint8_t* p = w.data + (i * w.channels + c) * bytes_per;
      float v = 0.0f;
      if (w.format == 3 && w.bits == 32) {  // IEEE float
        float f;
        std::memcpy(&f, p, 4);
        v = f;
      } else if (w.bits == 16) {
        int16_t s;
        std::memcpy(&s, p, 2);
        v = static_cast<float>(s) / 32768.0f;
      } else if (w.bits == 32) {
        int32_t s;
        std::memcpy(&s, p, 4);
        v = static_cast<float>(s) / 2147483648.0f;
      } else if (w.bits == 24) {
        // assemble in unsigned space: (int)p[2] << 24 would shift into the
        // sign bit (UB) whenever the top byte >= 0x80
        uint32_t u = (static_cast<uint32_t>(p[0]) << 8) |
                     (static_cast<uint32_t>(p[1]) << 16) |
                     (static_cast<uint32_t>(p[2]) << 24);
        int32_t s = static_cast<int32_t>(u);
        v = static_cast<float>(s >> 8) / 8388608.0f;
      } else if (w.bits == 8) {
        v = (static_cast<float>(p[0]) - 128.0f) / 128.0f;
      } else {
        return false;
      }
      acc += v;
    }
    (*out)[i] = acc * inv_ch;
  }
  return true;
}

// Windowed-sinc polyphase resampler (Kaiser-lite Hann window, 16 taps/phase).
std::vector<float> resample_poly(const std::vector<float>& in, int src_rate,
                                 int dst_rate) {
  if (src_rate == dst_rate || in.empty()) return in;
  const int64_t g = [](int64_t a, int64_t b) {
    while (b) {
      int64_t t = a % b;
      a = b;
      b = t;
    }
    return a;
  }(src_rate, dst_rate);
  const int64_t up = dst_rate / g;
  const int64_t down = src_rate / g;

  const int kTapsPerPhase = 16;
  // cutoff in INPUT-sample units: input Nyquist when upsampling,
  // anti-alias at the output Nyquist when downsampling
  const double cutoff =
      0.5 * std::min(1.0, static_cast<double>(up) / static_cast<double>(down));
  const int64_t half = kTapsPerPhase / 2;

  const int64_t n_out = (static_cast<int64_t>(in.size()) * up) / down;
  std::vector<float> out(static_cast<size_t>(n_out));

  for (int64_t n = 0; n < n_out; ++n) {
    // output sample n corresponds to input position n * down / up
    const int64_t num = n * down;
    const int64_t i0 = num / up;           // integer input index
    const double frac = static_cast<double>(num % up) / up;
    double acc = 0.0;
    double wsum = 0.0;
    for (int64_t k = -half + 1; k <= half; ++k) {
      const int64_t idx = i0 + k;
      if (idx < 0 || idx >= static_cast<int64_t>(in.size())) continue;
      const double x = (static_cast<double>(k) - frac);
      const double t = 2.0 * M_PI * cutoff * x;
      const double sinc = (std::fabs(t) < 1e-12) ? 1.0 : std::sin(t) / t;
      // Hann window over the tap span
      const double wpos = (x + half) / (2.0 * half);
      if (wpos <= 0.0 || wpos >= 1.0) continue;
      const double win = 0.5 - 0.5 * std::cos(2.0 * M_PI * wpos);
      const double coeff = sinc * win;  // normalised by wsum below
      acc += coeff * in[static_cast<size_t>(idx)];
      wsum += coeff;
    }
    out[static_cast<size_t>(n)] =
        static_cast<float>(wsum > 1e-9 ? acc / wsum : acc);
  }
  return out;
}

bool read_file(const char* path, std::vector<float>* samples, int* rate) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  const long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(len));
  const size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  if (got != buf.size()) return false;

  WavInfo info;
  if (!parse_wav(buf.data(), buf.size(), &info)) return false;
  if (!decode_samples(info, samples)) return false;
  *rate = static_cast<int>(info.sample_rate);
  return true;
}

}  // namespace

extern "C" {

// Load a WAV file as mono float32 at target_rate. On success, *out receives a
// malloc'd buffer (caller frees via wa_free) and the return value is its
// length; on failure returns -1.
long long wa_load_wav(const char* path, int target_rate, float** out) {
  std::vector<float> samples;
  int src_rate = 0;
  if (!read_file(path, &samples, &src_rate)) return -1;
  std::vector<float> res = resample_poly(samples, src_rate, target_rate);
  float* buf = static_cast<float*>(std::malloc(res.size() * sizeof(float)));
  if (!buf) return -1;
  std::memcpy(buf, res.data(), res.size() * sizeof(float));
  *out = buf;
  return static_cast<long long>(res.size());
}

// Resample a float32 buffer; same ownership contract as wa_load_wav.
long long wa_resample(const float* in, long long n, int src_rate,
                      int dst_rate, float** out) {
  std::vector<float> v(in, in + n);
  std::vector<float> res = resample_poly(v, src_rate, dst_rate);
  float* buf = static_cast<float*>(std::malloc(res.size() * sizeof(float)));
  if (!buf) return -1;
  std::memcpy(buf, res.data(), res.size() * sizeof(float));
  *out = buf;
  return static_cast<long long>(res.size());
}

void wa_free(float* p) { std::free(p); }

// Batched data loader: decode + resample n WAVs in parallel (the eval
// harness feeds thousands of utterances; serial Python loads serialise the
// host while the chip idles). outs[i] receives a malloc'd mono float32
// buffer (caller frees each via wa_free), lens[i] its length or -1 on that
// file's failure. Returns the number of successfully loaded files.
long long wa_load_batch(const char** paths, long long n, int target_rate,
                        int n_threads, float** outs, long long* lens) {
  if (n <= 0) return 0;
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  if (n_threads > n) n_threads = static_cast<int>(n);

  std::atomic<long long> next(0), ok(0);
  auto worker = [&]() {
    for (;;) {
      const long long i = next.fetch_add(1);
      if (i >= n) return;
      outs[i] = nullptr;
      lens[i] = wa_load_wav(paths[i], target_rate, &outs[i]);
      if (lens[i] >= 0) ok.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(static_cast<size_t>(n_threads));
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

}  // extern "C"
