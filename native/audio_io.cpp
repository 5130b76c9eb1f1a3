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

#include <algorithm>
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

// ITU-T G.711 expanders (telephony WAV formats 7 = mu-law, 6 = A-law);
// bit-exact against the reference tables (tests/test_native_audio.py
// cross-checks the Python implementation against the audioop oracle).
inline int32_t mulaw_expand(uint8_t b) {
  const uint8_t u = static_cast<uint8_t>(~b);
  int32_t t = ((u & 0x0F) << 3) + 0x84;
  t <<= (u >> 4) & 0x07;
  return (u & 0x80) ? (0x84 - t) : (t - 0x84);
}

inline int32_t alaw_expand(uint8_t b) {
  const uint8_t a = static_cast<uint8_t>(b ^ 0x55);
  const int seg = (a >> 4) & 0x07;
  int32_t t = (a & 0x0F) << 4;
  if (seg == 0) {
    t += 8;
  } else {
    t = (t + 0x108) << (seg - 1);
  }
  return (a & 0x80) ? t : -t;
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
      } else if (w.format == 7 && w.bits == 8) {  // G.711 mu-law
        v = static_cast<float>(mulaw_expand(p[0])) / 32768.0f;
      } else if (w.format == 6 && w.bits == 8) {  // G.711 A-law
        v = static_cast<float>(alaw_expand(p[0])) / 32768.0f;
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

// ---------------------------------------------------------------------------
// FLAC decoding (from scratch, per the public format spec — RFC 9639).
// LibriSpeech/FLEURS ship FLAC; this image has no decoder library, so the
// eval data-loader implements the decode subset those corpora need:
// STREAMINFO, fixed+variable blocking, CONSTANT/VERBATIM/FIXED/LPC
// subframes, RICE/RICE2 residual partitions (incl. escape), wasted bits,
// and L/S, R/S, M/S stereo decorrelation. CRCs are parsed but not verified
// (tolerant decode). Exposed as wa_load_flac + routed via wa_load_auto.
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* p;
  size_t len;
  size_t byte = 0;
  int bit = 0;  // bits consumed of current byte (0..7)

  bool eof() const { return byte >= len; }

  // read n (<=32) bits MSB-first; returns false on EOF
  bool get(uint32_t n, uint64_t* out) {
    uint64_t v = 0;
    for (uint32_t i = 0; i < n; ++i) {
      if (byte >= len) return false;
      v = (v << 1) | ((p[byte] >> (7 - bit)) & 1u);
      if (++bit == 8) {
        bit = 0;
        ++byte;
      }
    }
    *out = v;
    return true;
  }

  bool get_signed(uint32_t n, int64_t* out) {
    uint64_t u;
    if (!get(n, &u)) return false;
    // sign-extend n-bit value
    if (n && (u >> (n - 1))) u |= ~((uint64_t{1} << n) - 1);
    *out = static_cast<int64_t>(u);
    return true;
  }

  // unary: count of 0 bits before the terminating 1 bit
  bool get_unary(uint32_t* out) {
    uint32_t q = 0;
    for (;;) {
      uint64_t b;
      if (!get(1, &b)) return false;
      if (b) break;
      if (++q > 1u << 24) return false;  // corrupt stream guard
    }
    *out = q;
    return true;
  }

  void align() {
    if (bit) {
      bit = 0;
      ++byte;
    }
  }
};

// UTF-8-style coded number in frame headers (up to 7 bytes); value unused.
bool skip_utf8_number(BitReader* br) {
  uint64_t first;
  if (!br->get(8, &first)) return false;
  int extra = 0;
  for (uint8_t m = 0x80; first & m; m >>= 1) ++extra;
  if (extra == 1 || extra > 7) return false;  // 10xxxxxx alone is invalid
  if (extra) --extra;  // leading byte counted itself
  for (int i = 0; i < extra; ++i) {
    uint64_t cont;
    if (!br->get(8, &cont)) return false;
  }
  return true;
}

bool decode_residual(BitReader* br, uint32_t block_size, uint32_t order,
                     std::vector<int64_t>* res) {
  uint64_t method, po;
  if (!br->get(2, &method) || method > 1) return false;
  const uint32_t pbits = method == 0 ? 4 : 5;
  const uint32_t escape = method == 0 ? 0xF : 0x1F;
  if (!br->get(4, &po)) return false;
  const uint32_t partitions = 1u << po;
  if (block_size % partitions) return false;
  const uint32_t part_len = block_size >> po;
  // RFC 9639: (block_size >> partition_order) MUST exceed the predictor
  // order, or the first partition's sample count underflows.
  if (part_len <= order) return false;
  size_t idx = order;
  for (uint32_t part = 0; part < partitions; ++part) {
    uint32_t count = part_len - (part == 0 ? order : 0);
    if (idx + count > block_size) return false;
    uint64_t param;
    if (!br->get(pbits, &param)) return false;
    if (param == escape) {
      uint64_t nbits;
      if (!br->get(5, &nbits)) return false;
      for (uint32_t i = 0; i < count; ++i) {
        int64_t v = 0;
        if (nbits && !br->get_signed(static_cast<uint32_t>(nbits), &v))
          return false;
        (*res)[idx++] = v;
      }
    } else {
      for (uint32_t i = 0; i < count; ++i) {
        uint32_t q;
        uint64_t low = 0;
        if (!br->get_unary(&q)) return false;
        if (param && !br->get(static_cast<uint32_t>(param), &low))
          return false;
        uint64_t u = (static_cast<uint64_t>(q) << param) | low;
        (*res)[idx++] = static_cast<int64_t>(u >> 1) ^
                        -static_cast<int64_t>(u & 1);
      }
    }
  }
  return idx == block_size;
}

bool decode_subframe(BitReader* br, uint32_t block_size, uint32_t bps,
                     std::vector<int64_t>* out) {
  uint64_t pad, type_bits, has_wasted;
  if (!br->get(1, &pad) || pad) return false;
  if (!br->get(6, &type_bits)) return false;
  uint32_t wasted = 0;
  if (!br->get(1, &has_wasted)) return false;
  if (has_wasted) {
    uint32_t q;
    if (!br->get_unary(&q)) return false;
    wasted = q + 1;
    if (wasted >= bps) return false;
    bps -= wasted;
  }
  out->assign(block_size, 0);

  if (type_bits == 0) {  // CONSTANT
    int64_t v;
    if (!br->get_signed(bps, &v)) return false;
    for (auto& s : *out) s = v;
  } else if (type_bits == 1) {  // VERBATIM
    for (auto& s : *out)
      if (!br->get_signed(bps, &s)) return false;
  } else if ((type_bits & 0x38) == 0x08 && (type_bits & 0x07) <= 4) {
    // FIXED, order 0..4
    const uint32_t order = type_bits & 0x07;
    for (uint32_t i = 0; i < order; ++i)
      if (!br->get_signed(bps, &(*out)[i])) return false;
    if (!decode_residual(br, block_size, order, out)) return false;
    for (uint32_t i = order; i < block_size; ++i) {
      int64_t* s = out->data() + i;
      switch (order) {
        case 0: break;
        case 1: s[0] += s[-1]; break;
        case 2: s[0] += 2 * s[-1] - s[-2]; break;
        case 3: s[0] += 3 * s[-1] - 3 * s[-2] + s[-3]; break;
        case 4: s[0] += 4 * s[-1] - 6 * s[-2] + 4 * s[-3] - s[-4]; break;
      }
    }
  } else if (type_bits & 0x20) {  // LPC, order 1..32
    const uint32_t order = (type_bits & 0x1F) + 1;
    if (order > block_size) return false;
    for (uint32_t i = 0; i < order; ++i)
      if (!br->get_signed(bps, &(*out)[i])) return false;
    uint64_t prec_m1;
    int64_t shift;
    if (!br->get(4, &prec_m1) || prec_m1 == 0xF) return false;
    const uint32_t prec = static_cast<uint32_t>(prec_m1) + 1;
    if (!br->get_signed(5, &shift) || shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (auto& c : coef)
      if (!br->get_signed(prec, &c)) return false;
    if (!decode_residual(br, block_size, order, out)) return false;
    for (uint32_t i = order; i < block_size; ++i) {
      int64_t acc = 0;
      for (uint32_t j = 0; j < order; ++j)
        acc += coef[j] * (*out)[i - 1 - j];
      (*out)[i] += acc >> shift;
    }
  } else {
    return false;  // reserved type
  }

  if (wasted)
    for (auto& s : *out) s <<= wasted;
  return true;
}

bool decode_flac(const uint8_t* buf, size_t len, std::vector<float>* out,
                 int* rate) {
  if (len < 4 || std::memcmp(buf, "fLaC", 4) != 0) return false;
  size_t pos = 4;
  uint32_t sample_rate = 0, channels = 0, bps = 0;
  uint64_t total_samples = 0;
  bool have_streaminfo = false, last = false;
  while (!last && pos + 4 <= len) {
    const uint8_t* h = buf + pos;
    last = (h[0] & 0x80) != 0;
    const uint32_t type = h[0] & 0x7F;
    const uint32_t blen = (static_cast<uint32_t>(h[1]) << 16) |
                          (static_cast<uint32_t>(h[2]) << 8) | h[3];
    pos += 4;
    if (pos + blen > len) return false;
    if (type == 0 && blen >= 34) {  // STREAMINFO
      const uint8_t* s = buf + pos;
      sample_rate = (static_cast<uint32_t>(s[10]) << 12) |
                    (static_cast<uint32_t>(s[11]) << 4) | (s[12] >> 4);
      channels = ((s[12] >> 1) & 0x07) + 1;
      bps = (((s[12] & 1u) << 4) | (s[13] >> 4)) + 1;
      total_samples = (static_cast<uint64_t>(s[13] & 0x0F) << 32) |
                      (static_cast<uint64_t>(s[14]) << 24) |
                      (static_cast<uint64_t>(s[15]) << 16) |
                      (static_cast<uint64_t>(s[16]) << 8) | s[17];
      have_streaminfo = true;
    }
    pos += blen;
  }
  if (!have_streaminfo || !sample_rate || !channels || bps < 4) return false;
  *rate = static_cast<int>(sample_rate);
  out->clear();
  // STREAMINFO total_samples is a 36-bit field from untrusted input (up to
  // ~256 GB of floats); clamp the pre-reserve to 4 hours at the stated rate
  // and let the vector grow normally past that.
  if (total_samples) {
    const uint64_t cap = static_cast<uint64_t>(sample_rate) * 3600ull * 4ull;
    out->reserve(static_cast<size_t>(std::min(total_samples, cap)));
  }

  BitReader br{buf, len, pos, 0};
  std::vector<std::vector<int64_t>> chan(channels);
  const double denom = static_cast<double>(uint64_t{1} << (bps - 1));

  while (true) {
    br.align();
    if (br.byte >= br.len) break;
    uint64_t sync;
    if (!br.get(14, &sync)) break;
    if (sync != 0x3FFE) return out->size() > 0;  // trailing garbage: stop
    uint64_t reserved, blocking, bs_code, sr_code, ch_code, ss_code, zero;
    if (!br.get(1, &reserved) || !br.get(1, &blocking) ||
        !br.get(4, &bs_code) || !br.get(4, &sr_code) ||
        !br.get(4, &ch_code) || !br.get(3, &ss_code) || !br.get(1, &zero))
      return false;
    if (!skip_utf8_number(&br)) return false;

    uint32_t block_size = 0;
    switch (bs_code) {
      case 1: block_size = 192; break;
      case 6: {
        uint64_t v;
        if (!br.get(8, &v)) return false;
        block_size = static_cast<uint32_t>(v) + 1;
        break;
      }
      case 7: {
        uint64_t v;
        if (!br.get(16, &v)) return false;
        block_size = static_cast<uint32_t>(v) + 1;
        break;
      }
      default:
        if (bs_code >= 2 && bs_code <= 5)
          block_size = 576u << (bs_code - 2);
        else if (bs_code >= 8)
          block_size = 256u << (bs_code - 8);
        else
          return false;
    }
    if (sr_code == 12) {
      uint64_t v;
      if (!br.get(8, &v)) return false;  // kHz, ignored (streaminfo wins)
    } else if (sr_code == 13 || sr_code == 14) {
      uint64_t v;
      if (!br.get(16, &v)) return false;
    } else if (sr_code == 15) {
      return false;
    }
    uint32_t frame_bps = bps;
    switch (ss_code) {
      case 0: break;
      case 1: frame_bps = 8; break;
      case 2: frame_bps = 12; break;
      case 4: frame_bps = 16; break;
      case 5: frame_bps = 20; break;
      case 6: frame_bps = 24; break;
      case 7: frame_bps = 32; break;
      default: return false;
    }
    uint64_t crc8;
    if (!br.get(8, &crc8)) return false;  // parsed, not verified

    uint32_t n_ch = channels;
    int stereo_mode = 0;  // 1=L/S, 2=R/S, 3=M/S
    if (ch_code <= 7) {
      n_ch = static_cast<uint32_t>(ch_code) + 1;
      if (n_ch != channels) return false;
    } else if (ch_code <= 10) {
      if (channels != 2) return false;
      n_ch = 2;
      stereo_mode = static_cast<int>(ch_code) - 7;
    } else {
      return false;
    }

    for (uint32_t c = 0; c < n_ch; ++c) {
      uint32_t sub_bps = frame_bps;
      // the side channel carries one extra bit
      if ((stereo_mode == 1 && c == 1) || (stereo_mode == 2 && c == 0) ||
          (stereo_mode == 3 && c == 1))
        sub_bps += 1;
      if (!decode_subframe(&br, block_size, sub_bps, &chan[c])) return false;
    }
    br.align();
    uint64_t crc16;
    if (!br.get(16, &crc16)) return false;  // parsed, not verified

    // stereo decorrelation
    if (stereo_mode == 1) {  // left/side: right = left - side
      for (uint32_t i = 0; i < block_size; ++i)
        chan[1][i] = chan[0][i] - chan[1][i];
    } else if (stereo_mode == 2) {  // right/side: left = right + side
      for (uint32_t i = 0; i < block_size; ++i) {
        int64_t side = chan[0][i];
        chan[0][i] = chan[1][i] + side;
      }
    } else if (stereo_mode == 3) {  // mid/side
      for (uint32_t i = 0; i < block_size; ++i) {
        int64_t side = chan[1][i];
        int64_t mid = (chan[0][i] << 1) | (side & 1);
        chan[0][i] = (mid + side) >> 1;
        chan[1][i] = (mid - side) >> 1;
      }
    }

    const float inv_ch = 1.0f / static_cast<float>(channels);
    for (uint32_t i = 0; i < block_size; ++i) {
      double acc = 0.0;
      for (uint32_t c = 0; c < channels; ++c)
        acc += static_cast<double>(chan[c][i]);
      out->push_back(static_cast<float>(acc * inv_ch / denom));
    }
    if (total_samples && out->size() >= total_samples) {
      out->resize(static_cast<size_t>(total_samples));
      break;
    }
  }
  return !out->empty();
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

  // container dispatch by magic: RIFF/WAVE or fLaC
  if (buf.size() >= 4 && std::memcmp(buf.data(), "fLaC", 4) == 0)
    return decode_flac(buf.data(), buf.size(), samples, rate);
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
