// Native wav decode/encode + threaded batch loader (C ABI, ctypes-bound).
//
// Host-side data-loading for the batch executor: the reference's IO layer
// is native C++ (Kaldi wave readers used by src/*.cc binaries); this is
// the TPU-framework equivalent.  Python parity target is
// setk_tpu/io/wave.py (itself behavior-matched to
// /root/reference/scripts/sptk/libs/utils.py:45-92): RIFF parsing with
// fmt-extensible handling, PCM 8/16/24/32 + float32/float64 decode,
// channel-first float32 output, [-1, 1] normalization.
//
// The batch entry point decodes N files on a small thread pool directly
// into a caller-provided (pre-zeroed) padded batch buffer, so Python
// assembles a (B, C, S) bucket with one call and no intermediate copies.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr uint16_t kFmtPcm = 1;
constexpr uint16_t kFmtFloat = 3;
constexpr uint16_t kFmtExt = 0xFFFE;

// error codes (negative returns)
constexpr int kErrOpen = -1;
constexpr int kErrNotRiff = -2;
constexpr int kErrNoData = -3;
constexpr int kErrEncoding = -4;
constexpr int kErrShortRead = -5;
constexpr int kErrCapacity = -6;

struct WavHeader {
  uint16_t fmt_code = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  int64_t data_bytes = 0;  // size of the data chunk
  long data_offset = 0;    // file offset of the first data byte
};

uint32_t ReadU32(const unsigned char* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

uint16_t ReadU16(const unsigned char* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

// Parse the RIFF header; on success the stream is positioned at the
// start of the data chunk.  Mirrors wave.py::_parse_header, including
// WAVE_FORMAT_EXTENSIBLE GUID-leading-code handling and odd-chunk
// padding bytes.
int ParseHeader(FILE* fp, WavHeader* hdr) {
  unsigned char buf[64];
  if (fread(buf, 1, 12, fp) != 12) return kErrNotRiff;
  if (memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
    return kErrNotRiff;
  for (;;) {
    if (fread(buf, 1, 8, fp) != 8) return kErrNoData;
    uint32_t size = ReadU32(buf + 4);
    if (memcmp(buf, "fmt ", 4) == 0) {
      std::vector<unsigned char> fmt(size);
      if (fread(fmt.data(), 1, size, fp) != size) return kErrNoData;
      hdr->fmt_code = ReadU16(fmt.data());
      hdr->channels = ReadU16(fmt.data() + 2);
      hdr->sample_rate = ReadU32(fmt.data() + 4);
      hdr->bits = ReadU16(fmt.data() + 14);
      if (hdr->fmt_code == kFmtExt && size >= 40)
        hdr->fmt_code = ReadU16(fmt.data() + 24);
      if (size & 1) fseek(fp, 1, SEEK_CUR);
    } else if (memcmp(buf, "data", 4) == 0) {
      hdr->data_bytes = size;
      hdr->data_offset = ftell(fp);
      return 0;
    } else {
      fseek(fp, static_cast<long>(size + (size & 1)), SEEK_CUR);
    }
  }
}

// Decode interleaved raw frames to channel-first float32.  `out` has
// `chan_stride` floats between channel rows; `frames` samples are
// written per channel.
int DecodeInto(const unsigned char* raw, int64_t frames, int channels,
               uint16_t bits, uint16_t fmt_code, int normalize, float* out,
               int64_t chan_stride) {
  if (fmt_code == kFmtFloat && bits == 32) {
    const float* src = reinterpret_cast<const float*>(raw);
    for (int64_t i = 0; i < frames; ++i)
      for (int c = 0; c < channels; ++c)
        out[c * chan_stride + i] = src[i * channels + c];
  } else if (fmt_code == kFmtFloat && bits == 64) {
    const double* src = reinterpret_cast<const double*>(raw);
    for (int64_t i = 0; i < frames; ++i)
      for (int c = 0; c < channels; ++c)
        out[c * chan_stride + i] =
            static_cast<float>(src[i * channels + c]);
  } else if (fmt_code == kFmtPcm && bits == 16) {
    const int16_t* src = reinterpret_cast<const int16_t*>(raw);
    const float scale = normalize ? 1.0f / 32768.0f : 1.0f;
    for (int64_t i = 0; i < frames; ++i)
      for (int c = 0; c < channels; ++c)
        out[c * chan_stride + i] = src[i * channels + c] * scale;
  } else if (fmt_code == kFmtPcm && bits == 32) {
    const int32_t* src = reinterpret_cast<const int32_t*>(raw);
    const float scale = normalize ? 1.0f / 2147483648.0f : 1.0f;
    for (int64_t i = 0; i < frames; ++i)
      for (int c = 0; c < channels; ++c)
        out[c * chan_stride + i] = src[i * channels + c] * scale;
  } else if (fmt_code == kFmtPcm && bits == 24) {
    const float scale = normalize ? 1.0f / 8388608.0f : 1.0f;
    for (int64_t i = 0; i < frames; ++i) {
      for (int c = 0; c < channels; ++c) {
        const unsigned char* p = raw + 3 * (i * channels + c);
        int32_t v = static_cast<int32_t>(p[0]) |
                    (static_cast<int32_t>(p[1]) << 8) |
                    (static_cast<int32_t>(p[2]) << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        out[c * chan_stride + i] = v * scale;
      }
    }
  } else if (fmt_code == kFmtPcm && bits == 8) {
    const float scale = normalize ? 1.0f / 128.0f : 1.0f;
    for (int64_t i = 0; i < frames; ++i)
      for (int c = 0; c < channels; ++c)
        out[c * chan_stride + i] =
            (static_cast<float>(raw[i * channels + c]) - 128.0f) * scale;
  } else {
    return kErrEncoding;
  }
  return 0;
}

int ReadOne(const char* path, int64_t beg, int64_t end, int normalize,
            float* out, int64_t chan_stride, int32_t max_channels,
            int32_t* channels_out, int64_t* frames_out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return kErrOpen;
  WavHeader hdr;
  int rc = ParseHeader(fp, &hdr);
  if (rc != 0) {
    fclose(fp);
    return rc;
  }
  if (max_channels > 0 && hdr.channels > max_channels) {
    fclose(fp);
    return kErrCapacity;
  }
  const int64_t frame_bytes =
      static_cast<int64_t>(hdr.channels) * (hdr.bits / 8);
  const int64_t total = hdr.data_bytes / frame_bytes;
  if (beg < 0) beg = 0;
  int64_t stop = (end < 0 || end > total) ? total : end;
  int64_t frames = stop > beg ? stop - beg : 0;
  if (frames > chan_stride) {
    fclose(fp);
    return kErrCapacity;
  }
  if (beg) fseek(fp, static_cast<long>(beg * frame_bytes), SEEK_CUR);
  std::vector<unsigned char> raw(static_cast<size_t>(frames * frame_bytes));
  if (frames &&
      fread(raw.data(), 1, raw.size(), fp) != raw.size()) {
    fclose(fp);
    return kErrShortRead;
  }
  fclose(fp);
  rc = DecodeInto(raw.data(), frames, hdr.channels, hdr.bits, hdr.fmt_code,
                  normalize, out, chan_stride);
  if (rc != 0) return rc;
  if (channels_out) *channels_out = hdr.channels;
  if (frames_out) *frames_out = frames;
  return 0;
}

}  // namespace

extern "C" {

// Header-only probe: returns total frames (>= 0) or a negative error.
int64_t wav_io_info(const char* path, int32_t* channels, int32_t* sr,
                    int32_t* bits, int32_t* fmt_code) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return kErrOpen;
  WavHeader hdr;
  int rc = ParseHeader(fp, &hdr);
  fclose(fp);
  if (rc != 0) return rc;
  if (channels) *channels = hdr.channels;
  if (sr) *sr = static_cast<int32_t>(hdr.sample_rate);
  if (bits) *bits = hdr.bits;
  if (fmt_code) *fmt_code = hdr.fmt_code;
  return hdr.data_bytes /
         (static_cast<int64_t>(hdr.channels) * (hdr.bits / 8));
}

// Decode [beg, end) frames of one file into `out` (channel-first,
// `chan_stride` floats between channels; tail beyond the decoded frames
// is left untouched).  end < 0 reads to EOF.
int wav_io_read(const char* path, int64_t beg, int64_t end, int normalize,
                float* out, int64_t chan_stride, int32_t max_channels,
                int32_t* channels_out, int64_t* frames_out) {
  return ReadOne(path, beg, end, normalize, out, chan_stride, max_channels,
                 channels_out, frames_out);
}

// Threaded batch decode: job i reads paths[i] frames [begs[i], ends[i])
// into base + offsets[i] with channel stride chan_strides[i].  Per-job
// results land in channels[i]/frames[i]; returns 0 if every job
// succeeded, else the first error code.
int wav_io_batch_read(const char* const* paths, int32_t n,
                      const int64_t* begs, const int64_t* ends,
                      int normalize, float* base, const int64_t* offsets,
                      const int64_t* chan_strides, int32_t max_channels,
                      int32_t num_threads, int32_t* channels,
                      int64_t* frames) {
  std::atomic<int32_t> next(0);
  std::atomic<int> status(0);
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) return;
      int rc = ReadOne(paths[i], begs ? begs[i] : 0, ends ? ends[i] : -1,
                       normalize, base + offsets[i], chan_strides[i],
                       max_channels, channels ? channels + i : nullptr,
                       frames ? frames + i : nullptr);
      if (rc != 0) {
        int expected = 0;
        status.compare_exchange_strong(expected, rc);
      }
    }
  };
  int nt = num_threads > 0 ? num_threads : 1;
  if (nt > n) nt = n;
  if (nt <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(nt);
    for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return status.load();
}

// PCM16 writer (normalize=1 scales float [-1,1] by 2**15, matching the
// reference's soundfile conversion; normalize=0 treats samples as
// int16-ranged).  `samps` is channel-first (channels x frames).
int wav_io_write(const char* path, const float* samps, int64_t frames,
                 int32_t channels, int32_t sr, int normalize) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return kErrOpen;
  const uint32_t data_bytes =
      static_cast<uint32_t>(frames * channels * 2);
  unsigned char hdr[44];
  memcpy(hdr, "RIFF", 4);
  uint32_t riff = 36 + data_bytes;
  memcpy(hdr + 4, &riff, 4);
  memcpy(hdr + 8, "WAVEfmt ", 8);
  uint32_t fmt_size = 16;
  memcpy(hdr + 16, &fmt_size, 4);
  uint16_t fmt_code = kFmtPcm, nch = static_cast<uint16_t>(channels);
  memcpy(hdr + 20, &fmt_code, 2);
  memcpy(hdr + 22, &nch, 2);
  uint32_t u32 = static_cast<uint32_t>(sr);
  memcpy(hdr + 24, &u32, 4);
  uint16_t block = static_cast<uint16_t>(channels * 2);
  u32 = static_cast<uint32_t>(sr) * block;
  memcpy(hdr + 28, &u32, 4);
  memcpy(hdr + 32, &block, 2);
  uint16_t bits = 16;
  memcpy(hdr + 34, &bits, 2);
  memcpy(hdr + 36, "data", 4);
  memcpy(hdr + 40, &data_bytes, 4);
  if (fwrite(hdr, 1, 44, fp) != 44) {
    fclose(fp);
    return kErrShortRead;
  }
  const float scale = normalize ? 32768.0f : 1.0f;
  std::vector<int16_t> buf(static_cast<size_t>(frames) * channels);
  for (int64_t i = 0; i < frames; ++i) {
    for (int32_t c = 0; c < channels; ++c) {
      float v = samps[c * frames + i] * scale;
      // round-half-to-even, matching np.round in the Python writer
      long iv = static_cast<long>(nearbyintf(v));
      if (iv > 32767) iv = 32767;
      if (iv < -32768) iv = -32768;
      buf[i * channels + c] = static_cast<int16_t>(iv);
    }
  }
  size_t wrote = fwrite(buf.data(), 2, buf.size(), fp);
  fclose(fp);
  return wrote == buf.size() ? 0 : kErrShortRead;
}

}  // extern "C"
