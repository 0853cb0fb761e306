// VAST-TPU host data runtime: parallel JPEG decode + WAV load/resample.
//
// Replaces the reference's dataloader-worker decode path
// (data/vision_mapper.py via decord/PIL, data/audio_mapper.py via
// torchaudio) with a native thread pool feeding preallocated numpy
// buffers through ctypes. Decoding is the host-side bottleneck once the
// numeric preprocessing moves on-device (ARCHITECTURE.md), so this is the
// framework's native data plane.
//
// Exposed C ABI (see runtime/__init__.py for the ctypes wrapper):
//   vrt_decode_image_batch : n JPEG files -> (n, target, target, 3) uint8
//                            (libjpeg DCT-domain prescale + bilinear +
//                             center crop)
//   vrt_load_wav_batch     : n PCM WAV files -> (n, num_samples) float32
//                            int16-scale @16 kHz (linear resample), plus
//                            per-file valid flags
//   vrt_version            : ABI version stamp

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>  // requires <cstdio>/<cstddef> first

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include "common.h"

namespace {

using vrt::parallel_for;

// ABI v2 adds the media surface (vast_media.cpp): video info/decode,
// any-container audio decode, fixture encoders. v4 adds the packed
// YUV420 decode entry points (vrt_decode_video_batch_yuv and the
// in-memory bytes variant) — the loader binds them unconditionally, so
// a pre-v4 .so must be rejected by the version gate, not by dlsym.
constexpr int kAbiVersion = 4;

// ---------------------------------------------------------------------
// JPEG decode
// ---------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Pillow-style separable triangle-filter (BILINEAR w/ antialias) resample
// along one axis: in (rows, in_len, 3 stride cols) -> out (rows, out_len).
// Matches PIL.Image.resize(..., BILINEAR) numerics, which the Python
// fallback path uses — keeps host decode stat-identical across backends.
void resample_axis(const float* in, int rows, int in_len, int row_stride,
                   int out_len, float* out) {
  const double scale = static_cast<double>(in_len) / out_len;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;  // bilinear support = 1
  const int kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  std::vector<double> weights(kmax);
  for (int x = 0; x < out_len; ++x) {
    const double center = (x + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_len) xmax = in_len;
    double wsum = 0;
    for (int i = xmin; i < xmax; ++i) {
      double t = std::abs((i - center + 0.5) / filterscale);
      double wgt = t < 1.0 ? 1.0 - t : 0.0;
      weights[i - xmin] = wgt;
      wsum += wgt;
    }
    if (wsum == 0) wsum = 1;
    for (int r = 0; r < rows; ++r) {
      for (int c = 0; c < 3; ++c) {
        double acc = 0;
        const float* src = in + (static_cast<size_t>(r) * row_stride) * 3 + c;
        for (int i = xmin; i < xmax; ++i)
          acc += src[i * 3] * weights[i - xmin];
        out[(static_cast<size_t>(r) * out_len + x) * 3 + c] =
            static_cast<float>(acc / wsum);
      }
    }
  }
}

// antialiased resize + center crop to (target, target); in is RGB8 HWC
void resize_center_crop(const uint8_t* in, int h, int w, int target,
                        uint8_t* out) {
  const double scale = static_cast<double>(target) / std::min(h, w);
  const int nh = std::max(target, static_cast<int>(std::lround(h * scale)));
  const int nw = std::max(target, static_cast<int>(std::lround(w * scale)));

  std::vector<float> buf0(static_cast<size_t>(h) * w * 3);
  for (size_t i = 0; i < buf0.size(); ++i) buf0[i] = in[i];
  // horizontal pass: (h, w) -> (h, nw)
  std::vector<float> buf1(static_cast<size_t>(h) * nw * 3);
  resample_axis(buf0.data(), h, w, w, nw, buf1.data());
  // vertical pass via transpose trick: treat columns as rows
  std::vector<float> buf1t(static_cast<size_t>(nw) * h * 3);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < nw; ++x)
      for (int c = 0; c < 3; ++c)
        buf1t[(static_cast<size_t>(x) * h + y) * 3 + c] =
            buf1[(static_cast<size_t>(y) * nw + x) * 3 + c];
  std::vector<float> buf2t(static_cast<size_t>(nw) * nh * 3);
  resample_axis(buf1t.data(), nw, h, h, nh, buf2t.data());

  const int top = (nh - target) / 2;
  const int left = (nw - target) / 2;
  for (int y = 0; y < target; ++y)
    for (int x = 0; x < target; ++x)
      for (int c = 0; c < 3; ++c) {
        const double v =
            buf2t[(static_cast<size_t>(x + left) * nh + (y + top)) * 3 + c];
        out[(static_cast<size_t>(y) * target + x) * 3 + c] =
            static_cast<uint8_t>(std::clamp(v + 0.5, 0.0, 255.0));
      }
}

bool decode_jpeg_file(const char* path, int target, uint8_t* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  std::vector<uint8_t> pixels;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // DCT-domain prescale: pick the largest 1/2^k that keeps the short side
  // >= target (cheap 8x8 IDCT shortcut inside libjpeg)
  const int short_side = std::min(cinfo.image_width, cinfo.image_height);
  int denom = 1;
  while (denom < 8 && short_side / (denom * 2) >= target) denom *= 2;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int ch = cinfo.output_components;
  pixels.resize(static_cast<size_t>(w) * h * 3);
  std::vector<uint8_t> row(static_cast<size_t>(w) * ch);
  for (int y = 0; y < h; ++y) {
    uint8_t* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* dst = pixels.data() + static_cast<size_t>(y) * w * 3;
    if (ch == 3) {
      std::memcpy(dst, row.data(), static_cast<size_t>(w) * 3);
    } else {  // grayscale
      for (int x = 0; x < w; ++x)
        dst[x * 3] = dst[x * 3 + 1] = dst[x * 3 + 2] = row[x * ch];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);

  resize_center_crop(pixels.data(), h, w, target, out);
  return true;
}

// ---------------------------------------------------------------------
// WAV load + resample
// ---------------------------------------------------------------------

struct WavData {
  std::vector<float> samples;  // mono [-1, 1]
  int sample_rate = 0;
};

bool read_wav(const char* path, WavData* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  uint8_t hdr[12];
  if (std::fread(hdr, 1, 12, f) != 12 || std::memcmp(hdr, "RIFF", 4) ||
      std::memcmp(hdr + 8, "WAVE", 4)) {
    std::fclose(f);
    return false;
  }
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  bool got_data = false;
  while (!got_data) {
    uint8_t chunk[8];
    if (std::fread(chunk, 1, 8, f) != 8) break;
    uint32_t size;
    std::memcpy(&size, chunk + 4, 4);
    if (!std::memcmp(chunk, "fmt ", 4)) {
      std::vector<uint8_t> body(size);
      if (std::fread(body.data(), 1, size, f) != size) break;
      std::memcpy(&fmt, body.data(), 2);
      std::memcpy(&channels, body.data() + 2, 2);
      std::memcpy(&rate, body.data() + 4, 4);
      std::memcpy(&bits, body.data() + 14, 2);
    } else if (!std::memcmp(chunk, "data", 4)) {
      if (fmt != 1 && fmt != 3) break;  // PCM / float only
      std::vector<uint8_t> body(size);
      const size_t got = std::fread(body.data(), 1, size, f);
      body.resize(got);
      const int bytes = bits / 8;
      if (!channels || !bytes) break;
      const size_t frames = got / (static_cast<size_t>(bytes) * channels);
      out->samples.resize(frames);
      for (size_t i = 0; i < frames; ++i) {
        double acc = 0;
        for (int c = 0; c < channels; ++c) {
          const uint8_t* p = body.data() + (i * channels + c) * bytes;
          double v = 0;
          if (fmt == 3 && bits == 32) {
            float fv;
            std::memcpy(&fv, p, 4);
            v = fv;
          } else if (bits == 16) {
            int16_t s;
            std::memcpy(&s, p, 2);
            v = s / 32768.0;
          } else if (bits == 32) {
            int32_t s;
            std::memcpy(&s, p, 4);
            v = s / 2147483648.0;
          } else if (bits == 8) {
            v = (p[0] - 128) / 128.0;
          }
          acc += v;
        }
        out->samples[i] = static_cast<float>(acc / channels);
      }
      out->sample_rate = static_cast<int>(rate);
      got_data = true;
    } else {
      std::fseek(f, static_cast<long>(size + (size & 1)), SEEK_CUR);
    }
  }
  std::fclose(f);
  return got_data && out->sample_rate > 0;
}

void resample_to(const std::vector<float>& in, int sr, int target_sr,
                 int num_samples, float scale, float* out) {
  const size_t n_in = in.size();
  if (n_in == 0) {
    std::memset(out, 0, sizeof(float) * num_samples);
    return;
  }
  const double step = static_cast<double>(sr) / target_sr;
  for (int i = 0; i < num_samples; ++i) {
    const double t = i * step;
    const size_t i0 = static_cast<size_t>(t);
    if (i0 + 1 < n_in) {
      const double w = t - i0;
      out[i] = static_cast<float>((in[i0] * (1 - w) + in[i0 + 1] * w) * scale);
    } else if (i0 < n_in) {
      out[i] = in[i0] * scale;
    } else {
      out[i] = 0.0f;
    }
  }
}

}  // namespace

extern "C" {

int vrt_version() { return kAbiVersion; }

// paths: n C strings; out: (n, target, target, 3) uint8. Returns number of
// successfully decoded images; failures leave zeros and are reported via
// ok[i] (may be null).
int vrt_decode_image_batch(const char** paths, int n, int target,
                           uint8_t* out, int* ok, int n_threads) {
  const size_t stride = static_cast<size_t>(target) * target * 3;
  std::atomic<int> n_ok(0);
  parallel_for(n, n_threads, [&](int i) {
    uint8_t* dst = out + stride * i;
    const bool good = decode_jpeg_file(paths[i], target, dst);
    if (!good) std::memset(dst, 0, stride);
    if (ok) ok[i] = good ? 1 : 0;
    if (good) n_ok.fetch_add(1);
  });
  return n_ok.load();
}

// paths: n C strings; out: (n, num_samples) float32 at int16 scale
// (x * 2^15), resampled to 16 kHz. valid[i]=0 for unreadable files.
int vrt_load_wav_batch(const char** paths, int n, int num_samples,
                       float* out, int* valid, int n_threads) {
  std::atomic<int> n_ok(0);
  parallel_for(n, n_threads, [&](int i) {
    float* dst = out + static_cast<size_t>(num_samples) * i;
    WavData wav;
    if (read_wav(paths[i], &wav)) {
      resample_to(wav.samples, wav.sample_rate, 16000, num_samples,
                  32768.0f, dst);
      if (valid) valid[i] = 1;
      n_ok.fetch_add(1);
    } else {
      std::memset(dst, 0, sizeof(float) * num_samples);
      if (valid) valid[i] = 0;
    }
  });
  return n_ok.load();
}

}  // extern "C"
