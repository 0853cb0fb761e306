// Fallback when FFmpeg dev libraries are absent: the media ABI exists but
// reports unavailable, so the Python layer routes to its pure fallbacks.

#include <cstdint>
#include <cstring>

extern "C" {

int vrt_media_available() { return 0; }

int vrt_video_info_batch(const char**, int n, int64_t* num_frames,
                         double* fps, int) {
  for (int i = 0; i < n; ++i) {
    num_frames[i] = -1;
    fps[i] = 0.0;
  }
  return 0;
}

int vrt_decode_video_batch(const char**, int n, const int*, int k, int target,
                           uint8_t* out, int* ok, int) {
  std::memset(out, 0,
              static_cast<size_t>(n) * k * target * target * 3);
  if (ok) std::memset(ok, 0, sizeof(int) * n);
  return 0;
}

int vrt_decode_video_batch_yuv(const char**, int n, const int*, int k,
                               int target, uint8_t* out, int* ok, int) {
  std::memset(out, 0,
              static_cast<size_t>(n) * k * target * target * 3 / 2);
  if (ok) std::memset(ok, 0, sizeof(int) * n);
  return 0;
}

int vrt_video_info_bytes_batch(const uint8_t**, const int64_t*, int n,
                               int64_t* num_frames, double* fps, int) {
  for (int i = 0; i < n; ++i) {
    num_frames[i] = -1;
    fps[i] = 0.0;
  }
  return 0;
}

int vrt_decode_video_bytes_batch(const uint8_t**, const int64_t*, int n,
                                 const int*, int k, int target, uint8_t* out,
                                 int* ok, int) {
  std::memset(out, 0,
              static_cast<size_t>(n) * k * target * target * 3);
  if (ok) std::memset(ok, 0, sizeof(int) * n);
  return 0;
}

int vrt_decode_video_bytes_batch_yuv(const uint8_t**, const int64_t*, int n,
                                     const int*, int k, int target,
                                     uint8_t* out, int* ok, int) {
  std::memset(out, 0,
              static_cast<size_t>(n) * k * target * target * 3 / 2);
  if (ok) std::memset(ok, 0, sizeof(int) * n);
  return 0;
}

int vrt_load_audio_batch(const char**, int n, int num_samples, float* out,
                         int* valid, int) {
  std::memset(out, 0, sizeof(float) * static_cast<size_t>(n) * num_samples);
  if (valid) std::memset(valid, 0, sizeof(int) * n);
  return 0;
}

int vrt_encode_video(const char*, int, int, int, double) { return 0; }

int vrt_encode_audio_tone(const char*, int, int64_t, double) { return 0; }

}  // extern "C"
