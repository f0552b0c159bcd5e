// bdvc native decode kernel: JPEG decode + short-side resize + crop, batched
// over a thread pool.
//
// TPU-native replacement for the reference's per-sample CPU pipeline hot loop
// (SURVEY.md §3.3: RawFrameDecode -> Resize(-1,256) -> crop chain inside
// torch DataLoader worker processes). The decode path uses libjpeg DCT
// scaling (1/2, 1/4, 1/8) to avoid full-resolution IDCTs when the target is
// small, then a separable bilinear resize, then an optional fixed-size crop —
// producing a dense uint8 HWC batch ready for jax.device_put (normalization
// and augmentation happen on-device, bdvcil_tpu/ops/augment.py).
//
// C ABI (ctypes-friendly):
//   bdvc_version() -> int
//   bdvc_decode_file(path, out, cap, &w, &h)          full-size decode
//   bdvc_decode_resize_crop_batch(...)                the batch fast path
//
// Build: g++ -O3 -march=native -shared -fPIC decoder.cpp -o libbdvcdec.so -ljpeg

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <list>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <sys/stat.h>

#if defined(__linux__)
#include <sys/resource.h>
#include <sys/syscall.h>
#include <unistd.h>
#endif

#if defined(__AVX2__)
#include <immintrin.h>
#endif

namespace {

// 8-lane AVX2 horizontal-resize pass for single-channel planes (the luma /
// chroma hot loop of the yuv420 and planes-cache paths): gathers the two
// taps per output pixel, blends in 8-bit fixed point, packs to uint16
// (value * 256, same contract as the scalar hresize). The gathers load 4
// bytes per tap, so lanes whose tap index could cross the row end
// (idx > row_len - 4) take the scalar tail — ``safe_n`` is the caller-
// computed cutoff (tap indices are monotonic in x).
inline void hresize_u8_c1(const uint8_t* row, const int* x0s, const int* x1s,
                          const int* xws, int ow, int safe_n, uint16_t* out) {
  int x = 0;
#if defined(__AVX2__)
  const __m256i mask = _mm256_set1_epi32(0xFF);
  const __m256i c256 = _mm256_set1_epi32(256);
  for (; x + 8 <= safe_n; x += 8) {
    const __m256i ia = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(x0s + x));
    const __m256i ib = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(x1s + x));
    const __m256i a = _mm256_and_si256(
        _mm256_i32gather_epi32(reinterpret_cast<const int*>(row), ia, 1), mask);
    const __m256i b = _mm256_and_si256(
        _mm256_i32gather_epi32(reinterpret_cast<const int*>(row), ib, 1), mask);
    const __m256i w1 = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(xws + x));
    const __m256i w0 = _mm256_sub_epi32(c256, w1);
    const __m256i v =
        _mm256_add_epi32(_mm256_mullo_epi32(a, w0), _mm256_mullo_epi32(b, w1));
    const __m128i p =
        _mm_packus_epi32(_mm256_castsi256_si128(v), _mm256_extracti128_si256(v, 1));
    _mm_storeu_si128(reinterpret_cast<__m128i*>(out + x), p);
  }
#else
  (void)safe_n;
#endif
  for (; x < ow; ++x)
    out[x] = static_cast<uint16_t>(row[x0s[x]] * (256 - xws[x]) + row[x1s[x]] * xws[x]);
}

// Largest prefix of the (monotonic) tap index arrays whose 4-byte gather
// stays inside a row of length sw.
inline int hresize_safe_prefix(const std::vector<int>& x1s, int sw) {
  int n = static_cast<int>(x1s.size());
  while (n > 0 && x1s[n - 1] > sw - 4) --n;
  return n;
}

// Vertical blend of two uint16 hresize rows to uint8 output, 8 lanes at a
// time (same rounding as the scalar path: (r0*wy0 + r1*wy1 + 32768) >> 16).
// ``stride`` is the output pixel stride in bytes (2 for the interleaved
// chroma destination).
inline void vresize_u16_c1(const uint16_t* r0, const uint16_t* r1, int wy0,
                           int wy1, int n, uint8_t* dst, int stride) {
  int x = 0;
#if defined(__AVX2__)
  const __m256i vw0 = _mm256_set1_epi32(wy0);
  const __m256i vw1 = _mm256_set1_epi32(wy1);
  const __m256i bias = _mm256_set1_epi32(32768);
  for (; x + 8 <= n; x += 8) {
    const __m256i a =
        _mm256_cvtepu16_epi32(_mm_loadu_si128(reinterpret_cast<const __m128i*>(r0 + x)));
    const __m256i b =
        _mm256_cvtepu16_epi32(_mm_loadu_si128(reinterpret_cast<const __m128i*>(r1 + x)));
    const __m256i v = _mm256_srli_epi32(
        _mm256_add_epi32(
            _mm256_add_epi32(_mm256_mullo_epi32(a, vw0), _mm256_mullo_epi32(b, vw1)),
            bias),
        16);
    const __m128i p16 =
        _mm_packus_epi32(_mm256_castsi256_si128(v), _mm256_extracti128_si256(v, 1));
    const __m128i p8 = _mm_packus_epi16(p16, p16);
    if (stride == 1) {
      _mm_storel_epi64(reinterpret_cast<__m128i*>(dst + x), p8);
    } else {
      alignas(16) uint8_t tmp[16];
      _mm_store_si128(reinterpret_cast<__m128i*>(tmp), p8);
      for (int k = 0; k < 8; ++k) dst[static_cast<size_t>(x + k) * stride] = tmp[k];
    }
  }
#endif
  for (; x < n; ++x)
    dst[static_cast<size_t>(x) * stride] =
        static_cast<uint8_t>((r0[x] * wy0 + r1[x] * wy1 + 32768) >> 16);
}

// Decode worker threads run at low scheduler priority: decode has large
// spare capacity (bulk throughput work), while the host->device transfer
// path (jax device_put + the tunnel relay process) is latency-critical and
// shares the same cgroup CPU quota — under full decode load the transfer
// was measured ballooning 12 -> 426 ms/batch from scheduler starvation.
// Niceness is per-thread on Linux CFS, so this deprioritizes ONLY the pool.
// BDVC_DECODE_NICE overrides (0 disables).
void set_decode_thread_priority() {
#if defined(__linux__)
  int nice_val = 19;
  if (const char* env = std::getenv("BDVC_DECODE_NICE")) nice_val = std::atoi(env);
  if (nice_val != 0) {
    setpriority(PRIO_PROCESS, static_cast<id_t>(syscall(SYS_gettid)), nice_val);
  }
#endif
}

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit_cb(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file into an RGB buffer. When min_w/min_h > 0, pick the
// largest DCT scale denominator (2, 4, 8) that keeps the decoded image at
// least (min_w, min_h) on the respective axes — decoding at 1/4 scale is
// ~10x cheaper than full size. Passing the same value for both bounds
// reproduces the short-side contract (the short axis is the binding one).
bool decode_jpeg_file(const char* path, std::vector<uint8_t>& out, int& width,
                      int& height, int min_w, int min_h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_cb;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  if (min_w > 0 && min_h > 0) {
    const int iw = static_cast<int>(cinfo.image_width);
    const int ih = static_cast<int>(cinfo.image_height);
    int denom = 1;
    while (denom < 8 && iw / (denom * 2) >= min_w && ih / (denom * 2) >= min_h)
      denom *= 2;
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }

  jpeg_start_decompress(&cinfo);
  width = cinfo.output_width;
  height = cinfo.output_height;
  out.resize(static_cast<size_t>(width) * height * 3);

  const int row_stride = width * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.data() + static_cast<size_t>(cinfo.output_scanline) * row_stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Two-pass separable bilinear resize in 16.16 fixed point, C-channel
// interleaved uint8 (cv2.INTER_LINEAR-compatible half-pixel-center
// sampling). The horizontal pass writes a uint16 intermediate (value * 256)
// so the vertical pass is a single weighted add per output pixel — ~3x the
// single-pass float version and auto-vectorizable. `dst_px_stride` is the
// output pixel stride in bytes (defaults to C; >C lets planar sources write
// into an interleaved destination, e.g. Cb/Cr planes into a (h,w,2) array).
template <int C>
void bilinear_resize_t(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                       int dh, int dst_px_stride) {
  if (sw == dw && sh == dh) {
    for (int y = 0; y < dh; ++y) {
      const uint8_t* srow = src + static_cast<size_t>(y) * sw * C;
      uint8_t* drow = dst + static_cast<size_t>(y) * dw * dst_px_stride;
      for (int x = 0; x < dw; ++x)
        for (int c = 0; c < C; ++c) drow[x * dst_px_stride + c] = srow[x * C + c];
    }
    return;
  }
  const float x_ratio = static_cast<float>(sw) / dw;
  const float y_ratio = static_cast<float>(sh) / dh;

  std::vector<int> x0s(dw), x1s(dw);
  std::vector<int> xws(dw);  // weight of x1 in [0, 256]
  for (int x = 0; x < dw; ++x) {
    float sx = (x + 0.5f) * x_ratio - 0.5f;
    if (sx < 0) sx = 0;
    int x0 = static_cast<int>(sx);
    if (x0 > sw - 1) x0 = sw - 1;
    int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
    x0s[x] = x0 * C;
    x1s[x] = x1 * C;
    xws[x] = static_cast<int>((sx - x0) * 256.0f + 0.5f);
  }

  // horizontal pass for the (up to) two source rows each output row needs,
  // cached so consecutive output rows sharing a source row reuse the work
  std::vector<uint16_t> hrow0(static_cast<size_t>(dw) * C), hrow1(static_cast<size_t>(dw) * C);
  int cached_y0 = -1, cached_y1 = -1;

  const int safe_n = (C == 1) ? hresize_safe_prefix(x1s, sw) : 0;
  auto hresize = [&](int sy, uint16_t* out) {
    const uint8_t* row = src + static_cast<size_t>(sy) * sw * C;
    if constexpr (C == 1) {
      hresize_u8_c1(row, x0s.data(), x1s.data(), xws.data(), dw, safe_n, out);
      return;
    }
    for (int x = 0; x < dw; ++x) {
      const int a = x0s[x], b = x1s[x], w1 = xws[x], w0 = 256 - w1;
      for (int c = 0; c < C; ++c)
        out[x * C + c] = static_cast<uint16_t>(row[a + c] * w0 + row[b + c] * w1);
    }
  };

  const int n = dw * C;
  for (int y = 0; y < dh; ++y) {
    float sy = (y + 0.5f) * y_ratio - 0.5f;
    if (sy < 0) sy = 0;
    int y0 = static_cast<int>(sy);
    if (y0 > sh - 1) y0 = sh - 1;
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    const int wy1 = static_cast<int>((sy - y0) * 256.0f + 0.5f);
    const int wy0 = 256 - wy1;

    if (y0 == cached_y1) {  // roll the cache forward
      hrow0.swap(hrow1);
      cached_y0 = y0;
      cached_y1 = -1;
    }
    if (cached_y0 != y0) {
      hresize(y0, hrow0.data());
      cached_y0 = y0;
    }
    if (cached_y1 != y1) {
      if (y1 == y0) {
        std::memcpy(hrow1.data(), hrow0.data(), static_cast<size_t>(n) * sizeof(uint16_t));
      } else {
        hresize(y1, hrow1.data());
      }
      cached_y1 = y1;
    }

    uint8_t* drow = dst + static_cast<size_t>(y) * dw * dst_px_stride;
    const uint16_t* r0 = hrow0.data();
    const uint16_t* r1 = hrow1.data();
    if constexpr (C == 1) {
      vresize_u16_c1(r0, r1, wy0, wy1, dw, drow, dst_px_stride);
      continue;
    }
    for (int x = 0; x < dw; ++x) {
      for (int c = 0; c < C; ++c) {
        // (r0*wy0 + r1*wy1) is value * 256 * 256; round-shift back to uint8
        drow[x * dst_px_stride + c] =
            static_cast<uint8_t>((r0[x * C + c] * wy0 + r1[x * C + c] * wy1 + 32768) >> 16);
      }
    }
  }
}

void bilinear_resize(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw, int dh) {
  bilinear_resize_t<3>(src, sw, sh, dst, dw, dh, 3);
}

// ---------------------------------------------------------------------------
// Decoded-plane LRU cache. Training revisits the same JPEGs every epoch (the
// reference's torch loader re-decodes them from scratch each time,
// libs/loader/comix_loader.py:105-124); per-use geometry (MultiScaleCrop /
// RandomCrop offsets) changes, but the *decoded planes* don't — so the cache
// stores the stored-resolution YCbCr planes and each use replays only the
// cheap windowed resize (~0.2 ms vs ~0.9 ms Huffman+IDCT+resize at 320x240).
// Bounded by BDVC_DECODE_CACHE_MB (LRU eviction, default 512 MB ~ 4.6k
// frames at UCF-101 geometry; 0 disables); entries are validated against the
// file's mtime+size so an overwritten path is re-decoded, never served
// stale. Thread-safe: the pool threads share one mutex-guarded index and
// immutable shared_ptr entries.
// ---------------------------------------------------------------------------

struct PlaneEntry {
  int w = 0, h = 0, ystride = 0, cstride = 0;
  std::vector<uint8_t> y, cb, cr;
  size_t bytes() const { return y.size() + cb.size() + cr.size(); }
};

int dct_denom(int iw, int ih, int min_w, int min_h);  // defined below

class PlaneCache {
 public:
  static PlaneCache& instance() {
    static PlaneCache cache;
    return cache;
  }

  bool enabled() const { return budget_.load() > 0; }

  void set_budget_mb(long mb) {
    budget_.store(mb > 0 ? mb * 1024 * 1024 : 0);
    std::lock_guard<std::mutex> g(mu_);
    evict_locked();
  }

  // Pass (min_w, min_h) > 0 to require the 1:1 DCT scale the direct RGB
  // decode path would pick for that geometry: an entry the caller cannot
  // serve counts as a miss and is NOT LRU-promoted (promoting it would both
  // inflate the reported hit rate and push genuinely reusable entries out).
  std::shared_ptr<const PlaneEntry> get(const char* path, int min_w = 0, int min_h = 0) {
    struct stat st;
    if (stat(path, &st) != 0) return nullptr;
    std::lock_guard<std::mutex> g(mu_);
    auto it = map_.find(path);
    if (it == map_.end()) {
      ++misses_;
      return nullptr;
    }
    Node& node = it->second;
    if (node.mtime_ns != stamp(st) || node.size != st.st_size) {
      bytes_ -= node.entry->bytes();
      lru_.erase(node.pos);
      map_.erase(it);
      ++misses_;
      return nullptr;
    }
    if (min_w > 0 && dct_denom(node.entry->w, node.entry->h, min_w, min_h) != 1) {
      ++misses_;
      return nullptr;
    }
    lru_.splice(lru_.begin(), lru_, node.pos);
    ++hits_;
    return node.entry;
  }

  void put(const char* path, const std::shared_ptr<const PlaneEntry>& entry) {
    struct stat st;
    if (stat(path, &st) != 0) return;
    const size_t budget = budget_.load();
    if (entry->bytes() > budget) return;
    std::lock_guard<std::mutex> g(mu_);
    auto it = map_.find(path);
    if (it != map_.end()) {  // concurrent double-decode: last write wins
      bytes_ -= it->second.entry->bytes();
      lru_.erase(it->second.pos);
      map_.erase(it);
    }
    lru_.emplace_front(path);
    map_.emplace(lru_.front(), Node{entry, lru_.begin(), stamp(st),
                                    static_cast<long>(st.st_size)});
    bytes_ += entry->bytes();
    evict_locked();
  }

  void clear() {
    std::lock_guard<std::mutex> g(mu_);
    map_.clear();
    lru_.clear();
    bytes_ = 0;
    hits_ = 0;
    misses_ = 0;
  }

  void stats(long* hits, long* misses, long* bytes, long* entries) {
    std::lock_guard<std::mutex> g(mu_);
    if (hits) *hits = hits_;
    if (misses) *misses = misses_;
    if (bytes) *bytes = static_cast<long>(bytes_);
    if (entries) *entries = static_cast<long>(map_.size());
  }

 private:
  struct Node {
    std::shared_ptr<const PlaneEntry> entry;
    std::list<std::string>::iterator pos;
    long mtime_ns;
    long size;
  };

  PlaneCache() {
    long mb = 512;
    if (const char* env = std::getenv("BDVC_DECODE_CACHE_MB")) mb = std::atol(env);
    budget_.store(mb > 0 ? mb * 1024 * 1024 : 0);
  }

  static long stamp(const struct stat& st) {
    return static_cast<long>(st.st_mtim.tv_sec) * 1000000000L + st.st_mtim.tv_nsec;
  }

  void evict_locked() {
    const size_t budget = budget_.load();
    while (bytes_ > budget && !lru_.empty()) {
      auto vit = map_.find(lru_.back());
      bytes_ -= vit->second.entry->bytes();
      map_.erase(vit);
      lru_.pop_back();
    }
  }

  std::atomic<size_t> budget_{0};
  std::mutex mu_;
  std::unordered_map<std::string, Node> map_;
  std::list<std::string> lru_;
  size_t bytes_ = 0;
  long hits_ = 0;
  long misses_ = 0;
};

// Windowed variant: compute ONLY the [ox, ox+ow) x [oy, oy+oh) region of the
// (dw, dh) resize of src — the same half-pixel-center sampling grid as
// bilinear_resize, evaluated on the crop window, so the result is
// bit-identical to resize-then-crop while doing out_w*out_h work instead of
// dw*dh. This is the hot-loop saver for MultiScaleCrop training plans whose
// anisotropic resize target is up to ~3x the pixels of the final 224^2 crop.
template <int C>
void bilinear_resize_window_t(const uint8_t* src, int sw, int sh, int dw, int dh,
                              int ox, int oy, int ow, int oh, uint8_t* dst,
                              int dst_px_stride) {
  if (sw == dw && sh == dh) {  // identity resize: plain crop copy
    for (int y = 0; y < oh; ++y) {
      const uint8_t* srow = src + (static_cast<size_t>(oy + y) * sw + ox) * C;
      uint8_t* drow = dst + static_cast<size_t>(y) * ow * dst_px_stride;
      for (int x = 0; x < ow; ++x)
        for (int c = 0; c < C; ++c) drow[x * dst_px_stride + c] = srow[x * C + c];
    }
    return;
  }
  const float x_ratio = static_cast<float>(sw) / dw;
  const float y_ratio = static_cast<float>(sh) / dh;

  std::vector<int> x0s(ow), x1s(ow);
  std::vector<int> xws(ow);
  for (int x = 0; x < ow; ++x) {
    float sx = (ox + x + 0.5f) * x_ratio - 0.5f;
    if (sx < 0) sx = 0;
    int x0 = static_cast<int>(sx);
    if (x0 > sw - 1) x0 = sw - 1;
    int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
    x0s[x] = x0 * C;
    x1s[x] = x1 * C;
    xws[x] = static_cast<int>((sx - x0) * 256.0f + 0.5f);
  }

  std::vector<uint16_t> hrow0(static_cast<size_t>(ow) * C), hrow1(static_cast<size_t>(ow) * C);
  int cached_y0 = -1, cached_y1 = -1;

  const int safe_n = (C == 1) ? hresize_safe_prefix(x1s, sw) : 0;
  auto hresize = [&](int sy, uint16_t* out) {
    const uint8_t* row = src + static_cast<size_t>(sy) * sw * C;
    if constexpr (C == 1) {
      hresize_u8_c1(row, x0s.data(), x1s.data(), xws.data(), ow, safe_n, out);
      return;
    }
    for (int x = 0; x < ow; ++x) {
      const int a = x0s[x], b = x1s[x], w1 = xws[x], w0 = 256 - w1;
      for (int c = 0; c < C; ++c)
        out[x * C + c] = static_cast<uint16_t>(row[a + c] * w0 + row[b + c] * w1);
    }
  };

  const int n = ow * C;
  for (int y = 0; y < oh; ++y) {
    float sy = (oy + y + 0.5f) * y_ratio - 0.5f;
    if (sy < 0) sy = 0;
    int y0 = static_cast<int>(sy);
    if (y0 > sh - 1) y0 = sh - 1;
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    const int wy1 = static_cast<int>((sy - y0) * 256.0f + 0.5f);
    const int wy0 = 256 - wy1;

    if (y0 == cached_y1) {
      hrow0.swap(hrow1);
      cached_y0 = y0;
      cached_y1 = -1;
    }
    if (cached_y0 != y0) {
      hresize(y0, hrow0.data());
      cached_y0 = y0;
    }
    if (cached_y1 != y1) {
      if (y1 == y0) {
        std::memcpy(hrow1.data(), hrow0.data(), static_cast<size_t>(n) * sizeof(uint16_t));
      } else {
        hresize(y1, hrow1.data());
      }
      cached_y1 = y1;
    }

    uint8_t* drow = dst + static_cast<size_t>(y) * ow * dst_px_stride;
    const uint16_t* r0 = hrow0.data();
    const uint16_t* r1 = hrow1.data();
    if constexpr (C == 1) {
      vresize_u16_c1(r0, r1, wy0, wy1, ow, drow, dst_px_stride);
      continue;
    }
    for (int x = 0; x < ow; ++x) {
      for (int c = 0; c < C; ++c) {
        drow[x * dst_px_stride + c] =
            static_cast<uint8_t>((r0[x * C + c] * wy0 + r1[x * C + c] * wy1 + 32768) >> 16);
      }
    }
  }
}

void bilinear_resize_window(const uint8_t* src, int sw, int sh, int dw, int dh,
                            int ox, int oy, int ow, int oh, uint8_t* dst) {
  bilinear_resize_window_t<3>(src, sw, sh, dw, dh, ox, oy, ow, oh, dst, 3);
}

struct Task {
  const char* path;
  int crop_x, crop_y;  // -1 -> center
  uint8_t* out;        // out_h * out_w * 3
};

// ---------------------------------------------------------------------------
// YUV420 wire-format decode: emit the JPEG's own stored planes (Y full res,
// Cb/Cr at the file's 2x2 subsampling) instead of upsampling + converting to
// RGB on the host. Chroma upsample + YCbCr->RGB run fused on the TPU
// (bdvcil_tpu/ops/augment.yuv420_to_rgb), so the host skips ~1/3 of decode
// work and the host->device wire carries 1.5 bytes/px instead of 3 — the
// measured end-to-end bottleneck is wire bandwidth, not decode.
// ---------------------------------------------------------------------------

int dct_denom(int iw, int ih, int min_w, int min_h);  // defined below

// Decode the raw (non-upsampled) YCbCr planes of a 2x2-subsampled color JPEG.
// Returns false if the file is not a plain 420 3-component JPEG (caller falls
// back to the RGB path) or on decode error. When (gate_min_w, gate_min_h) is
// set, also bails right after the header if the direct RGB path would decode
// this file DCT-downscaled (full-res planes could not reproduce it) — the
// caller falls back before any pixel work is done.
bool decode_jpeg_raw420(const char* path, std::vector<uint8_t>& ybuf,
                        std::vector<uint8_t>& cbbuf, std::vector<uint8_t>& crbuf,
                        int& width, int& height, int& ystride, int& cstride,
                        int gate_min_w = 0, int gate_min_h = 0) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_cb;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.num_components != 3 || cinfo.jpeg_color_space != JCS_YCbCr ||
      cinfo.comp_info[0].h_samp_factor != 2 || cinfo.comp_info[0].v_samp_factor != 2 ||
      cinfo.comp_info[1].h_samp_factor != 1 || cinfo.comp_info[1].v_samp_factor != 1 ||
      cinfo.comp_info[2].h_samp_factor != 1 || cinfo.comp_info[2].v_samp_factor != 1 ||
      dct_denom(static_cast<int>(cinfo.image_width),
                static_cast<int>(cinfo.image_height), gate_min_w, gate_min_h) != 1) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  cinfo.raw_data_out = TRUE;
  jpeg_start_decompress(&cinfo);

  width = static_cast<int>(cinfo.output_width);
  height = static_cast<int>(cinfo.output_height);
  // jpeg_read_raw_data hands back MCU rows (16 Y rows / 8 chroma rows per
  // call) with block-padded widths; allocate padded planes and report strides
  ystride = ((width + 15) / 16) * 16;
  cstride = (((width + 1) / 2 + 7) / 8) * 8;
  const int ypad_h = ((height + 15) / 16) * 16;
  const int cpad_h = ypad_h / 2;
  ybuf.resize(static_cast<size_t>(ystride) * ypad_h);
  cbbuf.resize(static_cast<size_t>(cstride) * cpad_h);
  crbuf.resize(static_cast<size_t>(cstride) * cpad_h);

  JSAMPROW yrows[16], cbrows[8], crrows[8];
  JSAMPARRAY planes[3] = {yrows, cbrows, crrows};
  while (cinfo.output_scanline < cinfo.output_height) {
    const int base = static_cast<int>(cinfo.output_scanline);  // multiple of 16
    for (int r = 0; r < 16; ++r)
      yrows[r] = ybuf.data() + static_cast<size_t>(base + r) * ystride;
    for (int r = 0; r < 8; ++r) {
      cbrows[r] = cbbuf.data() + static_cast<size_t>(base / 2 + r) * cstride;
      crrows[r] = crbuf.data() + static_cast<size_t>(base / 2 + r) * cstride;
    }
    jpeg_read_raw_data(&cinfo, planes, 16);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Windowed resize of one planar channel with the upscale-fallback corner of
// the RGB path (two-stage resize when the crop window exceeds the resized
// image) mirrored per plane.
void resize_plane_window(const uint8_t* src, int sw, int sh, int stride, int dw,
                         int dh, int cx, int cy, int out, uint8_t* dst,
                         int dst_px_stride, std::vector<uint8_t>& scratch,
                         std::vector<uint8_t>& scratch2) {
  // repack strided plane to tight rows when needed
  const uint8_t* tight = src;
  if (stride != sw) {
    scratch.resize(static_cast<size_t>(sw) * sh);
    for (int y = 0; y < sh; ++y)
      std::memcpy(scratch.data() + static_cast<size_t>(y) * sw,
                  src + static_cast<size_t>(y) * stride, sw);
    tight = scratch.data();
  }
  if (cx < 0) cx = 0;
  if (cy < 0) cy = 0;
  if (cx + out > dw) cx = dw - out;
  if (cy + out > dh) cy = dh - out;
  if (cx < 0 || cy < 0) {  // target larger than resized plane: squash
    scratch2.resize(static_cast<size_t>(dw > 0 ? dw : 1) * (dh > 0 ? dh : 1));
    bilinear_resize_t<1>(tight, sw, sh, scratch2.data(), dw, dh, 1);
    bilinear_resize_t<1>(scratch2.data(), dw, dh, dst, out, out, dst_px_stride);
    return;
  }
  bilinear_resize_window_t<1>(tight, sw, sh, dw, dh, cx, cy, out, out, dst,
                              dst_px_stride);
}

// The DCT downscale denominator decode_jpeg_file picks for a (min_w, min_h)
// resize target: halve resolution while both axes stay >= the target.
int dct_denom(int iw, int ih, int min_w, int min_h) {
  if (min_w <= 0 || min_h <= 0) return 1;
  int denom = 1;
  while (denom < 8 && iw / (denom * 2) >= min_w && ih / (denom * 2) >= min_h)
    denom *= 2;
  return denom;
}

// Reconstruct full-resolution RGB from cached 420 planes with libjpeg's
// DEFAULT decode chain replayed exactly: h2v2 "fancy" (triangular) chroma
// upsample (jdsample.c — 9/3/3/1 weights, edges replicated, +8/+7 rounding
// on even/odd output columns) followed by the fixed-point YCbCr->RGB of
// jdcolor.c. Bit-identical to decode_jpeg_file's full-resolution output for
// plain 420 JPEGs (pinned by tests/test_native_decoder.py cache tests); the
// same math the device kernel ops/augment.yuv420_to_rgb implements.
void planes_to_rgb(const PlaneEntry& e, uint8_t* rgb) {
  const int w = e.w, h = e.h;
  const int cw = (w + 1) / 2, ch = (h + 1) / 2;
  // row-buffered like jdsample.c: vertical 3:1 sums per chroma column, then
  // the horizontal 3:1 pass emits an upsampled chroma row; both inner loops
  // are branch-free (edge columns peeled) so -O3 vectorizes them
  std::vector<int16_t> sb(cw), sr(cw);      // vertical sums (<= 4*255)
  std::vector<int16_t> cbu(2 * cw), cru(2 * cw);  // upsampled row, centered -128
  auto hpass = [cw](const int16_t* s, int16_t* out) {
    out[0] = static_cast<int16_t>(((s[0] * 4 + 8) >> 4) - 128);
    out[1] = static_cast<int16_t>(
        ((s[0] * 3 + s[cw > 1 ? 1 : 0] + 7) >> 4) - 128);
    for (int c = 1; c < cw - 1; ++c) {
      const int t3 = s[c] * 3;
      out[2 * c] = static_cast<int16_t>(((t3 + s[c - 1] + 8) >> 4) - 128);
      out[2 * c + 1] = static_cast<int16_t>(((t3 + s[c + 1] + 7) >> 4) - 128);
    }
    if (cw > 1) {
      const int c = cw - 1;
      out[2 * c] = static_cast<int16_t>(((s[c] * 3 + s[c - 1] + 8) >> 4) - 128);
      out[2 * c + 1] = static_cast<int16_t>(((s[c] * 4 + 7) >> 4) - 128);
    }
  };
  for (int y = 0; y < h; ++y) {
    const int tr = y >> 1;
    // vertical neighbor row: above for even output rows, below for odd
    const int vr = (y & 1) ? (tr + 1 < ch ? tr + 1 : ch - 1) : (tr > 0 ? tr - 1 : 0);
    const uint8_t* cbt = e.cb.data() + static_cast<size_t>(tr) * e.cstride;
    const uint8_t* cbv = e.cb.data() + static_cast<size_t>(vr) * e.cstride;
    const uint8_t* crt = e.cr.data() + static_cast<size_t>(tr) * e.cstride;
    const uint8_t* crv = e.cr.data() + static_cast<size_t>(vr) * e.cstride;
    for (int c = 0; c < cw; ++c) {
      sb[c] = static_cast<int16_t>(3 * cbt[c] + cbv[c]);
      sr[c] = static_cast<int16_t>(3 * crt[c] + crv[c]);
    }
    hpass(sb.data(), cbu.data());
    hpass(sr.data(), cru.data());
    const uint8_t* yrow = e.y.data() + static_cast<size_t>(y) * e.ystride;
    uint8_t* drow = rgb + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w; ++x) {
      const int cb = cbu[x], cr = cru[x];
      const int yy = yrow[x];
      int r = yy + ((91881 * cr + 32768) >> 16);              // FIX(1.40200)
      int g = yy + ((-22554 * cb - 46802 * cr + 32768) >> 16);  // FIX(.34414/.71414)
      int b = yy + ((116130 * cb + 32768) >> 16);             // FIX(1.77200)
      drow[x * 3 + 0] = static_cast<uint8_t>(r < 0 ? 0 : (r > 255 ? 255 : r));
      drow[x * 3 + 1] = static_cast<uint8_t>(g < 0 ? 0 : (g > 255 ? 255 : g));
      drow[x * 3 + 2] = static_cast<uint8_t>(b < 0 ? 0 : (b > 255 ? 255 : b));
    }
  }
}

// decode_jpeg_file with the decoded-plane cache in front: identical output,
// identical (width, height) contract. Cached planes are used ONLY when the
// DCT downscale the direct path would pick for this (min_w, min_h) is 1:1 —
// then planes_to_rgb replays libjpeg's own full-res chain bit-exactly. Any
// other case (cache disabled, DCT-scaled decode of a large source, non-420
// file) takes the original direct path, so enabling the cache can never
// change a single pixel. Warm epochs/eval passes skip Huffman+IDCT entirely.
bool decode_rgb_cached(const char* path, std::vector<uint8_t>& out, int& width,
                       int& height, int min_w, int min_h) {
  PlaneCache& cache = PlaneCache::instance();
  if (!cache.enabled()) return decode_jpeg_file(path, out, width, height, min_w, min_h);

  // geometry-gated get: a cached entry this geometry would DCT-downscale is
  // a miss (not promoted); the raw420 gate below then refuses it too and the
  // direct path runs, so output is unchanged while hit/miss telemetry tracks
  // what the cache actually served.
  std::shared_ptr<const PlaneEntry> ent = cache.get(path, min_w, min_h);
  if (!ent) {
    auto fresh = std::make_shared<PlaneEntry>();
    if (decode_jpeg_raw420(path, fresh->y, fresh->cb, fresh->cr, fresh->w,
                           fresh->h, fresh->ystride, fresh->cstride,
                           /*gate_min_w=*/min_w, /*gate_min_h=*/min_h)) {
      cache.put(path, fresh);
      ent = std::move(fresh);
    } else {
      // non-420 file, raw-decode failure, or a source large enough that the
      // direct path would DCT-downscale: keep the original behavior
      return decode_jpeg_file(path, out, width, height, min_w, min_h);
    }
  }
  width = ent->w;
  height = ent->h;
  out.resize(static_cast<size_t>(width) * height * 3);
  planes_to_rgb(*ent, out.data());
  return true;
}

// RGB fallback for non-420 files: decode+window-resize RGB exactly like
// bdvc_decode_resize2_crop_batch, then forward-convert to Y + 2x2-averaged
// CbCr (JPEG/BT.601 full-range fixed-point, libjpeg jcolor coefficients).
bool rgb_window_to_yuv420(const char* path, int rw, int rh, int cx, int cy,
                          int out, uint8_t* out_y, uint8_t* out_c,
                          std::vector<uint8_t>& decoded, std::vector<uint8_t>& rgb,
                          std::vector<uint8_t>& resized) {
  int w = 0, h = 0;
  if (!decode_jpeg_file(path, decoded, w, h, rw, rh)) return false;
  rgb.resize(static_cast<size_t>(out) * out * 3);
  if (cx < 0) cx = 0;
  if (cy < 0) cy = 0;
  if (cx + out > rw) cx = rw - out;
  if (cy + out > rh) cy = rh - out;
  if (cx < 0 || cy < 0) {
    resized.resize(static_cast<size_t>(rw) * rh * 3);
    bilinear_resize(decoded.data(), w, h, resized.data(), rw, rh);
    bilinear_resize(resized.data(), rw, rh, rgb.data(), out, out);
  } else {
    bilinear_resize_window(decoded.data(), w, h, rw, rh, cx, cy, out, out, rgb.data());
  }
  // forward Y for every pixel; Cb/Cr from the 2x2 block average
  const int half = out / 2;
  for (int y = 0; y < out; ++y) {
    const uint8_t* row = rgb.data() + static_cast<size_t>(y) * out * 3;
    uint8_t* yrow = out_y + static_cast<size_t>(y) * out;
    for (int x = 0; x < out; ++x) {
      const int r = row[x * 3], g = row[x * 3 + 1], b = row[x * 3 + 2];
      yrow[x] = static_cast<uint8_t>((19595 * r + 38470 * g + 7471 * b + 32768) >> 16);
    }
  }
  for (int y = 0; y < half; ++y) {
    uint8_t* crow = out_c + static_cast<size_t>(y) * half * 2;
    for (int x = 0; x < half; ++x) {
      int rs = 0, gs = 0, bs = 0;
      for (int dy = 0; dy < 2; ++dy)
        for (int dx = 0; dx < 2; ++dx) {
          const uint8_t* p =
              rgb.data() + ((static_cast<size_t>(2 * y + dy) * out) + 2 * x + dx) * 3;
          rs += p[0];
          gs += p[1];
          bs += p[2];
        }
      rs = (rs + 2) >> 2;
      gs = (gs + 2) >> 2;
      bs = (bs + 2) >> 2;
      // FIX(0.16874), FIX(0.33126), FIX(0.5) / FIX(0.41869), FIX(0.08131)
      crow[x * 2 + 0] =
          static_cast<uint8_t>((-11059 * rs - 21709 * gs + 32768 * bs + 8388608 + 32768) >> 16);
      crow[x * 2 + 1] =
          static_cast<uint8_t>((32768 * rs - 27439 * gs - 5329 * bs + 8388608 + 32768) >> 16);
    }
  }
  return true;
}

// Rectangular full-frame fallback for non-420 / undecodable-as-planes
// JPEGs on the EVAL wire (bdvc_decode_yuv420_full_batch): decode RGB,
// bilinear-resize to the full (rw, rh) target, then forward-convert to
// Y + 2x2-block-averaged CbCr (same fixed-point coefficients as
// rgb_window_to_yuv420 above), writing into strided padded destinations.
// Odd rw/rh replicate the edge sample in the chroma block average, matching
// the (rw+1)/2 chroma geometry of the plane path.
bool rgb_full_to_yuv420(const char* path, int rw, int rh, uint8_t* ydst,
                        int ystride, uint8_t* cdst, int cstride_px,
                        std::vector<uint8_t>& decoded, std::vector<uint8_t>& rgb) {
  int w = 0, h = 0;
  if (!decode_jpeg_file(path, decoded, w, h, rw, rh)) return false;
  rgb.resize(static_cast<size_t>(rw) * rh * 3);
  bilinear_resize(decoded.data(), w, h, rgb.data(), rw, rh);
  for (int y = 0; y < rh; ++y) {
    const uint8_t* row = rgb.data() + static_cast<size_t>(y) * rw * 3;
    uint8_t* yrow = ydst + static_cast<size_t>(y) * ystride;
    for (int x = 0; x < rw; ++x) {
      const int r = row[x * 3], g = row[x * 3 + 1], b = row[x * 3 + 2];
      yrow[x] = static_cast<uint8_t>((19595 * r + 38470 * g + 7471 * b + 32768) >> 16);
    }
  }
  const int rw2 = (rw + 1) / 2, rh2 = (rh + 1) / 2;
  for (int y = 0; y < rh2; ++y) {
    uint8_t* crow = cdst + static_cast<size_t>(y) * cstride_px * 2;
    for (int x = 0; x < rw2; ++x) {
      int rs = 0, gs = 0, bs = 0;
      for (int dy = 0; dy < 2; ++dy)
        for (int dx = 0; dx < 2; ++dx) {
          const int sy = 2 * y + dy < rh ? 2 * y + dy : rh - 1;
          const int sx = 2 * x + dx < rw ? 2 * x + dx : rw - 1;
          const uint8_t* p = rgb.data() + (static_cast<size_t>(sy) * rw + sx) * 3;
          rs += p[0];
          gs += p[1];
          bs += p[2];
        }
      rs = (rs + 2) >> 2;
      gs = (gs + 2) >> 2;
      bs = (bs + 2) >> 2;
      crow[x * 2 + 0] =
          static_cast<uint8_t>((-11059 * rs - 21709 * gs + 32768 * bs + 8388608 + 32768) >> 16);
      crow[x * 2 + 1] =
          static_cast<uint8_t>((32768 * rs - 27439 * gs - 5329 * bs + 8388608 + 32768) >> 16);
    }
  }
  return true;
}

}  // namespace

extern "C" {

int bdvc_version() { return 1; }

// Decoded-plane cache control (see PlaneCache above). Stats are cumulative
// since process start / last clear; bytes+entries reflect current residency.
void bdvc_cache_stats(long* hits, long* misses, long* bytes, long* entries) {
  PlaneCache::instance().stats(hits, misses, bytes, entries);
}

void bdvc_cache_clear() { PlaneCache::instance().clear(); }

// Runtime budget override (MB; <=0 disables and flushes). The initial budget
// comes from BDVC_DECODE_CACHE_MB (default 512).
void bdvc_cache_set_budget_mb(long mb) { PlaneCache::instance().set_budget_mb(mb); }

// Full decode of one file into caller buffer (capacity cap bytes). Returns 0
// on success, -1 decode failure, -2 buffer too small.
int bdvc_decode_file(const char* path, uint8_t* out, long cap, int* w, int* h) {
  std::vector<uint8_t> buf;
  int width = 0, height = 0;
  if (!decode_jpeg_file(path, buf, width, height, /*min_w=*/0, /*min_h=*/0)) return -1;
  if (static_cast<long>(buf.size()) > cap) return -2;
  std::memcpy(out, buf.data(), buf.size());
  *w = width;
  *h = height;
  return 0;
}

// Header-only probe: read each JPEG's dimensions without decoding pixel
// data (jpeg_read_header + abort; ~microseconds per file). Lets the loader
// compute true resized geometry so crop offsets are drawn on the real
// aspect ratio (reference MultiScaleCrop / bg RandomCrop contracts,
// libs/loader/comix_loader.py:72-75). Returns 0 or 1 + index of the first
// failed file.
int bdvc_probe_dims_batch(const char** paths, int n, int* widths, int* heights,
                          int num_threads) {
  if (n <= 0) return 0;
  if (num_threads < 1) num_threads = 1;
  if (num_threads > n) num_threads = n;

  std::atomic<int> next(0);
  std::atomic<int> failed(0);

  auto worker = [&]() {
    set_decode_thread_priority();
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) break;

      FILE* f = fopen(paths[i], "rb");
      if (!f) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        break;
      }
      jpeg_decompress_struct cinfo;
      ErrorMgr jerr;
      cinfo.err = jpeg_std_error(&jerr.pub);
      jerr.pub.error_exit = error_exit_cb;
      if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        break;
      }
      jpeg_create_decompress(&cinfo);
      jpeg_stdio_src(&cinfo, f);
      jpeg_read_header(&cinfo, TRUE);
      widths[i] = static_cast<int>(cinfo.image_width);
      heights[i] = static_cast<int>(cinfo.image_height);
      jpeg_destroy_decompress(&cinfo);
      fclose(f);
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

// Batch fast path: for each of n paths
//   decode (DCT-scaled) -> resize short side to `short_side` (keep ratio)
//   -> crop out_h x out_w at (crop_x[i], crop_y[i]) (-1 -> center, clipped)
// writing HWC uint8 into out[i * out_h * out_w * 3]. Runs on `num_threads`
// std::threads. Returns 0 on success or (1 + index) of the first failed file.
int bdvc_decode_resize_crop_batch(const char** paths, int n, int short_side,
                                  int out_h, int out_w, const int* crop_x,
                                  const int* crop_y, uint8_t* out, int num_threads) {
  if (n <= 0) return 0;
  if (num_threads < 1) num_threads = 1;
  if (num_threads > n) num_threads = n;

  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  const size_t frame_bytes = static_cast<size_t>(out_h) * out_w * 3;

  auto worker = [&]() {
    set_decode_thread_priority();
    std::vector<uint8_t> decoded, resized;
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) break;

      int w = 0, h = 0;
      if (!decode_rgb_cached(paths[i], decoded, w, h, short_side, short_side)) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        break;
      }
      // resize so the short side == short_side (mmcv rescale semantics:
      // int(dim * factor + 0.5))
      const float factor = static_cast<float>(short_side) / (w < h ? w : h);
      const int rw = static_cast<int>(w * factor + 0.5f);
      const int rh = static_cast<int>(h * factor + 0.5f);
      int cx = crop_x ? crop_x[i] : -1;
      int cy = crop_y ? crop_y[i] : -1;
      if (cx < 0) cx = (rw - out_w) / 2;
      if (cy < 0) cy = (rh - out_h) / 2;
      if (cx < 0) cx = 0;
      if (cy < 0) cy = 0;
      if (cx + out_w > rw) cx = rw - out_w;
      if (cy + out_h > rh) cy = rh - out_h;
      if (cx < 0 || cy < 0) {  // target larger than resized image: upscale
        resized.resize(static_cast<size_t>(rw) * rh * 3);
        bilinear_resize(decoded.data(), w, h, resized.data(), rw, rh);
        bilinear_resize(resized.data(), rw, rh, out + static_cast<size_t>(i) * frame_bytes,
                        out_w, out_h);
        continue;
      }
      // resize evaluated only on the crop window — bit-identical to
      // resize-then-crop (same sampling grid) at out_w*out_h work instead of
      // rw*rh (MSC training plans upscale to ~3x the crop's pixels)
      bilinear_resize_window(decoded.data(), w, h, rw, rh, cx, cy, out_w, out_h,
                             out + static_cast<size_t>(i) * frame_bytes);
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

// Generalized batch path with PER-IMAGE anisotropic resize: decode each
// path (DCT-scaled), resize to (resize_w[i], resize_h[i]) — independent x/y
// factors, so a crop-then-resize pipeline can be realized as one
// resize-then-crop — then crop out_h x out_w at (crop_x[i], crop_y[i])
// (-1 -> center, clipped). Writes HWC uint8 into out[i * out_h * out_w * 3].
// Returns 0 on success or (1 + index) of the first failed file.
int bdvc_decode_resize2_crop_batch(const char** paths, int n,
                                   const int* resize_w, const int* resize_h,
                                   int out_h, int out_w, const int* crop_x,
                                   const int* crop_y, uint8_t* out,
                                   int num_threads) {
  if (n <= 0) return 0;
  if (num_threads < 1) num_threads = 1;
  if (num_threads > n) num_threads = n;

  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  const size_t frame_bytes = static_cast<size_t>(out_h) * out_w * 3;

  auto worker = [&]() {
    set_decode_thread_priority();
    std::vector<uint8_t> decoded, resized;
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) break;

      const int rw = resize_w[i] > 0 ? resize_w[i] : 1;
      const int rh = resize_h[i] > 0 ? resize_h[i] : 1;
      // DCT scale: keep the decoded image at least as large as the resize
      // target on both axes (min_short_side contract of decode_jpeg_file is
      // per-short-side; the worst case over both axes is max(rw, rh) against
      // the short side only when aspect flips, so probe dims first)
      int w = 0, h = 0;
      if (!decode_rgb_cached(paths[i], decoded, w, h, rw, rh)) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        break;
      }
      int cx = crop_x ? crop_x[i] : -1;
      int cy = crop_y ? crop_y[i] : -1;
      if (cx < 0) cx = (rw - out_w) / 2;
      if (cy < 0) cy = (rh - out_h) / 2;
      if (cx < 0) cx = 0;
      if (cy < 0) cy = 0;
      if (cx + out_w > rw) cx = rw - out_w;
      if (cy + out_h > rh) cy = rh - out_h;
      if (cx < 0 || cy < 0) {  // target larger than resized image: upscale
        resized.resize(static_cast<size_t>(rw) * rh * 3);
        bilinear_resize(decoded.data(), w, h, resized.data(), rw, rh);
        bilinear_resize(resized.data(), rw, rh, out + static_cast<size_t>(i) * frame_bytes,
                        out_w, out_h);
        continue;
      }
      // resize evaluated only on the crop window — bit-identical to
      // resize-then-crop (same sampling grid) at out_w*out_h work instead of
      // rw*rh (MSC training plans upscale to ~3x the crop's pixels)
      bilinear_resize_window(decoded.data(), w, h, rw, rh, cx, cy, out_w, out_h,
                             out + static_cast<size_t>(i) * frame_bytes);
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

// YUV420 wire-format batch: for each of n paths, decode the JPEG's raw
// stored planes (no chroma upsample / RGB convert), realize the per-image
// anisotropic resize target (resize_w[i], resize_h[i]) + square crop
// out_size at (crop_x[i], crop_y[i]) per plane — Y on the full-res grid,
// Cb/Cr on the half-res grid with halved geometry — and write
//   out_y[i * out*out]           uint8 Y crop
//   out_c[i * (out/2)^2 * 2]     uint8 interleaved CbCr at half resolution
// Chroma upsample + YCbCr->RGB happen on-device. Non-420 files (422/444/
// grayscale/CMYK) take the RGB decode path and are forward-converted, so
// every input remains valid. out_size must be even. Returns 0 on success or
// (1 + index) of the first failed file.
int bdvc_decode_yuv420_batch(const char** paths, int n, const int* resize_w,
                             const int* resize_h, int out_size, const int* crop_x,
                             const int* crop_y, uint8_t* out_y, uint8_t* out_c,
                             int num_threads) {
  if (n <= 0) return 0;
  if (out_size % 2 != 0) return -1;
  if (num_threads < 1) num_threads = 1;
  if (num_threads > n) num_threads = n;

  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  const int half = out_size / 2;
  const size_t y_bytes = static_cast<size_t>(out_size) * out_size;
  const size_t c_bytes = static_cast<size_t>(half) * half * 2;

  PlaneCache& cache = PlaneCache::instance();

  auto worker = [&]() {
    set_decode_thread_priority();
    std::vector<uint8_t> s1, s2, s3;
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) break;

      const int rw = resize_w[i] > 0 ? resize_w[i] : 1;
      const int rh = resize_h[i] > 0 ? resize_h[i] : 1;
      int cx = crop_x ? crop_x[i] : -1;
      int cy = crop_y ? crop_y[i] : -1;
      if (cx < 0) cx = (rw - out_size) / 2;
      if (cy < 0) cy = (rh - out_size) / 2;
      if (cx < 0) cx = 0;
      if (cy < 0) cy = 0;

      std::shared_ptr<const PlaneEntry> ent;
      if (cache.enabled()) ent = cache.get(paths[i]);
      if (!ent) {
        auto fresh = std::make_shared<PlaneEntry>();
        if (decode_jpeg_raw420(paths[i], fresh->y, fresh->cb, fresh->cr,
                               fresh->w, fresh->h, fresh->ystride, fresh->cstride)) {
          if (cache.enabled()) cache.put(paths[i], fresh);
          ent = std::move(fresh);
        }
      }
      if (ent) {
        const int w = ent->w, h = ent->h;
        resize_plane_window(ent->y.data(), w, h, ent->ystride, rw, rh, cx, cy,
                            out_size, out_y + static_cast<size_t>(i) * y_bytes, 1,
                            s1, s2);
        const int cw = (w + 1) / 2, chh = (h + 1) / 2;
        const int rw2 = (rw + 1) / 2, rh2 = (rh + 1) / 2;
        uint8_t* cdst = out_c + static_cast<size_t>(i) * c_bytes;
        resize_plane_window(ent->cb.data(), cw, chh, ent->cstride, rw2, rh2,
                            cx / 2, cy / 2, half, cdst, 2, s1, s2);
        resize_plane_window(ent->cr.data(), cw, chh, ent->cstride, rw2, rh2,
                            cx / 2, cy / 2, half, cdst + 1, 2, s1, s2);
      } else if (!rgb_window_to_yuv420(paths[i], rw, rh, cx, cy, out_size,
                                       out_y + static_cast<size_t>(i) * y_bytes,
                                       out_c + static_cast<size_t>(i) * c_bytes,
                                       s1, s2, s3)) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        break;
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

// Full-frame YUV420 wire for the EVAL path: resize each frame's planes to
// its (resize_w, resize_h) short-side target — the SAME windowed fixed-point
// resize as bdvc_decode_yuv420_batch, window = the whole frame, so any crop
// sliced from this output on device is bit-identical to the host crop the
// cropped wire would have produced at the same offsets — and paste at the
// origin of fixed (pad_h, pad_w) slots (chroma at half dims). TenCrop then
// ships each frame ONCE (~131 KB) instead of 5 overlapping RGB crops
// (~752 KB) and the 5-crop + flip expansion runs on device
// (ops/augment.eval_yuv_full_crops). Padding bytes are zeroed. Non-420 /
// plane-path failures take the RGB full-frame fallback (rgb_full_to_yuv420).
// Returns 0, or (index + 1) of the first failed file.
int bdvc_decode_yuv420_full_batch(const char** paths, int n, const int* resize_w,
                                  const int* resize_h, int pad_w, int pad_h,
                                  uint8_t* out_y, uint8_t* out_c, int num_threads) {
  if (n <= 0) return 0;
  if (pad_w % 2 != 0 || pad_h % 2 != 0) return -1;
  if (num_threads < 1) num_threads = 1;
  if (num_threads > n) num_threads = n;

  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  const int pw2 = pad_w / 2, ph2 = pad_h / 2;
  const size_t y_bytes = static_cast<size_t>(pad_w) * pad_h;
  const size_t c_bytes = static_cast<size_t>(pw2) * ph2 * 2;

  PlaneCache& cache = PlaneCache::instance();

  auto worker = [&]() {
    set_decode_thread_priority();
    std::vector<uint8_t> tight, tmp, dec1, dec2;
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) break;

      const int rw = resize_w[i] > 0 ? resize_w[i] : 1;
      const int rh = resize_h[i] > 0 ? resize_h[i] : 1;
      uint8_t* ydst = out_y + static_cast<size_t>(i) * y_bytes;
      uint8_t* cdst = out_c + static_cast<size_t>(i) * c_bytes;
      if (rw > pad_w || rh > pad_h) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        break;
      }
      std::memset(ydst, 0, y_bytes);
      std::memset(cdst, 0, c_bytes);
      const int rw2 = (rw + 1) / 2, rh2 = (rh + 1) / 2;

      std::shared_ptr<const PlaneEntry> ent;
      if (cache.enabled()) ent = cache.get(paths[i]);
      if (!ent) {
        auto fresh = std::make_shared<PlaneEntry>();
        if (decode_jpeg_raw420(paths[i], fresh->y, fresh->cb, fresh->cr,
                               fresh->w, fresh->h, fresh->ystride, fresh->cstride)) {
          if (cache.enabled()) cache.put(paths[i], fresh);
          ent = std::move(fresh);
        }
      }
      if (ent) {
        const int w = ent->w, h = ent->h;
        // luma: full-window resize into a tight buffer, then row-paste
        const uint8_t* ysrc = ent->y.data();
        if (ent->ystride != w) {
          tight.resize(static_cast<size_t>(w) * h);
          for (int y = 0; y < h; ++y)
            std::memcpy(tight.data() + static_cast<size_t>(y) * w,
                        ent->y.data() + static_cast<size_t>(y) * ent->ystride, w);
          ysrc = tight.data();
        }
        tmp.resize(static_cast<size_t>(rw) * rh);
        bilinear_resize_window_t<1>(ysrc, w, h, rw, rh, 0, 0, rw, rh, tmp.data(), 1);
        for (int y = 0; y < rh; ++y)
          std::memcpy(ydst + static_cast<size_t>(y) * pad_w,
                      tmp.data() + static_cast<size_t>(y) * rw, rw);
        // chroma: resize Cb/Cr at half geometry, interleave, row-paste
        const int cw = (w + 1) / 2, chh = (h + 1) / 2;
        tmp.resize(static_cast<size_t>(rw2) * rh2 * 2);
        for (int ch = 0; ch < 2; ++ch) {
          const std::vector<uint8_t>& plane = ch == 0 ? ent->cb : ent->cr;
          const uint8_t* csrc = plane.data();
          if (ent->cstride != cw) {
            tight.resize(static_cast<size_t>(cw) * chh);
            for (int y = 0; y < chh; ++y)
              std::memcpy(tight.data() + static_cast<size_t>(y) * cw,
                          plane.data() + static_cast<size_t>(y) * ent->cstride, cw);
            csrc = tight.data();
          }
          bilinear_resize_window_t<1>(csrc, cw, chh, rw2, rh2, 0, 0, rw2, rh2,
                                      tmp.data() + ch, 2);
        }
        for (int y = 0; y < rh2; ++y)
          std::memcpy(cdst + static_cast<size_t>(y) * pw2 * 2,
                      tmp.data() + static_cast<size_t>(y) * rw2 * 2,
                      static_cast<size_t>(rw2) * 2);
      } else if (!rgb_full_to_yuv420(paths[i], rw, rh, ydst, pad_w, cdst, pw2,
                                     dec1, dec2)) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        break;
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

// Stored-plane wire format ("planes"): fetch each JPEG's raw YCbCr 420
// planes at STORED resolution, tight-packed into fixed (pad_h, pad_w) / 2x2-
// subsampled buffers — no resize at all on the host. The windowed bilinear
// resize (the same fixed-point math as bilinear_resize_window_t) runs on the
// TPU as exact integer matmuls (bdvcil_tpu/ops/augment.resize_planes_*), so
// steady-state host work per frame is one plane-cache lookup + memcpy.
// Output:
//   out_y[i * pad_h * pad_w]                       uint8 Y, rows 0..h-1 valid
//   out_c[i * (pad_h/2) * (pad_w/2) * 2]           uint8 interleaved CbCr
//   dims[i*2], dims[i*2+1] = (w, h)                stored dims, or (0, 0)
// dims (0, 0) flags a file the caller must route through the host-resize
// fallback instead: not a plain 420 JPEG, unreadable, or larger than the
// pad. pad_w/pad_h must be even. Always returns 0 (per-file failures are
// reported via dims so one odd file can't fail the batch).
int bdvc_fetch_planes_batch(const char** paths, int n, int pad_w, int pad_h,
                            uint8_t* out_y, uint8_t* out_c, int* dims,
                            int num_threads) {
  if (n <= 0) return 0;
  if (pad_w % 2 != 0 || pad_h % 2 != 0) return -1;
  if (num_threads < 1) num_threads = 1;
  if (num_threads > n) num_threads = n;

  std::atomic<int> next(0);
  const int cpw = pad_w / 2, cph = pad_h / 2;
  const size_t y_bytes = static_cast<size_t>(pad_h) * pad_w;
  const size_t c_bytes = static_cast<size_t>(cph) * cpw * 2;

  PlaneCache& cache = PlaneCache::instance();

  auto worker = [&]() {
    set_decode_thread_priority();
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;

      uint8_t* ydst = out_y + static_cast<size_t>(i) * y_bytes;
      uint8_t* cdst = out_c + static_cast<size_t>(i) * c_bytes;

      std::shared_ptr<const PlaneEntry> ent;
      if (cache.enabled()) ent = cache.get(paths[i]);
      if (!ent) {
        auto fresh = std::make_shared<PlaneEntry>();
        if (decode_jpeg_raw420(paths[i], fresh->y, fresh->cb, fresh->cr,
                               fresh->w, fresh->h, fresh->ystride, fresh->cstride)) {
          if (cache.enabled()) cache.put(paths[i], fresh);
          ent = std::move(fresh);
        }
      }
      if (!ent || ent->w > pad_w || ent->h > pad_h) {
        dims[i * 2] = 0;
        dims[i * 2 + 1] = 0;
        // zero the planes so fallback frames the caller overwrites only in
        // the top-left out x out corner still produce a deterministic wire
        std::memset(ydst, 0, y_bytes);
        std::memset(cdst, 0, c_bytes);
        continue;
      }
      const int w = ent->w, h = ent->h;
      const int cw = (w + 1) / 2, ch = (h + 1) / 2;
      dims[i * 2] = w;
      dims[i * 2 + 1] = h;
      for (int y = 0; y < h; ++y) {
        uint8_t* row = ydst + static_cast<size_t>(y) * pad_w;
        std::memcpy(row, ent->y.data() + static_cast<size_t>(y) * ent->ystride, w);
        std::memset(row + w, 0, pad_w - w);
      }
      std::memset(ydst + static_cast<size_t>(h) * pad_w, 0,
                  static_cast<size_t>(pad_h - h) * pad_w);
      for (int y = 0; y < ch; ++y) {
        const uint8_t* cb = ent->cb.data() + static_cast<size_t>(y) * ent->cstride;
        const uint8_t* cr = ent->cr.data() + static_cast<size_t>(y) * ent->cstride;
        uint8_t* row = cdst + static_cast<size_t>(y) * cpw * 2;
        for (int x = 0; x < cw; ++x) {
          row[x * 2] = cb[x];
          row[x * 2 + 1] = cr[x];
        }
        std::memset(row + cw * 2, 0, static_cast<size_t>(cpw - cw) * 2);
      }
      std::memset(cdst + static_cast<size_t>(ch) * cpw * 2, 0,
                  static_cast<size_t>(cph - ch) * cpw * 2);
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

// TenCrop fast path: decode+resize each image ONCE and emit the 5 fixed
// crops (4 corners + center) of size out x out — the horizontal flips are
// produced on-device (bdvcil_tpu/ops/augment.tencrop_expand). Output layout:
// out[(i*5 + k) * out*out*3], k in {UL, UR, LL, LR, C} matching the
// reference TenCrop offset order. Returns 0 or 1 + index of the first
// failed file.
int bdvc_decode_tencrop_batch(const char** paths, int n, int short_side,
                              int out_size, uint8_t* out, int num_threads) {
  if (n <= 0) return 0;
  if (num_threads < 1) num_threads = 1;
  if (num_threads > n) num_threads = n;

  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  const size_t frame_bytes = static_cast<size_t>(out_size) * out_size * 3;

  auto worker = [&]() {
    set_decode_thread_priority();
    std::vector<uint8_t> decoded, resized;
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) break;

      int w = 0, h = 0;
      if (!decode_rgb_cached(paths[i], decoded, w, h, short_side, short_side)) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        break;
      }
      const float factor = static_cast<float>(short_side) / (w < h ? w : h);
      int rw = static_cast<int>(w * factor + 0.5f);
      int rh = static_cast<int>(h * factor + 0.5f);
      if (rw < out_size) rw = out_size;
      if (rh < out_size) rh = out_size;
      resized.resize(static_cast<size_t>(rw) * rh * 3);
      bilinear_resize(decoded.data(), w, h, resized.data(), rw, rh);

      const int w_step = (rw - out_size) / 4;
      const int h_step = (rh - out_size) / 4;
      const int offsets[5][2] = {
          {0, 0},
          {4 * w_step, 0},
          {0, 4 * h_step},
          {4 * w_step, 4 * h_step},
          {2 * w_step, 2 * h_step},
      };
      for (int k = 0; k < 5; ++k) {
        const int cx = offsets[k][0], cy = offsets[k][1];
        uint8_t* dst = out + (static_cast<size_t>(i) * 5 + k) * frame_bytes;
        for (int y = 0; y < out_size; ++y) {
          std::memcpy(dst + static_cast<size_t>(y) * out_size * 3,
                      resized.data() + (static_cast<size_t>(cy + y) * rw + cx) * 3,
                      static_cast<size_t>(out_size) * 3);
        }
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

}  // extern "C"
