// nvit_tpu native data loader — threaded JPEG decode + batch gather.
//
// ≙ the reference's native data path (torchvision's C/PIL decode + torch
// DataLoader worker processes, /root/reference/nvit/train.py:256-358).  On
// TPU the feeding host must keep up with the chip, so decode runs here:
// a C++ thread pool decodes a whole batch of JPEGs (libjpeg, with
// scale_denom fast-DCT downscaling), bilinear-resizes the shorter side to
// the target, center-crops, and writes uint8 CHW directly into a
// caller-provided contiguous batch buffer — no Python objects, no GIL, no
// per-image allocations surviving the call.  A multithreaded uint8 gather
// serves the in-memory (CIFAR/synthetic) datasets where the cost is pure
// memcpy bandwidth.
//
// Exposed as a plain C ABI consumed via ctypes (see nvit_tpu/data/native.py).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC ... -ljpeg).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file into an RGB HWC buffer (malloc'd by callee).
// Uses libjpeg scale_num/scale_denom to decode at the smallest DCT scale
// that still covers `target` on the shorter side (up to 8x cheaper than
// full decode + resize).
bool decode_jpeg(const char* path, int target, std::vector<uint8_t>& rgb,
                 int& out_w, int& out_h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // pick scale 8/N so that min(w,h)*8/N >= target, N in {8,...,1}
  const int full_min = std::min<int>(cinfo.image_width, cinfo.image_height);
  int denom = 8;
  while (denom > 1 && (full_min * 8) / (denom * 8) < target) denom--;
  // (full_min * 8/denom) / 8 simplification above keeps integer math; redo
  // precisely:
  denom = 8;
  while (denom > 1 && (long)full_min * 8 / denom / 8 < target) denom--;
  cinfo.scale_num = 8;
  cinfo.scale_denom = denom;

  jpeg_start_decompress(&cinfo);
  out_w = cinfo.output_width;
  out_h = cinfo.output_height;
  rgb.resize((size_t)out_w * out_h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + (size_t)cinfo.output_scanline * out_w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize HWC RGB (src_w×src_h) → (dst_w×dst_h).
void resize_bilinear(const uint8_t* src, int src_w, int src_h, uint8_t* dst,
                     int dst_w, int dst_h) {
  const float sx = (float)src_w / dst_w;
  const float sy = (float)src_h / dst_h;
  for (int y = 0; y < dst_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::clamp((int)std::floor(fy), 0, src_h - 1);
    int y1 = std::min(y0 + 1, src_h - 1);
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dst_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::clamp((int)std::floor(fx), 0, src_w - 1);
      int x1 = std::min(x0 + 1, src_w - 1);
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[((size_t)y0 * src_w + x0) * 3 + c];
        float v01 = src[((size_t)y0 * src_w + x1) * 3 + c];
        float v10 = src[((size_t)y1 * src_w + x0) * 3 + c];
        float v11 = src[((size_t)y1 * src_w + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[((size_t)y * dst_w + x) * 3 + c] = (uint8_t)std::lround(v);
      }
    }
  }
}

// resize-shorter-side-to-target + center-crop → CHW into out (3*t*t).
void to_chw_square(const uint8_t* rgb, int w, int h, int target, uint8_t* out) {
  int rw, rh;
  if (w <= h) {
    rw = target;
    rh = std::max(target, (int)std::lround((double)h * target / w));
  } else {
    rh = target;
    rw = std::max(target, (int)std::lround((double)w * target / h));
  }
  std::vector<uint8_t> resized((size_t)rw * rh * 3);
  resize_bilinear(rgb, w, h, resized.data(), rw, rh);
  const int left = (rw - target) / 2;
  const int top = (rh - target) / 2;
  for (int y = 0; y < target; ++y) {
    for (int x = 0; x < target; ++x) {
      const uint8_t* px = &resized[(((size_t)(y + top)) * rw + (x + left)) * 3];
      for (int c = 0; c < 3; ++c) {
        out[((size_t)c * target + y) * target + x] = px[c];
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode a batch of JPEG files into a contiguous uint8 [n, 3, target, target]
// CHW buffer. `paths` is n NUL-terminated strings concatenated; `offsets[i]`
// is the byte offset of path i. Returns the number of successfully decoded
// images; failed slots are zero-filled and flagged in `ok[i]`.
int nvit_decode_jpeg_batch(const char* paths, const int64_t* offsets, int n,
                           int target, uint8_t* out, uint8_t* ok,
                           int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next(0), good(0);
  const size_t img_bytes = (size_t)3 * target * target;

  auto worker = [&]() {
    std::vector<uint8_t> rgb;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int w = 0, h = 0;
      bool success = decode_jpeg(paths + offsets[i], target, rgb, w, h);
      uint8_t* dst = out + (size_t)i * img_bytes;
      if (success && w > 0 && h > 0) {
        to_chw_square(rgb.data(), w, h, target, dst);
        ok[i] = 1;
        good.fetch_add(1);
      } else {
        memset(dst, 0, img_bytes);
        ok[i] = 0;
      }
    }
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return good.load();
}

// Multithreaded uint8 row gather: dst[i] = src[indices[i]] for row-major
// arrays with `row_bytes` bytes per row (the in-memory dataset batch path).
void nvit_gather_u8(const uint8_t* src, const int64_t* indices, int n,
                    int64_t row_bytes, uint8_t* dst, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      memcpy(dst + (size_t)i * row_bytes, src + (size_t)indices[i] * row_bytes,
             (size_t)row_bytes);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

int nvit_loader_abi_version() { return 1; }

}  // extern "C"
