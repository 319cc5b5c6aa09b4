// Native data-plane kernel: multithreaded PNG decode for the CLEVR-TR
// input pipeline (C ABI, consumed via ctypes from gta_tpu/data/native.py).
//
// The reference leans on tf.data's C++ input pipeline for its heavy data
// work (SURVEY §2); this is the analogous native piece for the map-style
// CLEVR-TR loader: a scene's view images + masks decode in parallel
// threads straight into the caller's pinned numpy buffers (float32 RGB/255
// for images, uint8 index maps for masks), skipping the
// imageio -> PIL -> ndarray -> astype/divide round trips.

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Decode one PNG into RGB8; returns false on open/size mismatch.
bool decode_rgb8(const char* path, int h, int w, std::vector<uint8_t>& buf) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return false;
  image.format = PNG_FORMAT_RGB;
  if ((int)image.width != w || (int)image.height != h) {
    png_image_free(&image);
    return false;
  }
  buf.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, buf.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

bool decode_gray8(const char* path, int h, int w, std::vector<uint8_t>& buf) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return false;
  image.format = PNG_FORMAT_GRAY;
  if ((int)image.width != w || (int)image.height != h) {
    png_image_free(&image);
    return false;
  }
  buf.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, buf.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

template <typename Fn>
int parallel_for(int n, int threads, Fn fn) {
  std::atomic<int> next(0), failures(0);
  auto worker = [&] {
    std::vector<uint8_t> buf;
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      if (!fn(i, buf)) failures.fetch_add(1);
    }
  };
  int nt = threads > 0 ? threads : (int)std::thread::hardware_concurrency();
  if (nt > n) nt = n;
  if (nt <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(nt);
    for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failures.load();
}

}  // namespace

extern "C" {

// Decode n PNGs in parallel into out [n, h, w, 3] float32 RGB in [0, 1].
// Returns the number of files that failed (0 == full success); failed
// slots are left untouched so the caller can fall back per file.
int gta_decode_pngs_rgb(const char** paths, int n, int h, int w, int threads,
                        float* out) {
  const size_t stride = (size_t)h * w * 3;
  return parallel_for(n, threads, [&](int i, std::vector<uint8_t>& buf) {
    if (!decode_rgb8(paths[i], h, w, buf)) return false;
    float* dst = out + (size_t)i * stride;
    const uint8_t* src = buf.data();
    constexpr float kInv = 1.0f / 255.0f;
    for (size_t p = 0; p < stride; ++p) dst[p] = kInv * src[p];
    return true;
  });
}

// Decode n single-channel PNGs (e.g. CLEVR-TR entity-index masks) into
// out [n, h, w] uint8. Returns the number of failures.
int gta_decode_pngs_gray(const char** paths, int n, int h, int w, int threads,
                         unsigned char* out) {
  const size_t stride = (size_t)h * w;
  return parallel_for(n, threads, [&](int i, std::vector<uint8_t>& buf) {
    if (!decode_gray8(paths[i], h, w, buf)) return false;
    std::memcpy(out + (size_t)i * stride, buf.data(), stride);
    return true;
  });
}

}  // extern "C"
