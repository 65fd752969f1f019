// Native prefetching image-sequence loader.
//
// TPU-native-framework runtime component replacing the reference's
// VideoSource (reference video_source.{h,cc}): where the reference reads
// one grayscale frame per loop iteration on the tracking thread
// (video_source.cc:59-81, cv::imread + cvtColor inline), this loader
// decodes PNG/JPEG/PGM on a small worker pool and keeps a bounded ring of
// decoded float32 grayscale frames ahead of the consumer, so host decode
// latency never stalls device tracking.
//
// Exposed as a C API for ctypes (no pybind11 in this image). All frames in
// one sequence must share a single (width, height); mismatches are errors.

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {
#include <jpeglib.h>
}

#include <setjmp.h>

namespace {

struct Frame {
  std::vector<float> pixels;
  int status = 0;  // 0 = pending, 1 = ready, -1 = failed
};

bool ends_with(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; i++) {
    char a = s[s.size() - n + i];
    char b = suf[i];
    if (tolower(a) != tolower(b)) return false;
  }
  return true;
}

// ---------------------------------------------------------------- decoders

bool decode_png(const char* path, int want_w, int want_h, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!info) {
    if (png) png_destroy_read_struct(&png, nullptr, nullptr);
    fclose(f);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  if ((int)w != want_w || (int)h != want_h) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  // normalize to 8-bit gray
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_PALETTE ||
      color == PNG_COLOR_TYPE_RGB_ALPHA) {
    // ITU-R BT.601 luma, like cv::cvtColor in the reference
    png_set_rgb_to_gray_fixed(png, 1, 29900, 58700);
  }
  png_read_update_info(png, info);

  std::vector<png_byte> row(png_get_rowbytes(png, info));
  for (png_uint_32 y = 0; y < h; y++) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out + (size_t)y * w;
    for (png_uint_32 x = 0; x < w; x++) dst[x] = (float)row[x];
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = (JpegErr*)cinfo->err;
  longjmp(err->jb, 1);
}

bool decode_jpeg(const char* path, int want_w, int want_h, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_width != want_w || (int)cinfo.output_height != want_h) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  std::vector<JSAMPLE> row(cinfo.output_width);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW rp = row.data();
    int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* dst = out + (size_t)y * want_w;
    for (int x = 0; x < want_w; x++) dst[x] = (float)row[x];
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

bool decode_pgm(const char* path, int want_w, int want_h, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  char magic[3] = {0};
  int w = 0, h = 0, maxv = 0;
  if (fscanf(f, "%2s", magic) != 1 || strcmp(magic, "P5") != 0) {
    fclose(f);
    return false;
  }
  // skip comments
  auto read_int = [&](int* v) {
    int c;
    do {
      c = fgetc(f);
      if (c == '#') {
        while (c != '\n' && c != EOF) c = fgetc(f);
      }
    } while (isspace(c) || c == '#');
    ungetc(c, f);
    return fscanf(f, "%d", v) == 1;
  };
  if (!read_int(&w) || !read_int(&h) || !read_int(&maxv) ||
      w != want_w || h != want_h) {
    fclose(f);
    return false;
  }
  fgetc(f);  // single whitespace after header
  size_t n = (size_t)w * h;
  if (maxv < 256) {
    std::vector<uint8_t> buf(n);
    if (fread(buf.data(), 1, n, f) != n) { fclose(f); return false; }
    for (size_t i = 0; i < n; i++) out[i] = (float)buf[i];
  } else {
    std::vector<uint16_t> buf(n);
    if (fread(buf.data(), 2, n, f) != n) { fclose(f); return false; }
    for (size_t i = 0; i < n; i++)
      out[i] = (float)(((buf[i] >> 8) | (buf[i] << 8)) & 0xffff) * 255.0f / maxv;
  }
  fclose(f);
  return true;
}

bool decode_any(const std::string& path, int w, int h, float* out) {
  if (ends_with(path, ".png")) return decode_png(path.c_str(), w, h, out);
  if (ends_with(path, ".jpg") || ends_with(path, ".jpeg"))
    return decode_jpeg(path.c_str(), w, h, out);
  if (ends_with(path, ".pgm")) return decode_pgm(path.c_str(), w, h, out);
  // try all
  return decode_png(path.c_str(), w, h, out) ||
         decode_jpeg(path.c_str(), w, h, out) ||
         decode_pgm(path.c_str(), w, h, out);
}

// ------------------------------------------------------------------ loader

struct Loader {
  std::vector<std::string> paths;
  int width = 0, height = 0;
  int depth = 0;  // ring capacity

  std::vector<Frame> ring;         // slot i serves frame indices i mod depth
  std::atomic<long> next_to_decode{0};
  long next_to_consume = 0;

  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_space;
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  void worker() {
    for (;;) {
      long idx = next_to_decode.fetch_add(1);
      if (idx >= (long)paths.size() || stop.load()) return;
      int slot = idx % depth;
      {
        // wait until the consumer has freed this slot
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop.load() || idx - next_to_consume < depth;
        });
        if (stop.load()) return;
      }
      Frame& fr = ring[slot];
      bool ok = decode_any(paths[idx], width, height, fr.pixels.data());
      {
        std::lock_guard<std::mutex> lk(mu);
        fr.status = ok ? 1 : -1;
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* loader_create(const char** paths, long n_paths, int width, int height,
                    int prefetch_depth, int n_threads) {
  Loader* L = new Loader();
  L->paths.assign(paths, paths + n_paths);
  L->width = width;
  L->height = height;
  L->depth = prefetch_depth < 2 ? 2 : prefetch_depth;
  L->ring.resize(L->depth);
  for (auto& fr : L->ring) fr.pixels.resize((size_t)width * height);
  if (n_threads < 1) n_threads = 1;
  for (int i = 0; i < n_threads; i++)
    L->workers.emplace_back(&Loader::worker, L);
  return L;
}

// Returns 1 on success (frame copied to out), 0 on end-of-sequence,
// -1 on decode failure for this frame (skippable).
int loader_next(void* handle, float* out) {
  Loader* L = (Loader*)handle;
  if (L->next_to_consume >= (long)L->paths.size()) return 0;
  long idx = L->next_to_consume;
  int slot = idx % L->depth;
  int status;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_ready.wait(lk, [&] { return L->ring[slot].status != 0; });
    status = L->ring[slot].status;
  }
  if (status == 1)
    memcpy(out, L->ring[slot].pixels.data(),
           sizeof(float) * (size_t)L->width * L->height);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->ring[slot].status = 0;
    L->next_to_consume = idx + 1;
  }
  L->cv_space.notify_all();
  return status == 1 ? 1 : -1;
}

long loader_remaining(void* handle) {
  Loader* L = (Loader*)handle;
  return (long)L->paths.size() - L->next_to_consume;
}

void loader_destroy(void* handle) {
  Loader* L = (Loader*)handle;
  L->stop.store(true);
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
